"""Custom stateful streaming operator: per-location AIMD revisit scheduling.

The batch engine computes C11 — the reference's *inverted* AIMD branch
(``Exchange.java:264-277``: payload UNCHANGED → halve the revisit interval,
changed → double) — from the frontier's carried ``last_visit`` column
(crawl.py ``_frontier_visit_updates``).  In a streaming deployment the same
computation is genuinely stateful: the previous visit time of each
(origin_id, path_id) must persist across micro-batches.  This module
implements it with ``applyInPandasWithState`` — Spark's arbitrary-stateful
Arrow-batched operator — keyed by location, state = the last visit
timestamp.

Scale shape: state is 16 bytes per tracked location, partitioned by the
grouping key's hash shuffle and checkpointed by the streaming engine; each
micro-batch touches only the keys present in the batch (the wave), so
per-batch cost is O(wave), matching the batch engine's MoR property.  The
Python crossing is one Arrow batch per key-group per trigger — no per-row
Python.

Parity contract (tests/test_streaming.py): replaying the committed visits
table through this operator one wave per micro-batch yields exactly
``aimd_batch`` — the declarative lag-window equivalent — over the same
rows.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

AIMD_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("origin_id", T.LongType()),
        T.StructField("path_id", T.LongType()),
        T.StructField("date", T.LongType()),
        T.StructField("next_visit_aimd", T.LongType()),
    ]
)
AIMD_STATE_SCHEMA = T.StructType([T.StructField("last_visit", T.LongType())])


def _clamp(raw: int, min_ms: int, max_ms: int) -> int:
    return min(max(raw, min_ms), max_ms)


def aimd_stream(
    visits: DataFrame, min_revisit_ms: int, max_revisit_ms: int
) -> DataFrame:
    """Streaming AIMD over visit events ``(origin_id, path_id, date,
    unchanged)``.  Emits one row per event; ``next_visit_aimd`` is null for
    a location's first-ever visit (the batch engine falls through to the
    initial-revisit default there, crawl.py nv_initial)."""
    import pandas as pd

    def fn(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        last = state.get[0] if state.exists else None
        out = []
        # materialize the whole key-group before sorting: a key whose rows
        # within one micro-batch span multiple Arrow chunks (>~10k rows per
        # key per trigger) would otherwise be sorted per-chunk only, and
        # state updates would run out of event-time order — silently
        # diverging from aimd_batch.  Group size is the key's rows in ONE
        # trigger (a wave), so the concat is small and bounded.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            whole = whole.sort_values("date")
            for date, unchanged in zip(whole["date"], whole["unchanged"]):
                date = int(date)
                if last is None:
                    nv = None
                else:
                    dur = date - last
                    # trunc-toward-zero halving matches the batch
                    # (dur/2).cast("long") exactly
                    raw = int(dur / 2) if unchanged else dur * 2
                    nv = date + _clamp(raw, min_revisit_ms, max_revisit_ms)
                out.append((key[0], key[1], date, nv))
                last = date
        state.update((last,))
        yield pd.DataFrame(out, columns=["origin_id", "path_id", "date", "next_visit_aimd"])

    return (
        visits.groupBy("origin_id", "path_id")
        .applyInPandasWithState(
            fn,
            AIMD_OUTPUT_SCHEMA,
            AIMD_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def aimd_batch(visits: DataFrame, min_revisit_ms: int, max_revisit_ms: int) -> DataFrame:
    """The declarative batch equivalent (lag window) — the parity oracle for
    ``aimd_stream`` and a standalone backfill operator: recompute AIMD
    next-visits for an entire visit history in one pass."""
    w = Window.partitionBy("origin_id", "path_id").orderBy("date")
    last = F.lag("date").over(w)
    dur = F.col("date") - last
    raw = F.when(F.col("unchanged"), (dur / 2).cast("long")).otherwise(dur * 2)
    clamped = F.least(F.greatest(raw, F.lit(min_revisit_ms)), F.lit(max_revisit_ms))
    return visits.select(
        "origin_id",
        "path_id",
        "date",
        F.when(last.isNotNull(), F.col("date") + clamped).alias("next_visit_aimd"),
    )
