"""ID generators: snowflake-style schedule ids (C15) + deterministic
record surrogates (C16).

Reference: ``Database.java:553-590`` — ``(millis_since_2020 << 22) |
(seq << 16) | node`` with a 6-bit sequence and 16-bit node id.  In Spark
the sequence must be collision-free across partitions without coordination,
so ``seq`` comes from the per-partition row index and ``node`` from the
partition id — same layout, distributed-safe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPOCH_2020_MS = 1_577_836_800_000  # 2020-01-01T00:00:00Z (Database.java:558)


def snowflake_id(ts_millis: int | Column, seq: Column | None = None, node: Column | None = None) -> Column:
    """(ts-2020 << 22) | (seq << 16) | node — layout per Database.java:584-586."""
    ts = F.lit(ts_millis) if isinstance(ts_millis, int) else ts_millis
    if seq is None:
        # per-partition monotonic counter folded into 6 bits
        seq = F.pmod(F.monotonically_increasing_id(), F.lit(64))
    if node is None:
        node = F.pmod(F.spark_partition_id().cast("long"), F.lit(1 << 16))
    return (
        F.shiftleft(ts - F.lit(EPOCH_2020_MS), 22)
        .bitwiseOR(F.shiftleft(F.pmod(seq, F.lit(64)), 16))
        .bitwiseOR(F.pmod(node, F.lit(1 << 16)))
    )


def decompose_snowflake(sid: int) -> tuple[int, int, int]:
    """→ (epoch_millis, seq, node) — inverse for tests."""
    node = sid & 0xFFFF
    seq = (sid >> 16) & 0x3F
    ts = (sid >> 22) + EPOCH_2020_MS
    return ts, seq, node
