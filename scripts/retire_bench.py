#!/usr/bin/env python
"""Frontier-retirement evidence: ``StateStore.delete_where`` must cost
O(touched buckets), never O(table).

Two axes, same retire-set size (all locations of ONE origin — the
realistic compaction case: a host dies / a purge request lands):

1. **Touched-bucket proportionality** (fixed table): retiring keys that
   all land in ONE bucket (one origin) vs the same NUMBER of keys spread
   one-per-origin across every bucket.  The spread case must cost ~the
   full-bucket-set rewrite; the localized case a ~1/buckets slice of it.
2. **Table-growth flatness** (fixed per-bucket bytes): grow the table 10×
   with 10× the bucket count (how a real deployment sizes buckets to
   data) and retire the same one-origin key set.  Touched buckets stays
   1, per-bucket bytes stays fixed → retire cost must stay ~flat while
   the table grows 10×.

The reference never deletes locations (its URL-seen set IS the location
table's insert-if-absent PK, ``Database.java:229-251``); retirement is
this repo's scale-side maintenance op, so the contract under test is ours
(SURVEY §2 L20).  Timing is min-of-R consecutive retires of DISJOINT
same-shape key sets inside one session (same honesty protocol as
``frontier_growth_bench.py``: min absorbs codegen/GC/co-tenant noise,
consecutive ops exercise the steady state).

Run:  python scripts/retire_bench.py [locs_per_origin repeats]
Appends a section to BENCH/BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

NOW = 1_600_000_000_000


def _seed(spark, n_origins: int, locs: int, buckets: int):
    from chronicrawl_spark.fixtures import synthetic_frontier
    from chronicrawl_spark.tables import StateStore

    tmp = tempfile.mkdtemp(prefix=f"retire{n_origins}_", dir="/dev/shm")
    store = StateStore(spark, tmp + "/state", buckets=buckets)
    origins, frontier = synthetic_frontier(spark, n_origins, locs, NOW)
    store.merge("origins", origins, "upsert")
    store.merge("frontier", frontier, "upsert")
    store.commit(0)
    return store, tmp


def run_case(spark, name: str, n_origins: int, locs: int, buckets: int, spread: bool, repeats: int):
    store, tmp = _seed(spark, n_origins, locs, buckets)
    try:
        n_rows = store.read_staged("frontier").count()
        # origin ids are the engine's xxh64 identities, not 0..N — pick
        # victims from the actual id set (sorted for determinism)
        oids = sorted(
            r["origin_id"]
            for r in store.read_staged("frontier").select("origin_id").distinct().collect()
        )
        times, stats = [], None
        for r in range(repeats):
            if spread:
                # one key per origin across ALL origins → every bucket
                # touched; recomputing min(path_id) over the staged (post-
                # previous-retire) state makes repeats naturally disjoint
                keys = (
                    store.read_staged("frontier")
                    .groupBy("origin_id")
                    .agg(F.min("path_id").alias("path_id"))
                    .select("origin_id", "path_id")
                )
            else:
                # whole origin → ONE bucket; a different origin per repeat
                keys = (
                    store.read_staged("frontier")
                    .filter(F.col("origin_id") == int(oids[r]))
                    .select("origin_id", "path_id")
                )
            keys = keys.localCheckpoint()  # pay key materialization outside the timer
            t0 = time.perf_counter()
            stats = store.delete_where("frontier", keys)
            times.append(time.perf_counter() - t0)
        return {
            "case": name,
            "rows": n_rows,
            "buckets_total": buckets,
            "buckets_touched": stats["buckets"],
            "keys_per_retire": stats["rows_deleted"],
            "best_s": round(min(times), 3),
            "all_s": [round(t, 3) for t in times],
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    locs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from chronicrawl_spark.session import get_spark

    spark = get_spark("retire-bench", cpus=16)
    rows = [
        run_case(spark, "1x table, 1 bucket touched", 1024, locs, 32, False, repeats),
        run_case(spark, "1x table, all 32 touched", 1024, locs, 32, True, repeats),
        run_case(spark, "10x table, 1 bucket touched", 10240, locs, 320, False, repeats),
    ]
    one, allb, ten = rows
    lines = [
        "",
        "## Frontier-retirement cost (delete_where: O(touched buckets), not O(table))",
        "",
        f"Retire set = all {locs} locations of one origin (localized; the",
        "host-dies/purge-request compaction case) or one key per origin across",
        "all 1024 origins (spread; same key count, every bucket touched).",
        f"Timings min-of-{repeats} disjoint consecutive retires, keys "
        "materialized outside the timer.",
        "",
        "| case | frontier rows | buckets | touched | keys | best s | all runs |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['case']} | {r['rows']} | {r['buckets_total']} | {r['buckets_touched']} "
            f"| {r['keys_per_retire']} | {r['best_s']} | {r['all_s']} |"
        )
    lines += [
        "",
        f"Localized-vs-spread on the same table: {allb['best_s'] / one['best_s']:.2f}x "
        f"(touched buckets 1 vs {allb['buckets_touched']}).  10x table at fixed "
        f"per-bucket bytes: {ten['best_s'] / one['best_s']:.2f}x the localized retire "
        "(flat = bucket pruning holds; the driver-side manifest bookkeeping is the "
        "only term that sees the bucket count).",
        "",
    ]
    out = "\n".join(lines)
    print(out)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(out)


if __name__ == "__main__":
    main()
