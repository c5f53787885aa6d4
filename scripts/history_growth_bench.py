#!/usr/bin/env python
"""J6/J7 history-scan pruning evidence: wave wall-time must stay flat as
visit history grows 10×.

Round-1 verdict flagged that the J6 as-of window and J7 digest-dedupe join
rescanned the ENTIRE visits/warc history every wave.  The fix (bucketed
appends + wave-key semi-joins, tables.py/crawl.py) makes per-wave cost a
function of the wave, not the history.  This harness seeds a fixed frontier,
injects synthetic visit/warc history of size H and 10H directly into the
store, and times one dedupe-enabled wave at each size.

Run:  python scripts/history_growth_bench.py [n_origins locs hist_rows]
Appends a section to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def seed_history(spark, store, origins_df, frontier_df, hist_rows: int, now: int):
    """Append synthetic visit/warc history (old non-revisit GETs spread over
    the frontier keys) as one committed wave."""
    from pyspark.sql import functions as F

    keys = frontier_df.select("origin_id", "path_id").limit(hist_rows)
    n = keys.count()
    mult = (hist_rows + n - 1) // max(n, 1)
    hist = keys
    for i in range(1, mult):
        hist = hist.unionByName(keys)
    hist = hist.limit(hist_rows)
    hist = hist.withColumn("date", F.lit(now - 86_400_000) + (F.monotonically_increasing_id() % 1000))
    visits = hist.select(
        "origin_id", "path_id", "date",
        F.lit("GET").alias("method"), F.lit(200).cast("short").alias("status"),
        F.lit("text/html").alias("content_type"), F.lit(100).cast("long").alias("content_length"),
        F.unhex(F.substring(F.sha1(F.concat_ws("|", "origin_id", "path_id", "date")), 1, 32)).alias("warc_id"),
        F.lit(None).cast("long").alias("request_position"),
        F.lit(None).cast("long").alias("request_length"),
        F.lit(None).cast("long").alias("response_position"),
        F.lit(None).cast("long").alias("response_length"),
        F.unhex(F.substring(F.sha1(F.concat_ws("|", "origin_id", "path_id")), 1, 16)).alias("response_payload_digest"),
        F.lit(None).cast("long").alias("revisit_of_date"),
    )
    warc = visits.select(
        "warc_id", F.lit("response").alias("record_type"),
        F.concat(F.lit("http://h"), F.col("origin_id"), F.lit("/p"), F.col("path_id")).alias("url"),
        "date", "origin_id", "path_id",
        F.lit(b"x" * 64).alias("payload"),
        F.unhex(F.sha1(F.lit("x" * 64))).alias("payload_digest"),
        F.lit(None).cast("long").alias("refers_to_date"),
        F.lit(None).cast("string").alias("profile"),
        F.lit('"e"').alias("etag"), F.lit(None).cast("string").alias("last_modified"),
    )
    w = store.committed_wave + 1
    store.append("visits", visits, w)
    store.append("warc_records", warc, w)
    store.commit(w)


def run_once(hist_rows: int, n_origins: int, locs: int, k: int) -> dict:
    from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
    from chronicrawl_spark.fixtures import synthetic_frontier, synthetic_site_for_frontier
    from chronicrawl_spark.session import get_spark
    from chronicrawl_spark.tables import StateStore

    now = 1_600_000_000_000
    spark = get_spark(f"histgrowth-{hist_rows}", cpus=16)
    store = StateStore(spark, tempfile.mkdtemp(prefix=f"hist{hist_rows}_", dir="/dev/shm") + "/state", buckets=32)
    origins, frontier = synthetic_frontier(spark, n_origins, locs, now)
    store.merge("origins", origins, "upsert")
    store.merge("frontier", frontier, "upsert")
    store.commit(0)
    seed_history(spark, store, origins, frontier, hist_rows, now)
    site = synthetic_site_for_frontier(spark, n_origins)
    # dedupe ON: every wave runs J6 (as-of vs history) + J7 (digest dedupe)
    eng = CrawlEngine(spark, store, site, CrawlConfig(dedupe_server=True, dedupe_digest=True))
    eng.clock = now
    eng.step(per_host_k=k)  # warmup wave (JIT/codegen)
    t0 = time.time()
    s = eng.step(per_host_k=k)
    dt = time.time() - t0
    spark.stop()
    return {"hist_rows": hist_rows, "wave_secs": round(dt, 2), "fetched": s.get("fetched", 0)}


def main():
    args = sys.argv[1:]
    n_origins = int(args[0]) if args else 2000
    locs = int(args[1]) if len(args) > 1 else 200
    hist = int(args[2]) if len(args) > 2 else 400_000
    r1 = run_once(hist, n_origins, locs, k=25)
    r10 = run_once(hist * 10, n_origins, locs, k=25)
    ratio = round(r10["wave_secs"] / max(r1["wave_secs"], 1e-9), 2)
    out = {"H": r1, "10H": r10, "wave_time_ratio_10x_history": ratio}
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"""

## J6/J7 history-growth evidence (per-wave cost vs total visit history)

Same frontier ({n_origins} origins × {locs} locs), same dedupe-enabled wave
({r1['fetched']} URLs), synthetic prior visit/warc history of H={hist:,} vs
10H={hist * 10:,} rows.  Bucketed appends + wave-key semi-joins prune the J6
as-of window and J7 digest-dedupe join to the wave's keys:

| history rows | timed wave (s) |
|---|---|
| {hist:,} | {r1['wave_secs']} |
| {hist * 10:,} | {r10['wave_secs']} |

**10× history → {ratio}× wave time** (flat ⇒ per-wave cost is a function of
the wave, not the archive).
"""
        )
    print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
