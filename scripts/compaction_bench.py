#!/usr/bin/env python
"""L23 history-compaction evidence: the small-file floor of pruned history
reads, and what `compact_history` buys back.

A continuous crawl leaves ≤1 file per bucket per append table per wave, so
a W-wave history is ~W×buckets tiny files; the J6 as-of window and J7
digest-dedupe join pay a per-file open/footer/task floor on every wave even
though bucket pruning already skips the bytes.  This harness seeds W small
committed history waves, times one dedupe-enabled wave against the
fragmented layout, runs `CrawlEngine.compact_history`, and times the same
wave against the consolidated layout — plus the compaction's own cost, so
the amortization argument is a number, not a claim.

Run:  python scripts/compaction_bench.py [n_origins locs waves rows_per_wave]
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


def _history_wave(spark, frontier_df, rows: int, date0: int):
    from pyspark.sql import functions as F

    keys = frontier_df.select("origin_id", "path_id").limit(rows)
    hist = keys.withColumn(
        "date", F.lit(date0) + (F.monotonically_increasing_id() % 1000)
    )
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
    return visits, warc


def _table_files(root: str, table: str) -> tuple[int, int]:
    files = size = 0
    for dirpath, _d, fs in os.walk(os.path.join(root, table)):
        for f in fs:
            if f.endswith(".parquet"):
                files += 1
                size += os.path.getsize(os.path.join(dirpath, f))
    return files, size


def main():
    args = sys.argv[1:]
    n_origins = int(args[0]) if args else 2000
    locs = int(args[1]) if len(args) > 1 else 200
    n_waves = int(args[2]) if len(args) > 2 else 120
    rows = int(args[3]) if len(args) > 3 else 4_000

    from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
    from chronicrawl_spark.fixtures import synthetic_frontier, synthetic_site_for_frontier
    from chronicrawl_spark.session import get_spark
    from chronicrawl_spark.tables import StateStore

    now = 1_600_000_000_000
    spark = get_spark("compactbench", cpus=16)
    store = StateStore(
        spark, tempfile.mkdtemp(prefix="compact_", dir="/dev/shm") + "/state", buckets=32
    )
    origins, frontier = synthetic_frontier(spark, n_origins, locs, now)
    store.merge("origins", origins, "upsert")
    store.merge("frontier", frontier, "upsert")
    store.commit(0)

    t0 = time.time()
    for w in range(1, n_waves + 1):
        visits, warc = _history_wave(spark, frontier, rows, now - 86_400_000 + w * 1000)
        store.append("visits", visits, w)
        store.append("warc_records", warc, w)
        store.commit(w)
    seed_secs = round(time.time() - t0, 2)

    files_pre, bytes_pre = _table_files(store.root, "visits")
    site = synthetic_site_for_frontier(spark, n_origins)
    eng = CrawlEngine(spark, store, site, CrawlConfig(dedupe_server=True, dedupe_digest=True))
    eng.clock = now
    eng.step(per_host_k=25)  # warmup (JIT/codegen) — adds one more small wave
    t0 = time.time()
    s_pre = eng.step(per_host_k=25)
    pre_secs = round(time.time() - t0, 2)

    t0 = time.time()
    stats = eng.compact_history()
    compact_secs = round(time.time() - t0, 2)
    # manifest now lists the consolidated wave only; on-disk source files
    # remain for retained snapshots until vacuum — report the live set
    live = store.manifest["append"]["visits"]
    files_post = bytes_post = 0
    for w in live:
        f, b = _table_files(store.root, os.path.join("visits", f"wave={w}"))
        files_post += f
        bytes_post += b

    t0 = time.time()
    s_post = eng.step(per_host_k=25)
    post_secs = round(time.time() - t0, 2)

    out = {
        "waves": n_waves, "rows_per_wave": rows, "seed_secs": seed_secs,
        "visits_files_pre": files_pre, "visits_mb_pre": round(bytes_pre / 1e6, 1),
        "visits_files_post": files_post, "visits_mb_post": round(bytes_post / 1e6, 1),
        "wave_secs_pre": pre_secs, "wave_secs_post": post_secs,
        "compact_secs": compact_secs, "compact_stats": stats,
        "fetched_pre": s_pre.get("fetched", 0), "fetched_post": s_post.get("fetched", 0),
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"""

## L23 history-compaction evidence (small-file floor vs consolidated layout)

{n_waves} committed history waves × {rows:,} visit+warc rows (1 file per
bucket per wave, buckets=32) — the layout a continuous crawl accretes.  One
dedupe-enabled wave (J6 as-of + J7 digest join over history) timed against
the fragmented layout, then after `compact_history` bin-packed the small
waves into one consolidated key-sorted wave:

| layout | visits files | visits MB | dedupe wave (s) |
|---|---|---|---|
| {n_waves} waves | {files_pre} | {round(bytes_pre / 1e6, 1)} | {pre_secs} |
| compacted ({len(live)} wave{'s' if len(live) != 1 else ''}) | {files_post} | {round(bytes_post / 1e6, 1)} | {post_secs} |

Compaction itself: {compact_secs} s for {stats['visits']['waves_in']} visit
waves ({round(stats['visits']['bytes_in'] / 1e6, 1)} MB) +
{stats['warc_records']['waves_in']} warc waves — O(compacted bytes), paid
once, amortized over every subsequent wave's history read.
"""
        )
    print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
