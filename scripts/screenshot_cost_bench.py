#!/usr/bin/env python
"""Per-wave cost of the inline screenshot producer (S11,
``CrawlConfig.screenshot_thumbnails``).

Same scheduler-throughput workload shape as ``bench.py``'s crawl bench, but
every URL serves a real BMP payload (the magic-byte prefilter admits it to
the Arrow resize stage) so the measured delta is the producer's true cost:
JVM-side magic filter + one Arrow decode/resize crossing + one bucketed
append per wave.  Run flag-off and flag-on on identical inputs, best-of-R
each, and print one JSON line; paste the result into BENCH/BASELINE.md's
appended-sections area.

Run:  python scripts/screenshot_cost_bench.py [n_origins locs waves k repeats]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def crawl(spark, n_origins, locs, waves, k, shots: bool):
    now = 1_600_000_000_000
    tmp = tempfile.mkdtemp(prefix="shotbench_")
    try:
        return _crawl_in(spark, tmp, n_origins, locs, waves, k, shots, now)
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def _crawl_in(spark, tmp, n_origins, locs, waves, k, shots, now):
    from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
    from chronicrawl_spark.extras.imaging import encode_bmp, make_test_image
    from chronicrawl_spark.fixtures import synthetic_frontier
    from chronicrawl_spark.tables import StateStore

    store = StateStore(spark, os.path.join(tmp, "state"), buckets=32)
    origins, frontier = synthetic_frontier(spark, n_origins, locs, now)
    store.merge("origins", origins, "upsert")
    store.merge("frontier", frontier, "upsert")
    store.commit(0)
    # every URL serves the same small real BMP — the resize stage does full
    # decode+resize work per fetched row (pessimistic: a real crawl's mix
    # is mostly HTML, which the magic filter drops JVM-side for free)
    # a site row per frontier URL, built distributed from the frontier
    # itself (100k × 2.3 KB payloads never sit in a driver list); the
    # shared BMP literal is constant-folded into the plan once
    from pyspark.sql import functions as F

    bmp = encode_bmp(make_test_image(32, 24, seed=1))
    site = (
        frontier.select("origin_id", "path")
        .join(origins.select("origin_id", "origin"), "origin_id")
        .select(
            F.concat("origin", "path").alias("url"),
            F.lit(200).cast("int").alias("status"),
            F.lit("image/bmp").alias("content_type"),
            F.lit(bytes(bmp)).alias("body"),
            F.lit(None).cast("string").alias("etag"),
            F.lit(None).cast("string").alias("last_modified"),
            F.lit(None).cast("string").alias("location"),
        )
    )
    eng = CrawlEngine(
        spark, store, site,
        CrawlConfig(dedupe_server=False, dedupe_digest=False,
                    screenshot_thumbnails=shots, thumbnail_max_dim=16),
    )
    eng.clock = now
    t0 = time.time()
    fetched = 0
    for _ in range(waves):
        fetched += eng.step(per_host_k=k).get("fetched", 0)
    dt = time.time() - t0
    n_shots = store.read("screenshots").count()
    return {"secs": round(dt, 3), "fetched": fetched, "screenshots": n_shots,
            "urls_per_sec": round(fetched / dt, 2)}


def main():
    a = sys.argv[1:]
    n_origins = int(a[0]) if a else 2000
    locs = int(a[1]) if len(a) > 1 else 50
    waves = int(a[2]) if len(a) > 2 else 3
    k = int(a[3]) if len(a) > 3 else 30
    repeats = int(a[4]) if len(a) > 4 else 3

    from chronicrawl_spark.session import get_spark

    spark = get_spark("shot-bench", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    crawl(spark, n_origins, locs, 1, k, True)  # warm
    off = [crawl(spark, n_origins, locs, waves, k, False) for _ in range(repeats)]
    on = [crawl(spark, n_origins, locs, waves, k, True) for _ in range(repeats)]
    best_off = min(r["secs"] for r in off)
    best_on = min(r["secs"] for r in on)
    print(json.dumps({
        "workload": {"origins": n_origins, "locs": locs, "waves": waves, "k": k,
                      "urls_per_wave": n_origins * k},
        "off_best_secs": best_off, "on_best_secs": best_on,
        "overhead_secs_per_wave": round((best_on - best_off) / waves, 3),
        "overhead_pct": round((best_on - best_off) / best_off * 100, 1),
        "screenshots_rows": on[0]["screenshots"],
        "off_all": [r["secs"] for r in off], "on_all": [r["secs"] for r in on],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
