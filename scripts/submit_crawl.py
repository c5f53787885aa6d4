#!/usr/bin/env python
"""spark-submit entry point — the deployment shape the north_rule specifies.

Package and launch:

    cd /root/repo && zip -qr /tmp/chronicrawl_spark.zip chronicrawl_spark
    /opt/spark/bin/spark-submit \\
        --master 'local-cluster[4,4,5120]' \\
        --py-files /tmp/chronicrawl_spark.zip \\
        --conf spark.sql.shuffle.partitions=16 \\
        scripts/submit_crawl.py --origins 2000 --locs 50 --waves 3 --k 10

On a real cluster, swap the master URL (yarn / k8s / spark://...) and point
``--state-dir`` at shared storage; nothing else changes.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--origins", type=int, default=2000)
    ap.add_argument("--locs", type=int, default=50)
    ap.add_argument("--waves", type=int, default=3)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--state-dir", default=None)
    ap.add_argument("--seeds", nargs="*", default=None,
                    help="crawl these seed URLs against the built-in fixture site "
                         "instead of the synthetic-frontier benchmark")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("chronicrawl-spark").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
    from chronicrawl_spark.fixtures import (
        synthetic_frontier,
        synthetic_site_for_frontier,
        test_server_site,
    )
    from chronicrawl_spark.tables import StateStore

    state = args.state_dir or tempfile.mkdtemp(prefix="chronicrawl_state_")
    store = StateStore(spark, state, buckets=32)
    now = 1_600_000_000_000

    if args.seeds:
        site = test_server_site(spark, args.seeds[0].rstrip("/"))
        engine = CrawlEngine(spark, store, site, CrawlConfig())
        engine.add_seeds(args.seeds, now=now)
        stats = engine.run(max_waves=args.waves, per_host_k=args.k)
    else:
        origins, frontier = synthetic_frontier(spark, args.origins, args.locs, now)
        store.merge("origins", origins, "upsert")
        store.merge("frontier", frontier, "upsert")
        store.commit(0)
        site = synthetic_site_for_frontier(spark, args.origins)
        engine = CrawlEngine(
            spark, store, site, CrawlConfig(dedupe_server=False, dedupe_digest=False)
        )
        engine.clock = now
        t0 = time.time()
        stats = [engine.step(per_host_k=args.k) for _ in range(args.waves)]
        dt = time.time() - t0
        fetched = sum(s.get("fetched", 0) for s in stats)
        print(json.dumps({"urls": fetched, "secs": round(dt, 2),
                          "urls_per_sec": round(fetched / dt, 1), "state_dir": state}))
        spark.stop()
        return

    print(json.dumps({"waves": stats, "state_dir": state}, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
