#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] plus the crawl-scheduler throughput benchmark
(the BASELINE.json primary metric: URLs scheduled+fetched/sec over a
synthetic frontier with politeness budgets), and prints ONE JSON line.

The two-cluster-size scaling evidence (N vs 4N cores) is produced by
``scripts/scaling_bench.py`` → ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "w2_wave_select",
    "w1_origin_peek",
    "j5_urlseen_antijoin",
    "j6_asof_furthest",
    "j7_digest_dedupe",
    "a1_metrics_buckets",
    "j3_cdx_star",
    "w3_visit_history",
    "f9_pushdown_scan",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    # the UNguarded word_jaccard stays out of the headline (83 s at sf0.1:
    # ~70% of this synthetic corpus's pairs are true candidates — data-
    # inherent density, documented); the df-capped variant bounds the
    # quadratic bucket blowup and runs at headline scale
    "dedup_word_jaccard_guarded",
    "dedup_clusters",
    "phash_hamming_dups",
    "phash_clusters",
    "embed_cosine_topk",
    "ann_lsh_topk",
    "ann_multi_topk",
    "ivf_topk",
    "text_quality",
    "token_count",
    "doc_fingerprint",
    "aimd_backfill",
]


def _materialize(df) -> int:
    """Force full execution without driver collect (noop sink)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def crawl_throughput(spark, n_origins: int = 2000, locs: int = 50, waves: int = 3,
                     per_host_k: int = 30, salt: int | None = None) -> dict:
    """Primary metric: URLs scheduled+fetched/sec, throughput mode (all
    eligible hosts per wave, per-host politeness budget k)."""
    from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
    from chronicrawl_spark.fixtures import synthetic_frontier, synthetic_site_for_frontier
    from chronicrawl_spark.tables import StateStore

    now = 1_600_000_000_000
    tmp = tempfile.mkdtemp(prefix="chronicrawl_bench_")
    store = StateStore(spark, os.path.join(tmp, "state"), buckets=32)
    origins, frontier = synthetic_frontier(spark, n_origins, locs, now)
    store.merge("origins", origins, "upsert")
    store.merge("frontier", frontier, "upsert")
    store.commit(0)
    site = synthetic_site_for_frontier(spark, n_origins)
    engine = CrawlEngine(spark, store, site, CrawlConfig(dedupe_server=False, dedupe_digest=False))
    engine.clock = now

    t0 = time.time()
    fetched = 0
    for _ in range(waves):
        s = engine.step(per_host_k=per_host_k, salt=salt)
        fetched += s.get("fetched", 0)
    dt = time.time() - t0
    return {"urls_fetched": fetched, "secs": round(dt, 3), "urls_per_sec": round(fetched / dt, 2)}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # best-of-R protocol (same as scripts/scaling_bench.py): same-config runs
    # on this shared VM drift ±25%, so a single timing is noise, not signal —
    # the minimum over R runs is the stable estimator of plan cost
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    from chronicrawl_spark.session import get_spark

    spark = get_spark("chronicrawl-bench", cpus=cpus)
    import __spark_entry__ as em

    q = em.queries()
    times = {}
    for name in HEADLINE:
        df = q[name](spark, sf_dir)
        _materialize(df)  # warm (plan + JIT + page cache)
        best = None
        for _ in range(repeats):
            t0 = time.time()
            _materialize(q[name](spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)

    crawl_runs = [crawl_throughput(spark) for _ in range(repeats)]
    crawl = max(crawl_runs, key=lambda c: c["urls_per_sec"])
    times["crawl_scheduler_3waves"] = crawl["secs"]

    total = round(sum(times.values()), 3)
    out = {
        "metric": "urls_scheduled_fetched_per_sec",
        "value": crawl["urls_per_sec"],
        "unit": "urls/sec",
        "queries": times,
        "sf": sf_dir,
        "cpus": cpus,
        "crawl": crawl,
        "crawl_runs": [c["secs"] for c in crawl_runs],
        "repeats": repeats,
        "total_query_sec": total,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
