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
    # the UNguarded word_jaccard is back in the headline: the r4-era "83 s
    # at sf0.1" measurement does not reproduce — re-measured r5 at a stable
    # 7.8-8.5 s across 6 runs (same operator code; the old figure was taken
    # in the same contaminated window whose driver snapshot ran 2-4× slow).
    # The corpus IS pathologically dense (~70% of pairs are true LSH
    # candidates) but the semi-join-pruned collect_set verify absorbs it;
    # the df-capped guarded variant remains the scale path for corpora
    # where even the true-candidate set is quadratic.
    "dedup_word_jaccard",
    "dedup_word_jaccard_guarded",
    "dedup_clusters",
    "phash_hamming_dups",
    "phash_clusters",
    "embed_cosine_topk",
    "ann_lsh_topk",
    "ann_multi_topk",
    "ivf_topk",
    "text_quality",
    "text_tokens_fingerprint",
    "crossmodal_dups",
    "aimd_backfill",
    # the north-rule image phase: fused decode → phash invariant →
    # thumbnail → quality metrics (fixture-scale; the at-scale curve is
    # scripts/decode_scaling_bench.py → BENCH/BASELINE.md)
    "image_decode_verify",
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


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # best-of-R plus median-of-R (same protocol as scripts/scaling_bench.py):
    # same-config runs on this shared VM drift ±25% (a single r4 driver
    # snapshot read 2-4× slow from co-tenant load alone), so a single timing
    # is noise.  Best estimates plan cost (noise only ever slows a run);
    # median shows how noisy the window was — a best/median gap ≫ 1 flags a
    # contaminated snapshot.
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    from chronicrawl_spark.session import get_spark

    spark = get_spark("chronicrawl-bench", cpus=cpus)
    import __spark_entry__ as em

    q = em.queries()
    times, medians = {}, {}
    for name in HEADLINE:
        df = q[name](spark, sf_dir)
        _materialize(df)  # warm (plan + JIT + page cache)
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            _materialize(q[name](spark, sf_dir))
            runs.append(time.time() - t0)
        times[name] = round(min(runs), 3)
        medians[name] = round(_median(runs), 3)

    crawl_runs = [crawl_throughput(spark) for _ in range(repeats)]
    crawl = max(crawl_runs, key=lambda c: c["urls_per_sec"])
    times["crawl_scheduler_3waves"] = crawl["secs"]
    medians["crawl_scheduler_3waves"] = round(_median([c["secs"] for c in crawl_runs]), 3)

    total = round(sum(times.values()), 3)
    out = {
        "metric": "urls_scheduled_fetched_per_sec",
        "value": crawl["urls_per_sec"],
        "unit": "urls/sec",
        "queries": times,
        "queries_median": medians,
        "sf": sf_dir,
        "cpus": cpus,
        "crawl": crawl,
        "crawl_urls_per_sec_median": round(_median([c["urls_per_sec"] for c in crawl_runs]), 2),
        "crawl_runs": sorted(c["secs"] for c in crawl_runs),
        "repeats": repeats,
        "total_query_sec": total,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
