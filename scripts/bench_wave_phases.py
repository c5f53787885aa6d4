#!/usr/bin/env python
"""Per-phase decomposition of the bench.py crawl at bench parameters.

scripts/wave_profile.py answers "which phases scale 1→4 executors" at the
40M-row scaling workload; this answers the complementary question at the
HEADLINE benchmark's scale (bench.py crawl_throughput: 2000 origins × 50
locs, 3 waves, k=30 on local[32]): where does each wave's wall clock go,
and how much of the published urls/s number is the fixed serial floor
(driver planning, job launch, commit I/O) versus data phases.  Uses the
engine's always-on ``phase_secs`` timing — no engine changes, no extra
jobs.

Run: python scripts/bench_wave_phases.py [waves] [repeats]
Prints one JSON line per run plus a phase-mean summary.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    waves = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import tempfile
    import time

    from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
    from chronicrawl_spark.fixtures import synthetic_frontier, synthetic_site_for_frontier
    from chronicrawl_spark.session import get_spark
    from chronicrawl_spark.tables import StateStore

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-wave-phases", cpus=cpus)

    now = 1_600_000_000_000
    agg: dict[str, list[float]] = {}
    for r in range(repeats):
        tmp = tempfile.mkdtemp(prefix="phase_bench_")
        store = StateStore(spark, os.path.join(tmp, "state"), buckets=32)
        origins, frontier = synthetic_frontier(spark, 2000, 50, now)
        store.merge("origins", origins, "upsert")
        store.merge("frontier", frontier, "upsert")
        store.commit(0)
        site = synthetic_site_for_frontier(spark, 2000)
        engine = CrawlEngine(
            spark, store, site, CrawlConfig(dedupe_server=False, dedupe_digest=False)
        )
        engine.clock = now
        t0 = time.time()
        per_wave = []
        for _ in range(waves):
            s = engine.step(per_host_k=30)
            per_wave.append(s.get("phase_secs", {}))
        dt = time.time() - t0
        for w in per_wave:
            for k, v in w.items():
                agg.setdefault(k, []).append(v)
        print(
            json.dumps(
                {
                    "run": r,
                    "total_secs": round(dt, 2),
                    "waves": [
                        {k: round(v, 2) for k, v in w.items()} for w in per_wave
                    ],
                }
            )
        )
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    summary = {
        k: {
            "mean": round(sum(v) / len(v), 3),
            "min": round(min(v), 3),
            "max": round(max(v), 3),
        }
        for k, v in sorted(agg.items(), key=lambda kv: -sum(kv[1]))
    }
    print(json.dumps({"phase_summary": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
