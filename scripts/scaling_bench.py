#!/usr/bin/env python
"""Two-parallelism scaling evidence (BASELINE.json north_rule).

A real cluster is unavailable in the sandbox, so per the driver's protocol
the same crawl-scheduler job runs at two local parallelism levels (N and 4N
cores) on the same input; throughput at both plus the scaling efficiency
(T_4N/T_N)/4 is written to BENCH/BASELINE.md.

Run:  python scripts/scaling_bench.py [n_origins locs waves per_host_k]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, %(repo)r)
from chronicrawl_spark.session import get_spark
from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
from chronicrawl_spark.fixtures import synthetic_frontier, synthetic_site_for_frontier
from chronicrawl_spark.tables import StateStore

cpus = int(sys.argv[1])
n_origins, locs, waves, k = %(n_origins)d, %(locs)d, %(waves)d, %(k)d
# tmpfs for state + shuffle: a cluster's storage bandwidth scales with
# executors; the sandbox's single disk does not — tmpfs removes that
# local-mode artifact so the measurement reflects compute/shuffle scaling
spark = get_spark("scaling-bench", cpus=cpus,
                  extra_conf={"spark.local.dir": "/dev/shm/spark-local-" + str(cpus)})
now = 1_600_000_000_000
tmp = tempfile.mkdtemp(prefix="scalebench_", dir="/dev/shm")
store = StateStore(spark, os.path.join(tmp, "state"), buckets=32)
origins, frontier = synthetic_frontier(spark, n_origins, locs, now)
store.merge("origins", origins, "upsert")
store.merge("frontier", frontier, "upsert")
store.commit(0)
site = synthetic_site_for_frontier(spark, n_origins)
engine = CrawlEngine(spark, store, site, CrawlConfig(dedupe_server=False, dedupe_digest=False))
engine.clock = now
# warmup wave (JIT, page cache) then timed waves
engine.step(per_host_k=k)
t0 = time.time(); fetched = 0
for _ in range(waves):
    fetched += engine.step(per_host_k=k).get("fetched", 0)
dt = time.time() - t0
print(json.dumps({"cpus": cpus, "urls": fetched, "secs": round(dt, 3),
                  "urls_per_sec": round(fetched / dt, 2)}))
spark.stop()
"""


def run_at(cpus: int, params: dict) -> dict:
    script = CHILD % params
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus)], capture_output=True, text=True, cwd=REPO
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    args = sys.argv[1:]
    n_origins = int(args[0]) if args else 4000
    locs = int(args[1]) if len(args) > 1 else 50
    waves = int(args[2]) if len(args) > 2 else 3
    k = int(args[3]) if len(args) > 3 else 4
    params = {"repo": REPO, "n_origins": n_origins, "locs": locs, "waves": waves, "k": k}

    n = int(os.environ.get("SCALE_N", "8"))
    r_n = run_at(n, params)
    r_4n = run_at(4 * n, params)
    eff = round(r_4n["urls_per_sec"] / r_n["urls_per_sec"] / 4.0, 3)
    result = {"N": r_n, "4N": r_4n, "scaling_efficiency": eff,
              "workload": {"origins": n_origins, "locs_per_origin": locs,
                            "waves": waves, "per_host_k": k,
                            "frontier_rows": n_origins * locs}}
    print(json.dumps(result, indent=2))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — crawl-scheduler throughput + scaling evidence

Same job, same input ({n_origins} origins x {locs} locations =
{n_origins * locs} frontier rows; {waves} timed waves after 1 warmup wave;
per-host politeness budget k={k}), run at two local parallelism levels per
the driver's sandbox protocol (no real cluster available).

| parallelism | URLs fetched | wall sec | URLs/sec |
|---|---|---|---|
| local[{n}] (N) | {r_n['urls']} | {r_n['secs']} | {r_n['urls_per_sec']} |
| local[{4*n}] (4N) | {r_4n['urls']} | {r_4n['secs']} | {r_4n['urls_per_sec']} |

**Scaling efficiency (T_4N/T_N)/4 = {eff}** (north_rule target >= 0.8 on a
real multi-executor cluster; local-mode numbers under-report scaling because
all "executors" share one JVM, one disk, and the driver-side wave loop —
the per-wave driver orchestration is constant-cost and becomes a smaller
fraction of wall time as the wave size grows).

Reference baseline: the reference crawler is strictly sequential (1 fetch
at a time, <= ~33 fetches/s implied by its 30 ms politeness cap —
BASELINE.md); any figure above that is a throughput win, achieved here by
parallelising across hosts while keeping per-host politeness exact.
"""
        )
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
