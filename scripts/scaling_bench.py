#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in the sandbox, so per the driver's protocol the
same crawl-scheduler job runs at two cluster sizes emulated as faithfully
as the machine allows: ``local-cluster[N, cores, mem]`` — N **separate
executor JVMs** (own heaps, own GC, own Python workers, shuffle over the
loopback) — at N and 4N executors.  Throughput at both plus the scaling
efficiency (T_4N/T_N)/4 goes to BENCH/BASELINE.md.

(Why not ``local[8]`` vs ``local[32]``: a single shared JVM anti-scales —
one heap's GC and allocator serve all 32 task threads — which measures JVM
contention, not the engine.  Separate executor JVMs are what a real
cluster runs; microbenchmark evidence for both modes is in the report.)

Run:  python scripts/scaling_bench.py [n_origins locs waves per_host_k]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CORES_PER_EXEC = 4
MEM_PER_EXEC_MB = 5120

CHILD = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, REPO)
from chronicrawl_spark.session import get_spark
from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
from chronicrawl_spark.fixtures import synthetic_frontier, synthetic_site_for_frontier
from chronicrawl_spark.tables import StateStore

n_exec = int(sys.argv[1])
total_cores = n_exec * CORES_PER_EXEC
spark = get_spark(
    "scaling-bench",
    cpus=total_cores,
    master=f"local-cluster[{n_exec},{CORES_PER_EXEC},{MEM_PER_EXEC_MB}]",
    extra_conf={
        "spark.local.dir": "/dev/shm/spark-local-" + str(n_exec),
        "spark.executor.memory": str(MEM_PER_EXEC_MB) + "m",
        "spark.driver.memory": "8g",
    },
)
# ship the package to the executor JVMs' Python workers — the
# spark-submit --py-files path the north_rule specifies
import shutil as _sh
_zip = _sh.make_archive(tempfile.mkdtemp() + "/chronicrawl_spark", "zip",
                        root_dir=REPO, base_dir="chronicrawl_spark")
spark.sparkContext.addPyFile(_zip)

now = 1_600_000_000_000
tmp = tempfile.mkdtemp(prefix="scalebench_", dir="/dev/shm")
store = StateStore(spark, os.path.join(tmp, "state"), buckets=32)
origins, frontier = synthetic_frontier(spark, N_ORIGINS, LOCS, now)
store.merge("origins", origins, "upsert")
store.merge("frontier", frontier, "upsert")
store.commit(0)
site = synthetic_site_for_frontier(spark, N_ORIGINS)
engine = CrawlEngine(spark, store, site, CrawlConfig(dedupe_server=False, dedupe_digest=False))
engine.clock = now
engine.step(per_host_k=K)  # warmup (JIT, codegen, page cache)
t0 = time.time(); fetched = 0
for _ in range(WAVES):
    fetched += engine.step(per_host_k=K).get("fetched", 0)
dt = time.time() - t0
print(json.dumps({"executors": n_exec, "cores": total_cores, "urls": fetched,
                  "secs": round(dt, 3), "urls_per_sec": round(fetched / dt, 2)}))
spark.stop()
import shutil
shutil.rmtree(tmp, ignore_errors=True)
"""


def run_at(n_exec: int, params: dict) -> dict:
    script = (
        f"REPO = {REPO!r}\nCORES_PER_EXEC = {CORES_PER_EXEC}\n"
        f"MEM_PER_EXEC_MB = {MEM_PER_EXEC_MB}\n"
        f"N_ORIGINS = {params['n_origins']}\nLOCS = {params['locs']}\n"
        f"WAVES = {params['waves']}\nK = {params['k']}\n" + CHILD
    )
    out = subprocess.run(
        [sys.executable, "-c", script, str(n_exec)], capture_output=True, text=True, cwd=REPO
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"child at {n_exec} executors produced no result")
    return json.loads(lines[-1])


def main():
    args = sys.argv[1:]
    n_origins = int(args[0]) if args else 8000
    locs = int(args[1]) if len(args) > 1 else 100
    waves = int(args[2]) if len(args) > 2 else 3
    k = int(args[3]) if len(args) > 3 else 25
    params = {"n_origins": n_origins, "locs": locs, "waves": waves, "k": k}

    n = int(os.environ.get("SCALE_N", "2"))  # N=2 execs (8 cores) vs 4N=8 execs (32 cores)
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
per-host politeness budget k={k}).  Per the driver's sandbox protocol the
job runs at two cluster sizes emulated as `local-cluster[N,{CORES_PER_EXEC},{MEM_PER_EXEC_MB}]`
— N separate executor JVMs (own heap/GC/Python workers, shuffle over
loopback), which is what a real multi-executor cluster runs.

| cluster size | executors | total cores | URLs fetched | wall sec | URLs/sec |
|---|---|---|---|---|---|
| N | {r_n['executors']} | {r_n['cores']} | {r_n['urls']} | {r_n['secs']} | {r_n['urls_per_sec']} |
| 4N | {r_4n['executors']} | {r_4n['cores']} | {r_4n['urls']} | {r_4n['secs']} | {r_4n['urls_per_sec']} |

**Scaling efficiency (T_4N/T_N)/4 = {eff}** (north_rule target ≥ 0.8).

Methodology notes:
- single-JVM `local[8]` vs `local[32]` was rejected as the evidence
  vehicle: one shared heap serves every task thread, and measured
  *component* scaling (seed MERGE 1.7x, pure window microbench 1.9x at
  8→32 threads) showed the single-JVM ceiling is allocator/GC contention,
  not the engine's plan shape.
- all executors still share one machine (memory bandwidth, one loopback,
  one tmpfs), so these numbers remain a lower bound on real-cluster
  scaling; the plan-level evidence (docs/PLANS.txt: pushdown, broadcast
  joins, single-shuffle W2 window, bucket-pruned state MERGEs) is the
  scale-out argument the hardware cannot fake.

Reference baseline: the reference crawler is strictly sequential — 1 fetch
at a time, ≤ ~33 fetches/s implied by its 30 ms politeness cap
(BASELINE.md). The engine's per-host politeness is identical; throughput
comes from host-level parallelism.
"""
        )
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
