#!/usr/bin/env python
"""Per-phase wave decomposition at two cluster sizes.

Uses the engine's built-in phase timing (crawl.py step() returns
``phase_secs``: wall clock around every driver-blocking action) to show
WHERE wave time goes at N vs 4N executors — which phases scale with cores
(data-dominated) and which are flat (the serial floor: driver planning,
stage scheduling, commit I/O).  The flat remainder bounds the achievable
N→4N efficiency on any machine: eff ≤ (s + p) / (4s + p)⁻¹-ish, so
shrinking s is the only plan-side lever once every data phase scales.

Run: python scripts/wave_profile.py [n_origins locs waves k]
Writes per-size phase tables to stdout (one JSON line per size).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, tempfile, shutil
sys.path.insert(0, REPO)
from chronicrawl_spark.session import get_spark
from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
from chronicrawl_spark.fixtures import synthetic_site_for_frontier, synthetic_frontier
from chronicrawl_spark.tables import StateStore

n_exec = int(sys.argv[1])
spark = get_spark(
    "wave-profile",
    cpus=n_exec * 4,
    master=f"local-cluster[{n_exec},4,5120]",
    extra_conf={"spark.local.dir": "/dev/shm/spark-local-prof" + str(n_exec),
                "spark.executor.memory": "5120m",
                "spark.driver.memory": "8g"},
)
_zip = shutil.make_archive(tempfile.mkdtemp() + "/chronicrawl_spark", "zip",
                           root_dir=REPO, base_dir="chronicrawl_spark")
spark.sparkContext.addPyFile(_zip)
run_dir = tempfile.mkdtemp(prefix="profrun_", dir="/dev/shm")
shutil.copytree(SEED_DIR, run_dir + "/state")
store = StateStore(spark, run_dir + "/state", buckets=32)
site = synthetic_site_for_frontier(spark, N_ORIGINS)
engine = CrawlEngine(spark, store, site, CrawlConfig(dedupe_server=False, dedupe_digest=False))
engine.clock = 1_600_000_000_000
engine.step(per_host_k=K)  # warmup
waves = []
for _ in range(WAVES):
    st = engine.step(per_host_k=K)
    waves.append(st.get("phase_secs", {}))
    store.vacuum(keep_snapshots=2)
agg = {}
for w in waves:
    for k, v in w.items():
        agg.setdefault(k, []).append(v)
print(json.dumps({"executors": n_exec,
                  "per_wave_total": [round(sum(w.values()), 2) for w in waves],
                  "phase_mean": {k: round(sum(v) / len(v), 2) for k, v in agg.items()},
                  "phase_all": agg}))
spark.stop()
shutil.rmtree(run_dir, ignore_errors=True)
"""


def main():
    args = sys.argv[1:]
    n_origins = int(args[0]) if args else 20000
    locs = int(args[1]) if len(args) > 1 else 2000
    waves = int(args[2]) if len(args) > 2 else 2
    k = int(args[3]) if len(args) > 3 else 250
    seed_dir = f"/dev/shm/scaling_seed_{n_origins}x{locs}"
    if not os.path.exists(os.path.join(seed_dir, "manifest.json")):
        sys.exit(f"seed missing: run scripts/scaling_bench.py first ({seed_dir})")
    params = (
        f"REPO = {REPO!r}\nSEED_DIR = {seed_dir!r}\nN_ORIGINS = {n_origins}\n"
        f"WAVES = {waves}\nK = {k}\n"
    )
    sizes = [int(s) for s in os.environ.get("PROF_SIZES", "1,4").split(",")]
    for s in sizes:
        out = subprocess.run(
            [sys.executable, "-c", params + CHILD, str(s)],
            capture_output=True, text=True, cwd=REPO,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            sys.stderr.write(out.stderr[-3000:])
            raise RuntimeError(f"size {s} produced no result")
        print(lines[-1])


if __name__ == "__main__":
    main()
