#!/usr/bin/env python
"""Vacuum-bounded disk footprint over a long wave sequence (VERDICT r3 #8).

A continuous recrawl runs hundreds of waves against one state store; every
MERGE leaves the previous version's files behind by design (crash safety —
the old snapshot stays readable until commit), and every auto-compaction
(delta chains past K=8) orphans a whole base + chain generation.  Without
maintenance that is an O(waves) disk leak.  ``StateStore.vacuum`` is the
Iceberg expire_snapshots + remove_orphan_files analog; this bench runs the
SAME 20-wave crawl (waves kept full via due_per_host slivers — a drained
frontier produces empty waves that never trigger compaction and make the
contrast vacuous, the round-4 first-attempt mistake) twice:

  vacuum=1    vacuum(keep_snapshots=2) after every wave (steady-state mode)
  vacuum=off  no maintenance — the leak shape

and prints per-leg: seed bytes, per-wave du high-water mark, end bytes,
plus the orphan share (end_novac - end_vac).  Appends (visits/warc/metrics)
grow legitimately in both legs; vacuum bounds the *version/orphan* share.

Run: python scripts/disk_footprint_bench.py [n_origins locs waves k]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _du(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def run_leg(spark, seed_dir: str, waves: int, k: int, n_origins: int, vacuum_every: int | None):
    from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
    from chronicrawl_spark.fixtures import synthetic_site_for_frontier
    from chronicrawl_spark.tables import StateStore

    run_dir = tempfile.mkdtemp(prefix="diskbench_", dir="/dev/shm")
    shutil.copytree(seed_dir, run_dir + "/state")
    store = StateStore(spark, run_dir + "/state", buckets=16)
    site = synthetic_site_for_frontier(spark, n_origins)
    eng = CrawlEngine(spark, store, site, CrawlConfig(dedupe_server=False, dedupe_digest=False))
    eng.clock = 1_600_000_000_000

    seed_b = _du(run_dir + "/state")
    hwm = seed_b
    fetched = 0
    for i in range(waves):
        fetched += eng.step(per_host_k=k).get("fetched", 0)
        hwm = max(hwm, _du(run_dir + "/state"))
        if vacuum_every and (i + 1) % vacuum_every == 0:
            store.vacuum(keep_snapshots=2)
    end_b = _du(run_dir + "/state")
    shutil.rmtree(run_dir, ignore_errors=True)
    return {
        "vacuum": bool(vacuum_every),
        "waves": waves,
        "urls": fetched,
        "disk_seed_mb": round(seed_b / 1e6, 1),
        "disk_hwm_mb": round(hwm / 1e6, 1),
        "disk_end_mb": round(end_b / 1e6, 1),
    }


def main(argv):
    from chronicrawl_spark.fixtures import synthetic_frontier
    from chronicrawl_spark.session import get_spark
    from chronicrawl_spark.tables import StateStore

    n_origins = int(argv[0]) if argv else 500
    locs = int(argv[1]) if len(argv) > 1 else 1200
    waves = int(argv[2]) if len(argv) > 2 else 20
    k = int(argv[3]) if len(argv) > 3 else 50
    # keep every wave full: due rows per host must cover all waves
    assert locs >= waves * k, "frontier would drain mid-run (vacuous contrast)"

    spark = get_spark("disk-footprint", cpus=16,
                      extra_conf={"spark.local.dir": "/dev/shm/spark-local-disk"})
    seed_dir = tempfile.mkdtemp(prefix="diskseed_", dir="/dev/shm")
    store = StateStore(spark, seed_dir + "/state", buckets=16)
    origins, frontier = synthetic_frontier(
        spark, n_origins, locs, 1_600_000_000_000, due_per_host=waves * k
    )
    store.merge("origins", origins, "upsert")
    store.merge("frontier", frontier, "upsert")
    store.commit(0)

    out = {}
    for name, ve in (("vacuum_per_wave", 1), ("no_vacuum", None)):
        out[name] = run_leg(spark, seed_dir + "/state", waves, k, n_origins, ve)
        print("LEG", name, json.dumps(out[name]), flush=True)
    orphan = out["no_vacuum"]["disk_end_mb"] - out["vacuum_per_wave"]["disk_end_mb"]
    out["orphan_share_mb"] = round(orphan, 1)
    print("RESULT", json.dumps(out), flush=True)
    shutil.rmtree(seed_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
