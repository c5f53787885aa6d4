#!/usr/bin/env python
"""Machine-ceiling probe: how much do Spark's basic primitives themselves
scale from N to 4N executors on THIS box?

The wave engine's N→4N efficiency can't exceed what the hardware gives the
primitives it is made of (parquet scan+agg, hash shuffle, parquet write to
tmpfs).  All executors share one memory bus and one tmpfs, so these
saturate well below 4×.  This probe measures them standalone on the same
40M-row data, same local-cluster shape as scaling_bench.py, and reports the
per-primitive speedups — the normalization context for the crawl number in
BENCH/BASELINE.md.

Run:  python scripts/hw_ceiling_probe.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/dev/shm/hwprobe_40m"

CHILD = r"""
import json, sys, time
sys.path.insert(0, REPO)
from pyspark.sql import functions as F
from chronicrawl_spark.session import get_spark

n_exec = int(sys.argv[1])
spark = get_spark("hwprobe", cpus=n_exec * 4,
                  master=f"local-cluster[{n_exec},4,5120]",
                  extra_conf={"spark.local.dir": "/dev/shm/spark-hwprobe-" + str(n_exec),
                              "spark.executor.memory": "5120m"})
out = {"executors": n_exec}
df = spark.read.parquet(DATA)
df.count()  # warm page cache / codegen

t0 = time.time()
df.groupBy(F.pmod(F.col("k"), F.lit(1000)).alias("g")).agg(
    F.sum("v").alias("s"), F.count("*").alias("n")).write.format("noop").mode("overwrite").save()
out["scan_agg_s"] = round(time.time() - t0, 2)

t0 = time.time()
df.repartition(64, "k").write.format("noop").mode("overwrite").save()
out["shuffle_s"] = round(time.time() - t0, 2)

t0 = time.time()
df.repartition(32, "b").write.mode("overwrite").parquet("/dev/shm/hwprobe_out_" + str(n_exec))
out["pq_write_s"] = round(time.time() - t0, 2)

print(json.dumps(out))
spark.stop()
import shutil
shutil.rmtree("/dev/shm/hwprobe_out_" + str(n_exec), ignore_errors=True)
"""


def _run(n: int) -> dict:
    src = f"REPO = {REPO!r}\nDATA = {DATA!r}\n" + CHILD
    out = subprocess.run([sys.executable, "-c", src, str(n)], capture_output=True, text=True, cwd=REPO)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-3000:])
        raise RuntimeError("probe child failed")
    return json.loads(lines[-1])


def main():
    if not os.path.exists(os.path.join(DATA, "_SUCCESS")):
        src = (
            f"REPO = {REPO!r}\nDATA = {DATA!r}\n"
            + r"""
import sys
sys.path.insert(0, REPO)
from pyspark.sql import functions as F
from chronicrawl_spark.session import get_spark
spark = get_spark("hwprobe-seed", cpus=16)
(spark.range(40_000_000)
    .select(F.col("id").alias("k"), (F.col("id") % 32).alias("b"),
            (F.col("id") * 7 % 1000).cast("double").alias("v"),
            F.concat(F.lit("p"), F.col("id")).alias("s"))
    .repartition(32).write.mode("overwrite").parquet(DATA))
print("SEEDED")
spark.stop()
"""
        )
        subprocess.run([sys.executable, "-c", src], cwd=REPO, check=True)
    r1 = _run(1)
    r4 = _run(4)
    speedups = {
        m: round(r1[f"{m}_s"] / r4[f"{m}_s"], 2)
        for m in ("scan_agg", "shuffle", "pq_write")
    }
    result = {"N": r1, "4N": r4, "speedup_4x_cores": speedups,
              "efficiency": {m: round(v / 4.0, 3) for m, v in speedups.items()}}
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
