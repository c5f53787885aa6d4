#!/usr/bin/env python
"""Extra benchmarks (guide §1.4): per-query noop-sink isolation.

``bench.py`` is the FROZEN driver contract; this harness exists for
optimization work: it times any subset of the declared queries with the
noop sink (computation only, no output cost), warm best/median-of-R, and
optionally dumps the formatted physical plan next to the timing.  The
OPTIMIZATION_r06.md before/after query numbers come from this
methodology (same session, warm, best-of-R).

Usage:
  SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
      python bench_extra.py [query ...]        # default: all declared
  python bench_extra.py --plans-dir plans/tmp dedup_word_jaccard

Prints one JSON line: {"queries": {name: {"best": s, "median": s}}, ...}.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all)")
    ap.add_argument("--repeats", type=int, default=int(os.environ.get("BENCH_REPEATS", "3")))
    ap.add_argument("--plans-dir", default=None, help="also write explain('formatted') per query")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from chronicrawl_spark.session import get_spark

    spark = get_spark("chronicrawl-bench-extra", cpus=cpus)
    import __spark_entry__ as em

    q = em.queries()
    names = args.queries or list(q)
    out: dict = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        df = q[name](spark, sf_dir)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        df.write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(args.repeats):
            t0 = time.time()
            q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        runs.sort()
        out[name] = {
            "best": round(runs[0], 3),
            "median": round(runs[len(runs) // 2], 3),
        }
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": out, "sf": sf_dir, "cpus": cpus, "repeats": args.repeats}))
    spark.stop()


if __name__ == "__main__":
    main()
