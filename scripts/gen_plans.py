#!/usr/bin/env python
"""Regenerate docs/PLANS.txt — the physical plans the plan-regression tests
pin (pushdown, pruning, broadcast shapes, single-shuffle windows)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "f9_pushdown_scan",
    "w2_wave_select",
    "j3_cdx_star",
    "j5_urlseen_antijoin",
    "j6_asof_furthest",
    "dedup_ngram_jaccard",
    "ann_multi_topk",
    "crossmodal_dups",
]


def main():
    from chronicrawl_spark.plans.inspect import formatted_plan
    from chronicrawl_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark("gen-plans", cpus=8)
    sf = "/root/testdata/sf0.01"
    out = ["Physical plans captured via .explain('formatted') — regression-tested in tests/test_plans.py\n"]
    q = em.queries()
    for name in QUERIES:
        out.append(name)
        out.append(formatted_plan(q[name](spark, sf)))
        out.append("")

    # the engine's own wave-selection path
    import tempfile

    from chronicrawl_spark.fixtures import synthetic_frontier
    from chronicrawl_spark.operators.wave import select_wave
    from chronicrawl_spark.tables import StateStore

    store = StateStore(spark, tempfile.mkdtemp() + "/state", buckets=8)
    origins, frontier = synthetic_frontier(spark, 50, 40, 1_600_000_000_000)
    store.merge("origins", origins, "upsert")
    store.merge("frontier", frontier, "upsert")
    store.commit(0)
    wave = select_wave(
        store.read("frontier"), store.read("origins"), store.read("sitemap_entries"),
        wave_ts=1_600_000_000_000, k=2,
        # fixture dims are known-small; the engine derives these flags from
        # manifest bytes (StateStore.table_bytes) — defaults are False
        broadcast_origins=True, broadcast_sitemap=True,
    )
    out.append("engine_select_wave")
    out.append(formatted_plan(wave))

    # MoR dirty read, small-delta regime: broadcast anti/semi split of the
    # base (no base shuffle, pushdown intact on the untouched-keys branch)
    from pyspark.sql import functions as F

    delta = frontier.limit(5).withColumn("next_visit", F.lit(9_999_999_999_999))
    store.merge("frontier", delta, "upsert")
    store.commit(1)
    out.append("mor_frontier_read_smalldelta (due-filter over base+delta chain)")
    out.append(
        formatted_plan(
            store.read("frontier").filter(F.col("next_visit") <= F.lit(1_600_000_000_000))
        )
    )

    # retirement (delete_where) interior: the kept-rows plan — base scan
    # lists ONLY the touched bucket's files (bucket pruning by explicit
    # path list), keys broadcast, LeftAnti — the O(touched buckets) shape
    # the retire bench measures (BENCH/BASELINE.md retirement section)
    from chronicrawl_spark.tables import MUTABLE_TABLES

    fschema, fkeys = MUTABLE_TABLES["frontier"]
    one_origin = store.read("frontier").limit(1).collect()[0]
    keys_df = spark.createDataFrame(
        [(one_origin["origin_id"], one_origin["path_id"])], "origin_id long, path_id long"
    )
    touched = str(int(one_origin["origin_id"]) % store.buckets)
    bmap = store._staged["mutable"]["frontier"]
    kept = (
        store._base_scan("frontier", {touched: bmap[touched]}, fschema)
        .join(F.broadcast(keys_df), fkeys, "left_anti")
    )
    out.append("delete_where_kept (retirement: touched-bucket-only scan + broadcast anti-join)")
    out.append(formatted_plan(kept))

    # WARC export: cogroup on the exchange-key shard — payload blobs cross
    # exactly one exchange; no join operator (test_plans pins this)
    from chronicrawl_spark.warcfile import warc_export

    out.append("warc_export (cogroup: single payload shuffle, local status merge)")
    out.append(
        formatted_plan(warc_export(store.read("warc_records"), store.read("visits")))
    )

    # training-shard export: cogroup on shard=f(image_id) — payload bytes
    # cross exactly one exchange; kept-filter is a local isin (test_plans)
    from pyspark.sql import types as T2

    from chronicrawl_spark.extras.training_export import (
        _shard_col,
        select_training_set,
    )
    from chronicrawl_spark.fixtures import make_images

    imgs = make_images(spark, n=4, w=16, h=12)
    kept, _rej = select_training_set(imgs)
    exp_schema = T2.StructType(
        list(imgs.schema.fields) + [T2.StructField("shard", T2.IntegerType())]
    )
    exp = (
        imgs.withColumn("shard", _shard_col(4)).groupBy("shard")
        .cogroup(
            kept.select("image_id").withColumn("shard", _shard_col(4)).groupBy("shard")
        )
        .applyInPandas(lambda l, r: l, schema=exp_schema)
    )
    out.append("training_export (cogroup: single payload shuffle, local kept-filter)")
    out.append(formatted_plan(exp))
    with open(os.path.join(REPO, "docs", "PLANS.txt"), "w") as f:
        f.write("\n".join(out))
    print("wrote docs/PLANS.txt")
    spark.stop()


if __name__ == "__main__":
    main()
