"""Bucket-count evolution: ``StateStore.rebucket`` (Iceberg partition-spec-
evolution analog) and manifest-wins-on-reopen.  The reference has no analog
(H2 re-indexes internally, ``schema.sql:131``); this is the scale-side path
for a frontier that grows 10^7 → 10^10 rows: mutable tables rewrite ONCE
under the new count, append-table history is never rewritten — pruned reads
translate want-sets per wave through the recorded historical count."""

import os

import pyspark.sql.functions as F
import pytest

from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
from chronicrawl_spark.fixtures import test_server_site as make_site
from chronicrawl_spark.tables import APPEND_TABLES, MUTABLE_TABLES, StateStore

T0 = 1_600_000_000_000
ORIGIN = "http://test.example"


def _frontier_df(spark, ids, next_visit=T0):
    schema, _keys = MUTABLE_TABLES["frontier"]
    rows = [
        (oid, pid, f"/p{pid}", "PAGE", 0, None, None, T0, None, next_visit)
        for oid, pid in ids
    ]
    return spark.createDataFrame(rows, schema)


def test_reopen_adopts_manifest_buckets(spark, tmp_path):
    """The on-disk layout's bucket count wins over the constructor arg —
    a mismatched reopen must not silently mis-bucket merges and prunes."""
    store = StateStore(spark, str(tmp_path / "state"), buckets=4)
    store.merge("frontier", _frontier_df(spark, [(o, 0) for o in range(8)]), "upsert")
    store.commit(0)
    reopened = StateStore(spark, str(tmp_path / "state"))  # default arg is 32
    assert reopened.buckets == 4
    # a merge through the reopened store lands in the 4-bucket layout and
    # resolves against the existing base (upsert wins)
    reopened.merge("frontier", _frontier_df(spark, [(1, 0)], next_visit=T0 + 7), "upsert")
    nv = {
        (r["origin_id"], r["path_id"]): r["next_visit"]
        for r in reopened.read_staged("frontier").collect()
    }
    assert len(nv) == 8 and nv[(1, 0)] == T0 + 7


def test_rebucket_store_invariants(spark, tmp_path):
    """rebucket(4→8): mutable rows survive byte-identically (outstanding
    delta chains fold in first), chains reset, history prune-reads stay
    correct across the epoch boundary, non-multiple counts are rejected,
    and commit+reopen adopts the new count."""
    store = StateStore(spark, str(tmp_path / "state"), buckets=4)
    store.merge(
        "frontier",
        _frontier_df(spark, [(o, p) for o in range(16) for p in range(3)]),
        mode="insert_if_absent",
    )
    # an unfolded delta chain that rebucket must resolve newest-wins
    store.merge("frontier", _frontier_df(spark, [(5, 1)], next_visit=T0 + 11), "upsert")
    # bucketed append history written under the OLD count (full visit
    # schema, non-key columns null)
    def visits_df(dates):
        base = spark.createDataFrame(
            [(o, 0, d, 200) for o, d in dates],
            "origin_id long, path_id long, date long, status int",
        )
        have = set(base.columns)
        return base.select(
            *[
                F.col(f.name) if f.name in have else F.lit(None).cast(f.dataType).alias(f.name)
                for f in APPEND_TABLES["visits"].fields
            ]
        )

    store.append("visits", visits_df([(o, T0 + o) for o in range(16)]), wave=0)
    before = {
        (r["origin_id"], r["path_id"]): r["next_visit"]
        for r in store.read_staged("frontier").collect()
    }

    with pytest.raises(ValueError):
        store.rebucket(6)  # not a multiple of 4
    with pytest.raises(ValueError):
        store.rebucket(4)  # not larger

    stats = store.rebucket(8)
    assert store.buckets == 8
    assert stats["frontier"] == 8  # 16 origins cover all 8 new buckets
    after = {
        (r["origin_id"], r["path_id"]): r["next_visit"]
        for r in store.read_staged("frontier").collect()
    }
    assert after == before and after[(5, 1)] == T0 + 11
    assert all(not ch for ch in store._staged["mutable_deltas"]["frontier"].values())
    # the rewritten base physically lives under the 8-bucket layout
    v = store._staged["mutable"]["frontier"]["7"]
    assert os.path.isdir(str(tmp_path / "state" / "frontier" / f"v{v}" / "bucket=7"))

    # post-rebucket merges land under the new bucketing
    store.merge("frontier", _frontier_df(spark, [(7, 9)]), "insert_if_absent")
    assert store.read_staged("frontier").count() == 49

    # history written at count=4 + a new wave at count=8: a want-set
    # computed under the CURRENT count must still reach the old files.
    store.append("visits", visits_df([(o, T0 + 100 + o) for o in range(16)]), wave=1)
    store.commit(1)
    # origin 6: old bucket 6%4=2, new bucket 6%8=6 — disjoint ids, so an
    # untranslated prune would read ZERO wave-0 files for it
    got = sorted(
        r["date"] for r in store.read_pruned("visits", [6 % store.buckets])
        .filter(F.col("origin_id") == 6).collect()
    )
    assert got == [T0 + 6, T0 + 106]

    reopened = StateStore(spark, str(tmp_path / "state"), buckets=4)  # stale arg
    assert reopened.buckets == 8
    assert reopened.read("frontier").count() == 49


def test_rebucket_mid_crawl_parity(spark, tmp_path):
    """The strong invariant: a crawl that rebuckets mid-run produces the
    BYTE-IDENTICAL visit trace of one that never does — bucket layout is
    physical, never semantic."""
    def crawl(path, rebucket_after):
        store = StateStore(spark, path, buckets=2)
        eng = CrawlEngine(
            spark, store, make_site(spark), CrawlConfig(initial_revisit_html_ms=60, min_revisit_ms=1)
        )
        eng.add_seeds([ORIGIN], now=T0)
        eng.run(max_waves=3, k_origins=1, per_host_k=2)
        if rebucket_after:
            store.rebucket(8)
        eng.run(max_waves=3, k_origins=1, per_host_k=2)
        return sorted(
            (r["origin_id"], r["path_id"], r["date"], r["status"])
            for r in store.read("visits").collect()
        )

    plain = crawl(str(tmp_path / "a"), rebucket_after=False)
    evolved = crawl(str(tmp_path / "b"), rebucket_after=True)
    assert plain == evolved and len(plain) > 0


def test_auto_rebucket_in_wave_loop(spark, tmp_path):
    """``CrawlConfig.auto_rebucket_bytes``: the engine doubles the bucket
    count inside the wave loop when per-bucket bytes exceed the threshold
    (staged, published with the wave's commit) — and the visit trace stays
    byte-identical to a fixed-layout crawl."""
    def crawl(path, auto):
        store = StateStore(spark, path, buckets=2)
        cfg = CrawlConfig(
            initial_revisit_html_ms=60, min_revisit_ms=1,
            auto_rebucket_bytes=1 if auto else 0,  # any data at all triggers
        )
        eng = CrawlEngine(spark, store, make_site(spark), cfg)
        eng.add_seeds([ORIGIN], now=T0)
        waves = eng.run(max_waves=4, k_origins=1, per_host_k=2)
        trace = sorted(
            (r["origin_id"], r["path_id"], r["date"], r["status"])
            for r in store.read("visits").collect()
        )
        return store, waves, trace

    s_plain, _, plain = crawl(str(tmp_path / "a"), auto=False)
    s_auto, waves, auto = crawl(str(tmp_path / "b"), auto=True)
    assert plain == auto and len(plain) > 0
    assert s_plain.buckets == 2 and s_auto.buckets > 2
    assert any("rebucket" in (w.get("phase_secs") or {}) for w in waves)
    # the evolution was committed: a reopen adopts the grown count
    assert StateStore(spark, str(tmp_path / "b")).buckets == s_auto.buckets
