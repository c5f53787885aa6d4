"""Cuckoo URL-seen filter (operators/cuckoo.py): core invariants, the
distributed build/insert paths, crawl equivalence vs the exact anti-join,
and restart persistence — the same contract surface as the bloom filter,
plus DELETE (the capability bloom structurally lacks)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
from chronicrawl_spark.fixtures import test_server_site as make_site
from chronicrawl_spark.operators.cuckoo import (
    SLOTS,
    CuckooFull,
    build_cuckoo_sharded,
    contains,
    delete_collected,
    insert_collected,
    insert_keys,
    insert_sharded,
    split_by_cuckoo,
)
from chronicrawl_spark.tables import StateStore

T0 = 1_600_000_000_000


def test_cuckoo_core_no_false_negatives_and_fp_rate():
    rng = np.random.default_rng(7)
    n_buckets = 1 << 14
    keys = rng.choice(2**62, size=50_000, replace=False).astype(np.int64)  # ~76% load
    table = np.zeros((n_buckets, SLOTS), dtype=np.uint16)
    insert_keys(table, keys, n_buckets)
    planes = table[None, :, :]
    zeros = np.zeros(len(keys), dtype=np.int64)
    assert contains(planes, zeros, keys).all(), "false negative"
    miss = rng.choice(2**62, size=50_000).astype(np.int64) + 2**62
    fpr = contains(planes, np.zeros(len(miss), dtype=np.int64), miss).mean()
    assert fpr < 0.005  # theoretical ≈ 2·SLOTS/2^16 ≈ 0.012%


def test_cuckoo_delete_and_packing():
    rng = np.random.default_rng(3)
    n_buckets = 1 << 12
    keys = rng.choice(2**60, size=12_000, replace=False).astype(np.int64)
    table = np.zeros((n_buckets, SLOTS), dtype=np.uint16)
    insert_keys(table, keys, n_buckets)
    planes = table[None, :, :]
    half = keys[:6_000]
    removed = delete_collected(planes, [(0, int(k)) for k in half], n_buckets)
    assert removed == 6_000
    rest = keys[6_000:]
    assert contains(planes, np.zeros(len(rest), dtype=np.int64), rest).all(), (
        "delete broke a remaining key (false negative)"
    )
    # deleted keys are gone modulo the filter's FP rate
    still = contains(planes, np.zeros(len(half), dtype=np.int64), half).mean()
    assert still < 0.005
    # packed invariant: occupied slots are a prefix of every bucket
    occ = (planes[0] != 0).astype(int)
    assert (np.diff(occ, axis=1) <= 0).all()
    # and a delete is reversible: reinsert, present again
    insert_collected(planes, [(0, int(k)) for k in half], n_buckets)
    assert contains(planes, np.zeros(len(half), dtype=np.int64), half).all()


def test_cuckoo_overflow_raises():
    tiny = np.zeros((1 << 4, SLOTS), dtype=np.uint16)
    rng = np.random.default_rng(1)
    with pytest.raises(CuckooFull):
        insert_keys(tiny, rng.choice(2**60, size=200).astype(np.int64), 1 << 4)


def test_cuckoo_distributed_build_and_split(spark):
    """Distributed sharded build → split: all inserted keys land in
    maybe_seen (no false negatives), nearly all unseen keys are
    definite-new — the same assertions test_bloom_split makes."""
    seen_df = spark.range(0, 2000).select(
        (F.col("id") * 7919).alias("origin_id"), (F.col("id") * 104729).alias("path_id")
    )
    key = F.xxhash64("origin_id", "path_id")
    planes = build_cuckoo_sharded(
        seen_df.select(
            F.pmod(F.col("origin_id"), F.lit(2)).alias("shard"), key.alias("key")
        ),
        "key",
        "shard",
        n_shards=2,
        n_buckets=1 << 12,
    )
    cands = spark.range(0, 4000).select(
        (F.col("id") * 7919).alias("origin_id"), (F.col("id") * 104729).alias("path_id")
    )
    new, maybe = split_by_cuckoo(spark, cands, planes)
    n_new, n_maybe = new.count(), maybe.count()
    assert n_new + n_maybe == 4000
    maybe_keys = {(r["origin_id"], r["path_id"]) for r in maybe.collect()}
    seen_keys = {(r["origin_id"], r["path_id"]) for r in seen_df.collect()}
    assert seen_keys <= maybe_keys
    assert n_new >= 1990  # FP rate ≪ bloom's at the same size


def test_cuckoo_insert_sharded_equals_collected(spark):
    """The one-task-per-shard distributed incremental insert must leave the
    filter probe-equivalent to the driver-side collected insert."""
    rng = np.random.default_rng(11)
    n_buckets = 1 << 12
    base = rng.choice(2**60, size=5_000, replace=False).astype(np.int64)
    planes = np.zeros((2, n_buckets, SLOTS), dtype=np.uint16)
    for s in (0, 1):
        insert_keys(planes[s], base[base % 2 == s], n_buckets)
    delta = rng.choice(2**60, size=3_000).astype(np.int64) + 2**60
    rows = [(int(k % 2), int(k)) for k in delta]
    a = insert_collected(planes.copy(), rows, n_buckets)
    df = spark.createDataFrame(rows, "shard long, key long")
    b = insert_sharded(spark, planes.copy(), df, "key", "shard", n_buckets)
    sh = (delta % 2).astype(np.int64)
    assert contains(a, sh, delta).all() and contains(b, sh, delta).all()
    bsh = (base % 2).astype(np.int64)
    assert contains(a, bsh, base).all() and contains(b, bsh, base).all()
    # probe-equivalence on a random probe set (slot ORDER may differ — the
    # sequential and bulk paths interleave evictions differently — but the
    # membership answer must not)
    probe = rng.choice(2**61, size=20_000).astype(np.int64)
    psh = (probe % 2).astype(np.int64)
    assert (contains(a, psh, probe) == contains(b, psh, probe)).all()


def test_cuckoo_enabled_crawl_identical(spark, tmp_path):
    """seen_filter='cuckoo' must leave crawl results bit-identical to the
    filterless exact path (FPs fall through to the exact anti-join; the
    insert-once discipline never loses a key)."""
    site = make_site(spark, "http://test.example")

    def crawl(mode_dir, **cfg):
        store = StateStore(spark, str(tmp_path / mode_dir), buckets=4)
        eng = CrawlEngine(spark, store, site, CrawlConfig(**cfg))
        eng.add_seeds(["http://test.example"], now=T0)
        eng.run(max_waves=9, k_origins=1, per_host_k=1)
        return store

    plain = crawl("plain", use_bloom=False)
    cuckooed = crawl(
        "cuckooed", seen_filter="cuckoo", cuckoo_buckets=1 << 10, bloom_shards=2
    )
    a = sorted(
        (r["origin_id"], r["path_id"], r["date"], r["status"])
        for r in plain.read("visits").collect()
    )
    b = sorted(
        (r["origin_id"], r["path_id"], r["date"], r["status"])
        for r in cuckooed.read("visits").collect()
    )
    assert a == b
    fa = sorted(
        (r["origin_id"], r["path_id"], r["next_visit"])
        for r in plain.read("frontier").collect()
    )
    fb = sorted(
        (r["origin_id"], r["path_id"], r["next_visit"])
        for r in cuckooed.read("frontier").collect()
    )
    assert fa == fb


def test_cuckoo_persisted_across_restart(spark, tmp_path, monkeypatch):
    """Restart must reload committed cuckoo planes from the store (kind and
    geometry checked via the persisted meta) — no full-frontier rebuild —
    and the resumed crawl must be identical."""
    from chronicrawl_spark.operators import cuckoo as cuckoo_mod

    ORIGIN = "http://test.example"
    cfg = dict(seen_filter="cuckoo", cuckoo_buckets=1 << 10, bloom_shards=2)
    store = StateStore(spark, str(tmp_path / "state"), buckets=8)
    engine = CrawlEngine(spark, store, make_site(spark, ORIGIN), CrawlConfig(**cfg))
    engine.add_seeds([ORIGIN], now=T0)
    engine.run(max_waves=3, k_origins=1, per_host_k=1)
    wave3 = store.committed_wave
    assert engine._bloom_bits is not None and engine._bloom_bits.dtype == np.uint16
    saved = store.load_bloom(engine._bloom_meta())
    assert saved is not None and np.array_equal(saved, engine._bloom_bits)
    # a bloom-geometry meta must NOT load cuckoo planes
    assert store.load_bloom({"kind": "bloom", "n_bits": 1 << 24}) is None

    engine.run(max_waves=9, k_origins=1, per_host_k=1)
    final_visits = sorted(
        (r["date"], r["path_id"], r["status"]) for r in store.read("visits").collect()
    )

    store2 = StateStore(spark, str(tmp_path / "state"), buckets=8)
    store2.resume_from(wave3)
    calls = {"n": 0}
    real_build = cuckoo_mod.build_cuckoo_sharded

    def counting_build(*a, **kw):
        calls["n"] += 1
        return real_build(*a, **kw)

    monkeypatch.setattr(cuckoo_mod, "build_cuckoo_sharded", counting_build)
    engine2 = CrawlEngine(spark, store2, make_site(spark, ORIGIN), CrawlConfig(**cfg))
    assert engine2._bloom_bits is not None  # loaded from the manifest blob
    engine2.run(max_waves=9, k_origins=1, per_host_k=1)
    assert calls["n"] == 0
    resumed_visits = sorted(
        (r["date"], r["path_id"], r["status"]) for r in store2.read("visits").collect()
    )
    assert resumed_visits == final_visits


def test_cuckoo_delete_sharded_equals_collected(spark):
    """The one-task-per-shard distributed delete (the retire path a bloom
    filter cannot serve without a full rebuild) must be probe-equivalent to
    the driver-side collected delete: retired keys gone (mod FP rate),
    survivors never lose membership, packing preserved per bucket."""
    from chronicrawl_spark.operators.cuckoo import delete_sharded

    rng = np.random.default_rng(19)
    n_buckets = 1 << 12
    keys = rng.choice(2**60, size=10_000, replace=False).astype(np.int64)
    planes = np.zeros((2, n_buckets, SLOTS), dtype=np.uint16)
    for s in (0, 1):
        insert_keys(planes[s], keys[keys % 2 == s], n_buckets)
    retire = keys[:4_000]
    keep = keys[4_000:]
    rows = [(int(k % 2), int(k)) for k in retire]
    a = planes.copy()
    delete_collected(a, rows, n_buckets)
    df = spark.createDataFrame(rows, "shard long, key long")
    b = delete_sharded(spark, planes.copy(), df, "key", "shard", n_buckets)
    ksh = (keep % 2).astype(np.int64)
    assert contains(a, ksh, keep).all() and contains(b, ksh, keep).all(), (
        "delete broke a surviving key (false negative)"
    )
    rsh = (retire % 2).astype(np.int64)
    assert contains(b, rsh, retire).mean() < 0.005
    # probe-equivalence on a random set (slot layout may differ; answers not)
    probe = rng.choice(2**61, size=20_000).astype(np.int64)
    psh = (probe % 2).astype(np.int64)
    assert (contains(a, psh, probe) == contains(b, psh, probe)).all()
    # packed invariant holds on both shards after the distributed delete
    for s in (0, 1):
        occ = (b[s] != 0).astype(int)
        assert (np.diff(occ, axis=1) <= 0).all()
