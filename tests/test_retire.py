"""Frontier retirement: ``StateStore.delete_where`` (bucket-pruned COW
delete) and ``CrawlEngine.retire_locations`` — the maintenance op the
cuckoo URL-seen filter exists for.  The reference never deletes locations
(its seen-set IS the location table's insert-if-absent PK,
``Database.java:229-251``); retirement is the scale-side addition, so the
contract under test is ours: retired rows leave the frontier, retired keys
leave the cuckoo filter (bloom keeps them as permanent-FP, by design), and
a later re-discovery makes the URL eligible and fetched again on BOTH
filter kinds."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
from chronicrawl_spark.fixtures import test_server_site as make_site
from chronicrawl_spark.operators.cuckoo import contains
from chronicrawl_spark.tables import MUTABLE_TABLES, StateStore

T0 = 1_600_000_000_000
ORIGIN = "http://test.example"


def _frontier_df(spark, ids, next_visit=T0):
    schema, _keys = MUTABLE_TABLES["frontier"]
    rows = [
        (oid, pid, f"/p{pid}", "PAGE", 0, None, None, T0, None, next_visit)
        for oid, pid in ids
    ]
    return spark.createDataFrame(rows, schema)


def test_delete_where_cow(spark, tmp_path):
    """Store-level COW delete: only buckets containing delete keys are
    rewritten; outstanding delta chains on touched buckets fold in first
    (newest-wins); a fully-emptied bucket drops out of the manifest; the
    deleted key can be re-inserted afterwards; the post-delete state
    survives commit + reopen."""
    store = StateStore(spark, str(tmp_path / "state"), buckets=4)
    # origins 0..7 → buckets 0..3 twice over; 5 paths each
    store.merge(
        "frontier",
        _frontier_df(spark, [(o, p) for o in range(8) for p in range(5)]),
        mode="insert_if_absent",
    )
    # a delta chain on bucket 1: upsert key (1,0) with a moved next_visit
    store.merge("frontier", _frontier_df(spark, [(1, 0)], next_visit=T0 + 5), mode="upsert")
    bmap = store._staged["mutable"]["frontier"]
    untouched_versions = {b: v for b, v in bmap.items() if b in ("0", "2")}

    keys = spark.createDataFrame([(1, 0), (1, 1), (3, 2)], "origin_id long, path_id long")
    stats = store.delete_where("frontier", keys)
    assert stats == {"buckets": 2, "rows_deleted": 3}

    left = {(r["origin_id"], r["path_id"]) for r in store.read_staged("frontier").collect()}
    assert len(left) == 37
    assert not {(1, 0), (1, 1), (3, 2)} & left
    # untouched buckets were NOT rewritten; touched buckets' chains cleared
    assert {b: v for b, v in bmap.items() if b in ("0", "2")} == untouched_versions
    assert store._staged["mutable_deltas"]["frontier"]["1"] == []
    # the delta that was folded in still wins for the surviving key (1,5)... none;
    # check the upsert didn't resurrect the deleted key
    nv = {
        (r["origin_id"], r["path_id"]): r["next_visit"]
        for r in store.read_staged("frontier").collect()
    }
    assert (1, 0) not in nv

    # empty bucket 2 completely (origins 2 and 6, all 5 paths each)
    keys2 = spark.createDataFrame(
        [(o, p) for o in (2, 6) for p in range(5)], "origin_id long, path_id long"
    )
    stats2 = store.delete_where("frontier", keys2)
    assert stats2 == {"buckets": 1, "rows_deleted": 10}
    assert "2" not in store._staged["mutable"]["frontier"]
    assert store.read_staged("frontier").count() == 27

    # re-insert a previously deleted key: insert-if-absent lands it again
    store.merge("frontier", _frontier_df(spark, [(1, 0)], next_visit=T0 + 99), mode="insert_if_absent")
    nv = {
        (r["origin_id"], r["path_id"]): r["next_visit"]
        for r in store.read_staged("frontier").collect()
    }
    assert nv[(1, 0)] == T0 + 99

    store.commit(1)
    reopened = StateStore(spark, str(tmp_path / "state"), buckets=4)
    again = {(r["origin_id"], r["path_id"]) for r in reopened.read("frontier").collect()}
    assert len(again) == 28 and (1, 0) in again and (2, 0) not in again


def _key_of(spark, origin_id, path_id):
    return spark.range(1).select(
        F.xxhash64(F.lit(origin_id).cast("long"), F.lit(path_id).cast("long")).alias("k")
    ).collect()[0]["k"]


@pytest.mark.parametrize("kind", ["cuckoo", "bloom"])
def test_retire_then_rediscover(spark, tmp_path, kind):
    """Crawl → retire a visited location → the frontier row is gone and
    (cuckoo) its key leaves the filter / (bloom) the planes are untouched
    — then the parent page's revisit re-discovers the URL and it is
    FETCHED AGAIN under the same deterministic path_id, with the key back
    in the filter.  This is the full lifecycle the bloom/cuckoo choice is
    about: bloom survives retire only because maybe-seen falls through to
    the exact verify join; cuckoo makes the filter itself forget."""
    kw = (
        {"seen_filter": "cuckoo", "cuckoo_buckets": 1 << 10, "bloom_shards": 2}
        if kind == "cuckoo"
        else {"bloom_shards": 2}
    )
    store = StateStore(spark, str(tmp_path / "state"), buckets=4)
    cfg = CrawlConfig(initial_revisit_html_ms=60, min_revisit_ms=1, **kw)
    eng = CrawlEngine(spark, store, make_site(spark), cfg)
    eng.add_seeds([ORIGIN], now=T0)
    eng.run(max_waves=2, k_origins=1, per_host_k=2)

    fr = {r["path"]: r for r in store.read("frontier").collect()}
    tgt = fr["/style.css"]
    assert tgt["last_visit"] == T0 + 60
    planes_before = eng._bloom_bits.copy()

    stats = eng.retire_locations(
        spark.createDataFrame([(tgt["origin_id"], tgt["path_id"])], "origin_id long, path_id long")
    )
    assert stats["rows_deleted"] == 1
    assert "/style.css" not in {r["path"] for r in store.read_staged("frontier").collect()}

    key = np.array([_key_of(spark, tgt["origin_id"], tgt["path_id"])], dtype=np.int64)
    sh = np.array([tgt["origin_id"] % 2], dtype=np.int64)
    if kind == "cuckoo":
        assert not contains(eng._bloom_bits, sh, key)[0]
        # surviving keys keep their slots
        home = fr["/"]
        hkey = np.array([_key_of(spark, home["origin_id"], home["path_id"])], dtype=np.int64)
        assert contains(eng._bloom_bits, sh, hkey)[0]
        # the post-delete planes are STAGED (atomic with the wave commit,
        # like every other mutation) — the committed view stays pre-retire
        assert store._staged["bloom"]["ver"] > store.manifest.get("bloom", {}).get("ver", -1)
    else:
        # bloom cannot delete: planes untouched, stale bit = permanent FP
        assert np.array_equal(planes_before, eng._bloom_bits)

    # home ("/") is due again at T0+120; its refetch re-discovers style.css
    eng.run(max_waves=4, k_origins=1, per_host_k=2)
    fr2 = {r["path"]: r for r in store.read("frontier").collect()}
    back = fr2.get("/style.css")
    assert back is not None and back["path_id"] == tgt["path_id"]
    revisits = sorted(
        r["date"] - T0
        for r in store.read("visits").collect()
        if r["path_id"] == tgt["path_id"]
    )
    assert revisits == [60, 180]  # fetched once before retire, once after
    if kind == "cuckoo":
        assert contains(eng._bloom_bits, sh, key)[0]  # re-inserted on rediscovery
        # post-retire planes are now committed: a restart reloads them
        assert np.array_equal(store.load_bloom(eng._bloom_meta()), eng._bloom_bits)
