"""StateStore: partition-level COW merge, snapshot commit, resume."""

import json
import os

import pytest

from chronicrawl_spark.tables import StateStore


@pytest.fixture()
def store(spark, tmp_path):
    return StateStore(spark, str(tmp_path / "state"), buckets=8)


def _origin_row(oid, origin, nv=1000):
    return (oid, origin, 500, "CONTINUOUS", None, nv, None, None)


def test_merge_upsert_and_insert_if_absent(spark, store):
    df = spark.createDataFrame(
        [_origin_row(1, "http://a"), _origin_row(2, "http://b")],
        schema=store.read("origins").schema,
    )
    store.merge("origins", df, "upsert")
    store.commit(0)
    assert store.read("origins").count() == 2

    # upsert: delta wins
    upd = spark.createDataFrame([_origin_row(1, "http://a", nv=9999)], df.schema)
    store.merge("origins", upd, "upsert")
    store.commit(1)
    rows = {r["origin_id"]: r["next_visit"] for r in store.read("origins").collect()}
    assert rows == {1: 9999, 2: 1000}

    # insert_if_absent: existing wins (reference tryInsert, Database.java:186-200)
    ins = spark.createDataFrame(
        [_origin_row(1, "http://a", nv=777), _origin_row(3, "http://c")], df.schema
    )
    store.merge("origins", ins, "insert_if_absent")
    store.commit(2)
    rows = {r["origin_id"]: r["next_visit"] for r in store.read("origins").collect()}
    assert rows == {1: 9999, 2: 1000, 3: 1000}


def test_partition_level_merge_on_read(spark, store):
    # seed rows across all 8 buckets — fresh table, lands as clean base
    df = spark.createDataFrame(
        [_origin_row(i, f"http://h{i}") for i in range(16)],
        schema=store.read("origins").schema,
    )
    assert store.merge("origins", df, "upsert")["buckets"] == 8
    store.commit(0)
    m = json.load(open(os.path.join(store.root, "manifest.json")))
    assert set(m["mutable"]["origins"].values()) == {0}
    assert all(not ch for ch in m["mutable_deltas"]["origins"].values())

    # a delta touching only bucket 3 writes ONE delta file — base untouched
    delta = spark.createDataFrame([_origin_row(3, "http://h3", nv=5)], df.schema)
    assert store.merge("origins", delta, "upsert")["buckets"] == 1
    store.commit(1)
    m = json.load(open(os.path.join(store.root, "manifest.json")))
    assert set(m["mutable"]["origins"].values()) == {0}  # base versions unchanged
    assert m["mutable_deltas"]["origins"]["3"] == [1]  # bucket 3 chain has the delta
    assert os.path.isdir(os.path.join(store.root, "origins", "d1"))
    rows = {r["origin_id"]: r["next_visit"] for r in store.read("origins").collect()}
    assert rows[3] == 5 and rows[4] == 1000 and len(rows) == 16


def test_delta_chain_newest_wins_and_compaction(spark, store):
    schema = store.read("origins").schema
    store.merge("origins", spark.createDataFrame([_origin_row(1, "http://a", nv=1)], schema), "upsert")
    # stack several delta versions on the same key
    for nv in (2, 3, 4):
        store.merge("origins", spark.createDataFrame([_origin_row(1, "http://a", nv=nv)], schema), "upsert")
    # a later insert_if_absent must LOSE to the existing row (tryInsert)
    store.merge("origins", spark.createDataFrame([_origin_row(1, "http://a", nv=99)], schema), "insert_if_absent")
    # an insert_if_absent for a brand-new key must land
    store.merge("origins", spark.createDataFrame([_origin_row(2, "http://b", nv=7)], schema), "insert_if_absent")
    store.commit(0)
    rows = {r["origin_id"]: r["next_visit"] for r in store.read("origins").collect()}
    assert rows == {1: 4, 2: 7}

    # compaction folds chains into a clean base and preserves the data
    assert store.compact("origins") > 0
    store.commit(1)
    m = json.load(open(os.path.join(store.root, "manifest.json")))
    assert all(not ch for ch in m["mutable_deltas"]["origins"].values())
    assert m["delta_rows"]["origins"] == {}  # version row counts pruned
    rows = {r["origin_id"]: r["next_visit"] for r in store.read("origins").collect()}
    assert rows == {1: 4, 2: 7}


def test_auto_compaction_bounds_chain(spark, tmp_path):
    from chronicrawl_spark.tables import StateStore

    store = StateStore(spark, str(tmp_path / "k"), buckets=4, delta_chain_k=2)
    schema = store.read("origins").schema
    store.merge("origins", spark.createDataFrame([_origin_row(1, "http://a", nv=0)], schema), "upsert")
    for nv in range(1, 6):
        store.merge("origins", spark.createDataFrame([_origin_row(1, "http://a", nv=nv)], schema), "upsert")
        chain = store._staged["mutable_deltas"]["origins"].get(str(1 % 4), [])
        assert len(chain) <= 2  # chain never exceeds delta_chain_k
    store.commit(0)
    rows = {r["origin_id"]: r["next_visit"] for r in store.read("origins").collect()}
    assert rows == {1: 5}


def test_bucketed_append_retry_drops_stale_buckets(spark, store):
    """A retried wave reuses its wave number.  Stale bucket dirs from a
    failed first attempt must NOT be resurrected into the manifest by the
    post-write directory listing (they'd re-appear as phantom visits)."""
    vs = store.read("visits")
    wide = [(b, 2, 1000 + b, "GET", 200, None, 1, None, None, None, None, None, None, None)
            for b in range(8)]  # touches all 8 buckets
    store.append("visits", spark.createDataFrame(wide, vs.schema), wave=0)
    # simulate: attempt 1 wrote 8 buckets then crashed pre-commit; the retry
    # (different upstream outcome) writes only bucket 3
    narrow = [(3, 2, 99, "GET", 200, None, 1, None, None, None, None, None, None, None)]
    store.append("visits", spark.createDataFrame(narrow, vs.schema), wave=0)
    assert store._staged["append_buckets"]["visits"]["0"] == [3]
    store.commit(0)
    rows = store.read("visits").collect()
    assert len(rows) == 1 and rows[0]["date"] == 99  # no phantoms


def test_vacuum_reclaims_orphans_keeps_retained_snapshots(spark, store):
    import os

    schema = store.read("origins").schema
    for wave in range(3):  # base v0 + delta chain d1, d2
        d = spark.createDataFrame([_origin_row(1, "http://a", nv=wave)], schema)
        store.merge("origins", d, "upsert")
        store.commit(wave)
    store.compact("origins")  # folds v0+d1+d2 → v3
    store.commit(3)
    for wave in (4, 5):  # post-compaction deltas d4, d5
        d = spark.createDataFrame([_origin_row(1, "http://a", nv=wave)], schema)
        store.merge("origins", d, "upsert")
        store.commit(wave)
    res = store.vacuum(keep_snapshots=2)  # retains tags 4, 5 (→ v3, d4, d5)
    assert res["dirs_deleted"] == 3  # pre-compaction v0, d1, d2 orphaned
    assert res["tags_deleted"] == 4  # tags 0-3 expired
    rows = {r["origin_id"]: r["next_visit"] for r in store.read("origins").collect()}
    assert rows == {1: 5}  # live snapshot intact
    store.resume_from(4)  # retained tag still resumable
    assert {r["next_visit"] for r in store.read("origins").collect()} == {4}
    assert not os.path.exists(store._manifest_path(0))  # expired tag gone
    assert not os.path.exists(os.path.join(store.root, "origins", "v0"))


def test_read_keys_presence_view(spark, store):
    schema = store.read("origins").schema
    store.merge("origins", spark.createDataFrame([_origin_row(1, "http://a")], schema), "upsert")
    store.merge("origins", spark.createDataFrame([_origin_row(1, "http://a", nv=2), _origin_row(2, "http://b")], schema), "upsert")
    keys = {r["origin_id"] for r in store.read_keys("origins", staged=True).collect()}
    assert keys == {1, 2}  # both keys visible (duplicates allowed)


def test_append_and_crash_isolation(spark, store):
    vs = store.read("visits")
    visit = [(1, 2, 1000, "GET", 200, "text/html", 10, None, None, None, None, None, None, None)]
    store.append("visits", spark.createDataFrame(visit, vs.schema), wave=0)
    # NOT committed: committed snapshot must not see it
    assert store.read("visits").count() == 0
    assert store.read_staged("visits").count() == 1
    store.commit(0)
    assert store.read("visits").count() == 1


def test_resume_from_snapshot(spark, store):
    df_schema = store.read("origins").schema
    for wave in range(3):
        d = spark.createDataFrame([_origin_row(100 + wave, f"http://w{wave}")], df_schema)
        store.merge("origins", d, "upsert")
        store.commit(wave)
    assert store.read("origins").count() == 3
    store.resume_from(1)
    assert store.read("origins").count() == 2
    assert store.committed_wave == 1


def test_base_files_clustered_on_next_visit(spark, store):
    """Mutable BASE files are clustered (sorted within each bucket file) by
    the table's hot predicate column — frontier/origins on ``next_visit`` —
    so parquet row-group min/max stats prune the wave-select due scan
    (tables.MUTABLE_CLUSTER).  Checked on both base-write paths: the fresh
    seed write and a delta compaction."""
    import glob

    import pyarrow.parquet as pq

    def _assert_sorted(table):
        mf = store.manifest["mutable"][table]
        for b, v in mf.items():
            for f in glob.glob(
                os.path.join(store.root, table, f"v{v}", f"bucket={b}", "*.parquet")
            ):
                nv = pq.read_table(f, columns=["next_visit"])["next_visit"].to_pylist()
                nn = [x for x in nv if x is not None]
                assert nn == sorted(nn), f"{f} not clustered on next_visit"

    rows = [
        (oid, pid, f"/p{pid}", "PAGE", 0, None, None, 100, None, (oid * 7919 + pid * 104729) % 5000)
        for oid in range(1, 9)
        for pid in range(40)
    ]
    f = spark.createDataFrame(rows, schema=store.read("frontier").schema)
    store.merge("frontier", f, "upsert")  # fresh path → base write
    store.commit(0)
    _assert_sorted("frontier")

    # delta + compact path: shuffled next_visit updates then force compaction
    upd = spark.createDataFrame(
        [
            (oid, pid, f"/p{pid}", "PAGE", 0, None, None, 100, None, (oid * 31 + pid * 17) % 999)
            for oid in range(1, 9)
            for pid in range(40)
        ],
        schema=f.schema,
    )
    store.merge("frontier", upd, "upsert")
    store.compact("frontier")
    store.commit(1)
    _assert_sorted("frontier")


def test_table_bytes_memoized_per_version(spark, store, monkeypatch):
    """Broadcast size-gating reads physical bytes from a per-(table, version)
    memo — version dirs are immutable once written, so unchanged versions
    must not be re-walked on every wave (the r4 advisor finding)."""
    import chronicrawl_spark.tables as tables_mod

    df = spark.createDataFrame(
        [_origin_row(i, f"http://h{i}") for i in range(20)],
        schema=store.read("origins").schema,
    )
    store.merge("origins", df, "upsert")
    store.commit(0)
    n1 = store.table_bytes("origins")
    assert n1 > 0

    walked = {"n": 0}
    real_walk = os.walk

    def counting_walk(*a, **kw):
        walked["n"] += 1
        return real_walk(*a, **kw)

    monkeypatch.setattr(tables_mod.os, "walk", counting_walk)
    # second call on an unchanged manifest: fully memoized, zero walks
    assert store.table_bytes("origins") == n1
    assert walked["n"] == 0

    # a new version is measured once, then memoized too
    upd = spark.createDataFrame([_origin_row(1, "http://h1", nv=42)], df.schema)
    store.merge("origins", upd, "upsert")
    store.commit(1)
    n2 = store.table_bytes("origins")
    assert n2 > 0
    after_first = walked["n"]
    assert after_first > 0
    assert store.table_bytes("origins") == n2
    assert walked["n"] == after_first


def test_merge_writefirst_observed_stats_equivalence(spark, tmp_path):
    """The one-job write-first merge (stats ride the delta write as observed
    metrics; taken when every bucket has state and the tag vocabulary is
    declared) must produce the same resolved rows, the same stats dict, and
    the same manifest shape as the two-job counts+write path."""
    import pyspark.sql.functions as F

    def _seed(root):
        st = StateStore(spark, str(root), buckets=8)
        df = spark.createDataFrame(
            [_origin_row(i, f"http://h{i}") for i in range(16)],
            schema=st.read("origins").schema,
        )
        st.merge("origins", df, "upsert")  # fresh base occupying all 8 buckets
        st.commit(0)
        return st

    a = _seed(tmp_path / "writefirst")
    b = _seed(tmp_path / "twojob")
    schema = a.read("origins").schema

    def _delta():
        ups = spark.createDataFrame(
            [_origin_row(3, "http://h3", nv=5), _origin_row(11, "http://h11", nv=6)],
            schema,
        ).withColumn("__tag", F.lit("visited"))
        # insert colliding with an upsert key loses; a brand-new key lands
        ins = spark.createDataFrame(
            [_origin_row(3, "http://h3", nv=777), _origin_row(40, "http://h40", nv=7)],
            schema,
        )
        return ups, ins

    ups, ins = _delta()
    sa = a.merge_mixed("origins", ups, ins, tags=["visited"])  # write-first
    ups, ins = _delta()
    sb = b.merge_mixed("origins", ups, ins)  # __tag undeclared → two-job
    a.commit(1)
    b.commit(1)
    assert sa == sb
    assert sa["rows_by_tag"] == {"visited": 2, "insert": 2}
    assert {r["origin_id"]: r["next_visit"] for r in a.read("origins").collect()} == {
        r["origin_id"]: r["next_visit"] for r in b.read("origins").collect()
    }
    ma = json.load(open(os.path.join(a.root, "manifest.json")))
    mb = json.load(open(os.path.join(b.root, "manifest.json")))
    assert ma["mutable_deltas"]["origins"] == mb["mutable_deltas"]["origins"]

    # empty delta: zero stats, no new chain entries, no dangling files
    empty = spark.createDataFrame([], schema)
    se = a.merge("origins", empty, "upsert", tags=[])
    assert se == {"buckets": 0, "upsert_rows": 0, "insert_rows": 0, "rows_by_tag": {}}
    a.commit(2)
    m2 = json.load(open(os.path.join(a.root, "manifest.json")))
    assert m2["mutable_deltas"]["origins"] == ma["mutable_deltas"]["origins"]
