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


def test_partition_level_rewrite(spark, store):
    # seed rows across all 8 buckets
    df = spark.createDataFrame(
        [_origin_row(i, f"http://h{i}") for i in range(16)],
        schema=store.read("origins").schema,
    )
    assert store.merge("origins", df, "upsert") == 8
    store.commit(0)
    # a delta touching only bucket 3 rewrites exactly 1 bucket
    delta = spark.createDataFrame([_origin_row(3, "http://h3", nv=5)], df.schema)
    assert store.merge("origins", delta, "upsert") == 1
    store.commit(1)
    m = json.load(open(os.path.join(store.root, "manifest.json")))
    versions = set(m["mutable"]["origins"].values())
    assert versions == {0, 1}  # 7 buckets still on v0, bucket 3 on v1
    rows = {r["origin_id"]: r["next_visit"] for r in store.read("origins").collect()}
    assert rows[3] == 5 and rows[4] == 1000 and len(rows) == 16


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
