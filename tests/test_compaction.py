"""L23 small-file maintenance: ``StateStore.compact_appends`` (the Iceberg
``rewrite_data_files`` bin-pack analog) and ``CrawlEngine.compact_history``.

The reference never needs this — SQLite is one file (``Database.java:55-64``).
At Spark scale every wave leaves ≤1 file per bucket per append table, so a
1000-wave history is ~32k tiny files; compaction folds the small waves into
one consolidated, key-sorted, bucket-pruned wave without ever rewriting the
large ones — O(compacted bytes), never O(archive)."""

import os

from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
from chronicrawl_spark.fixtures import test_server_site as make_site
from chronicrawl_spark.tables import StateStore, VISITS_SCHEMA

T0 = 1_600_000_000_000


def _visits_df(spark, origin_ids, wave):
    rows = [
        (oid, oid * 7 + 1, T0 + wave, "GET", 200, "text/html", 10,
         None, None, None, None, 10, None, None)
        for oid in origin_ids
    ]
    return spark.createDataFrame(rows, VISITS_SCHEMA)


def _rows(df):
    return sorted((r["origin_id"], r["path_id"], r["date"]) for r in df.collect())


def _seed_waves(spark, store, n_waves, per_wave=8):
    expect = []
    for w in range(n_waves):
        oids = [w * per_wave + i for i in range(per_wave)]
        store.append("visits", _visits_df(spark, oids, w), w)
        store.commit(w)
        expect += [(o, o * 7 + 1, T0 + w) for o in oids]
    return sorted(expect)


def test_compact_preserves_rows_and_prunes(spark, tmp_path):
    """Rows byte-identical before/after; manifest shrinks to one wave;
    bucket-pruned reads stay exact under the consolidated layout."""
    store = StateStore(spark, str(tmp_path / "state"), buckets=4)
    expect = _seed_waves(spark, store, 6)
    assert _rows(store.read("visits")) == expect

    stats = store.compact_appends("visits", 100)
    store.commit(100)
    assert stats["waves_in"] == 6 and stats["files_in"] >= 6
    assert store.manifest["append"]["visits"] == [100]
    assert _rows(store.read("visits")) == expect
    # pruned read: bucket 1 under the current count
    pruned = _rows(store.read_pruned("visits", [1]))
    assert pruned == [r for r in expect if r[0] % 4 == 1]
    # consolidated wave records the current bucket count
    assert store.manifest["append_bucket_at"]["visits"] == {"100": 4}


def test_compact_policy_thresholds(spark, tmp_path):
    """small_bytes excludes big waves; max_rewrite_bytes caps a call at the
    oldest subset; min_waves gates the no-op."""
    store = StateStore(spark, str(tmp_path / "state"), buckets=2)
    _seed_waves(spark, store, 5, per_wave=4)
    # a "big" wave that must survive compaction untouched
    store.append("visits", _visits_df(spark, range(1000, 51000), 50), 50)
    store.commit(50)

    def _dir_bytes(w):
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _d, fs in os.walk(str(tmp_path / "state" / "visits" / f"wave={w}"))
            for f in fs if not f.startswith(("_", "."))
        )

    small, big = _dir_bytes(0), _dir_bytes(50)
    assert small * 4 < big, "fixture sizing assumption broken"
    stats = store.compact_appends("visits", 101, small_bytes=(small + big) // 2)
    store.commit(101)
    assert stats["waves_in"] == 5
    assert sorted(store.manifest["append"]["visits"]) == [50, 101]

    # min_waves: only one small candidate left → no-op, nothing staged
    s2 = store.compact_appends(
        "visits", 102, small_bytes=(small + big) // 2, min_waves=2
    )
    assert s2["waves_in"] == 0 and not store.has_staged_changes()

    # max_rewrite_bytes: tiny cap folds only the oldest candidate(s)
    store2 = StateStore(spark, str(tmp_path / "s2"), buckets=2)
    _seed_waves(spark, store2, 4, per_wave=4)
    s3 = store2.compact_appends("visits", 100, max_rewrite_bytes=1, min_waves=1)
    store2.commit(100)
    assert s3["waves_in"] == 1
    assert sorted(store2.manifest["append"]["visits"]) == [1, 2, 3, 100]


def test_compact_crash_safety_and_vacuum(spark, tmp_path):
    """Uncommitted compaction is invisible on reopen; vacuum reclaims the
    de-listed source wave dirs after commit and reads stay exact."""
    root = str(tmp_path / "state")
    store = StateStore(spark, root, buckets=4)
    expect = _seed_waves(spark, store, 5)

    store.compact_appends("visits", 100)
    # crash before commit → reopen sees the old layout
    reopened = StateStore(spark, root)
    assert sorted(reopened.manifest["append"]["visits"]) == [0, 1, 2, 3, 4]
    assert _rows(reopened.read("visits")) == expect

    # redo on the reopened store, commit, vacuum with a 1-snapshot window
    reopened.compact_appends("visits", 100)
    reopened.commit(100)
    reopened.vacuum(keep_snapshots=1)
    left = {d for d in os.listdir(os.path.join(root, "visits")) if d.startswith("wave=")}
    assert left == {"wave=100"}
    assert _rows(reopened.read("visits")) == expect


def test_compact_across_rebucket_epochs(spark, tmp_path):
    """Waves written under an older bucket count collapse into the current
    layout; pruned reads need no historical translation afterwards."""
    store = StateStore(spark, str(tmp_path / "state"), buckets=2)
    e1 = _seed_waves(spark, store, 3)
    store.rebucket(4)
    store.append("visits", _visits_df(spark, [100, 101], 10), 10)
    store.commit(10)
    expect = sorted(e1 + [(100, 701, T0 + 10), (101, 708, T0 + 10)])

    store.compact_appends("visits", 200, min_waves=2)
    store.commit(200)
    assert store.manifest["append"]["visits"] == [200]
    assert store.manifest["append_bucket_at"]["visits"] == {"200": 4}
    assert _rows(store.read("visits")) == expect
    pruned = _rows(store.read_pruned("visits", [3]))
    assert pruned == [r for r in expect if r[0] % 4 == 3]


def test_engine_auto_compact_parity(spark, tmp_path):
    """A fixture crawl with auto compaction produces byte-identical visits
    to one without, with fewer wave dirs; compact_history self-commits its
    own snapshot only when it did work."""
    def _crawl(root, cfg):
        store = StateStore(spark, root, buckets=8)
        eng = CrawlEngine(spark, store, make_site(spark), cfg)
        eng.add_seeds(["http://test.example"], now=T0)
        eng.run(max_waves=9, k_origins=1, per_host_k=1)
        return store, eng

    base_store, base_eng = _crawl(str(tmp_path / "a"), CrawlConfig())
    auto_cfg = CrawlConfig(auto_compact_min_waves=3, compact_small_bytes=1 << 30)
    auto_store, auto_eng = _crawl(str(tmp_path / "b"), auto_cfg)

    cols = ["origin_id", "path_id", "date", "status", "revisit_of_date"]
    a = sorted(tuple(r) for r in base_store.read("visits").select(cols).collect())
    b = sorted(tuple(r) for r in auto_store.read("visits").select(cols).collect())
    assert a == b and len(a) == 7
    assert len(auto_store.manifest["append"]["visits"]) < len(
        base_store.manifest["append"]["visits"]
    )
    # lineage records the maintenance op
    ops = {r["op"] for r in auto_store.read("lineage").collect()}
    assert "compact_appends" in ops
    # no-op compact_history publishes nothing
    w = auto_store.committed_wave
    out = auto_eng.compact_history(min_waves=10_000)
    assert all(r["waves_in"] == 0 for r in out.values())
    assert auto_store.committed_wave == w
