"""Origin purge (takedown): ``StateStore.delete_append_where`` (bucket-
pruned COW delete over append-table history, correct across rebucket
epochs) and ``CrawlEngine.purge_origin`` (frontier + origin state + history
in one committed snapshot).  The reference keeps history forever (its only
delete is the screenshot keep-newest-K, ``Database.java:455-474``); purge
is the scale-side maintenance op a real archive needs for takedown /
robots-revocation requests."""

import os

import pyspark.sql.functions as F

from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
from chronicrawl_spark.fixtures import test_server_site as make_site
from chronicrawl_spark.tables import APPEND_TABLES, StateStore

T0 = 1_600_000_000_000
ORIGIN = "http://test.example"


def _visits_df(spark, rows):
    base = spark.createDataFrame(
        [(o, p, d, 200) for o, p, d in rows],
        "origin_id long, path_id long, date long, status int",
    )
    have = set(base.columns)
    return base.select(
        *[
            F.col(f.name) if f.name in have else F.lit(None).cast(f.dataType).alias(f.name)
            for f in APPEND_TABLES["visits"].fields
        ]
    )


def test_delete_append_where_across_rebucket_epochs(spark, tmp_path):
    """History written under TWO bucket counts (waves before and after a
    rebucket): purging one origin removes its rows from both epochs, reads
    only the touched (wave, bucket) files, keeps every other origin's rows,
    and vacuum reclaims the de-listed bucket files while the wave dirs (and
    their surviving buckets) stay on disk."""
    store = StateStore(spark, str(tmp_path / "state"), buckets=2)
    # victim origin 5: bucket 1 under B=2, bucket 5 under B=8
    store.append("visits", _visits_df(spark, [(o, 0, T0 + o) for o in range(8)]), wave=0)
    store.commit(0)
    store.rebucket(8)
    store.append("visits", _visits_df(spark, [(o, 1, T0 + 100 + o) for o in range(8)]), wave=1)
    store.commit(1)

    stats = store.delete_append_where("visits", [5], wave=2)
    # wave 0 touched bucket 5%2=1, wave 1 touched bucket 5%8=5
    assert stats == {"waves": 2, "buckets": 2, "rows_deleted": 2}
    store.commit(2)

    left = {(r["origin_id"], r["path_id"]) for r in store.read("visits").collect()}
    assert len(left) == 14 and not {k for k in left if k[0] == 5}
    # survivors that shared the purged buckets were rewritten, not lost:
    # origins 1,3,7 lived in wave-0 bucket 1 alongside the victim
    assert {(1, 0), (3, 0), (7, 0)} <= left

    # the de-listed bucket files persist for older snapshots until vacuum
    w0b1 = str(tmp_path / "state" / "visits" / "wave=0" / "bucket=1")
    assert os.path.isdir(w0b1)
    store.commit(3)
    store.commit(4)  # age tag 0/1/2 out of the keep window
    store.vacuum(keep_snapshots=2)
    assert not os.path.isdir(w0b1)
    # the wave dir and its surviving bucket are untouched
    assert os.path.isdir(str(tmp_path / "state" / "visits" / "wave=0" / "bucket=0"))
    after = {(r["origin_id"], r["path_id"]) for r in store.read("visits").collect()}
    assert after == left


def test_purge_origin_end_to_end(spark, tmp_path):
    """Crawl → purge the origin → NO trace of it remains in any committed
    table, the cuckoo filter forgot its keys, and a fresh re-seed crawls
    the site again from scratch (the takedown-then-reinstate lifecycle)."""
    store = StateStore(spark, str(tmp_path / "state"), buckets=4)
    cfg = CrawlConfig(
        initial_revisit_html_ms=60, min_revisit_ms=1,
        seen_filter="cuckoo", cuckoo_buckets=1 << 10, bloom_shards=2,
    )
    eng = CrawlEngine(spark, store, make_site(spark), cfg)
    eng.add_seeds([ORIGIN], now=T0)
    eng.run(max_waves=6, k_origins=1, per_host_k=2)
    oid = store.read("origins").collect()[0]["origin_id"]
    assert store.read("visits").count() > 0
    assert store.read("warc_records").count() > 0

    out = eng.purge_origin(oid)
    assert out["visits"]["rows_deleted"] > 0
    assert out["warc_records"]["rows_deleted"] > 0
    assert out["frontier"]["rows_deleted"] > 0
    # committed views (purge self-commits): nothing left anywhere
    for t in ("frontier", "origins", "sitemap_entries", "rules"):
        assert store.read(t).filter(F.col("origin_id") == oid).count() == 0
    for t in ("visits", "warc_records", "screenshots"):
        assert store.read(t).filter(F.col("origin_id") == oid).count() == 0

    # reinstate: re-seed and the site is crawled again from scratch
    eng.add_seeds([ORIGIN], now=T0 + 10_000)
    eng.run(max_waves=3, k_origins=1, per_host_k=2)
    revisits = store.read("visits").filter(F.col("origin_id") == oid).count()
    assert revisits > 0

    # purge survives restart (manifest committed, planes reloaded)
    reopened = StateStore(spark, str(tmp_path / "state"))
    dates = sorted(r["date"] for r in reopened.read("visits").collect())
    assert dates and min(dates) >= T0 + 10_000
