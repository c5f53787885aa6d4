"""Sequential-parity test: the engine in k=1 mode must reproduce the
reference's crawl ordering, statuses, next-visit values, and URL-seen set
over the exact fixture site of ``TestServer.java:21-56`` / ``CrawlTest.java``.

The expected trace below is hand-derived from the reference code (NOT from
running it): W2 ordering ``type DESC, priority DESC NULLS LAST, depth ASC,
next_visit ASC`` (``Database.java:264-269``), politeness cap 30 ms
(``Config.java:114``), AIMD/initial revisit (``Exchange.java:243-287``):

  wave 1  T0      /robots.txt   ROBOTS  200  (ROBOTS beats PAGE)
  wave 2  T0+30   /sitemap-index.xml SITEMAP 200
  wave 3  T0+60   /sitemap.xml  SITEMAP 200  (entries /no, /page p=0.8 daily)
  wave 4  T0+90   /page         PAGE    404  (priority 0.8 beats NULLs —
                                         note: NOT '/' ; and TestServer has
                                         no /page route → live 404)
  wave 5  T0+120  /             PAGE    200  (depth 0 beats /no depth 3)
  wave 6  T0+150  /style.css    TRANSCLUSION 200 (type 1 beats PAGE /no)
  wave 7  T0+180  /no           PAGE   -9998 (robots Disallow: /no)
  wave 8  T0+180  (origin parks: queue empty at T — delay was 0 for -9998)
  wave 9  idle
"""

import pytest

from chronicrawl_spark.crawl import DAY_MS, CrawlConfig, CrawlEngine
from chronicrawl_spark.fixtures import ROBOTS_BODY
from chronicrawl_spark.fixtures import test_server_site as make_site
from chronicrawl_spark.tables import StateStore

ORIGIN = "http://test.example"
T0 = 1_600_000_000_000


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    store = StateStore(spark, str(tmp_path_factory.mktemp("parity") / "state"), buckets=8)
    engine = CrawlEngine(
        spark, store, make_site(spark, ORIGIN), CrawlConfig(check_collisions=True)
    )
    engine.add_seeds([ORIGIN], now=T0)
    stats = engine.run(max_waves=12, k_origins=1, per_host_k=1)
    return store, stats


def test_visit_sequence(crawled):
    store, stats = crawled
    visits = sorted(
        (r["date"], r["path_id"], r["status"], r["content_type"])
        for r in store.read("visits").collect()
    )
    frontier = {r["path_id"]: r["path"] for r in store.read("frontier").collect()}
    trace = [(d, frontier[p], s, ct) for d, p, s, ct in visits]
    assert trace == [
        (T0, "/robots.txt", 200, "text/plain"),
        (T0 + 30, "/sitemap-index.xml", 200, "application/xml"),
        (T0 + 60, "/sitemap.xml", 200, "application/xml"),
        (T0 + 90, "/page", 404, "text/plain"),
        (T0 + 120, "/", 200, "text/html"),
        (T0 + 150, "/style.css", 200, "text/css"),
        (T0 + 180, "/no", -9998, "application/octet-stream"),
    ]


def test_url_seen_set(crawled):
    store, _ = crawled
    paths = {r["path"] for r in store.read("frontier").collect()}
    assert paths == {
        "/robots.txt", "/", "/sitemap-index.xml", "/sitemap.xml", "/no", "/page", "/style.css",
    }


def test_depths_and_types(crawled):
    store, _ = crawled
    rows = {r["path"]: r for r in store.read("frontier").collect()}
    assert rows["/robots.txt"]["location_type"] == "ROBOTS" and rows["/robots.txt"]["depth"] == 0
    assert rows["/"]["depth"] == 0
    assert rows["/sitemap-index.xml"]["location_type"] == "SITEMAP"
    assert rows["/sitemap-index.xml"]["depth"] == 1
    assert rows["/sitemap.xml"]["depth"] == 2
    assert rows["/no"]["depth"] == 3 and rows["/page"]["depth"] == 3
    assert rows["/style.css"]["location_type"] == "TRANSCLUSION"
    assert rows["/style.css"]["depth"] == 1
    # discovery lineage (via)
    assert rows["/style.css"]["via_path_id"] == rows["/"]["path_id"]
    assert rows["/page"]["via_path_id"] == rows["/sitemap.xml"]["path_id"]


def test_next_visit_values(crawled):
    """C10/C11 cascade: changefreq daily → +1d; html → +2d; other → +7d."""
    store, _ = crawled
    rows = {r["path"]: r["next_visit"] for r in store.read("frontier").collect()}
    assert rows["/robots.txt"] == T0 + 7 * DAY_MS
    assert rows["/sitemap-index.xml"] == T0 + 30 + 7 * DAY_MS
    assert rows["/sitemap.xml"] == T0 + 60 + 7 * DAY_MS
    assert rows["/page"] == T0 + 90 + 1 * DAY_MS  # sitemap changefreq daily (even on 404)
    assert rows["/"] == T0 + 120 + 2 * DAY_MS  # initial html
    assert rows["/style.css"] == T0 + 150 + 7 * DAY_MS
    assert rows["/no"] == T0 + 180 + 7 * DAY_MS  # robots-denied: initial other


def test_origin_state_after_crawl(crawled):
    store, _ = crawled
    [o] = store.read("origins").collect()
    assert o["origin"] == ORIGIN
    assert o["crawl_policy"] == "CONTINUOUS"
    assert o["robots_crawl_delay"] == 5
    assert bytes(o["robots_txt"]) == ROBOTS_BODY
    # parked after the queue drained (Crawl.java:123-126)
    assert o["next_visit"] is None
    assert o["last_visit"] == T0 + 180


def test_sitemap_entries(crawled):
    store, _ = crawled
    rows = {}
    frontier = {r["path_id"]: r["path"] for r in store.read("frontier").collect()}
    for r in store.read("sitemap_entries").collect():
        rows[frontier[r["path_id"]]] = r
    assert set(rows) == {"/sitemap.xml", "/no", "/page"}
    assert rows["/page"]["changefreq"] == "DAILY"
    assert abs(rows["/page"]["priority"] - 0.8) < 1e-6
    assert rows["/no"]["changefreq"] is None and rows["/no"]["priority"] is None


def test_warc_records(crawled):
    store, _ = crawled
    warc = store.read("warc_records").collect()
    by_type = {}
    for r in warc:
        by_type.setdefault(r["record_type"], []).append(r)
    # 6 fetched URLs (the -9998 never fetched) → 6 requests + 6 responses
    assert len(by_type["request"]) == 6
    assert len(by_type["response"]) == 6
    assert "revisit" not in by_type
    robots_rec = [r for r in by_type["response"] if r["url"].endswith("/robots.txt")]
    assert bytes(robots_rec[0]["payload"]) == ROBOTS_BODY
    assert robots_rec[0]["etag"] == '"123"'


def test_metrics(crawled):
    store, _ = crawled
    import pyspark.sql.functions as F

    m = store.read("metrics").agg(F.sum("visits"), F.sum("errors")).first()
    assert m[0] == 7 and m[1] == 1


def test_resume_from_snapshot_mid_crawl(spark, tmp_path):
    """Kill after wave 3, resume, final state identical (north_star resumability)."""
    store = StateStore(spark, str(tmp_path / "state"), buckets=8)
    engine = CrawlEngine(spark, store, make_site(spark, ORIGIN), CrawlConfig())
    engine.add_seeds([ORIGIN], now=T0)
    engine.run(max_waves=3, k_origins=1, per_host_k=1)  # waves 1..3 (robots, smi, sm)
    wave3 = store.committed_wave

    # continue to completion → reference final state
    engine.run(max_waves=9, k_origins=1, per_host_k=1)
    final_visits = sorted(
        (r["date"], r["path_id"], r["status"]) for r in store.read("visits").collect()
    )

    # "crash": new store+engine resumed from the wave-3 snapshot
    store2 = StateStore(spark, str(tmp_path / "state"), buckets=8)
    store2.resume_from(wave3)
    # no manual clock: the manifest snapshot carries the virtual clock
    engine2 = CrawlEngine(spark, store2, make_site(spark, ORIGIN), CrawlConfig())
    assert engine2.clock == T0 + 60  # wave-3 ts, restored from the manifest
    engine2.run(max_waves=9, k_origins=1, per_host_k=1)
    resumed_visits = sorted(
        (r["date"], r["path_id"], r["status"]) for r in store2.read("visits").collect()
    )
    assert resumed_visits == final_visits


def test_bloom_persisted_across_restart(spark, tmp_path, monkeypatch):
    """Restart must reload the committed URL-seen planes from the store —
    NOT rebuild them with a full-frontier scan (the 10^10-key cost the
    persistence exists to avoid) — and the resumed crawl must be identical."""
    import numpy as np

    from chronicrawl_spark.operators import seen

    store = StateStore(spark, str(tmp_path / "state"), buckets=8)
    engine = CrawlEngine(spark, store, make_site(spark, ORIGIN), CrawlConfig())
    engine.add_seeds([ORIGIN], now=T0)
    engine.run(max_waves=3, k_origins=1, per_host_k=1)
    wave3 = store.committed_wave
    assert engine._bloom_bits is not None  # built + maintained during run
    saved = store.load_bloom(engine._bloom_meta())
    assert saved is not None and np.array_equal(saved, engine._bloom_bits)

    # reference final state: continue the original engine to completion
    engine.run(max_waves=9, k_origins=1, per_host_k=1)
    final_visits = sorted(
        (r["date"], r["path_id"], r["status"]) for r in store.read("visits").collect()
    )

    # "restart": fresh store + engine over the same directory at wave 3
    store2 = StateStore(spark, str(tmp_path / "state"), buckets=8)
    store2.resume_from(wave3)
    calls = {"n": 0}
    real_build = seen.build_bloom_sharded

    def counting_build(*a, **kw):
        calls["n"] += 1
        return real_build(*a, **kw)

    monkeypatch.setattr(seen, "build_bloom_sharded", counting_build)
    engine2 = CrawlEngine(spark, store2, make_site(spark, ORIGIN), CrawlConfig())
    assert engine2._bloom_bits is not None  # loaded from the manifest blob
    engine2.run(max_waves=9, k_origins=1, per_host_k=1)
    # no full-frontier rebuild job ran (small waves use the driver OR-in path)
    assert calls["n"] == 0
    resumed_visits = sorted(
        (r["date"], r["path_id"], r["status"]) for r in store2.read("visits").collect()
    )
    assert resumed_visits == final_visits

    # param mismatch → loader refuses (engine would rebuild lazily)
    assert store2.load_bloom({"n_bits": 1 << 10, "k": 5, "shards": 4}) is None

    # vacuum prunes plane files unreferenced by retained manifests
    bdir = tmp_path / "state" / "bloom"
    n_before = len(list(bdir.iterdir()))
    store2.vacuum(keep_snapshots=1)
    assert len(list(bdir.iterdir())) <= min(n_before, 3)  # live+staged+kept tag
