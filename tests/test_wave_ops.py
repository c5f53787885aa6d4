"""Wave-selection operator invariants: salted top-k equivalence on skew,
throughput-mode vs sequential-mode URL-seen equivalence, bloom prefilter."""

import pyspark.sql.functions as F
import pytest

from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
from chronicrawl_spark.fixtures import synthetic_frontier
from chronicrawl_spark.fixtures import test_server_site as make_site
from chronicrawl_spark.operators.wave import per_host_top_k
from chronicrawl_spark.tables import StateStore

T0 = 1_600_000_000_000


def test_salted_topk_equals_plain_topk_on_skew(spark):
    """Two-phase salted top-k must return exactly the single-phase result,
    including on a hot-host distribution (50% of rows on one host)."""
    _, frontier = synthetic_frontier(spark, n_origins=20, locs_per_origin=50, now=T0, skew_frac=0.5)
    due = frontier.withColumn("priority", (F.col("path_id") % 5).cast("float"))
    for k in (1, 3):
        plain = per_host_top_k(due, k=k, salt=None)
        salted = per_host_top_k(due, k=k, salt=8)
        p = {tuple(r) for r in plain.select("origin_id", "path_id").collect()}
        s = {tuple(r) for r in salted.select("origin_id", "path_id").collect()}
        assert p == s, f"k={k}: salted result diverges from plain"
        # hot host actually is hot in the fixture
        hot = due.groupBy("origin_id").count().orderBy(F.desc("count")).first()
        assert hot["count"] >= due.count() * 0.4


def test_wave_mode_reaches_same_urlseen_as_sequential(spark, tmp_path):
    """Throughput mode (all hosts per wave, k>1) must converge to the same
    final URL-seen set as the reference-parity sequential mode (the fixture
    graph is confluent; BASELINE.json correctness definition)."""
    site = make_site(spark, "http://test.example")

    def crawl(mode_dir, **kw):
        store = StateStore(spark, str(tmp_path / mode_dir), buckets=4)
        eng = CrawlEngine(spark, store, site, CrawlConfig())
        eng.add_seeds(["http://test.example"], now=T0)
        eng.run(max_waves=10, **kw)
        return store

    seq = crawl("seq", k_origins=1, per_host_k=1)
    wave = crawl("wave", per_host_k=5, salt=4)
    seq_seen = {(r["origin_id"], r["path_id"]) for r in seq.read("frontier").collect()}
    wave_seen = {(r["origin_id"], r["path_id"]) for r in wave.read("frontier").collect()}
    assert seq_seen == wave_seen
    # and the visit multiset covers the same URLs
    seq_v = {r["path_id"] for r in seq.read("visits").collect()}
    wave_v = {r["path_id"] for r in wave.read("visits").collect()}
    assert seq_v == wave_v


def test_bloom_split(spark):
    from chronicrawl_spark.operators.seen import build_bloom, split_by_bloom

    seen = spark.range(0, 2000).select(
        (F.col("id") * 7919).alias("origin_id"), (F.col("id") * 104729).alias("path_id")
    )
    key = F.xxhash64("origin_id", "path_id")
    bits = build_bloom(seen.select(key.alias("key")), "key", n_bits=1 << 20, k=5)
    cands = spark.range(0, 4000).select(
        (F.col("id") * 7919).alias("origin_id"), (F.col("id") * 104729).alias("path_id")
    )
    new, maybe = split_by_bloom(spark, cands, bits, n_bits=1 << 20, k=5)
    n_new, n_maybe = new.count(), maybe.count()
    assert n_new + n_maybe == 4000
    # no false negatives: all 2000 seen keys must land in `maybe`
    maybe_keys = {(r["origin_id"], r["path_id"]) for r in maybe.collect()}
    seen_keys = {(r["origin_id"], r["path_id"]) for r in seen.collect()}
    assert seen_keys <= maybe_keys
    # FP rate sane: of the 2000 unseen, the vast majority are definite-new
    assert n_new >= 1900


def test_bloom_enabled_crawl_identical(spark, tmp_path):
    """use_bloom=True must leave crawl results bit-identical (FPs fall
    through to the exact anti-join)."""
    site = make_site(spark, "http://test.example")

    def crawl(mode_dir, **cfg):
        store = StateStore(spark, str(tmp_path / mode_dir), buckets=4)
        eng = CrawlEngine(spark, store, site, CrawlConfig(**cfg))
        eng.add_seeds(["http://test.example"], now=T0)
        eng.run(max_waves=9, k_origins=1, per_host_k=1)
        return store

    plain = crawl("plain")
    bloomed = crawl("bloomed", use_bloom=True, bloom_bits=1 << 16)
    a = sorted((r["origin_id"], r["path_id"], r["date"], r["status"])
               for r in plain.read("visits").collect())
    b = sorted((r["origin_id"], r["path_id"], r["date"], r["status"])
               for r in bloomed.read("visits").collect())
    assert a == b
    fa = sorted((r["origin_id"], r["path_id"], r["next_visit"]) for r in plain.read("frontier").collect())
    fb = sorted((r["origin_id"], r["path_id"], r["next_visit"]) for r in bloomed.read("frontier").collect())
    assert fa == fb


def test_pages_only_robots_policy(spark, tmp_path):
    """RobotsPolicy.PAGES_ONLY (Exchange.java:80-82): non-PAGE locations skip
    the robots gate; PAGE locations still honor Disallow."""
    site = make_site(spark, "http://test.example")
    store = StateStore(spark, str(tmp_path / "po"), buckets=4)
    eng = CrawlEngine(
        spark, store, site, CrawlConfig(robots_policy="PAGES_ONLY")
    )
    eng.add_seeds(["http://test.example"], now=T0)
    eng.run(max_waves=9, k_origins=1, per_host_k=1)
    fr = {r["path_id"]: (r["path"], r["location_type"]) for r in store.read("frontier").collect()}
    visits = {fr[r["path_id"]][0]: r["status"] for r in store.read("visits").collect()}
    # /no is a PAGE and Disallow'd → still -9998; style.css TRANSCLUSION fetched
    assert visits["/no"] == -9998
    assert visits["/style.css"] == 200


def test_ignore_robots_policy(spark, tmp_path):
    """RobotsPolicy.IGNORE: everything fetches, /no live-404s."""
    site = make_site(spark, "http://test.example")
    store = StateStore(spark, str(tmp_path / "ig"), buckets=4)
    eng = CrawlEngine(spark, store, site, CrawlConfig(robots_policy="IGNORE"))
    eng.add_seeds(["http://test.example"], now=T0)
    eng.run(max_waves=9, k_origins=1, per_host_k=1)
    fr = {r["path_id"]: r["path"] for r in store.read("frontier").collect()}
    visits = {fr[r["path_id"]]: r["status"] for r in store.read("visits").collect()}
    assert visits["/no"] == 404  # fetched (TestServer has no /no route)


def test_forbidden_origin_never_fetched(spark, tmp_path):
    """F8 (Crawl.java:104-106 via Database.java:174-176): origins whose
    crawl_policy is FORBIDDEN (or TRANSCLUSIONS) are excluded from wave
    selection even with due frontier rows — only CONTINUOUS fetches."""
    import pyspark.sql.functions as F

    site = make_site(spark, "http://test.example")
    store = StateStore(spark, str(tmp_path / "fb"), buckets=4)
    eng = CrawlEngine(spark, store, site, CrawlConfig())
    eng.add_seeds(["http://test.example"], now=T0)
    # flip the origin to FORBIDDEN after seeding: frontier rows are due but
    # F1 must drop the host
    store.merge(
        "origins",
        store.read("origins").withColumn("crawl_policy", F.lit("FORBIDDEN")),
        "upsert",
    )
    store.commit(store.committed_wave + 1)
    stats = eng.run(max_waves=3, k_origins=1, per_host_k=1)
    assert stats[0].get("idle") is True
    assert store.read("visits").count() == 0

    # restore to CONTINUOUS → crawl proceeds normally
    store.merge(
        "origins",
        store.read("origins").withColumn("crawl_policy", F.lit("CONTINUOUS")),
        "upsert",
    )
    store.commit(store.committed_wave + 1)
    eng2 = CrawlEngine(spark, store, site, CrawlConfig())
    eng2.run(max_waves=2, k_origins=1, per_host_k=1)
    assert store.read("visits").count() > 0


def test_collision_guard(spark, tmp_path):
    """check_collisions: same (origin_id, path_id) with a different path
    string must raise (Database.java:196-198, 247-249)."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    store = StateStore(spark, str(tmp_path / "cg"), buckets=4)
    site = make_site(spark, "http://test.example")
    eng = CrawlEngine(spark, store, site, CrawlConfig(check_collisions=True))
    eng.add_seeds(["http://test.example"], now=T0)
    eng.run(max_waves=2, k_origins=1, per_host_k=1)
    # forge a frontier row whose ids collide with '/' but whose path differs
    root = store.read("frontier").filter(F.col("path") == "/").first()
    forged = spark.createDataFrame(
        [(root["origin_id"], root["path_id"], "/FORGED", "PAGE", 0, None, None, T0, None, T0)],
        store.read("frontier").schema,
    )
    cur = store.read_staged("frontier").select("origin_id", "path_id", F.col("path").alias("__p"))
    bad = forged.join(cur, ["origin_id", "path_id"], "inner").filter(F.col("path") != F.col("__p"))
    assert bad.count() == 1  # the guard's detection join finds the forgery
