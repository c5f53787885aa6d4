"""Small SURVEY §2 operators: snowflake ids (C15), schedule natural sort
(W7), html→text (C18), data-url (C17), rule reapplication (W5)."""

import pyspark.sql.functions as F

from chronicrawl_spark.functions.ids import EPOCH_2020_MS, decompose_snowflake, snowflake_id
from chronicrawl_spark.functions.schedule import BUILTIN_SCHEDULES, natural_sort
from chronicrawl_spark.sources.content import html_to_text, jpeg_data_url

T0 = 1_600_000_000_000


def test_snowflake_layout(spark):
    df = spark.range(100).select(snowflake_id(T0).alias("sid"))
    rows = [r["sid"] for r in df.collect()]
    assert len(set(rows)) == 100  # unique without coordination
    for sid in rows:
        ts, seq, node = decompose_snowflake(sid)
        assert ts == T0
        assert 0 <= seq < 64 and 0 <= node < (1 << 16)
    assert EPOCH_2020_MS == 1_577_836_800_000


def test_schedule_natural_sort():
    ordered = natural_sort(BUILTIN_SCHEDULES)
    names = [s.name for s in ordered]
    # Twice-Daily fires same day; Daily next day; Annual near the end
    assert names[0] == "Twice-Daily"
    assert names.index("Daily") < names.index("Weekly") < names.index("Annual")
    assert names.index("Annual") < names.index("Biennial")


def test_html_to_text_block_aware():
    t = html_to_text(b"<h1>Title</h1><script>var x=1;</script><p>Para <b>one</b>.</p><p>Two</p>")
    assert t == "Title\nPara one.\nTwo"
    assert html_to_text(b"a<br>b") == "a\nb"


def test_jpeg_data_url():
    assert jpeg_data_url(b"abc") == "data:image/jpeg;base64,YWJj"


def test_reapply_rules(spark, tmp_path):
    """Rule.java:48-67: schedule-bearing rules rewrite next_visit of visited
    locations whose pathref matches; longest pattern wins."""
    from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
    from chronicrawl_spark.fixtures import test_server_site as make_site
    from chronicrawl_spark.tables import StateStore

    store = StateStore(spark, str(tmp_path / "s"), buckets=4)
    engine = CrawlEngine(spark, store, make_site(spark, "http://test.example"), CrawlConfig())
    engine.add_seeds(["http://test.example"], now=T0)
    engine.run(max_waves=9, k_origins=1, per_host_k=1)

    [origin_row] = store.read("origins").collect()
    oid = origin_row["origin_id"]
    rules = spark.createDataFrame(
        [(oid, "/sitemap.*", 1), (oid, "/sitemap-index\\.xml", 0)],  # Weekly / Daily
        store.read("rules").schema,
    )
    engine.store.merge("rules", rules, "upsert")
    engine.store.commit(engine.store.committed_wave + 1)
    n = engine.reapply_rules_to_origin(oid)
    assert n == 2  # both sitemap locations matched and were rescheduled

    rows = {r["path"]: r for r in store.read("frontier").collect()}
    # longest matching pattern wins: sitemap-index matches both rules, the
    # longer '/sitemap-index\.xml' (Daily, +1d from last_visit) applies
    smi = rows["/sitemap-index.xml"]
    assert smi["next_visit"] == smi["last_visit"] + 86_400_000
    sm = rows["/sitemap.xml"]
    assert sm["next_visit"] == sm["last_visit"] + 7 * 86_400_000
    # unvisited/unmatched rows untouched
    assert rows["/no"]["next_visit"] == (T0 + 180) + 7 * 86_400_000
