"""Revisit machinery end-to-end: server-304 conditional GET (J6 + revisit
record), digest dedupe (J7 + identical_payload_digest), AIMD halving.

Timeline (per_host_k=2, initial_revisit_html=60ms, politeness 30ms ×2
fetches → origin due every 60ms):

  T0      robots(200) + /(200, etag "h", discovers /b)
  T0+60   /b(200 first fetch) + /(304 server_not_modified → refers T0;
          AIMD: dur 60 → halve → next +30)
  T0+120  /(304 again, refers T0 — findClosest excludes 304s) +
          /b(200 but identical payload → identical_payload_digest revisit
          refers T0+60)
"""

import pyspark.sql.functions as F

from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
from chronicrawl_spark.fixtures import SITE_SCHEMA
from chronicrawl_spark.tables import StateStore

T0 = 1_600_000_000_000
ORIGIN = "http://rv.example"
BODY_B = b"<html><p>" + b"stable payload content far above the 64 byte dedupe floor " * 2 + b"</p></html>"


def _site(spark):
    rows = [
        (ORIGIN + "/robots.txt", 200, "text/plain", b"", None, None, None),
        (
            ORIGIN + "/", 200, "text/html",
            b'<a href="/b.html">b</a>' + b"x" * 80, '"h"', None, None,
        ),
        (ORIGIN + "/b.html", 200, "text/html", BODY_B, None, None, None),
    ]
    return spark.createDataFrame(rows, SITE_SCHEMA)


def test_revisit_304_and_digest_dedupe(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "state"), buckets=4)
    cfg = CrawlConfig(initial_revisit_html_ms=60, min_revisit_ms=1)
    engine = CrawlEngine(spark, store, _site(spark), cfg)
    engine.add_seeds([ORIGIN], now=T0)
    engine.run(max_waves=3, per_host_k=2)

    frontier = {r["path_id"]: r["path"] for r in store.read("frontier").collect()}
    visits = sorted(
        (r["date"], frontier[r["path_id"]], r["status"], r["revisit_of_date"])
        for r in store.read("visits").collect()
    )
    assert visits == [
        (T0, "/", 200, None),
        (T0, "/robots.txt", 200, None),
        (T0 + 60, "/", 304, T0),  # server_not_modified via ETag
        (T0 + 60, "/b.html", 200, None),
        (T0 + 120, "/", 304, T0),  # findClosest excludes 304s → still refers T0
        (T0 + 120, "/b.html", 200, T0 + 60),  # identical payload digest
    ]

    warc = store.read("warc_records").filter(F.col("record_type") == "revisit").collect()
    profiles = sorted((r["url"].rsplit("/", 1)[1], r["profile"], r["refers_to_date"]) for r in warc)
    assert profiles == [
        ("", "server_not_modified", T0),
        ("", "server_not_modified", T0),
        ("b.html", "identical_payload_digest", T0 + 60),
    ]
    # revisit records carry no payload (Storage.java:101-113 readHeaderOnly)
    assert all(r["payload"] is None for r in warc)

    # AIMD halving with the reference's inverted branch: revisit ⇒ dur/2
    nv = {frontier[r["path_id"]]: r["next_visit"] for r in store.read("frontier").collect()}
    assert nv["/"] == (T0 + 120) + 30  # dur 60 → /2 → 30 (≥ min_revisit 1)
    assert nv["/b.html"] == (T0 + 120) + 30
