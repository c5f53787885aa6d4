"""CDX source (S9) + replay view: the 5 reference fixture lines parse into 5
visits (ExternalArchiveTest.java:25-30), base32 render matches RFC 4648."""

import base64

import pyspark.sql.functions as F

from chronicrawl_spark.sources.cdx import base32_expr, parse_cdx_lines

# TestServer.java:24-30 — verbatim fixture lines
CDX_LINES = [
    "org,example)/ 20060821020814 http://www.example.org/ text/html 200 EF7YLJGKQUMLJFP3F7A7LBALC65T5W2O - - 525 77993419 crawl-20060821020518.warc.gz",
    "org,example)/ 20060823203808 http://example.org/ text/html 200 EF7YLJGKQUMLJFP3F7A7LBALC65T5W2O - - 523 111803 crawl-20060823203806.warc.gz",
    "org,example)/ 20060824035313 http://example.org/ text/html 200 EF7YLJGKQUMLJFP3F7A7LBALC65T5W2O - - 524 58936500 crawl-20060824034615.warc.gz",
    "org,example)/ 20060917031959 http://example.org/ text/html 200 EF7YLJGKQUMLJFP3F7A7LBALC65T5W2O - - 525 11333459 crawl-20060917031601.warc.gz",
    "org,example)/ 20110409185614 http://example.org/ - 302 3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ http://www.iana.org/domains/example/ - 337 292552577 crawl-20110409185451.warc.gz",
]


def test_parse_reference_cdx_lines(spark):
    df = spark.createDataFrame([(l,) for l in CDX_LINES], ["value"])
    rows = parse_cdx_lines(df).orderBy("date").collect()
    assert len(rows) == 5
    r0 = rows[0]
    assert r0["url"] == "http://www.example.org/"
    assert r0["status"] == 200
    assert r0["content_type"] == "text/html"
    assert r0["length"] == 525
    assert r0["offset"] == 77993419
    assert r0["filename"] == "crawl-20060821020518.warc.gz"
    # 20060821020814 UTC
    from datetime import datetime, timezone

    assert r0["date"] == int(
        datetime(2006, 8, 21, 2, 8, 14, tzinfo=timezone.utc).timestamp() * 1000
    )
    # '-' fields → NULL; the 302 line carries a redirect target
    r4 = rows[4]
    assert r4["content_type"] is None
    assert r4["status"] == 302
    assert r4["redirect"] == "http://www.iana.org/domains/example/"


def test_base32_render_matches_rfc4648(spark):
    payloads = [b"\x00" * 20, bytes(range(20)), b"\xff" * 20, b"chronicrawl-digest!!"]
    df = spark.createDataFrame([(p,) for p in payloads], "b binary")
    got = [r["b32"] for r in df.select(base32_expr(F.col("b")).alias("b32")).collect()]
    want = [base64.b32encode(p).decode() for p in payloads]
    assert got == want
