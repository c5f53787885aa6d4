"""WARC/1.1 file export/import (ISO 28500; ref Storage.java:43-151).

Covers: gzip-member layout (each member independently decompressible),
warcinfo-per-file, request/response pairing via WARC-Concurrent-To, both
revisit profiles, payload digest verification, determinism, and the
import round-trip back into the engine's warc_records shape."""

import gzip
import hashlib

import pyspark.sql.functions as F
import pytest

from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
from chronicrawl_spark.fixtures import SITE_SCHEMA
from chronicrawl_spark.tables import StateStore
from chronicrawl_spark.warcfile import (
    PROFILE_URI,
    parse_warc,
    save_warc_files,
    warc_export,
    warc_import,
)

T0 = 1_600_000_000_000
ORIGIN = "http://wf.example"
BODY = b"<html><p>" + b"stable payload content far above the 64 byte dedupe floor " * 2 + b"</p></html>"


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    rows = [
        (ORIGIN + "/robots.txt", 200, "text/plain", b"", None, None, None),
        (ORIGIN + "/", 200, "text/html",
         b'<a href="/b.html">b</a>' + b"x" * 80, '"h"', None, None),
        (ORIGIN + "/b.html", 200, "text/html", BODY, None, None, None),
    ]
    site = spark.createDataFrame(rows, SITE_SCHEMA)
    store = StateStore(spark, str(tmp_path_factory.mktemp("wf") / "state"), buckets=4)
    eng = CrawlEngine(
        spark, store, site, CrawlConfig(initial_revisit_html_ms=60, min_revisit_ms=1)
    )
    eng.add_seeds([ORIGIN], now=T0)
    eng.run(max_waves=3, per_host_k=2)
    return store


def _export_files(store):
    return warc_export(store.read("warc_records"), store.read("visits")).collect()


def test_export_roundtrip_matches_table(spark, crawled):
    files = _export_files(crawled)
    assert files, "no warc files exported"
    table = {
        bytes(r["warc_id"]): r
        for r in crawled.read("warc_records").collect()
    }
    seen = set()
    for f in files:
        recs = parse_warc(bytes(f["data"]))
        assert recs[0]["headers"]["WARC-Type"] == "warcinfo"
        assert recs[0]["headers"]["WARC-Filename"] == f["name"]
        assert f["n_records"] == len(recs) - 1
        for rec in recs[1:]:
            h = rec["headers"]
            rid = bytes.fromhex(
                h["WARC-Record-ID"].strip("<>").rsplit(":", 1)[1].replace("-", "")
            )
            row = table[rid]
            seen.add(rid)
            assert h["WARC-Target-URI"] == row["url"]
            assert rec["version"] == "WARC/1.1"
            if row["record_type"] == "response":
                body = rec["block"]
                payload = body[body.index(b"\r\n\r\n") + 4 :]
                assert payload == bytes(row["payload"] or b"")
                if row["payload_digest"] is not None:
                    assert hashlib.sha1(payload).digest() == bytes(row["payload_digest"])
                    assert h["WARC-Payload-Digest"].startswith("sha1:")
            elif row["record_type"] == "revisit":
                assert h["WARC-Profile"] == PROFILE_URI[row["profile"]]
                assert "WARC-Refers-To-Date" in h
            else:
                assert h["Content-Type"] == "application/http;msgtype=request"
                assert rec["block"].startswith(b"GET ")
    assert seen == set(table), "every table record must appear in the export"


def test_members_and_pairing(crawled):
    files = _export_files(crawled)
    blob = bytes(files[0]["data"])
    # each gzip member decompresses independently (seekable .warc.gz layout)
    n_members = blob.count(b"\x1f\x8b\x08")
    assert n_members == files[0]["n_records"] + 1
    first = gzip.decompress(blob)  # gzip module stops... concatenated members OK
    assert first.startswith(b"WARC/1.1\r\n")
    # responses carry WARC-Concurrent-To naming the request record id
    recs = parse_warc(blob)
    ids = {r["headers"]["WARC-Record-ID"] for r in recs}
    for r in recs:
        if r["headers"]["WARC-Type"] in ("response", "revisit"):
            assert r["headers"]["WARC-Concurrent-To"] in ids


def test_export_is_deterministic(crawled):
    a = sorted((f["name"], bytes(f["data"])) for f in _export_files(crawled))
    b = sorted((f["name"], bytes(f["data"])) for f in _export_files(crawled))
    assert a == b


def test_save_and_import_roundtrip(spark, crawled, tmp_path):
    files = warc_export(crawled.read("warc_records"), crawled.read("visits"))
    n = save_warc_files(files, str(tmp_path / "warcs"))
    assert n >= 1
    raw = (
        spark.read.format("binaryFile")
        .load(str(tmp_path / "warcs") + "/*.warc.gz")
        .selectExpr("content as data")
    )
    imported = {
        bytes(r["warc_id"]): r for r in warc_import(raw).collect()
    }
    table = {bytes(r["warc_id"]): r for r in crawled.read("warc_records").collect()}
    assert set(imported) == set(table)
    for rid, row in table.items():
        imp = imported[rid]
        for col in ("record_type", "url", "date", "refers_to_date", "profile",
                    "origin_id", "path_id"):
            assert imp[col] == row[col], (col, row["url"])
        assert (imp["payload"] is None) == (row["payload"] is None) or bytes(
            imp["payload"] or b""
        ) == bytes(row["payload"] or b"")
        if row["payload_digest"] is not None and row["record_type"] == "response":
            assert bytes(imp["payload_digest"]) == bytes(row["payload_digest"])


def test_records_per_file_rotation(crawled):
    files = warc_export(
        crawled.read("warc_records"), crawled.read("visits"), records_per_file=2
    ).collect()
    assert all(f["n_records"] <= 2 for f in files)
    assert sum(f["n_records"] for f in files) == crawled.read("warc_records").count()


def test_cdx_index_locates_records(spark, crawled):
    """The export's per-file CDX index must (a) cover every response/revisit
    member, (b) render lines the engine's OWN S9 parser accepts, and
    (c) carry (offset, length, filename) that slice the exact gzip member
    for the record — the pywb replay contract."""
    from chronicrawl_spark.sources.cdx import export_cdx_lines, parse_cdx_lines

    files_df = warc_export(crawled.read("warc_records"), crawled.read("visits"))
    blobs = {f["name"]: bytes(f["data"]) for f in files_df.collect()}
    lines = [r["value"] for r in export_cdx_lines(files_df).collect()]

    n_indexed = (
        crawled.read("warc_records").filter(F.col("record_type") != "request").count()
    )
    assert len(lines) == n_indexed > 0

    parsed = parse_cdx_lines(
        spark.createDataFrame([(ln,) for ln in lines], "value string")
    ).collect()
    assert len(parsed) == len(lines)
    # CDX timestamps are second-resolution, so revisits of a URL within the
    # same second legitimately collide on (url, ts); the replay-unique key
    # is the record's physical address (filename, offset)
    addrs = {tuple(ln.split(" ")[9:11]) for ln in lines}
    assert len(addrs) == len(lines), "index entries must address distinct members"

    from base64 import b32encode

    for ln in lines:
        f = ln.split(" ")
        length, offset, fname = int(f[8]), int(f[9]), f[10]
        member = parse_warc(blobs[fname][offset : offset + length])
        assert len(member) == 1
        h = member[0]["headers"]
        assert h["WARC-Target-URI"] == f[2]
        assert h["WARC-Type"] in ("response", "revisit")
        if h["WARC-Type"] == "response" and f[5] != "-":
            body = member[0]["block"]
            payload = body[body.index(b"\r\n\r\n") + 4 :]
            assert f[5] == b32encode(hashlib.sha1(payload).digest()).decode()
