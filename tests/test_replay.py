"""U2 scheme-union replay lookup + retention windows (W8/A3/W3 shapes)."""

import pyspark.sql.functions as F
import pytest

from chronicrawl_spark.operators.retention import expiry_counts, keep_newest_k, newest_per_key
from chronicrawl_spark.replay import cdx_scheme_union, closest_capture, other_scheme

CAPS = [
    ("http://e.org/p", "19990101000000", 200),
    ("https://e.org/p", "20050101000000", 200),
    ("http://e.org/p", "20100101000000", 404),
    ("http://x.org/q", "20050101000000", 200),
]


def _cdx(spark):
    return spark.createDataFrame(CAPS, "url string, arc_date string, status int")


def test_other_scheme():
    assert other_scheme("http://a/b") == "https://a/b"
    assert other_scheme("https://a/b") == "http://a/b"
    with pytest.raises(ValueError):
        other_scheme("ftp://a/b")


def test_scheme_union_surfaces_both(spark):
    rows = cdx_scheme_union(_cdx(spark), "http://e.org/p").collect()
    assert [r["arc_date"] for r in rows] == ["19990101000000", "20050101000000", "20100101000000"]
    assert {r["url"] for r in rows} == {"http://e.org/p", "https://e.org/p"}


def test_closest_capture_true_nearest(spark):
    [r] = closest_capture(_cdx(spark), "https://e.org/p", 1_200_000_000_000).collect()
    # 2008-ish target → nearest is the 2010 http capture (both schemes pooled)
    assert r["arc_date"] == "20100101000000"


def test_retention_ops(spark):
    df = spark.createDataFrame(
        [("a", i, 100 + i) for i in range(7)] + [("b", 0, 50)], "k string, i int, ts int"
    )
    kept = keep_newest_k(df, ["k"], [F.col("ts").desc()], k=3)
    assert kept.filter(F.col("k") == "a").count() == 3
    assert kept.filter(F.col("k") == "b").count() == 1
    [na] = newest_per_key(df, ["k"], [F.col("ts").desc()]).filter(F.col("k") == "a").collect()
    assert na["ts"] == 106
    exp = {r["k"]: (r["n_total"], r["n_expired"]) for r in expiry_counts(df, ["k"], keep=5).collect()}
    assert exp == {"a": (7, 2), "b": (1, 0)}
