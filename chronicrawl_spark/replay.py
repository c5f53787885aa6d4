"""Replay lookups over the WARC store (J9/U2 surface).

The reference replays a capture by (a) resolving the URL+timestamp to a
visit via its CDX index — querying BOTH the http and https variants of the
URL and merging (``Webapp.java:160-174``, U2) — then (b) reading the WARC
record bytes for that visit (``Webapp.java:315-330``,
``Storage.java:157-182``, J9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tables import StateStore


def other_scheme(url: str) -> str:
    if url.startswith("https://"):
        return "http://" + url[len("https://"):]
    if url.startswith("http://"):
        return "https://" + url[len("http://"):]
    raise ValueError(f"not an http(s) url: {url}")


def cdx_scheme_union(cdx: DataFrame, url: str) -> DataFrame:
    """U2 (``Webapp.java:160-174``): captures of a URL under BOTH schemes,
    merged and ordered by capture date.  Expressed as the reference does it
    — two exact-match lookups unioned — so each filter pushes down to the
    index scan independently."""
    a = cdx.filter(F.col("url") == url)
    b = cdx.filter(F.col("url") == other_scheme(url))
    return a.unionByName(b).orderBy("arc_date", "url")


def closest_capture(cdx: DataFrame, url: str, ts_ms: int) -> DataFrame:
    """Replay target pick: nearest capture to the requested timestamp over
    both schemes (true nearest — contrast with the J6 conditional-GET quirk
    that sorts ABS() DESC; ``Webapp.java:160-174``)."""
    both = cdx_scheme_union(cdx, url)
    ts = F.unix_millis(F.to_timestamp("arc_date", "yyyyMMddHHmmss"))
    return both.orderBy(F.abs(ts - F.lit(ts_ms)).asc(), F.col("arc_date").asc()).limit(1)


def fetch_record(store: StateStore, warc_id: bytes, origin_id: int | None = None) -> DataFrame:
    """J9 (``Webapp.java:315-330``, ``Storage.java:157-182``): point lookup
    of a WARC record by id.

    With ``origin_id`` the scan is pruned to the one storage bucket that can
    hold the record (warc_records is bucketed by pmod(origin_id, B)) — the
    Spark analog of the reference's (warc_id) index; without it the filter
    still pushes down to every bucket's parquet stats."""
    if origin_id is not None:
        warc = store.read_pruned("warc_records", [origin_id % store.buckets])
    else:
        warc = store.read("warc_records")
    return warc.filter(F.col("warc_id") == F.lit(warc_id))
