"""S11/W8 — screenshot cache sink, newest-K retention, recency view.

The reference stores one screenshot blob per browser-rendered visit
(``Exchange.java:198-201``), expires everything past the newest 100 per
location (``Database.java:455-474``), and serves the most recent one to the
UI (``Database.java:467-473``).  The producer (headless browser, S8) is out
of sandbox scope; this module implements the full storage semantics over
the ``screenshots`` append table so a browser-equipped deployment only has
to feed rows in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.retention import keep_newest_k, newest_per_key
from .tables import SCREENSHOTS_SCHEMA, StateStore

KEEP_NEWEST = 100  # Database.java:456 (expiry horizon)


def add_screenshots(store: StateStore, rows: DataFrame, wave: int) -> None:
    """S11 sink: append screenshot rows (bucketed by origin like the other
    payload tables) and publish with the wave commit."""
    store.append("screenshots", rows.select([f.name for f in SCREENSHOTS_SCHEMA.fields]), wave)


# JVM-side magic-byte prefilter: only payloads that start like one of the
# four supported codecs reach the Python resize stage — HTML/CSS/robots
# payloads are dropped at the scan, so the derived-media job is a narrow
# filter + map with zero shuffle (mirrors imaging.sniff_format).
def _is_image_payload(col):
    magic4 = F.substring(col, 1, 4)
    return col.isNotNull() & (
        (F.substring(col, 1, 2) == F.lit(b"BM"))
        | (magic4 == F.lit(b"\x89PNG"))
        | (F.substring(col, 1, 3) == F.lit(b"\xff\xd8\xff"))
        | (magic4 == F.lit(b"GIF8"))
    )


def image_response_thumbnails(warc: DataFrame, max_dim: int = 16) -> DataFrame:
    """In-sandbox producer for the screenshot cache: every stored image
    response becomes a (screenshot = original payload, thumbnail = derived
    PNG) row.  The reference fills this table from the headless browser
    (S8, out of sandbox scope); fetched image payloads are the real
    producer here — fetch → sniff → decode → bilinear resize → lossless
    PNG, all inside the Arrow resize stage (imaging.image_thumbnails) with
    keys echoed through (no join-back, payload blobs never shuffle).
    Undecodable rows (truncated/poison payloads past the magic check) are
    dropped, not fatal."""
    from .extras.imaging import image_thumbnails

    resp = warc.filter(
        (F.col("record_type") == "response") & _is_image_payload(F.col("payload"))
    )
    prepared = resp.select(
        F.concat_ws("|", "origin_id", "path_id", "date").alias("image_id"),
        F.col("payload").alias("bytes"),
        F.lit(None).cast("string").alias("fmt"),  # sniffed from magic bytes
        "origin_id",
        "path_id",
        "date",
        "payload",
    )
    th = image_thumbnails(
        prepared, max_dim=max_dim, carry_cols=("origin_id", "path_id", "date", "payload")
    )
    return th.filter(F.col("error").isNull()).select(
        "origin_id",
        "path_id",
        "date",
        F.col("payload").alias("screenshot"),
        F.col("thumbnail"),
    )


def derive_image_screenshots(
    store: StateStore, wave: int, max_dim: int = 16, buckets=None
) -> None:
    """Derive-and-sink convenience: thumbnail the stored image responses
    (optionally only the ``buckets`` a wave touched — read_pruned keeps
    the 10^10-row archive out of the scan) and append to the cache."""
    warc = store.read_pruned("warc_records", buckets)
    add_screenshots(store, image_response_thumbnails(warc, max_dim), wave)


def latest_screenshots(store: StateStore) -> DataFrame:
    """W8 (Database.java:467-473): the most recent screenshot per location."""
    return newest_per_key(
        store.read("screenshots"),
        ["origin_id", "path_id"],
        [F.col("date").desc()],
    )


def expire_screenshots(store: StateStore, keep: int = KEEP_NEWEST, commit: bool = True) -> int:
    """A3/S11 expiry (Database.java:455-474): keep the newest ``keep`` rows
    per location, drop the rest — a maintenance rewrite (Iceberg
    rewrite-data-files analog), not a per-wave cost.  Returns rows kept."""
    if store.has_staged_changes():
        # a crawl step is mid-wave: this maintenance rewrite would share its
        # wave number/dir with the in-flight wave and dynamic overwrite
        # would interleave retention-kept rows with fresh appends
        raise RuntimeError("expire_screenshots: store has staged (mid-wave) writes; commit or roll back first")
    cur = store.read("screenshots")
    kept = keep_newest_k(cur, ["origin_id", "path_id"], [F.col("date").desc()], keep).drop("rn")
    wave = store.committed_wave + 1
    store.replace_append("screenshots", kept, wave)
    if commit:
        store.commit(wave)
    return store.read_staged("screenshots").count() if not commit else store.read("screenshots").count()
