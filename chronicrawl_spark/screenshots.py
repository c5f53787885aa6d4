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
