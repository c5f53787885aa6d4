"""Wave selection — the reference's origin/location priority queues as
declarative DataFrame ops.

Reference semantics:
- W1 origin pick: ``crawl_policy='CONTINUOUS' AND next_visit IS NOT NULL
  ORDER BY next_visit ASC LIMIT n`` (``Database.java:174-177``).
- W2 location pick (THE core operator): per origin,
  ``next_visit <= now ORDER BY location_type_id DESC, se.priority DESC,
  depth ASC, next_visit ASC LIMIT n`` (``Database.java:264-269``) with
  ROBOTS=3 > SITEMAP=2 > TRANSCLUSION=1 > PAGE=0 (``schema.sql:39``) and
  SQLite NULLS-LAST ordering for ``priority DESC``.

Tie-breaks beyond the reference's ORDER BY are unspecified in SQLite; we pin
``path_id ASC`` for determinism (documented divergence — only reachable when
two locations tie on all four keys).

Scale design: the window partitions by ``origin_id``.  A hot host with 10^8
due rows would land on one task, so ``per_host_top_k`` supports **salted
two-phase top-k**: rank within ``(origin_id, pmod(path_id, S))`` first
(S-way spread of the hot host), keep k per salt, then rank the ≤ S·k
survivors per host.  Both phases are plain window functions — Catalyst
keeps filters/pruning; AQE cannot split skew inside a window, hence the
explicit salt (SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LOCATION_TYPE_ID = {"PAGE": 0, "TRANSCLUSION": 1, "SITEMAP": 2, "ROBOTS": 3}


def location_type_id_col(col: str = "location_type"):
    """location_type string → reference type id (schema.sql:39)."""
    c = F.col(col)
    return (
        F.when(c == "ROBOTS", F.lit(3))
        .when(c == "SITEMAP", F.lit(2))
        .when(c == "TRANSCLUSION", F.lit(1))
        .otherwise(F.lit(0))
    )


def eligible_origins(origins: DataFrame, wave_ts: int) -> DataFrame:
    """F1 + due-at-T filter (``Database.java:174-176``)."""
    return origins.filter(
        (F.col("crawl_policy") == "CONTINUOUS")
        & F.col("next_visit").isNotNull()
        & (F.col("next_visit") <= F.lit(wave_ts))
    )


def _w2_order(df: DataFrame):
    return [
        F.col("__type_id").desc(),
        F.col("priority").desc_nulls_last(),
        F.col("depth").asc(),
        F.col("next_visit").asc(),
        F.col("path_id").asc(),  # deterministic tie-break (divergence: documented)
    ]


def per_host_top_k(
    due: DataFrame,
    k: int = 1,
    salt: int | None = None,
) -> DataFrame:
    """W2: top-k due locations per origin by the reference ordering.

    ``due`` must carry frontier columns + nullable ``priority`` (J2 already
    applied).  With ``salt=S``, runs the two-phase skew-safe variant.
    """
    due = due.withColumn("__type_id", location_type_id_col())
    order = _w2_order(due)
    if salt and salt > 1:
        w1 = Window.partitionBy("origin_id", F.pmod(F.col("path_id"), F.lit(salt))).orderBy(*order)
        due = due.withColumn("__rn1", F.row_number().over(w1)).filter(F.col("__rn1") <= k)
        due = due.drop("__rn1")
    w2 = Window.partitionBy("origin_id").orderBy(*order)
    return (
        due.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__type_id")
    )


def select_wave(
    frontier: DataFrame,
    origins_eligible: DataFrame,
    sitemap_entries: DataFrame,
    wave_ts: int,
    k: int = 1,
    salt: int | None = None,
) -> DataFrame:
    """Full wave selection: F2 due filter ⨝ eligible origins ⨝ sitemap
    priority (J2) → W2 top-k per host.

    Returns frontier columns + origin columns (origin, robots_txt,
    robots_crawl_delay, crawl_policy) + ``priority`` + ``url``.

    Plan shape at scale: the F2 filter prunes to due rows before any join
    (predicate pushdown to the parquet/Iceberg scan via min/max stats on
    ``next_visit``); the eligible-origins side is the small one (hosts, not
    URLs) and broadcast-joins; sitemap_entries joins on the bucketed key.
    """
    due = frontier.filter(F.col("next_visit") <= F.lit(wave_ts))
    orig = origins_eligible.select(
        "origin_id", "origin", "robots_txt", "robots_crawl_delay", "crawl_policy"
    )
    # origins per wave ≪ frontier rows — broadcast the host side
    due = due.join(F.broadcast(orig), "origin_id", "inner")
    # J2 carries priority (queue ordering) and changefreq (C11 revisit cascade
    # reads it for the fetched location — Database.java:345-346)
    se = sitemap_entries.select("origin_id", "path_id", "priority", "changefreq")
    # sitemap-entry hints are tiny relative to the frontier — broadcast
    due = due.join(F.broadcast(se), ["origin_id", "path_id"], "left")
    wave = per_host_top_k(due, k=k, salt=salt)
    return wave.withColumn("url", F.concat(F.col("origin"), F.col("path")))
