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
    broadcast_origins: bool = False,
    broadcast_sitemap: bool = False,
) -> DataFrame:
    """Full wave selection: F2 due filter ⨝ eligible origins ⨝ sitemap
    priority (J2) → W2 top-k per host.

    Returns frontier columns + origin columns (origin, robots_txt,
    robots_crawl_delay, crawl_policy, discovered as ``o_discovered``) +
    ``priority`` + ``changefreq`` + ``url``.

    Plan shape at scale — rank NARROW, join carry-cols AFTER top-k:
    - The F2 filter prunes to due rows before any join (predicate pushdown
      to the parquet/Iceberg scan via min/max stats on ``next_visit``).
    - Eligibility is a LEFT-SEMI against origin ids only: no origin payload
      — in particular no 512 KiB ``robots_txt`` blobs — ever enters the W2
      window's hash shuffle.  The reference ranks on nothing but
      type/priority/depth/next_visit (``Database.java:264-269``).
    - J2 joins only the two tiny ranking/cascade fields (``priority``
      double, ``changefreq`` short string) pre-window.  ``changefreq``
      deliberately rides this join rather than a post-top-k one: the
      (origin_id, path_id) se join already happens for ``priority``, and
      re-joining the URL-keyed sitemap_entries table against the selected
      wave later would re-shuffle the *huge* side a second time for 8
      bytes/row of savings.
    - Origin carry-cols (origin string, robots blob, delay, policy,
      discovered) join onto the ≤ k·hosts selected wave AFTER top-k, so a
      host's robots blob moves once per selected host, not once per due row.
    - SIZE-GATED broadcast hints (``broadcast_origins`` /
      ``broadcast_sitemap``, decided by the caller from manifest file
      bytes — ``StateStore.table_bytes``, the Iceberg
      snapshot-manifest-size analog; both default FALSE so a caller that
      hasn't proven the table small never plants an unconditional hint —
      the driver-OOM-at-10^8-hosts hazard): when the dim side is known-small the
      hint is planted explicitly, because letting AQE convert at runtime
      still MATERIALIZES the big side's shuffle map stage first — measured
      2× on wave_select at 16 cores (MoR-resolved reads carry no size
      stats, so the static planner never broadcasts them).  Past the gate
      no hint is planted: at 10^8 hosts (or a URL-keyed sitemap_entries)
      neither side fits a driver/executor broadcast budget and SMJ + AQE
      skew handling take over.
    """
    due = frontier.filter(F.col("next_visit") <= F.lit(wave_ts))
    oids = origins_eligible.select("origin_id")
    due = due.join(F.broadcast(oids) if broadcast_origins else oids, "origin_id", "left_semi")
    # J2 ranking hint + C11 revisit-cascade field (Database.java:345-346)
    se = sitemap_entries.select("origin_id", "path_id", "priority", "changefreq")
    due = due.join(F.broadcast(se) if broadcast_sitemap else se, ["origin_id", "path_id"], "left")
    wave = per_host_top_k(due, k=k, salt=salt)
    orig = origins_eligible.select(
        "origin_id",
        "origin",
        "robots_txt",
        "robots_crawl_delay",
        "crawl_policy",
        F.col("discovered").alias("o_discovered"),
    )
    wave = wave.join(F.broadcast(orig) if broadcast_origins else orig, "origin_id", "inner")
    return wave.withColumn("url", F.concat(F.col("origin"), F.col("path")))
