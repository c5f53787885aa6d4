"""Driver contract: entry / queries / oracle_sql.

``queries()`` maps every implemented operator family from SURVEY.md §2 to a
(spark, sf_dir) → DataFrame callable; ``oracle_sql()`` gives the DuckDB-
equivalent ANSI SQL over the same parquet views.  Column names and types are
aligned pair-by-pair (the driver hashes values after sorting columns by
name).  Floats are scaled to BIGINT (``*_e6``/``*_e2``) to avoid
float-formatting drift between engines.

Crawl-semantics operators (W1/W2/J5/J6/J7/A1/A3/A4/W3/W4/W5/U1/C10/C11/C12)
are expressed over the shared TPC-H-ish tables so DuckDB can verify them
value-for-value; the full crawl-engine pipeline itself (wave loop, robots,
sitemap, AIMD state machine) is exercised by the rows-only entries
(``crawl_fixture_trace``, ``seen_filter_equivalence``,
...) and bit-exactly by ``tests/test_crawl_parity.py``.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from collections.abc import Callable

import pandas as pd  # noqa: F401  (pandas_udf annotation resolution)

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DAY_MS = 86_400_000


def _ms(c):
    """epoch millis from a (possibly NTZ) timestamp column; session tz is UTC
    so NTZ-as-UTC matches DuckDB epoch_ms()."""
    return F.unix_millis(F.col(c) if not isinstance(c, str) else F.col(c).cast("timestamp_ltz"))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(df: DataFrame) -> DataFrame:
    """Gated round-robin repartition to session parallelism (a small
    single-row-group parquet file scans as ONE task; map-heavy queries —
    per-row md5, tokenization — would run single-core).  Applied only where
    the map work measurably exceeds the extra exchange; no-op at scale."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


# --------------------------------------------------------------------------
# crawl-shaped operators over shared tables (oracle-verified)
# --------------------------------------------------------------------------

def q_w2_wave_select(spark, sf_dir):
    """W2 (Database.java:264-269): per-host priority-queue top-k with the
    exact ordering type DESC, priority DESC NULLS LAST, depth ASC,
    next_visit ASC (+path_id tiebreak), over a frontier derived from orders.
    Runs the SHIPPED operator (operators/wave.per_host_top_k) — the gate
    certifies engine code, not an inline re-expression."""
    from chronicrawl_spark.operators.wave import per_host_top_k

    o = _t(spark, sf_dir, "orders")
    tid = F.col("o_orderkey") % 4
    loc_type = (
        F.when(tid == 3, "ROBOTS")
        .when(tid == 2, "SITEMAP")
        .when(tid == 1, "TRANSCLUSION")
        .otherwise("PAGE")
    )
    fr = o.select(
        F.col("o_custkey").alias("origin_id"),
        F.col("o_orderkey").alias("path_id"),
        loc_type.alias("location_type"),
        F.when(F.col("o_totalprice") > 150000, F.round("o_totalprice").cast("long")).alias("priority"),
        (F.col("o_orderkey") % 7).alias("depth"),
        _ms("o_orderdate").alias("next_visit"),
    )
    return per_host_top_k(fr, k=2).select(
        "origin_id", "path_id", "location_type", "priority", "depth", "next_visit"
    )


SQL_W2 = """
WITH fr AS (
  SELECT o_custkey AS origin_id, o_orderkey AS path_id,
         o_orderkey % 4 AS type_id,
         CASE o_orderkey % 4 WHEN 3 THEN 'ROBOTS' WHEN 2 THEN 'SITEMAP'
              WHEN 1 THEN 'TRANSCLUSION' ELSE 'PAGE' END AS location_type,
         CASE WHEN o_totalprice > 150000 THEN CAST(ROUND(o_totalprice) AS BIGINT) END AS priority,
         o_orderkey % 7 AS depth,
         epoch_ms(o_orderdate) AS next_visit
  FROM orders)
SELECT origin_id, path_id, location_type, priority, depth, next_visit
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY origin_id ORDER BY
        type_id DESC, priority DESC NULLS LAST, depth ASC, next_visit ASC, path_id ASC) AS rn
      FROM fr) t
WHERE rn <= 2
"""


def q_w1_origin_peek(spark, sf_dir):
    """W1 (Database.java:174-177): eligible origins by next_visit ASC LIMIT."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("origin_id"))
        .agg(F.min(_ms("o_orderdate")).alias("next_visit"), F.count("*").alias("n_locations"))
        .orderBy(F.col("next_visit").asc(), F.col("origin_id").asc())
        .limit(10)
    )


SQL_W1 = """
SELECT o_custkey AS origin_id, MIN(epoch_ms(o_orderdate)) AS next_visit, COUNT(*) AS n_locations
FROM orders GROUP BY 1 ORDER BY next_visit ASC, origin_id ASC LIMIT 10
"""


def q_j5_urlseen_antijoin(spark, sf_dir):
    """J5 (Database.java:186-251 tryInsert): discovered-minus-seen anti-join."""
    li = _t(spark, sf_dir, "lineitem")
    discovered = li.filter(F.col("l_shipdate") >= "1997-01-01").select(
        F.col("l_partkey").alias("partkey")
    ).distinct()
    seen = li.filter(F.col("l_shipdate") < "1997-01-01").select(
        F.col("l_partkey").alias("partkey")
    ).distinct()
    return discovered.join(seen, "partkey", "left_anti")


SQL_J5 = """
SELECT DISTINCT l_partkey AS partkey FROM lineitem WHERE l_shipdate >= DATE '1997-01-01'
AND l_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_shipdate < DATE '1997-01-01')
ORDER BY partkey
"""


def q_j6_asof_furthest(spark, sf_dir):
    """J6 quirk (Database.java:387-391): ORDER BY ABS(date-?) DESC LIMIT 1 —
    the 'closest' lookup that actually picks the furthest; copied exactly.
    Runs the SHIPPED operator (sources/fetchsim.asof_prev_visit) over a
    visits-shaped projection of lineitem."""
    from chronicrawl_spark.sources.fetchsim import asof_prev_visit

    from datetime import datetime, timezone

    li = _t(spark, sf_dir, "lineitem")
    target_ms = int(datetime(1996, 6, 30, tzinfo=timezone.utc).timestamp() * 1000)
    visits = li.select(
        F.col("l_orderkey").alias("origin_id"),
        F.lit(0).cast("long").alias("path_id"),
        _ms("l_shipdate").alias("date"),
        F.lit(200).cast("short").alias("status"),
        F.lit("GET").alias("method"),
    )
    return asof_prev_visit(visits, target_ms).select(
        F.col("origin_id").alias("orderkey"), F.col("prev_date").alias("prev_ms")
    )


SQL_J6 = """
SELECT l_orderkey AS orderkey, epoch_ms(l_shipdate) AS prev_ms
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY
        ABS(epoch_ms(l_shipdate) - epoch_ms(TIMESTAMP '1996-06-30 00:00:00')) DESC,
        epoch_ms(l_shipdate) DESC) rn
      FROM lineitem) t
WHERE rn = 1 ORDER BY orderkey
"""


def q_j7_digest_dedupe(spark, sf_dir):
    """J7 (Storage.java:114-137): duplicate-payload groups by truncated digest
    with earliest-original pick."""
    # group on the raw "partkey|suppkey" key and md5 AFTER the aggregate:
    # md5 is a function of the group key, so hashing once per group (not per
    # row) and shuffling the short concat key (not the 32-char hex digest)
    # yields byte-identical groups with less CPU and narrower shuffle rows.
    # No _spread: with the per-row md5 gone the map side is a cheap partial
    # agg, cheaper than the extra exchange even on a single-task local scan
    li = _t(spark, sf_dir, "lineitem")
    d = li.select(
        F.concat_ws("|", F.col("l_partkey"), F.col("l_suppkey")).alias("k"),
        _ms("l_shipdate").alias("ship_ms"),
    )
    return (
        d.groupBy("k")
        .agg(F.count("*").alias("n"), F.min("ship_ms").alias("first_ms"))
        .filter(F.col("n") >= 2)
        .select(F.md5("k").alias("digest"), "n", "first_ms")
    )


SQL_J7 = """
SELECT md5(l_partkey || '|' || l_suppkey) AS digest, COUNT(*) AS n,
       MIN(epoch_ms(l_shipdate)) AS first_ms
FROM lineitem GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY digest
"""


def q_a1_metrics_buckets(spark, sf_dir):
    """A1 (Database.java:435-440): ROUND(date/Δ)*Δ time buckets (ROUND, not
    FLOOR — reference quirk) with count + sum."""
    e = _t(spark, sf_dir, "events")
    bucket = (F.round(_ms("ts") / 3600000.0).cast("long") * 3600000).alias("bucket_ms")
    return (
        e.select(bucket, F.round(F.col("value") * 100).cast("long").alias("cents"))
        .groupBy("bucket_ms")
        .agg(F.count("*").alias("visits"), F.sum("cents").alias("total_cents"))
        
    )


SQL_A1 = """
SELECT CAST(ROUND(epoch_ms(ts)/3600000.0) AS BIGINT)*3600000 AS bucket_ms,
       COUNT(*) AS visits, CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events GROUP BY 1 ORDER BY 1
"""


def q_w4_log_pagination(spark, sf_dir):
    """W4 (Database.java:409-433): keyset pagination of the crawl log."""
    e = _t(spark, sf_dir, "events")
    cutoff = e.agg(F.max(_ms("ts"))).collect()[0][0]
    return (
        e.select("event_id", _ms("ts").alias("ts_ms"), "event_type", "user_id")
        .filter(F.col("ts_ms") < F.lit(cutoff))
        .orderBy(F.col("ts_ms").desc(), F.col("event_id").desc())
        .limit(100)
    )


SQL_W4 = """
SELECT event_id, epoch_ms(ts) AS ts_ms, event_type, user_id
FROM events WHERE epoch_ms(ts) < (SELECT MAX(epoch_ms(ts)) FROM events)
ORDER BY ts_ms DESC, event_id DESC LIMIT 100
"""


def q_j3_cdx_star(spark, sf_dir):
    """J3 (Database.java:397-433): crawl-log star join with broadcast dims."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("visits"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents"),
        )
        
    )


SQL_J3 = """
SELECT n_name AS nation, r_name AS region, COUNT(*) AS visits,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2 ORDER BY nation
"""


def q_a4_longest_rule(spark, sf_dir):
    """A4 (Rule.java:33-42): longest matching pattern wins per group."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.length("p_type").desc(), F.col("p_type").asc())
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("longest_type"),
            F.length("p_type").cast("long").alias("pattern_len"),
        )
        
    )


SQL_A4 = """
SELECT p_brand AS brand, p_type AS longest_type, CAST(LENGTH(p_type) AS BIGINT) AS pattern_len
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY LENGTH(p_type) DESC, p_type ASC) rn
      FROM part) t
WHERE rn = 1 ORDER BY brand
"""


def q_w3_visit_history(spark, sf_dir):
    """W3 (Database.java:357-360): per-key newest-N history — runs the
    shipped operators/retention.keep_newest_k."""
    from chronicrawl_spark.operators.retention import keep_newest_k

    li = _t(spark, sf_dir, "lineitem")
    return keep_newest_k(
        li,
        ["l_partkey"],
        [_ms("l_shipdate").desc(), F.col("l_orderkey").desc(), F.col("l_linenumber").desc()],
        k=3,
    ).select(
        F.col("l_partkey").alias("partkey"),
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").cast("long").alias("linenumber"),
        "rn",
    )


SQL_W3 = """
SELECT l_partkey AS partkey, l_orderkey AS orderkey, CAST(l_linenumber AS BIGINT) AS linenumber, rn
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY
        epoch_ms(l_shipdate) DESC, l_orderkey DESC, l_linenumber DESC) rn
      FROM lineitem) t
WHERE rn <= 3
"""


def q_a3_retention_expiry(spark, sf_dir):
    """A3 (Database.java:455-474): keep-newest-K retention accounting — runs
    the shipped operators/retention.expiry_counts."""
    from chronicrawl_spark.operators.retention import expiry_counts

    e = _t(spark, sf_dir, "events")
    return expiry_counts(e, ["user_id"], keep=5)


SQL_A3 = """
SELECT user_id, COUNT(*) AS n_total, GREATEST(COUNT(*) - 5, 0) AS n_expired
FROM events GROUP BY 1 ORDER BY user_id
"""


def q_w8_screenshot_recency(spark, sf_dir):
    """W8 (Database.java:467-473): most recent screenshot per location —
    the shipped operators/retention.newest_per_key over an events-shaped
    screenshot log."""
    from chronicrawl_spark.operators.retention import newest_per_key

    e = _t(spark, sf_dir, "events")
    return newest_per_key(
        e, ["user_id"], [_ms("ts").desc(), F.col("event_id").desc()]
    ).select("user_id", "event_id", _ms("ts").alias("ts_ms"))


SQL_W8 = """
SELECT user_id, event_id, epoch_ms(ts) AS ts_ms
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
        epoch_ms(ts) DESC, event_id DESC) rn FROM events) t
WHERE rn = 1 ORDER BY user_id
"""


def q_a2_max_bucket(spark, sf_dir):
    """A2 (Webapp.java:440-445): max over the A1 time buckets (chart y-axis
    scaling)."""
    e = _t(spark, sf_dir, "events")
    bucket = (F.round(_ms("ts") / 3600000.0).cast("long") * 3600000).alias("bucket_ms")
    buckets = e.select(bucket).groupBy("bucket_ms").agg(F.count("*").alias("visits"))
    return buckets.agg(
        F.max("visits").alias("max_visits"), F.count("*").cast("long").alias("n_buckets")
    )


SQL_A2 = """
WITH b AS (SELECT CAST(ROUND(epoch_ms(ts)/3600000.0) AS BIGINT)*3600000 AS bucket_ms,
                  COUNT(*) AS visits
           FROM events GROUP BY 1)
SELECT CAST(MAX(visits) AS BIGINT) AS max_visits, CAST(COUNT(*) AS BIGINT) AS n_buckets FROM b
"""


def q_u1_merged_visits(spark, sf_dir):
    """U1/W6 (Crawl.java:139-147): union of two visit sources, newest-first."""
    e = _t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click")
    b = e.filter(F.col("event_type") == "view")
    return (
        a.unionByName(b)
        .select("event_id", _ms("ts").alias("ts_ms"), "event_type")
        .orderBy(F.col("ts_ms").desc(), F.col("event_id").desc())
        .limit(50)
    )


SQL_U1 = """
SELECT event_id, epoch_ms(ts) AS ts_ms, event_type FROM (
  SELECT * FROM events WHERE event_type = 'click'
  UNION ALL SELECT * FROM events WHERE event_type = 'view')
ORDER BY ts_ms DESC, event_id DESC LIMIT 50
"""


def q_c12_politeness(spark, sf_dir):
    """C12 (Exchange.java:289-294): least(coalesce(delay*1000, 5000), cap)."""
    s = _t(spark, sf_dir, "supplier")
    crawl_delay = F.when(
        F.col("s_acctbal") >= 0, F.floor(F.col("s_acctbal")).cast("long") % 10
    )
    delay = F.when(F.col("s_suppkey") % 13 == 0, F.lit(0)).otherwise(
        F.least(F.coalesce(crawl_delay * 1000, F.lit(5000)), F.lit(30))
    )
    return s.select(F.col("s_suppkey").alias("suppkey"), delay.alias("delay_ms"))


SQL_C12 = """
SELECT s_suppkey AS suppkey,
       CASE WHEN s_suppkey % 13 = 0 THEN 0
            ELSE LEAST(COALESCE((CASE WHEN s_acctbal >= 0
                   THEN CAST(FLOOR(s_acctbal) AS BIGINT) % 10 END) * 1000, 5000), 30) END AS delay_ms
FROM supplier ORDER BY suppkey
"""


def q_c10_changefreq(spark, sf_dir):
    """C10 (Sitemap.java:149-165): changefreq → revisit days, exact mapping."""
    o = _t(spark, sf_dir, "orders")
    cf = (
        F.when(F.col("o_orderpriority") == "1-URGENT", "always")
        .when(F.col("o_orderpriority") == "2-HIGH", "hourly")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "weekly")
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", "monthly")
        .otherwise("never")
    )
    days = (
        F.when(F.col("changefreq").isin("always", "hourly", "daily"), 1)
        .when(F.col("changefreq") == "weekly", 7)
        .when(F.col("changefreq") == "monthly", 29)
        .when(F.col("changefreq").isin("yearly", "never"), 365)
    )
    return (
        o.select(F.col("o_orderkey").alias("orderkey"), cf.alias("changefreq"))
        .withColumn("revisit_days", days.cast("long"))
        
    )


SQL_C10 = """
WITH m AS (SELECT o_orderkey AS orderkey,
  CASE o_orderpriority WHEN '1-URGENT' THEN 'always' WHEN '2-HIGH' THEN 'hourly'
       WHEN '3-MEDIUM' THEN 'weekly' WHEN '4-NOT SPECIFIED' THEN 'monthly'
       ELSE 'never' END AS changefreq FROM orders)
SELECT orderkey, changefreq,
  CAST(CASE WHEN changefreq IN ('always','hourly','daily') THEN 1
       WHEN changefreq = 'weekly' THEN 7 WHEN changefreq = 'monthly' THEN 29
       WHEN changefreq IN ('yearly','never') THEN 365 END AS BIGINT) AS revisit_days
FROM m ORDER BY orderkey
"""


def q_c11_aimd(spark, sf_dir):
    """C11 (Exchange.java:262-277): AIMD revisit — halve/double + clamp,
    including the reference's inverted branch semantics."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts_ms").asc(), F.col("event_id").asc())
    d = e.select(
        "event_id", "user_id", _ms("ts").alias("ts_ms"),
        (F.col("event_id") % 2 == 0).alias("revisited"),
    ).withColumn("prev_ms", F.lag("ts_ms").over(w))
    dur = F.col("ts_ms") - F.col("prev_ms")
    raw = F.when(F.col("revisited"), F.floor(dur / 2).cast("long")).otherwise(dur * 2)
    clamped = F.least(F.greatest(raw, F.lit(DAY_MS)), F.lit(365 * DAY_MS))
    return (
        d.filter(F.col("prev_ms").isNotNull())
        .select("event_id", "user_id", (F.col("ts_ms") + clamped).alias("next_visit_ms"))
        
    )


SQL_C11 = """
WITH d AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, (event_id % 2 = 0) AS revisited,
         LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC, event_id ASC) AS prev_ms
  FROM events)
SELECT event_id, user_id,
  ts_ms + LEAST(GREATEST(CASE WHEN revisited THEN CAST(FLOOR((ts_ms-prev_ms)/2.0) AS BIGINT)
                              ELSE (ts_ms-prev_ms)*2 END, 86400000), 31536000000) AS next_visit_ms
FROM d WHERE prev_ms IS NOT NULL ORDER BY event_id
"""


def q_w5_rule_scan(spark, sf_dir):
    """W5 (Rule.java:48-67): regex-matching full-table rescan with computed
    next-visit column."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").rlike("^(ECONOMY|PROMO)"))
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_type").alias("ptype"),
            (F.length("p_type").cast("long") * DAY_MS).alias("next_visit_ms"),
        )
        
    )


SQL_W5 = """
SELECT p_partkey AS partkey, p_type AS ptype,
       CAST(LENGTH(p_type) AS BIGINT) * 86400000 AS next_visit_ms
FROM part WHERE regexp_matches(p_type, '^(ECONOMY|PROMO)') ORDER BY partkey
"""


def q_f9_pushdown_scan(spark, sf_dir):
    """F filters + projections (Database.java DAO column lists): predicate
    pushdown + column pruning reach the parquet scan (see README explain)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents"),
        )
        
    )


SQL_F9 = """
SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cents
FROM lineitem WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY 1 ORDER BY 1
"""




def q_cdx_parse(spark, sf_dir):
    """S9 (ExternalArchive.java:28-61): 11-field CDX line parse — the 5
    reference fixture lines (TestServer.java:24-30) verbatim."""
    from chronicrawl_spark.sources.cdx import parse_cdx_lines
    from tests.test_cdx import CDX_LINES  # the verbatim fixture lines

    df = spark.createDataFrame([(l,) for l in CDX_LINES], ["value"])
    return parse_cdx_lines(df).select(
        "urlkey", "date", "url", "content_type", "status", "digest_b32",
        "redirect", "length", "offset", "filename",
    )


def _sql_cdx_parse():
    from tests.test_cdx import CDX_LINES

    values = ",\n  ".join("('" + l.replace("'", "''") + "')" for l in CDX_LINES)
    return f"""
WITH lines(value) AS (VALUES\n  {values}),
p AS (SELECT string_split(value, ' ') AS f FROM lines)
SELECT f[1] AS urlkey,
       epoch_ms(strptime(f[2], '%Y%m%d%H%M%S')) AS date,
       f[3] AS url,
       CASE WHEN f[4] <> '-' THEN f[4] END AS content_type,
       CAST(f[5] AS SMALLINT) AS status,
       CASE WHEN f[6] <> '-' THEN f[6] END AS digest_b32,
       CASE WHEN f[7] <> '-' THEN f[7] END AS redirect,
       CAST(f[9] AS BIGINT) AS length,
       CASE WHEN f[10] <> '-' THEN CAST(f[10] AS BIGINT) END AS "offset",
       f[11] AS filename
FROM p
"""


# replay captures under both schemes (U2): fixed capture log with http and
# https variants plus an unrelated URL that must NOT surface
_U2_CAPTURES = [
    ("http://example.org/page", "19960630120000", 200),
    ("https://example.org/page", "20010101000000", 200),
    ("http://example.org/page", "20050615083000", 404),
    ("https://example.org/page", "20190301000000", 200),
    ("http://other.example/x", "20010101000000", 200),
    ("https://other.example/x", "20020202000000", 200),
]


def q_u2_cdx_scheme_union(spark, sf_dir):
    """U2 (Webapp.java:160-174): a replay lookup of an http URL also
    surfaces its https captures — two exact-match lookups unioned, ordered
    by capture date.  Runs the shipped replay.cdx_scheme_union."""
    from chronicrawl_spark.replay import cdx_scheme_union

    cdx = spark.createDataFrame(_U2_CAPTURES, "url string, arc_date string, status int")
    return cdx_scheme_union(cdx, "http://example.org/page")


def _sql_u2():
    values = ",\n  ".join(f"('{u}', '{d}', {s})" for u, d, s in _U2_CAPTURES)
    return f"""
WITH cdx(url, arc_date, status) AS (VALUES\n  {values})
SELECT url, arc_date, status FROM (
  SELECT * FROM cdx WHERE url = 'http://example.org/page'
  UNION ALL SELECT * FROM cdx WHERE url = 'https://example.org/page')
ORDER BY arc_date, url
"""


# --------------------------------------------------------------------------
# training-data pipeline operators (documents / embeddings)
# --------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    from chronicrawl_spark.extras.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs, key=F.substring("text", 1, 40))


SQL_DEDUP_EXACT = """
SELECT md5(substr(text,1,40)) AS text_hash, COUNT(*) AS n_dups, MIN(doc_id) AS canonical_doc_id
FROM documents GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY text_hash
"""


def q_dedup_word_jaccard(spark, sf_dir):
    from chronicrawl_spark.extras.dedup import word_jaccard_pairs

    return word_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.9)


# candidates from the SAME word-unigram md5 MinHash banding as the Spark
# operator, exact word-set Jaccard on candidates
_WJ_MH_AGGS = ", ".join(f"min(md5('w{i}|' || word)) AS mh{i}" for i in range(6))
SQL_DEDUP_WORD_JACCARD = f"""
WITH w AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS word FROM documents),
wd AS (SELECT DISTINCT doc_id, word FROM w WHERE word <> ''),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM wd GROUP BY 1),
sig AS (SELECT doc_id, {_WJ_MH_AGGS} FROM wd GROUP BY 1),
b AS (SELECT 0 AS band, md5(mh0 || '|' || mh1) AS bucket, doc_id FROM sig
      UNION ALL SELECT 1, md5(mh2 || '|' || mh3), doc_id FROM sig
      UNION ALL SELECT 2, md5(mh4 || '|' || mh5), doc_id FROM sig),
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM b x JOIN b y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
c AS (SELECT doc_a, doc_b, COUNT(*) AS common
      FROM cand JOIN wd a ON a.doc_id = cand.doc_a
                JOIN wd b2 ON b2.doc_id = cand.doc_b AND b2.word = a.word
      GROUP BY 1, 2)
SELECT doc_a, doc_b, common,
       CAST(ROUND(common*1000000.0/(sa.sz+sb.sz-common)) AS BIGINT) AS jaccard_e6
FROM c JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE CAST(ROUND(common*1000000.0/(sa.sz+sb.sz-common)) AS BIGINT) >= 900000
ORDER BY doc_a, doc_b
"""

# guarded variant: LSH df-cap — (band, bucket) groups larger than the cap
# are dropped before the self-join, bounding the quadratic worst case on
# corpora where the bands are non-discriminative (dedup.word_jaccard_pairs
# max_bucket_size).  Unguarded semantics above are unchanged.
WJ_BUCKET_CAP = 100


def q_dedup_word_jaccard_guarded(spark, sf_dir):
    from chronicrawl_spark.extras.dedup import word_jaccard_pairs

    return word_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.9, max_bucket_size=WJ_BUCKET_CAP
    )


SQL_DEDUP_WORD_JACCARD_GUARDED = f"""
WITH w AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS word FROM documents),
wd AS (SELECT DISTINCT doc_id, word FROM w WHERE word <> ''),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM wd GROUP BY 1),
sig AS (SELECT doc_id, {_WJ_MH_AGGS} FROM wd GROUP BY 1),
b AS (SELECT 0 AS band, md5(mh0 || '|' || mh1) AS bucket, doc_id FROM sig
      UNION ALL SELECT 1, md5(mh2 || '|' || mh3), doc_id FROM sig
      UNION ALL SELECT 2, md5(mh4 || '|' || mh5), doc_id FROM sig),
bf AS (SELECT * FROM (SELECT b.*, COUNT(*) OVER (PARTITION BY band, bucket) AS bsz FROM b)
       WHERE bsz <= {WJ_BUCKET_CAP}),
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM bf x JOIN bf y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
c AS (SELECT doc_a, doc_b, COUNT(*) AS common
      FROM cand JOIN wd a ON a.doc_id = cand.doc_a
                JOIN wd b2 ON b2.doc_id = cand.doc_b AND b2.word = a.word
      GROUP BY 1, 2)
SELECT doc_a, doc_b, common,
       CAST(ROUND(common*1000000.0/(sa.sz+sb.sz-common)) AS BIGINT) AS jaccard_e6
FROM c JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE CAST(ROUND(common*1000000.0/(sa.sz+sb.sz-common)) AS BIGINT) >= 900000
ORDER BY doc_a, doc_b
"""


def q_dedup_ngram_jaccard(spark, sf_dir):
    from chronicrawl_spark.extras.dedup import ngram_jaccard_pairs

    # LSH prefilter → exact verify (extras/dedup.py): candidates come from a
    # 4×2 md5-minhash band join, exact Jaccard only on candidates.  The
    # oracle below mirrors the identical md5 banding, so both engines verify
    # the same deterministic candidate set.
    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), n=3, threshold=0.8)


_NGRAM_MH_AGGS = ", ".join(f"min(md5('g{i}|' || gram)) AS mh{i}" for i in range(8))
_NGRAM_BANDS = "\n      UNION ALL ".join(
    f"SELECT {i} AS band, md5(mh{2 * i} || '|' || mh{2 * i + 1}) AS bucket, doc_id FROM sig"
    for i in range(4)
)
SQL_DEDUP_NGRAM_JACCARD = f"""
WITH g AS (SELECT DISTINCT doc_id, substr(text, i.i, 3) AS gram
           FROM documents d, LATERAL (SELECT unnest(range(1, GREATEST(LENGTH(d.text)-2,0)+1)) AS i) i
           WHERE LENGTH(substr(text, i.i, 3)) = 3),
g8 AS (SELECT DISTINCT doc_id, substr(text, i.i, 8) AS gram
       FROM documents d, LATERAL (SELECT unnest(range(1, GREATEST(LENGTH(d.text)-7,0)+1, 2)) AS i) i
       WHERE LENGTH(substr(text, i.i, 8)) = 8
       UNION ALL
       SELECT doc_id, text AS gram FROM documents
       WHERE LENGTH(text) > 0 AND LENGTH(text) < 8),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
sig AS (SELECT doc_id, {_NGRAM_MH_AGGS} FROM g8 GROUP BY 1),
b AS ({_NGRAM_BANDS}),
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM b x JOIN b y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
c AS (SELECT doc_a, doc_b, COUNT(*) AS common
      FROM cand JOIN g ga ON ga.doc_id = cand.doc_a
                JOIN g gb ON gb.doc_id = cand.doc_b AND gb.gram = ga.gram
      GROUP BY 1, 2)
SELECT doc_a, doc_b, CAST(ROUND(common*1000000.0/(sa.sz+sb.sz-common)) AS BIGINT) AS jaccard_e6
FROM c JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE CAST(ROUND(common*1000000.0/(sa.sz+sb.sz-common)) AS BIGINT) >= 800000
ORDER BY doc_a, doc_b
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    from chronicrawl_spark.extras.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(_t(spark, sf_dir, "documents"))


_MH_AGGS = ", ".join(f"min(md5('s{i}|' || sh)) AS mh{i}" for i in range(6))
SQL_DEDUP_MINHASH_LSH = f"""
WITH w AS (SELECT doc_id, string_split(lower(text),' ') AS l FROM documents),
sh AS (SELECT doc_id, unnest(list_transform(range(1, GREATEST(len(l)-2,0)+1),
              i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS sh FROM w),
shd AS (SELECT DISTINCT doc_id, sh FROM sh),
sig AS (SELECT doc_id, {_MH_AGGS} FROM shd GROUP BY 1),
b AS (SELECT 0 AS band, md5(mh0 || '|' || mh1) AS bucket, doc_id FROM sig
      UNION ALL SELECT 1, md5(mh2 || '|' || mh3), doc_id FROM sig
      UNION ALL SELECT 2, md5(mh4 || '|' || mh5), doc_id FROM sig)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(a.band AS INT) AS band
FROM b a JOIN b b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b, band
"""


def q_dedup_clusters(spark, sf_dir):
    """Pairs → transitive-closure dedup clusters + keep-one-representative.

    Distributed connected components (alternating large-star/small-star,
    Kiveris et al. SoCC'14 — O(log n) rounds of two hash shuffles each)
    over the MinHash-LSH candidate pairs; every document gets
    (cluster_id = component min doc_id, is_rep).  The DuckDB oracle
    computes the same closure with a recursive CTE — algorithm-independent
    ground truth."""
    from chronicrawl_spark.extras.dedup import minhash_lsh_candidates
    from chronicrawl_spark.extras.graph import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs).select("doc_a", "doc_b")
    return dedup_clusters(docs, pairs)


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE w AS (SELECT doc_id, string_split(lower(text),' ') AS l FROM documents),
sh AS (SELECT doc_id, unnest(list_transform(range(1, GREATEST(len(l)-2,0)+1),
              i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS sh FROM w),
shd AS (SELECT DISTINCT doc_id, sh FROM sh),
sig AS (SELECT doc_id, {_MH_AGGS} FROM shd GROUP BY 1),
b AS (SELECT 0 AS band, md5(mh0 || '|' || mh1) AS bucket, doc_id FROM sig
      UNION ALL SELECT 1, md5(mh2 || '|' || mh3), doc_id FROM sig
      UNION ALL SELECT 2, md5(mh4 || '|' || mh5), doc_id FROM sig),
p AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
      FROM b a JOIN b b2 ON a.band = b2.band AND a.bucket = b2.bucket
                        AND a.doc_id < b2.doc_id),
und AS (SELECT doc_a AS u, doc_b AS v FROM p
        UNION SELECT doc_b, doc_a FROM p),
reach(node, r) AS (
    SELECT u, u FROM und
    UNION
    SELECT und.v, reach.r FROM reach JOIN und ON und.u = reach.node),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT d.doc_id,
       CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS cluster_id,
       CAST(CASE WHEN COALESCE(c.component, d.doc_id) = d.doc_id
            THEN 1 ELSE 0 END AS INT) AS is_rep
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
ORDER BY d.doc_id
"""


def q_dedup_clusters_incremental(spark, sf_dir):
    """Two-phase incremental clustering: close over half the candidate
    pairs, then fold the other half in via ``incremental_components``
    (the per-wave crawl shape — only touched clusters pay).  The
    incremental invariant makes the BATCH closure its exact oracle:
    incremental(batch(P1), P2) == batch(P1 ∪ P2), so the DuckDB side is
    the same recursive CTE as dedup_clusters."""
    from chronicrawl_spark.extras.dedup import minhash_lsh_candidates
    from chronicrawl_spark.extras.graph import (
        connected_components,
        incremental_components,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs).select("doc_a", "doc_b")
    parity = (F.col("doc_a") + F.col("doc_b")) % 2
    base = connected_components(pairs.filter(parity == 0))
    cc = incremental_components(base, pairs.filter(parity != 0))
    return docs.select("doc_id").join(
        cc.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        F.col("doc_id"),
        F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        (F.coalesce("component", F.col("doc_id")) == F.col("doc_id"))
        .cast("int")
        .alias("is_rep"),
    )


def q_dedup_simhash(spark, sf_dir):
    from chronicrawl_spark.extras.dedup import simhash

    return simhash(_t(spark, sf_dir, "documents"))


_SIMHASH_VOTES = ", ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}" for b in range(32)
)
_SIMHASH_BITS = " + ".join(f"(CASE WHEN v{b} > 0 THEN 1 ELSE 0 END) * {1 << b}" for b in range(32))
SQL_DEDUP_SIMHASH = f"""
WITH w AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS word FROM documents),
wd AS (SELECT DISTINCT doc_id, word FROM w WHERE word <> ''),
h AS (SELECT doc_id, CAST(CONCAT('0x', substr(md5(word),1,8)) AS BIGINT) AS h FROM wd),
v AS (SELECT doc_id, {_SIMHASH_VOTES} FROM h GROUP BY 1)
SELECT doc_id, CAST({_SIMHASH_BITS} AS BIGINT) AS simhash FROM v ORDER BY doc_id
"""


# sign-LSH hyperplanes: md5-derived integer literals precomputed in Python
# (similarity.hyperplane) and embedded on BOTH engines — a closed-form
# "(i*31 + b*17) % 7" has period 7 in b, so only 7 distinct planes existed
# (see extras/similarity.py docstring).
def _sql_hp_dot(b: int) -> str:
    from chronicrawl_spark.extras.similarity import hyperplane

    lits = ", ".join(str(v) for v in hyperplane(b))
    return f"list_sum(list_transform(range(1, len(v)+1), i -> v[i] * list_extract([{lits}], i)))"


def _sql_sign_bits(first: int, n: int) -> str:
    return " + ".join(
        f"(CASE WHEN {_sql_hp_dot(first + j)} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(n)
    )


def q_embed_dup_pairs(spark, sf_dir):
    """Banded sign-LSH near-dup pairs.  The synthetic corpus has no natural
    cos≥0.95 pair (max measured 0.51 at sf0.01), which left this entry a
    vacuous 0-row green in r1/r2 — so the query PLANTS 5 deterministic
    near-duplicates (copies of the 5 smallest vec_ids with the first
    component ×1.5 → cos 0.997-0.99997) identically on both engines; the
    oracle now verifies real output rows end-to-end through banding and the
    cosine verify."""
    from chronicrawl_spark.extras.dedup import embedding_dup_pairs

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = (
        e.orderBy("vec_id")
        .limit(5)
        .select(
            (F.col("vec_id") + F.lit(1_000_000_000)).alias("vec_id"),
            F.transform(
                F.col("embedding"), lambda x, i: F.when(i == F.lit(0), x * 1.5).otherwise(x)
            ).alias("embedding"),
        )
    )
    return embedding_dup_pairs(e.unionByName(planted), threshold=0.95)


# the SAME banded sign-LSH blocking + planted rows as the Spark operator
# (extras/dedup.embedding_dup_pairs → similarity.banded_lsh_buckets)
_EMBED_BANDS_SQL = "\n  UNION ALL ".join(
    f"SELECT vec_id, {t} AS band, CAST({_sql_sign_bits(t * 8, 8)} AS BIGINT) AS bucket FROM e"
    for t in range(3)
)
SQL_EMBED_DUPS = f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p5 AS (SELECT vec_id, v FROM base ORDER BY vec_id LIMIT 5),
planted AS (SELECT vec_id + 1000000000 AS vec_id,
                   list_transform(range(1, len(v)+1), i -> CASE WHEN i = 1 THEN v[i]*1.5 ELSE v[i] END) AS v
            FROM p5),
e AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
bb AS ({_EMBED_BANDS_SQL}),
cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         FROM bb x JOIN bb y ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
SELECT vec_a, vec_b,
  CAST(ROUND(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]))
    / (sqrt(list_sum(list_transform(a.v, x -> x*x))) * sqrt(list_sum(list_transform(b.v, x -> x*x))))
    * 1000000) AS BIGINT) AS cos_e6
FROM cand JOIN e a ON a.vec_id = cand.vec_a JOIN e b ON b.vec_id = cand.vec_b
WHERE CAST(ROUND(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]))
    / (sqrt(list_sum(list_transform(a.v, x -> x*x))) * sqrt(list_sum(list_transform(b.v, x -> x*x))))
    * 1000000) AS BIGINT) >= 950000
ORDER BY vec_a, vec_b
"""


def q_phash_hamming_dups(spark, sf_dir):
    """Image near-dup pairs by Hamming distance over 64-bit perceptual
    hashes: multi-index banding → popcount verify
    (extras/dedup.phash_dup_pairs — exact recall at dist < bands by
    pigeonhole).  The driver testdata has no images table, so the query
    derives a deterministic surrogate phash per document identically on
    both engines: docs in the same group (doc_id % 100) share an
    md5-derived 60-bit base code and every doc past the first generation
    flips one bit (1 << doc_id % 60) — planting distance-0/1/2 near-dup
    pairs end-to-end through the banded join and the XOR+popcount verify.
    The real-pixel phash64 (block-mean 8×8 hash over decoded image bytes)
    feeds the same operator in tests/test_imaging.py."""
    from chronicrawl_spark.extras.dedup import phash_dup_pairs

    docs = _t(spark, sf_dir, "documents")
    base = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ph|"), (F.col("doc_id") % 100).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    flip = F.when(
        F.col("doc_id") >= 100,
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 60 AS INT))"),
    ).otherwise(F.lit(0).cast("long"))
    ph = docs.select(
        F.col("doc_id").alias("image_id"), base.bitwiseXOR(flip).alias("phash")
    )
    return phash_dup_pairs(ph, max_dist=3)


SQL_PHASH_HAMMING_DUPS = """
WITH ph AS (
  SELECT doc_id AS img_id,
         xor(CAST(CONCAT('0x', substr(md5(CONCAT('ph|', CAST(doc_id % 100 AS VARCHAR))), 1, 15)) AS BIGINT),
             CASE WHEN doc_id >= 100
                  THEN (CAST(1 AS BIGINT) << CAST(doc_id % 60 AS INT))
                  ELSE CAST(0 AS BIGINT) END) AS ph
  FROM documents),
bb AS (
  SELECT img_id, ph, 0 AS band, (ph >> 0)  & 65535 AS bucket FROM ph
  UNION ALL SELECT img_id, ph, 1, (ph >> 16) & 65535 FROM ph
  UNION ALL SELECT img_id, ph, 2, (ph >> 32) & 65535 FROM ph
  UNION ALL SELECT img_id, ph, 3, (ph >> 48) & 65535 FROM ph)
SELECT DISTINCT x.img_id AS img_a, y.img_id AS img_b,
       CAST(bit_count(xor(x.ph, y.ph)) AS BIGINT) AS hamming
FROM bb x JOIN bb y ON x.band = y.band AND x.bucket = y.bucket AND x.img_id < y.img_id
WHERE bit_count(xor(x.ph, y.ph)) <= 3
ORDER BY img_a, img_b
"""


def q_phash_clusters(spark, sf_dir):
    """Image near-dup CLUSTERS: connected components over the banded
    phash Hamming pairs (q_phash_hamming_dups) + keep-one-representative —
    the image-axis twin of dedup_clusters.  The planted surrogate codes
    make each doc_id%100 group one fully-connected near-dup cluster, so
    the expected output is 100 five-member clusters at sf0.01."""
    from chronicrawl_spark.extras.graph import dedup_clusters

    pairs = q_phash_hamming_dups(spark, sf_dir).select(
        F.col("img_a").alias("doc_a"), F.col("img_b").alias("doc_b")
    )
    imgs = _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("image_id"))
    return dedup_clusters(imgs, pairs, key="image_id")


SQL_PHASH_CLUSTERS = """
WITH RECURSIVE ph AS (
  SELECT doc_id AS img_id,
         xor(CAST(CONCAT('0x', substr(md5(CONCAT('ph|', CAST(doc_id % 100 AS VARCHAR))), 1, 15)) AS BIGINT),
             CASE WHEN doc_id >= 100
                  THEN (CAST(1 AS BIGINT) << CAST(doc_id % 60 AS INT))
                  ELSE CAST(0 AS BIGINT) END) AS ph
  FROM documents),
bb AS (
  SELECT img_id, ph, 0 AS band, (ph >> 0)  & 65535 AS bucket FROM ph
  UNION ALL SELECT img_id, ph, 1, (ph >> 16) & 65535 FROM ph
  UNION ALL SELECT img_id, ph, 2, (ph >> 32) & 65535 FROM ph
  UNION ALL SELECT img_id, ph, 3, (ph >> 48) & 65535 FROM ph),
p AS (SELECT DISTINCT x.img_id AS a, y.img_id AS b
      FROM bb x JOIN bb y ON x.band = y.band AND x.bucket = y.bucket
                         AND x.img_id < y.img_id
      WHERE bit_count(xor(x.ph, y.ph)) <= 3),
und AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p),
reach(node, r) AS (
    SELECT u, u FROM und
    UNION
    SELECT und.v, reach.r FROM reach JOIN und ON und.u = reach.node),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT d.doc_id AS image_id,
       CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS cluster_id,
       CAST(CASE WHEN COALESCE(c.component, d.doc_id) = d.doc_id
            THEN 1 ELSE 0 END AS INT) AS is_rep
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
ORDER BY image_id
"""


def q_embed_cosine_topk(spark, sf_dir):
    from chronicrawl_spark.extras.similarity import cosine_topk

    e = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return cosine_topk(e, k=20)


SQL_EMBED_COSINE_TOPK = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1)
SELECT vec_id,
  CAST(ROUND(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*qv[i]))
    / (sqrt(list_sum(list_transform(v, x -> x*x))) * sqrt(list_sum(list_transform(qv, x -> x*x))))
    * 1000000) AS BIGINT) AS cos_e6
FROM e, q ORDER BY cos_e6 DESC, vec_id ASC LIMIT 20
"""


def q_ann_lsh_topk(spark, sf_dir):
    from chronicrawl_spark.extras.similarity import ann_topk

    e = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return ann_topk(e, k=10)


SQL_ANN_LSH_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bb AS ({_EMBED_BANDS_SQL}),
q AS (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1),
qid AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT 1),
qb AS (SELECT bb.band AS qband, bb.bucket AS qbucket FROM bb JOIN qid ON bb.vec_id = qid.vec_id),
cand AS (SELECT DISTINCT bb.vec_id FROM bb JOIN qb ON bb.band = qb.qband AND bb.bucket = qb.qbucket)
SELECT e.vec_id,
  CAST(ROUND(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*qv[i]))
    / (sqrt(list_sum(list_transform(v, x -> x*x))) * sqrt(list_sum(list_transform(qv, x -> x*x))))
    * 1000000) AS BIGINT) AS cos_e6
FROM e JOIN cand ON e.vec_id = cand.vec_id, q
ORDER BY cos_e6 DESC, e.vec_id ASC LIMIT 10
"""


def q_ann_multi_topk(spark, sf_dir):
    """Multi-query ANN (bucket ⨝ bucket, per-query exact rerank) — the
    query-set join shape a training pipeline runs; no cross join."""
    from chronicrawl_spark.extras.similarity import ann_topk_multi

    e = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return ann_topk_multi(e, n_queries=10, k=5)


SQL_ANN_MULTI_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bb AS ({_EMBED_BANDS_SQL}),
q AS (SELECT vec_id AS qid, v AS qv FROM e ORDER BY vec_id LIMIT 10),
qb AS (SELECT q.qid, bb.band AS qband, bb.bucket AS qbucket FROM q JOIN bb ON bb.vec_id = q.qid),
cand0 AS (SELECT DISTINCT qb.qid, bb.vec_id
          FROM bb JOIN qb ON bb.band = qb.qband AND bb.bucket = qb.qbucket),
cand AS (SELECT cand0.qid, q.qv, cand0.vec_id FROM cand0 JOIN q ON q.qid = cand0.qid),
scored AS (SELECT qid, e.vec_id,
  CAST(ROUND(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*qv[i]))
    / (sqrt(list_sum(list_transform(v, x -> x*x))) * sqrt(list_sum(list_transform(qv, x -> x*x))))
    * 1000000) AS BIGINT) AS cos_e6
  FROM cand JOIN e ON e.vec_id = cand.vec_id)
SELECT qid, vec_id, cos_e6, rn
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_e6 DESC, vec_id ASC) AS rn
      FROM scored) t
WHERE rn <= 5 ORDER BY qid, rn
"""


def q_ivf_topk(spark, sf_dir):
    """IVF-Flat ANN (extras/similarity.ivf_topk): deterministic
    sample-as-centroid coarse quantizer, shuffle-free broadcast-fold
    assignment, probe the 8 nearest of 16 cells, exact rerank inside —
    the second scale path next to sign-LSH, per the IVF family the
    training-pipeline brief names."""
    from chronicrawl_spark.extras.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return ivf_topk(e, k=10, n_clusters=16, n_probe=8)


_COS_E6 = (
    "CAST(ROUND(list_sum(list_transform(range(1, len({a})+1), i -> {a}[i]*{b}[i]))"
    " / (sqrt(list_sum(list_transform({a}, x -> x*x))) * sqrt(list_sum(list_transform({b}, x -> x*x))))"
    " * 1000000) AS BIGINT)"
)
SQL_IVF_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 16),
s AS (SELECT e.vec_id, c.cid, {_COS_E6.format(a='v', b='cv')} AS sc FROM e CROSS JOIN c),
assign AS (SELECT vec_id, cid FROM (
    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sc DESC, cid ASC) AS rn FROM s) t
  WHERE rn = 1),
q AS (SELECT vec_id AS qid, v AS qv FROM e ORDER BY vec_id LIMIT 1),
probe AS (SELECT cid FROM (
    SELECT c.cid, {_COS_E6.format(a='cv', b='qv')} AS sc FROM c, q) t
  ORDER BY sc DESC, cid ASC LIMIT 8),
cand AS (SELECT vec_id FROM assign JOIN probe USING (cid))
SELECT e.vec_id, {_COS_E6.format(a='v', b='qv')} AS cos_e6
FROM e JOIN cand USING (vec_id), q
ORDER BY cos_e6 DESC, e.vec_id ASC LIMIT 10
"""


def q_text_langid(spark, sf_dir):
    from chronicrawl_spark.extras.textstats import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


def _sql_langid():
    from chronicrawl_spark.extras.textstats import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    hits = ", ".join(
        "len(list_intersect(list_distinct(string_split(lower(text),' ')), ["
        + ", ".join(f"'{m}'" for m in LANG_MARKERS[lg])
        + f"])) AS hits_{lg}"
        for lg in langs
    )
    best = "GREATEST(" + ", ".join(f"hits_{lg}" for lg in langs) + ")"
    pred = "CASE " + " ".join(f"WHEN hits_{lg} = {best} THEN '{lg}'" for lg in langs) + " END"
    return f"""
WITH s AS (SELECT doc_id, lang, {hits} FROM documents)
SELECT doc_id, lang AS actual_lang, {pred} AS pred_lang, CAST({best} AS INT) AS marker_hits
FROM s ORDER BY doc_id
"""


def q_text_quality(spark, sf_dir):
    from chronicrawl_spark.extras.textstats import quality_score

    return quality_score(_t(spark, sf_dir, "documents"))


SQL_TEXT_QUALITY = """
WITH s AS (SELECT doc_id, LENGTH(text) AS tl,
       GREATEST(len(string_split(lower(text),' ')), 1) AS n_words,
       len(list_intersect(list_distinct(string_split(lower(text),' ')),
           ['the','a','of','and','to','value','key','fast','slow','table'])) AS stop_hits,
       LENGTH(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS non_alnum
     FROM documents),
m AS (SELECT doc_id, n_words, stop_hits, non_alnum, tl,
       (tl - (n_words - 1)) * 1.0 / n_words AS mean_wlen
     FROM s)
SELECT doc_id, CAST(n_words AS INT) AS n_words,
  CAST(ROUND(mean_wlen * 100) AS BIGINT) AS mean_word_len_e2,
  CAST(stop_hits AS INT) AS stopword_hits,
  CAST(ROUND((LEAST(tl/400.0, 1.0)*40
    + (CASE WHEN mean_wlen >= 3 AND mean_wlen <= 10 THEN 30 ELSE 0 END)
    + LEAST(stop_hits*5.0, 20.0)
    + (CASE WHEN non_alnum*1.0/GREATEST(tl,1) < 0.1 THEN 10 ELSE 0 END)) * 100) AS BIGINT) AS quality_e2
FROM m ORDER BY doc_id
"""


def q_text_tokens_fingerprint(spark, sf_dir):
    """L11 token counting + rolling-hash document fingerprinting in one
    certified entry (both are doc_id-keyed row functions over the same
    table; merged to keep the registry inside the driver's 50-entry cap).
    """
    from chronicrawl_spark.extras.textstats import fingerprint, token_count

    docs = _spread(_t(spark, sf_dir, "documents"))
    return token_count(docs).join(fingerprint(docs), "doc_id")


SQL_TOKENS_FINGERPRINT = """
WITH t AS (SELECT doc_id,
  CAST(len(regexp_split_to_array(trim(text), ' +')) AS INT) AS ws_tokens,
  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS bpe_ish_tokens
FROM documents),
w AS (SELECT doc_id, string_split(lower(text),' ') AS l FROM documents),
sh AS (SELECT doc_id, list_transform(range(1, GREATEST(len(l)-2,0)+1),
              i -> md5(l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS hs FROM w),
f AS (SELECT doc_id, list_min(hs) AS fp_min, list_max(hs) AS fp_max FROM sh)
SELECT t.doc_id, t.ws_tokens, t.bpe_ish_tokens, f.fp_min, f.fp_max
FROM t JOIN f USING (doc_id) ORDER BY doc_id
"""


def _crossmodal_fixture_rows():
    """Driver-side (image_id, phash, caption) triples of the crossmodal
    fixture, derived from the SAME full rows the Spark query loads
    (:func:`_crossmodal_table_rows`), so oracle and query agree by
    construction."""
    return [(r[0], r[6], r[5]) for r in _crossmodal_table_rows()]


def _crossmodal_table_rows():
    """The crossmodal fixture table, built driver-side in one pass: the
    deterministic make_images(12) rows plus the planted duplicate /
    conflict / boilerplate / near-dup rows (closed-form — no RNG).  One
    ``createDataFrame`` over these rows replaces the earlier
    filter+union-of-5-branches construction, whose unioned
    default-parallelism partitions exploded into 160/640-task stages —
    ~5 s of pure task-scheduling floor on a 15-row table."""
    from chronicrawl_spark.fixtures import DEFAULT_FMT_CYCLE, _image_row

    base = [_image_row(i, 32, 24, DEFAULT_FMT_CYCLE[i % 4]) for i in range(12)]
    by_id = {r[0]: r for r in base}
    rows = [
        (r[0], r[1], r[2], r[3], r[4], "  Stock   Photo ", r[6])
        if r[0] in ("img0002", "img0003") else r
        for r in base
    ]
    b = by_id["img0000"]
    rows.append(("img0000_dup", b[1], b[2], b[3], b[4], b[5], b[6]))
    b = by_id["img0001"]
    rows.append(("img0001_alt", b[1], b[2], b[3], b[4],
                 "a completely different caption", b[6]))
    b = by_id["img0004"]
    rows.append(("img0004_near", b[1], b[2], b[3], b[4], b[5], b[6] ^ 1))
    return rows


def q_crossmodal_dups(spark, sf_dir):
    """Cross-modal dedup classification over the image+caption pair table
    (extras/dedup.crossmodal_dup_pairs): exact multi-index-Hamming image
    near-dups joined with normalized-caption dup groups, labelled
    dup / caption_conflict / caption_boilerplate.  Fixture plants one of
    each class plus a hamming-1 near-dup over the deterministic
    make_images table; the oracle reruns the classification as all-pairs
    SQL over the same (image_id, phash, caption) triples — algorithm-
    independent truth for the banded candidate generator.  The fixture
    loads as ONE createDataFrame (see :func:`_crossmodal_table_rows` for
    why not filter+union; measured 1.8 s vs 7.2 s warm for the union
    shape — and NOT ``coalesce(1)``, which empirically costs ~8 s extra
    on a fresh single-task Python serialization)."""
    from chronicrawl_spark.extras.dedup import crossmodal_dup_pairs
    from chronicrawl_spark.fixtures import IMAGES_SCHEMA

    table = spark.createDataFrame(_crossmodal_table_rows(), IMAGES_SCHEMA)
    return crossmodal_dup_pairs(table)


def _sql_crossmodal_dups() -> str:
    vals = ",\n  ".join(
        f"('{i}', CAST({ph} AS BIGINT), '{cap}')"
        for i, ph, cap in _crossmodal_fixture_rows()
    )
    return f"""
WITH pairs(image_id, phash, caption) AS (VALUES
  {vals}),
norm AS (SELECT image_id, phash,
           regexp_replace(trim(lower(caption)), '\\s+', ' ', 'g') AS ckey
         FROM pairs),
img AS (SELECT x.image_id AS img_a, y.image_id AS img_b,
          CAST(bit_count(xor(x.phash, y.phash)) AS BIGINT) AS hamming
        FROM norm x JOIN norm y ON x.image_id < y.image_id
        WHERE bit_count(xor(x.phash, y.phash)) <= 3),
ok AS (SELECT ckey FROM norm GROUP BY ckey HAVING count(*) <= 64),
cap AS (SELECT x.image_id AS img_a, y.image_id AS img_b, TRUE AS cap_dup
        FROM (SELECT n.* FROM norm n JOIN ok USING (ckey)) x
        JOIN (SELECT n.* FROM norm n JOIN ok USING (ckey)) y
          ON x.ckey = y.ckey AND x.image_id < y.image_id)
SELECT COALESCE(i.img_a, c.img_a) AS img_a,
       COALESCE(i.img_b, c.img_b) AS img_b,
       i.hamming,
       CASE WHEN i.img_a IS NOT NULL AND c.img_a IS NOT NULL THEN 'dup'
            WHEN i.img_a IS NOT NULL THEN 'caption_conflict'
            ELSE 'caption_boilerplate' END AS label
FROM img i FULL OUTER JOIN cap c ON i.img_a = c.img_a AND i.img_b = c.img_b
ORDER BY img_a, img_b
"""


# --------------------------------------------------------------------------
# crawl-pipeline rows-only entries (non-SQL-expressible: full engine, UDFs)
# --------------------------------------------------------------------------

def q_crawl_fixture_trace(spark, sf_dir):
    """Runs the full wave engine (k=1 sequential-parity mode) on the
    reference fixture site; returns the visit trace.  Oracle: the
    hand-derived reference trace is asserted in tests/test_crawl_parity.py;
    the driver records a rows-only check here."""
    from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
    from chronicrawl_spark.fixtures import test_server_site
    from chronicrawl_spark.tables import StateStore

    tmp = tempfile.mkdtemp(prefix="chronicrawl_trace_")
    store = StateStore(spark, os.path.join(tmp, "state"), buckets=4)
    engine = CrawlEngine(spark, store, test_server_site(spark), CrawlConfig())
    engine.add_seeds(["http://test.example"], now=1_600_000_000_000)
    engine.run(max_waves=9, k_origins=1, per_host_k=1)
    visits = store.read("visits")
    frontier = store.read("frontier").select("origin_id", "path_id", "path")
    return (
        visits.join(frontier, ["origin_id", "path_id"])
        .select("date", "path", F.col("status").cast("int").alias("status"), "content_type")
        
    )


def q_image_decode_verify(spark, sf_dir):
    """The north-rule image stage as ONE fused Arrow map (L12+L13,
    oracle-verified): input_hint-shaped fixture table — all four
    from-scratch codecs, landscape AND portrait rows — through
    extras/imaging.decode_verify_thumbnails (decode → phash-of-DECODED-
    pixels == stored phash, the input_hint per-row invariant → bilinear
    thumbnail → lossless PNG re-encode).  The thumbnail payload is
    certified byte-exactly via md5, so the oracle pins the full decoded-
    pixel path, not just metadata.  ``with_quality=True`` fuses the
    training-data filter metrics (brightness/contrast/entropy/sharpness/
    saturation, imaging.quality_stats) into the same Arrow stage — one
    decode feeds invariant + thumbnail + quality, all five doubles
    hash-verified bitwise against the driver-side recomputation.
    Poison-row isolation and the SURVEY §1.3 PSNR ≥ 40 dB lossy invariant
    are asserted in tests/test_imaging.py; ref analog: every rendered
    visit yields a derived thumbnail (Exchange.java:198-201)."""
    from chronicrawl_spark.extras.imaging import QUALITY_COLS, decode_verify_thumbnails
    from chronicrawl_spark.fixtures import make_images

    land = make_images(spark, n=16, w=32, h=24)
    port = make_images(spark, n=8, w=20, h=40).selectExpr(
        "concat('p_', image_id) AS image_id", "bytes", "w", "h", "fmt",
        "caption", "phash",
    )
    out = decode_verify_thumbnails(
        land.unionByName(port), max_dim=16, with_quality=True
    )
    return out.select(
        "image_id",
        "ok",
        "thumb_w",
        "thumb_h",
        F.md5("thumbnail").alias("thumb_md5"),
        "caption",
        "error",
        *QUALITY_COLS,
    )


def _sql_image_decode_verify() -> str:
    """Computable oracle for ``image_decode_verify``: the image fixtures
    are closed-form (seeded pixel ramps, no RNG), so the expected rows —
    including the md5 of the exact thumbnail PNG bytes AND the five
    quality doubles (emitted via ``_dlit``: repr string → DuckDB
    string→double parse, bit-exact) — are precomputed here
    with the same from-scratch codecs and registered as a DuckDB constant
    table (the audio/video oracle pattern)."""
    import hashlib

    from chronicrawl_spark.extras.imaging import (
        decode_image,
        encode_png,
        phash64,
        quality_stats,
        resize_bilinear,
        thumbnail_dims,
    )
    from chronicrawl_spark.fixtures import DEFAULT_FMT_CYCLE, _image_row

    rows = []
    for prefix, n, w, h in (("", 16, 32, 24), ("p_", 8, 20, 40)):
        for i in range(n):
            img_id, data, _w, _h, fmt, cap, ph = _image_row(
                i, w, h, DEFAULT_FMT_CYCLE[i % len(DEFAULT_FMT_CYCLE)]
            )
            px = decode_image(bytes(data), fmt)
            assert phash64(px) == ph
            tw, th = thumbnail_dims(px.shape[1], px.shape[0], 16)
            md5 = hashlib.md5(encode_png(resize_bilinear(px, tw, th))).hexdigest()
            q = ", ".join(_dlit(v) for v in quality_stats(px))
            rows.append(f"('{prefix}{img_id}', {tw}, {th}, '{md5}', '{cap}', {q})")
    values = ",\n       ".join(rows)
    return f"""
SELECT image_id,
       CAST(TRUE AS BOOLEAN) AS ok,
       CAST(thumb_w AS INTEGER) AS thumb_w,
       CAST(thumb_h AS INTEGER) AS thumb_h,
       thumb_md5,
       caption,
       CAST(NULL AS VARCHAR) AS error,
       CAST(brightness AS DOUBLE) AS brightness,
       CAST(contrast AS DOUBLE) AS contrast,
       CAST(entropy AS DOUBLE) AS entropy,
       CAST(sharpness AS DOUBLE) AS sharpness,
       CAST(saturation AS DOUBLE) AS saturation
FROM (VALUES {values}) AS t(image_id, thumb_w, thumb_h, thumb_md5, caption,
                            brightness, contrast, entropy, sharpness, saturation)
"""


def q_schedule_next_fire(spark, sf_dir):
    """C13 calendar schedules: the 13 built-ins applied to a fixed instant
    (bitmask stepping UDF; vectors from ScheduleTest.java)."""
    import pandas as pd
    from pyspark.sql import types as T

    from chronicrawl_spark.functions.schedule import BUILTIN_SCHEDULES, batch_apply

    sched = {s.id: s for s in BUILTIN_SCHEDULES}
    t0 = 1_596_717_261_000  # 2020-08-06T12:34:21Z
    rows = [(s.id, s.name) for s in BUILTIN_SCHEDULES]
    df = spark.createDataFrame(rows, "id long, name string")

    @F.pandas_udf(T.LongType())
    def nxt(ids: pd.Series) -> pd.Series:
        return pd.Series(batch_apply(sched, ids.tolist(), [t0] * len(ids)), dtype="object")

    return df.withColumn("next_fire_ms", nxt(F.col("id")))


def q_seen_filter_equivalence(spark, sf_dir):
    """URL-seen prefilter equivalence, BOTH kinds the north_star names
    ("bloom/cuckoo"), rows-only: the same fixture crawl with the bloom
    filter, with the cuckoo filter, and with no filter at all (exact
    anti-join only) must produce identical frontiers (URL-seen sets) and
    visit traces — FPs fall through to the exact check, and the cuckoo
    insert-once discipline never loses a key.  Plus per-kind distributed
    build + probe accuracy stats over the lineitem key set: every inserted
    key must probe present (no false negatives), FP counts reported.
    Pairwise equality is also asserted in tests/test_wave_ops.py and
    tests/test_cuckoo.py; cuckoo DELETE (the capability bloom lacks) is
    covered by tests/test_cuckoo.py::test_cuckoo_delete_and_packing."""
    from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
    from chronicrawl_spark.fixtures import test_server_site
    from chronicrawl_spark.operators import cuckoo as ck
    from chronicrawl_spark.operators import seen
    from chronicrawl_spark.tables import StateStore

    def crawl(tag: str, **cfg):
        tmp = tempfile.mkdtemp(prefix=f"seeneq_{tag}_")
        try:
            store = StateStore(spark, os.path.join(tmp, "state"), buckets=4)
            eng = CrawlEngine(
                spark, store, test_server_site(spark), CrawlConfig(**cfg)
            )
            eng.add_seeds(["http://test.example"], now=1_600_000_000_000)
            eng.run(max_waves=9, k_origins=1, per_host_k=1)
            frontier = {
                (r["origin_id"], r["path_id"]) for r in store.read("frontier").collect()
            }
            visits = sorted(
                (r["date"], r["path_id"], r["status"])
                for r in store.read("visits").collect()
            )
            return frontier, visits
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    f_exact, v_exact = crawl("exact", use_bloom=False)
    f_bloom, v_bloom = crawl("bloom", seen_filter="bloom", bloom_shards=2, bloom_bits=1 << 16)
    f_ck, v_ck = crawl("cuckoo", seen_filter="cuckoo", bloom_shards=2, cuckoo_buckets=1 << 10)

    li = _t(spark, sf_dir, "lineitem")
    keys = li.select((F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("key"))
    probe_hit = keys.limit(500)
    probe_miss = keys.select((F.col("key") + F.lit(10_000_000_000)).alias("key")).limit(500)

    def stats(probe) -> tuple[int, int]:
        zero = F.lit(0).cast("long")
        found = probe_hit.withColumn("m", probe(F.col("key"), zero)).filter("m").count()
        fp = probe_miss.withColumn("m", probe(F.col("key"), zero)).filter("m").count()
        return found, fp

    n_bits = 1 << 22
    bloom_bits = seen.build_bloom(keys, "key", n_bits, 5)
    b_found, b_fp = stats(seen.contains_udf(spark, bloom_bits, n_bits, 5))
    ck_planes = ck.build_cuckoo_sharded(
        keys.select(F.lit(0).alias("shard"), "key"), "key", "shard", 1, 1 << 18
    )
    c_found, c_fp = stats(ck.contains_udf(spark, ck_planes))

    return spark.createDataFrame(
        [
            ("bloom", len(f_bloom), f_bloom == f_exact, v_bloom == v_exact, 500, b_found, 500, b_fp),
            ("cuckoo", len(f_ck), f_ck == f_exact, v_ck == v_exact, 500, c_found, 500, c_fp),
        ],
        "kind string, n_frontier long, urlseen_equal boolean, visits_equal boolean, "
        "probes_in long, probes_in_found long, probes_out long, false_positives long",
    )


def q_text_diff(spark, sf_dir):
    """C19 (Webapp.java:179-207, DiffMatchPatch.java): word-level diff of
    two captures of a page — Arrow-batched difflib opcodes + summary stats.
    Rows-only (no SQL diff exists); fixtures are deterministic edited pairs
    from the documents table."""
    from chronicrawl_spark.extras.textdiff import diff_captures

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    # deterministic "new capture": drop the first word, append a marker
    pairs = docs.select(
        "doc_id",
        F.col("text").alias("old_text"),
        F.concat_ws(
            " ",
            F.array_join(F.slice(F.split(F.col("text"), " "), 2, 1_000_000), " "),
            F.lit("appended-edit"),
        ).alias("new_text"),
    )
    out = diff_captures(pairs)
    return out.select(
        "doc_id",
        "words_added",
        "words_removed",
        "unchanged_words",
        F.size("diff").alias("n_ops"),
    )


def q_j9_record_fetch(spark, sf_dir):
    """J9 (Webapp.java:315-330, Storage.java:157-182): WARC record point
    lookup for replay — crawls the fixture, resolves the robots.txt visit's
    warc_id, fetches the record bucket-pruned by origin, verifies payload
    identity against the stored digest."""
    from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
    from chronicrawl_spark.fixtures import test_server_site
    from chronicrawl_spark.replay import fetch_record
    from chronicrawl_spark.tables import StateStore

    tmp = tempfile.mkdtemp(prefix="chronicrawl_j9_")
    store = StateStore(spark, os.path.join(tmp, "state"), buckets=4)
    engine = CrawlEngine(spark, store, test_server_site(spark), CrawlConfig())
    engine.add_seeds(["http://test.example"], now=1_600_000_000_000)
    engine.run(max_waves=3, k_origins=1, per_host_k=1)
    v = (
        store.read("visits")
        .filter(F.col("warc_id").isNotNull())
        .orderBy("date")
        .limit(1)
        .collect()[0]
    )
    rec = fetch_record(store, bytes(v["warc_id"]), origin_id=v["origin_id"])
    return rec.select(
        "record_type",
        "url",
        "date",
        (F.unhex(F.sha1(F.col("payload"))) == F.col("payload_digest")).alias("digest_ok"),
        (F.col("date") == F.lit(v["date"])).alias("date_ok"),
    )


def q_aimd_backfill(spark, sf_dir):
    """C11 as a standalone set operation: recompute AIMD next-visits for an
    entire visit history in one lag-window pass (streaming/aimd_stream.
    aimd_batch — the batch twin of the applyInPandasWithState operator).
    Events table mapped to visit events: key=(user_id, ascii of event
    type), date=epoch ms, unchanged=(value<100)."""
    from chronicrawl_spark.streaming.aimd_stream import aimd_batch

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("origin_id"),
        F.ascii(F.substring("event_type", 1, 1)).cast("long").alias("path_id"),
        _ms("ts").alias("date"),
        (F.col("value") < 100).alias("unchanged"),
    )
    return aimd_batch(ev, 60_000, 3_600_000)


SQL_AIMD_BACKFILL = """
WITH ev AS (
  SELECT user_id AS origin_id,
         CAST(ascii(substr(event_type, 1, 1)) AS BIGINT) AS path_id,
         epoch_ms(ts) AS d,
         (value < 100) AS unchanged
  FROM events
), lagged AS (
  SELECT origin_id, path_id, d,
         lag(d) OVER (PARTITION BY origin_id, path_id ORDER BY d) AS last_v,
         unchanged
  FROM ev
)
SELECT origin_id, path_id, d AS date,
       CASE WHEN last_v IS NULL THEN NULL ELSE
         d + LEAST(GREATEST(
               CASE WHEN unchanged THEN (d - last_v) // 2 ELSE (d - last_v) * 2 END,
               60000), 3600000)
       END AS next_visit_aimd
FROM lagged
"""


def q_aimd_stream_parity(spark, sf_dir):
    """Custom stateful streaming operator (rows-only: stateful streaming is
    non-SQL-expressible): per-location AIMD revisit state maintained across
    micro-batches with applyInPandasWithState, replayed one wave per
    trigger, compared row-for-row against the declarative batch twin.
    Returns a one-row summary (parity asserted in tests/test_streaming.py
    too)."""
    import os
    import shutil

    from chronicrawl_spark.streaming.aimd_stream import aimd_batch, aimd_stream

    MIN_MS, MAX_MS = 60_000, 3_600_000
    tmp = tempfile.mkdtemp(prefix="aimd_stream_")
    try:
        t, all_rows = 1_600_000_000_000, []
        for wave in range(4):
            t += [45_000, 300_000, 7_200_000, 95_000][wave]
            rows = [(100 + loc, 200 + loc, t + loc, (wave + loc) % 2 == 0) for loc in range(5)]
            all_rows += rows
            spark.createDataFrame(
                rows, "origin_id long, path_id long, date long, unchanged boolean"
            ).coalesce(1).write.parquet(f"{tmp}/events/w{wave}")
        stream = (
            spark.readStream.schema("origin_id long, path_id long, date long, unchanged boolean")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/events/w*")
        )
        q = (
            aimd_stream(stream, MIN_MS, MAX_MS)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("aimd_parity_out")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        streamed = {
            (r["origin_id"], r["path_id"], r["date"]): r["next_visit_aimd"]
            for r in spark.sql("SELECT * FROM aimd_parity_out").collect()
        }
        events = spark.createDataFrame(
            all_rows, "origin_id long, path_id long, date long, unchanged boolean"
        )
        batched = {
            (r["origin_id"], r["path_id"], r["date"]): r["next_visit_aimd"]
            for r in aimd_batch(events, MIN_MS, MAX_MS).collect()
        }
        return spark.createDataFrame(
            [(len(streamed), len(batched), streamed == batched)],
            "n_streamed long, n_batch long, parity boolean",
        )
    finally:
        # the parquet waves + streaming checkpoint are fully consumed by the
        # collects above — don't leak a tmpdir per benchmark invocation
        shutil.rmtree(tmp, ignore_errors=True)


def q_audio_features(spark, sf_dir):
    """Multimodal audio plumbing (rows-only: binary payloads aren't
    SQL-expressible): deterministic WAV fixtures → Arrow-batched numpy
    decode → per-row duration/RMS/peak/zero-cross features with poison-row
    isolation (extras/media.audio_features).  The WAV codec is fully real
    (RIFF PCM, pure numpy); value invariants asserted in
    tests/test_media.py."""
    from chronicrawl_spark.extras.media import audio_features, encode_wav, make_test_audio

    rows = [
        (f"aud{i:03d}", bytearray(encode_wav(make_test_audio(4000 + 250 * i, 8000, seed=i), 8000)))
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    return audio_features(df)


def _dlit(v: float) -> str:
    """Render a float64 as a DuckDB expression that parses back to the
    EXACT same bits.  A bare 17-significant-digit literal binds as
    DECIMAL first, and decimal→double is a second rounding — off by 1 ulp
    whenever the digit string's mantissa exceeds 2^53 (measured here).
    String→double (fast_float) is correctly rounded, so route through it."""
    return f"CAST('{v!r}' AS DOUBLE)"


def _sql_audio_features() -> str:
    """Computable oracle for ``audio_features``: the WAV fixtures are
    closed-form (two-tone sines, no RNG), so the expected features are
    precomputed here with the SAME numpy codec the Spark stage runs
    (bitwise-identical float64 ops) and registered as a DuckDB constant
    table.  Doubles are emitted via ``_dlit`` (repr string →
    string→double parse), which is bit-exact where a bare numeric literal
    would take DuckDB's DECIMAL path and lose the last ulp."""
    import numpy as np

    from chronicrawl_spark.extras.media import decode_wav, encode_wav, make_test_audio

    rows = []
    for i in range(24):
        s, rate = decode_wav(encode_wav(make_test_audio(4000 + 250 * i, 8000, seed=i), 8000))
        mono = s.mean(axis=1)
        rms = float(np.sqrt(np.mean(mono.astype(np.float64) ** 2)))
        peak = int(np.max(np.abs(s))) if s.size else 0
        zc = (
            float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
            if len(mono) > 1
            else 0.0
        )
        rows.append(
            f"('aud{i:03d}', {rate}, {s.shape[1]}, "
            f"{_dlit(1000.0 * s.shape[0] / rate)}, "
            f"{_dlit(rms)}, {peak}, {_dlit(zc)})"
        )
    values = ",\n       ".join(rows)
    return f"""
SELECT audio_id,
       CAST(sample_rate AS INTEGER) AS sample_rate,
       CAST(channels AS INTEGER) AS channels,
       CAST(duration_ms AS DOUBLE) AS duration_ms,
       CAST(rms AS DOUBLE) AS rms,
       CAST(peak AS INTEGER) AS peak,
       CAST(zero_cross_rate AS DOUBLE) AS zero_cross_rate,
       CAST(NULL AS VARCHAR) AS error
FROM (VALUES {values})
  AS t(audio_id, sample_rate, channels, duration_ms, rms, peak, zero_cross_rate)
"""


def q_video_frame_sample(spark, sf_dir):
    """Multimodal video plumbing: fixtures cycle the MJPG container,
    real ISO-BMFF MP4 files (from-scratch 14496-12 muxer/demuxer,
    extras/mp4.py), and animated GIF89a (full composite semantics:
    disposal, transparency, local palettes — imaging.decode_gif_frames);
    MJPG/MP4 frames are real baseline JPEGs → Arrow-batched stride-k
    frame sampling (reads ~1/k of each payload: length prefixes on MJPG,
    random-access stsc/stsz/stco sample-table offsets on MP4; GIF
    composites up to the last sampled frame only) → one row per sampled
    frame with dims + phash
    (extras/media.video_frame_sample).  Foreign-codec MP4s are the
    documented pyav/ffmpeg swap-in point on a real cluster; pixel/PSNR
    invariants asserted in tests/test_media.py."""
    from chronicrawl_spark.extras.media import make_test_video, video_frame_sample

    rows = [
        (
            f"vid{i:03d}",
            bytearray(
                make_test_video(
                    32, 24, n_frames=6, seed=i,
                    container=("mjpg", "mp4", "gif")[i % 3],
                )
            ),
        )
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    return video_frame_sample(df, every_k=2)


def _sql_video_frame_sample() -> str:
    """Computable oracle for ``video_frame_sample``: the MJPG/MP4/GIF
    fixtures are closed-form, so the expected sampled frames
    (idx/dims/phash) are precomputed with the same from-scratch codecs and
    registered as a DuckDB constant table — all-integer columns, exact by
    construction."""
    from chronicrawl_spark.extras.media import (
        _signed64,
        decode_video_frames,
        make_test_video,
    )
    from chronicrawl_spark.extras.imaging import phash64

    rows = []
    for i in range(8):
        vid = make_test_video(
            32, 24, n_frames=6, seed=i, container=("mjpg", "mp4", "gif")[i % 3]
        )
        frames, _fps = decode_video_frames(vid, 2, None)
        for idx, px in frames:
            rows.append(
                f"('vid{i:03d}', {idx}, {px.shape[1]}, {px.shape[0]}, {_signed64(phash64(px))})"
            )
    values = ",\n       ".join(rows)
    return f"""
SELECT video_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(w AS INTEGER) AS w,
       CAST(h AS INTEGER) AS h,
       CAST(frame_phash AS BIGINT) AS frame_phash,
       CAST(NULL AS VARCHAR) AS error
FROM (VALUES {values}) AS t(video_id, frame_idx, w, h, frame_phash)
"""


# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the W2 wave-selection operator (the crawl engine's heart)
    at sf0.001."""
    return q_w2_wave_select(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # REGISTRY CAP: the driver's correctness gate evaluates at most 50
    # entries (in r4 it silently dropped entries 51-52).  Keep this dict at
    # EXACTLY ≤50 keys — oracle-verified entries first, rows-only last —
    # so every entry is certified.  Consolidate before adding.
    return {
        # crawl-semantics operators (SURVEY §2) — oracle-verified
        "w2_wave_select": q_w2_wave_select,
        "w1_origin_peek": q_w1_origin_peek,
        "j5_urlseen_antijoin": q_j5_urlseen_antijoin,
        "j6_asof_furthest": q_j6_asof_furthest,
        "j7_digest_dedupe": q_j7_digest_dedupe,
        "a1_metrics_buckets": q_a1_metrics_buckets,
        "w4_log_pagination": q_w4_log_pagination,
        "j3_cdx_star": q_j3_cdx_star,
        "a4_longest_rule": q_a4_longest_rule,
        "w3_visit_history": q_w3_visit_history,
        "a2_max_bucket": q_a2_max_bucket,
        "a3_retention_expiry": q_a3_retention_expiry,
        "w8_screenshot_recency": q_w8_screenshot_recency,
        "u1_merged_visits": q_u1_merged_visits,
        "u2_cdx_scheme_union": q_u2_cdx_scheme_union,
        "c12_politeness": q_c12_politeness,
        "c10_changefreq": q_c10_changefreq,
        "c11_aimd": q_c11_aimd,
        "w5_rule_scan": q_w5_rule_scan,
        "f9_pushdown_scan": q_f9_pushdown_scan,
        "cdx_parse": q_cdx_parse,
        # training-data pipeline operators — oracle-verified
        "dedup_exact": q_dedup_exact,
        "dedup_word_jaccard": q_dedup_word_jaccard,
        "dedup_word_jaccard_guarded": q_dedup_word_jaccard_guarded,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_clusters": q_dedup_clusters,
        "dedup_clusters_incremental": q_dedup_clusters_incremental,
        "embed_dup_pairs": q_embed_dup_pairs,
        "phash_hamming_dups": q_phash_hamming_dups,
        "phash_clusters": q_phash_clusters,
        "embed_cosine_topk": q_embed_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_multi_topk": q_ann_multi_topk,
        "ivf_topk": q_ivf_topk,
        "text_langid": q_text_langid,
        "text_quality": q_text_quality,
        "text_tokens_fingerprint": q_text_tokens_fingerprint,
        "crossmodal_dups": q_crossmodal_dups,
        "audio_features": q_audio_features,
        "video_frame_sample": q_video_frame_sample,
        "aimd_backfill": q_aimd_backfill,
        "image_decode_verify": q_image_decode_verify,
        # crawl-pipeline components — rows-only (non-SQL-expressible)
        "crawl_fixture_trace": q_crawl_fixture_trace,
        "j9_record_fetch": q_j9_record_fetch,
        "text_diff": q_text_diff,
        "aimd_stream_parity": q_aimd_stream_parity,
        "schedule_next_fire": q_schedule_next_fire,
        "seen_filter_equivalence": q_seen_filter_equivalence,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "w2_wave_select": SQL_W2,
        "w1_origin_peek": SQL_W1,
        "j5_urlseen_antijoin": SQL_J5,
        "j6_asof_furthest": SQL_J6,
        "j7_digest_dedupe": SQL_J7,
        "a1_metrics_buckets": SQL_A1,
        "w4_log_pagination": SQL_W4,
        "j3_cdx_star": SQL_J3,
        "a4_longest_rule": SQL_A4,
        "w3_visit_history": SQL_W3,
        "a2_max_bucket": SQL_A2,
        "a3_retention_expiry": SQL_A3,
        "w8_screenshot_recency": SQL_W8,
        "u1_merged_visits": SQL_U1,
        "u2_cdx_scheme_union": _sql_u2(),
        "c12_politeness": SQL_C12,
        "c10_changefreq": SQL_C10,
        "c11_aimd": SQL_C11,
        "w5_rule_scan": SQL_W5,
        "f9_pushdown_scan": SQL_F9,
        "cdx_parse": _sql_cdx_parse(),
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_word_jaccard": SQL_DEDUP_WORD_JACCARD,
        "dedup_word_jaccard_guarded": SQL_DEDUP_WORD_JACCARD_GUARDED,
        "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
        "dedup_minhash_lsh": SQL_DEDUP_MINHASH_LSH,
        "dedup_simhash": SQL_DEDUP_SIMHASH,
        "dedup_clusters": SQL_DEDUP_CLUSTERS,
        "dedup_clusters_incremental": SQL_DEDUP_CLUSTERS,
        "embed_dup_pairs": SQL_EMBED_DUPS,
        "phash_hamming_dups": SQL_PHASH_HAMMING_DUPS,
        "phash_clusters": SQL_PHASH_CLUSTERS,
        "embed_cosine_topk": SQL_EMBED_COSINE_TOPK,
        "ann_lsh_topk": SQL_ANN_LSH_TOPK,
        "ann_multi_topk": SQL_ANN_MULTI_TOPK,
        "ivf_topk": SQL_IVF_TOPK,
        "text_langid": _sql_langid(),
        "text_quality": SQL_TEXT_QUALITY,
        "text_tokens_fingerprint": SQL_TOKENS_FINGERPRINT,
        "crossmodal_dups": _sql_crossmodal_dups(),
        "aimd_backfill": SQL_AIMD_BACKFILL,
        "audio_features": _sql_audio_features(),
        "video_frame_sample": _sql_video_frame_sample(),
        "image_decode_verify": _sql_image_decode_verify(),
        # crawl_fixture_trace / j9_record_fetch / text_diff /
        # aimd_stream_parity / schedule_next_fire / seen_filter_equivalence:
        # intentionally omitted (non-SQL-expressible pipeline components;
        # rows-only check)
    }
