"""Fetch-wave simulation over a fixture ``site`` table.

The reference fetches with one HTTP/1.0 socket per URL (``Exchange.java:
98-164``).  In the sandbox the "web" is a deterministic DataFrame with one
row per URL (plus implicit 404s for known hosts — ``TestServer.java:53-54``)
so a fetch wave is an equi-join, fully partition-parallel:

    wave ⟕ site ON url  →  status / content_type / body / headers

Columns contract for ``site``:
    url (canonical), status int, content_type string, body binary,
    etag string, last_modified string, location string (redirect header)

Conditional-GET semantics (``Exchange.java:104-119`` + server side): when a
prior visit exists (via the reference's quirky ABS(date-now) DESC "closest"
lookup — J6, ``Database.java:387-395``) and its stored ETag/Last-Modified
match the current server values, the server answers 304 and the exchange
becomes a ``server_not_modified`` revisit (``Storage.java:101-113``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NOT_FOUND_BODY = b"404 Not found"


def asof_prev_visit(visits: DataFrame, wave_ts: int, method: str = "GET") -> DataFrame:
    """J6 — the reference's ``findClosest``: per (origin_id, path_id),
    ``status > 0 AND status <> 304 ORDER BY ABS(date - ?) DESC LIMIT 1``
    (``Database.java:387-391``).

    NB: ``DESC`` picks the *furthest* visit despite the name — a true as-of
    join would use ASC/min_by.  Replicated exactly, on purpose (SURVEY §2.3
    J6); tie-break ``date DESC`` pinned for determinism.
    """
    cand = visits.filter(
        (F.col("status") > 0) & (F.col("status") != 304) & (F.col("method") == method)
    )
    w = Window.partitionBy("origin_id", "path_id").orderBy(
        F.abs(F.col("date") - F.lit(wave_ts)).desc(), F.col("date").desc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("origin_id", "path_id", F.col("date").alias("prev_date"))
    )


def prepare_site(site: DataFrame) -> tuple:
    """Persisted (server view, known-host view) of a fixture site table.

    The fetch join broadcasts both per wave; preparing them ONCE per engine
    caches the projected rows and the hosts ``distinct`` (a per-wave shuffle
    of the whole site otherwise) so each wave's broadcast build reads from
    storage memory instead of re-running the fixture plan — the guide's
    "heavyweight init once per task" applied at wave granularity.
    """
    s = site.select(
        F.col("url").alias("__site_url"),
        F.col("status").alias("__s_status"),
        F.col("content_type").alias("__s_ct"),
        F.col("body").alias("__s_body"),
        F.col("etag").alias("__s_etag"),
        F.col("last_modified").alias("__s_lm"),
        F.col("location").alias("__s_loc"),
    ).persist()
    hosts = (
        site.select(F.regexp_extract("url", r"^(https?://[^/]+)", 1).alias("origin"))
        .distinct()
        .withColumn("__host_known", F.lit(True))
        .persist()
    )
    return s, hosts


def simulate_fetch(
    wave: DataFrame,
    site,
    visits: DataFrame,
    warc_records: DataFrame,
    wave_ts: int,
    dedupe_server: bool = True,
) -> DataFrame:
    """Join-based fetch for the allowed rows of a wave.

    ``site`` is either the raw site table or a ``prepare_site`` tuple.
    Adds: status, content_type, body, etag, last_modified, loc_header,
    prev_date (server-304 revisit pointer, null otherwise).
    """
    if isinstance(site, tuple):
        s, hosts = site
    else:
        s = site.select(
            F.col("url").alias("__site_url"),
            F.col("status").alias("__s_status"),
            F.col("content_type").alias("__s_ct"),
            F.col("body").alias("__s_body"),
            F.col("etag").alias("__s_etag"),
            F.col("last_modified").alias("__s_lm"),
            F.col("location").alias("__s_loc"),
        )
        hosts = (
            site.select(F.regexp_extract("url", r"^(https?://[^/]+)", 1).alias("origin"))
            .distinct()
            .withColumn("__host_known", F.lit(True))
        )
    # the fixture site is a small table (the real web is a socket, not a
    # join) — broadcast it so the wave never shuffles for the fetch
    out = wave.join(F.broadcast(s), wave["url"] == s["__site_url"], "left").drop("__site_url")
    out = out.join(F.broadcast(hosts), "origin", "left")
    # unknown URL on a known host → live-server 404; unknown host → DNS fail
    out = (
        out.withColumn(
            "status",
            F.when(F.col("__s_status").isNotNull(), F.col("__s_status"))
            .when(F.col("__host_known").isNotNull(), F.lit(404))
            .otherwise(F.lit(-1)),
        )
        .withColumn(
            "content_type",
            F.when(F.col("__s_status").isNotNull(), F.col("__s_ct")).when(
                F.col("__host_known").isNotNull(), F.lit("text/plain")
            ),
        )
        .withColumn(
            "body",
            F.when(F.col("__s_status").isNotNull(), F.col("__s_body")).when(
                F.col("__host_known").isNotNull(), F.lit(NOT_FOUND_BODY)
            ),
        )
        .withColumn("etag", F.col("__s_etag"))
        .withColumn("last_modified", F.col("__s_lm"))
        .withColumn("loc_header", F.col("__s_loc"))
        .drop("__s_status", "__s_ct", "__s_body", "__s_etag", "__s_lm", "__s_loc", "__host_known")
    )

    if dedupe_server:
        prev = asof_prev_visit(visits, wave_ts)
        # prior response headers live on the stored WARC record
        # (Exchange.java:108-113 reads them back from the archive)
        resp = warc_records.filter(
            F.col("record_type").isin("response", "revisit")
        ).select(
            "origin_id",
            "path_id",
            F.col("date").alias("prev_date"),
            F.col("etag").alias("__p_etag"),
            F.col("last_modified").alias("__p_lm"),
        )
        prev = prev.join(resp, ["origin_id", "path_id", "prev_date"], "left")
        out = out.join(prev, ["origin_id", "path_id"], "left")
        # materialize the predicate FIRST: the updates below rewrite the very
        # columns it reads (status), so inlining it would evaluate against
        # the already-mutated column in later withColumns
        out = out.withColumn(
            "__nm",
            (F.col("status") == 200)
            & (
                (F.col("__p_etag").isNotNull() & (F.col("__p_etag") == F.col("etag")))
                | (
                    F.col("__p_etag").isNull()
                    & F.col("__p_lm").isNotNull()
                    & (F.col("__p_lm") == F.col("last_modified"))
                )
            ),
        )
        nm = F.coalesce(F.col("__nm"), F.lit(False))
        out = (
            out.withColumn("status", F.when(nm, F.lit(304)).otherwise(F.col("status")))
            .withColumn("body", F.when(nm, F.lit(b"")).otherwise(F.col("body")))
            .withColumn(
                "prev_date", F.when(nm, F.col("prev_date")).otherwise(F.lit(None).cast("long"))
            )
            .drop("__p_etag", "__p_lm", "__nm")
        )
    else:
        out = out.withColumn("prev_date", F.lit(None).cast("long"))
    return out
