"""Deterministic fixtures: the reference test-server site + scale generators.

- ``test_server_site``: exact replica of the reference's fixture web server
  (``TestServer.java:21-56``) as a ``site`` DataFrame — drives the
  sequential-parity test (CrawlTest's 6 steps + the /no robots denial).
- ``image_site``: extends the fixture with image leaf pages wired to an
  ``images`` payload table (BASELINE.json input_hint shape).
- ``synthetic_frontier``: seeded scale generator mirroring the reference's
  dummy-data harness (100 origins × 1000 locations, ``Webapp.java:208-224``)
  with a skew mode for the salted top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .extras.imaging import (
    decode_jpeg,
    encode_bmp,
    encode_gif,
    encode_jpeg,
    encode_png,
    make_paletted_image,
    make_smooth_image,
    make_test_image,
    phash64,
)
from .functions.hashing import hash_str

SITE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("body", T.BinaryType(), True),
        T.StructField("etag", T.StringType(), True),
        T.StructField("last_modified", T.StringType(), True),
        T.StructField("location", T.StringType(), True),
    ]
)

ROBOTS_BODY = b"Sitemap: /sitemap-index.xml\ncrawl-delay: 5\nDisallow: /no\n"
SITEMAP_INDEX_BODY = (
    b'<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    b"<sitemap><loc>/sitemap.xml</loc></sitemap></sitemapindex>"
)
SITEMAP_BODY = (
    b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    b"<url><loc>/no</loc></url>"
    b"<url><loc>/page</loc><changefreq>daily</changefreq><priority>0.8</priority></url>"
    b"</urlset>"
)
HOME_BODY = b"<link rel=stylesheet href=style.css><h1>Hello</h1>"
CSS_BODY = b"body { background: blue; }"


def test_server_rows(origin: str = "http://test.example") -> list[tuple]:
    """The fixture site rows (ref ``TestServer.java:21-56``).  Any other path
    on the host 404s with body '404 Not found' (handled by the simulator)."""
    return [
        (
            origin + "/robots.txt", 200, "text/plain", ROBOTS_BODY,
            '"123"', "Wed, 21 Oct 2015 07:28:00 GMT", None,
        ),
        (origin + "/sitemap-index.xml", 200, "application/xml", SITEMAP_INDEX_BODY, None, None, None),
        (origin + "/sitemap.xml", 200, "application/xml", SITEMAP_BODY, None, None, None),
        (origin + "/", 200, "text/html", HOME_BODY, None, None, None),
        (origin + "/style.css", 200, "text/css", CSS_BODY, None, None, None),
    ]


def test_server_site(spark: SparkSession, origin: str = "http://test.example") -> DataFrame:
    return spark.createDataFrame(test_server_rows(origin), SITE_SCHEMA)


# ------------------------------------------------------------ image payloads

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


DEFAULT_FMT_CYCLE = ("bmp", "png", "jpeg", "gif")


def _image_row(i: int, w: int, h: int, fmt: str) -> tuple:
    """One deterministic input_hint row: seeded pixels → encode → stored
    phash.  Lossless rows (bmp, png, gif-on-paletted) store the phash of
    the source pixels; jpeg rows store the phash of the DECODED pixels
    (the decoder in the pipeline must reproduce it bit-for-bit) and carry
    the PSNR ≥ 40 dB lossy invariant against the pristine source."""
    if fmt == "jpeg":
        px = make_smooth_image(w, h, seed=i)
        data = encode_jpeg(px, quality=95)
        ph = phash64(decode_jpeg(data))
    elif fmt == "gif":
        px = make_paletted_image(w, h, seed=i)
        data = encode_gif(px)
        ph = phash64(px)
    else:
        px = make_test_image(w, h, seed=i)
        data = encode_png(px) if fmt == "png" else encode_bmp(px)
        ph = phash64(px)
    return (f"img{i:04d}", data, w, h, fmt, f"caption for image {i}", ph)


def make_images(spark: SparkSession, n: int = 8, w: int = 32, h: int = 24) -> DataFrame:
    """Deterministic image+caption table (input_hint shape).  Rows cycle
    BMP / PNG / baseline-JPEG / GIF — all four from-scratch codecs
    (extras/imaging.py), covering every image content type in the
    reference's seed data (schema.sql:102-112).  Driver-side; for scale
    use ``make_images_distributed`` (same rows, executor-generated)."""
    rows = [_image_row(i, w, h, DEFAULT_FMT_CYCLE[i % 4]) for i in range(n)]
    return spark.createDataFrame(rows, IMAGES_SCHEMA)


def make_images_distributed(
    spark: SparkSession,
    n: int,
    w: int = 128,
    h: int = 96,
    fmt_cycle: tuple = DEFAULT_FMT_CYCLE,
    partitions: int | None = None,
) -> DataFrame:
    """``make_images`` at scale: the same deterministic rows, but pixels
    are generated and encoded IN the executors (Arrow ``mapInPandas`` over
    ``spark.range(n)``), so a 10^8-image seed table never rides the driver.
    Given the same (n, w, h, fmt_cycle) the rows are byte-identical to
    ``make_images`` (pinned by ``tests/test_imaging.py``)."""
    import pandas as pd

    cycle = tuple(fmt_cycle)
    parts = partitions or spark.sparkContext.defaultParallelism * 2
    cols = [f.name for f in IMAGES_SCHEMA.fields]

    def gen(frames):
        for pdf in frames:
            rows = [
                _image_row(i, w, h, cycle[i % len(cycle)])
                for i in (int(v) for v in pdf["id"])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(n).repartition(parts).mapInPandas(gen, IMAGES_SCHEMA)


def image_site(
    spark: SparkSession, images: DataFrame, origin: str = "http://img.example"
) -> DataFrame:
    """Fixture site whose pages embed image leaf URLs wired to ``images``."""
    img_rows = images.collect()
    rows = [
        (
            origin + "/robots.txt", 200, "text/plain",
            b"Sitemap: /sitemap.xml\ncrawl-delay: 1\n", None, None, None,
        ),
        (
            origin + "/sitemap.xml", 200, "application/xml",
            (
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                + "".join(f"<url><loc>/gallery/{i}</loc></url>" for i in range(len(img_rows)))
                + "</urlset>"
            ).encode(),
            None, None, None,
        ),
    ]
    for i, r in enumerate(img_rows):
        page = f'<html><img src="/img/{r["image_id"]}.{r["fmt"]}"><p>{r["caption"]}</p></html>'
        rows.append((f"{origin}/gallery/{i}", 200, "text/html", page.encode(), None, None, None))
        rows.append(
            (
                f"{origin}/img/{r['image_id']}.{r['fmt']}", 200, f"image/{r['fmt']}",
                bytes(r["bytes"]), f'"{r["image_id"]}"', None, None,
            )
        )
    return spark.createDataFrame(rows, SITE_SCHEMA)


# ---------------------------------------------------------- scale generators

def synthetic_frontier(
    spark: SparkSession,
    n_origins: int,
    locs_per_origin: int,
    now: int,
    skew_frac: float = 0.0,
    buckets_hint: int | None = None,
    due_per_host: int | None = None,
):
    """Seeded synthetic (origins, frontier) DataFrames at scale.

    URLs are ``http://h{i}.example/p{j}``; ids use the engine's own xxh64
    identity (computed distributed, in an Arrow UDF — no driver loop).
    ``skew_frac`` moves that fraction of ALL locations onto host h0
    (hot-host fixture for the salted top-k, SURVEY §4.1).

    ``due_per_host=None`` (default) makes every row due at ``now`` — the
    cold-start worst case.  ``due_per_host=D`` builds the STEADY-STATE
    frontier shape a continuous recrawl actually runs against: only the
    first D locations of each host are due, the rest carry staggered
    future ``next_visit`` values (spread over ~1000 hourly revisit slots),
    so the due set stays fixed while the frontier grows — the 10^10-rows /
    ~5M-due-per-wave regime of the north star.  With the state store's
    next_visit clustering the due scan then prunes to O(due) row groups.

    Mirrors the reference's dummy-data harness shape (``Webapp.java:208-224``).
    """
    from .functions.udfs import url_parts

    total = n_origins * locs_per_origin
    base = spark.range(total).withColumn("j", F.col("id"))
    if skew_frac > 0:
        hot = int(total * skew_frac)
        host_i = F.when(F.col("id") < hot, F.lit(0)).otherwise(
            (F.col("id") % F.lit(n_origins)).cast("long")
        )
    else:
        host_i = (F.col("id") % F.lit(n_origins)).cast("long")
    urls = base.select(
        F.col("id"),  # kept for the due_per_host staggering below
        F.concat(
            F.lit("http://h"), host_i.cast("string"), F.lit(".example/p"), F.col("j").cast("string")
        ).alias("raw_url"),
    )
    # persist: origins and frontier both derive from this (and the state-store
    # merges would otherwise re-run the identity UDF per action)
    u = urls.withColumn("u", url_parts(F.col("raw_url"))).persist()
    frontier = u.select(
        F.col("u.origin_id").alias("origin_id"),
        F.col("u.path_id").alias("path_id"),
        F.col("u.pathref").alias("path"),
        F.lit("PAGE").alias("location_type"),
        F.lit(0).cast("short").alias("depth"),
        F.lit(None).cast("long").alias("via_origin_id"),
        F.lit(None).cast("long").alias("via_path_id"),
        F.lit(now).alias("discovered"),
        F.lit(None).cast("long").alias("last_visit"),
        (
            F.lit(now)
            if due_per_host is None
            # location index within its host = id // n_origins (host = id %
            # n_origins): first D per host due now, rest staggered over
            # future hourly revisit slots — deterministic, skew-free
            else F.when(
                (F.col("id") / F.lit(n_origins)).cast("long") < F.lit(due_per_host),
                F.lit(now),
            ).otherwise(F.lit(now) + ((F.col("id") % 997) + 1) * F.lit(3_600_000))
        ).alias("next_visit"),
    )
    origins = (
        u.select(F.col("u.origin").alias("origin"), F.col("u.origin_id").alias("origin_id"))
        .distinct()
        .select(
            "origin_id",
            "origin",
            F.lit(now).alias("discovered"),
            F.lit("CONTINUOUS").alias("crawl_policy"),
            F.lit(None).cast("long").alias("last_visit"),
            F.lit(now).alias("next_visit"),
            F.lit(None).cast("short").alias("robots_crawl_delay"),
            F.lit(None).cast("binary").alias("robots_txt"),
        )
    )
    return origins, frontier


def synthetic_site_for_frontier(spark: SparkSession, n_origins: int) -> DataFrame:
    """A site table where every generated URL 404s fast (scheduler-throughput
    benches measure queue mechanics, not extraction)."""
    rows = [(f"http://h{i}.example/", 200, "text/html", b"<h1>h</h1>", None, None, None) for i in range(n_origins)]
    return spark.createDataFrame(rows, SITE_SCHEMA)
