"""CDX: external-archive source (S9) + replay-index view (J3/C7/C8).

The reference queries a remote CDX API and parses 11-field space-separated
lines into Visits (``ExternalArchive.java:28-61``); its own visits double as
a CDX index for pywb replay (``Database.java:397-407`` asCdxLines, base32
digest render ``Database.java:519-523``, ARC dates ``Util.java:13``).

Both directions here are pure JVM expressions: split/casts for parse,
``date_format``-style rendering for output — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 11-field CDX line: urlkey timestamp original mimetype statuscode digest
# redirect robotflags length offset filename (ExternalArchive.java:33-47)
CDX_FIELDS = [
    "urlkey", "timestamp", "original", "mimetype", "statuscode",
    "digest", "redirect", "robotflags", "length", "offset", "filename",
]


def parse_cdx_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """text lines → typed visit-like rows (S9).

    '-' fields become NULL (reference treats them as absent); the 14-digit
    ARC timestamp parses as UTC (``Util.java:13``).
    """
    parts = F.split(F.col(col), " ")
    d = lines.select(*[parts.getItem(i).alias(n) for i, n in enumerate(CDX_FIELDS)])
    nn = lambda c: F.when(F.col(c) != "-", F.col(c))  # noqa: E731
    return d.select(
        F.col("urlkey"),
        F.unix_millis(F.to_timestamp("timestamp", "yyyyMMddHHmmss")).alias("date"),
        F.col("original").alias("url"),
        nn("mimetype").alias("content_type"),
        F.col("statuscode").cast("short").alias("status"),
        nn("digest").alias("digest_b32"),
        nn("redirect").alias("redirect"),
        F.col("length").cast("long").alias("length"),
        nn("offset").cast("long").alias("offset"),
        F.col("filename").alias("filename"),
    )


# RFC 4648 base32 alphabet — the WARC digest render (Database.java:519-523
# pads the truncated 8-byte stored digest to 20 bytes before encoding).
_B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"


def base32_expr(bin_col):
    """base32(binary) as a pure Column expression: bytes → 5-bit groups.

    Works on the 20-byte (padded) sha1 digests → 32 chars, no padding
    needed (160 bits = 32×5).  Implemented via bit arithmetic over a
    sequence — JVM-side, no UDF.
    """
    # total bits = 8 * length; index i selects bits [5i, 5i+5)
    n_groups = (F.length(bin_col) * 8 / 5).cast("int")
    idx = F.sequence(F.lit(0), n_groups - 1)

    def group_char(i):
        bit = i * 5
        byte_i = (bit / 8).cast("int")
        off = bit % 8
        b1 = F.conv(F.hex(F.substring(bin_col, byte_i + 1, 1)), 16, 10).cast("int")
        b2 = F.coalesce(
            F.conv(F.hex(F.substring(bin_col, byte_i + 2, 1)), 16, 10).cast("int"), F.lit(0)
        )
        b2 = F.when(F.length(F.substring(bin_col, byte_i + 2, 1)) > 0, b2).otherwise(F.lit(0))
        # dynamic right-shift via exact power-of-two division (shift < 8,
        # combined < 2^16 — double arithmetic is exact here)
        combined = b1 * 256 + b2
        # take bits [off, off+5) counting from the MSB of the 16-bit window
        shift = (F.lit(11) - off).cast("double")
        val = (F.floor(combined / F.pow(F.lit(2.0), shift)).cast("int")).bitwiseAND(F.lit(31))
        return F.element_at(F.split(F.lit("|".join(_B32)), "\\|"), val + 1)

    return F.concat_ws("", F.transform(idx, group_char))


def visits_as_cdx(visits: DataFrame, frontier: DataFrame, origins: DataFrame) -> DataFrame:
    """The replay-index view (``Database.java:397-407``): visits ⟕ location
    ⟕ origin star join, GET-only, successful, non-304, digest+warc present.
    Dimension sides broadcast (they are host/URL tables vs the visit log)."""
    loc = frontier.select("origin_id", "path_id", "path")
    org = origins.select("origin_id", "origin")
    v = visits.filter(
        (F.col("method") == "GET")
        & (F.col("status") > 0)
        & (F.col("status") != 304)
        & F.col("response_payload_digest").isNotNull()
        & F.col("warc_id").isNotNull()
    )
    # pad truncated 8-byte digest to 20 (Database.java:521); the pad MUST be
    # a binary literal — repeat(X'00', n) is a string function, and the
    # coerced concat round-trips the digest bytes through UTF-8, corrupting
    # any non-ASCII byte before the base32 render
    padded = F.concat(F.col("response_payload_digest"), F.lit(b"\x00" * 12))
    return (
        v.join(F.broadcast(loc), ["origin_id", "path_id"], "left")
        .join(F.broadcast(org), ["origin_id"], "left")
        .select(
            F.concat(F.col("origin"), F.col("path")).alias("url"),
            F.date_format(
                F.timestamp_millis(F.col("date")), "yyyyMMddHHmmss"
            ).alias("arc_date"),
            F.col("content_type"),
            F.col("status"),
            base32_expr(padded).alias("digest_b32"),
            F.col("response_length").alias("length"),
        )
    )


def export_cdx_lines(files: DataFrame) -> DataFrame:
    """Render the 11-field CDX index for a `warcfile.warc_export` result —
    the text index pywb/OutbackCDX build replay on (same field order the
    reference consumes from remote archives, ``ExternalArchive.java:33-47``,
    so :func:`parse_cdx_lines` round-trips it).  One narrow explode over
    the export's per-file index arrays; payload blobs are not touched.

    Output: one row per response/revisit member, column ``value`` =
    ``urlkey timestamp original mimetype statuscode digest - - length
    offset filename``.
    """
    from ..functions.udfs import url_parts

    e = files.select("name", F.explode("index").alias("i"))

    def dash(c):
        return F.coalesce(c.cast("string"), F.lit("-"))

    # warc_records carry the FULL 20-byte sha1 (unlike the visit log's
    # truncated 8 bytes), so the classic 32-char base32 render needs no pad
    return e.select(
        F.concat_ws(
            " ",
            url_parts(F.col("i.url"))["ssurt"],
            F.date_format(F.timestamp_millis(F.col("i.date")), "yyyyMMddHHmmss"),
            F.col("i.url"),
            dash(F.col("i.content_type")),
            dash(F.col("i.status")),
            F.when(F.col("i.digest").isNotNull(), base32_expr(F.col("i.digest"))).otherwise(F.lit("-")),
            F.lit("-"),
            F.lit("-"),
            dash(F.col("i.length")),
            dash(F.col("i.offset")),
            F.col("name"),
        ).alias("value")
    )
