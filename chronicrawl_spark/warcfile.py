"""WARC/1.1 (ISO 28500) file export + import, from the public spec.

The reference archives every exchange through jwarc: a warcinfo record
opens each file, request + response (or revisit) records follow, and
files rotate on size (``Storage.java:43-151``; revisit profiles
``Storage.java:103-137``).  This module gives the Spark engine the same
capability Spark-first:

- :func:`warc_export` serializes the ``warc_records`` × ``visits`` join
  into standard gzip-member ``.warc.gz`` blobs inside one
  ``applyInPandas`` grouped by a shard of the EXCHANGE key
  ``xxhash64(url, date)`` — request and response/revisit of one exchange
  share (url, date) (crawl.py ``_append_visits_and_warc``), so the single
  hash shuffle co-locates whole exchanges and every response's
  ``WARC-Concurrent-To`` request is guaranteed to sit in the same file,
  mirroring the reference's adjacent-pair write order
  (``Storage.java:72-97``).  ``records_per_file`` is the rotation knob
  (the analog of ``warcMaxLengthBytes``); files always rotate on exchange
  boundaries.
- :func:`warc_import` parses external WARC files back into the engine's
  ``warc_records`` shape (identity ids regenerated through the same
  ``url_parts`` UDF the crawler uses), so archives written by the
  reference — or any ISO 28500 crawler — can enter the state store.

Scale: serialization is pure per-row byte assembly, one gzip member per
record (the standard seekable ``.warc.gz`` layout readable by pywb /
warcio), so a 100 TB archive exports as one map over the warc_records
table with each task holding at most one Arrow batch of payloads.
Determinism: record ids are the stored warc_ids, warcinfo ids and file
names derive from member content, so the same store exports
byte-identical files (gzip mtime pinned to 0).
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from base64 import b32decode, b32encode
from datetime import datetime, timezone
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SOFTWARE = "chronicrawl-spark/1.0"

# WARC 1.1 revisit profile URIs (IIPC warc-specifications, public) — the
# same two the reference selects between (Storage.java:105-137).
PROFILE_URI = {
    "server_not_modified": "http://netpreserve.org/warc/1.1/revisit/server-not-modified",
    "identical_payload_digest": "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
}
_URI_PROFILE = {v: k for k, v in PROFILE_URI.items()}

_REASON = {
    200: "OK", 301: "Moved Permanently", 302: "Found", 304: "Not Modified",
    403: "Forbidden", 404: "Not Found", 410: "Gone", 500: "Internal Server Error",
}

EXPORT_SCHEMA = (
    "name string, data binary, n_records long, n_bytes long, "
    "index array<struct<url:string,date:long,record_type:string,status:int,"
    "content_type:string,digest:binary,offset:long,length:long>>"
)


def _warc_date(ms: int) -> str:
    dt = datetime.fromtimestamp(ms // 1000, tz=timezone.utc)
    return f"{dt:%Y-%m-%dT%H:%M:%S}.{ms % 1000:03d}Z"


def _parse_warc_date(s: str) -> int:
    base, frac = (s[:-1].split(".") + ["0"])[:2] if "." in s else (s[:-1], "0")
    dt = datetime.strptime(base, "%Y-%m-%dT%H:%M:%S").replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1000 + int(frac.ljust(3, "0")[:3])


def _urn_uuid(b: bytes) -> str:
    h = b.hex()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}>"


def _urn_to_bytes(urn: str) -> bytes:
    return bytes.fromhex(urn.strip("<>").rsplit(":", 1)[1].replace("-", ""))


def _derive_id(url: str, date_ms: int, kind: str) -> bytes:
    """The engine's record-id derivation (crawl.py _append_visits_and_warc):
    first 16 bytes of sha1('{url}|{date}|{kind}')."""
    return hashlib.sha1(f"{url}|{date_ms}|{kind}".encode()).digest()[:16]


def _http_response_head(status: int, content_type: str, content_length: int) -> bytes:
    reason = _REASON.get(status, "Unknown")
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {content_length}\r\n\r\n"
    ).encode()


def _http_request_block(url: str) -> bytes:
    parts = urlsplit(url)
    target = (parts.path or "/") + (f"?{parts.query}" if parts.query else "")
    return (
        f"GET {target} HTTP/1.1\r\nHost: {parts.netloc}\r\n"
        f"User-Agent: {SOFTWARE}\r\n\r\n"
    ).encode()


def _record(headers: list, block: bytes) -> bytes:
    head = "WARC/1.1\r\n" + "".join(f"{k}: {v}\r\n" for k, v in headers)
    head += f"Content-Length: {len(block)}\r\n\r\n"
    return head.encode() + block + b"\r\n\r\n"


def serialize_row(r: dict) -> bytes:
    """One stored warc_records row (joined with its visit's status /
    content_type / content_length) → one uncompressed WARC 1.1 record."""
    rid = bytes(r["warc_id"])
    url, date = r["url"], int(r["date"])
    rtype = r["record_type"]
    ct = r.get("content_type") or "application/octet-stream"
    headers = [
        ("WARC-Type", rtype if rtype != "revisit" else "revisit"),
        ("WARC-Record-ID", _urn_uuid(rid)),
        ("WARC-Date", _warc_date(date)),
        ("WARC-Target-URI", url),
    ]
    if rtype == "request":
        headers.append(("Content-Type", "application/http;msgtype=request"))
        return _record(headers, _http_request_block(url))

    # response / revisit share the pairing + digest headers
    headers.append(("WARC-Concurrent-To", _urn_uuid(_derive_id(url, date, "request"))))
    status = int(r["status"]) if r.get("status") is not None else 200
    if rtype == "revisit":
        headers.append(("WARC-Profile", PROFILE_URI[r["profile"]]))
        if r.get("refers_to_date") is not None:
            headers.append(("WARC-Refers-To-Target-URI", url))
            headers.append(("WARC-Refers-To-Date", _warc_date(int(r["refers_to_date"]))))
        # header-only block, like the reference's readHeaderOnly body
        block = _http_response_head(status, ct, 0)
    else:
        payload = bytes(r["payload"]) if r.get("payload") is not None else b""
        if r.get("payload_digest") is not None:
            headers.append(
                ("WARC-Payload-Digest", "sha1:" + b32encode(bytes(r["payload_digest"])).decode())
            )
        block = _http_response_head(status, ct, len(payload)) + payload
    headers.append(("Content-Type", "application/http;msgtype=response"))
    return _record(headers, block)


def _warcinfo(filename: str, date_ms: int, software: str) -> bytes:
    fields = (
        f"software: {software}\r\nformat: WARC File Format 1.1\r\n"
    ).encode()
    rid = hashlib.sha1(filename.encode()).digest()[:16]
    headers = [
        ("WARC-Type", "warcinfo"),
        ("WARC-Record-ID", _urn_uuid(rid)),
        ("WARC-Date", _warc_date(date_ms)),
        ("WARC-Filename", filename),
        ("Content-Type", "application/warc-fields"),
    ]
    return _record(headers, fields)


def _gz(member: bytes) -> bytes:
    return gzip.compress(member, compresslevel=6, mtime=0)


def _serialize_file(rows: list, software: str) -> tuple:
    """rows (already ordered) → (name, .warc.gz bytes, index entries).

    Index entries are (url, date, record_type, status, content_type,
    digest, offset, length) for response/revisit members only — the
    records a CDX replay index addresses (requests are not indexed, same
    as every classic CDX writer).  Offsets are byte positions of the gzip
    members within the file, the seekable-member contract pywb relies on."""
    ids = b"".join(bytes(r["warc_id"]) for r in rows)
    min_date = min(int(r["date"]) for r in rows)
    name = f"chronicrawl-{min_date}-{hashlib.sha1(ids).hexdigest()[:8]}.warc.gz"
    out = [_gz(_warcinfo(name, min_date, software))]
    offset = len(out[0])
    index = []
    for r in rows:
        member = _gz(serialize_row(r))
        if r["record_type"] in ("response", "revisit"):
            digest = r.get("payload_digest")
            index.append((
                r["url"], int(r["date"]), r["record_type"],
                int(r["status"]) if r.get("status") is not None else None,
                r.get("content_type"),
                bytes(digest) if digest is not None else None,
                offset, len(member),
            ))
        offset += len(member)
        out.append(member)
    return name, b"".join(out), index


def warc_export(
    records: DataFrame,
    visits: DataFrame,
    software: str = SOFTWARE,
    records_per_file: int | None = None,
    shards: int | None = None,
) -> DataFrame:
    """warc_records ⟕ visits → DataFrame of (name, data, n_records,
    n_bytes) .warc.gz blobs.

    Both sides are sharded on ``xxhash64(origin_id, path_id, date)`` — a
    hash of the exchange key, which request and response/revisit share by
    construction — and cogrouped, so the PAYLOAD side crosses exactly ONE
    exchange (pinned in tests/test_plans.py): the visit-status lookup that
    a records⟕visits join would pay as a second full payload shuffle is
    instead a local pandas merge against the narrow ~40-byte visit rows of
    the same shard.  Each shard then sorts by (date, url, record_type) —
    request before response, the reference's write order — and packs files
    of ~``records_per_file`` records, rotating ONLY on exchange boundaries
    so WARC-Concurrent-To pairing always resolves within a file.
    ``shards`` defaults to the cluster's default parallelism; at 100 TB
    each shard holds one file's worth of payloads at a time and shard
    count scales writers linearly."""
    if shards is None:
        shards = max(records.sparkSession.sparkContext.defaultParallelism, 1)

    def shard(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "_shard", F.pmod(F.xxhash64("origin_id", "path_id", "date"), F.lit(shards))
        )

    r = shard(records.select(
        "origin_id", "path_id", "warc_id", "record_type", "url", "date",
        "payload", "payload_digest", "refers_to_date", "profile",
    ))
    v = shard(visits.select(
        "origin_id", "path_id", "date", "status", "content_type", "content_length"
    ))

    def ser(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        cols = ["name", "data", "n_records", "n_bytes", "index"]
        if left.empty:  # a visit with no warc record (synthetic error rows)
            return pd.DataFrame(columns=cols)
        pdf = left.drop(columns=["_shard"]).merge(
            right.drop(columns=["_shard"]),
            on=["origin_id", "path_id", "date"], how="left",
        )
        # left-merge misses surface as NaN; serialize_row expects None
        for c in ("status", "content_type", "content_length"):
            pdf[c] = pdf[c].astype(object).where(pdf[c].notna(), None)
        pdf = pdf.sort_values(["date", "url", "record_type"])
        step = records_per_file or max(len(pdf), 1)
        # exchange boundaries: consecutive rows with the same (url, date)
        key = pdf["url"].astype(str) + "\0" + pdf["date"].astype(str)
        new_exchange = key.ne(key.shift()).to_numpy()
        rows_out, seg = [], []

        def flush(seg):
            name, data, index = _serialize_file(seg, software)
            rows_out.append((name, data, len(seg), len(data), index))

        for i, rec in enumerate(pdf.to_dict("records")):
            if new_exchange[i] and len(seg) >= step:
                flush(seg)
                seg = []
            seg.append(rec)
        if seg:
            flush(seg)
        return pd.DataFrame(rows_out, columns=cols)

    return r.groupBy("_shard").cogroup(v.groupBy("_shard")).applyInPandas(
        ser, EXPORT_SCHEMA
    )


def save_warc_files(files: DataFrame, out_dir: str) -> int:
    """Write exported blobs as files under ``out_dir`` (executor-side —
    on a cluster this must be a shared filesystem).  Returns file count."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_part(batches):
        n = 0
        for pdf in batches:
            for name, data in zip(pdf["name"], pdf["data"]):
                with open(os.path.join(out_dir, name), "wb") as f:
                    f.write(bytes(data))
                n += 1
        yield pd.DataFrame([(n,)], columns=["n"])

    return int(
        files.mapInPandas(write_part, "n long").agg(F.sum("n")).collect()[0][0] or 0
    )


# --- import -----------------------------------------------------------------


def parse_warc(data: bytes) -> list:
    """Parse one .warc.gz (or plain .warc) byte string → list of dicts
    with parsed WARC headers + raw block.  Each gzip member is
    decompressed independently (the seekable layout contract)."""
    if data[:2] == b"\x1f\x8b":
        raw = bytearray()
        pos = 0
        while pos < len(data):
            d = zlib.decompressobj(31)
            raw += d.decompress(data[pos:])
            raw += d.flush()
            tail = len(d.unused_data)
            pos = len(data) - tail if tail else len(data)
        data = bytes(raw)
    records = []
    pos = 0
    while pos < len(data):
        end = data.index(b"\r\n\r\n", pos)
        head = data[pos:end].decode()
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError("bad record header")
        hdrs = dict(ln.split(": ", 1) for ln in lines[1:])
        ln = int(hdrs["Content-Length"])
        block = data[end + 4 : end + 4 + ln]
        if data[end + 4 + ln : end + 8 + ln] != b"\r\n\r\n":
            raise ValueError("missing record terminator")
        records.append({"headers": hdrs, "block": block, "version": lines[0]})
        pos = end + 8 + ln
    return records


def _rows_from_warc(data: bytes) -> list:
    out = []
    for rec in parse_warc(data):
        h = rec["headers"]
        rtype = h["WARC-Type"]
        if rtype == "warcinfo":
            continue
        url = h["WARC-Target-URI"]
        date = _parse_warc_date(h["WARC-Date"])
        payload = None
        if rtype == "response":
            body = rec["block"]
            cut = body.index(b"\r\n\r\n")
            payload = body[cut + 4 :]
        digest = h.get("WARC-Payload-Digest")
        profile = _URI_PROFILE.get(h.get("WARC-Profile"))
        refers = h.get("WARC-Refers-To-Date")
        out.append(
            (
                _urn_to_bytes(h["WARC-Record-ID"]),
                rtype,
                url,
                date,
                payload,
                b32decode(digest.split(":", 1)[1]) if digest else None,
                _parse_warc_date(refers) if refers else None,
                profile,
            )
        )
    return out


def warc_import(files: DataFrame) -> DataFrame:
    """DataFrame of (data binary) WARC blobs/files → the engine's
    warc_records shape, identity ids regenerated through the crawler's own
    ``url_parts`` UDF (same canonicalization + xxh64 as discovery), so an
    imported archive joins/replays exactly like a crawled one."""
    from .functions.udfs import url_parts

    cols = (
        "warc_id binary, record_type string, url string, date long, "
        "payload binary, payload_digest binary, refers_to_date long, profile string"
    )

    def parse_part(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["data"]:
                rows.extend(_rows_from_warc(bytes(blob)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_id", "record_type", "url", "date", "payload",
                    "payload_digest", "refers_to_date", "profile",
                ],
            )

    parsed = files.select("data").mapInPandas(parse_part, cols)
    p = url_parts(F.col("url"))
    return parsed.select(
        "warc_id", "record_type", "url", "date",
        p["origin_id"].alias("origin_id"), p["path_id"].alias("path_id"),
        "payload", "payload_digest", "refers_to_date", "profile",
        F.lit(None).cast("string").alias("etag"),
        F.lit(None).cast("string").alias("last_modified"),
    )
