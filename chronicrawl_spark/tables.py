"""Versioned crawl-state tables — an Iceberg-MERGE analog on plain parquet.

The reference keeps all state in 12 SQLite tables (``Database.java:55-64``,
``schema.sql``) with single-writer transactions.  The Spark-native design is
snapshot-versioned tables with partition-level copy-on-write:

- **Mutable tables** (``origins``, ``frontier``, ``sitemap_entries``) are
  hash-bucketed by ``origin_id`` (``bucket = pmod(origin_id, B)`` — the
  xxh64 keyspace is uniform, ref ``Url.java:30-50``, so buckets are even).
  A wave's MERGE rewrites **only the buckets its delta touches**; untouched
  buckets keep their prior version files.  This is exactly the shape of an
  Iceberg copy-on-write ``MERGE INTO`` with ``bucket(N, origin_id)``
  partitioning, and is what makes a 10^10-row frontier updatable without
  rewriting a terabyte per wave.
- **Append-only tables** (``visits``, ``warc_records``, ``metrics``,
  ``lineage``) append one directory per wave (Iceberg append snapshot).
- A JSON **manifest** pins, per table, which version each bucket reads and
  which waves are committed.  ``commit(wave)`` atomically publishes the
  manifest (tmp + rename) *after* all data writes succeed — a crash
  mid-wave leaves the previous snapshot intact (orphan files are ignored,
  vacuum-style cleanup applies).  ``manifest-{wave}.json`` history =
  snapshot tags; resume = load any committed wave (ref semantics: SQLite
  WAL crash-safety + "resume = read latest snapshot").

In the sandbox there is no Iceberg runtime jar; on a real cluster this
module's API maps 1:1 onto Iceberg tables (``MERGE INTO`` / snapshot tags)
and the engine above it would not change.
"""

from __future__ import annotations

import json
import os
import shutil
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- schemas
# FIXTURES.md §2 / reference schema.sql — epoch-millis int64 timestamps for
# exact parity (Database.java:70-78); string enums replace tiny dim tables.

ORIGINS_SCHEMA = T.StructType(
    [
        T.StructField("origin_id", T.LongType(), False),
        T.StructField("origin", T.StringType(), False),
        T.StructField("discovered", T.LongType(), False),
        T.StructField("crawl_policy", T.StringType(), False),  # FORBIDDEN|TRANSCLUSIONS|CONTINUOUS
        T.StructField("last_visit", T.LongType(), True),
        T.StructField("next_visit", T.LongType(), True),  # NULL = parked (Crawl.java:123-126)
        T.StructField("robots_crawl_delay", T.ShortType(), True),
        T.StructField("robots_txt", T.BinaryType(), True),
    ]
)

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("origin_id", T.LongType(), False),
        T.StructField("path_id", T.LongType(), False),
        T.StructField("path", T.StringType(), False),  # pathref
        T.StructField("location_type", T.StringType(), False),  # PAGE|TRANSCLUSION|SITEMAP|ROBOTS
        T.StructField("depth", T.ShortType(), False),
        T.StructField("via_origin_id", T.LongType(), True),
        T.StructField("via_path_id", T.LongType(), True),
        T.StructField("discovered", T.LongType(), False),
        T.StructField("last_visit", T.LongType(), True),
        T.StructField("next_visit", T.LongType(), True),
    ]
)

VISITS_SCHEMA = T.StructType(
    [
        T.StructField("origin_id", T.LongType(), False),
        T.StructField("path_id", T.LongType(), False),
        T.StructField("date", T.LongType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("status", T.ShortType(), False),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("warc_id", T.BinaryType(), True),
        T.StructField("request_position", T.LongType(), True),
        T.StructField("request_length", T.LongType(), True),
        T.StructField("response_position", T.LongType(), True),
        T.StructField("response_length", T.LongType(), True),
        T.StructField("response_payload_digest", T.BinaryType(), True),  # truncated sha1[:8]
        T.StructField("revisit_of_date", T.LongType(), True),
    ]
)

WARC_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("warc_id", T.BinaryType(), False),
        T.StructField("record_type", T.StringType(), False),  # request|response|revisit
        T.StructField("url", T.StringType(), False),
        T.StructField("date", T.LongType(), False),
        T.StructField("origin_id", T.LongType(), False),
        T.StructField("path_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("payload_digest", T.BinaryType(), True),  # full sha1 (20 bytes)
        T.StructField("refers_to_date", T.LongType(), True),  # revisit pointer
        T.StructField("profile", T.StringType(), True),  # revisit profile
        # response header capture (the reference re-reads ETag/Last-Modified
        # from the stored WARC response for conditional GETs,
        # Exchange.java:104-119)
        T.StructField("etag", T.StringType(), True),
        T.StructField("last_modified", T.StringType(), True),
    ]
)

SITEMAP_ENTRIES_SCHEMA = T.StructType(
    [
        T.StructField("origin_id", T.LongType(), False),
        T.StructField("path_id", T.LongType(), False),
        T.StructField("sitemap_origin_id", T.LongType(), False),
        T.StructField("sitemap_path_id", T.LongType(), False),
        T.StructField("changefreq", T.StringType(), True),
        T.StructField("priority", T.FloatType(), True),
        T.StructField("lastmod", T.StringType(), True),
    ]
)

RULES_SCHEMA = T.StructType(
    [
        T.StructField("origin_id", T.LongType(), False),
        T.StructField("pattern", T.StringType(), False),
        T.StructField("schedule_id", T.LongType(), True),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.LongType(), False),
        T.StructField("wave_ts", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("visits", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("errors", T.LongType(), False),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.LongType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("rows", T.LongType(), True),
        T.StructField("buckets_rewritten", T.IntegerType(), True),
    ]
)

MUTABLE_TABLES = {
    "origins": (ORIGINS_SCHEMA, ["origin_id"]),
    "frontier": (FRONTIER_SCHEMA, ["origin_id", "path_id"]),
    # keyed on the entry URL only: the reference's insertOrReplace deletes by
    # (origin_id, path_id) before inserting (Database.java:340-343) — the
    # last sitemap to mention a URL wins, one row per URL.
    "sitemap_entries": (SITEMAP_ENTRIES_SCHEMA, ["origin_id", "path_id"]),
    "rules": (RULES_SCHEMA, ["origin_id", "pattern"]),
}
# S11 (Database.java:455-474, Exchange.java:198-201): screenshot blobs per
# visited location.  The producer in the reference is the headless browser
# (S8, out of sandbox scope); the sink + newest-K expiry + W8 recency view
# are fully implemented over this table (screenshots.py).
SCREENSHOTS_SCHEMA = T.StructType(
    [
        T.StructField("origin_id", T.LongType(), False),
        T.StructField("path_id", T.LongType(), False),
        T.StructField("date", T.LongType(), False),
        T.StructField("screenshot", T.BinaryType(), True),
        T.StructField("thumbnail", T.BinaryType(), True),
    ]
)

APPEND_TABLES = {
    "visits": VISITS_SCHEMA,
    "warc_records": WARC_RECORDS_SCHEMA,
    "metrics": METRICS_SCHEMA,
    "lineage": LINEAGE_SCHEMA,
    "screenshots": SCREENSHOTS_SCHEMA,
}

# Append tables also bucketed by pmod(origin_id, B) — the Spark analog of the
# reference's (origin_id, path_id, date) SQLite indexes (schema.sql:131,139):
# per-wave J6/J7 history lookups scan only the wave's buckets instead of the
# whole table.  Manifest records which buckets each wave wrote (Iceberg
# manifest-file analog) so reads never list directories at scale.
BUCKETED_APPEND = {"visits", "warc_records", "screenshots"}


class StateStore:
    """Snapshot-versioned parquet state store (Iceberg-COW analog)."""

    def __init__(self, spark: SparkSession, root: str, buckets: int = 32):
        self.spark = spark
        self.root = root
        self.buckets = buckets
        os.makedirs(root, exist_ok=True)
        self.manifest = self._load_manifest()
        # staged (uncommitted) manifest mutations for the in-flight wave
        self._staged = json.loads(json.dumps(self.manifest))
        self.last_merge_stats: dict = {}
        # staged-manifest mutations may come from concurrent sink threads
        # (the wave runs independent table writes in parallel)
        self._mlock = threading.Lock()

    # ------------------------------------------------------------ manifest
    def _manifest_path(self, wave: int | None = None) -> str:
        name = "manifest.json" if wave is None else f"manifest-{wave}.json"
        return os.path.join(self.root, name)

    def _load_manifest(self) -> dict:
        p = self._manifest_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {
            "committed_wave": -1,
            "buckets": self.buckets,
            "mutable": {t: {} for t in MUTABLE_TABLES},  # bucket(str) -> version(int)
            "append": {t: [] for t in APPEND_TABLES},  # committed wave ids
            "next_version": {t: 0 for t in MUTABLE_TABLES},
        }

    def commit(self, wave: int) -> None:
        """Atomically publish all staged writes as snapshot ``wave``."""
        self._staged["committed_wave"] = wave
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._staged, f)
        shutil.copy(tmp, self._manifest_path(wave))  # snapshot tag
        os.replace(tmp, self._manifest_path())  # atomic publish
        self.manifest = json.loads(json.dumps(self._staged))

    def rollback_staged(self) -> None:
        self._staged = json.loads(json.dumps(self.manifest))

    @property
    def committed_wave(self) -> int:
        return self.manifest["committed_wave"]

    def resume_from(self, wave: int) -> None:
        """Reset the live manifest to snapshot ``wave`` (checkpoint resume)."""
        with open(self._manifest_path(wave)) as f:
            m = json.load(f)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path())
        self.manifest = m
        self._staged = json.loads(json.dumps(m))

    # ------------------------------------------------------------ reads
    def _empty(self, schema: T.StructType) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    def read(self, table: str) -> DataFrame:
        """Current snapshot of a table (committed manifest, not staged)."""
        return self._read_from(self.manifest, table)

    def read_staged(self, table: str) -> DataFrame:
        """In-flight view: committed snapshot + this wave's staged writes."""
        return self._read_from(self._staged, table)

    def set_clock(self, ms: int) -> None:
        """Stage the engine's virtual clock; published with the wave commit
        so snapshot resume restores it turnkey (the reference's clock is
        implicit in its SQLite state)."""
        self._staged["clock"] = ms

    def log_lineage(self, wave: int, rows: list) -> None:
        """Per-wave lineage rows live in the manifest (Iceberg
        snapshot-summary analog) — queryable via ``read("lineage")`` without
        costing a parquet write job per wave."""
        self._staged.setdefault("lineage", []).extend(list(r) for r in rows)

    def _read_from(self, manifest: dict, table: str) -> DataFrame:
        if table == "lineage":
            rows = [tuple(r) for r in manifest.get("lineage", [])]
            return self.spark.createDataFrame(rows, LINEAGE_SCHEMA) if rows else self._empty(LINEAGE_SCHEMA)
        if table in MUTABLE_TABLES:
            schema, _ = MUTABLE_TABLES[table]
            bmap: dict = manifest["mutable"][table]
            if not bmap:
                return self._empty(schema)
            # group buckets by version → one scan per version, pruned to its buckets
            by_ver: dict[int, list[str]] = {}
            for b, v in bmap.items():
                by_ver.setdefault(v, []).append(b)
            paths = []
            for v, bs in by_ver.items():
                for b in bs:
                    paths.append(os.path.join(self.root, table, f"v{v}", f"bucket={b}"))
            df = self.spark.read.schema(schema).parquet(*paths)
            return df
        return self._read_append(manifest, table, None)

    def _read_append(self, manifest: dict, table: str, buckets) -> DataFrame:
        """Append-table scan, optionally pruned to a bucket subset (J6/J7
        read only the buckets the current wave touches)."""
        schema = APPEND_TABLES[table]
        # .get: manifests written before a table existed simply read empty
        waves = manifest["append"].get(table, [])
        if not waves:
            return self._empty(schema)
        bmap = manifest.get("append_buckets", {}).get(table, {})
        want = None if buckets is None else {int(b) for b in buckets}
        paths = []
        for w in waves:
            bl = bmap.get(str(w))
            if bl is None:  # legacy unbucketed wave dir — cannot prune
                paths.append(os.path.join(self.root, table, f"wave={w}"))
                continue
            for b in bl:
                if want is None or int(b) in want:
                    paths.append(os.path.join(self.root, table, f"wave={w}", f"bucket={b}"))
        if not paths:
            return self._empty(schema)
        return self.spark.read.schema(schema).parquet(*paths)

    def read_pruned(self, table: str, buckets) -> DataFrame:
        """Committed snapshot of an append table restricted to ``buckets``
        (values of ``pmod(origin_id, B)``).  Equivalent to ``read`` filtered
        on bucket, but prunes at the file-listing level — the 10^10-row
        history never hits the scan."""
        return self._read_append(self.manifest, table, buckets)

    # ------------------------------------------------------------ writes
    def _bucket_col(self, df: DataFrame, table: str):
        return F.pmod(F.col("origin_id"), F.lit(self.buckets)).cast("int")

    def append(self, table: str, df: DataFrame, wave: int) -> None:
        """Append-only snapshot write (Iceberg append analog).

        ``BUCKETED_APPEND`` tables land under ``wave=N/bucket=B`` with one
        file per bucket; the bucket list is recorded in the manifest so
        ``read_pruned`` prunes by file list, never by directory listing.
        """
        schema = APPEND_TABLES[table]
        out = df.select([F.col(f.name).cast(f.dataType) for f in schema.fields])
        par = self.spark.sparkContext.defaultParallelism
        path = os.path.join(self.root, table, f"wave={wave}")
        if table in BUCKETED_APPEND:
            out = out.withColumn("bucket", self._bucket_col(out, table))
            if table in ("warc_records", "screenshots"):
                # payload-heavy: avoid a full-body shuffle — sort within the
                # existing partitions; ≤1 file per (task, bucket)
                out = out.sortWithinPartitions("bucket")
            else:
                # narrow rows: hash-repartition → ≤1 file per bucket per wave
                out = out.repartition(self.buckets, "bucket")
            out.write.mode("overwrite").partitionBy("bucket").parquet(path)
            written = sorted(
                int(d.split("=", 1)[1])
                for d in os.listdir(path)
                if d.startswith("bucket=")
            )
            with self._mlock:
                self._staged.setdefault("append_buckets", {}).setdefault(table, {})[str(wave)] = written
        else:
            # cap output tasks/files: upstream unions multiply partitions
            if out.rdd.getNumPartitions() > par:
                out = out.coalesce(par)
            out.write.mode("overwrite").parquet(path)  # idempotent on wave retry
        with self._mlock:
            staged = self._staged["append"].setdefault(table, [])
            if wave not in staged:
                staged.append(wave)

    def replace_append(self, table: str, df: DataFrame, wave: int) -> None:
        """Maintenance rewrite of an append table (retention expiry): write
        ``df`` as the table's single snapshot wave, dropping all prior wave
        dirs from the manifest (Iceberg rewrite-data-files analog)."""
        self.append(table, df, wave)
        with self._mlock:
            self._staged["append"][table] = [wave]
            ab = self._staged.get("append_buckets", {}).get(table)
            if ab is not None:
                keep = ab.get(str(wave))
                ab.clear()
                if keep is not None:
                    ab[str(wave)] = keep

    def merge(
        self,
        table: str,
        delta: DataFrame,
        mode: str = "upsert",
    ) -> int:
        """Partition-level copy-on-write MERGE (Iceberg ``MERGE INTO`` analog).

        mode='upsert'      → WHEN MATCHED UPDATE (delta row wins) + INSERT
        mode='insert_if_absent' → WHEN NOT MATCHED INSERT (existing row wins;
                              the reference's tryInsert, ``Database.java:186-200``)

        Only buckets present in the delta are rewritten.  Returns the number
        of buckets rewritten (lineage metric); per-mode/tag row counts land
        in ``self.last_merge_stats``.
        """
        if mode == "upsert":
            st = self._merge_cow(table, upsert=delta, insert=None)
        elif mode == "insert_if_absent":
            st = self._merge_cow(table, upsert=None, insert=delta)
        else:
            raise ValueError(mode)
        return st["buckets"]

    def merge_mixed(self, table: str, upsert: DataFrame, insert: DataFrame) -> dict:
        """One COW pass combining an UPDATE delta and an INSERT-IF-ABSENT
        delta (one bucket-discovery job + one write instead of two of each).
        An insert key colliding with an existing row OR an upsert key is
        dropped (existing/updated row wins — tryInsert semantics).  Returns
        ``last_merge_stats``."""
        return self._merge_cow(table, upsert=upsert, insert=insert)

    def _merge_cow(self, table: str, upsert: DataFrame | None, insert: DataFrame | None) -> dict:
        """Shared COW merge core.

        Deltas may carry an optional ``__tag`` string column: row counts per
        (mode, tag) are collected in the same job that discovers touched
        buckets and reported in ``last_merge_stats["rows_by_tag"]`` — callers
        get per-subset counts (parked / discovered / …) without extra
        actions.
        """
        schema, keys = MUTABLE_TABLES[table]
        cols = [f.name for f in schema.fields]

        def _prep(df: DataFrame, iia: bool) -> DataFrame:
            tag = F.col("__tag") if "__tag" in df.columns else F.lit(None).cast("string")
            return df.select(
                *[F.col(f.name).cast(f.dataType) for f in schema.fields],
                tag.alias("__tag"),
            ).withColumn("__iia", F.lit(iia))

        parts = []
        if upsert is not None:
            parts.append(_prep(upsert, False))
        if insert is not None:
            parts.append(_prep(insert, True))
        delta = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        delta = delta.withColumn("__bucket", self._bucket_col(delta, table))
        # evaluated twice (bucket discovery + write) — cache to avoid
        # recomputing upstream UDF stages
        delta = delta.persist()
        # the wave delta is small relative to the table — one job collects
        # touched buckets AND per-(mode, tag) row counts
        counts = delta.groupBy("__bucket", "__iia", "__tag").count().collect()
        touched = sorted({r["__bucket"] for r in counts})
        rows_by_tag: dict = {}
        up_rows = ins_rows = 0
        for r in counts:
            key = r["__tag"] or ("insert" if r["__iia"] else "upsert")
            rows_by_tag[key] = rows_by_tag.get(key, 0) + r["count"]
            if r["__iia"]:
                ins_rows += r["count"]
            else:
                up_rows += r["count"]
        stats = {
            "buckets": len(touched),
            "upsert_rows": up_rows,
            "insert_rows": ins_rows,
            "rows_by_tag": rows_by_tag,
        }
        self.last_merge_stats = stats
        if not touched:
            delta.unpersist()
            return stats
        with self._mlock:
            bmap: dict = self._staged["mutable"][table]
            by_ver: dict[int, list[str]] = {}
            for b in touched:
                sb = str(b)
                if sb in bmap:
                    by_ver.setdefault(bmap[sb], []).append(sb)
        if by_ver:
            paths = [
                os.path.join(self.root, table, f"v{v}", f"bucket={b}")
                for v, bs in by_ver.items()
                for b in bs
            ]
            current = self.spark.read.schema(schema).parquet(*paths)
        else:
            current = self._empty(schema)

        ups = delta.filter(~F.col("__iia")).select(cols)
        ins = delta.filter(F.col("__iia")).select(cols)
        # wave deltas are millions of keys — broadcasting them would funnel
        # the whole delta through the driver (collect + hash build, serial).
        # shuffle_hash keeps the anti-joins fully parallel and avoids the
        # sort-merge sort as well.
        merged = current
        if up_rows:
            merged = current.join(
                ups.select(keys).distinct().hint("shuffle_hash"), keys, "left_anti"
            ).unionByName(ups)
        if ins_rows:
            new_rows = ins.join(
                current.select(keys).distinct().hint("shuffle_hash"), keys, "left_anti"
            )
            if up_rows:
                # updated keys are existing rows — tryInsert loses to them too
                new_rows = new_rows.join(
                    ups.select(keys).distinct().hint("shuffle_hash"), keys, "left_anti"
                )
            # first-wins within the delta itself (duplicate discoveries in one wave)
            merged = merged.unionByName(new_rows.dropDuplicates(keys))

        with self._mlock:
            version = self._staged["next_version"][table]
            self._staged["next_version"][table] = version + 1
        out = merged.withColumn("bucket", F.pmod(F.col("origin_id"), F.lit(self.buckets)).cast("int"))
        target = os.path.join(self.root, table, f"v{version}")
        # one write partition per touched bucket: 32 tasks keep 16+ cores
        # busy; capping at defaultParallelism starved the 4N cluster
        (
            out.repartition(max(1, len(touched)), "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(target)
        )
        delta.unpersist()
        with self._mlock:
            for b in touched:
                bmap[str(b)] = version
        return stats

    def overwrite(self, table: str, df: DataFrame) -> int:
        """Full-table rewrite (seeding / small dimension tables)."""
        return self.merge(table, df, mode="upsert")
