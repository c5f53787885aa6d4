"""Versioned crawl-state tables — an Iceberg merge-on-read analog on parquet.

The reference keeps all state in 12 SQLite tables (``Database.java:55-64``,
``schema.sql``) with single-writer transactions.  The Spark-native design is
snapshot-versioned tables with bucket-level **merge-on-read** (MoR):

- **Mutable tables** (``origins``, ``frontier``, ``sitemap_entries``) are
  hash-bucketed by ``origin_id`` (``bucket = pmod(origin_id, B)`` — the
  xxh64 keyspace is uniform, ref ``Url.java:30-50``, so buckets are even).
  A wave's MERGE writes **only a delta file per touched bucket** (the
  upsert/insert rows themselves — O(delta), never O(table)); ``read()``
  merges base + delta chain with a newest-wins resolution.  This is the
  Iceberg MoR / equality-delete shape: with uniform hash keys a large wave
  touches every bucket, so the old copy-on-write rewrite was O(frontier)
  per wave — MoR makes the per-wave write cost proportional to the wave.
- **Compaction** (Iceberg ``rewrite_data_files``): when a bucket's delta
  chain exceeds ``delta_chain_k``, its chain is folded into a new base
  file.  With every-bucket waves this amortizes to one full rewrite per
  ``K+1`` waves instead of one per wave.
- **Resolution** is adaptive: if the outstanding delta rows fit a broadcast
  (``delta_broadcast_rows``), the base scan is split with broadcast
  anti/semi joins on the delta keys — the untouched-key branch keeps
  filter pushdown and costs **zero shuffle of the base**; only the
  overlapping keys + deltas go through a small newest-wins window.  Past
  the threshold it falls back to one window over base∪deltas (one table
  shuffle — on a real cluster this is where Iceberg's storage-partitioned
  join would keep the merge bucket-local).
- **Append-only tables** (``visits``, ``warc_records``, ``metrics``,
  ``screenshots``) append one directory per wave (Iceberg append snapshot).
- A JSON **manifest** pins, per table, the base version and delta chain of
  each bucket and which waves are committed.  ``commit(wave)`` atomically
  publishes the manifest (tmp + rename) *after* all data writes succeed — a
  crash mid-wave leaves the previous snapshot intact (orphan files are
  ignored, vacuum-style cleanup applies).  ``manifest-{wave}.json`` history
  = snapshot tags; resume = load any committed wave (ref semantics: SQLite
  WAL crash-safety + "resume = read latest snapshot").

Merge semantics (matching the reference's row ops):

- ``upsert`` = WHEN MATCHED UPDATE + WHEN NOT MATCHED INSERT
  (``Database.java:253-258`` UPDATE / insertOrReplace).
- ``insert_if_absent`` = WHEN NOT MATCHED INSERT, existing row wins
  (the reference's tryInsert, ``Database.java:186-200``).
- There is no delete op (the reference never deletes from these tables),
  so MoR needs no tombstones: newest-wins resolution is
  ``latest upsert > base > earliest insert`` per key.

In the sandbox there is no Iceberg runtime jar; on a real cluster this
module's API maps 1:1 onto Iceberg MoR tables (``MERGE INTO`` with
``write.merge.mode=merge-on-read`` + snapshot tags) and the engine above it
would not change.
"""

from __future__ import annotations

import functools
import json
import os
import re
import shutil
import threading

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

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

# Base-file data clustering (Iceberg sort-order analog): rows inside each
# bucket file of a mutable BASE version are sorted by these columns so the
# parquet row-group min/max stats become selective for the table's hot read
# predicate.  frontier/origins cluster on ``next_visit``: the wave-select
# due filter (next_visit <= T) then skips the row groups holding
# not-yet-due rows — nearly the whole table in steady state (a 10^10-row
# frontier has ~5M due rows per wave).  The due filter commutes with the
# MoR resolve on the preserved side of the broadcast anti-join, so the
# predicate reaches these stats (pushdown pinned in tests/test_plans.py).
# Key-ordered clustering serves the other tables' point/range lookups.
MUTABLE_CLUSTER = {
    "origins": ["next_visit"],
    "frontier": ["next_visit"],
    "sitemap_entries": ["origin_id", "path_id"],
    "rules": ["origin_id"],
}
# Base writes cap the parquet row-group size so min/max skipping has
# granularity at sandbox file sizes too (at the 128 MiB default a bucket
# file below ~5M narrow rows is a single row group — nothing to skip).
BASE_ROWGROUP_BYTES = 8 * 1024 * 1024
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

# manifest lineage is re-serialized on every commit — cap it (rows are per
# (table, wave): 2-4/wave, so 20k rows ≈ 5k waves of history)
LINEAGE_CAP = 20_000


class StateStore:
    """Snapshot-versioned parquet state store (Iceberg merge-on-read analog).

    ``delta_chain_k``: compact a bucket's delta chain into a new base file
    once it exceeds this length (amortized full rewrite every K+1 merges).
    ``delta_broadcast_rows``: while the table's outstanding delta rows are
    below this, reads resolve via broadcast anti/semi joins (no base
    shuffle, base-side filter pushdown intact); above it, via one
    newest-wins window over base∪deltas.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        buckets: int = 32,
        delta_chain_k: int = 8,
        delta_broadcast_rows: int = 1_000_000,
        mor_window_base_bytes: int = 64 * 1024 * 1024,
    ):
        self.spark = spark
        self.root = root
        self.buckets = buckets
        self.delta_chain_k = int(os.environ.get("CHRONICRAWL_DELTA_CHAIN_K", delta_chain_k))
        self.delta_broadcast_rows = int(
            os.environ.get("CHRONICRAWL_DELTA_BCAST_ROWS", delta_broadcast_rows)
        )
        # MoR resolve shape gate: bases at or below this physical size take
        # the single newest-wins window (one small shuffle, ~3 fewer
        # sequential stages than the broadcast split — measured ~0.5 s/wave
        # at bench scale); bigger bases keep the broadcast anti/semi split
        # whose point is never shuffling a 10^10-row base.
        self.mor_window_base_bytes = int(
            os.environ.get("CHRONICRAWL_MOR_WINDOW_BASE_BYTES", mor_window_base_bytes)
        )
        os.makedirs(root, exist_ok=True)
        self.manifest = self._load_manifest()
        # reopening an existing store: the manifest's bucket count wins over
        # the constructor arg (Iceberg analog: partition spec lives in table
        # metadata, not in the reader) — a mismatched arg would silently
        # mis-bucket every merge/prune against the on-disk layout
        self.buckets = int(self.manifest.get("buckets", self.buckets))
        # staged (uncommitted) manifest mutations for the in-flight wave
        self._staged = json.loads(json.dumps(self.manifest))
        self.last_merge_stats: dict = {}
        # staged-manifest mutations may come from concurrent sink threads
        # (the wave runs independent table writes in parallel)
        self._mlock = threading.Lock()
        # read-plan memo: building a mutable read re-lists every
        # base/delta file on the DRIVER (InMemoryFileIndex) and re-derives
        # the resolve plan — with 32 buckets × chain versions × several
        # reads per wave that serial driver cost dominated small waves.
        # Keyed by a state epoch bumped on every write/commit, so a cached
        # DataFrame always reflects the exact file set it was built from.
        self._epoch = 0
        self._read_memo: dict = {}
        # physical-size memo for table_bytes: keyed by the exact version
        # set a size was computed from, so unchanged versions are never
        # re-walked (true DataFile.file_size_in_bytes manifest analog —
        # per-wave broadcast gating must not degrade into a full-tree
        # stat scan as state-store file counts grow)
        self._size_memo: dict = {}

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
            "mutable": {t: {} for t in MUTABLE_TABLES},  # bucket(str) -> base version(int)
            # bucket(str) -> ordered delta-version chain (MoR)
            "mutable_deltas": {t: {} for t in MUTABLE_TABLES},
            # version(str) -> delta row count (drives broadcast-vs-window resolve)
            "delta_rows": {t: {} for t in MUTABLE_TABLES},
            "append": {t: [] for t in APPEND_TABLES},  # committed wave ids
            "next_version": {t: 0 for t in MUTABLE_TABLES},
        }

    def _bump_epoch(self) -> None:
        self._epoch += 1
        self._read_memo.clear()

    def commit(self, wave: int) -> None:
        """Atomically publish all staged writes as snapshot ``wave``."""
        self._bump_epoch()
        self._staged["committed_wave"] = wave
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._staged, f)
        shutil.copy(tmp, self._manifest_path(wave))  # snapshot tag
        os.replace(tmp, self._manifest_path())  # atomic publish
        self.manifest = json.loads(json.dumps(self._staged))

    def rollback_staged(self) -> None:
        self._bump_epoch()
        self._staged = json.loads(json.dumps(self.manifest))

    def has_staged_changes(self) -> bool:
        """True if uncommitted writes are staged (mid-wave state)."""
        return self._staged != self.manifest

    @property
    def committed_wave(self) -> int:
        return self.manifest["committed_wave"]

    def resume_from(self, wave: int) -> None:
        """Reset the live manifest to snapshot ``wave`` (checkpoint resume)."""
        self._bump_epoch()
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
        # NOT createDataFrame([], schema): that builds an ExistingRDD scan
        # with UNKNOWN size stats, so any join against a not-yet-written
        # table plans sort-merge (the planner assumes worst-case size).
        # range(0) is a zero-size LocalTableScan — joins against it
        # broadcast, and Catalyst can fold the empty relation away.
        z = self.spark.range(0)
        return z.select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields]
        )

    def _memo(self, key, build) -> DataFrame:
        hit = self._read_memo.get(key)
        if hit is None:
            hit = build()
            self._read_memo[key] = hit
        return hit

    def read(self, table: str) -> DataFrame:
        """Current snapshot of a table (committed manifest, not staged).
        Mutable tables resolve newest-wins over base + delta chains."""
        return self._memo(
            (table, "c", self._epoch), lambda: self._read_from(self.manifest, table)
        )

    def read_staged(self, table: str) -> DataFrame:
        """In-flight view: committed snapshot + this wave's staged writes."""
        return self._memo(
            (table, "s", self._epoch), lambda: self._read_from(self._staged, table)
        )

    def table_bytes(self, table: str, staged: bool = False) -> int:
        """Physical bytes of a mutable table's CURRENT base + delta files —
        driver-side manifest metadata (os file sizes), no Spark job.  The
        Iceberg analog is summing DataFile.file_size_in_bytes from the
        snapshot manifest.  Used to size-gate broadcast-join hints: at
        sandbox scale dimension tables broadcast explicitly (AQE's runtime
        conversion still materializes the big side's shuffle first —
        measured 2× on wave selection); past the gate no hint is planted
        and AQE/SMJ take over."""
        manifest = self._staged if staged else self.manifest
        total = 0
        bmap = manifest.get("mutable", {}).get(table, {})
        for b, v in bmap.items():
            total += self._du_version_bytes(table, v, b)
        dmap = manifest.get("mutable_deltas", {}).get(table, {})
        for v in {v for chain in dmap.values() for v in chain}:
            total += self._du_memo(
                (table, "d", v), os.path.join(self.root, table, f"d{v}")
            )
        return total

    @staticmethod
    def _du(path: str) -> int:
        n = 0
        for dirpath, _dirs, files in os.walk(path):
            for f in files:
                try:
                    n += os.path.getsize(os.path.join(dirpath, f))
                except OSError:
                    pass
        return n

    def _du_memo(self, key: tuple, path: str) -> int:
        # data files under a (table, version) dir are immutable once
        # written (COW versions / append deltas), so a measured size
        # stays valid for the store's lifetime
        n = self._size_memo.get(key)
        if n is None:
            n = self._du(path)
            self._size_memo[key] = n
        return n

    def _du_version_bytes(self, table: str, v, b) -> int:
        return self._du_memo(
            (table, "v", v, b), os.path.join(self.root, table, f"v{v}", f"bucket={b}")
        )

    def set_clock(self, ms: int) -> None:
        """Stage the engine's virtual clock; published with the wave commit
        so snapshot resume restores it turnkey (the reference's clock is
        implicit in its SQLite state)."""
        self._staged["clock"] = ms

    def save_bloom(self, planes, meta: dict) -> None:
        """Stage the URL-seen bloom planes as a store-managed blob.

        The filter is derived state (rebuildable from the frontier), but at
        10^10 keys the rebuild is a full-corpus scan — persisting the ~MBs
        of planes next to the manifest makes restart/resume O(planes), not
        O(frontier).  Published atomically with the wave commit: the staged
        pointer only becomes visible via ``commit``, and ``load_bloom``
        ignores planes whose sizing params don't match the engine config.
        Old plane files are reclaimed by ``vacuum`` like any other
        unreferenced data file."""
        import numpy as np

        d = os.path.join(self.root, "bloom")
        os.makedirs(d, exist_ok=True)
        # next version past BOTH the staged pointer and any file on disk —
        # a resume_from() fork must not clobber a file an older snapshot
        # tag still references
        existing = [
            int(m.group(1))
            for f in os.listdir(d)
            if (m := re.fullmatch(r"planes-(\d+)\.npy", f))
        ]
        ver = max(
            [int(self._staged.get("bloom", {}).get("ver", -1))] + existing
        ) + 1
        fname = f"planes-{ver}.npy"
        np.save(os.path.join(d, fname), planes)
        self._staged["bloom"] = {"ver": ver, "file": fname, **meta}

    def load_bloom(self, expected_meta: dict):
        """Committed bloom planes, or None if absent / params mismatch /
        file vacuumed away (caller falls back to a full rebuild)."""
        import numpy as np

        m = self.manifest.get("bloom")
        if not m:
            return None
        if any(m.get(k) != v for k, v in expected_meta.items()):
            return None
        p = os.path.join(self.root, "bloom", m["file"])
        if not os.path.exists(p):
            return None
        return np.load(p)

    def log_lineage(self, wave: int, rows: list) -> None:
        """Per-wave lineage rows live in the manifest (Iceberg
        snapshot-summary analog) — queryable via ``read("lineage")`` without
        costing a parquet write job per wave.  Capped at ``LINEAGE_CAP``
        rows (oldest dropped) so the manifest stays O(1) per commit."""
        lin = self._staged.setdefault("lineage", [])
        lin.extend(list(r) for r in rows)
        if len(lin) > LINEAGE_CAP:
            del lin[: len(lin) - LINEAGE_CAP]
        self._bump_epoch()

    def _read_from(self, manifest: dict, table: str) -> DataFrame:
        if table == "lineage":
            rows = [tuple(r) for r in manifest.get("lineage", [])]
            mdf = (
                self.spark.createDataFrame(rows, LINEAGE_SCHEMA)
                if rows
                else self._empty(LINEAGE_SCHEMA)
            )
            # pre-upgrade manifests recorded lineage as append-wave parquet —
            # union the legacy dirs so old stores keep their history
            if manifest["append"].get("lineage"):
                mdf = mdf.unionByName(self._read_append(manifest, "lineage", None))
            return mdf
        if table in MUTABLE_TABLES:
            return self._read_mutable(manifest, table)
        return self._read_append(manifest, table, None)

    # ---- mutable (MoR) read path
    def _base_scan(self, table: str, bmap: dict, schema: T.StructType) -> DataFrame:
        """One pruned scan over base files ``bucket -> version``."""
        paths = [
            os.path.join(self.root, table, f"v{v}", f"bucket={b}") for b, v in bmap.items()
        ]
        return self.spark.read.schema(schema).parquet(*paths)

    def _delta_scan(self, manifest: dict, table: str, buckets: list) -> DataFrame:
        """Union of delta-chain files for ``buckets``, tagged with the
        resolution columns ``__kind`` (2=upsert, 0=insert) and ``__ver``.

        Delta versions are written as a FEW size-targeted files with
        ``__bucket`` as a plain column (NOT dir-partitioned): a delta is
        read whole by every resolve anyway, and one-file-per-bucket-
        per-version made small waves pay 32× the file-open/task floor in
        every broadcast subjob (measured: ~9 s/wave at 100k-row scale).
        Bucket-subset restriction (compaction of a chain subset) filters on
        the column instead of pruning paths."""
        schema, _ = MUTABLE_TABLES[table]
        dmap = manifest.get("mutable_deltas", {}).get(table, {})
        dschema = T.StructType(
            list(schema.fields)
            + [
                T.StructField("__iia", T.BooleanType(), True),
                T.StructField("__bucket", T.IntegerType(), True),
            ]
        )
        cols = [f.name for f in schema.fields]
        all_buckets = set(range(self.buckets))
        frames = []
        for v in sorted({v for b in buckets for v in dmap.get(b, [])}):
            live = [int(b) for b in buckets if v in dmap.get(b, [])]
            df = self.spark.read.schema(dschema).parquet(
                os.path.join(self.root, table, f"d{v}")
            )
            if set(live) != all_buckets:
                df = df.filter(F.col("__bucket").isin(live))
            frames.append(
                df.select(
                    *cols,
                    F.when(F.col("__iia"), F.lit(0)).otherwise(F.lit(2)).alias("__kind"),
                    F.lit(v).alias("__ver"),
                )
            )
        return functools.reduce(DataFrame.unionByName, frames)

    @staticmethod
    def _resolve_newest_wins(tagged: DataFrame, keys: list, cols: list) -> DataFrame:
        """Winner per key over __kind/__ver-tagged rows: latest upsert beats
        base beats earliest insert (an insert only ever landed when no row
        existed; a later insert on a present key was a no-op — tryInsert)."""
        w = Window.partitionBy(*keys).orderBy(
            F.col("__kind").desc(),
            F.when(F.col("__kind") == 2, F.col("__ver")).otherwise(-F.col("__ver")).desc(),
        )
        return (
            tagged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(cols)
        )

    def _read_mutable(self, manifest: dict, table: str) -> DataFrame:
        schema, keys = MUTABLE_TABLES[table]
        cols = [f.name for f in schema.fields]
        bmap: dict = manifest["mutable"][table]
        dmap: dict = manifest.get("mutable_deltas", {}).get(table, {})
        dirty = sorted((b for b in set(bmap) | set(dmap) if dmap.get(b)), key=int)
        if not bmap and not dirty:
            return self._empty(schema)
        parts = []
        clean = {b: v for b, v in bmap.items() if b not in set(dirty)}
        if clean:
            # buckets with no outstanding deltas: plain pruned scan, full
            # filter pushdown — the steady post-compaction fast path
            parts.append(self._base_scan(table, clean, schema))
        if dirty:
            deltas = self._delta_scan(manifest, table, dirty)
            base_bmap = {b: bmap[b] for b in dirty if b in bmap}
            drows_map = manifest.get("delta_rows", {}).get(table, {})
            vers = {v for b in dirty for v in dmap.get(b, [])}
            # missing counts (legacy manifest) force the window path
            drows = sum(drows_map.get(str(v), self.delta_broadcast_rows + 1) for v in vers)
            base_bytes = sum(
                self._du_version_bytes(table, v, b) for b, v in base_bmap.items()
            )
            if (
                base_bmap
                and drows <= self.delta_broadcast_rows
                and base_bytes > self.mor_window_base_bytes
            ):
                # small outstanding delta: split the base on broadcast delta
                # keys — untouched keys stream straight through (pushdown
                # preserved, zero base shuffle); only overlap∪deltas pay the
                # newest-wins window
                base = self._base_scan(table, base_bmap, schema)
                dkeys = deltas.select(*keys).distinct()
                parts.append(base.join(F.broadcast(dkeys), keys, "left_anti"))
                overlap = (
                    base.join(F.broadcast(dkeys), keys, "left_semi")
                    .withColumn("__kind", F.lit(1))
                    .withColumn("__ver", F.lit(0))
                )
                parts.append(
                    self._resolve_newest_wins(overlap.unionByName(deltas), keys, cols)
                )
            else:
                tagged = deltas
                if base_bmap:
                    tagged = (
                        self._base_scan(table, base_bmap, schema)
                        .withColumn("__kind", F.lit(1))
                        .withColumn("__ver", F.lit(0))
                        .unionByName(deltas)
                    )
                parts.append(self._resolve_newest_wins(tagged, keys, cols))
        return functools.reduce(DataFrame.unionByName, parts)

    def read_keys(self, table: str, cols: list | None = None, staged: bool = False) -> DataFrame:
        """Key-presence view of a mutable table: base ∪ delta rows WITHOUT
        newest-wins resolution (may contain duplicate keys).  Sound for
        existence checks / semi- / anti-joins because merges never delete a
        key — far cheaper than ``read`` (no window, no broadcast join)."""
        schema, keys = MUTABLE_TABLES[table]
        cols = cols or keys
        return self._memo(
            (table, "k", staged, tuple(cols), self._epoch),
            lambda: self._read_keys_build(table, cols, staged),
        )

    def _read_keys_build(self, table: str, cols: list, staged: bool) -> DataFrame:
        manifest = self._staged if staged else self.manifest
        schema, keys = MUTABLE_TABLES[table]
        bmap: dict = manifest["mutable"][table]
        dmap: dict = manifest.get("mutable_deltas", {}).get(table, {})
        dirty = sorted((b for b in set(bmap) | set(dmap) if dmap.get(b)), key=int)
        parts = []
        if bmap:
            parts.append(self._base_scan(table, bmap, schema).select(cols))
        if dirty:
            parts.append(self._delta_scan(manifest, table, dirty).select(cols))
        if not parts:
            return self._empty(schema).select(cols)
        return functools.reduce(DataFrame.unionByName, parts)

    # ---- append read path
    def _read_append(self, manifest: dict, table: str, buckets) -> DataFrame:
        """Append-table scan, optionally pruned to a bucket subset (J6/J7
        read only the buckets the current wave touches)."""
        schema = APPEND_TABLES[table]
        # .get: manifests written before a table existed simply read empty
        waves = manifest["append"].get(table, [])
        if not waves:
            return self._empty(schema)
        bmap = manifest.get("append_buckets", {}).get(table, {})
        bat = manifest.get("append_bucket_at", {}).get(table, {})
        cur = int(manifest.get("buckets", self.buckets))
        want = None if buckets is None else {int(b) for b in buckets}
        paths = []
        for w in waves:
            bl = bmap.get(str(w))
            if bl is None:  # legacy unbucketed wave dir — cannot prune
                paths.append(os.path.join(self.root, table, f"wave={w}"))
                continue
            # want-sets are pmod(origin_id, CURRENT buckets); a wave written
            # under an older (smaller, dividing) count B_w maps exactly:
            # origin % B_w == (origin % cur) % B_w.  Waves with no recorded
            # count predate any rebucket and carry the current count.
            bw = int(bat.get(str(w), cur))
            w_want = want if (want is None or bw == cur) else {v % bw for v in want}
            for b in bl:
                if w_want is None or int(b) in w_want:
                    paths.append(os.path.join(self.root, table, f"wave={w}", f"bucket={b}"))
        if not paths:
            return self._empty(schema)
        return self.spark.read.schema(schema).parquet(*paths)

    def read_pruned(self, table: str, buckets) -> DataFrame:
        """Committed snapshot of an append table restricted to ``buckets``
        (values of ``pmod(origin_id, B)``).  Equivalent to ``read`` filtered
        on bucket, but prunes at the file-listing level — the 10^10-row
        history never hits the scan."""
        key = (table, "p", None if buckets is None else tuple(sorted(int(b) for b in buckets)), self._epoch)
        return self._memo(key, lambda: self._read_append(self.manifest, table, buckets))

    # ------------------------------------------------------------ writes
    def _bucket_col(self, df: DataFrame, table: str):
        return F.pmod(F.col("origin_id"), F.lit(self.buckets)).cast("int")

    def append(self, table: str, df: DataFrame, wave: int, bucket_aligned: bool = False) -> None:
        """Append-only snapshot write (Iceberg append analog).

        ``BUCKETED_APPEND`` tables land under ``wave=N/bucket=B`` with one
        file per bucket; the bucket list is recorded in the manifest so
        ``read_pruned`` prunes by file list, never by directory listing.

        ``bucket_aligned=True`` promises the caller already partitioned
        ``df`` by ``pmod(origin_id, buckets)`` (each bucket lives in exactly
        one task): the narrow-table hash repartition is skipped —
        ``sortWithinPartitions`` alone still yields ≤1 file per bucket.
        """
        schema = APPEND_TABLES[table]
        out = df.select([F.col(f.name).cast(f.dataType) for f in schema.fields])
        par = self.spark.sparkContext.defaultParallelism
        path = os.path.join(self.root, table, f"wave={wave}")
        if table in BUCKETED_APPEND:
            # a retried wave reuses the wave number: clear any partial
            # previous attempt so the post-write dir listing can't resurrect
            # stale bucket dirs into the manifest (dynamic partition
            # overwrite only replaces buckets present in THIS write)
            shutil.rmtree(path, ignore_errors=True)
            # Data clustering inside each bucket file: rows sorted by
            # (origin_id, path_id) → parquet row-group min/max stats on the
            # key become selective, so the per-wave J6/J7 history reads skip
            # row groups inside touched buckets (the parquet approximation
            # of the reference's (origin_id, path_id, date) PK index,
            # schema.sql:131).  sortWithinPartitions = no extra shuffle.
            out = out.withColumn("bucket", self._bucket_col(out, table))
            if bucket_aligned or table in ("warc_records", "screenshots"):
                # payload-heavy or already bucket-partitioned by the caller:
                # avoid a shuffle — sort within the existing partitions;
                # ≤1 file per (task, bucket)
                out = out.sortWithinPartitions("bucket", "origin_id", "path_id")
            else:
                # narrow rows: hash-repartition → ≤1 file per bucket per wave
                out = out.repartition(self.buckets, "bucket").sortWithinPartitions(
                    "bucket", "origin_id", "path_id"
                )
            out.write.mode("overwrite").partitionBy("bucket").parquet(path)
            written = sorted(
                int(d.split("=", 1)[1])
                for d in os.listdir(path)
                if d.startswith("bucket=")
            )
            with self._mlock:
                self._staged.setdefault("append_buckets", {}).setdefault(table, {})[str(wave)] = written
                # record the bucket count this wave was written under: after
                # a rebucket, pruned reads translate current-count want-sets
                # to each wave's historical count (exact because rebucket
                # only multiplies the count)
                self._staged.setdefault("append_bucket_at", {}).setdefault(table, {})[
                    str(wave)
                ] = self.buckets
        else:
            # cap output tasks/files: upstream unions multiply partitions
            if out.rdd.getNumPartitions() > par:
                out = out.coalesce(par)
            out.write.mode("overwrite").parquet(path)  # idempotent on wave retry
        with self._mlock:
            staged = self._staged["append"].setdefault(table, [])
            if wave not in staged:
                staged.append(wave)
        self._bump_epoch()

    def append_rows(self, table: str, rows: list[tuple], wave: int) -> None:
        """Driver-side append of a TINY row set (per-wave metrics: one row
        per exchange partition).  Writes the parquet file with pyarrow
        directly — byte-compatible with the Spark reader's explicit schema —
        instead of launching a Spark write job whose scheduling floor
        dwarfed the data (~0.3 s/wave for ≤32 rows).  Same manifest
        bookkeeping as ``append``; only valid for non-bucketed tables."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        assert table not in BUCKETED_APPEND
        schema = APPEND_TABLES[table]
        _PA = {
            T.LongType(): pa.int64(),
            T.IntegerType(): pa.int32(),
            T.ShortType(): pa.int16(),
            T.StringType(): pa.string(),
            T.BinaryType(): pa.binary(),
        }
        pa_schema = pa.schema(
            [(f.name, _PA[f.dataType]) for f in schema.fields]
        )
        cols = list(zip(*rows)) if rows else [[] for _ in schema.fields]
        tbl = pa.Table.from_arrays(
            [pa.array(list(c), type=pa_schema.field(i).type) for i, c in enumerate(cols)],
            schema=pa_schema,
        )
        path = os.path.join(self.root, table, f"wave={wave}")
        os.makedirs(path, exist_ok=True)
        pq.write_table(tbl, os.path.join(path, "part-00000.parquet"))
        with self._mlock:
            staged = self._staged["append"].setdefault(table, [])
            if wave not in staged:
                staged.append(wave)
        self._bump_epoch()

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
        self._bump_epoch()

    def merge(
        self,
        table: str,
        delta: DataFrame,
        mode: str = "upsert",
        tags: list | None = None,
    ) -> dict:
        """Bucket-level merge-on-read MERGE (Iceberg ``MERGE INTO`` analog).

        mode='upsert'      → WHEN MATCHED UPDATE (delta row wins) + INSERT
        mode='insert_if_absent' → WHEN NOT MATCHED INSERT (existing row wins;
                              the reference's tryInsert, ``Database.java:186-200``)

        Writes O(delta): one delta file per touched bucket; resolution
        happens at read time (newest-wins) and chains auto-compact past
        ``delta_chain_k``.  Returns the merge stats dict (``buckets``,
        ``upsert_rows``, ``insert_rows``, ``rows_by_tag``).
        """
        if mode == "upsert":
            return self._merge_mor(table, upsert=delta, insert=None, tags=tags)
        if mode == "insert_if_absent":
            return self._merge_mor(table, upsert=None, insert=delta, tags=tags)
        raise ValueError(mode)

    def merge_mixed(
        self, table: str, upsert: DataFrame, insert: DataFrame, tags: list | None = None
    ) -> dict:
        """One merge combining an UPDATE delta and an INSERT-IF-ABSENT delta
        (one bucket-discovery job + one delta write instead of two of each).
        An insert key colliding with an existing row OR an upsert key loses
        (existing/updated row wins — tryInsert semantics).  Returns
        the merge stats dict."""
        return self._merge_mor(table, upsert=upsert, insert=insert, tags=tags)

    def _merge_mor(
        self,
        table: str,
        upsert: DataFrame | None,
        insert: DataFrame | None,
        tags: list | None = None,
    ) -> dict:
        """Shared merge core: stats job + delta write (+ fresh-base fast
        path + auto-compaction).

        Deltas may carry an optional ``__tag`` string column: row counts per
        (mode, tag) are collected in the same job that discovers touched
        buckets and reported in ``stats["rows_by_tag"]`` — callers get
        per-subset counts (parked / discovered / …) without extra actions.
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
        # write-first single-job path: when every bucket already has state
        # the fresh-base layout is impossible, so the stats the two-job
        # shape collects up front (touched buckets, per-(mode,tag) counts)
        # can ride the delta write itself as observed metrics — one job and
        # one pass over the delta instead of a count().collect() pass plus
        # a cached write pass.  Needs the tag vocabulary declared up front
        # (observed aggregates are fixed expressions, not a groupBy); an
        # untagged delta declares the empty vocabulary implicitly.
        tags_known = tags is not None or not any(
            df is not None and "__tag" in df.columns for df in (upsert, insert)
        )
        if tags_known:
            with self._mlock:
                bmap_p: dict = self._staged["mutable"][table]
                dmap_p: dict = self._staged.setdefault("mutable_deltas", {}).setdefault(table, {})
                all_occupied = all(
                    str(b) in bmap_p or dmap_p.get(str(b)) for b in range(self.buckets)
                )
            if all_occupied:
                return self._merge_mor_writefirst(table, delta, list(tags or ()), cols)
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
            version = self._staged["next_version"][table]
            self._staged["next_version"][table] = version + 1
            bmap: dict = self._staged["mutable"][table]
            dmap: dict = self._staged.setdefault("mutable_deltas", {}).setdefault(table, {})
            fresh = all(str(b) not in bmap and not dmap.get(str(b)) for b in touched)
        if fresh:
            # no prior state in any touched bucket (seeding / first write):
            # resolve within the delta and write it directly as BASE — the
            # table stays clean and reads keep full filter pushdown
            ups = delta.filter(~F.col("__iia")).select(cols)
            out = ups
            if ins_rows:
                ins = delta.filter(F.col("__iia")).select(cols)
                if up_rows:
                    new_rows = ins.join(
                        ups.select(keys).distinct().hint("shuffle_hash"), keys, "left_anti"
                    )
                else:
                    new_rows = ins
                # first-wins within the delta (duplicate discoveries in one wave)
                out = out.unionByName(new_rows.dropDuplicates(keys)) if up_rows else new_rows.dropDuplicates(keys)
            out = out.withColumn("bucket", self._bucket_col(out, table))
            target = os.path.join(self.root, table, f"v{version}")
            (
                out.repartition(max(1, len(touched)), "bucket")
                .sortWithinPartitions("bucket", *MUTABLE_CLUSTER[table])
                .write.mode("overwrite")
                .option("parquet.block.size", BASE_ROWGROUP_BYTES)
                .partitionBy("bucket")
                .parquet(target)
            )
            delta.unpersist()
            with self._mlock:
                for b in touched:
                    bmap[str(b)] = version
            self._bump_epoch()
            return stats

        # MoR delta write: O(delta), no read of the existing table at all.
        # A FEW size-targeted files, bucket as a plain column — resolves
        # read the delta whole, so dir-partitioning by bucket only
        # multiplied the per-file task floor (32 tiny files per version
        # cost ~9 s/wave in broadcast subjobs at small wave sizes).
        out = delta.select(*cols, F.col("__iia"), F.col("__bucket"))
        target = os.path.join(self.root, table, f"d{version}")
        n_files = max(1, min(len(touched), (up_rows + ins_rows) // 2_000_000 + 1))
        out.repartition(n_files).write.mode("overwrite").parquet(target)
        delta.unpersist()
        with self._mlock:
            for b in touched:
                dmap.setdefault(str(b), []).append(version)
            self._staged.setdefault("delta_rows", {}).setdefault(table, {})[str(version)] = (
                up_rows + ins_rows
            )
            over = [b for b in touched if len(dmap[str(b)]) > self.delta_chain_k]
        self._bump_epoch()
        if over:
            self.compact(table, over)
        return stats

    def _merge_mor_writefirst(
        self, table: str, delta: DataFrame, tags: list, cols: list
    ) -> dict:
        """MoR delta write with the merge stats as observed metrics on the
        write job itself (one driver action, one pass over the delta plan).
        Only reachable when every bucket already has state — the fresh-base
        branch of ``_merge_mor`` can never apply — and the caller's tag
        vocabulary is known.  File layout, manifest updates and compaction
        triggers are identical to the two-job shape; the file-count target
        is sized from the table's recent delta history because the exact
        row count only becomes known when the write finishes."""
        with self._mlock:
            version = self._staged["next_version"][table]
            self._staged["next_version"][table] = version + 1
            est = max(
                (int(v) for v in self._staged.get("delta_rows", {}).get(table, {}).values()),
                default=0,
            )
        n_files = max(1, min(self.buckets, est // 2_000_000 + 1))
        obs = Observation()
        exprs = [
            F.sum(F.when(F.col("__iia"), 1).otherwise(0)).alias("__ins"),
            F.sum(F.when(~F.col("__iia"), 1).otherwise(0)).alias("__ups"),
            F.sum(
                F.when(F.col("__tag").isNull() & F.col("__iia"), 1).otherwise(0)
            ).alias("__null_ins"),
            F.sum(
                F.when(F.col("__tag").isNull() & ~F.col("__iia"), 1).otherwise(0)
            ).alias("__null_ups"),
            F.collect_set("__bucket").alias("__touched"),
        ]
        for i, t in enumerate(tags):
            exprs.append(
                F.sum(F.when(F.col("__tag") == F.lit(t), 1).otherwise(0)).alias(f"__t{i}")
            )
        out = delta.observe(obs, *exprs).select(*cols, F.col("__iia"), F.col("__bucket"))
        target = os.path.join(self.root, table, f"d{version}")
        out.repartition(n_files).write.mode("overwrite").parquet(target)
        m = obs.get
        up_rows = int(m["__ups"] or 0)
        ins_rows = int(m["__ins"] or 0)
        touched = sorted(int(b) for b in (m["__touched"] or []))
        rows_by_tag: dict = {}
        if m["__null_ins"]:
            rows_by_tag["insert"] = int(m["__null_ins"])
        if m["__null_ups"]:
            rows_by_tag["upsert"] = int(m["__null_ups"])
        for i, t in enumerate(tags):
            c = int(m[f"__t{i}"] or 0)
            if c:
                rows_by_tag[t] = rows_by_tag.get(t, 0) + c
        stats = {
            "buckets": len(touched),
            "upsert_rows": up_rows,
            "insert_rows": ins_rows,
            "rows_by_tag": rows_by_tag,
        }
        self.last_merge_stats = stats
        if not touched:
            # empty delta: drop the files, leave the version-number gap
            shutil.rmtree(target, ignore_errors=True)
            return stats
        with self._mlock:
            dmap: dict = self._staged.setdefault("mutable_deltas", {}).setdefault(table, {})
            for b in touched:
                dmap.setdefault(str(b), []).append(version)
            self._staged.setdefault("delta_rows", {}).setdefault(table, {})[str(version)] = (
                up_rows + ins_rows
            )
            over = [b for b in touched if len(dmap[str(b)]) > self.delta_chain_k]
        self._bump_epoch()
        if over:
            self.compact(table, over)
        return stats

    def compact(self, table: str, buckets: list | None = None) -> int:
        """Fold delta chains into new base files (Iceberg
        ``rewrite_data_files``).  Restricted to ``buckets`` when given, else
        every bucket with an outstanding chain.  Old base/delta files become
        orphans (ignored via the manifest; vacuum-style cleanup applies).
        Returns the number of buckets compacted."""
        schema, keys = MUTABLE_TABLES[table]
        cols = [f.name for f in schema.fields]
        with self._mlock:
            bmap: dict = self._staged["mutable"][table]
            dmap: dict = self._staged.setdefault("mutable_deltas", {}).setdefault(table, {})
            want = None if buckets is None else {str(b) for b in buckets}
            targets = sorted(
                (b for b, ch in dmap.items() if ch and (want is None or b in want)), key=int
            )
            if not targets:
                return 0
            version = self._staged["next_version"][table]
            self._staged["next_version"][table] = version + 1
        deltas = self._delta_scan(self._staged, table, targets)
        base_bmap = {b: bmap[b] for b in targets if b in bmap}
        tagged = deltas
        if base_bmap:
            tagged = (
                self._base_scan(table, base_bmap, schema)
                .withColumn("__kind", F.lit(1))
                .withColumn("__ver", F.lit(0))
                .unionByName(deltas)
            )
        resolved = self._resolve_newest_wins(tagged, keys, cols)
        out = resolved.withColumn("bucket", self._bucket_col(resolved, table))
        target = os.path.join(self.root, table, f"v{version}")
        (
            out.repartition(max(1, len(targets)), "bucket")
            .sortWithinPartitions("bucket", *MUTABLE_CLUSTER[table])
            .write.mode("overwrite")
            .option("parquet.block.size", BASE_ROWGROUP_BYTES)
            .partitionBy("bucket")
            .parquet(target)
        )
        with self._mlock:
            for b in targets:
                bmap[b] = version
                dmap[b] = []
            # prune row counts of versions no chain references anymore
            live = {v for ch in dmap.values() for v in ch}
            drows = self._staged.setdefault("delta_rows", {}).setdefault(table, {})
            for v in [v for v in drows if int(v) not in live]:
                del drows[v]
        self._bump_epoch()
        return len(targets)

    def overwrite(self, table: str, df: DataFrame) -> int:
        """Full-table upsert (seeding / small dimension tables)."""
        return self.merge(table, df, mode="upsert")["buckets"]

    def delete_where(self, table: str, keys_df: DataFrame) -> dict:
        """Bucket-pruned copy-on-write DELETE (Iceberg COW-delete analog).

        Deletes are deliberately NOT merge-on-read tombstones: the cheap
        per-wave URL-seen path (``read_keys`` feeding semi-/anti-joins)
        is sound precisely because "merges never delete a key" — a
        tombstone delta would force newest-wins resolution onto every
        key-presence read.  Instead, deletion is an explicit maintenance
        op (frontier retirement, record purge) that rewrites ONLY the
        buckets containing delete keys: resolve those buckets' current
        state (base + delta chains, newest-wins), anti-join the keys,
        write a fresh base version, clear the buckets' chains.  Cost is
        O(touched buckets), never O(table); a bucket left empty drops out
        of the manifest entirely.  Returns ``{"buckets", "rows_deleted"}``.
        """
        schema, keys = MUTABLE_TABLES[table]
        cols = [f.name for f in schema.fields]
        kdf = keys_df.select(*keys).distinct()
        counts = (
            kdf.groupBy(self._bucket_col(kdf, table).alias("__b")).count().collect()
        )
        targets = sorted((str(int(r["__b"])) for r in counts), key=int)
        n_keys = sum(r["count"] for r in counts)
        if not targets:
            return {"buckets": 0, "rows_deleted": 0}
        with self._mlock:
            bmap: dict = self._staged["mutable"][table]
            dmap: dict = self._staged.setdefault("mutable_deltas", {}).setdefault(table, {})
            version = self._staged["next_version"][table]
            self._staged["next_version"][table] = version + 1
        dirty = [b for b in targets if dmap.get(b)]
        base_bmap = {b: bmap[b] for b in targets if b in bmap}
        parts = []
        if base_bmap:
            parts.append(
                self._base_scan(table, base_bmap, schema)
                .withColumn("__kind", F.lit(1))
                .withColumn("__ver", F.lit(0))
            )
        if dirty:
            parts.append(self._delta_scan(self._staged, table, dirty))
        if not parts:
            return {"buckets": 0, "rows_deleted": 0}
        resolved = self._resolve_newest_wins(
            functools.reduce(DataFrame.unionByName, parts), keys, cols
        )
        # key sets small enough to broadcast (known from the counts job)
        # get the hint; bigger retire sets shuffle — stat-less MoR scans
        # otherwise demote to SMJ on the WHOLE touched-bucket set anyway
        kside = F.broadcast(kdf) if n_keys <= 1_000_000 else kdf
        removed = resolved.join(kside, keys, "left_semi").count()
        kept = resolved.join(kside, keys, "left_anti")
        out = kept.withColumn("bucket", self._bucket_col(kept, table))
        target = os.path.join(self.root, table, f"v{version}")
        (
            out.repartition(max(1, len(targets)), "bucket")
            .sortWithinPartitions("bucket", *MUTABLE_CLUSTER[table])
            .write.mode("overwrite")
            .option("parquet.block.size", BASE_ROWGROUP_BYTES)
            .partitionBy("bucket")
            .parquet(target)
        )
        present = (
            {d for d in os.listdir(target) if d.startswith("bucket=")}
            if os.path.isdir(target)
            else set()
        )
        with self._mlock:
            for b in targets:
                if f"bucket={b}" in present:
                    bmap[b] = version
                else:  # every row of the bucket deleted → bucket is gone
                    bmap.pop(b, None)
                dmap[b] = []
            live = {v for ch in dmap.values() for v in ch}
            drows = self._staged.setdefault("delta_rows", {}).setdefault(table, {})
            for v in [v for v in drows if int(v) not in live]:
                del drows[v]
        self._bump_epoch()
        return {"buckets": len(targets), "rows_deleted": removed}

    def delete_append_where(self, table: str, origin_ids, wave: int) -> dict:
        """Bucket-pruned COW delete over an APPEND table's history (the
        record-purge / takedown path — the reference keeps history forever;
        purge is our scale-side maintenance op).

        ``origin_ids``: driver-side list (a takedown names a handful of
        hosts).  Only the (wave, bucket) files that can contain the origins
        are read — touched buckets computed PER WAVE under the bucket count
        that wave was written at (``append_bucket_at``), so purge stays
        correct across rebucket epochs.  Kept rows from touched files are
        rewritten as the single new wave ``wave`` (append-table reads union
        wave dirs; row→wave locality is physical, not semantic), and the
        purged buckets drop out of the old waves' manifest lists — the old
        files stay on disk for retained snapshots until ``vacuum``, which
        reclaims de-listed bucket subdirs at file granularity.  Cost is
        O(touched files), never O(archive): 1/buckets of each wave the
        origin appears in.  ``wave`` must be a FRESH id (the caller commits
        it — `CrawlEngine.purge_origin` self-commits for exactly this
        reason: the id namespace is shared with the crawl loop).
        """
        if table not in BUCKETED_APPEND:
            raise ValueError(f"delete_append_where: {table} is not a bucketed append table")
        schema = APPEND_TABLES[table]
        oids = sorted({int(o) for o in origin_ids})
        with self._mlock:
            waves = list(self._staged["append"].get(table, []))
            ab = self._staged.get("append_buckets", {}).get(table, {})
            bat = self._staged.get("append_bucket_at", {}).get(table, {})
        affected: list[tuple[int, list]] = []
        for w in waves:
            if w == wave:
                continue
            bl = ab.get(str(w))
            if bl is None:
                # legacy unbucketed wave dir: cannot prune, rewrite whole
                affected.append((w, None))
                continue
            bw = int(bat.get(str(w), self.buckets))
            tb = sorted({o % bw for o in oids} & {int(b) for b in bl})
            if tb:
                affected.append((w, tb))
        if not affected:
            return {"waves": 0, "buckets": 0, "rows_deleted": 0}
        paths, n_buckets = [], 0
        for w, tb in affected:
            if tb is None:
                paths.append(os.path.join(self.root, table, f"wave={w}"))
                n_buckets += 1
            else:
                n_buckets += len(tb)
                paths.extend(
                    os.path.join(self.root, table, f"wave={w}", f"bucket={b}") for b in tb
                )
        df = self.spark.read.schema(schema).parquet(*paths)
        cond = F.col("origin_id").isin(oids)  # tiny In — pushed to the scan
        removed = df.filter(cond).count()
        self.append(table, df.filter(~cond), wave)
        with self._mlock:
            app = self._staged["append"][table]
            for w, tb in affected:
                if tb is None:
                    app.remove(w)
                    continue
                left = [b for b in ab[str(w)] if int(b) not in set(tb)]
                if left:
                    ab[str(w)] = left
                else:
                    app.remove(w)
                    ab.pop(str(w), None)
                    bat.pop(str(w), None)
        self._bump_epoch()
        return {"waves": len(affected), "buckets": n_buckets, "rows_deleted": removed}

    def compact_appends(
        self,
        table: str,
        wave: int,
        *,
        small_bytes: int = 32 << 20,
        max_rewrite_bytes: int = 1 << 30,
        min_waves: int = 4,
    ) -> dict:
        """Bin-pack small per-wave files of an APPEND table into one
        consolidated wave (the Iceberg ``rewrite_data_files`` bin-pack
        analog — the reference never needs this because SQLite is one file,
        ``Database.java:55-64``; at Spark scale a continuous crawl leaves
        one file per bucket per wave, so a 1000-wave history is ~32k tiny
        files whose open/footer/task floor dominates every pruned J6/J7
        read long before data volume does).

        Policy: committed waves whose on-disk dir size is below
        ``small_bytes`` are candidates; the oldest are folded, up to
        ``max_rewrite_bytes`` per call, so cost is O(compacted bytes) —
        bounded and amortizable — never O(archive).  Requires at least
        ``min_waves`` candidates to bother.  The rewrite goes through
        ``append``: the merged wave lands under the CURRENT bucket count
        with rows re-sorted on (origin_id, path_id), which RESTORES
        row-group min/max clustering across the merged span (the per-wave
        key sort only clusters within a wave) and collapses any legacy
        unbucketed / pre-rebucket wave dirs into the pruned layout.  Source
        waves leave the manifest; their files stay on disk for retained
        snapshots until ``vacuum`` reclaims them.

        ``wave`` must be a FRESH id (shared namespace with the crawl loop —
        ``CrawlEngine.compact_history`` self-commits for exactly this
        reason, like ``purge_origin``).  Staged like every mutation.
        """
        if table not in APPEND_TABLES:
            raise ValueError(f"compact_appends: unknown append table {table}")
        with self._mlock:
            waves = list(self._staged["append"].get(table, []))
        if wave in waves:
            raise ValueError(f"compact_appends: wave id {wave} already exists for {table}")
        noop = {"waves_in": 0, "bytes_in": 0, "files_in": 0}
        if len(waves) < min_waves:
            return noop

        def _wave_stats(w: int) -> tuple[int, int]:
            # committed wave dirs are immutable → memoized like version dirs
            key = (table, "w", w)
            hit = self._size_memo.get(key)
            if hit is None:
                n = files = 0
                for dirpath, _dirs, fs in os.walk(
                    os.path.join(self.root, table, f"wave={w}")
                ):
                    for f in fs:
                        if f.startswith(("_", ".")):
                            continue
                        try:
                            n += os.path.getsize(os.path.join(dirpath, f))
                            files += 1
                        except OSError:
                            pass
                hit = (n, files)
                self._size_memo[key] = hit
            return hit

        sized = sorted((w for w in waves if _wave_stats(w)[0] < small_bytes))
        take, tot_b, tot_f = [], 0, 0
        for w in sized:
            b, fl = _wave_stats(w)
            if take and tot_b + b > max_rewrite_bytes:
                break
            take.append(w)
            tot_b += b
            tot_f += fl
        if len(take) < min_waves:
            return noop
        schema = APPEND_TABLES[table]
        with self._mlock:
            ab = self._staged.get("append_buckets", {}).get(table, {})
            blists = {w: ab.get(str(w)) for w in take}
        paths = []
        for w in take:
            base = os.path.join(self.root, table, f"wave={w}")
            bl = blists[w]
            if bl is None:  # legacy unbucketed wave dir: plain files
                paths.append(base)
            else:  # leaf dirs — mixed roots break partition discovery
                paths.extend(os.path.join(base, f"bucket={b}") for b in bl)
        df = self.spark.read.schema(schema).parquet(*paths)
        self.append(table, df, wave)
        with self._mlock:
            app = self._staged["append"][table]
            for w in take:
                app.remove(w)
            for m in ("append_buckets", "append_bucket_at"):
                sub = self._staged.get(m, {}).get(table, {})
                for w in take:
                    sub.pop(str(w), None)
        self._bump_epoch()
        return {"waves_in": len(take), "bytes_in": tot_b, "files_in": tot_f}

    def rebucket(self, new_buckets: int) -> dict:
        """Grow the bucket count (Iceberg partition-spec-evolution analog).

        A store sized for 10^7 frontier rows does not survive 10^10: per-
        bucket files blow past row-group skipping and every touched-bucket
        rewrite drags the whole keyspace.  ``rebucket`` multiplies the
        count: each MUTABLE table's current state (base + delta chains,
        newest-wins) is rewritten once under the new bucketing and its
        chains reset — O(current state), the explicit maintenance-op cost —
        while append-table HISTORY (visits/warc at 10^10 rows — exactly
        what must never be rewritten) keeps its old layout; pruned reads
        translate current-count want-sets per wave via the recorded
        ``append_bucket_at`` (exact because the new count is a MULTIPLE of
        the old: ``origin % B_old == (origin % B_new) % B_old`` — hence the
        multiple-only rule).  The reference has no analog (H2 re-indexes
        internally, ``schema.sql:131``); this is the scale-side bucket-
        evolution path.  Staged like every mutation; the next ``commit``
        publishes it and a reopen adopts the new count from the manifest.
        """
        new_buckets = int(new_buckets)
        if new_buckets <= self.buckets or new_buckets % self.buckets != 0:
            raise ValueError(
                f"rebucket: new count {new_buckets} must be a larger multiple of "
                f"{self.buckets} (keeps historical append-prune translation exact)"
            )
        old = self.buckets
        with self._mlock:
            # backfill per-wave counts for append history written before this
            # feature existed: all of it is under the old count
            for table, waves in self._staged.get("append_buckets", {}).items():
                bat = self._staged.setdefault("append_bucket_at", {}).setdefault(table, {})
                for w in waves:
                    bat.setdefault(str(w), old)
        stats: dict = {}
        for table in MUTABLE_TABLES:
            schema, _keys = MUTABLE_TABLES[table]
            bmap = self._staged["mutable"][table]
            dmap = self._staged.get("mutable_deltas", {}).get(table, {})
            if not bmap and not any(dmap.values()):
                continue
            df = self.read_staged(table)
            with self._mlock:
                version = self._staged["next_version"][table]
                self._staged["next_version"][table] = version + 1
            out = df.withColumn(
                "bucket", F.pmod(F.col("origin_id"), F.lit(new_buckets)).cast("int")
            )
            target = os.path.join(self.root, table, f"v{version}")
            (
                out.repartition(new_buckets, "bucket")
                .sortWithinPartitions("bucket", *MUTABLE_CLUSTER[table])
                .write.mode("overwrite")
                .option("parquet.block.size", BASE_ROWGROUP_BYTES)
                .partitionBy("bucket")
                .parquet(target)
            )
            present = {
                d.split("=", 1)[1] for d in os.listdir(target) if d.startswith("bucket=")
            }
            with self._mlock:
                self._staged["mutable"][table] = {b: version for b in present}
                self._staged.setdefault("mutable_deltas", {})[table] = {}
                self._staged.setdefault("delta_rows", {})[table] = {}
            stats[table] = len(present)
        with self._mlock:
            self._staged["buckets"] = new_buckets
        self.buckets = new_buckets
        self._bump_epoch()
        return stats

    # ------------------------------------------------------------ vacuum
    def vacuum(self, keep_snapshots: int = 2) -> dict:
        """Delete data files unreferenced by the live/staged manifest and
        the newest ``keep_snapshots`` snapshot tags — the Iceberg
        ``expire_snapshots`` + ``remove_orphan_files`` analog.  Merges,
        compactions and retention rewrites all leave old version/wave dirs
        behind by design (crash safety: the previous snapshot stays
        readable until commit); vacuum is the explicit maintenance op that
        reclaims them.  Tags older than the kept window are deleted too, so
        ``resume_from`` keeps working exactly for retained snapshots.
        Returns ``{"dirs_deleted": n, "tags_deleted": m}``."""
        import re

        tags = sorted(
            (
                int(m.group(1))
                for f in os.listdir(self.root)
                if (m := re.fullmatch(r"manifest-(\d+)\.json", f))
            )
        )
        keep_tags = set(tags[-keep_snapshots:]) if keep_snapshots > 0 else set()
        manifests = [self.manifest, self._staged]
        for t in keep_tags:
            with open(self._manifest_path(t)) as f:
                manifests.append(json.load(f))

        live: dict[str, set] = {}
        for m in manifests:
            for table, bmap in m.get("mutable", {}).items():
                s = live.setdefault(table, set())
                s.update(f"v{v}" for v in bmap.values())
                for ch in m.get("mutable_deltas", {}).get(table, {}).values():
                    s.update(f"d{v}" for v in ch)
            for table, waves in m.get("append", {}).items():
                live.setdefault(table, set()).update(f"wave={w}" for w in waves)

        # bucket-level liveness inside kept append wave dirs: a purge
        # (delete_append_where) de-lists buckets from a wave without
        # touching its other files, so reclamation must be file-granular
        # (Iceberg remove_orphan_files works on files, not partitions).
        # None = some retained manifest has no bucket list for the wave
        # (legacy/unbucketed) — everything inside stays.
        live_buckets: dict[tuple, set | None] = {}
        for m in manifests:
            for table, waves in m.get("append", {}).items():
                ab = m.get("append_buckets", {}).get(table, {})
                for w in waves:
                    key = (table, f"wave={w}")
                    bl = ab.get(str(w))
                    cur = live_buckets.get(key, set())
                    if bl is None or cur is None:
                        live_buckets[key] = None
                    else:
                        live_buckets[key] = cur | {f"bucket={int(b)}" for b in bl}

        deleted = 0
        for table in list(MUTABLE_TABLES) + list(APPEND_TABLES):
            tdir = os.path.join(self.root, table)
            if not os.path.isdir(tdir):
                continue
            keep = live.get(table, set())
            for d in os.listdir(tdir):
                if d not in keep and re.fullmatch(r"(v\d+|d\d+|wave=\d+)", d):
                    shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)
                    deleted += 1
                elif d in keep and d.startswith("wave="):
                    lb = live_buckets.get((table, d))
                    if lb is None:
                        continue
                    wdir = os.path.join(tdir, d)
                    for sub in os.listdir(wdir):
                        if re.fullmatch(r"bucket=\d+", sub) and sub not in lb:
                            shutil.rmtree(os.path.join(wdir, sub), ignore_errors=True)
                            deleted += 1
        # bloom plane blobs: keep only files referenced by a retained manifest
        bdir = os.path.join(self.root, "bloom")
        if os.path.isdir(bdir):
            keep_planes = {
                m.get("bloom", {}).get("file") for m in manifests if m.get("bloom")
            }
            for f in os.listdir(bdir):
                if f not in keep_planes:
                    os.remove(os.path.join(bdir, f))
                    deleted += 1
        tags_deleted = 0
        for t in tags:
            if t not in keep_tags:
                os.remove(self._manifest_path(t))
                tags_deleted += 1
        return {"dirs_deleted": deleted, "tags_deleted": tags_deleted}
