"""Sharded cuckoo URL-seen filter — the north_star's second filter option.

Public algorithm: Fan, Andersen, Kaminsky, Mitzenmacher, "Cuckoo Filter:
Practically Better Than Bloom" (ACM CoNEXT 2014).  16-bit fingerprints in
4-slot buckets with partial-key cuckoo hashing — the alternate bucket is
``bucket XOR hash(fingerprint)``, an involution, so an entry's two candidate
buckets are computable from (bucket, fingerprint) alone.  That buys the one
thing a bloom filter structurally cannot do: **DELETE** (remove one stored
copy of the fingerprint), at comparable space (~8 bits/key effective here)
and lower FP rate (two buckets × 4 slots × 2^-16 ≈ 0.012%).

Role in the engine (mirrors ``operators/seen.py``): a probe "no" is
definite (the URL is new → skip the J5 exact anti-join); a probe "yes" may
be a false positive and falls through to the exact check — correctness is
never affected, only the volume of rows entering the J5 shuffle.  Unlike
bloom, a future frontier-compaction/retire path can DELETE keys in place
instead of forcing a full rebuild.

Semantics difference that shapes the engine integration: bloom OR-in is
idempotent, cuckoo insert is NOT (each insert consumes a slot, ≥2·slots
copies of one fingerprint overflow the pair of buckets).  The engine
therefore inserts only **verified-new** keys — each URL enters the filter
exactly once over the crawl's lifetime — where the bloom path may OR-in a
rediscovery superset.

Scale shape:
- probes are Arrow-vectorized against broadcast planes (same as bloom);
- the build shards by ``pmod(origin_id, S)`` and each shard's table is
  built by ONE task (``groupBy(shard).applyInPandas``) — cuckoo insertion
  is stateful (eviction chains) so per-partition partial tables cannot be
  merged the way bloom planes OR together; capacity and build parallelism
  both scale linearly with S (at 10^10 keys, size S so one shard's keys
  fit one task);
- incremental inserts are either a driver-side numpy pass (small deltas,
  one collect) or the same one-task-per-shard distributed pass against
  broadcast current planes (``insert_sharded``).

Plane layout: ``uint16[n_shards, n_buckets, SLOTS]``; fingerprint 0 means
empty (real fingerprints are remapped off 0).  Buckets are kept PACKED
(occupied slots are a prefix): inserts append at the first free slot,
evictions kick the last occupied slot, deletes swap the last occupied slot
into the hole — packing makes the vectorized bulk-place pass a single
scatter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .seen import _mix64

SLOTS = 4
MAX_KICKS = 500
_FP_MASK = np.uint64(0xFFFF)
_FP_ZERO_REMAP = np.uint16(0x9E37)  # fingerprint 0 is the empty marker


class CuckooFull(RuntimeError):
    """Insert failed after MAX_KICKS evictions — the shard is past its load
    limit (~95% for 4-slot buckets); resize n_buckets or add shards."""


def _fp_and_bucket(keys: np.ndarray, n_buckets: int):
    """(fingerprint, primary bucket) per key.  fp from the low mixed bits,
    bucket from the high bits — one splitmix64 pass feeds both."""
    u = keys.astype(np.int64).view(np.uint64)
    h = _mix64(u)
    fp = (h & _FP_MASK).astype(np.uint16)
    fp[fp == 0] = _FP_ZERO_REMAP
    i1 = ((h >> np.uint64(20)) & np.uint64(n_buckets - 1)).astype(np.int64)
    return fp, i1


def _alt_bucket(idx: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """Partial-key cuckoo hashing: alt = idx XOR hash(fp).  An involution
    (alt(alt(i)) == i), so eviction targets never leave the pair."""
    h = _mix64(fp.astype(np.uint64)) & np.uint64(n_buckets - 1)
    return (idx.astype(np.uint64) ^ h).astype(np.int64)


def _place_pass(table: np.ndarray, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
    """Vectorized bulk placement: append each (bucket, fp) at the bucket's
    first free slot where room remains.  Buckets are packed, so the target
    slot is occupancy + within-batch rank — one argsort + one scatter for
    the whole batch.  Returns the placed mask."""
    if not len(idx):
        return np.zeros(0, dtype=bool)
    order = np.argsort(idx, kind="stable")
    si, sf = idx[order], fp[order]
    first = np.concatenate(([True], si[1:] != si[:-1]))
    starts = np.flatnonzero(first)
    grp = np.cumsum(first) - 1
    rank = np.arange(len(si)) - starts[grp]
    occ = (table[si] != 0).sum(axis=1)
    slot = occ + rank
    ok = slot < SLOTS
    table[si[ok], slot[ok]] = sf[ok]
    placed = np.zeros(len(idx), dtype=bool)
    placed[order[ok]] = True
    return placed


def _insert_with_eviction(table: np.ndarray, idx: np.ndarray, fp: np.ndarray, n_buckets: int):
    """Sequential eviction path for the few keys bulk passes couldn't place.
    Deterministic kick choice (kick counter mod SLOTS) keeps builds
    reproducible."""
    for j in range(len(idx)):
        i, f = int(idx[j]), np.uint16(fp[j])
        placed = False
        for b in (i, int(_alt_bucket(np.array([i]), np.array([f], dtype=np.uint16), n_buckets)[0])):
            row = table[b]
            free = np.flatnonzero(row == 0)
            if len(free):
                row[free[0]] = f
                placed = True
                break
        if placed:
            continue
        b = i
        for kick in range(MAX_KICKS):
            s = SLOTS - 1 - (kick % SLOTS)  # kick the tail slot: keeps packing
            victim = table[b, s]
            table[b, s] = f
            f = victim
            b = int(_alt_bucket(np.array([b]), np.array([f], dtype=np.uint16), n_buckets)[0])
            row = table[b]
            free = np.flatnonzero(row == 0)
            if len(free):
                row[free[0]] = f
                placed = True
                break
        if not placed:
            raise CuckooFull(
                f"cuckoo shard full after {MAX_KICKS} kicks "
                f"(n_buckets={n_buckets}, load≈{(table != 0).mean():.2%})"
            )


def insert_keys(table: np.ndarray, keys: np.ndarray, n_buckets: int) -> None:
    """Insert distinct keys into one shard's (n_buckets, SLOTS) table:
    two vectorized bulk passes (primary then alternate bucket), eviction
    loop only for the residue — at engine load factors the residue is a
    sliver, so the build is numpy-bound, not Python-loop-bound."""
    keys = np.unique(np.asarray(keys, dtype=np.int64))  # set semantics
    if not len(keys):
        return
    fp, i1 = _fp_and_bucket(keys, n_buckets)
    placed = _place_pass(table, i1, fp)
    if placed.all():
        return
    rem_fp, rem_i1 = fp[~placed], i1[~placed]
    i2 = _alt_bucket(rem_i1, rem_fp, n_buckets)
    placed2 = _place_pass(table, i2, rem_fp)
    if placed2.all():
        return
    _insert_with_eviction(table, rem_i1[~placed2], rem_fp[~placed2], n_buckets)


def contains(planes: np.ndarray, shards: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: fp present in either candidate bucket
    of the key's shard.  No false negatives for inserted keys; FP rate
    ≈ 2·SLOTS/2^16."""
    n_buckets = planes.shape[1]
    fp, i1 = _fp_and_bucket(np.asarray(keys, dtype=np.int64), n_buckets)
    i2 = _alt_bucket(i1, fp, n_buckets)
    sh = np.asarray(shards, dtype=np.int64)
    b1 = planes[sh, i1]
    b2 = planes[sh, i2]
    f = fp[:, None]
    return (b1 == f).any(axis=1) | (b2 == f).any(axis=1)


def delete_collected(planes: np.ndarray, rows, n_buckets: int) -> int:
    """Driver-side delete of collected (shard, key) rows — removes ONE
    stored copy per present key (the operation bloom cannot do; only safe
    for keys that were actually inserted, the standard cuckoo-filter
    contract).  The last occupied slot swaps into the hole so buckets stay
    packed.  Returns the number of keys removed."""
    removed = 0
    for sh, key in rows:
        fp, i1 = _fp_and_bucket(np.array([key], dtype=np.int64), n_buckets)
        f = fp[0]
        for b in (int(i1[0]), int(_alt_bucket(i1, fp, n_buckets)[0])):
            row = planes[sh, b]
            hit = np.flatnonzero(row == f)
            if len(hit):
                occ = int((row != 0).sum())
                row[hit[0]] = row[occ - 1]
                row[occ - 1] = 0
                removed += 1
                break
    return removed


def insert_collected(planes: np.ndarray, rows, n_buckets: int) -> np.ndarray:
    """Driver-side insert of collected (shard, key) rows — the small-delta
    fast path (one collect job), mirror of ``seen.or_in_collected``.
    ``rows`` is a sequence of (shard, key) tuples or a pandas frame with
    ``shard``/``key`` columns (Arrow transfer)."""
    if hasattr(rows, "columns"):
        if not len(rows):
            return planes
        sh = rows["shard"].to_numpy(dtype=np.int64)
        keys = rows["key"].to_numpy(dtype=np.int64)
        for s in np.unique(sh):
            insert_keys(planes[s], keys[sh == s], n_buckets)
        return planes
    if not rows:
        return planes
    sh = np.fromiter((r[0] for r in rows), dtype=np.int64)
    keys = np.fromiter((r[1] for r in rows), dtype=np.int64)
    for s in np.unique(sh):
        insert_keys(planes[s], keys[sh == s], n_buckets)
    return planes


def _shard_src(df: DataFrame, key_col: str, shard_col: str) -> DataFrame:
    return df.select(
        F.col(shard_col).cast("long").alias("shard"), F.col(key_col).cast("long").alias("key")
    )


def build_cuckoo_sharded(
    df: DataFrame, key_col: str, shard_col: str, n_shards: int, n_buckets: int = 1 << 18
) -> np.ndarray:
    """Distributed sharded build: each shard's keys hash-shuffle to ONE
    task which builds that shard's table (insertion is stateful — partial
    tables don't merge), emitted as one binary row; the driver assembles
    S small rows.  Capacity AND build parallelism scale linearly with S:
    at 10^10 keys pick S so one shard's keys fit one task."""
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of two"

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        table = np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        insert_keys(table, pdf["key"].to_numpy(dtype=np.int64), n_buckets)
        return pd.DataFrame([(int(pdf["shard"].iloc[0]), table.tobytes())], columns=["shard", "plane"])

    rows = (
        _shard_src(df, key_col, shard_col)
        .groupBy("shard")
        .applyInPandas(build, "shard long, plane binary")
        .collect()
    )
    planes = np.zeros((n_shards, n_buckets, SLOTS), dtype=np.uint16)
    for r in rows:
        planes[r["shard"]] = np.frombuffer(r["plane"], dtype=np.uint16).reshape(n_buckets, SLOTS)
    return planes


def insert_sharded(
    spark: SparkSession,
    planes: np.ndarray,
    df: DataFrame,
    key_col: str,
    shard_col: str,
    n_buckets: int,
) -> np.ndarray:
    """Distributed incremental insert for deltas too big to collect: each
    shard's delta keys flow to one task, which copies ITS shard's table
    from the broadcast planes, inserts, and returns the updated table —
    sound because every shard is owned by exactly one task."""
    bc = spark.sparkContext.broadcast(planes)

    def upd(pdf: pd.DataFrame) -> pd.DataFrame:
        sh = int(pdf["shard"].iloc[0])
        table = bc.value[sh].copy()
        insert_keys(table, pdf["key"].to_numpy(dtype=np.int64), n_buckets)
        return pd.DataFrame([(sh, table.tobytes())], columns=["shard", "plane"])

    rows = (
        _shard_src(df, key_col, shard_col)
        .groupBy("shard")
        .applyInPandas(upd, "shard long, plane binary")
        .collect()
    )
    out = planes.copy()
    for r in rows:
        out[r["shard"]] = np.frombuffer(r["plane"], dtype=np.uint16).reshape(n_buckets, SLOTS)
    bc.unpersist()
    return out


def delete_keys(table: np.ndarray, keys: np.ndarray, n_buckets: int) -> int:
    """Delete ONE stored copy of each distinct key from one shard's table
    (standard cuckoo-filter contract: only safe for keys actually inserted).
    Buckets stay packed (last occupied slot swaps into the hole).  Returns
    the number of keys removed."""
    keys = np.unique(np.asarray(keys, dtype=np.int64))
    if not len(keys):
        return 0
    fp, i1 = _fp_and_bucket(keys, n_buckets)
    i2 = _alt_bucket(i1, fp, n_buckets)
    removed = 0
    for j in range(len(keys)):
        f = fp[j]
        for b in (int(i1[j]), int(i2[j])):
            row = table[b]
            hit = np.flatnonzero(row == f)
            if len(hit):
                occ = int((row != 0).sum())
                row[hit[0]] = row[occ - 1]
                row[occ - 1] = 0
                removed += 1
                break
    return removed


def delete_sharded(
    spark: SparkSession,
    planes: np.ndarray,
    df: DataFrame,
    key_col: str,
    shard_col: str,
    n_buckets: int,
) -> np.ndarray:
    """Distributed delete for retire-sets too big to collect — the mirror of
    ``insert_sharded`` and THE capability that justifies cuckoo over bloom
    (a bloom retire forces a full-frontier rebuild): each shard's retired
    keys flow to one task, which copies ITS shard's table from the broadcast
    planes, deletes, and returns the updated table — sound because every
    shard is owned by exactly one task."""
    bc = spark.sparkContext.broadcast(planes)

    def upd(pdf: pd.DataFrame) -> pd.DataFrame:
        sh = int(pdf["shard"].iloc[0])
        table = bc.value[sh].copy()
        delete_keys(table, pdf["key"].to_numpy(dtype=np.int64), n_buckets)
        return pd.DataFrame([(sh, table.tobytes())], columns=["shard", "plane"])

    rows = (
        _shard_src(df, key_col, shard_col)
        .groupBy("shard")
        .applyInPandas(upd, "shard long, plane binary")
        .collect()
    )
    out = planes.copy()
    for r in rows:
        out[r["shard"]] = np.frombuffer(r["plane"], dtype=np.uint16).reshape(n_buckets, SLOTS)
    bc.unpersist()
    return out


def contains_udf(spark: SparkSession, planes: np.ndarray):
    """Arrow-vectorized membership test against broadcast planes; the
    returned UDF takes (key, shard) series — same contract as
    ``seen.contains_udf``."""
    bc = spark.sparkContext.broadcast(planes)

    @F.pandas_udf("boolean")
    def maybe_seen(keys: pd.Series, shards: pd.Series) -> pd.Series:
        return pd.Series(
            contains(
                bc.value,
                shards.to_numpy(dtype=np.int64),
                keys.to_numpy(dtype=np.int64),
            )
        )

    return maybe_seen


def split_by_cuckoo(
    spark: SparkSession,
    candidates: DataFrame,
    planes: np.ndarray,
    key_expr=None,
    shard_expr=None,
):
    """(definitely_new, maybe_seen) split of candidate URL rows — mirror of
    ``seen.split_by_bloom``."""
    key_expr = key_expr if key_expr is not None else F.xxhash64("origin_id", "path_id")
    n_shards = planes.shape[0]
    if shard_expr is None:
        shard_expr = F.pmod(F.col("origin_id"), F.lit(n_shards)) if n_shards > 1 else F.lit(0)
    probe = contains_udf(spark, planes)
    tagged = candidates.withColumn(
        "__maybe", probe(key_expr.cast("long"), shard_expr.cast("long"))
    )
    return tagged.filter(~F.col("__maybe")).drop("__maybe"), tagged.filter(
        F.col("__maybe")
    ).drop("__maybe")
