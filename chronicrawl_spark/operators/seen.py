"""Distributed bloom URL-seen filter (B axis).

The reference's URL-seen set is the location PK with insert-if-absent
(``Database.java:229-251``).  At 10^10 URLs the exact check is the J5
anti-join MERGE; this module adds the scale-path prefilter the north_star
names: **per-partition bloom filters built in ``mapPartitions`` and merged
via ``treeAggregate`` (depth 2)**, broadcast back and applied as a cheap
Arrow-vectorized membership test.

Semantics: a bloom "no" is definite (the URL is new → skip the anti-join);
a bloom "yes" may be a false positive and falls through to the exact
anti-join — correctness is never affected, only the volume of rows entering
the J5 shuffle (at high rediscovery rates, the dominant join).

Sizing: n_bits=2^24 (2 MiB) with k=5 gives ~0.1% FP at 10^6 keys per
filter; at 10^10 keys you shard the filter by ``pmod(origin_id, S)`` and
broadcast per-shard (the same build path, parameterized).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (uint64 wraparound arithmetic)."""
    with np.errstate(over="ignore"):
        x = (x + _C1).astype(np.uint64)
        x ^= x >> np.uint64(30)
        x *= _C2
        x ^= x >> np.uint64(27)
        x *= _C3
        x ^= x >> np.uint64(31)
    return x


def _positions(keys: np.ndarray, n_bits: int, k: int):
    """k bit positions per key via double hashing."""
    u = keys.astype(np.int64).view(np.uint64)
    h1 = _mix64(u)
    h2 = _mix64(u ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    for i in range(k):
        with np.errstate(over="ignore"):
            yield ((h1 + np.uint64(i) * h2) % np.uint64(n_bits)).astype(np.int64)


def build_bloom(
    df: DataFrame, key_col: str = "key", n_bits: int = 1 << 24, k: int = 5, depth: int = 2
) -> np.ndarray:
    """Build the filter distributed: one partial filter per partition
    (mapPartitions, numpy-vectorized), OR-merged with treeAggregate."""
    return build_bloom_sharded(
        df.withColumn("__shard", F.lit(0)), key_col, "__shard", 1, n_bits, k, depth
    )[0]


def build_bloom_sharded(
    df: DataFrame,
    key_col: str,
    shard_col: str,
    n_shards: int,
    n_bits: int = 1 << 24,
    k: int = 5,
    depth: int = 2,
) -> np.ndarray:
    """Sharded distributed build: one (n_shards, n_bits/8) bit-plane.

    Shard = ``pmod(origin_id, S)`` upstream; each key sets bits only in its
    shard's plane, so total capacity scales linearly with S while the probe
    still reads one plane.  Per-partition partial planes are OR-merged via
    ``treeAggregate`` (depth 2) — the north_star's build shape.

    Keys reach Python as **Arrow batches** (``mapInArrow`` → zero-copy
    numpy), never as per-row Python objects — at 10^10 keys the one-time
    startup/resume build would otherwise round-trip the whole corpus
    through row-at-a-time pickling.  Each partition emits ONE binary plane
    row; only #partitions planes enter the tree merge.
    """
    import pyarrow as pa

    n_bytes = n_bits // 8
    src = df.select(
        F.col(shard_col).cast("long").alias("shard"), F.col(key_col).cast("long").alias("key")
    )

    def part_build(batches):
        arrs = np.zeros((n_shards, n_bytes), dtype=np.uint8)
        for batch in batches:
            sh = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            keys = batch.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(keys):
                for pos in _positions(keys, n_bits, k):
                    np.bitwise_or.at(
                        arrs, (sh, pos >> 3), np.uint8(1) << (pos & 7).astype(np.uint8)
                    )
        yield pa.RecordBatch.from_arrays([pa.array([arrs.tobytes()])], names=["plane"])

    planes = src.mapInArrow(part_build, "plane binary")
    zero = np.zeros((n_shards, n_bytes), dtype=np.uint8)
    return planes.rdd.treeAggregate(
        zero,
        lambda a, r: np.bitwise_or(
            a, np.frombuffer(r["plane"], dtype=np.uint8).reshape(n_shards, n_bytes)
        ),
        lambda a, b: np.bitwise_or(a, b),
        depth=depth,
    )


def or_in_collected(
    bits: np.ndarray, rows, n_bits: int, k: int
) -> np.ndarray:
    """Driver-side OR-in of collected (shard, key) rows — the small-delta
    fast path (one collect job, no Python-RDD stages).  The distributed
    ``build_bloom_sharded`` path is for deltas too big to collect.

    ``rows`` is either a sequence of (shard, key) tuples or a pandas frame
    with ``shard``/``key`` columns (the Arrow ``toPandas`` transfer — no
    per-row py4j deserialization)."""
    if hasattr(rows, "columns"):
        if not len(rows):
            return bits
        sh = rows["shard"].to_numpy(dtype=np.int64)
        keys = rows["key"].to_numpy(dtype=np.int64)
        for pos in _positions(keys, n_bits, k):
            np.bitwise_or.at(bits, (sh, pos >> 3), np.uint8(1) << (pos & 7).astype(np.uint8))
        return bits
    if not rows:
        return bits
    sh = np.fromiter((r[0] for r in rows), dtype=np.int64)
    keys = np.fromiter((r[1] for r in rows), dtype=np.int64)
    for pos in _positions(keys, n_bits, k):
        np.bitwise_or.at(bits, (sh, pos >> 3), np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits


def contains_udf(spark: SparkSession, bits: np.ndarray, n_bits: int, k: int = 5):
    """Arrow-vectorized membership test against a broadcast filter.

    Accepts a flat (1-shard) or (n_shards, n_bytes) plane; the returned UDF
    takes (key, shard) series.
    """
    if bits.ndim == 1:
        bits = bits[None, :]
    bc = spark.sparkContext.broadcast(bits)

    @F.pandas_udf("boolean")
    def maybe_seen(keys: pd.Series, shards: pd.Series) -> pd.Series:
        arr = bc.value
        kv = keys.to_numpy(dtype=np.int64)
        sh = shards.to_numpy(dtype=np.int64)
        out = np.ones(len(kv), dtype=bool)
        for pos in _positions(kv, n_bits, k):
            out &= (arr[sh, pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return pd.Series(out)

    return maybe_seen


def split_by_bloom(
    spark: SparkSession,
    candidates: DataFrame,
    bits: np.ndarray,
    n_bits: int = 1 << 24,
    k: int = 5,
    key_expr=None,
    shard_expr=None,
):
    """(definitely_new, maybe_seen) split of candidate URL rows."""
    # built-in xxhash64 (JVM-side, seed 42) — bloom keys need uniformity,
    # not reference parity, so the native hash is the right tool here
    key_expr = key_expr if key_expr is not None else F.xxhash64("origin_id", "path_id")
    n_shards = 1 if bits.ndim == 1 else bits.shape[0]
    if shard_expr is None:
        shard_expr = F.pmod(F.col("origin_id"), F.lit(n_shards)) if n_shards > 1 else F.lit(0)
    probe = contains_udf(spark, bits, n_bits, k)
    tagged = candidates.withColumn(
        "__maybe", probe(key_expr.cast("long"), shard_expr.cast("long"))
    )
    return tagged.filter(~F.col("__maybe")).drop("__maybe"), tagged.filter(
        F.col("__maybe")
    ).drop("__maybe")


def bloom_stats(
    spark: SparkSession,
    keys: DataFrame,
    probe_hit: DataFrame,
    probe_miss: DataFrame,
    n_bits: int = 1 << 22,
    k: int = 5,
) -> DataFrame:
    """Deterministic accuracy report (the rows-only correctness entry):
    every inserted key must hit; FP rate on misses must be tiny."""
    bits = build_bloom(keys, "key", n_bits, k)
    probe = contains_udf(spark, bits, n_bits, k)
    zero = F.lit(0).cast("long")
    n_keys = keys.count()
    hit_found = probe_hit.withColumn("m", probe(F.col("key"), zero)).filter("m").count()
    n_hit = probe_hit.count()
    miss_found = probe_miss.withColumn("m", probe(F.col("key"), zero)).filter("m").count()
    n_miss = probe_miss.count()
    return spark.createDataFrame(
        [
            (
                int(n_keys),
                int(n_bits),
                int(k),
                int(n_hit),
                int(hit_found),
                int(n_miss),
                int(miss_found),
                bool(hit_found == n_hit),
            )
        ],
        "n_keys long, n_bits long, k long, probes_in long, probes_in_found long, "
        "probes_out long, false_positives long, no_false_negatives boolean",
    )
