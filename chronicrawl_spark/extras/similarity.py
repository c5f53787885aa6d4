"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

- ``cosine_topk``: brute-force exact cosine top-k — the correctness
  baseline.  All arithmetic is JVM-side (``zip_with`` + ``aggregate``
  higher-order functions); one pass, one global top-k (no shuffle of the
  vectors themselves, only of k candidates per partition via takeOrdered
  semantics in the sort).
- ``lsh_buckets`` / ``ann_topk``: the scale path — deterministic sign-LSH
  (integer hyperplanes precomputed from md5(bit, dim) and embedded as
  literal arrays so the DuckDB oracle reproduces them bit-for-bit), bucket
  join to candidates, exact rerank within bucket.  At 100 TB the bucket
  join replaces the all-pairs scan; bucket keys are uniform so the join is
  skew-free.
- ``banded_lsh_buckets``: B bands × r bits — the multi-table LSH shape the
  text dedup already uses.  A single wide bucket caps recall AND leaves
  per-bucket population O(N/2^bits); bands bound both (union of band
  matches lifts recall, each band is selective).

Earlier rounds derived hyperplane components from a closed-form
``((i*31 + b*17) % 7) - 3``: any polynomial in the bit index mod 7 has
period 7, so only 7 distinct hyperplanes existed no matter how many bits —
bit 7 duplicated bit 0 (the "8-bit" bucket was really 7 bits).  The
md5-derived matrix gives genuinely independent planes (verified:
24 distinct at 24 bits, planted cos≥0.997 pairs all survive 3×8 banding).
"""

from __future__ import annotations

import functools
import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BITS = 8
DIM = 64  # embeddings table vector width (TESTDATA.md)


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the session parallelism when the scan
    landed on fewer partitions (a single small parquet file = one row group
    = ONE task): the per-vector dot-product folds and the Arrow matmul
    projections would otherwise run single-core.  No-op at scale."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


@functools.lru_cache(maxsize=None)
def hyperplane(b: int, dim: int = DIM) -> tuple:
    """Deterministic integer hyperplane for sign bit ``b``: component i =
    (md5("hp{b}_{i}")[:4] as int) % 7 - 3 ∈ [-3, 3].  Precomputed in Python
    and embedded as literals on both engines (Spark and the DuckDB oracle),
    so no engine-specific RNG is involved."""
    return tuple(
        int(hashlib.md5(f"hp{b}_{i}".encode()).hexdigest()[:4], 16) % 7 - 3
        for i in range(dim)
    )


def _hp_array(b: int, dim: int = DIM):
    return F.array(*[F.lit(float(v)) for v in hyperplane(b, dim)])


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0).cast("double"), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda s, x: s + x * x))


def query_vector(embeddings: DataFrame) -> DataFrame:
    """Deterministic query = the embedding with the smallest vec_id (so the
    DuckDB oracle can derive the identical query)."""
    return embeddings.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qvec"))


def cosine_topk(embeddings: DataFrame, k: int = 20) -> DataFrame:
    """Exact cosine top-k vs the deterministic query vector."""
    q = query_vector(embeddings)
    scored = embeddings.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(
            _dot(F.col("embedding"), F.col("qvec"))
            / (_norm(F.col("embedding")) * _norm(F.col("qvec")))
            * 1e6
        )
        .cast("long")
        .alias("cos_e6"),
    )
    return scored.orderBy(F.col("cos_e6").desc(), F.col("vec_id").asc()).limit(k)


def _sign_bits(first_bit: int, n_bits: int, dim: int = DIM):
    """Packed sign bits of the projections onto hyperplanes
    [first_bit, first_bit + n_bits) — JVM-side zip_with/aggregate only."""
    bucket = F.lit(0).cast("long")
    for j in range(n_bits):
        proj = _dot(F.col("embedding"), _hp_array(first_bit + j, dim))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def lsh_buckets(embeddings: DataFrame, n_bits: int = N_BITS, dim: int = DIM) -> DataFrame:
    """Sign-LSH bucket id per vector (n_bits-bit integer)."""
    out = embeddings.select("vec_id", "embedding")
    return out.select("vec_id", _sign_bits(0, n_bits, dim).alias("bucket"))


def _banded_lsh_buckets_expr(
    embeddings: DataFrame, bands: int = 3, rows_per_band: int = 8, dim: int = DIM
) -> DataFrame:
    """JVM-expression reference implementation of the banded buckets —
    bands × rows_per_band ``aggregate(zip_with(...))`` dot products per
    vector.  Kept as the semantic spec the Arrow path is tested against
    (tests/test_similarity_arrow.py)."""
    per_band = F.array(
        *[
            F.struct(
                F.lit(t).alias("band"),
                _sign_bits(t * rows_per_band, rows_per_band, dim).alias("bucket"),
            )
            for t in range(bands)
        ]
    )
    return embeddings.select("vec_id", F.explode(per_band).alias("bb")).select(
        "vec_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def banded_lsh_buckets(
    embeddings: DataFrame, bands: int = 3, rows_per_band: int = 8, dim: int = DIM
) -> DataFrame:
    """(vec_id, band, bucket) rows — band t packs the sign bits of
    hyperplanes [t*r, (t+1)*r).  Candidates = pairs sharing ANY band
    bucket, exactly the banded-minhash shape the text dedup uses —
    per-band selectivity stays O(N/2^r) while the band union lifts recall.

    All bands' projections are ONE Arrow-batched numpy matmul
    ((N×dim)·(dim×bands·r)) instead of bands·r separate JVM
    ``aggregate(zip_with(...))`` fold expressions per row — the folds cost
    O(bits·dim) interpreted Catalyst ops per row and were 2.4× the round-2
    single-band runtime; the matmul is BLAS.  Same md5-derived literal
    hyperplanes, so the DuckDB oracle is unchanged (dot-sum association
    differs — float64 keeps the sign decision far above rounding noise,
    and the Arrow↔expression equivalence is pinned by test).
    """
    import numpy as np
    import pyarrow as pa

    n_bits = bands * rows_per_band
    hmat = np.array([hyperplane(b, dim) for b in range(n_bits)], dtype=np.float64).T
    weights = (1 << np.arange(rows_per_band, dtype=np.int64))

    def project(batches):
        band_ids = np.arange(bands, dtype=np.int32)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            vec_ids = np.asarray(batch.column("vec_id"))
            # flatten() honors list offsets (sliced batches); fixed dim → reshape
            flat = np.asarray(batch.column("embedding").flatten(), dtype=np.float64)
            bits = (flat.reshape(n, dim) @ hmat) >= 0.0
            buckets = np.empty((n, bands), dtype=np.int64)
            for t in range(bands):
                buckets[:, t] = bits[:, t * rows_per_band : (t + 1) * rows_per_band] @ weights
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(vec_ids, bands), type=pa.int64()),
                    pa.array(np.tile(band_ids, n), type=pa.int32()),
                    pa.array(buckets.reshape(-1), type=pa.int64()),
                ],
                names=["vec_id", "band", "bucket"],
            )

    return embeddings.select("vec_id", "embedding").mapInArrow(
        project, "vec_id long, band int, bucket long"
    )


def ann_topk_multi(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5, bands: int = 3, rows_per_band: int = 8
) -> DataFrame:
    """Multi-query ANN — the shape a training-data pipeline actually runs:
    a query SET joins the **banded** bucketed corpus ((band, bucket) ⨝
    (band, bucket), no cross join), exact cosine rerank per query via one
    window.  Bands instead of one wide bucket: each band is selective
    (2^r buckets) while the band union lifts recall — a single missed sign
    bit no longer hides a true neighbor.

    The query set is deterministic (n_queries smallest vec_ids) so the
    DuckDB oracle derives the identical queries.  The query side is tiny →
    broadcast: the corpus never shuffles for the candidate join; only the
    per-bucket candidates shuffle for the per-query top-k window.
    """
    from pyspark.sql import Window

    buckets = banded_lsh_buckets(embeddings, bands, rows_per_band)
    qids = (
        embeddings.orderBy("vec_id")
        .limit(n_queries)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    )
    qbuckets = qids.join(buckets, qids["qid"] == buckets["vec_id"]).select(
        "qid", "qvec", F.col("band").alias("qband"), F.col("bucket").alias("qbucket")
    )
    cand = (
        buckets.join(
            F.broadcast(qbuckets),
            (buckets["band"] == F.col("qband")) & (buckets["bucket"] == F.col("qbucket")),
        )
        .select("qid", "qvec", "vec_id")
        .dropDuplicates(["qid", "vec_id"])
    )
    scored = cand.join(embeddings, "vec_id").select(
        "qid",
        "vec_id",
        F.round(
            _dot(F.col("embedding"), F.col("qvec"))
            / (_norm(F.col("embedding")) * _norm(F.col("qvec")))
            * 1e6
        )
        .cast("long")
        .alias("cos_e6"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_e6").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "cos_e6", "rn")
    )


def ivf_assign(embeddings: DataFrame, n_clusters: int = 16) -> DataFrame:
    """IVF coarse-quantizer assignment: nearest centroid per vector.

    Centroids are deterministic — the ``n_clusters`` smallest vec_ids ARE
    the centroid vectors (sample-as-centroid quantizer), so the DuckDB
    oracle derives identical centroids with no k-means RNG.  On a real
    corpus the centroid table would come from a trained quantizer; the
    assignment/probe plan below is unchanged by where centroids come from.

    Plan shape (the part that matters at 100 TB): the centroid set is
    collapsed to ONE broadcast row carrying an array<struct{cid, cvec}>,
    and the argmax over centroids is a JVM higher-order fold per vector —
    the corpus is scored and assigned in a single narrow map stage with
    ZERO shuffle (the classic IVF assignment is a broadcast matmul; this
    is its Catalyst HOF equivalent).  Scores are e6-rounded BIGINTs with a
    cid-ascending tie-break so both engines pick the same centroid.
    """
    cents = (
        embeddings.orderBy("vec_id")
        .limit(n_clusters)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
        .groupBy()
        .agg(F.collect_list(F.struct("cid", "cvec")).alias("cents"))
    )
    scored = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            F.round(
                _dot(F.col("embedding"), c["cvec"])
                / (_norm(F.col("embedding")) * _norm(c["cvec"]))
                * 1e6
            )
            .cast("long")
            .alias("s"),
            c["cid"].alias("cid"),
        ),
    )
    best = F.aggregate(
        scored,
        F.struct(F.lit(-2_000_000).cast("long").alias("s"), F.lit(-1).cast("long").alias("cid")),
        lambda acc, x: F.when(
            (x["s"] > acc["s"]) | ((x["s"] == acc["s"]) & (x["cid"] < acc["cid"])), x
        ).otherwise(acc),
    )
    return embeddings.crossJoin(F.broadcast(cents)).select(
        "vec_id", "embedding", best["cid"].alias("cid")
    )


def ivf_topk(
    embeddings: DataFrame, k: int = 10, n_clusters: int = 16, n_probe: int = 8
) -> DataFrame:
    """IVF-Flat ANN: probe the ``n_probe`` centroids nearest the query,
    exact-rerank the vectors assigned to those clusters.

    The scale path next to sign-LSH (``ann_topk``): assignment is a
    shuffle-free broadcast fold (``ivf_assign``), the probe list is a tiny
    broadcast semi-join, and the rerank touches only ~n_probe/n_clusters of
    the corpus.  Returns (vec_id, cos_e6) — top-k of the probed set, the
    contract the oracle mirrors.  Recall is data-dependent (IVF partitions
    the space; isotropic random vectors spread true neighbors across all
    cells — real embedding corpora cluster), hence the generous default
    n_probe; tests/test_dedup_recall.py pins measured recall vs the exact
    baseline on the synthetic corpus.
    """
    q = query_vector(embeddings)
    embeddings = _spread(embeddings)
    assigned = ivf_assign(embeddings, n_clusters)
    cents = (
        embeddings.orderBy("vec_id")
        .limit(n_clusters)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "cid",
            F.round(_dot(F.col("cvec"), F.col("qvec")) / (_norm(F.col("cvec")) * _norm(F.col("qvec"))) * 1e6)
            .cast("long")
            .alias("s"),
        )
        .orderBy(F.col("s").desc(), F.col("cid").asc())
        .limit(n_probe)
        .select("cid")
    )
    cand = assigned.join(F.broadcast(probe), "cid", "left_semi")
    return (
        cand.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("qvec"))
                / (_norm(F.col("embedding")) * _norm(F.col("qvec")))
                * 1e6
            )
            .cast("long")
            .alias("cos_e6"),
        )
        .orderBy(F.col("cos_e6").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def ann_topk(embeddings: DataFrame, k: int = 10, bands: int = 3, rows_per_band: int = 8) -> DataFrame:
    """ANN: candidates = any banded-LSH bucket shared with the query →
    exact rerank (band union lifts recall over the old single wide bucket).

    Approximate by design (bands may miss true neighbors); the exactness
    contract is only "top-k of the candidate set", which the oracle mirrors.
    """
    q = query_vector(embeddings)
    qid = embeddings.orderBy("vec_id").limit(1).select("vec_id")
    buckets = banded_lsh_buckets(embeddings, bands, rows_per_band)
    qbucket = buckets.join(qid, "vec_id").select(
        F.col("band").alias("qband"), F.col("bucket").alias("qb")
    )
    cands = (
        buckets.join(
            F.broadcast(qbucket),
            (buckets["band"] == F.col("qband")) & (buckets["bucket"] == F.col("qb")),
        )
        .select("vec_id")
        .distinct()
    )
    scored = (
        embeddings.join(cands, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("qvec"))
                / (_norm(F.col("embedding")) * _norm(F.col("qvec")))
                * 1e6
            )
            .cast("long")
            .alias("cos_e6"),
        )
    )
    return scored.orderBy(F.col("cos_e6").desc(), F.col("vec_id").asc()).limit(k)
