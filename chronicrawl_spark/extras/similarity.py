"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

- ``cosine_topk``: brute-force exact cosine top-k — the correctness
  baseline.  All arithmetic is JVM-side (``zip_with`` + ``aggregate``
  higher-order functions); one pass, one global top-k (no shuffle of the
  vectors themselves, only of k candidates per partition via takeOrdered
  semantics in the sort).
- ``lsh_buckets`` / ``ann_topk``: the scale path — deterministic sign-LSH
  (integer hyperplanes derived from (dim_index, bit) so the oracle can
  reproduce them), bucket join to candidates, exact rerank within bucket.
  At 100 TB the bucket join replaces the all-pairs scan; bucket keys are
  uniform so the join is skew-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BITS = 8


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


def _hyperplane_sign(i, b):
    """Deterministic integer hyperplane component for dim i, bit b:
    ((i*31 + b*17) % 7) - 3 ∈ [-3, 3].  Reproducible in plain SQL."""
    return ((i * F.lit(31) + F.lit(b * 17)) % 7) - 3


def lsh_buckets(embeddings: DataFrame, n_bits: int = N_BITS) -> DataFrame:
    """Sign-LSH bucket id per vector (n_bits-bit integer)."""
    out = embeddings.select("vec_id", "embedding")
    bucket = F.lit(0).cast("long")
    for b in range(n_bits):
        proj = F.aggregate(
            F.transform(F.col("embedding"), lambda x, i: x * _hyperplane_sign(i, b).cast("double")),
            F.lit(0.0).cast("double"),
            lambda s, x: s + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return out.select("vec_id", bucket.alias("bucket"))


def ann_topk_multi(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5, n_bits: int = N_BITS
) -> DataFrame:
    """Multi-query ANN — the shape a training-data pipeline actually runs:
    a query SET joins the bucketed corpus (bucket ⨝ bucket, no cross join),
    exact cosine rerank per query via one window.

    The query set is deterministic (n_queries smallest vec_ids) so the
    DuckDB oracle derives the identical queries.  The query side is tiny →
    broadcast: the corpus never shuffles for the candidate join; only the
    per-bucket candidates shuffle for the per-query top-k window.
    """
    from pyspark.sql import Window

    buckets = lsh_buckets(embeddings, n_bits)
    qids = (
        embeddings.orderBy("vec_id")
        .limit(n_queries)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    )
    qbuckets = qids.join(buckets, qids["qid"] == buckets["vec_id"]).select(
        "qid", "qvec", F.col("bucket").alias("qbucket")
    )
    cand = buckets.join(
        F.broadcast(qbuckets), buckets["bucket"] == F.col("qbucket")
    ).select("qid", "qvec", "vec_id")
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


def ann_topk(embeddings: DataFrame, k: int = 10, n_bits: int = N_BITS) -> DataFrame:
    """ANN: candidates = same LSH bucket as the query → exact rerank.

    Approximate by design (bucket may miss true neighbors); the exactness
    contract is only "top-k of the candidate set", which the oracle mirrors.
    """
    buckets = lsh_buckets(embeddings, n_bits)
    q = query_vector(embeddings)
    qid = embeddings.orderBy("vec_id").limit(1).select("vec_id")
    qbucket = buckets.join(qid, "vec_id").select(F.col("bucket").alias("qb"))
    cands = buckets.join(F.broadcast(qbucket), buckets["bucket"] == F.col("qb")).select("vec_id")
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
