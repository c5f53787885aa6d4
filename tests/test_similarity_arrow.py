"""The Arrow-matmul banded LSH must bucket every vector identically to the
JVM-expression reference implementation (same md5-derived hyperplanes, same
sign decisions) — otherwise the DuckDB oracle's literal-array SQL and the
Spark path would drift apart silently."""

import pytest

SF = "/root/testdata/sf0.001"


def test_banded_buckets_arrow_matches_expr(spark):
    from chronicrawl_spark.extras.similarity import (
        _banded_lsh_buckets_expr,
        banded_lsh_buckets,
    )

    e = spark.read.parquet(SF + "/embeddings.parquet")
    arrow = banded_lsh_buckets(e, bands=3, rows_per_band=8)
    expr = _banded_lsh_buckets_expr(e, bands=3, rows_per_band=8)
    # nullability differs (mapInArrow outputs are nullable); names+types must match
    assert [(f.name, f.dataType) for f in arrow.schema.fields] == [
        (f.name, f.dataType) for f in expr.schema.fields
    ]
    assert arrow.count() == e.count() * 3
    # symmetric difference must be empty
    assert arrow.exceptAll(expr).count() == 0
    assert expr.exceptAll(arrow).count() == 0


def test_banded_buckets_arrow_handles_sliced_batches(spark):
    # a filtered/limited input exercises non-zero list offsets in flatten()
    from chronicrawl_spark.extras.similarity import (
        _banded_lsh_buckets_expr,
        banded_lsh_buckets,
    )
    from pyspark.sql import functions as F

    e = spark.read.parquet(SF + "/embeddings.parquet").filter(
        F.col("vec_id") % 7 == 3
    )
    if e.count() == 0:
        pytest.skip("fixture too small")
    arrow = banded_lsh_buckets(e, bands=2, rows_per_band=6)
    expr = _banded_lsh_buckets_expr(e, bands=2, rows_per_band=6)
    assert arrow.exceptAll(expr).count() == 0
    assert expr.exceptAll(arrow).count() == 0
