"""Arrow-vectorized Spark UDFs for URL identity + canonicalization.

All Python↔JVM crossings in the engine go through these pandas UDFs
(Arrow batch transfer) — never row-at-a-time ``F.udf``.  The hot path
(frontier merge identity) is one UDF call producing a struct of all
derived columns so each URL is parsed and hashed exactly once per batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import urlkit
from .hashing import hash_str

URL_PARTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("origin", T.StringType()),
        T.StructField("pathref", T.StringType()),
        T.StructField("origin_id", T.LongType()),
        T.StructField("path_id", T.LongType()),
        T.StructField("url_id", T.LongType()),
        T.StructField("ssurt", T.StringType()),
    ]
)


@F.pandas_udf(URL_PARTS_SCHEMA)
def url_parts(urls: pd.Series) -> pd.DataFrame:
    """Canonicalize (WHATWG subset, fragment-stripped — ref ``Url.java:21-24``,
    ``Analysis.java:70-73``) and derive all identity columns
    (ref ``Url.java:30-66``: xxh64 seed 0 of url/origin/pathref)."""
    rows = urlkit.batch_parts(urls.tolist())
    return pd.DataFrame(
        rows, columns=["url", "origin", "pathref", "origin_id", "path_id", "url_id", "ssurt"]
    )


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return pd.Series(urlkit.batch_canonicalize(urls.tolist()))


@F.pandas_udf(T.LongType())
def xxh64_str(strings: pd.Series) -> pd.Series:
    """Signed xxh64(utf8, seed=0) — reference ID hash (``Url.java:47-50``)."""
    return pd.Series(
        [hash_str(s) if s is not None else None for s in strings.tolist()], dtype="object"
    )


@F.pandas_udf(T.StringType())
def resolve_udf(bases: pd.Series, refs: pd.Series) -> pd.Series:
    """Relative URL resolution (ref ``Url.java:52-54``)."""
    out = []
    for b, r in zip(bases.tolist(), refs.tolist()):
        if b is None or r is None:
            out.append(None)
        else:
            try:
                out.append(urlkit.resolve(b, r))
            except ValueError:
                out.append(None)
    return pd.Series(out)
