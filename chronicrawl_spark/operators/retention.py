"""Keep-newest-K retention windows (A3/W3/W8).

The reference expires screenshots beyond the newest K per location
(``Database.java:455-474``), pages visit history newest-first
(``Database.java:357-360``, W3), and surfaces the most recent screenshot
per location for the UI (``Database.java:467-473``, W8).  All three are the
same declarative shape: a row_number window per key ordered newest-first.

Scale: the window partitions by the location key — uniform xxh64 keyspace,
no skew; one shuffle, map-side nothing to combine (row_number needs the
full group, which is ≤ history-per-URL, bounded by retention itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_newest_k(
    df: DataFrame, partition_cols: list, order_cols: list, k: int, rank_col: str = "rn"
) -> DataFrame:
    """Rows ranked newest-first per key, keeping rank <= k.

    ``order_cols`` are Columns (callers pass explicit ``.desc()`` chains so
    the reference tie-breaks are visible at the call site).
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w).cast("long")).filter(
        F.col(rank_col) <= k
    )


def newest_per_key(df: DataFrame, partition_cols: list, order_cols: list) -> DataFrame:
    """W8 (``Database.java:467-473``): the single most recent row per key
    (screenshot recency view)."""
    return keep_newest_k(df, partition_cols, order_cols, 1).drop("rn")


def expiry_counts(df: DataFrame, partition_cols: list, keep: int) -> DataFrame:
    """A3 (``Database.java:455-474``): per-key totals and how many rows fall
    past the newest-``keep`` retention horizon."""
    return (
        df.groupBy(*partition_cols)
        .agg(F.count("*").alias("n_total"))
        .withColumn("n_expired", F.greatest(F.col("n_total") - keep, F.lit(0)))
    )
