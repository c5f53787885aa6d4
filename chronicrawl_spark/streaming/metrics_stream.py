"""Structured Streaming over the engine's append-only tables (§2.8).

The reference's crawl loop is sequential (``Crawl.java:133-137``) and its
only windowed computation is the metrics bucketing (A1, ``Database.java:
435-440``).  The engine's wave loop is a driver-side micro-batch by design
(a self-feeding frontier doesn't fit Structured Streaming's stateful
operators — SURVEY §2.8), but its **append-only outputs are streams**:
every committed wave adds parquet files under ``visits/wave=N/``, which is
exactly the file-streaming-source contract.

``stream_visit_metrics`` tails the visits table and maintains the A1
time-bucketed metrics continuously — windowed event-time aggregation with
a watermark for late waves (virtual clocks can interleave when multiple
crawls share a store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import VISITS_SCHEMA


def visit_stream(spark: SparkSession, store_root: str) -> DataFrame:
    """readStream over the visits table (new wave dirs are discovered as
    they are committed)."""
    return (
        spark.readStream.schema(VISITS_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        # visits waves are bucketed by pmod(origin_id, B) — glob to the leaf
        # dirs so partition discovery never mixes wave=/bucket= levels
        .parquet(f"{store_root}/visits/wave=*/bucket=*")
    )


def visit_metrics_stream(
    visits: DataFrame, window: str = "1 hour", watermark: str = "1 day"
) -> DataFrame:
    """A1 as a streaming windowed aggregation: count + bytes per event-time
    window of the visit date, watermarked for late data."""
    return (
        visits.withColumn("ts", F.timestamp_millis(F.col("date")))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count("*").alias("visits"),
            F.sum(F.coalesce(F.col("content_length"), F.lit(0))).alias("bytes"),
            F.sum(F.when(F.col("status") < 0, 1).otherwise(0)).alias("errors"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("bucket_ms"), "visits", "bytes", "errors"
        )
    )


def run_metrics_stream_once(spark: SparkSession, store_root: str, query_name: str) -> None:
    """Drain everything currently committed (Trigger.AvailableNow) into an
    in-memory table ``query_name`` — the batch/stream parity harness."""
    agg = visit_metrics_stream(visit_stream(spark, store_root))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
