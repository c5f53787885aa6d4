"""Streaming/batch parity: the streaming A1 metrics over the visits table
must equal the batch windowed aggregation over the same snapshot."""

import pyspark.sql.functions as F

from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
from chronicrawl_spark.fixtures import test_server_site as make_site
from chronicrawl_spark.streaming.metrics_stream import run_metrics_stream_once, visit_metrics_stream
from chronicrawl_spark.tables import StateStore

T0 = 1_600_000_000_000


def test_streaming_metrics_match_batch(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "state"), buckets=4)
    engine = CrawlEngine(spark, store, make_site(spark, "http://test.example"), CrawlConfig())
    engine.add_seeds(["http://test.example"], now=T0)
    engine.run(max_waves=9, k_origins=1, per_host_k=1)

    run_metrics_stream_once(spark, store.root, "stream_metrics")
    streamed = {
        r["bucket_ms"]: (r["visits"], r["bytes"], r["errors"])
        for r in spark.sql("SELECT * FROM stream_metrics").collect()
    }

    batch = (
        store.read("visits")
        .withColumn("ts", F.timestamp_millis(F.col("date")))
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("visits"),
            F.sum(F.coalesce(F.col("content_length"), F.lit(0))).alias("bytes"),
            F.sum(F.when(F.col("status") < 0, 1).otherwise(0)).alias("errors"),
        )
        .select(F.unix_millis(F.col("w.start")).alias("bucket_ms"), "visits", "bytes", "errors")
        .collect()
    )
    batched = {r["bucket_ms"]: (r["visits"], r["bytes"], r["errors"]) for r in batch}
    assert streamed == batched
    assert sum(v[0] for v in streamed.values()) == 7  # all 7 fixture visits
    assert sum(v[2] for v in streamed.values()) == 1  # the robots-denied one
