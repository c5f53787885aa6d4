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


def test_aimd_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState AIMD == the declarative lag-window batch
    equivalent, with state carried across micro-batches (one wave per
    trigger via maxFilesPerTrigger=1)."""
    import os

    from chronicrawl_spark.streaming.aimd_stream import aimd_batch, aimd_stream

    MIN_MS, MAX_MS = 60_000, 3_600_000
    # 6 locations × 5 waves; unchanged flag varies deterministically; wave
    # gaps vary so halving/doubling and both clamps are exercised
    waves_dir = str(tmp_path / "visit_events")
    os.makedirs(waves_dir)
    t = T0
    all_rows = []
    for wave in range(5):
        t += [30_000, 90_000, 400_000, 7_200_000, 120_000][wave]
        rows = [
            (1000 + loc, 2000 + loc, t + loc, (wave + loc) % 2 == 0)
            for loc in range(6)
        ]
        all_rows += rows
        df = spark.createDataFrame(
            rows, "origin_id long, path_id long, date long, unchanged boolean"
        )
        df.coalesce(1).write.parquet(f"{waves_dir}/w{wave}")
    # flatten: the file source lists leaf files; one parquet file per wave
    files = sorted(
        f"{waves_dir}/w{w}/{f}"
        for w in range(5)
        for f in os.listdir(f"{waves_dir}/w{w}")
        if f.endswith(".parquet")
    )

    stream = (
        spark.readStream.schema("origin_id long, path_id long, date long, unchanged boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{waves_dir}/w*")
    )
    q = (
        aimd_stream(stream, MIN_MS, MAX_MS)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("aimd_stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(files) == 5  # 5 micro-batches -> state genuinely crossed triggers

    streamed = {
        (r["origin_id"], r["path_id"], r["date"]): r["next_visit_aimd"]
        for r in spark.sql("SELECT * FROM aimd_stream_out").collect()
    }
    events = spark.createDataFrame(
        all_rows, "origin_id long, path_id long, date long, unchanged boolean"
    )
    batched = {
        (r["origin_id"], r["path_id"], r["date"]): r["next_visit_aimd"]
        for r in aimd_batch(events, MIN_MS, MAX_MS).collect()
    }
    assert len(streamed) == 30
    assert streamed == batched
    # spot invariants: first visit of each location emits null; a 7.2e6 ms
    # doubled gap hits the MAX clamp; a 60 s halved gap hits the MIN clamp
    assert sum(1 for v in streamed.values() if v is None) == 6


def test_aimd_stream_resumes_from_checkpoint(spark, tmp_path):
    """Stop the AIMD stream after 2 waves, deliver 2 more, restart with the
    SAME checkpoint: state (each location's last visit) must carry across
    the restart — outputs equal the batch twin over all 4 waves, and the
    post-restart rows must NOT be first-visit nulls.  Uses the file sink
    (the memory sink does not support checkpoint recovery)."""
    import os

    from chronicrawl_spark.streaming.aimd_stream import aimd_batch, aimd_stream

    MIN_MS, MAX_MS = 60_000, 3_600_000
    waves_dir, ckpt = str(tmp_path / "events"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    os.makedirs(waves_dir)
    t, all_rows = T0, []

    def write_wave(wave, gap):
        nonlocal t
        t += gap
        rows = [(1 + loc, 10 + loc, t + loc, loc % 2 == 0) for loc in range(4)]
        all_rows.extend(rows)
        spark.createDataFrame(
            rows, "origin_id long, path_id long, date long, unchanged boolean"
        ).coalesce(1).write.parquet(f"{waves_dir}/w{wave}")

    def run_available():
        stream = (
            spark.readStream.schema(
                "origin_id long, path_id long, date long, unchanged boolean"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{waves_dir}/w*")
        )
        q = (
            aimd_stream(stream, MIN_MS, MAX_MS)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_wave(0, 120_000)
    write_wave(1, 240_000)
    run_available()  # first incarnation: 2 micro-batches, then stops
    assert spark.read.parquet(out_dir).count() == 8
    wave2_start = t + 480_000  # wave 2's base date: the next gap is 480 s

    write_wave(2, 480_000)
    write_wave(3, 90_000)
    run_available()  # second incarnation resumes from the same checkpoint

    outs = {
        (r["origin_id"], r["path_id"], r["date"]): r["next_visit_aimd"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert len(outs) == 16  # no duplicates: waves 0-1 not reprocessed
    # post-restart rows must not be first-visit nulls — proof the per-key
    # last-visit state survived the restart
    post = {k: v for k, v in outs.items() if k[2] >= wave2_start}
    assert len(post) == 8 and all(v is not None for v in post.values())
    events = spark.createDataFrame(
        all_rows, "origin_id long, path_id long, date long, unchanged boolean"
    )
    batched = {
        (r["origin_id"], r["path_id"], r["date"]): r["next_visit_aimd"]
        for r in aimd_batch(events, MIN_MS, MAX_MS).collect()
    }
    assert outs == batched
