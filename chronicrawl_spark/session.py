"""SparkSession factory with scale-oriented defaults.

Tuned for the sandbox (``local[N]``, single JVM) but every knob is the one
you would set on a 1000-executor cluster:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- shuffle partitions sized to parallelism, not the 200 default
- Arrow enabled for every pandas-UDF crossing
- UTC session timezone (the reference stores epoch-millis; parity requires
  no local-zone drift)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "chronicrawl-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    master: str | None = None,
) -> SparkSession:
    """``master`` overrides ``local[cpus]`` — e.g. ``local-cluster[4,8,6144]``
    for multi-executor-JVM runs (the scaling-evidence harness)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 2× cores: AQE coalesces excess partitions for free, but a shuffle
        # planned with too few can never use the cores (scaling ceiling)
        shuffle_partitions = 2 * cpus
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # snappy, not zstd: state buckets are rewritten every wave (hot
        # data) — encode speed dominates size; zstd encode was a measured
        # non-scaling cost in the N→4N profile
        .config("spark.sql.parquet.compression.codec", "snappy")
        # dynamic partition overwrite: state-table commits rewrite only the
        # hash buckets a wave touched (Iceberg-MERGE analog, see tables.py)
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # state-table bucket files are ~10-30 MB zstd; the 128 MB default
        # packs several per input split and caps scan parallelism below the
        # core count — the N→4N profile showed 5-task scans on 16 cores
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(32 * 1024 * 1024))
        # past this many values Spark degrades a parquet In-pushdown to a
        # min/max range — useless for uniformly-hashed origin_ids.  The
        # per-wave history reads push isin(wave origin_ids) into the scan so
        # key-sorted row groups inside touched buckets get skipped (see
        # tables.append clustering).  CAUTION: the pushed In is a nested
        # Or-chain evaluated recursively per row group — thousands of values
        # StackOverflowError the scan task (measured at 2000); crawl.py caps
        # the pushed list at WAVE_HOST_IDS_CAP=256, and this threshold stays
        # just above that cap
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "300")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
