"""WARC export/import throughput at bench scale.

Builds a crawled store with the same synthetic frontier the crawl bench
uses (real image+caption payloads through the full wave engine), then
times:

- ``warc_export``: store → .warc.gz blobs (forced by a sum over the
  output sizes — blobs never reach the driver),
- ``save_warc_files`` + ``warc_import``: the written files read back via
  ``binaryFile`` into the warc_records shape.

Reports records/s and payload MB/s for each leg plus a roundtrip count
check.  One JSON line to stdout, mirroring bench.py's protocol.

Usage: SPARK_GRAFT_CPUS=16 python scripts/warc_bench.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main():
    from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
    from chronicrawl_spark.fixtures import synthetic_frontier, synthetic_site_for_frontier
    from chronicrawl_spark.session import get_spark
    from chronicrawl_spark.tables import StateStore
    from chronicrawl_spark.warcfile import save_warc_files, warc_export, warc_import

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    waves = int(os.environ.get("WARC_BENCH_WAVES", "3"))
    spark = get_spark("warc-bench", cpus=cpus)

    now = 1_600_000_000_000
    tmp = tempfile.mkdtemp(prefix="warc_bench_")
    store = StateStore(spark, os.path.join(tmp, "state"), buckets=32)
    origins, frontier = synthetic_frontier(spark, 2000, 50, now)
    store.merge("origins", origins, "upsert")
    store.merge("frontier", frontier, "upsert")
    store.commit(0)
    site = synthetic_site_for_frontier(spark, 2000)
    engine = CrawlEngine(
        spark, store, site, CrawlConfig(dedupe_server=False, dedupe_digest=False)
    )
    engine.clock = now
    for _ in range(waves):
        engine.step(per_host_k=30)

    records = store.read("warc_records")
    n_records = records.count()
    payload_mb = (records.agg(F.sum(F.length("payload"))).collect()[0][0] or 0) / 1e6

    t0 = time.time()
    files = warc_export(records, store.read("visits"))
    agg = files.agg(
        F.count("*"), F.sum("n_records"), F.sum("n_bytes")
    ).collect()[0]
    t_export = time.time() - t0

    out_dir = os.path.join(tmp, "warcs")
    t0 = time.time()
    n_files = save_warc_files(warc_export(records, store.read("visits")), out_dir)
    t_save = time.time() - t0

    t0 = time.time()
    blobs = spark.read.format("binaryFile").load(out_dir).select(
        F.col("content").alias("data")
    )
    n_imported = warc_import(blobs).count()
    t_import = time.time() - t0

    print(json.dumps({
        "records": n_records,
        "payload_mb": round(payload_mb, 1),
        "export": {
            "secs": round(t_export, 2),
            "files": agg[0],
            "records_out": agg[1],
            "warc_gz_mb": round((agg[2] or 0) / 1e6, 1),
            "records_per_sec": round(n_records / t_export, 0),
            "warc_gz_mb_per_sec": round((agg[2] or 0) / 1e6 / t_export, 1),
        },
        "save_secs": round(t_save, 2),
        "import": {
            "secs": round(t_import, 2),
            "files": n_files,
            "records_in": n_imported,
            "records_per_sec": round(n_imported / t_import, 0),
        },
        "roundtrip_count_match": bool(n_imported == n_records == agg[1]),
        "cpus": cpus,
        "waves": waves,
    }))


if __name__ == "__main__":
    main()
