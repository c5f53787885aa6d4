"""Training-set selection and shard export over the image+caption table.

The last mile of the crawl→training-data pipeline: take the raw
input_hint-shaped table a crawl produced (image_id, bytes, w, h, fmt,
caption, phash), apply the standard LAION-style admission gates, and write
the surviving samples as dataloader-ready shards:

1. **Decode + invariant** — every payload is decoded by the from-scratch
   codecs and the decoded pixels' phash must equal the stored ``phash``
   column (the north-rule per-row invariant); undecodable or
   hash-mismatched rows are rejected with the decoder's error string.
   Quality metrics (brightness/contrast/entropy/sharpness/saturation)
   ride in the SAME fused Arrow stage — never decode twice
   (``imaging.decode_verify_thumbnails(with_quality=True)``).
2. **Quality gates** — optional min/max thresholds on any metric column
   plus a minimum caption word count; each reject row carries the first
   gate it failed.
3. **Near-dup dedup** — exact multi-index-Hamming phash pairs
   (``dedup.phash_dup_pairs``, 100% recall by pigeonhole) → distributed
   connected components → keep the min-id representative per cluster
   (``graph.dedup_clusters``).
4. **Shard export** — survivors are hashed into ``n_shards`` buckets on
   ``xxhash64(image_id)`` (uniform, deterministic — re-running the export
   on the same table writes identical shard membership), sorted by
   image_id inside each shard, and written either as one parquet file per
   shard (``fmt="parquet"``) or as WebDataset-style ``.tar`` shards
   (``fmt="tar"``: per sample a ``<key>.<ext>`` image entry + ``<key>.txt``
   caption entry, mtime=0 — byte-deterministic, readable by the public
   WebDataset/tarfile toolchain).  A driver-side ``_manifest.json`` records
   per-shard sample counts and byte sizes plus the reject tally by reason.

Scale notes (100 TB):
- The decode stage is a zero-shuffle ``mapInPandas`` over the payload
  partitions; only narrow columns (id, ok, metrics) leave it.
- Dedup runs over (image_id, phash) — 16 bytes/row — never the payloads.
- Payload bytes cross exactly ONE exchange: shard = f(image_id), so a
  cogroup on shard co-locates each payload with its kept-id row — the
  kept-filter is a local pandas isin inside the same shuffle that groups
  samples into shards (a semi-join-then-repartition would shuffle every
  payload twice).  The kept-id side carries ~30-byte rows.
- ``n_shards`` controls shard size; writers scale linearly with shards
  (same sharding shape as ``warcfile.warc_export``).

Ref analog: the reference archives every fetched body into WARCs
(``Storage.java:43-151``) but has no training-set notion; selection +
shard export is our training-pipeline extension over the paired table.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metric columns select_training_set accepts bounds for (plus caption_words)
METRIC_COLS = ("brightness", "contrast", "entropy", "sharpness", "saturation")

_EXT = {"jpeg": "jpg", "png": "png", "bmp": "bmp", "gif": "gif"}


def select_training_set(
    images: DataFrame,
    quality_bounds: dict | None = None,
    min_caption_words: int = 1,
    max_dist: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Admission pipeline → ``(kept, rejects)``.

    ``kept``: (image_id, caption) of every surviving sample — decodable,
    invariant-true, inside every quality bound, ≥ min_caption_words, and
    its near-dup cluster's min-id representative.

    ``rejects``: (image_id, reason) for every dropped sample — reason is
    ``decode:<error>``, ``invariant`` (decoded-pixel phash mismatch),
    ``quality:<metric>``, ``caption``, or ``dup:<kept image_id>`` (which
    sample it lost to), in that gate order.

    ``quality_bounds`` maps a metric name (METRIC_COLS) to (lo, hi);
    either bound may be None.  All gates run over the ONE fused
    decode+quality stage's output; the payload table is only consulted
    again by the exporter.
    """
    from chronicrawl_spark.extras.dedup import phash_dup_pairs
    from chronicrawl_spark.extras.graph import dedup_clusters
    from chronicrawl_spark.extras.imaging import decode_verify_thumbnails

    bounds = dict(quality_bounds or {})
    for k in bounds:
        if k not in METRIC_COLS:
            raise ValueError(f"unknown quality metric {k!r}; one of {METRIC_COLS}")

    # persist: every downstream branch (kept ids, reject tally, each CC
    # iteration through the dup pairs) re-evaluates this lineage, and its
    # root is the full-corpus DECODE — without the persist a 32k-image
    # export re-decoded the corpus ~4× (measured 69 s → 19 s at 16
    # cores).  The persisted frame is narrow (id + flags + 5 doubles);
    # payload bytes are not in it.  Left persisted for the caller's
    # actions on the returned frames; Spark's LRU evicts it under
    # pressure.
    stats = (
        decode_verify_thumbnails(images, with_quality=True)
        .select("image_id", "ok", "error", "caption", *METRIC_COLS)
        .persist()
    )

    # gate order is encoded as one CASE so each reject carries exactly the
    # FIRST gate it failed (decode → invariant → quality → caption)
    reason = F.when(
        F.col("error").isNotNull(), F.concat(F.lit("decode:"), F.col("error"))
    ).when(~F.col("ok"), F.lit("invariant"))
    for m in METRIC_COLS:
        if m not in bounds:
            continue
        lo, hi = bounds[m]
        if lo is not None:
            reason = reason.when(F.col(m) < F.lit(float(lo)), F.lit(f"quality:{m}"))
        if hi is not None:
            reason = reason.when(F.col(m) > F.lit(float(hi)), F.lit(f"quality:{m}"))
    # null/empty captions count 0 words (split("") yields [""], size 1)
    trimmed = F.trim(F.coalesce(F.col("caption"), F.lit("")))
    n_words = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    reason = reason.when(n_words < min_caption_words, F.lit("caption"))
    gated = stats.withColumn("_reason", reason)
    admitted = gated.filter(F.col("_reason").isNull()).select("image_id")
    gate_rejects = gated.filter(F.col("_reason").isNotNull()).select(
        "image_id", F.col("_reason").alias("reason")
    )

    # near-dup dedup over the admitted set only (a rejected copy must not
    # knock out its admitted twin): narrow (image_id, phash) side table
    admitted_ph = images.join(admitted, "image_id", "left_semi").select(
        "image_id", "phash"
    )
    pairs = phash_dup_pairs(admitted_ph, max_dist=max_dist).select(
        F.col("img_a").alias("doc_a"), F.col("img_b").alias("doc_b")
    )
    clusters = dedup_clusters(admitted, pairs, key="image_id")
    kept_ids = clusters.filter(F.col("is_rep") == 1).select("image_id")
    dup_rejects = clusters.filter(F.col("is_rep") == 0).select(
        "image_id", F.concat(F.lit("dup:"), F.col("cluster_id")).alias("reason")
    )

    kept = stats.join(kept_ids, "image_id", "left_semi").select("image_id", "caption")
    return kept, gate_rejects.unionByName(dup_rejects)


def _shard_col(n_shards: int):
    return F.pmod(F.xxhash64("image_id"), F.lit(n_shards)).cast("int")


def _write_tar(fileobj, rows) -> int:
    """Stream one WebDataset-style tar to an open file object: per sample
    ``<image_id>.<ext>`` then ``<image_id>.txt``, image_id order, mtime=0 —
    byte-deterministic.  Members are added incrementally, so only one
    sample's payload is in memory at a time (never the whole shard).
    Returns the summed image-payload byte count (the manifest's ``bytes``)."""
    n_bytes = 0
    with tarfile.open(fileobj=fileobj, mode="w") as tf:
        for image_id, data, fmt, caption in rows:
            ext = _EXT.get(fmt, fmt)
            for name, payload in (
                (f"{image_id}.{ext}", bytes(data)),
                (f"{image_id}.txt", (caption or "").encode("utf-8")),
            ):
                info = tarfile.TarInfo(name)
                info.size = len(payload)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(payload))
            n_bytes += len(bytes(data))
    return n_bytes


def export_training_shards(
    images: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    fmt: str = "parquet",
    quality_bounds: dict | None = None,
    min_caption_words: int = 1,
    max_dist: int = 3,
    samples_per_shard: int | None = None,
    write_rejects: bool = True,
) -> dict:
    """Run :func:`select_training_set`, write the survivors as ``n_shards``
    deterministic shards under ``out_dir``, and return the manifest dict
    (also written to ``out_dir/_manifest.json``).

    ``fmt="parquet"``: ``shard=K`` directories, one sorted parquet file
    each (columns image_id, bytes, w, h, fmt, caption, phash — the input
    shape, so shards are themselves valid pipeline inputs).
    ``fmt="tar"``: ``shard-%05d.tar`` WebDataset-style files.

    ``samples_per_shard`` overrides ``n_shards``: the shard count becomes
    ``ceil(kept / samples_per_shard)`` — the dataloader-facing knob (a
    100 TB corpus wants "~10k samples per shard", not a hand-computed
    shard count).  The expected ±√ hash-balance wobble around the target
    is inherent to deterministic id-hash assignment.

    ``write_rejects=True`` also writes the per-row reject log (image_id,
    reason) as parquet under ``out_dir/_rejects`` — the audit trail a real
    pipeline keeps ("why did sample X disappear?").  The underscore
    prefix keeps dataset readers (``spark.read.parquet(out_dir)``) from
    picking it up as samples.

    The manifest records per-shard ``samples``/``bytes`` and the reject
    tally by reason — counts come from the written data itself, so
    manifest-vs-shard drift cannot happen silently.
    """
    if fmt not in ("parquet", "tar"):
        raise ValueError(f"fmt must be parquet or tar, got {fmt!r}")
    kept, rejects = select_training_set(
        images,
        quality_bounds=quality_bounds,
        min_caption_words=min_caption_words,
        max_dist=max_dist,
    )
    if samples_per_shard is not None:
        # one narrow count over the persisted stats lineage
        n_shards = max(1, -(-kept.count() // int(samples_per_shard)))
    # ONE payload shuffle (pinned in tests/test_plans.py): because
    # shard = f(image_id), grouping payloads by shard ALSO co-locates each
    # payload with its kept-id row, so a cogroup on shard does the
    # kept-filter as a local pandas isin AND the shard grouping in the
    # same exchange.  A semi-join-then-repartition shape would shuffle
    # every payload twice (once on image_id for the join, once on shard)
    # — 2× the dominant cost of a 100 TB export.  Same shape as
    # warcfile.warc_export.
    lhs = images.withColumn("shard", _shard_col(n_shards)).groupBy("shard")
    rhs = (
        kept.select("image_id").withColumn("shard", _shard_col(n_shards))
        .groupBy("shard")
    )
    # NOT images.schema.add(...): StructType.add mutates the df's cached
    # schema object in place, making later withColumn("shard") ambiguous
    out_schema = T.StructType(
        list(images.schema.fields) + [T.StructField("shard", T.IntegerType())]
    )

    def keep_shard(payload_pdf, ids_pdf):
        g = payload_pdf[payload_pdf["image_id"].isin(set(ids_pdf["image_id"]))]
        return g.sort_values("image_id")

    sharded = lhs.cogroup(rhs).applyInPandas(keep_shard, schema=out_schema)

    if fmt == "parquet":
        sharded.write.partitionBy("shard").mode("overwrite").parquet(out_dir)
        spark = images.sparkSession
        # explicit schema: a partitioned write of ZERO kept rows creates no
        # data files, and a schema-inferring read of the empty dir raises
        # UNABLE_TO_INFER_SCHEMA instead of returning an empty frame
        written = spark.read.schema(out_schema).parquet(out_dir)
        per_shard = (
            written.groupBy("shard")
            .agg(
                F.count("*").alias("samples"),
                F.sum(F.length("bytes")).alias("bytes"),
            )
            .collect()
        )
        shard_rows = {
            int(r["shard"]): {"samples": r["samples"], "bytes": int(r["bytes"])}
            for r in per_shard
        }
    else:
        # tar shards are written FROM THE EXECUTORS (the save_warc_files
        # shape): each task streams its shards' members straight to
        # ``out_dir`` (a shared filesystem on a cluster) and only
        # (shard, name, samples, bytes) rows reach the driver — no shard
        # payload bytes in any driver collect, no whole-shard blob in
        # executor memory (``_write_tar`` adds members incrementally).
        # Shard files are disjoint per task (the cogroup puts one shard in
        # exactly one task) and byte-deterministic, so a task retry
        # rewrites the identical file.
        tar_schema = "shard int, name string, samples long, bytes long"
        os.makedirs(out_dir, exist_ok=True)

        def pack(pdfs):
            import pandas as pd

            chunks = list(pdfs)
            if not chunks or sum(len(c) for c in chunks) == 0:
                return  # empty partition (n_shards < partitions)
            pdf = pd.concat(chunks)
            out = []
            for shard, g in pdf.groupby("shard"):
                g = g.sort_values("image_id")
                name = f"shard-{int(shard):05d}.tar"
                with open(os.path.join(out_dir, name), "wb") as f:
                    n_bytes = _write_tar(
                        f, zip(g["image_id"], g["bytes"], g["fmt"], g["caption"])
                    )
                out.append((int(shard), name, len(g), n_bytes))
            yield pd.DataFrame(out, columns=["shard", "name", "samples", "bytes"])

        shard_rows = {
            int(r["shard"]): {"samples": r["samples"], "bytes": int(r["bytes"])}
            for r in sharded.mapInPandas(pack, schema=tar_schema).collect()
        }

    if write_rejects:
        rejects.write.mode("overwrite").parquet(os.path.join(out_dir, "_rejects"))
        rejects = images.sparkSession.read.parquet(os.path.join(out_dir, "_rejects"))
    reject_tally = {
        # collapse per-row detail (dup:<id>, decode:<err>) to the gate name
        r["reason"]: r["n"]
        for r in rejects.groupBy(
            F.regexp_extract("reason", r"^([a-z]+)", 1).alias("reason")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    manifest = {
        "format": fmt,
        "n_shards": n_shards,
        "samples": sum(s["samples"] for s in shard_rows.values()),
        "bytes": sum(s["bytes"] for s in shard_rows.values()),
        "shards": {str(k): shard_rows[k] for k in sorted(shard_rows)},
        "rejects": {k: reject_tally[k] for k in sorted(reject_tally)},
    }
    if write_rejects:
        manifest["rejects_path"] = "_rejects"
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
