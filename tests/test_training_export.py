"""Training-set selection + shard export (extras/training_export): the
crawl→training-data last mile.  Fixture plants one sample per reject gate
(undecodable, invariant-false, quality, empty caption, near-dup) over
make_images and checks the kept set, per-row reject reasons, deterministic
shard membership, parquet and WebDataset-tar roundtrips, and manifest
agreement with the written data."""

import json
import os
import tarfile

import pyspark.sql.functions as F
import pytest

from chronicrawl_spark.extras.training_export import (
    export_training_shards,
    select_training_set,
)
from chronicrawl_spark.fixtures import IMAGES_SCHEMA, make_images


@pytest.fixture(scope="module")
def table(spark):
    """make_images(8) plus planted rejects:

    - img_bad    : truncated payload               → decode:<err>
    - img_wrongph: valid payload, phash+1 stored   → invariant
    - img_nocap  : whitespace caption              → caption
    - img0000_dup: byte-copy of img0000            → dup:img0000
    - img0001_copy: byte-copy of img0001            → dup:img0001
      (a stored-phash-perturbed "near dup" would fail the INVARIANT gate
      first — the decoded-pixel hash no longer matches — so the cluster
      path is exercised with exact copies; hamming 1-3 candidate
      generation is pinned by test_crossmodal/test_dedup_recall)
    """
    base = make_images(spark, n=8, w=32, h=24)
    rows = base.collect()
    by_id = {r["image_id"]: r for r in rows}
    b0, b1, b2 = by_id["img0000"], by_id["img0001"], by_id["img0002"]
    extra = [
        ("img_bad", bytes(b0["bytes"][:10]), b0["w"], b0["h"], b0["fmt"],
         "truncated payload", b0["phash"]),
        ("img_wrongph", bytes(b2["bytes"]), b2["w"], b2["h"], b2["fmt"],
         "stored hash is wrong", b2["phash"] ^ (1 << 40)),
        ("img_nocap", bytes(b1["bytes"]), b1["w"], b1["h"], b1["fmt"],
         "   ", b1["phash"]),
        ("img0000_dup", bytes(b0["bytes"]), b0["w"], b0["h"], b0["fmt"],
         b0["caption"], b0["phash"]),
        ("img0001_copy", bytes(b1["bytes"]), b1["w"], b1["h"], b1["fmt"],
         b1["caption"], b1["phash"]),
    ]
    return base.unionByName(spark.createDataFrame(extra, IMAGES_SCHEMA))


def test_select_reject_reasons(spark, table):
    kept, rejects = select_training_set(table)
    reasons = {r["image_id"]: r["reason"] for r in rejects.collect()}
    assert reasons.pop("img_bad").startswith("decode:")
    assert reasons.pop("img_wrongph") == "invariant"
    assert reasons.pop("img_nocap") == "caption"
    assert reasons.pop("img0000_dup") == "dup:img0000"
    assert reasons.pop("img0001_copy") == "dup:img0001"
    assert reasons == {}
    assert {r["image_id"] for r in kept.collect()} == {
        f"img{i:04d}" for i in range(8)
    }


def test_quality_bounds_gate(spark, table):
    # entropy of every synthetic image is > 0; an impossible lower bound
    # rejects everything decodable with reason quality:entropy
    kept, rejects = select_training_set(
        table, quality_bounds={"entropy": (1e9, None)}
    )
    assert kept.count() == 0
    tally = {r["reason"] for r in rejects.collect() if r["reason"].startswith("quality")}
    assert tally == {"quality:entropy"}
    with pytest.raises(ValueError):
        select_training_set(table, quality_bounds={"notametric": (0, 1)})


def test_parquet_shards_roundtrip(spark, table, tmp_path):
    out = str(tmp_path / "shards")
    manifest = export_training_shards(table, out, n_shards=4, fmt="parquet")
    assert manifest["samples"] == 8
    assert manifest["rejects"] == {"caption": 1, "decode": 1, "dup": 2, "invariant": 1}
    back = spark.read.parquet(out)
    assert back.count() == 8
    # shards are valid pipeline inputs: same columns + shard partition col
    assert set(back.columns) == set(IMAGES_SCHEMA.fieldNames()) | {"shard"}
    # payload bytes survive untouched
    src = {r["image_id"]: bytes(r["bytes"]) for r in table.collect()}
    for r in back.collect():
        assert bytes(r["bytes"]) == src[r["image_id"]]
    # manifest counts come from the written files
    on_disk = json.load(open(os.path.join(out, "_manifest.json")))
    assert on_disk == manifest
    assert sum(s["samples"] for s in manifest["shards"].values()) == 8
    # the reject audit log is written alongside (underscore-prefixed, so
    # the dataset read above did NOT pick it up as samples)
    assert manifest["rejects_path"] == "_rejects"
    rej = spark.read.parquet(os.path.join(out, "_rejects"))
    assert rej.count() == 5
    assert {r["reason"] for r in rej.collect()} == {
        "invariant", "caption", "dup:img0000", "dup:img0001"
    } | {r["reason"] for r in rej.collect() if r["reason"].startswith("decode:")}
    # deterministic shard membership: re-export maps ids identically
    out2 = str(tmp_path / "shards2")
    export_training_shards(table, out2, n_shards=4, fmt="parquet")
    m1 = {r["image_id"]: r["shard"] for r in spark.read.parquet(out).collect()}
    m2 = {r["image_id"]: r["shard"] for r in spark.read.parquet(out2).collect()}
    assert m1 == m2


def test_samples_per_shard(spark, table, tmp_path):
    # 8 kept samples at 3/shard → ceil(8/3) = 3 shards; membership still
    # hash-assigned (balance wobble expected), total exact
    out = str(tmp_path / "sized")
    manifest = export_training_shards(
        table, out, samples_per_shard=3, fmt="parquet"
    )
    assert manifest["n_shards"] == 3
    assert manifest["samples"] == 8
    assert spark.read.parquet(out).count() == 8


def test_export_zero_kept(spark, table, tmp_path):
    # every decodable sample rejected → empty manifest, no crash (a
    # partitioned write of zero rows creates no data files; the manifest
    # read-back must not rely on schema inference)
    for fmt in ("parquet", "tar"):
        out = str(tmp_path / f"empty_{fmt}")
        m = export_training_shards(
            table, out, n_shards=2, fmt=fmt,
            quality_bounds={"entropy": (1e9, None)},
        )
        assert m["samples"] == 0 and m["shards"] == {}
        # gate order: img_bad → decode, img_wrongph → invariant, and the
        # other 11 decodable rows all fail quality (before caption/dup)
        assert m["rejects"] == {"decode": 1, "invariant": 1, "quality": 11}


def test_tar_shards_webdataset(spark, table, tmp_path):
    out = str(tmp_path / "tars")
    manifest = export_training_shards(table, out, n_shards=2, fmt="tar")
    assert manifest["samples"] == 8
    names = sorted(n for n in os.listdir(out) if n.endswith(".tar"))
    assert names == [f"shard-{int(k):05d}.tar" for k in sorted(manifest["shards"])]
    src = {r["image_id"]: r for r in table.collect()}
    seen = {}
    for name in names:
        with tarfile.open(os.path.join(out, name)) as tf:
            members = tf.getmembers()
            # WebDataset layout: image entry then caption entry per sample
            for img_m, txt_m in zip(members[::2], members[1::2]):
                key = img_m.name.rsplit(".", 1)[0]
                assert txt_m.name == f"{key}.txt"
                assert img_m.mtime == 0
                assert tf.extractfile(img_m).read() == bytes(src[key]["bytes"])
                assert tf.extractfile(txt_m).read().decode() == src[key]["caption"]
                seen[key] = name
    assert len(seen) == 8
    # byte-deterministic: identical re-export
    out2 = str(tmp_path / "tars2")
    export_training_shards(table, out2, n_shards=2, fmt="tar")
    for name in names:
        a = open(os.path.join(out, name), "rb").read()
        b = open(os.path.join(out2, name), "rb").read()
        assert a == b


def test_tar_shards_byte_deterministic_executor_write(spark, table, tmp_path):
    """The executor-side tar writer must be byte-deterministic: two exports
    of the same table produce identical shard files (this is also the task
    retry-safety argument — a re-run task rewrites the identical file), and
    only narrow stat rows reach the driver (no binary column in the pack
    schema; the files appear on disk without any driver-side write loop)."""
    out1 = str(tmp_path / "t1")
    out2 = str(tmp_path / "t2")
    m1 = export_training_shards(table, out1, n_shards=2, fmt="tar")
    m2 = export_training_shards(table, out2, n_shards=2, fmt="tar")
    assert m1["shards"] == m2["shards"]
    names = sorted(n for n in os.listdir(out1) if n.endswith(".tar"))
    assert names == sorted(n for n in os.listdir(out2) if n.endswith(".tar"))
    for n in names:
        with open(os.path.join(out1, n), "rb") as a, open(os.path.join(out2, n), "rb") as b:
            assert a.read() == b.read()
