"""Cross-modal dedup classification over the image+caption pair table
(extras/dedup.crossmodal_dup_pairs): image near-dups via exact multi-index
Hamming banding joined against normalized-caption dup groups, labelled
dup / caption_conflict / caption_boilerplate."""

import pyspark.sql.functions as F
import pytest

from chronicrawl_spark.extras.dedup import crossmodal_dup_pairs, phash_dup_pairs
from chronicrawl_spark.fixtures import IMAGES_SCHEMA, make_images


@pytest.fixture(scope="module")
def pairs_table(spark):
    """make_images(8) plus controlled duplicates:

    - img0000_dup : same bytes+phash+caption as img0000      → dup
    - img0001_alt : same phash as img0001, different caption → caption_conflict
    - img0002 / img0003 captions replaced by one boilerplate → caption_boilerplate
    - img0004_near: phash one bit off img0004, same caption  → dup (hamming 1)
    """
    base = make_images(spark, n=8, w=32, h=24)
    dup = base.filter(F.col("image_id") == "img0000").select(
        F.lit("img0000_dup").alias("image_id"), "bytes", "w", "h", "fmt", "caption", "phash"
    )
    alt = base.filter(F.col("image_id") == "img0001").select(
        F.lit("img0001_alt").alias("image_id"), "bytes", "w", "h", "fmt",
        F.lit("a completely different caption").alias("caption"), "phash",
    )
    near = base.filter(F.col("image_id") == "img0004").select(
        F.lit("img0004_near").alias("image_id"), "bytes", "w", "h", "fmt", "caption",
        F.col("phash").bitwiseXOR(F.lit(1)).alias("phash"),
    )
    boiler = base.filter(F.col("image_id").isin("img0002", "img0003")).select(
        "image_id", "bytes", "w", "h", "fmt",
        F.lit("  Stock   Photo ").alias("caption"), "phash",
    )
    keep = base.filter(~F.col("image_id").isin("img0002", "img0003"))
    return keep.unionByName(dup).unionByName(alt).unionByName(near).unionByName(boiler)


def test_labels(spark, pairs_table):
    got = {
        (r["img_a"], r["img_b"]): (r["label"], r["hamming"])
        for r in crossmodal_dup_pairs(pairs_table).collect()
    }
    assert got[("img0000", "img0000_dup")] == ("dup", 0)
    assert got[("img0001", "img0001_alt")] == ("caption_conflict", 0)
    assert got[("img0004", "img0004_near")] == ("dup", 1)
    # normalization folds "  Stock   Photo " across case/space variants
    assert got[("img0002", "img0003")][0] == "caption_boilerplate"
    assert got[("img0002", "img0003")][1] is None
    # base images are visually distinct and uniquely captioned: no extras
    assert len(got) == 4


def test_caption_group_guard(spark, pairs_table):
    """A hot boilerplate caption group larger than the cap generates NO
    caption pairs (quadratic-blowup guard), while image pairs survive."""
    hot = pairs_table.withColumn("caption", F.lit("x"))
    out = crossmodal_dup_pairs(hot, max_caption_group=2).collect()
    assert all(r["label"] == "caption_conflict" for r in out)
    n_img = phash_dup_pairs(pairs_table).count()
    assert len(out) == n_img


def test_distinct_base_has_no_image_pairs(spark):
    base = make_images(spark, n=8, w=32, h=24)
    assert phash_dup_pairs(base).count() == 0
    assert base.schema == IMAGES_SCHEMA
