"""Image payload axis end-to-end THROUGH the crawl engine: robots → sitemap
→ gallery pages → image transclusions fetched, stored in WARC records, and
verified per the input_hint invariant (decoded pixels exact for the lossless
codec, phash match, caption round-trip)."""

import numpy as np
import pyspark.sql.functions as F

from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
from chronicrawl_spark.extras.imaging import decode_image, phash64, psnr
from chronicrawl_spark.extras.imaging import make_paletted_image, make_smooth_image
from chronicrawl_spark.fixtures import image_site, make_images, make_test_image
from chronicrawl_spark.tables import StateStore

T0 = 1_600_000_000_000
ORIGIN = "http://img.example"


def test_image_crawl_end_to_end(spark, tmp_path):
    images = make_images(spark, n=4, w=32, h=24)
    site = image_site(spark, images, ORIGIN)
    store = StateStore(spark, str(tmp_path / "state"), buckets=4)
    engine = CrawlEngine(spark, store, site, CrawlConfig())
    engine.add_seeds([ORIGIN], now=T0)
    engine.run(max_waves=8, per_host_k=16)

    # every image URL was fetched exactly once with 200
    visits = store.read("visits")
    frontier = store.read("frontier").select("origin_id", "path_id", "path", "location_type")
    v = visits.join(frontier, ["origin_id", "path_id"]).collect()
    img_visits = [r for r in v if r["path"].startswith("/img/")]
    assert len(img_visits) == 4
    assert all(r["status"] == 200 for r in img_visits)
    # fixture cycles the three real codecs (bmp/png/jpeg by image id)
    assert all(
        r["content_type"] == "image/" + r["path"].rsplit(".", 1)[1] for r in img_visits
    )
    assert {r["content_type"] for r in img_visits} == {"image/bmp", "image/png", "image/jpeg", "image/gif"}
    # images were discovered as TRANSCLUSIONs from the gallery pages
    assert all(r["location_type"] == "TRANSCLUSION" for r in img_visits)

    # WARC payload byte-parity + decode invariants vs the images table
    warc = store.read("warc_records").filter(
        (F.col("record_type") == "response") & F.col("url").contains("/img/")
    )
    img_rows = {r["image_id"]: r for r in images.collect()}
    for rec in warc.collect():
        image_id = rec["url"].rsplit("/", 1)[1].split(".")[0]
        src = img_rows[image_id]
        payload = bytes(rec["payload"])
        assert payload == bytes(src["bytes"])  # byte-identical through the pipeline
        px = decode_image(payload, src["fmt"])
        assert phash64(px) == src["phash"]
        gen = {"jpeg": make_smooth_image, "gif": make_paletted_image}.get(src["fmt"], make_test_image)
        ref = gen(src["w"], src["h"], seed=int(image_id[3:]))
        if src["fmt"] == "jpeg":
            assert psnr(px, ref) >= 40.0  # lossy invariant (SURVEY §1.3)
        else:
            assert psnr(px, ref) == float("inf")  # lossless: exact pixels
            assert np.array_equal(px, ref)

    # caption round-trip: the gallery page payload carries the caption text
    pages = store.read("warc_records").filter(
        (F.col("record_type") == "response") & F.col("url").contains("/gallery/")
    )
    page_bodies = {r["url"]: bytes(r["payload"]).decode() for r in pages.collect()}
    assert len(page_bodies) == 4
    for i, (image_id, src) in enumerate(sorted(img_rows.items())):
        body = page_bodies[f"{ORIGIN}/gallery/{int(image_id[3:])}"]
        assert src["caption"] in body


def test_image_thumbnail_screenshot_producer(spark, tmp_path):
    """S11 producer loop closed in-sandbox: fetched image payloads →
    magic-byte prefilter → Arrow decode/resize stage → screenshot cache
    rows (screenshot = original payload, thumbnail = bilinear PNG), with
    HTML/robots payloads never reaching the Python stage."""
    from chronicrawl_spark.extras.imaging import decode_png, resize_bilinear
    from chronicrawl_spark.screenshots import (
        derive_image_screenshots,
        latest_screenshots,
    )

    images = make_images(spark, n=4, w=32, h=24)
    site = image_site(spark, images, ORIGIN)
    store = StateStore(spark, str(tmp_path / "state"), buckets=4)
    engine = CrawlEngine(spark, store, site, CrawlConfig())
    engine.add_seeds([ORIGIN], now=T0)
    engine.run(max_waves=8, per_host_k=16)

    wave = store.committed_wave + 1
    derive_image_screenshots(store, wave, max_dim=16)
    store.commit(wave)

    shots = latest_screenshots(store).collect()
    assert len(shots) == 4  # exactly the four image responses, nothing else
    by_payload = {bytes(r["bytes"]): r for r in images.collect()}
    for s in shots:
        src = by_payload[bytes(s["screenshot"])]  # original blob intact
        px = decode_image(bytes(s["screenshot"]), src["fmt"])
        expected = resize_bilinear(px, 16, 12)
        got = decode_png(bytes(s["thumbnail"]))
        assert np.array_equal(got, expected)
