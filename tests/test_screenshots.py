"""S11 screenshot sink + newest-K expiry + W8 recency view."""

from chronicrawl_spark.screenshots import (
    add_screenshots,
    expire_screenshots,
    latest_screenshots,
)
from chronicrawl_spark.tables import SCREENSHOTS_SCHEMA, StateStore


def _rows(spark, origin_id, path_id, dates):
    return spark.createDataFrame(
        [(origin_id, path_id, d, bytes([d % 256]) * 8, b"t") for d in dates],
        SCREENSHOTS_SCHEMA,
    )


def test_screenshot_sink_expiry_and_recency(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "s"), buckets=4)
    # two locations: one with 7 captures, one with 2
    add_screenshots(store, _rows(spark, 11, 1, list(range(100, 107))), wave=1)
    add_screenshots(store, _rows(spark, 22, 2, [200, 201]), wave=2)
    store.commit(2)
    assert store.read("screenshots").count() == 9

    # W8: most recent per location
    latest = {(r["origin_id"], r["path_id"]): r["date"] for r in latest_screenshots(store).collect()}
    assert latest == {(11, 1): 106, (22, 2): 201}

    # S11 expiry: keep newest 5 per location
    kept = expire_screenshots(store, keep=5)
    assert kept == 7  # 5 kept for the hot location, both for the other
    dates = sorted(
        r["date"] for r in store.read("screenshots").filter("origin_id = 11").collect()
    )
    assert dates == [102, 103, 104, 105, 106]
    # recency view unchanged by expiry
    latest2 = {(r["origin_id"], r["path_id"]): r["date"] for r in latest_screenshots(store).collect()}
    assert latest2 == latest

    # the rewrite is a committed snapshot: a fresh store handle sees it
    store2 = StateStore(spark, str(tmp_path / "s"), buckets=4)
    assert store2.read("screenshots").count() == 7


def test_inline_wave_screenshot_producer(spark, tmp_path):
    """CrawlConfig.screenshot_thumbnails=True: every fetched image payload
    feeds the screenshot cache inline with its wave (ref: every rendered
    visit feeds the cache, Exchange.java:198-201) — and the flag must not
    perturb the crawl itself (visits/frontier bit-identical to flag-off)."""
    import numpy as np
    import pyspark.sql.functions as F

    from chronicrawl_spark.crawl import CrawlConfig, CrawlEngine
    from chronicrawl_spark.extras.imaging import decode_image
    from chronicrawl_spark.fixtures import image_site, make_images

    T0 = 1_600_000_000_000
    ORIGIN = "http://img.example"
    images = make_images(spark, n=4, w=32, h=24)
    site = image_site(spark, images, ORIGIN)

    def crawl(tag, **cfg):
        store = StateStore(spark, str(tmp_path / tag), buckets=4)
        engine = CrawlEngine(spark, store, site, CrawlConfig(**cfg))
        engine.add_seeds([ORIGIN], now=T0)
        engine.run(max_waves=8, per_host_k=16)
        return store

    plain = crawl("plain")
    shot = crawl("shot", screenshot_thumbnails=True, thumbnail_max_dim=16)

    # crawl unperturbed
    a = sorted(tuple(r) for r in plain.read("visits").collect())
    b = sorted(tuple(r) for r in shot.read("visits").collect())
    assert a == b
    assert plain.read("screenshots").count() == 0

    # the 4 image payloads (bmp/png/jpeg/gif) each produced a cache row:
    # screenshot = original payload, thumbnail = decodable PNG ≤ max_dim
    rows = shot.read("screenshots").collect()
    assert len(rows) == 4
    frontier = {
        (r["origin_id"], r["path_id"]): r["path"]
        for r in shot.read("frontier").collect()
    }
    img_bytes = {r["image_id"]: bytes(r["bytes"]) for r in images.collect()}
    for r in rows:
        path = frontier[(r["origin_id"], r["path_id"])]
        assert path.startswith("/img/")
        image_id = path.rsplit("/", 1)[1].split(".")[0]
        assert bytes(r["screenshot"]) == img_bytes[image_id]
        th = decode_image(bytes(r["thumbnail"]), "png")
        assert max(th.shape[:2]) <= 16 and min(th.shape[:2]) >= 1
        assert isinstance(th, np.ndarray)

    # W8 recency view serves them
    assert latest_screenshots(shot).count() == 4
