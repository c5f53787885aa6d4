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
