"""Image payload axis: BMP codec round-trip, phash, PSNR invariants."""

import numpy as np
import pytest

from chronicrawl_spark.extras.imaging import (
    decode_bmp,
    decode_image,
    encode_bmp,
    hamming64,
    make_test_image,
    phash64,
    psnr,
)


def test_bmp_roundtrip_exact():
    for w, h, seed in [(32, 24, 0), (33, 17, 3), (1, 1, 7), (64, 64, 42)]:
        px = make_test_image(w, h, seed)
        out = decode_bmp(encode_bmp(px))
        assert out.shape == px.shape
        assert np.array_equal(out, px)  # lossless → PSNR = inf


def test_psnr():
    a = make_test_image(32, 32, 1)
    assert psnr(a, a) == float("inf")
    noisy = a.astype(np.int16).copy()
    noisy[0, 0, 0] += 10
    p = psnr(a, np.clip(noisy, 0, 255).astype(np.uint8))
    assert 40 < p < 100


def test_phash_properties():
    a = make_test_image(64, 48, 5)
    b = make_test_image(64, 48, 9)
    ha, hb = phash64(a), phash64(b)
    assert ha != hb
    assert hamming64(ha, ha) == 0
    # tiny perturbation → small hamming distance
    a2 = a.copy()
    a2[0, 0] = 255 - a2[0, 0]
    assert hamming64(ha, phash64(a2)) <= 4
    # signed int64 range (storable in a Spark LongType)
    assert -(1 << 63) <= ha < (1 << 63)


def test_decode_stub_is_explicit():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff", "jpeg")


def test_images_fixture_table(spark):
    from chronicrawl_spark.fixtures import make_images

    imgs = make_images(spark, n=4, w=16, h=12)
    rows = imgs.collect()
    assert len(rows) == 4
    for r in rows:
        px = decode_image(bytes(r["bytes"]), r["fmt"])
        assert px.shape == (r["h"], r["w"], 3)
        assert phash64(px) == r["phash"]  # per-row invariant
