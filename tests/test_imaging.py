"""Image payload axis: BMP/PNG codec round-trips, phash, PSNR invariants."""

import struct
import zlib

import numpy as np
import pytest

from chronicrawl_spark.extras.imaging import (
    _PNG_SIG,
    _png_chunk,
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_png,
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


def test_png_roundtrip_exact():
    for w, h, seed in [(32, 24, 0), (33, 17, 3), (1, 1, 7), (64, 64, 42)]:
        px = make_test_image(w, h, seed)
        out = decode_png(encode_png(px))
        assert out.shape == px.shape
        assert np.array_equal(out, px)


def test_png_rgba_and_crc():
    px = make_test_image(16, 8, 2)
    rgba = np.concatenate([px, np.full((8, 16, 1), 200, dtype=np.uint8)], axis=2)
    out = decode_png(encode_png(rgba))
    assert np.array_equal(out, px)  # alpha dropped
    data = bytearray(encode_png(px))
    data[40] ^= 0xFF  # corrupt an IDAT byte → CRC must catch it
    with pytest.raises(ValueError):
        decode_png(bytes(data))


def _png_with_filters(px, filters):
    """Build a PNG applying the given per-row filter types (test-side
    filterer, the inverse of the decoder's unfilterer)."""
    h, w, _ = px.shape
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        cur = px[y].reshape(w * bpp)
        ft = filters[y % len(filters)]
        raw.append(ft)
        if ft == 0:
            filt = cur.copy()
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, dtype=np.uint8), cur[:-bpp]])
            filt = cur - left
        elif ft == 2:  # Up
            filt = cur - prev
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, dtype=np.uint8), cur[:-bpp]])
            filt = cur - ((left.astype(np.int16) + prev) // 2).astype(np.uint8)
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, dtype=np.uint8), cur[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, dtype=np.uint8), prev[:-bpp]])
            p = left.astype(np.int16) + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)).astype(np.uint8)
            filt = cur - pred
        raw.extend(filt.tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_all_filter_types_decode():
    px = make_test_image(21, 10, 11)
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        out = decode_png(_png_with_filters(px, filters))
        assert np.array_equal(out, px), f"filters {filters}"


def test_decode_unknown_format_is_explicit():
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF....WEBP", "webp")


def test_gif_roundtrip_exact():
    from chronicrawl_spark.extras.imaging import decode_gif, encode_gif, make_paletted_image

    for w, h, seed in [(32, 24, 0), (31, 17, 3), (1, 1, 7), (64, 48, 42)]:
        px = make_paletted_image(w, h, seed)
        out = decode_gif(encode_gif(px))
        assert out.shape == px.shape
        assert np.array_equal(out, px)  # palette-exact → lossless


def _lzw_compress_ref(mcs, indices):
    """Reference dictionary-building GIF-LZW compressor (test-side): exercises
    the decoder's code paths the clear-throttled encoder never hits —
    dictionary growth, width bumps, and the KwKwK (code == len(table)) case."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    from chronicrawl_spark.extras.imaging import _LsbBitWriter

    bw = _LsbBitWriter()
    width = mcs + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    bw.write(clear, width)
    prev = ()
    for v in indices:
        cur = prev + (v,)
        if cur in table:
            prev = cur
            continue
        bw.write(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            bw.write(clear, width)
            width = mcs + 1
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
        prev = (v,)
    if prev:
        bw.write(table[prev], width)
    bw.write(end, width)
    return bw.flush()


def test_gif_decoder_handles_real_lzw():
    import struct

    from chronicrawl_spark.extras.imaging import _gif_palette, decode_gif, make_paletted_image

    px = make_paletted_image(48, 32, 9)
    palette, idx = _gif_palette(px)
    pbits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << pbits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    mcs = max(2, pbits)
    lzw = _lzw_compress_ref(mcs, idx.reshape(-1).tolist())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 48, 32, 0x80 | ((pbits - 1) & 7), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 48, 32, 0) + bytes([mcs])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    decoded = decode_gif(bytes(out))
    assert np.array_equal(decoded, px)


def test_gif_interlaced_decode():
    import struct

    from chronicrawl_spark.extras.imaging import _gif_palette, _LsbBitWriter, decode_gif, make_paletted_image

    px = make_paletted_image(16, 16, 4)
    palette, idx = _gif_palette(px)
    pbits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << pbits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    mcs = max(2, pbits)
    # write rows in GIF interlace pass order; decoder must de-interlace
    rows = list(range(0, 16, 8)) + list(range(4, 16, 8)) + list(range(2, 16, 4)) + list(range(1, 16, 2))
    inter = idx[rows].reshape(-1).tolist()
    clear = 1 << mcs
    bw = _LsbBitWriter()
    bw.write(clear, mcs + 1)
    cnt = 0
    for v in inter:
        bw.write(int(v), mcs + 1)
        cnt += 1
        if cnt >= clear - 4:
            bw.write(clear, mcs + 1)
            cnt = 0
    bw.write(clear + 1, mcs + 1)
    lzw = bw.flush()
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 16, 16, 0x80 | ((pbits - 1) & 7), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 16, 16, 0x40) + bytes([mcs])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    assert np.array_equal(decode_gif(bytes(out)), px)


def test_jpeg_roundtrip_psnr():
    """Baseline JPEG codec (C20 / SURVEY §1.3 lossy invariant): round-trip
    PSNR ≥ 40 dB at quality 95 on band-limited content; near-lossless at
    quality 100; phash of the decode stays within a few bits."""
    from chronicrawl_spark.extras.imaging import (
        decode_jpeg,
        encode_jpeg,
        make_smooth_image,
    )

    for w, h, seed in [(32, 24, 0), (31, 17, 3), (8, 8, 7), (64, 48, 42)]:
        px = make_smooth_image(w, h, seed)
        out = decode_jpeg(encode_jpeg(px, quality=95))
        assert out.shape == px.shape
        assert psnr(px, out) >= 40.0, (w, h, seed, psnr(px, out))
        assert hamming64(phash64(px), phash64(out)) <= 4
    # q100 ≈ unit quant tables → near-lossless even on hostile content
    px = make_test_image(32, 24, 0)
    assert psnr(px, decode_jpeg(encode_jpeg(px, quality=100))) >= 50.0


def test_jpeg_marker_structure():
    """Emitted stream is well-formed JFIF baseline: SOI/APP0/DQT/DHT/SOF0/
    SOS/EOI present, and a truncated or corrupted stream raises."""
    from chronicrawl_spark.extras.imaging import encode_jpeg, decode_jpeg, make_smooth_image

    data = encode_jpeg(make_smooth_image(16, 16, 1))
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc4", b"\xff\xc0", b"\xff\xda"):
        assert marker in data
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")


def test_jpeg_decoder_handles_grayscale():
    """Single-component (grayscale) baseline streams decode to replicated
    RGB — the decoder is not hardwired to the encoder's 3-component shape."""
    from chronicrawl_spark.extras.imaging import decode_jpeg, encode_jpeg, make_smooth_image
    import numpy as np

    # build grayscale by encoding a gray RGB image; Cb/Cr ≈ 128 everywhere
    px = make_smooth_image(24, 16, 5)
    gray = np.repeat(px[:, :, :1], 3, axis=2)
    out = decode_jpeg(encode_jpeg(gray, quality=95))
    assert psnr(gray, out) >= 40.0


def test_images_fixture_table(spark):
    from chronicrawl_spark.fixtures import make_images

    imgs = make_images(spark, n=4, w=16, h=12)
    rows = imgs.collect()
    assert len(rows) == 4
    for r in rows:
        px = decode_image(bytes(r["bytes"]), r["fmt"])
        assert px.shape == (r["h"], r["w"], 3)
        assert phash64(px) == r["phash"]  # per-row invariant


def test_phash_dup_pairs_real_images(spark):
    """The banded phash join (extras/dedup.phash_dup_pairs) over REAL
    pixels: perturbed copies of base images must be recovered exactly as
    the numpy exhaustive hamming<=3 truth predicts — banding a Hamming
    code is exact for dist < bands (pigeonhole), so sets must be EQUAL,
    not merely overlapping."""
    from pyspark.sql import types as T

    from chronicrawl_spark.extras.dedup import phash_dup_pairs

    rng = np.random.default_rng(7)
    pxs = {}
    for i in range(12):
        pxs[f"b{i:02d}"] = make_test_image(32, 24, seed=i)
    for i in range(6):  # near-dup: tiny pixel noise on a base image
        noisy = pxs[f"b{i:02d}"].astype(np.int16) + rng.integers(-2, 3, (24, 32, 3))
        pxs[f"n{i:02d}"] = np.clip(noisy, 0, 255).astype(np.uint8)
    hashes = {k: phash64(v) for k, v in pxs.items()}
    truth = {
        (a, b)
        for a in hashes
        for b in hashes
        if a < b and hamming64(hashes[a], hashes[b]) <= 3
    }
    assert truth, "fixture must contain at least one near-dup pair"
    df = spark.createDataFrame(
        [(k, v) for k, v in hashes.items()],
        T.StructType(
            [
                T.StructField("image_id", T.StringType(), False),
                T.StructField("phash", T.LongType(), False),
            ]
        ),
    )
    got = {
        (r["img_a"], r["img_b"])
        for r in phash_dup_pairs(df, max_dist=3).collect()
    }
    assert got == truth


def test_resize_bilinear_properties():
    from chronicrawl_spark.extras.imaging import resize_bilinear, thumbnail_dims

    px = make_test_image(32, 24, seed=3)
    assert np.array_equal(resize_bilinear(px, 32, 24), px)  # identity
    down = resize_bilinear(px, 16, 12)
    assert down.shape == (12, 16, 3)
    # downscale of a smooth gradient ≈ block means: round-trip up→down is
    # close to the original on smooth content
    from chronicrawl_spark.extras.imaging import make_smooth_image

    sm = make_smooth_image(16, 12, seed=1)
    up = resize_bilinear(sm, 64, 48)
    back = resize_bilinear(up, 16, 12)
    assert psnr(sm, back) >= 40.0
    assert thumbnail_dims(100, 50, 16) == (16, 8)
    assert thumbnail_dims(50, 100, 16) == (8, 16)
    assert thumbnail_dims(10, 8, 16) == (10, 8)


def test_image_thumbnails_operator(spark):
    """Arrow-batched resize stage: every fixture format decodes, thumbs
    round-trip through the PNG codec, and a poison row reports an error
    instead of failing the batch."""
    from pyspark.sql import types as T

    from chronicrawl_spark.extras.imaging import image_thumbnails
    from chronicrawl_spark.fixtures import make_images

    imgs = make_images(spark, n=8, w=32, h=24)
    poison = spark.createDataFrame(
        [("bad0", b"not an image", 32, 24, "png", "x", 0)], imgs.schema
    )
    out = {r["image_id"]: r for r in image_thumbnails(imgs.unionByName(poison), max_dim=16).collect()}
    assert len(out) == 9
    assert out["bad0"]["error"] is not None and out["bad0"]["thumbnail"] is None
    for k, r in out.items():
        if k == "bad0":
            continue
        assert r["error"] is None
        assert (r["thumb_w"], r["thumb_h"]) == (16, 12)
        px = decode_png(bytes(r["thumbnail"]))
        assert px.shape == (12, 16, 3)
        from chronicrawl_spark.extras.imaging import phash64 as ph

        assert ph(px) == r["thumb_phash"]


def test_make_images_distributed_matches_driver_fixture(spark):
    """The executor-side generator must be byte-identical to the driver-side
    make_images for the same (n, w, h, fmt cycle) — the scale seed is the
    same deterministic table, not an approximation."""
    from chronicrawl_spark.fixtures import make_images, make_images_distributed

    a = {r["image_id"]: r for r in make_images(spark, n=8, w=32, h=24).collect()}
    b = {
        r["image_id"]: r
        for r in make_images_distributed(spark, 8, w=32, h=24, partitions=4).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert bytes(a[k]["bytes"]) == bytes(b[k]["bytes"])
        assert (a[k]["fmt"], a[k]["phash"], a[k]["caption"]) == (
            b[k]["fmt"], b[k]["phash"], b[k]["caption"]
        )


def test_decode_verify_thumbnails_stage(spark):
    """Fused decode→phash-invariant→thumbnail stage: ok=true on pristine
    rows (all four codecs), ok=false on a phash mismatch, error-isolated
    (not fatal) on poison bytes."""
    from chronicrawl_spark.extras.imaging import decode_verify_thumbnails
    from chronicrawl_spark.fixtures import make_images

    imgs = make_images(spark, n=8, w=32, h=24)
    tampered = imgs.limit(1).selectExpr(
        "concat('tamper_', image_id) as image_id", "bytes", "w", "h", "fmt",
        "caption", "phash + 1 as phash",
    )
    poison = spark.createDataFrame(
        [("bad0", b"not an image", 32, 24, "png", "x", 0)], imgs.schema
    )
    out = {
        r["image_id"]: r
        for r in decode_verify_thumbnails(
            imgs.unionByName(tampered).unionByName(poison), max_dim=16
        ).collect()
    }
    assert len(out) == 10
    assert out["bad0"]["ok"] is False and out["bad0"]["error"] is not None
    assert out["tamper_img0000"]["ok"] is False and out["tamper_img0000"]["error"] is None
    for k, r in out.items():
        if k.startswith(("bad", "tamper_")):
            continue
        assert r["ok"] is True and r["error"] is None
        assert (r["thumb_w"], r["thumb_h"]) == (16, 12)
        assert r["caption"] == f"caption for image {int(k[3:])}"


def test_quality_stats_closed_form():
    """quality_stats against hand-computable images: a uniform frame has
    zero contrast/entropy/sharpness/saturation and brightness equal to its
    luma; a 2-level checkerboard has 1 bit of histogram entropy and a
    Laplacian variance derivable from the 4-neighbour kernel."""
    from chronicrawl_spark.extras.imaging import quality_stats

    # uniform mid-gray RGB(100,150,200): gray = round(140.75) half-up = 141
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    px[:, :, 0], px[:, :, 1], px[:, :, 2] = 100, 150, 200
    b, c, e, s, sat = quality_stats(px)
    assert b == 141.0
    assert c == 0.0 and e == 0.0 and s == 0.0
    assert repr(e) == "0.0"  # single-bin entropy is +0.0, never -0.0
    assert sat == 100.0  # max-min channel range is exactly 100 everywhere

    # black/white checkerboard: half pixels luma 0, half luma 255
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    ij = np.indices((16, 16)).sum(axis=0) % 2 == 0
    px[ij] = 255
    b, c, e, s, sat = quality_stats(px)
    assert b == pytest.approx(127.5)
    assert c == pytest.approx(127.5)  # std of a fair two-point {0,255} dist
    assert e == pytest.approx(1.0)  # two equiprobable histogram bins
    # interior Laplacian: every neighbour differs by ±255, |lap| = 4*255
    # with alternating sign and zero mean -> variance = (4*255)^2
    assert s == pytest.approx((4 * 255.0) ** 2)
    assert sat == 0.0  # grayscale: channel range 0 everywhere


def test_decode_verify_thumbnails_with_quality(spark):
    """with_quality=True fuses the five filter metrics into the same Arrow
    stage; values match a driver-side recomputation bitwise, poison rows
    carry NULL metrics."""
    from chronicrawl_spark.extras.imaging import (
        QUALITY_COLS,
        decode_image,
        decode_verify_thumbnails,
        quality_stats,
    )
    from chronicrawl_spark.fixtures import make_images

    imgs = make_images(spark, n=6, w=32, h=24)
    poison = spark.createDataFrame(
        [("bad0", b"not an image", 32, 24, "png", "x", 0)], imgs.schema
    )
    out = {
        r["image_id"]: r
        for r in decode_verify_thumbnails(
            imgs.unionByName(poison), max_dim=16, with_quality=True
        ).collect()
    }
    assert all(out["bad0"][c] is None for c in QUALITY_COLS)
    expected = {
        r["image_id"]: quality_stats(decode_image(bytes(r["bytes"]), r["fmt"]))
        for r in imgs.collect()
    }
    for k, exp in expected.items():
        got = tuple(out[k][c] for c in QUALITY_COLS)
        assert got == exp, f"{k}: {got} != {exp}"
    # sanity: the seeded gradient fixtures are non-degenerate images
    for k in expected:
        assert out[k]["entropy"] > 0.5 and out[k]["contrast"] > 1.0


def test_exif_orientation_roundtrip():
    """All eight EXIF orientations: inject → parse back → strip removes the
    APP1 without touching pixels; MM (big-endian) TIFF parses too."""
    import struct

    from chronicrawl_spark.extras.imaging import (
        apply_orientation,
        decode_image,
        encode_jpeg,
        inject_exif,
        make_test_image,
        parse_exif_orientation,
        strip_exif,
    )

    base = make_test_image(24, 16, seed=3)
    jpg = encode_jpeg(base)
    assert parse_exif_orientation(jpg) == 1  # no APP1 → upright
    px = decode_image(jpg, "jpeg")
    for o in range(1, 9):
        tagged = inject_exif(jpg, o)
        assert parse_exif_orientation(tagged) == o
        assert np.array_equal(decode_image(tagged, "jpeg"), px)  # pixels untouched
        up = apply_orientation(px, o)
        swapped = o >= 5
        assert (up.shape[1], up.shape[0]) == (
            (px.shape[0], px.shape[1]) if swapped else (px.shape[1], px.shape[0])
        )
        stripped = strip_exif(tagged)
        assert parse_exif_orientation(stripped) == 1
        assert np.array_equal(decode_image(stripped, "jpeg"), px)
    # involutions / inverses
    assert np.array_equal(apply_orientation(apply_orientation(base, 3), 3), base)
    assert np.array_equal(np.rot90(apply_orientation(base, 6), 1), base)
    # big-endian TIFF header
    tiff = (
        b"MM" + struct.pack(">H", 42) + struct.pack(">I", 8)
        + struct.pack(">H", 1) + struct.pack(">HHI", 0x0112, 3, 1)
        + struct.pack(">HH", 7, 0) + struct.pack(">I", 0)
    )
    payload = b"Exif\x00\x00" + tiff
    mm = jpg[:2] + b"\xFF\xE1" + struct.pack(">H", len(payload) + 2) + payload + jpg[2:]
    assert parse_exif_orientation(mm) == 7
    # garbage never raises
    assert parse_exif_orientation(b"\xff\xd8\xff\xd9") == 1


def test_exif_normalize_stage(spark):
    """exif_normalize over a mixed table: sideways JPEG comes out upright
    with scrubbed re-encode, non-JPEG passes through as orientation 1,
    poison rows isolate."""
    from chronicrawl_spark.extras.imaging import (
        apply_orientation,
        decode_image,
        decode_png,
        encode_jpeg,
        exif_normalize,
        inject_exif,
        make_test_image,
    )
    from chronicrawl_spark.fixtures import make_images

    imgs = make_images(spark, n=4, w=32, h=24)  # bmp/png/jpeg/gif cycle
    base = make_test_image(24, 16, seed=9)
    sideways = spark.createDataFrame(
        [("rot6", bytearray(inject_exif(encode_jpeg(base), 6)), 24, 16, "jpeg", "cap", 0)],
        imgs.schema,
    )
    poison = spark.createDataFrame(
        [("bad0", b"not an image", 1, 1, "png", "x", 0)], imgs.schema
    )
    out = {
        r["image_id"]: r
        for r in exif_normalize(imgs.unionByName(sideways).unionByName(poison)).collect()
    }
    assert len(out) == 6
    assert out["bad0"]["error"] is not None and out["bad0"]["pixels_png"] is None
    r6 = out["rot6"]
    assert r6["orientation"] == 6 and (r6["w"], r6["h"]) == (16, 24)  # dims swapped
    want = apply_orientation(decode_image(inject_exif(encode_jpeg(base), 6), "jpeg"), 6)
    assert np.array_equal(decode_png(bytes(r6["pixels_png"])), want)
    for k, r in out.items():
        if k in ("bad0", "rot6"):
            continue
        assert r["orientation"] == 1 and r["error"] is None
        assert (r["w"], r["h"]) == (32, 24)


def test_png_adam7_interlaced_decode():
    """Adam7-interlaced PNGs decode identically to their progressive
    layout: build the interlaced stream test-side (7 passes, filter 0 and
    filter 2 variants), decode, compare to the source pixels."""
    from chronicrawl_spark.extras.imaging import _ADAM7, decode_png

    for w, h, seed in [(32, 24, 1), (33, 17, 5), (8, 8, 2), (7, 3, 4), (1, 1, 0)]:
        px = make_test_image(w, h, seed)
        for ftype in (0, 2):
            raw = bytearray()
            for x0, y0, dx, dy in _ADAM7:
                sub = px[y0::dy, x0::dx]
                if sub.size == 0:
                    continue
                ph, pw, _ = sub.shape
                prev = np.zeros(pw * 3, dtype=np.uint8)
                for y in range(ph):
                    cur = sub[y].reshape(pw * 3)
                    raw.append(ftype)
                    raw.extend((cur - prev if ftype == 2 else cur).tobytes())
                    if ftype == 2:
                        prev = cur
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
            data = (
                _PNG_SIG
                + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _png_chunk(b"IEND", b"")
            )
            out = decode_png(data)
            assert np.array_equal(out, px), f"{w}x{h} seed={seed} filter={ftype}"


def test_gif_animation_roundtrip_and_sampling():
    """Animation encoder/decoder: N paletted frames with per-frame local
    color tables round-trip exactly with their delays; max_frames bounds
    the block walk."""
    from chronicrawl_spark.extras.imaging import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animation,
        make_paletted_image,
    )

    frames = [make_paletted_image(24, 16, s) for s in range(5)]
    delays = [5, 10, 15, 20, 25]
    data = encode_gif_animation(frames, delays)
    out = decode_gif_frames(data)
    assert len(out) == 5
    for (d, px), src, ed in zip(out, frames, delays):
        assert d == ed
        assert np.array_equal(px, src)
    assert len(decode_gif_frames(data, max_frames=2)) == 2
    assert np.array_equal(decode_gif(data), frames[0])  # first-frame contract


def test_gif_disposal_and_transparency():
    """Hand-built two-frame GIF exercising composite semantics: frame 2 is
    a sub-rectangle with a transparent index over frame 1 (disposal 1 =
    leave), so uncovered and transparent pixels show frame 1 through."""
    import struct as _s

    from chronicrawl_spark.extras.imaging import _gif_lzw_block, decode_gif_frames

    # global palette: 0=red 1=green 2=blue 3=white
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    out = bytearray(b"GIF89a")
    out += _s.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)  # 4x4 canvas, 4-color GCT
    out += pal
    # frame 1: full canvas, all green (index 1), disposal 1, delay 7
    out += b"\x21\xF9\x04" + bytes([0x04]) + _s.pack("<H", 7) + b"\x00\x00"
    out += b"\x2C" + _s.pack("<HHHHB", 0, 0, 4, 4, 0)
    f1 = np.full((4, 4), 1, dtype=np.int32)
    out.append(2)
    lzw = _gif_lzw_block(f1, 2)
    out += bytes([len(lzw)]) + lzw + b"\x00"
    # frame 2: 2x2 at (1,1), [[blue, transparent], [transparent, white]],
    # transparent index = 0, disposal 1
    out += b"\x21\xF9\x04" + bytes([0x05]) + _s.pack("<H", 9) + b"\x00\x00"
    out += b"\x2C" + _s.pack("<HHHHB", 1, 1, 2, 2, 0)
    f2 = np.array([[2, 0], [0, 3]], dtype=np.int32)
    out.append(2)
    lzw = _gif_lzw_block(f2, 2)
    out += bytes([len(lzw)]) + lzw + b"\x00"
    out += b"\x3B"

    frames = decode_gif_frames(bytes(out))
    assert len(frames) == 2
    d1, px1 = frames[0]
    d2, px2 = frames[1]
    assert (d1, d2) == (7, 9)
    green, blue, white = (0, 255, 0), (0, 0, 255), (255, 255, 255)
    assert np.array_equal(px1, np.full((4, 4, 3), green, np.uint8))
    want = np.full((4, 4, 3), green, np.uint8)
    want[1, 1] = blue
    want[2, 2] = white  # transparent cells keep frame-1 green
    assert np.array_equal(px2, want)


def test_gif_animation_in_video_sampler():
    """decode_video_frames dispatches animated GIFs: stride sampling +
    fps from the frame delays."""
    from chronicrawl_spark.extras.media import decode_video_frames, make_test_video

    vid = make_test_video(24, 16, n_frames=6, seed=2, container="gif", fps=10.0)
    frames, fps = decode_video_frames(vid, every_k=2)
    assert [i for i, _ in frames] == [0, 2, 4]
    assert fps == 10.0
    frames2, _ = decode_video_frames(vid, every_k=2, max_frames=2)
    assert [i for i, _ in frames2] == [0, 2]
    from chronicrawl_spark.extras.imaging import decode_gif_frames

    truth = decode_gif_frames(vid)
    for i, px in frames:
        assert np.array_equal(px, truth[i][1])


def test_jpeg_progressive_equals_baseline():
    """Progressive (SOF2) encode→decode must reproduce the baseline
    decode bit-for-bit: both paths share the quantized coefficients, so
    the independent baseline decoder is an exact oracle for the whole
    progressive stack (DC successive approximation + refinement, AC
    spectral band + refinement correction bits, EOB handling)."""
    from chronicrawl_spark.extras.imaging import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
        make_smooth_image,
    )

    for w, h, seed in [(16, 16, 1), (33, 17, 5), (64, 48, 9), (7, 5, 3)]:
        for maker in (make_smooth_image, make_test_image):
            px = maker(w, h, seed)
            prog = encode_jpeg_progressive(px)
            assert b"\xff\xc2" in prog  # SOF2 present
            assert prog.count(b"\xff\xda") == 8  # the 8-scan script
            assert np.array_equal(decode_jpeg(prog), decode_jpeg(encode_jpeg(px)))
    # PSNR invariant holds through the progressive path too
    px = make_smooth_image(32, 24, 2)
    out = decode_jpeg(encode_jpeg_progressive(px, quality=95))
    assert psnr(px, out) >= 40


def test_jpeg_progressive_eobrun_multiblock():
    """EOBRUN > 1 decode paths (real-world encoders batch end-of-band runs
    under custom Huffman tables; ours emits r=0 only): drive
    _decode_scan_prog directly with a custom table containing the 0x10
    EOBRUN symbol for both the AC-first and AC-refinement scans."""
    from chronicrawl_spark.extras.imaging import (
        _BitReader,
        _BitWriter,
        _decode_scan_prog,
        _huff_decode_table,
    )

    # canonical table: five 3-bit symbols
    bits = [0, 0, 5] + [0] * 13
    vals = [0x00, 0x10, 0x01, 0x21, 0xF0]
    act = _huff_decode_table(bits, vals)
    enc = {v: (i, 3) for i, v in enumerate(vals)}
    comps = [{"id": 1, "h": 1, "v": 1, "tq": 0}]

    def run_scan(write, seed_coefs=None, ah=0, al=1):
        coefs = [np.zeros((2, 2, 64), dtype=np.int32)]
        if seed_coefs is not None:
            coefs[0][:] = seed_coefs
        bw = _BitWriter()
        write(bw)
        scan = {"sel": {1: (0, 0)}, "ss": 1, "se": 63, "ah": ah, "al": al,
                "ri": 0}
        _decode_scan_prog(
            _BitReader(bw.flush()), scan, comps, coefs,
            {(0, 0): act, (1, 0): act}, 2, 2, 0, 16, 16,
        )
        return coefs[0].reshape(4, 64)

    # AC-first: block0 has +1 at k=1 then EOB; blocks 1-3 covered by one
    # EOBRUN symbol (0x10, ext bit 1 → run 2) plus block3's own EOB... the
    # 0x10+bit=1 gives eobrun = (1<<1)-1+1 = 2 → blocks 1 and 2; block 3
    # gets a plain EOB
    def w1(bw):
        c, ln = enc[0x01]; bw.write(c, ln); bw.write(1, 1)  # +1 at k=1
        c, ln = enc[0x00]; bw.write(c, ln)                  # EOB block0
        c, ln = enc[0x10]; bw.write(c, ln); bw.write(1, 1)  # EOBRUN=2 (blk1,2)
        c, ln = enc[0x00]; bw.write(c, ln)                  # EOB block3

    out = run_scan(w1, ah=0, al=1)
    assert out[0][1] == 2  # +1 << Al
    assert not out[1:].any()

    # AC-refine with history: blocks 0-3 all hold coefficient 2 at k=1
    # (from the prior scan).  One EOBRUN symbol (0x10, ext 0 → run 2)
    # covers blocks 0-1 with one correction bit each (1 → 3, 0 → stays 2);
    # blocks 2-3 each take a plain EOB + correction bit.
    seed = np.zeros((2, 2, 64), dtype=np.int32)
    seed[:, :, 1] = 2

    def w2(bw):
        c, ln = enc[0x10]; bw.write(c, ln); bw.write(0, 1)  # eobrun = 2
        bw.write(1, 1)  # block0 correction: 2 -> 3
        bw.write(0, 1)  # block1 correction: stays 2
        c, ln = enc[0x00]; bw.write(c, ln); bw.write(1, 1)  # block2 -> 3
        c, ln = enc[0x00]; bw.write(c, ln); bw.write(0, 1)  # block3 stays
    out = run_scan(w2, seed_coefs=seed, ah=1, al=0)
    assert [int(v) for v in out[:, 1]] == [3, 2, 3, 2]


def test_progressive_jpeg_through_fused_stage(spark):
    """A progressive-JPEG payload flows through decode_verify_thumbnails
    like any other jpeg (fmt dispatch is container-level; the decoder
    handles SOF0/SOF2 transparently)."""
    from chronicrawl_spark.extras.imaging import (
        decode_jpeg,
        decode_verify_thumbnails,
        encode_jpeg_progressive,
        make_smooth_image,
        phash64,
    )
    from chronicrawl_spark.fixtures import make_images

    base = make_smooth_image(32, 24, seed=6)
    data = encode_jpeg_progressive(base)
    ph = phash64(decode_jpeg(data))
    schema = make_images(spark, n=1, w=32, h=24).schema
    row = spark.createDataFrame(
        [("prog0", bytearray(data), 32, 24, "jpeg", "cap", ph)], schema
    )
    out = decode_verify_thumbnails(row, max_dim=16).collect()
    assert len(out) == 1 and out[0]["ok"] is True and out[0]["error"] is None
    assert (out[0]["thumb_w"], out[0]["thumb_h"]) == (16, 12)


def test_jpeg_restart_markers_baseline():
    """DRI + RSTn streams must decode identically to the unmarked stream
    (coefficients are unchanged; only entropy segmentation differs).
    Pins the inlined scan loop's commit/reload around _skip_rst and the
    DC-predictor reset at each restart boundary."""
    from chronicrawl_spark.extras.imaging import decode_jpeg, encode_jpeg

    for w, h in [(128, 96), (33, 17), (17, 9)]:
        px = make_test_image(w, h, 2)
        plain = decode_jpeg(encode_jpeg(px))
        n_mcus = -(-w // 8) * -(-h // 8)
        for ri in (1, 2, 5, 9):
            data = encode_jpeg(px, restart_interval=ri)
            assert b"\xff\xdd" in data  # DRI present
            if ri < n_mcus:  # a boundary exists → markers must too
                assert any(bytes([0xFF, 0xD0 + m]) in data for m in range(8))
            assert np.array_equal(decode_jpeg(data), plain), (w, h, ri)


def test_jpeg_restart_markers_progressive():
    """RSTn inside every progressive scan (DC first/refine, AC band,
    AC refinement): exercises the decoder's per-scan restart handling —
    EOB-run reset and DC-predictor reset — against the baseline oracle."""
    from chronicrawl_spark.extras.imaging import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
        make_smooth_image,
    )

    for w, h in [(33, 17), (64, 48)]:
        for maker in (make_test_image, make_smooth_image):
            px = maker(w, h, 2)
            plain = decode_jpeg(encode_jpeg(px))
            for ri in (1, 3, 7):
                data = encode_jpeg_progressive(px, restart_interval=ri)
                assert b"\xff\xdd" in data
                assert np.array_equal(decode_jpeg(data), plain), (w, h, ri)
