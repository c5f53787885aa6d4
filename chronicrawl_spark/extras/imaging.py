"""Image payload axis: pure-numpy codec, perceptual hash, PSNR verification.

The driver's ``input_hint`` makes fetch payloads image+caption pairs with a
per-row invariant: decoded-pixel allclose (PSNR ≥ 40 dB for lossy formats)
and caption equality.  The sandbox has **no imaging libraries** (no PIL), so:

- ``bmp`` (24-bit, uncompressed) is implemented fully — a real, lossless,
  vectorized numpy codec used end-to-end in tests and the crawl pipeline.
- ``jpeg``/``gif``/``png`` decode is **STUBBED**: ``decode_image`` raises
  ``NotImplementedError`` for them.  The Spark-side plumbing (binary
  columns, Arrow batches, UDF signatures, partitioning) is identical for
  every format, so swapping in PIL/libvips on a real cluster is a one-line
  change inside ``decode_image``.

All functions operate on numpy arrays (H×W×3 uint8) and are called from
Arrow-batched pandas UDFs — no per-row Python in the Spark plan.
"""

from __future__ import annotations

import struct

import numpy as np


def make_test_image(w: int, h: int, seed: int = 0) -> np.ndarray:
    """Deterministic synthetic image (no RNG): seeded interference pattern."""
    x = np.arange(w, dtype=np.float64)[None, :]
    y = np.arange(h, dtype=np.float64)[:, None]
    s = float(seed % 97 + 1)
    r = (127.5 + 127.5 * np.sin(x / (3.0 + s % 7) + s)) % 256
    g = (127.5 + 127.5 * np.cos(y / (2.0 + s % 5) - s)) % 256
    b = (x * y / (1.0 + s) + s * 13) % 256
    return np.stack(
        [np.broadcast_to(r, (h, w)), np.broadcast_to(g, (h, w)), np.broadcast_to(b, (h, w))],
        axis=-1,
    ).astype(np.uint8)


# ------------------------------------------------------------------ BMP codec

def encode_bmp(px: np.ndarray) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up, 4-byte row pad)."""
    h, w, c = px.shape
    assert c == 3
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    stride = row_bytes + pad
    img_size = stride * h
    # pixel data: bottom-up, BGR
    bgr = px[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode 24-bit uncompressed BMP back to H×W×3 uint8 (RGB)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = arr.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flip else rgb


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Format dispatch.  bmp is real; jpeg/png/gif are STUBS in this sandbox
    (no imaging libs) — on a cluster, ship PIL via --archives and replace the
    raise with ``PIL.Image.open``."""
    f = (fmt or "").lower()
    if f == "bmp":
        return decode_bmp(data)
    raise NotImplementedError(f"decode for {fmt!r} is stubbed in the sandbox (no imaging libs)")


# --------------------------------------------------------------- verification

def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(px: np.ndarray) -> int:
    """64-bit perceptual hash: 8×8 block-mean average hash over luma.

    Deterministic, pure numpy.  (Not the DCT pHash — documented; the fixture
    generator and the verifier use the same function, which is what the
    per-row invariant needs.)
    """
    h, w, _ = px.shape
    luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    # block-mean resize to 8×8
    ys = np.linspace(0, h, 9, dtype=int)
    xs = np.linspace(0, w, 9, dtype=int)
    blocks = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            blocks[i, j] = luma[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks > blocks.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
