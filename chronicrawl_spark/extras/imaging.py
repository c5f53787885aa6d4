"""Image payload axis: pure-numpy codecs, perceptual hash, PSNR verification.

The driver's ``input_hint`` makes fetch payloads image+caption pairs with a
per-row invariant: decoded-pixel allclose (PSNR ≥ 40 dB for lossy formats)
and caption equality.  The sandbox has **no imaging libraries** (no PIL), so:

- ``bmp`` (24-bit, uncompressed) is implemented fully — a real, lossless,
  vectorized numpy codec used end-to-end in tests and the crawl pipeline.
- ``png`` (8-bit truecolor RGB/RGBA, non-interlaced) is implemented from
  the public PNG spec with stdlib ``zlib``: chunk framing + CRC, all five
  scanline filters on decode, filter-0 encode — a real lossless compressed
  format in the pipeline.
- ``jpeg``/``gif`` decode is **STUBBED**: ``decode_image`` raises
  ``NotImplementedError`` for them.  The Spark-side plumbing (binary
  columns, Arrow batches, UDF signatures, partitioning) is identical for
  every format, so swapping in PIL/libvips on a real cluster is a one-line
  change inside ``decode_image``.

All functions operate on numpy arrays (H×W×3 uint8) and are called from
Arrow-batched pandas UDFs — no per-row Python in the Spark plan.
"""

from __future__ import annotations

import struct
import zlib

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


# ------------------------------------------------------------------ PNG codec
# From the public PNG specification (RFC 2083 / W3C PNG): 8-byte signature,
# length-type-data-CRC chunks, IDAT = zlib stream of filter-byte-prefixed
# scanlines.  Supports 8-bit truecolor (type 2) and truecolor+alpha (type 6),
# non-interlaced; decode handles all five filters, encode emits filter 0.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """8-bit truecolor PNG, filter 0 per scanline, single IDAT."""
    h, w, c = px.shape
    assert c in (3, 4)
    color_type = 2 if c == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), px.reshape(h, w * c)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode non-interlaced 8-bit truecolor PNG (RGB returned; alpha
    dropped).  Verifies signature and per-chunk CRCs."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    idat = []
    w = h = bpp = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r}")
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or color not in (2, 6) or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("only 8-bit truecolor non-interlaced PNG supported")
            bpp = 3 if color == 2 else 4
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("bad IDAT length")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1)
        if ft == 0:
            cur = line.copy()
        elif ft == 2:  # Up
            cur = line + prev
        elif ft == 1:  # Sub: per-lane prefix sum
            lanes = line.reshape(w, bpp).astype(np.uint64)
            cur = np.cumsum(lanes, axis=0).astype(np.uint8).reshape(stride)
        else:  # Average (3) / Paeth (4): sequential in x, vector over lanes
            cur = np.zeros(stride, dtype=np.uint8)
            lanes_f = line.reshape(w, bpp)
            lanes_p = prev.reshape(w, bpp)
            lanes_c = cur.reshape(w, bpp)
            left = np.zeros(bpp, dtype=np.uint8)
            upleft = np.zeros(bpp, dtype=np.uint8)
            for x in range(w):
                if ft == 3:
                    pred = ((left.astype(np.int16) + lanes_p[x]) // 2).astype(np.uint8)
                else:
                    pred = _paeth(left, lanes_p[x], upleft)
                lanes_c[x] = lanes_f[x] + pred
                left = lanes_c[x]
                upleft = lanes_p[x]
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, bpp)
    return px[:, :, :3].copy()


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Format dispatch.  bmp and png are real from-scratch codecs; jpeg/gif
    are STUBS in this sandbox (no imaging libs) — on a cluster, ship PIL via
    --archives and replace the raise with ``PIL.Image.open``."""
    f = (fmt or "").lower()
    if f == "bmp":
        return decode_bmp(data)
    if f == "png":
        return decode_png(data)
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
