"""Image payload axis: pure-numpy codecs, perceptual hash, PSNR verification.

The driver's ``input_hint`` makes fetch payloads image+caption pairs with a
per-row invariant: decoded-pixel allclose (PSNR ≥ 40 dB for lossy formats)
and caption equality.  The sandbox has **no imaging libraries** (no PIL), so:

- ``bmp`` (24-bit, uncompressed) is implemented fully — a real, lossless,
  vectorized numpy codec used end-to-end in tests and the crawl pipeline.
- ``png`` (8-bit truecolor RGB/RGBA) is implemented from the public PNG
  spec with stdlib ``zlib``: chunk framing + CRC, all five scanline
  filters on decode, Adam7 interlace, filter-0 encode — a real lossless
  compressed format in the pipeline.
- ``jpeg`` (ITU-T T.81, Annex K tables) is implemented fully from
  scratch: 4:4:4 baseline AND progressive (SOF2 annex G: spectral
  selection + successive approximation) encode, and a decoder that
  handles baseline and progressive streams, generic chroma sampling,
  grayscale, per-scan table redefinition, and RSTn markers.  q95
  round-trips at ≈49 dB PSNR on smooth fixtures — the ≥40 dB lossy
  invariant is real.
- ``gif`` (GIF87a/89a) is implemented fully from scratch: variable-width
  LSB-first LZW decode (KwKwK, width bumps, 4096 reset), 4-pass interlace,
  and FULL animation composite (graphic-control delays, transparency,
  disposal 0-3, local palettes) via ``decode_gif_frames``; encoders emit
  valid clear-throttled LZW stills and multi-frame GIF89a animations.

All four codecs are real — no stubs remain.  On a production cluster
PIL/libvips would still be the sensible swap-in inside ``decode_image``
(these pure-numpy codecs exist because the sandbox has no imaging libs),
but nothing here depends on that swap.

All functions operate on numpy arrays (H×W×3 uint8) and are called from
Arrow-batched pandas UDFs — no per-row Python in the Spark plan.
"""

from __future__ import annotations

import struct
import zlib
from functools import lru_cache

import numpy as np


def make_test_image(w: int, h: int, seed: int = 0) -> np.ndarray:
    """Deterministic synthetic image (no RNG): seeded interference pattern.
    The ``% 256`` wraps create 255-step pixel cliffs — ideal for exercising
    the LOSSLESS codecs, pathological for DCT quantization (use
    ``make_smooth_image`` for lossy-format fixtures)."""
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


def make_smooth_image(w: int, h: int, seed: int = 0) -> np.ndarray:
    """Deterministic band-limited image (bounded sinusoids, no wraparound
    cliffs) — the photographic-content stand-in for lossy-codec fixtures;
    baseline JPEG at quality 95 keeps PSNR ≥ 40 dB on these."""
    x = np.arange(w, dtype=np.float64)[None, :]
    y = np.arange(h, dtype=np.float64)[:, None]
    s = float(seed % 97 + 1)
    r = 127.5 + 70 * np.sin(x / (6.0 + s % 5) + s) + 40 * np.cos(y / (7.0 + s % 3))
    g = 127.5 + 60 * np.cos((x + y) / (9.0 + s % 4) - s) + 30 * np.sin(y / 5.0)
    b = 127.5 + 50 * np.sin(x / 8.0) * np.cos(y / (6.0 + s % 2)) + 20 * np.sin(s + x / 11.0)
    rgb = np.stack(
        [np.broadcast_to(r, (h, w)), np.broadcast_to(g, (h, w)), np.broadcast_to(b, (h, w))],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


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
# non-interlaced or Adam7; decode handles all five filters, encode emits
# filter 0 non-interlaced.

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


def _png_unfilter(raw: bytes, offset: int, w: int, h: int, bpp: int) -> np.ndarray:
    """Undo PNG per-scanline filtering for one image (or one Adam7 pass):
    ``h`` scanlines of ``1 + w*bpp`` bytes starting at ``offset``.
    Returns (h, w*bpp) uint8."""
    stride = w * bpp
    if len(raw) < offset + h * (stride + 1):
        raise ValueError("bad IDAT length")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = offset + y * (stride + 1)
        ft = raw[base]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=base + 1)
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
    return out


# Adam7 pass grid: (x0, y0, dx, dy) per PNG spec §8.2
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def decode_png(data: bytes) -> np.ndarray:
    """Decode 8-bit truecolor PNG, non-interlaced or Adam7-interlaced
    (RGB returned; alpha dropped).  Verifies signature and per-chunk
    CRCs.  Each Adam7 pass is its own filtered sub-image (filters predict
    within the pass, not across passes), unfiltered independently and
    scattered onto the full-frame grid."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    idat = []
    w = h = bpp = None
    interlace = 0
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r}")
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or color not in (2, 6) or comp != 0 or filt != 0 or interlace not in (0, 1):
                raise ValueError("only 8-bit truecolor PNG supported")
            bpp = 3 if color == 2 else 4
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        if len(raw) != h * (w * bpp + 1):
            raise ValueError("bad IDAT length")
        px = _png_unfilter(raw, 0, w, h, bpp).reshape(h, w, bpp)
    else:
        px = np.zeros((h, w, bpp), dtype=np.uint8)
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub = _png_unfilter(raw, offset, pw, ph, bpp).reshape(ph, pw, bpp)
            px[y0::dy, x0::dx] = sub
            offset += ph * (pw * bpp + 1)
        if offset != len(raw):
            raise ValueError("bad IDAT length")
    return px[:, :, :3].copy()


# ----------------------------------------------------------------- JPEG codec
# DCT JPEG from the public ITU-T T.81 spec (baseline + progressive): Annex K
# quantization + Huffman tables, JFIF markers, 4:4:4 encode (no chroma
# subsampling — maximizes fidelity for the PSNR≥40dB invariant), decoder
# handles arbitrary sampling factors (replication upsampling), restart
# markers, and multi-scan-free baseline streams.  All block math (DCT /
# IDCT / quantization) is vectorized numpy over all blocks at once; the
# entropy coder is per-symbol Python — fine for the fixture thumbnails, and
# at cluster scale you'd ship libjpeg-turbo and swap only this dispatch.

# Annex K.1/K.2 quantization tables (luminance, chrominance)
_JPEG_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_JPEG_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# zigzag scan order (index i of the zigzag sequence → raster position)
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.3 typical Huffman tables: (BITS counts for lengths 1..16, HUFFVAL)
_HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    C = np.cos(np.pi * (2 * n[None, :] + 1) * n[:, None] / 16) * np.sqrt(2 / 8)
    C[0] = 1 / np.sqrt(8)
    return C


_DCT = _dct_matrix()


def _huff_codes(bits, vals):
    """Canonical Huffman: value -> (code, length)."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _quality_tables(quality: int):
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tl = np.clip((_JPEG_QT_LUMA * scale + 50) // 100, 1, 255)
    tc = np.clip((_JPEG_QT_CHROMA * scale + 50) // 100, 1, 255)
    return tl, tc


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[:, :, 0].astype(np.float64), px[:, :, 1].astype(np.float64), px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) → (nby, nbx, 8, 8) with edge-replication padding."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = p.shape
    return p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.buf)

    def restart(self, m: int):
        """Byte-align (1-padded) and emit an unstuffed RSTm marker."""
        if self.n:
            self.write(0x7F, 8 - self.n)
        self.buf += bytes([0xFF, 0xD0 + (m & 7)])


def _mag_bits(v: int):
    """(size, code-bits) for a DC diff / AC coefficient value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def encode_jpeg(px: np.ndarray, quality: int = 92, restart_interval: int = 0) -> bytes:
    """Baseline JFIF JPEG, 4:4:4, Annex K tables scaled by ``quality``.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (coefficients are unchanged, so decode output must be
    identical to the unmarked stream — pinned in tests)."""
    h, w, _ = px.shape
    tl, tc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(px) - 128.0
    dc_tabs = [_huff_codes(*_HT_DC_LUMA), _huff_codes(*_HT_DC_CHROMA)]
    ac_tabs = [_huff_codes(*_HT_AC_LUMA), _huff_codes(*_HT_AC_CHROMA)]
    comp_q = [tl, tc, tc]
    comp_t = [0, 1, 1]

    # vectorized DCT + quantization per component: (nby*nbx, 64) zigzagged ints
    coefs = []
    for c in range(3):
        bl = _blocks(ycc[:, :, c])
        nby, nbx = bl.shape[:2]
        flat = bl.reshape(-1, 8, 8)
        F8 = _DCT @ flat @ _DCT.T
        qt = comp_q[c].reshape(8, 8)
        qd = np.round(F8 / qt).astype(np.int32).reshape(-1, 64)[:, _ZIGZAG]
        coefs.append(qd)

    bw = _BitWriter()
    preds = [0, 0, 0]
    n_blocks = coefs[0].shape[0]
    rst_m = 0
    for bi in range(n_blocks):  # 4:4:4 MCU = one block per component
        if restart_interval and bi and bi % restart_interval == 0:
            bw.restart(rst_m)
            rst_m = (rst_m + 1) & 7
            preds = [0, 0, 0]
        for c in range(3):
            z = coefs[c][bi]
            dct_t, act_t = dc_tabs[comp_t[c]], ac_tabs[comp_t[c]]
            diff = int(z[0]) - preds[c]
            preds[c] = int(z[0])
            size, bits = _mag_bits(diff)
            code, ln = dct_t[size]
            bw.write(code, ln)
            if size:
                bw.write(bits, size)
            run = 0
            last_nz = int(np.max(np.nonzero(z)[0])) if np.any(z[1:]) else 0
            for k in range(1, 64):
                v = int(z[k])
                if v == 0:
                    if k > last_nz:
                        code, ln = act_t[0x00]  # EOB
                        bw.write(code, ln)
                        break
                    run += 1
                    if run == 16:
                        code, ln = act_t[0xF0]  # ZRL
                        bw.write(code, ln)
                        run = 0
                    continue
                size, bits = _mag_bits(v)
                code, ln = act_t[(run << 4) | size]
                bw.write(code, ln)
                bw.write(bits, size)
                run = 0
    entropy = bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dqt(tid, table):
        return seg(0xDB, bytes([tid]) + bytes(int(table[i]) for i in _ZIGZAG))

    def dht(cls, tid, bits, vals):
        return seg(0xC4, bytes([(cls << 4) | tid] + bits + vals))

    sof = seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
        + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    jfif = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xFF\xD8" + jfif + dqt(0, tl) + dqt(1, tc)
        + dht(0, 0, *_HT_DC_LUMA) + dht(1, 0, *_HT_AC_LUMA)
        + dht(0, 1, *_HT_DC_CHROMA) + dht(1, 1, *_HT_AC_CHROMA)
        + dri + sof + sos + entropy + b"\xFF\xD9"
    )


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker (EOI / RSTn boundary handled by caller): feed 0s
                    self.pos -= 1
                    b = 0
                    self.acc = (self.acc << 8) | b
                    self.n += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill()
        if self.n < length:
            self.acc <<= length - self.n
            self.n = length
        v = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return v

    def align(self):
        self.n = 0
        self.acc = 0


class _HuffTable:
    """Flat 16-bit-prefix decode LUT: ``lut[next16bits] -> (symbol, length)``.

    Canonical JPEG codes are ≤16 bits and prefix-free, so every 16-bit
    window maps to exactly one (symbol, code length) — one list index
    replaces the old walk of up to 16 single-bit reads per symbol (the
    decode profile's #1 hot spot).  ``None`` entries are prefixes that
    no code owns (corrupt stream → ValueError, matching the old walk)."""

    __slots__ = ("lut",)

    def __init__(self, bits, vals):
        lut = [None] * 65536
        code, i = 0, 0
        for length in range(1, 17):
            span = 1 << (16 - length)
            for _ in range(bits[length - 1]):
                start = code << (16 - length)
                lut[start:start + span] = [(vals[i], length)] * span
                code += 1
                i += 1
            code <<= 1
        self.lut = lut


@lru_cache(maxsize=64)
def _huff_table_cached(bits_t, vals_t) -> _HuffTable:
    # LUT construction fills 65536 slots; real streams reuse the Annex-K
    # tables across every image in a batch, so cache by table spec.
    return _HuffTable(bits_t, vals_t)


def _huff_decode_table(bits, vals) -> _HuffTable:
    return _huff_table_cached(tuple(bits), tuple(vals))


def _read_symbol(br: _BitReader, table: _HuffTable) -> int:
    br._fill()
    n = br.n
    # 16-bit peek, zero-padded past stream end exactly like read()
    window = (br.acc >> (n - 16)) if n >= 16 else (br.acc << (16 - n)) & 0xFFFF
    hit = table.lut[window & 0xFFFF]
    if hit is None:
        raise ValueError("invalid Huffman code")
    sym, ln = hit
    if n < ln:
        br.acc <<= ln - n
        n = ln
    n -= ln
    br.acc &= (1 << n) - 1
    br.n = n
    return sym


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def encode_jpeg_progressive(px: np.ndarray, quality: int = 92,
                            restart_interval: int = 0) -> bytes:
    """Progressive JFIF JPEG (SOF2), 4:4:4, written from T.81 annex G with
    the classic successive-approximation scan script:

      1. DC, all components interleaved, Al=1
      2. DC refinement, Ah=1 → Al=0 (one bit per block)
      3-5. AC 1..63 per component, Al=1 (spectral selection + EOB runs)
      6-8. AC refinement per component, Ah=1 → Al=0 (correction bits)

    Coefficients are identical to ``encode_jpeg``'s — only the entropy
    layout differs — so ``decode_jpeg(encode_jpeg_progressive(px))`` must
    equal ``decode_jpeg(encode_jpeg(px))`` bit-for-bit (pinned in tests):
    the baseline path is an independent oracle for the progressive one.

    ``restart_interval`` > 0 emits DRI + RSTn every that many data units
    in EVERY scan (marker count restarting at RST0 per scan, T.81 E.1.4)
    — exercises the decoder's progressive restart path, including the
    EOB-run and DC-predictor resets."""
    h, w, _ = px.shape
    tl, tc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(px) - 128.0
    dc_tabs = [_huff_codes(*_HT_DC_LUMA), _huff_codes(*_HT_DC_CHROMA)]
    ac_tabs = [_huff_codes(*_HT_AC_LUMA), _huff_codes(*_HT_AC_CHROMA)]
    comp_q = [tl, tc, tc]
    comp_t = [0, 1, 1]
    coefs = []
    for c in range(3):
        bl = _blocks(ycc[:, :, c])
        flat = bl.reshape(-1, 8, 8)
        F8 = _DCT @ flat @ _DCT.T
        qt = comp_q[c].reshape(8, 8)
        coefs.append(np.round(F8 / qt).astype(np.int32).reshape(-1, 64)[:, _ZIGZAG])
    n_blocks = coefs[0].shape[0]

    def pt(v: int, al: int) -> int:
        """AC point transform: magnitude shift (divide toward zero) —
        T.81 G.1.2.2.  DC uses the ARITHMETIC shift instead (G.1.2.1);
        the asymmetry is the spec's, and getting it backwards corrupts
        negative odd DCs by 2 (caught by the baseline-equality test)."""
        return v >> al if v >= 0 else -((-v) >> al)

    def scan_rst(bw, bi, state) -> bool:
        """Emit RSTn at a restart boundary; True means reset predictors."""
        if restart_interval and bi and bi % restart_interval == 0:
            bw.restart(state[0])
            state[0] = (state[0] + 1) & 7
            return True
        return False

    def dc_first(bw, al):
        preds = [0, 0, 0]
        rst = [0]
        for bi in range(n_blocks):
            if scan_rst(bw, bi, rst):
                preds = [0, 0, 0]
            for c in range(3):
                v = int(coefs[c][bi][0]) >> al  # arithmetic shift (G.1.2.1)
                diff = v - preds[c]
                preds[c] = v
                size, bits = _mag_bits(diff)
                code, ln = dc_tabs[comp_t[c]][size]
                bw.write(code, ln)
                if size:
                    bw.write(bits, size)

    def dc_refine(bw, al):
        rst = [0]
        for bi in range(n_blocks):
            scan_rst(bw, bi, rst)
            for c in range(3):
                bw.write((int(coefs[c][bi][0]) >> al) & 1, 1)

    # The standard Annex-K AC tables define only the r=0 EOB symbol (0x00),
    # so end-of-band runs are emitted one block at a time (EOBRUN=1 each);
    # real-world encoders batch longer runs under custom DHTs — the decoder
    # handles both (EOBRUN>1 pinned by a custom-table test).

    def ac_first(bw, c, ss, se, al):
        act = ac_tabs[comp_t[c]]
        rst = [0]
        for bi in range(n_blocks):
            scan_rst(bw, bi, rst)
            z = coefs[c][bi]
            band = [pt(int(z[k]), al) for k in range(ss, se + 1)]
            if not any(band):
                code, ln = act[0x00]
                bw.write(code, ln)
                continue
            run = 0
            last_nz = max(i for i, v in enumerate(band) if v)
            for i in range(last_nz + 1):
                v = band[i]
                if v == 0:
                    run += 1
                    if run == 16:
                        code, ln = act[0xF0]
                        bw.write(code, ln)
                        run = 0
                    continue
                size, bits = _mag_bits(v)
                code, ln = act[(run << 4) | size]
                bw.write(code, ln)
                bw.write(bits, size)
                run = 0
            if last_nz < len(band) - 1:
                code, ln = act[0x00]
                bw.write(code, ln)

    def ac_refine(bw, c, ss, se, al):
        # T.81 G.1.2.3 encoder side: newly-significant coefficients are
        # run-length coded with size 1 + sign bit; already-significant
        # ones contribute correction bits appended after each symbol; a
        # block's end-of-band emits EOB followed by the trailing history
        # coefficients' correction bits
        act = ac_tabs[comp_t[c]]
        ah = al + 1
        rst = [0]
        for bi in range(n_blocks):
            scan_rst(bw, bi, rst)
            z = coefs[c][bi]
            absband = [abs(int(z[k])) >> al for k in range(ss, se + 1)]
            signs = [1 if int(z[k]) >= 0 else 0 for k in range(ss, se + 1)]
            eob = 0  # band index just past the last NEWLY-significant coeff
            for i, a in enumerate(absband):
                if a == 1 and (abs(int(z[ss + i])) >> ah) == 0:
                    eob = i + 1
            run = 0
            corr: list = []
            for i in range(eob):
                a = absband[i]
                if a == 0:
                    run += 1
                    if run == 16:
                        code, ln = act[0xF0]
                        bw.write(code, ln)
                        for bbit in corr:
                            bw.write(bbit, 1)
                        corr = []
                        run = 0
                    continue
                if a > 1:  # history coefficient: correction bit only
                    corr.append(a & 1)
                    continue
                code, ln = act[(run << 4) | 1]
                bw.write(code, ln)
                bw.write(signs[i], 1)
                for bbit in corr:
                    bw.write(bbit, 1)
                corr = []
                run = 0
            if eob < len(absband):
                code, ln = act[0x00]  # EOBRUN of 1
                bw.write(code, ln)
                for i in range(eob, len(absband)):
                    if absband[i] > 1:
                        bw.write(absband[i] & 1, 1)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dqt(tid, table):
        return seg(0xDB, bytes([tid]) + bytes(int(table[i]) for i in _ZIGZAG))

    def dht(cls, tid, bits, vals):
        return seg(0xC4, bytes([(cls << 4) | tid] + bits + vals))

    def sos(comp_sel, ss, se, ah, al):
        body = bytes([len(comp_sel)])
        for cid, tabs in comp_sel:
            body += bytes([cid, tabs])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    out = bytearray(b"\xFF\xD8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, tl) + dqt(1, tc)
    out += dht(0, 0, *_HT_DC_LUMA) + dht(1, 0, *_HT_AC_LUMA)
    out += dht(0, 1, *_HT_DC_CHROMA) + dht(1, 1, *_HT_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(
        0xC2,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
        + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]),
    )
    sel3 = [(1, 0x00), (2, 0x11), (3, 0x11)]
    bw = _BitWriter(); dc_first(bw, 1)
    out += sos(sel3, 0, 0, 0, 1) + bw.flush()
    bw = _BitWriter(); dc_refine(bw, 0)
    out += sos(sel3, 0, 0, 1, 0) + bw.flush()
    for c, cid in ((0, 1), (1, 2), (2, 3)):
        tabs = 0x00 if c == 0 else 0x11
        bw = _BitWriter(); ac_first(bw, c, 1, 63, 1)
        out += sos([(cid, tabs)], 1, 63, 0, 1) + bw.flush()
    for c, cid in ((0, 1), (1, 2), (2, 3)):
        tabs = 0x00 if c == 0 else 0x11
        bw = _BitWriter(); ac_refine(bw, c, 1, 63, 0)
        out += sos([(cid, tabs)], 1, 63, 1, 0) + bw.flush()
    out += b"\xFF\xD9"
    return bytes(out)


def _entropy_end(data: bytes, pos: int) -> int:
    """First offset ≥ pos of a marker that terminates an entropy-coded
    segment (0xFF followed by anything but a stuff byte or RSTn).
    Jumps between 0xFF occurrences with C-level bytes.find instead of a
    per-byte Python walk (this runs once per scan over the remaining
    stream, which made it ~10% of baseline decode)."""
    n = len(data)
    find = data.find
    i = pos
    while True:
        i = find(0xFF, i)
        if i < 0 or i + 1 >= n:
            return n
        nxt = data[i + 1]
        if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
            return i
        # stuffed byte or RSTn: data[i+1] != 0xFF here, so resume at i+2
        i += 2


def _split_restart_segments(data: bytes) -> list[bytes]:
    """Split one scan's entropy-coded bytes on RSTn markers and destuff
    each segment (FF00 → FF) with C-level ``bytes.replace``.  Inside a
    scan slice every 0xFF is either a stuff pair or an RSTn prefix
    (``_entropy_end`` stops at anything else), so FF+D0..D7 is always a
    real restart marker — segments are pure bit data afterwards and the
    decode loop needs no per-byte 0xFF branch at all."""
    segs = []
    start = 0
    i = 0
    n = len(data)
    find = data.find
    while True:
        i = find(0xFF, i)
        if i < 0 or i + 1 >= n:
            segs.append(data[start:])
            break
        nxt = data[i + 1]
        if 0xD0 <= nxt <= 0xD7:
            segs.append(data[start:i])
            i += 2
            start = i
        elif nxt == 0x00:
            i += 2
        else:
            # stray marker (malformed slice): end the segment here, like
            # the byte-wise reader's feed-zeros-at-marker behaviour
            segs.append(data[start:i])
            break
    return [s.replace(b"\xff\x00", b"\xff") for s in segs]


def _skip_rst(br: _BitReader):
    """Byte-align and consume an RSTn marker at a restart boundary."""
    br.align()
    while br.pos < len(br.data) and br.data[br.pos] != 0xFF:
        br.pos += 1
    if br.pos + 1 < len(br.data) and 0xD0 <= br.data[br.pos + 1] <= 0xD7:
        br.pos += 2


def _decode_scan_seq(br, scan, comps, coefs, hts, mcux, mcuy, restart_interval):
    """Baseline interleaved scan: DC+AC per block into the zigzag
    coefficient store.

    The bit reader is INLINED into this loop (acc/n/pos held in locals) —
    this is the whole-image hot loop.  The scan is pre-split on RSTn
    markers and destuffed ONCE per segment (C-level bytes.replace,
    _split_restart_segments), then converted to big-endian 32-bit words
    in one numpy frombuffer — a ≥31-bit top-up is a single list index:
    no per-byte 0xFF test, no _skip_rst calls.  Semantics are
    bit-identical to
    _read_symbol/_BitReader.read (same LUT, same zero padding past
    markers/stream end — the shift-pad in the window/magnitude reads
    supplies the zeros the byte-wise reader fed explicitly)."""
    sel = scan["sel"]
    order = [ci for ci, c in enumerate(comps) if c["id"] in sel]
    comp_info = [
        (ci, comps[ci]["h"], comps[ci]["v"],
         hts[(0, sel[comps[ci]["id"]][0])].lut,
         hts[(1, sel[comps[ci]["id"]][1])].lut,
         coefs[ci])
        for ci in order
    ]
    preds = [0] * len(comps)

    def _words(seg: bytes) -> list:
        # big-endian 32-bit words, zero-padded at the tail — the pad bits
        # are exactly the zeros the byte-wise reader fed past stream end,
        # so consuming them is bit-identical to the old shift-pad path
        pad = (-len(seg)) % 4
        return np.frombuffer(seg + b"\x00" * pad, dtype=">u4").tolist()

    segs = [_words(s) for s in _split_restart_segments(br.data[br.pos :])]
    seg_i = 0
    words = segs[0]
    nw = len(words)
    wi, acc, n = 0, 0, 0
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                seg_i += 1
                words = segs[seg_i] if seg_i < len(segs) else []
                nw = len(words)
                wi, acc, n = 0, 0, 0
                preds = [0] * len(comps)
            mcu_n += 1
            for ci, ch, cv, dct_lut, act_lut, cf in comp_info:
                for by in range(cv):
                    row = cf[my * cv + by]
                    for bx in range(ch):
                        z = row[mx * ch + bx]
                        if n < 31 and wi < nw:
                            acc = (acc << 32) | words[wi]
                            wi += 1
                            n += 32
                        window = (acc >> (n - 16)) if n >= 16 else (acc << (16 - n)) & 0xFFFF
                        hit = dct_lut[window & 0xFFFF]
                        if hit is None:
                            raise ValueError("invalid Huffman code")
                        size, ln2 = hit
                        if n < ln2:
                            acc <<= ln2 - n
                            n = ln2
                        n -= ln2
                        acc &= (1 << n) - 1
                        if size:
                            if n < size:
                                acc <<= size - n
                                n = size
                            v = (acc >> (n - size)) & ((1 << size) - 1)
                            n -= size
                            acc &= (1 << n) - 1
                            preds[ci] += v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                        z[0] = preds[ci]
                        k = 1
                        while k < 64:
                            if n < 31 and wi < nw:
                                acc = (acc << 32) | words[wi]
                                wi += 1
                                n += 32
                            window = (acc >> (n - 16)) if n >= 16 else (acc << (16 - n)) & 0xFFFF
                            hit = act_lut[window & 0xFFFF]
                            if hit is None:
                                raise ValueError("invalid Huffman code")
                            sym, ln2 = hit
                            if n < ln2:
                                acc <<= ln2 - n
                                n = ln2
                            n -= ln2
                            acc &= (1 << n) - 1
                            if sym == 0x00:
                                break
                            run, size = sym >> 4, sym & 15
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            if n < size:
                                acc <<= size - n
                                n = size
                            v = (acc >> (n - size)) & ((1 << size) - 1)
                            n -= size
                            acc &= (1 << n) - 1
                            z[k] = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                            k += 1
    # baseline is single-scan: park the shared reader at stream end (pos
    # is segment-relative now, so the old raw-offset commit is meaningless)
    br.pos, br.acc, br.n = len(br.data), 0, 0


def _decode_scan_prog(br, scan, comps, coefs, hts, mcux, mcuy, restart_interval, w, h):
    """One progressive scan (T.81 annex G): DC first/refine (interleaved or
    not), AC first with EOB runs, AC refinement with correction bits."""
    sel, ss, se, ah, al = scan["sel"], scan["ss"], scan["se"], scan["ah"], scan["al"]
    order = [ci for ci, c in enumerate(comps) if c["id"] in sel]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    preds = {ci: 0 for ci in order}
    state = {"eobrun": 0}
    p1 = 1 << al

    def dc_block(ci, z, dct_t):
        if ah == 0:
            size = _read_symbol(br, dct_t)
            diff = _extend(br.read(size), size) if size else 0
            preds[ci] += diff
            z[0] = preds[ci] * p1
        else:
            if br.read(1):
                z[0] |= p1

    def ac_first(z, act_t):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            sym = _read_symbol(br, act_t)
            r, sz = sym >> 4, sym & 15
            if sz == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += br.read(r)
                    return
                k += 16
                continue
            k += r
            if k > se:
                raise ValueError("AC index overflow")
            z[k] = _extend(br.read(sz), sz) * p1
            k += 1

    def ac_refine(z, act_t):
        # T.81 G.1.2.3 correction-bit algorithm (the libjpeg jdphuff shape,
        # reimplemented from the spec text)
        m1 = -p1

        def correct(k):
            if br.read(1) and (int(z[k]) & p1) == 0:
                z[k] += p1 if z[k] >= 0 else m1

        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                sym = _read_symbol(br, act_t)
                r, sz = sym >> 4, sym & 15
                val = 0
                if sz == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r)
                        if r:
                            state["eobrun"] += br.read(r)
                        break
                else:
                    if sz != 1:
                        raise ValueError("bad refinement size")
                    val = p1 if br.read(1) else m1
                while k <= se:
                    if z[k] != 0:
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    z[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if z[k] != 0:
                    correct(k)
                k += 1
            state["eobrun"] -= 1

    unit_n = 0

    def maybe_restart():
        nonlocal unit_n, preds
        if restart_interval and unit_n and unit_n % restart_interval == 0:
            _skip_rst(br)
            preds = {ci: 0 for ci in order}
            state["eobrun"] = 0
        unit_n += 1

    if len(order) > 1 or (ss == 0 and len(order) == len(comps)):
        # interleaved (DC scans only per T.81): MCU walk
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for ci in order:
                    c = comps[ci]
                    dct_t = hts.get((0, sel[c["id"]][0]))
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc_block(ci, coefs[ci][my * c["v"] + by, mx * c["h"] + bx], dct_t)
    else:
        ci = order[0]
        c = comps[ci]
        bw_ni = -(-(-(-w * c["h"] // hmax) // -1) // 8) if False else -(-(-(-(w * c["h"]) // hmax)) // 8)
        # component sample dims: ceil(w*h_i/hmax) × ceil(h*v_i/vmax); blocks = ceil(samples/8)
        cw = -(-(w * c["h"]) // hmax)
        ch_ = -(-(h * c["v"]) // vmax)
        bw_ni = -(-cw // 8)
        bh_ni = -(-ch_ // 8)
        dct_t = hts.get((0, sel[c["id"]][0]))
        act_t = hts.get((1, sel[c["id"]][1]))
        for byy in range(bh_ni):
            for bxx in range(bw_ni):
                maybe_restart()
                z = coefs[ci][byy, bxx]
                if ss == 0:
                    dc_block(ci, z, dct_t)
                elif ah == 0:
                    ac_first(z, act_t)
                else:
                    ac_refine(z, act_t)


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG decoder (T.81): baseline sequential (SOF0/SOF1) AND progressive
    (SOF2, annex G — spectral selection + successive approximation, DC and
    AC refinement scans, EOB runs), arbitrary sampling factors, restart
    markers, per-scan Huffman table redefinition, Annex-B framing.  All
    scans accumulate into one zigzag coefficient store; dequantization +
    IDCT run once, batched over every block of every component."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    pos = 2
    qts = {}
    hts = {}
    comps = None
    h = w = None
    restart_interval = 0
    progressive = False
    scans = []
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64)
                t[_ZIGZAG] = np.frombuffer(body, np.uint8, 64, off + 1)
                qts[tq] = t
                off += 65
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 15
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                hts[(cls, tid)] = _huff_decode_table(bits, vals)
                off += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):
            progressive = marker == 0xC2
            _prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", body)[0]
        elif marker == 0xDA:
            ns = body[0]
            sel = {}
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                sel[cid] = (tabs >> 4, tabs & 15)
            ss, se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            end = _entropy_end(data, pos)
            scans.append({
                "sel": sel, "ss": ss, "se": se, "ah": a >> 4, "al": a & 15,
                "start": pos, "end": end, "hts": dict(hts),
                "ri": restart_interval,
            })
            pos = end
            if not progressive:
                break  # baseline: single scan
    if comps is None or not scans:
        raise ValueError("missing SOF/SOS")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32) for c in comps
    ]
    for scan in scans:
        br = _BitReader(data[scan["start"] : scan["end"]])
        if progressive:
            _decode_scan_prog(br, scan, comps, coefs, scan["hts"], mcux, mcuy, scan["ri"], w, h)
        else:
            _decode_scan_seq(br, scan, comps, coefs, scan["hts"], mcux, mcuy, scan["ri"])
    # shared reconstruction: dequantize + batched IDCT + upsample + color
    full = []
    for ci, c in enumerate(comps):
        qt = qts[c["tq"]]
        blk = (coefs[ci][:, :, _UNZIGZAG] * qt).reshape(
            coefs[ci].shape[0], coefs[ci].shape[1], 8, 8
        )
        # broadcast BLAS matmul, not einsum: same contraction, ~27× faster
        # (einsum without optimize= runs the naive nested loop)
        pxb = _DCT.T @ blk @ _DCT + 128.0
        by_, bx_ = pxb.shape[0], pxb.shape[1]
        plane = pxb.transpose(0, 2, 1, 3).reshape(by_ * 8, bx_ * 8)
        fy, fx = vmax // c["v"], hmax // c["h"]
        p = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = full[0]
        rgb = np.stack([y, y, y], axis=-1)
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ GIF codec
# GIF87a/89a from the public spec: logical screen descriptor, color tables,
# graphic-control/application extensions, image descriptor with optional
# local palette + interlacing, and variable-width LSB-first LZW image data
# in 255-byte sub-blocks.  ``decode_gif_frames`` implements the full
# animation composite (delay/transparency/disposal); ``decode_gif`` is the
# frame-1 view of the same loop (the "decode/verify" contract for the
# crawl payload axis).  Encoders write GIF89a stills and animations with
# the classic clear-code-throttled LZW (dictionary never grows past the
# initial width — valid LZW, zero compression, trivially correct).


def _gif_palette(px: np.ndarray):
    """(palette N×3, index map H×W) — image must have ≤256 distinct colors."""
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF needs ≤256 colors, got {len(colors)} (quantize first)")
    return colors.astype(np.uint8), inverse.reshape(h, w)


class _LsbBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, width: int):
        self.acc |= (code & ((1 << width) - 1)) << self.n
        self.n += width
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


def encode_gif(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    palette, idx = _gif_palette(px)
    # palette table size = 2^(n+1) ≥ len(palette), min 2 entries
    pbits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << pbits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    mcs = max(2, pbits)  # LZW minimum code size
    lzw = _gif_lzw_block(idx, mcs)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pbits - 1) & 7) | ((pbits - 1) << 4), 0, 0)
    out += table.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"  # block terminator + trailer
    return bytes(out)


def _lzw_decode(mcs: int, data: bytes) -> list:
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    base = [(i,) for i in range(clear)] + [None, None]
    table = list(base)
    out: list = []
    prev = None
    # bit extraction inlined in the loop (locals, no per-code function
    # call): the LZW code walk is the GIF decode hot loop
    bitpos, nbits = 0, len(data) * 8
    mask = (1 << width) - 1
    cap = 1 << width
    from_bytes = int.from_bytes
    while True:
        if bitpos + width > nbits:
            break  # ran off the stream: treat as end-of-information
        byte_i = bitpos >> 3
        code = (from_bytes(data[byte_i : byte_i + 3], "little") >> (bitpos & 7)) & mask
        bitpos += width
        if code == clear:
            table = list(base)
            width = mcs + 1
            mask = (1 << width) - 1
            cap = 1 << width
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        out.extend(entry)
        prev = entry
        if len(table) >= cap and width < 12:
            width += 1
            mask = (1 << width) - 1
            cap = 1 << width
    return out


def decode_gif_frames(data: bytes, max_frames: int | None = None):
    """Decode frames of a GIF87a/89a animation: full composite
    semantics from the public spec — graphic-control extensions (delay,
    transparency index, disposal methods 0/1 leave, 2 restore-to-
    background, 3 restore-to-previous), local color tables, interlacing.
    Returns a list of (delay_cs, H×W×3 uint8) with each frame as the
    VIEWER sees it (composited canvas snapshot).  ``max_frames`` stops the
    block walk early — the decode/verify hot path reads frame 1 of a
    10000-frame animation without paying for the rest."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, bg, _ = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 1 << ((flags & 7) + 1)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    bg_rgb = gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).astype(np.uint8).copy()
    frames = []
    delay_cs, transp, disposal = 0, None, 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                gflags = data[pos + 1]
                (delay_cs,) = struct.unpack_from("<H", data, pos + 2)
                transp = data[pos + 4] if gflags & 1 else None
                disposal = (gflags >> 2) & 7
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 1 << ((iflags & 7) + 1)
            pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF frame without a color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.array(_lzw_decode(mcs, bytes(lzw))[: iw * ih], dtype=np.int32).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: 4-pass row order
            deinter = np.zeros_like(idx)
            rows = list(range(0, ih, 8)) + list(range(4, ih, 8)) + list(range(2, ih, 4)) + list(range(1, ih, 2))
            for src, dst in enumerate(rows):
                deinter[dst] = idx[src]
            idx = deinter
        saved = canvas[iy : iy + ih, ix : ix + iw].copy() if disposal == 3 else None
        region_rgb = pal[np.clip(idx, 0, len(pal) - 1)]
        region = canvas[iy : iy + ih, ix : ix + iw]
        if transp is None:
            region[:] = region_rgb
        else:
            opaque = idx != transp
            region[opaque] = region_rgb[opaque]
        frames.append((delay_cs, canvas.copy()))
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        if disposal == 2:
            canvas[iy : iy + ih, ix : ix + iw] = bg_rgb
        elif disposal == 3:
            canvas[iy : iy + ih, ix : ix + iw] = saved
        delay_cs, transp, disposal = 0, None, 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the first frame of a GIF87a/89a to H×W×3 uint8 (the
    decode/verify contract for the crawl payload axis; animations go
    through ``decode_gif_frames``)."""
    return decode_gif_frames(data, max_frames=1)[0][1]


def _gif_lzw_block(idx: np.ndarray, mcs: int) -> bytes:
    """Clear-throttled LZW stream for one frame's index map (valid LZW,
    dictionary never widens — shared by the still and animation encoders)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    bw = _LsbBitWriter()
    width = mcs + 1
    bw.write(clear, width)
    count = 0
    for v in idx.reshape(-1).tolist():
        bw.write(int(v), width)
        count += 1
        if count >= (1 << mcs) - 4:
            bw.write(clear, width)
            count = 0
    bw.write(end, width)
    return bw.flush()


def encode_gif_animation(frames: list, delays_cs: list | None = None) -> bytes:
    """Multi-frame GIF89a for animation fixtures: per-frame LOCAL color
    tables (each frame palette-independent), graphic-control extension
    with the given centisecond delays (disposal 1 = leave in place), and
    the NETSCAPE2.0 infinite-loop application extension.  Deterministic;
    round-trips bit-exactly through ``decode_gif_frames`` for opaque
    full-canvas frames."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    if delays_cs is None:
        delays_cs = [10] * len(frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0, 0, 0)  # no global color table
    out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    for px, delay in zip(frames, delays_cs):
        fh, fw, _ = px.shape
        if (fh, fw) != (h, w):
            raise ValueError("all frames must share the canvas size")
        palette, idx = _gif_palette(px)
        pbits = max(1, int(len(palette) - 1).bit_length())
        table = np.zeros((1 << pbits, 3), dtype=np.uint8)
        table[: len(palette)] = palette
        mcs = max(2, pbits)
        out += b"\x21\xF9\x04" + bytes([0x04]) + struct.pack("<H", delay) + b"\x00\x00"
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0x80 | ((pbits - 1) & 7))
        out += table.tobytes()
        out.append(mcs)
        lzw = _gif_lzw_block(idx, mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def make_paletted_image(w: int, h: int, seed: int = 0) -> np.ndarray:
    """Deterministic ≤128-color image (channel quantization of the smooth
    pattern) — the GIF-representable fixture content."""
    px = make_smooth_image(w, h, seed)
    return np.stack(
        [px[:, :, 0] & 0xC0, px[:, :, 1] & 0xC0, px[:, :, 2] & 0xE0], axis=-1
    ).astype(np.uint8)


def sniff_format(data: bytes) -> str | None:
    """Image format from magic bytes (bmp/png/jpeg/gif), else None.  The
    same prefixes are matched JVM-side by ``screenshots.IMAGE_MAGIC`` so
    non-image payloads never reach the Python stage."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"\x89PNG":
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:4] == b"GIF8":
        return "gif"
    return None


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Format dispatch — bmp, png, baseline jpeg and gif are all real
    from-scratch codecs (every content type the reference's seed data
    names, schema.sql:102-112, decodes).  ``fmt=None`` sniffs the magic
    bytes.  Unknown formats raise."""
    f = (fmt or sniff_format(data) or "").lower()
    if f == "bmp":
        return decode_bmp(data)
    if f == "png":
        return decode_png(data)
    if f in ("jpeg", "jpg"):
        return decode_jpeg(data)
    if f == "gif":
        return decode_gif(data)
    raise NotImplementedError(f"no decoder for format {fmt!r}")


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


QUALITY_COLS = ("brightness", "contrast", "entropy", "sharpness", "saturation")


def quality_stats(px: np.ndarray) -> tuple:
    """Per-image quality metrics for training-data filtering — the stats a
    LAION-style image pipeline thresholds on before a sample enters a
    training set:

    - ``brightness``: mean luma (0-255); culls near-black/near-white scans
    - ``contrast``: luma standard deviation; culls flat/blank frames
    - ``entropy``: Shannon entropy of the 256-bin luma histogram in
      bits/pixel; culls synthetic/solid-color images
    - ``sharpness``: variance of the 4-neighbour Laplacian — the classic
      blur detector (Pech-Pacheco et al., ICPR 2000)
    - ``saturation``: mean per-pixel channel range (max-min); culls
      grayscale-masquerading-as-RGB

    All metrics are computed over the quantized uint8 gray plane (the
    OpenCV convention: gray = round((299R + 587G + 114B)/1000), half-up)
    from EXACT integer sums.  That choice is load-bearing for the oracle:
    numpy float64 reductions (``mean``/``std``/``var``) are pairwise sums
    whose association order depends on the array's memory alignment, so
    the same pixels can yield ±1-ulp-different floats run to run —
    measured in this sandbox — which breaks a bitwise value-hash gate.
    Integer addition is associative, so the int64 sums below are identical
    under ANY reduction order; each float result is then one correctly-
    rounded big-int division (Python ``/``), ``math.sqrt``, or
    ``math.fsum`` (exactly rounded) — bitwise reproducible across
    executors, the driver, and DuckDB's literal parser.  int64 bounds:
    Σgray² ≤ 65025·n (overflows past ~1.4e14 px), Σlap² ≤ 1.04e6·n
    (~8.8e12 px) — far beyond any decodable image.
    """
    import math

    p = px.astype(np.int64)
    luma_milli = 299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]
    gray = (luma_milli + 500) // 1000
    n = gray.size
    s1, s2 = int(gray.sum()), int((gray * gray).sum())
    brightness = s1 / n
    contrast = math.sqrt((n * s2 - s1 * s1) / (n * n))
    hist = np.bincount(gray.ravel(), minlength=256)
    entropy = -math.fsum(
        (c / n) * math.log2(c / n) for c in hist.tolist() if c
    ) + 0.0  # +0.0 normalizes the single-bin -0.0
    if gray.shape[0] >= 3 and gray.shape[1] >= 3:
        lap = (
            gray[:-2, 1:-1]
            + gray[2:, 1:-1]
            + gray[1:-1, :-2]
            + gray[1:-1, 2:]
            - 4 * gray[1:-1, 1:-1]
        )
        m = lap.size
        t1, t2 = int(lap.sum()), int((lap * lap).sum())
        sharpness = (m * t2 - t1 * t1) / (m * m)
    else:
        sharpness = 0.0
    saturation = int((p.max(axis=2) - p.min(axis=2)).sum()) / n
    return brightness, contrast, entropy, sharpness, saturation


# --------------------------------------------------------------- EXIF

_EXIF_TAG_ORIENTATION = 0x0112


def build_exif_app1(orientation: int) -> bytes:
    """Minimal, spec-conformant APP1 EXIF segment (little-endian TIFF
    header, one IFD0 entry: tag 0x0112 Orientation, type SHORT, count 1).
    Used by fixtures: JPEG segments are concatenative, so EXIF can be
    injected into an encoded stream without re-encoding pixels."""
    if not 1 <= orientation <= 8:
        raise ValueError(f"orientation must be 1..8, got {orientation}")
    tiff = (
        b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)  # header → IFD0 at 8
        + struct.pack("<H", 1)  # 1 entry
        + struct.pack("<HHI", _EXIF_TAG_ORIENTATION, 3, 1)
        + struct.pack("<HH", orientation, 0)  # SHORT value, left-justified pad
        + struct.pack("<I", 0)  # no next IFD
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xFF\xE1" + struct.pack(">H", len(payload) + 2) + payload


def _jpeg_segments(data: bytes):
    """Yield (marker, start, end) for each marker segment up to SOS; the
    entropy-coded stream and EOI are yielded as a final pseudo-segment."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xDA:  # SOS: rest of stream is entropy data + EOI
            yield (marker, pos, len(data))
            return
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        yield (marker, pos, pos + 2 + seglen)
        pos += 2 + seglen


def inject_exif(jpeg: bytes, orientation: int) -> bytes:
    """Insert an APP1 orientation segment right after SOI (before any
    existing APPn), replacing a prior APP1 if present."""
    stripped = strip_exif(jpeg)
    return stripped[:2] + build_exif_app1(orientation) + stripped[2:]


def strip_exif(jpeg: bytes) -> bytes:
    """Drop every APP1 segment (EXIF/XMP) — the privacy scrub a
    training-data pipeline applies before publishing crawled images
    (GPS, serial numbers, and timestamps all live in APP1)."""
    out, last = [jpeg[:2]], 2
    for marker, start, end in _jpeg_segments(jpeg):
        if marker != 0xE1:
            out.append(jpeg[start:end])
        last = end
    out.append(jpeg[last:])
    return b"".join(out)


def parse_exif_orientation(jpeg: bytes) -> int:
    """Read the EXIF orientation tag (1..8) from a JPEG's APP1 segment;
    1 (upright) when absent or unparseable.  Handles both II and MM byte
    orders per TIFF 6.0."""
    try:
        for marker, start, end in _jpeg_segments(jpeg):
            if marker != 0xE1 or jpeg[start + 4 : start + 10] != b"Exif\x00\x00":
                continue
            t = jpeg[start + 10 : end]
            if t[:2] == b"II":
                bo = "<"
            elif t[:2] == b"MM":
                bo = ">"
            else:
                return 1
            ifd = struct.unpack(bo + "I", t[4:8])[0]
            (n,) = struct.unpack(bo + "H", t[ifd : ifd + 2])
            for i in range(n):
                e = ifd + 2 + 12 * i
                tag, typ, _cnt = struct.unpack(bo + "HHI", t[e : e + 8])
                if tag == _EXIF_TAG_ORIENTATION and typ == 3:
                    (v,) = struct.unpack(bo + "H", t[e + 8 : e + 10])
                    return v if 1 <= v <= 8 else 1
            return 1
    except (struct.error, ValueError, IndexError):
        return 1
    return 1


def apply_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Undo an EXIF orientation: return the pixels as the camera saw the
    scene (the transform VIEWERS apply).  The eight cases per EXIF 2.3
    table 4.  Pure numpy views + one copy."""
    o = orientation
    if o == 2:
        out = px[:, ::-1]
    elif o == 3:
        out = px[::-1, ::-1]
    elif o == 4:
        out = px[::-1, :]
    elif o == 5:
        out = np.rot90(px[:, ::-1], 1)
    elif o == 6:
        out = np.rot90(px, -1)
    elif o == 7:
        out = np.rot90(px[:, ::-1], -1)
    elif o == 8:
        out = np.rot90(px, 1)
    else:
        out = px
    return np.ascontiguousarray(out)


def exif_normalize(images, max_dim: int | None = None):
    """EXIF normalize + scrub stage over the image+caption table: parse
    the APP1 orientation, decode, rotate/flip the pixels upright, strip
    the metadata, re-encode losslessly (PNG) — one Arrow-batched
    ``mapInPandas`` with zero shuffle; payload bytes never leave the
    executor.  Non-JPEG formats (no EXIF container) pass through as
    orientation 1.  The scrub is the privacy pass a crawled-image corpus
    runs before training (ref keeps raw payloads only server-side;
    published derivatives are re-encodes, Exchange.java:198-201).

    Output: (image_id, orientation, w, h, pixels_png binary, caption,
    error) where w/h are POST-rotation dims."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("orientation", T.IntegerType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("pixels_png", T.BinaryType()),
            T.StructField("caption", T.StringType()),
            T.StructField("error", T.StringType()),
        ]
    )

    def batches(frames):
        for pdf in frames:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    raw = bytes(r.bytes)
                    o = parse_exif_orientation(raw) if sniff_format(raw) == "jpeg" else 1
                    px = apply_orientation(decode_image(raw, r.fmt), o)
                    if max_dim is not None:
                        tw, th = thumbnail_dims(px.shape[1], px.shape[0], max_dim)
                        px = resize_bilinear(px, tw, th)
                    out.append(
                        (r.image_id, o, px.shape[1], px.shape[0], encode_png(px), r.caption, None)
                    )
                except Exception as e:  # noqa: BLE001 — poison-row isolation
                    out.append((r.image_id, None, None, None, None, r.caption, str(e)[:200]))
            yield pd.DataFrame(
                out,
                columns=["image_id", "orientation", "w", "h", "pixels_png", "caption", "error"],
            )

    return images.select("image_id", "bytes", "fmt", "caption").mapInPandas(
        batches, out_schema
    )


# --------------------------------------------------------------- transforms

def resize_bilinear(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Bilinear resize (half-pixel-center mapping, the PIL/torch
    ``align_corners=False`` convention) — fully vectorized numpy: four
    gathers + two lerps, no Python pixel loop."""
    h, w, c = px.shape
    if (w, h) == (out_w, out_h):
        return px.copy()
    sy = h / out_h
    sx = w / out_w
    fy = np.clip((np.arange(out_h) + 0.5) * sy - 0.5, 0, h - 1)
    fx = np.clip((np.arange(out_w) + 0.5) * sx - 0.5, 0, w - 1)
    y0 = np.floor(fy).astype(int)
    x0 = np.floor(fx).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def thumbnail_dims(w: int, h: int, max_dim: int) -> tuple:
    """Aspect-preserving target size with the long edge at ``max_dim``."""
    if max(w, h) <= max_dim:
        return w, h
    if w >= h:
        return max_dim, max(1, round(h * max_dim / w))
    return max(1, round(w * max_dim / h)), max_dim


def image_thumbnails(images, max_dim: int = 16, carry_cols: tuple = ()):
    """Multimodal resize stage over the image+caption table: decode →
    bilinear downscale (long edge = ``max_dim``) → lossless PNG re-encode,
    as one Arrow-batched ``mapInPandas`` over (image_id, bytes, fmt) — the
    per-batch shape a 100-TB media pipeline needs (payload bytes never
    leave the executor; the stage is a narrow map, no shuffle).  A NULL
    ``fmt`` is sniffed from magic bytes.  Undecodable rows surface as
    ``error`` instead of failing the batch (poison payloads must not kill
    a 10^10-row job).

    ``carry_cols`` are echoed through the stage row-aligned, so consumers
    (e.g. the screenshot-cache producer) keep their keys WITHOUT a
    join-back that would shuffle the payload blobs.

    Returns (image_id, thumb_w, thumb_h, thumbnail binary, thumb_phash,
    error, *carry_cols).  On a production cluster the numpy codecs swap
    for PIL/libvips inside this same stage; the Spark plumbing is
    unchanged.
    """
    import pandas as pd
    from pyspark.sql import types as T

    in_types = {f.name: f.dataType for f in images.schema.fields}
    base_cols = ["image_id", "thumb_w", "thumb_h", "thumbnail", "thumb_phash", "error"]
    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("thumb_w", T.IntegerType()),
            T.StructField("thumb_h", T.IntegerType()),
            T.StructField("thumbnail", T.BinaryType()),
            T.StructField("thumb_phash", T.LongType()),
            T.StructField("error", T.StringType()),
        ]
        + [T.StructField(c, in_types[c]) for c in carry_cols]
    )

    def batches(frames):
        for pdf in frames:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    px = decode_image(bytes(r.bytes), r.fmt)
                    tw, th = thumbnail_dims(px.shape[1], px.shape[0], max_dim)
                    thumb = resize_bilinear(px, tw, th)
                    out.append(
                        (r.image_id, tw, th, encode_png(thumb), phash64(thumb), None)
                    )
                except Exception as e:  # noqa: BLE001 — poison-row isolation
                    out.append((r.image_id, None, None, None, None, str(e)[:200]))
            res = pd.DataFrame(out, columns=base_cols)
            for c in carry_cols:  # row-aligned echo (one output row per input)
                res[c] = pdf[c].values
            yield res

    return images.select("image_id", "bytes", "fmt", *carry_cols).mapInPandas(
        batches, out_schema
    )


def decode_verify_thumbnails(images, max_dim: int = 16, with_quality: bool = False):
    """The north-rule decode phase as ONE fused Arrow stage: decode →
    per-row invariant (phash of the DECODED pixels == the stored ``phash``
    column — the input_hint's decoded-pixel check, exact for lossless
    formats and for jpeg because the stored hash is itself taken from the
    decoder's output, fixtures._image_row) → bilinear thumbnail → lossless
    PNG re-encode.

    Input: input_hint-shaped table (image_id, bytes, fmt, phash, caption).
    Output: (image_id, ok boolean, thumb_w, thumb_h, thumbnail binary,
    caption, error) — a narrow ``mapInPandas`` map with zero shuffle;
    payload bytes never leave the executor.  Undecodable rows surface as
    ``error`` (ok = false), never fail the batch.  This is the stage the
    decode-component scaling bench (scripts/decode_scaling_bench.py) times
    at two cluster sizes.

    ``with_quality=True`` fuses the training-data filter metrics
    (``quality_stats``: brightness/contrast/entropy/sharpness/saturation)
    into the SAME stage, appending five double columns — the pixels are
    already decoded in-register here, so computing the filter stats costs
    one extra pass over the luma plane instead of a second decode in a
    separate job (at 100 TB, decode dominates; never decode twice).
    """
    import pandas as pd
    from pyspark.sql import types as T

    base_cols = ["image_id", "ok", "thumb_w", "thumb_h", "thumbnail", "caption", "error"]
    fields = [
        T.StructField("image_id", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
        T.StructField("thumbnail", T.BinaryType()),
        T.StructField("caption", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
    cols = list(base_cols)
    if with_quality:
        fields += [T.StructField(c, T.DoubleType()) for c in QUALITY_COLS]
        cols += list(QUALITY_COLS)
    out_schema = T.StructType(fields)

    def batches(frames):
        for pdf in frames:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    px = decode_image(bytes(r.bytes), r.fmt)
                    ok = phash64(px) == int(r.phash)
                    tw, th = thumbnail_dims(px.shape[1], px.shape[0], max_dim)
                    thumb = resize_bilinear(px, tw, th)
                    row = (r.image_id, ok, tw, th, encode_png(thumb), r.caption, None)
                    if with_quality:
                        row += quality_stats(px)
                    out.append(row)
                except Exception as e:  # noqa: BLE001 — poison-row isolation
                    row = (r.image_id, False, None, None, None, r.caption, str(e)[:200])
                    if with_quality:
                        row += (None,) * len(QUALITY_COLS)
                    out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return images.select("image_id", "bytes", "fmt", "phash", "caption").mapInPandas(
        batches, out_schema
    )
