"""From-scratch ISO-BMFF (MP4) demuxer + MJPEG-in-MP4 muxer.

Round 4 left one named gap: ``decode_video_frames`` only read the sandbox's
length-prefixed MJPG container, with MP4 called out as "the one function a
production pipeline hits immediately".  This module closes it from the
public spec alone — ISO/IEC 14496-12 (the box/atom grammar, the ``stbl``
sample tables) — with no container library:

- **box walker**: 32-bit sizes, ``size==1`` → 64-bit ``largesize``,
  ``size==0`` → box extends to end-of-enclosure (§4.2).
- **sample-table resolution** (§8.5-8.7): ``stsc`` run-length
  (first_chunk, samples_per_chunk) expansion → chunk→sample mapping,
  ``stco``/``co64`` chunk base offsets, ``stsz`` per-sample sizes →
  absolute (offset, size) byte range PER SAMPLE.  This is the actual
  demuxing math; every sample is random-access.
- **codec**: sample entries with fourcc ``jpeg`` (the QuickTime/ffmpeg
  MJPEG-in-MP4 sample entry) decode through the repo's own ITU-T T.81
  baseline JPEG codec (``imaging.decode_jpeg``).  Other fourccs (avc1,
  hev1, ...) raise ``NotImplementedError`` naming the codec — the sample
  *byte ranges* are still resolved correctly, so a production swap-in
  only replaces the per-sample decode call.

Scale shape: stride-k sampling slices only the sampled samples' byte
ranges out of ``mdat`` — at stride k the JPEG decode cost is ~1/k of the
payload, same contract as the MJPG path, but now via real random-access
chunk offsets instead of sequential length prefixes.

Reference analog: the reference stores fetched payloads as opaque bytes +
content type (``schema.sql:102-112``) and never demuxes video; this is a
scale addition for the multimodal training-data axis.
"""

from __future__ import annotations

import struct

import numpy as np

from .imaging import decode_jpeg, encode_jpeg

# ------------------------------------------------------------------ box layer


def iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for each box in
    data[start:end], per ISO/IEC 14496-12 §4.2."""
    pos = int(start)
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        fourcc = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"malformed box {fourcc!r} at {pos}")
        yield fourcc, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, s, e in iter_boxes(data, start, end):
        if fc == fourcc:
            return s, e
    return None


def _full_box(data: bytes, s: int) -> tuple[int, int, int]:
    """FullBox header: (version, flags, payload_start_after_header)."""
    ver = data[s]
    flags = int.from_bytes(data[s + 1 : s + 4], "big")
    return ver, flags, s + 4


# --------------------------------------------------------------- sample table


def parse_mp4_samples(data: bytes) -> dict:
    """Resolve the video track's sample table to absolute byte ranges.

    Returns {codec, width, height, fps, samples: [(offset, size), ...]}.
    Walks moov→trak (handler ``vide``)→mdia/minf/stbl and expands
    stsc × stco/co64 × stsz into per-sample (offset, size) — the chunk
    run-length math of §8.7.4.
    """
    n = len(data)
    moov = _find(data, 0, n, b"moov")
    if moov is None:
        raise ValueError("no moov box")
    for fc, ts, te in iter_boxes(data, *moov):
        if fc != b"trak":
            continue
        mdia = _find(data, ts, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        ver, _fl, p = _full_box(data, mdhd[0])
        timescale = struct.unpack(">I", data[p + (16 if ver == 1 else 8) :][:4])[0]
        minf = _find(data, *mdia, b"minf")
        stbl = _find(data, *minf, b"stbl")

        # stsd → codec fourcc + dims (VisualSampleEntry, §12.1.3)
        s, _e = _find(data, *stbl, b"stsd")
        _v, _f, p = _full_box(data, s)
        entry_fc, es, _ee = next(iter_boxes(data, p + 4, _e))
        codec = entry_fc.decode("ascii", "replace")
        width, height = struct.unpack(">HH", data[es + 24 : es + 28])

        # stts → nominal fps from the first run (§8.6.1.2)
        s, _e = _find(data, *stbl, b"stts")
        _v, _f, p = _full_box(data, s)
        (n_stts,) = struct.unpack(">I", data[p : p + 4])
        delta = struct.unpack(">II", data[p + 4 : p + 12])[1] if n_stts else 1
        fps = timescale / delta if delta else 0.0

        # stsz → per-sample sizes (§8.7.3)
        s, _e = _find(data, *stbl, b"stsz")
        _v, _f, p = _full_box(data, s)
        uniform, n_samples = struct.unpack(">II", data[p : p + 8])
        if uniform:
            sizes = [uniform] * n_samples
        else:
            sizes = list(
                struct.unpack(f">{n_samples}I", data[p + 8 : p + 8 + 4 * n_samples])
            )

        # stco / co64 → chunk base offsets (§8.7.5)
        co = _find(data, *stbl, b"stco")
        wide = False
        if co is None:
            co = _find(data, *stbl, b"co64")
            wide = True
        _v, _f, p = _full_box(data, co[0])
        (n_chunks,) = struct.unpack(">I", data[p : p + 4])
        fmt = ">Q" if wide else ">I"
        w = 8 if wide else 4
        chunk_offsets = [
            struct.unpack(fmt, data[p + 4 + i * w : p + 4 + (i + 1) * w])[0]
            for i in range(n_chunks)
        ]

        # stsc runs → samples-per-chunk for every chunk (§8.7.4)
        s, _e = _find(data, *stbl, b"stsc")
        _v, _f, p = _full_box(data, s)
        (n_runs,) = struct.unpack(">I", data[p : p + 4])
        runs = [
            struct.unpack(">III", data[p + 4 + i * 12 : p + 16 + i * 12])[:2]
            for i in range(n_runs)
        ]
        per_chunk = []
        for i, (first, spc) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < n_runs else n_chunks
            per_chunk.extend([spc] * (last - first + 1))

        samples, si = [], 0
        for ci, base in enumerate(chunk_offsets):
            off = base
            for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                if si >= n_samples:
                    break
                samples.append((off, sizes[si]))
                off += sizes[si]
                si += 1
        if si != n_samples:
            raise ValueError(f"sample table resolves {si}/{n_samples} samples")
        return {
            "codec": codec,
            "width": width,
            "height": height,
            "fps": fps,
            "samples": samples,
        }
    raise ValueError("no video (vide) track")


def decode_mp4_frames(
    data: bytes, every_k: int = 1, max_frames: int | None = None
) -> tuple[list[tuple[int, np.ndarray]], float]:
    """Frame-sample an MP4 payload: resolve the sample table once, then
    slice + decode ONLY every ``every_k``-th sample's byte range (up to
    ``max_frames``).  Returns ([(frame_idx, pixels)], fps) — the same
    contract as ``media.decode_video_frames``."""
    info = parse_mp4_samples(data)
    if info["codec"] != "jpeg":
        raise NotImplementedError(f"codec {info['codec']!r} (only MJPEG-in-MP4 here)")
    out = []
    for i, (off, size) in enumerate(info["samples"]):
        if i % every_k == 0 and (max_frames is None or len(out) < max_frames):
            out.append((i, decode_jpeg(data[off : off + size])))
    return out, info["fps"]


# -------------------------------------------------------------------- muxer


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, bytes([version]) + flags.to_bytes(3, "big") + payload)


def encode_mp4_mjpeg(
    frames: list[np.ndarray],
    fps: float = 10.0,
    quality: int = 92,
    samples_per_chunk: int = 4,
    use_co64: bool = False,
) -> bytes:
    """Mux real baseline JPEGs into a minimal valid ISO-BMFF file:
    ftyp + mdat + moov(mvhd, trak(tkhd, mdia(mdhd, hdlr vide, minf(vmhd,
    dinf, stbl)))) with QuickTime-style ``jpeg`` sample entries.  Chunking
    is real (``samples_per_chunk`` per chunk, stsc run-compressed) so the
    demuxer's chunk→sample math is exercised, and ``use_co64`` switches the
    offset table width for the 64-bit path."""
    timescale = 90000
    delta = max(1, int(round(timescale / fps)))
    jpegs = [encode_jpeg(fr, quality=quality) for fr in frames]
    h_px, w_px = (frames[0].shape[0], frames[0].shape[1]) if frames else (0, 0)
    n = len(jpegs)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"mp41")
    mdat_payload = b"".join(jpegs)
    mdat_data_start = len(ftyp) + 8  # ftyp, then mdat header

    # chunking: fixed-size chunks, trailing remainder chunk
    chunks, i = [], 0
    while i < n:
        chunks.append(jpegs[i : i + samples_per_chunk])
        i += samples_per_chunk
    offsets, off = [], mdat_data_start
    for ch in chunks:
        offsets.append(off)
        off += sum(len(j) for j in ch)

    # stsc: run-compress per-chunk counts
    runs = []
    for ci, ch in enumerate(chunks):
        if not runs or runs[-1][1] != len(ch):
            runs.append((ci + 1, len(ch)))
    stsc = _full(
        b"stsc",
        0,
        0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in runs),
    )
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(j)) for j in jpegs),
    )
    if use_co64:
        stco = _full(
            b"co64",
            0,
            0,
            struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">Q", o) for o in offsets),
        )
    else:
        stco = _full(
            b"stco",
            0,
            0,
            struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">I", o) for o in offsets),
        )
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    # VisualSampleEntry 'jpeg' (§12.1.3 layout, QuickTime MJPEG fourcc)
    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", w_px, h_px)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    minf = _box(
        b"minf",
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0)) + _box(b"dinf", dref) + stbl,
    )
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00")
    duration = n * delta
    mdhd = _full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        0,
        7,
        struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w_px << 16, h_px << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov
