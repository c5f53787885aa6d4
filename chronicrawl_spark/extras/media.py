"""Audio/video payload plumbing — the multimodal axis beyond images.

The reference stores every fetched payload as opaque bytes + content type
(``schema.sql:102-112``; only images get first-class handling via the
screenshot path, ``Browser.java:340-461``).  A training-data pipeline at
100 TB meets two more payload modalities; this module extends the
imaging.py pattern — binary column → Arrow batch → numpy, never per-row
Python — to both:

- **audio**: WAV (RIFF / PCM) is implemented FULLY from the public RIFF
  spec in vectorized numpy — encode, decode, and per-row features
  (duration, RMS, peak, zero-crossing rate).  No audio library is needed,
  so unlike images there is nothing to stub: 16-bit and 8-bit PCM, mono or
  multi-channel, with unknown chunks skipped per the spec.
- **video**: two containers, both decoded from scratch.  Real **ISO-BMFF
  (MP4)** via ``extras/mp4.py`` — a from-spec (ISO/IEC 14496-12) box
  walker + stsc/stsz/stco sample-table resolver that random-accesses each
  sample's byte range and decodes QuickTime-style ``jpeg`` samples with
  the repo's own T.81 codec (other codecs raise ``NotImplementedError``
  naming the fourcc; the byte ranges still resolve, so a production
  pyav/ffmpeg swap-in replaces only the per-sample decode call).  Plus the
  simpler length-prefixed **MJPEG container** (``MJPG`` magic) kept as the
  deterministic sandbox fixture format.  ``decode_video_frames``
  dispatches on magic bytes and is the single entry point either way.

Scale shape: both stages are ``mapInPandas`` over the payload column —
narrow columns stay JVM-side, payload bytes cross to Python once per Arrow
batch, each row decodes independently (no shuffle), and a corrupt payload
yields an ``error`` row instead of failing the task (poison-row isolation,
same contract as ``imaging.image_thumbnails``).
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .imaging import decode_jpeg, encode_jpeg, make_smooth_image, phash64

# ------------------------------------------------------------------ WAV codec


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """PCM WAV encode (RIFF spec).  ``samples``: int16 array, shape (n,) or
    (n, channels)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()  # interleaved little-endian, the canonical layout
    byte_rate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV decode → (int16 samples shaped (n, channels), sample rate).
    Walks the chunk list (unknown chunks are skipped per the RIFF spec);
    accepts 16-bit and 8-bit PCM (8-bit is unsigned per spec, recentred)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, 8 + struct.unpack("<I", data[4:8])[0]
    rate = ch = bits = None
    pcm = None
    while pos + 8 <= min(end, len(data)):
        cid = data[pos : pos + 4]
        ln = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        payload = data[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack("<HHI", payload[:8])
            bits = struct.unpack("<H", payload[14:16])[0]
            if audio_fmt != 1:
                raise NotImplementedError(f"non-PCM WAV (format tag {audio_fmt})")
        elif cid == b"data":
            pcm = payload
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits == 16:
        s = np.frombuffer(pcm, dtype="<i2")
    elif bits == 8:
        s = (np.frombuffer(pcm, dtype=np.uint8).astype(np.int16) - 128) << 8
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    n = len(s) // ch
    return s[: n * ch].reshape(n, ch), rate


def make_test_audio(n: int, rate: int = 8000, seed: int = 0) -> np.ndarray:
    """Deterministic int16 mono fixture: two-tone sine mixture whose
    frequencies/amplitude derive from the seed (no RNG — reproducible on
    both engine and oracle sides)."""
    t = np.arange(n, dtype=np.float64) / rate
    f1, f2 = 220.0 + 13.0 * (seed % 17), 440.0 + 7.0 * (seed % 29)
    x = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.25 * np.sin(2 * np.pi * f2 * t)
    return np.round(x * 20000).astype(np.int16)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


def audio_features(df: DataFrame, id_col: str = "audio_id", bytes_col: str = "bytes") -> DataFrame:
    """Per-row audio feature extraction over a binary WAV column.  One Arrow
    crossing per batch; each row decodes independently, corrupt rows yield
    an ``error`` value instead of failing the task."""
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            out = []
            for aid, raw in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    s, rate = decode_wav(bytes(raw))
                    mono = s.mean(axis=1)
                    rms = float(np.sqrt(np.mean(mono.astype(np.float64) ** 2)))
                    peak = int(np.max(np.abs(s))) if s.size else 0
                    zc = (
                        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                        if len(mono) > 1
                        else 0.0
                    )
                    out.append(
                        (aid, rate, s.shape[1], 1000.0 * s.shape[0] / rate, rms, peak, zc, None)
                    )
                except Exception as e:  # poison-row isolation
                    out.append((aid, None, None, None, None, None, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return df.select(id_col, bytes_col).mapInPandas(extract, AUDIO_FEATURES_SCHEMA)


# -------------------------------------------------------- MJPEG-ish container

_MJPG_MAGIC = b"MJPG"


def encode_mjpeg(frames: list[np.ndarray], fps: float = 10.0, quality: int = 92) -> bytes:
    """Length-prefixed MJPEG container: magic, u32 frame count, u32 fps
    milli-units, then per frame u32 length + a real baseline JPEG.  A
    deterministic sandbox container — the production swap-in is a real
    muxer; every byte of the frames themselves is ITU-T T.81 JPEG."""
    out = [_MJPG_MAGIC, struct.pack("<II", len(frames), int(round(fps * 1000)))]
    for fr in frames:
        j = encode_jpeg(fr, quality=quality)
        out.append(struct.pack("<I", len(j)))
        out.append(j)
    return b"".join(out)


def decode_video_frames(
    data: bytes, every_k: int = 1, max_frames: int | None = None
) -> tuple[list[tuple[int, np.ndarray]], float]:
    """Frame-sample a video payload: decode every ``every_k``-th frame (up
    to ``max_frames``), SKIPPING the bytes of unsampled frames — at stride
    k only ~1/k of the payload's JPEG data is read (length prefixes here;
    random-access sample-table offsets on the MP4 path).  Dispatches on
    magic bytes: ISO-BMFF (``ftyp``) → the from-scratch MP4 demuxer,
    ``MJPG`` → the length-prefixed path.  Returns ([(frame_idx, pixels)],
    fps)."""
    if len(data) >= 12 and data[4:8] == b"ftyp":
        from .mp4 import decode_mp4_frames

        return decode_mp4_frames(data, every_k, max_frames)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        # animated GIF: composite semantics force decoding every frame up
        # to the last sampled index (disposal depends on the prior canvas),
        # but max_frames still bounds the walk — sampling the first frames
        # of a 10000-frame GIF reads only their blocks
        from .imaging import decode_gif_frames

        budget = None if max_frames is None else (max_frames - 1) * every_k + 1
        frames = decode_gif_frames(data, max_frames=budget)
        out = [(i, px) for i, (_, px) in enumerate(frames) if i % every_k == 0]
        if max_frames is not None:
            out = out[:max_frames]
        delays = [d for d, _ in frames if d > 0]
        fps = 100.0 / (sum(delays) / len(delays)) if delays else 10.0
        return out, fps
    if data[:4] != _MJPG_MAGIC:
        raise ValueError("not an MJPG or ISO-BMFF container")
    n, fps_m = struct.unpack("<II", data[4:12])
    pos, out = 12, []
    for i in range(n):
        (ln,) = struct.unpack("<I", data[pos : pos + 4])
        pos += 4
        if i % every_k == 0 and (max_frames is None or len(out) < max_frames):
            out.append((i, decode_jpeg(data[pos : pos + ln])))
        pos += ln
    return out, fps_m / 1000.0


def make_test_video(
    w: int, h: int, n_frames: int, seed: int = 0, fps: float = 10.0, container: str = "mjpg"
) -> bytes:
    """Deterministic video fixture: smooth frames whose pattern shifts per
    frame (seed + frame index), muxed into the MJPG container, a real
    ISO-BMFF file (``container="mp4"``), or an animated GIF89a
    (``container="gif"``, palette-quantized frames, delay = round(100/fps)
    centiseconds)."""
    if container == "gif":
        from .imaging import encode_gif_animation, make_paletted_image

        frames = [make_paletted_image(w, h, seed=seed * 1000 + i) for i in range(n_frames)]
        return encode_gif_animation(frames, [max(1, round(100.0 / fps))] * n_frames)
    frames = [make_smooth_image(w, h, seed=seed * 1000 + i) for i in range(n_frames)]
    if container == "mp4":
        from .mp4 import encode_mp4_mjpeg

        return encode_mp4_mjpeg(frames, fps=fps)
    return encode_mjpeg(frames, fps=fps)


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("frame_phash", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def video_frame_sample(
    df: DataFrame,
    every_k: int = 2,
    max_frames: int | None = None,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Frame sampling over a binary video column: one input row → one output
    row per sampled frame (w/h/phash; pixel payloads stay in Python — a
    downstream stage re-encodes or featurizes them in the same batch in a
    real pipeline).  Arrow-batched; corrupt payloads yield a single error
    row."""
    import pandas as pd

    cols = [f.name for f in VIDEO_FRAMES_SCHEMA.fields]

    def sample(batches):
        for pdf in batches:
            out = []
            for vid, raw in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    frames, _fps = decode_video_frames(bytes(raw), every_k, max_frames)
                    for idx, px in frames:
                        out.append(
                            (vid, idx, px.shape[1], px.shape[0], _signed64(phash64(px)), None)
                        )
                except Exception as e:
                    out.append((vid, None, None, None, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(out, columns=cols)

    return df.select(id_col, bytes_col).mapInPandas(sample, VIDEO_FRAMES_SCHEMA)


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v
