"""Audio/video multimodal plumbing (extras/media.py): WAV codec round trips,
MJPEG frame sampling, Arrow-batched feature stages, poison-row isolation."""

import numpy as np
import pytest

from chronicrawl_spark.extras.media import (
    audio_features,
    decode_video_frames,
    decode_wav,
    encode_mjpeg,
    encode_wav,
    make_test_audio,
    make_test_video,
    video_frame_sample,
)
from chronicrawl_spark.extras.imaging import make_smooth_image, psnr


# ------------------------------------------------------------------ WAV codec

def test_wav_roundtrip_mono():
    s = make_test_audio(4000, rate=8000, seed=3)
    dec, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000
    assert dec.shape == (4000, 1)
    assert np.array_equal(dec[:, 0], s)


def test_wav_roundtrip_stereo():
    left = make_test_audio(1000, seed=1)
    right = make_test_audio(1000, seed=2)
    s = np.stack([left, right], axis=1)
    dec, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100
    assert np.array_equal(dec, s)


def test_wav_8bit_and_unknown_chunks():
    # hand-build an 8-bit PCM stream with a LIST chunk before data —
    # decoders must skip unknown chunks per the RIFF spec
    import struct

    raw8 = bytes([0, 64, 128, 192, 255, 128])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"LIST" + struct.pack("<I", 4) + b"INFO"
    body += b"data" + struct.pack("<I", len(raw8)) + raw8
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    s, rate = decode_wav(data)
    assert rate == 8000 and s.shape == (6, 1)
    assert s[0, 0] == -128 * 256 and s[3, 0] == 64 * 256


def test_wav_rejects_non_pcm():
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + b"\x00" * 40)


# -------------------------------------------------------------- MJPEG container

def test_mjpeg_frame_sample_stride():
    data = make_test_video(32, 24, n_frames=10, seed=5, fps=12.5)
    frames, fps = decode_video_frames(data, every_k=3)
    assert fps == 12.5
    assert [i for i, _ in frames] == [0, 3, 6, 9]
    # sampled frames decode to the pristine per-frame source within the
    # lossy invariant (input_hint: PSNR >= 40 dB)
    for idx, px in frames:
        ref = make_smooth_image(32, 24, seed=5 * 1000 + idx)
        assert px.shape == ref.shape
        assert psnr(px, ref) >= 40.0


def test_mjpeg_max_frames():
    data = make_test_video(16, 16, n_frames=8, seed=1)
    frames, _ = decode_video_frames(data, every_k=1, max_frames=3)
    assert [i for i, _ in frames] == [0, 1, 2]


# ------------------------------------------------------------- Spark plumbing

def test_audio_features_stage(spark):
    rows = [
        (f"aud{i}", bytearray(encode_wav(make_test_audio(8000 + 400 * i, 8000, seed=i), 8000)))
        for i in range(6)
    ] + [("bad", bytearray(b"not a wav"))]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    out = {r["audio_id"]: r for r in audio_features(df).collect()}
    assert len(out) == 7
    ok = out["aud2"]
    assert ok["error"] is None
    assert ok["sample_rate"] == 8000 and ok["channels"] == 1
    assert abs(ok["duration_ms"] - 1000.0 * 8800 / 8000) < 1e-6
    # features match a local recompute exactly (same numpy code path)
    s = make_test_audio(8800, 8000, seed=2).astype(np.float64)
    assert abs(ok["rms"] - float(np.sqrt(np.mean(s**2)))) < 1e-9
    assert 0.0 < ok["zero_cross_rate"] < 1.0
    bad = out["bad"]
    assert bad["error"] is not None and bad["sample_rate"] is None


def test_video_frame_sample_stage(spark):
    rows = [
        ("vid0", bytearray(make_test_video(32, 24, n_frames=6, seed=7))),
        ("vid1", bytearray(make_test_video(16, 16, n_frames=4, seed=9))),
        ("bad", bytearray(b"\x00\x01\x02")),
    ]
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    out = video_frame_sample(df, every_k=2).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r["video_id"], []).append(r)
    assert sorted(r["frame_idx"] for r in by_vid["vid0"]) == [0, 2, 4]
    assert sorted(r["frame_idx"] for r in by_vid["vid1"]) == [0, 2]
    assert all(r["w"] == 32 and r["h"] == 24 and r["error"] is None for r in by_vid["vid0"])
    # distinct frames -> distinct phashes (pattern shifts per frame)
    assert len({r["frame_phash"] for r in by_vid["vid0"]}) == 3
    assert len(by_vid["bad"]) == 1 and by_vid["bad"][0]["error"] is not None


# ----------------------------------------------------------- ISO-BMFF (MP4)

def test_mp4_roundtrip_chunking_and_co64():
    """Mux real JPEGs into ISO-BMFF and demux via the from-spec sample
    tables: every chunking shape (1/sample-per-chunk, multi-sample chunks
    with a trailing remainder, 64-bit co64 offsets) must resolve every
    sample's byte range exactly."""
    from chronicrawl_spark.extras.mp4 import (
        decode_mp4_frames,
        encode_mp4_mjpeg,
        parse_mp4_samples,
    )

    frames = [make_smooth_image(48, 32, seed=i) for i in range(7)]
    for spc, co64 in [(1, False), (4, False), (3, True)]:
        data = encode_mp4_mjpeg(frames, fps=12.5, samples_per_chunk=spc, use_co64=co64)
        info = parse_mp4_samples(data)
        assert (info["codec"], info["width"], info["height"]) == ("jpeg", 48, 32)
        assert abs(info["fps"] - 12.5) < 1e-9  # stts delta = 90000/12.5 exactly
        out, fps = decode_mp4_frames(data, every_k=1)
        assert [i for i, _ in out] == list(range(7))
        for idx, px in out:
            assert psnr(px, frames[idx]) >= 40.0  # input_hint lossy invariant
        out2, _ = decode_mp4_frames(data, every_k=3, max_frames=2)
        assert [i for i, _ in out2] == [0, 3]


def test_mp4_dispatch_matches_mjpg():
    """decode_video_frames dispatches on magic bytes; the same source
    frames muxed either way decode to byte-identical pixels (both paths
    carry the identical T.81 JPEG payloads)."""
    mp4 = make_test_video(32, 24, 6, seed=2, container="mp4")
    mjpg = make_test_video(32, 24, 6, seed=2)
    a, _ = decode_video_frames(mp4, 2, None)
    b, _ = decode_video_frames(mjpg, 2, None)
    assert [i for i, _ in a] == [i for i, _ in b] == [0, 2, 4]
    assert all(np.array_equal(x[1], y[1]) for x, y in zip(a, b))


def test_mp4_unknown_codec_names_fourcc():
    """Foreign-codec sample entries resolve byte ranges but refuse decode,
    naming the fourcc — the documented production swap-in point."""
    from chronicrawl_spark.extras.mp4 import decode_mp4_frames, encode_mp4_mjpeg

    data = bytearray(encode_mp4_mjpeg([make_smooth_image(16, 16, seed=0)]))
    i = bytes(data).find(b"jpeg", bytes(data).find(b"stsd"))
    data[i : i + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mp4_frames(bytes(data))


def test_video_stage_mixed_containers(spark):
    """One binary column, MJPG and MP4 payloads interleaved: the Arrow
    stage demuxes both and yields identical (idx, dims, phash) rows for
    identical source frames."""
    rows = [
        ("m0", bytearray(make_test_video(24, 16, 5, seed=4))),
        ("p0", bytearray(make_test_video(24, 16, 5, seed=4, container="mp4"))),
        ("bad", bytearray(b"\x00" * 16)),
    ]
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    out = video_frame_sample(df, every_k=2).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r["video_id"], []).append((r["frame_idx"], r["frame_phash"]))
    assert sorted(by_vid["m0"]) == sorted(by_vid["p0"])
    assert len(by_vid["bad"]) == 1
