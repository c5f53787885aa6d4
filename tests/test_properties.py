"""Property-based tests (hypothesis): invariants the fixture vectors can't
exhaustively pin down."""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chronicrawl_spark.extras.imaging import decode_bmp, encode_bmp, make_test_image
from chronicrawl_spark.functions.hashing import hash_str, to_signed64, xxh64
from chronicrawl_spark.functions.urlkit import canonicalize, parse_canonical

_url_path = st.text(alphabet=string.ascii_letters + string.digits + "/-._~%?=&", max_size=60)
_host = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z][a-z0-9]{0,8}){0,3}", fullmatch=True)


@settings(max_examples=300, suppress_health_check=[HealthCheck.too_slow])
@given(host=_host, path=_url_path, port=st.one_of(st.none(), st.integers(1, 65535)))
def test_canonicalize_idempotent(host, path, port):
    """canonicalize must be a projection: applying twice changes nothing
    (URL identity depends on it — a non-idempotent canonicalizer would
    give the same URL two different xxh64 ids)."""
    url = f"http://{host}" + (f":{port}" if port else "") + "/" + path
    c1 = canonicalize(url)
    if c1 is None:
        return
    c2 = canonicalize(c1)
    assert c1 == c2


@settings(max_examples=300)
@given(host=_host, path=_url_path)
def test_origin_pathref_reassemble(host, path):
    """origin + pathref must reassemble to the canonical URL (the engine
    stores them separately and joins them back — Url.java:38-66)."""
    p = parse_canonical(f"https://{host}/{path}", False)
    if p is None:
        return
    assert p.origin + p.pathref == p.url


@settings(max_examples=200)
@given(data=st.binary(max_size=200), seed=st.integers(0, 2**32 - 1))
def test_xxh64_determinism_and_range(data, seed):
    h1, h2 = xxh64(data, seed), xxh64(data, seed)
    assert h1 == h2
    assert 0 <= h1 < 2**64
    s = to_signed64(h1)
    assert -(2**63) <= s < 2**63


@settings(max_examples=100)
@given(s=st.text(max_size=80))
def test_hash_str_matches_bytes_hash(s):
    assert hash_str(s) == to_signed64(xxh64(s.encode("utf-8"), 0))


@settings(max_examples=30, deadline=None)
@given(w=st.integers(1, 40), h=st.integers(1, 30), seed=st.integers(0, 500))
def test_bmp_roundtrip_property(w, h, seed):
    import numpy as np

    px = make_test_image(w, h, seed)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


# ---------------------------------------------------------------------------
# codec properties (no Spark): the image/media codecs feed the certified
# decode stage, so their invariants get property coverage beyond the fixed
# golden vectors in test_imaging/test_media.


@settings(max_examples=25, deadline=None)
@given(w=st.integers(1, 40), h=st.integers(1, 30), seed=st.integers(0, 500))
def test_png_roundtrip_property(w, h, seed):
    """PNG is lossless: decode(encode(px)) must be exact for any size."""
    import numpy as np

    from chronicrawl_spark.extras.imaging import decode_png, encode_png

    px = make_test_image(w, h, seed)
    assert np.array_equal(decode_png(encode_png(px)), px)


@settings(max_examples=25, deadline=None)
@given(w=st.integers(1, 40), h=st.integers(1, 30), seed=st.integers(0, 500))
def test_gif_roundtrip_property(w, h, seed):
    """GIF is lossless for paletted content (≤256 colors)."""
    import numpy as np

    from chronicrawl_spark.extras.imaging import (
        decode_gif,
        encode_gif,
        make_paletted_image,
    )

    px = make_paletted_image(w, h, seed)
    assert np.array_equal(decode_gif(encode_gif(px)), px)


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(8, 48),
    h=st.integers(8, 40),
    seed=st.integers(0, 200),
    q=st.sampled_from([70, 85, 95]),
)
def test_jpeg_lossy_psnr_property(w, h, seed, q):
    """JPEG round-trips smooth content above a PSNR floor at any size
    (fixture sweep worst-case is ~39.8 dB at q=70; 30 leaves margin for
    hypothesis-found shapes while still catching real coefficient bugs)."""
    from chronicrawl_spark.extras.imaging import (
        decode_jpeg,
        encode_jpeg,
        make_smooth_image,
        psnr,
    )

    px = make_smooth_image(w, h, seed)
    out = decode_jpeg(encode_jpeg(px, quality=q))
    assert out.shape == px.shape
    assert psnr(px, out) >= 30.0


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(8, 40),
    h=st.integers(8, 32),
    seed=st.integers(0, 200),
    ri=st.integers(1, 7),
)
def test_jpeg_restart_interval_invariance(w, h, seed, ri):
    """Decoded pixels must not depend on how the entropy stream is cut
    into restart segments: same coefficients, only DC predictors reset.
    Pins the segment-split scan decoder (imaging._split_restart_segments)
    against the unsegmented stream."""
    import numpy as np

    from chronicrawl_spark.extras.imaging import (
        decode_jpeg,
        encode_jpeg,
        make_smooth_image,
    )

    px = make_smooth_image(w, h, seed)
    a = decode_jpeg(encode_jpeg(px, quality=85))
    b = decode_jpeg(encode_jpeg(px, quality=85, restart_interval=ri))
    assert np.array_equal(a, b)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(8, 24),
    h=st.integers(8, 24),
    seed=st.integers(0, 100),
    frac=st.floats(0.02, 0.98),
)
def test_jpeg_truncation_is_contained(w, h, seed, frac):
    """A truncated JPEG either decodes (zero-padded tail, per T.81
    marker-as-zeros semantics) or raises — never hangs or corrupts memory.
    This is the poison-row-isolation contract of the Arrow decode stage."""
    import numpy as np

    from chronicrawl_spark.extras.imaging import (
        decode_jpeg,
        encode_jpeg,
        make_smooth_image,
    )

    data = encode_jpeg(make_smooth_image(w, h, seed), quality=85)
    cut = data[: max(2, int(len(data) * frac))]
    try:
        out = decode_jpeg(cut)
        assert isinstance(out, np.ndarray)
    except Exception:
        pass  # any raise is fine — the mapInPandas stage catches per row


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 500),
    ch=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 1000),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    """RIFF-PCM WAV is lossless: exact samples and rate back."""
    import numpy as np

    from chronicrawl_spark.extras.media import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32767, (n, ch)).astype(np.int16)
    out, r = decode_wav(encode_wav(s, rate))
    assert r == rate
    assert np.array_equal(out, s)


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(16, 32),
    h=st.integers(16, 24),
    n=st.integers(1, 6),
    k=st.integers(1, 3),
    seed=st.integers(0, 50),
)
def test_video_container_invariance(w, h, n, k, seed):
    """The same frame sequence muxed as MJPG and as ISO-BMFF (MP4) must
    frame-sample to identical indices and identical decoded pixels — the
    container changes the byte layout, never the content."""
    import numpy as np

    from chronicrawl_spark.extras.media import decode_video_frames, make_test_video

    a, _ = decode_video_frames(make_test_video(w, h, n, seed, container="mjpg"), every_k=k)
    b, _ = decode_video_frames(make_test_video(w, h, n, seed, container="mp4"), every_k=k)
    assert [i for i, _ in a] == [i for i, _ in b]
    assert all(np.array_equal(pa, pb) for (_, pa), (_, pb) in zip(a, b))
