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
