"""Pure-Python xxHash64 — reference-parity URL identity hashing.

The reference computes every primary key as ``xxh64(utf8_bytes, seed=0)``
(``Url.java:17,47-50``: ``XXHashFactory.fastestJavaInstance().hash64()`` with
seed ``0`` over ``s.getBytes(UTF_8)``).  Spark's built-in ``F.xxhash64()``
uses seed **42**, so it cannot reproduce reference IDs; this module provides
a from-scratch implementation of the public-domain XXH64 algorithm
(spec: https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md).

On a real cluster you would ship the C-accelerated ``xxhash`` wheel via
``--py-files``/``--archives``; this pure-Python fallback is interchangeable
(same outputs) and is what the sandbox uses.  All Spark-side use goes
through Arrow-batched pandas UDFs in ``chronicrawl_spark.functions.udfs``
— never row-at-a-time Python UDFs.
"""

from __future__ import annotations

from functools import lru_cache

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` with ``seed``; returns unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        limit = n - 32
        while i <= limit:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def to_signed64(u: int) -> int:
    """Unsigned 64-bit → Java/Spark signed long (two's complement)."""
    return u - (1 << 64) if u >= (1 << 63) else u


@lru_cache(maxsize=65536)
def hash_str(s: str, seed: int = 0) -> int:
    """Signed-int64 xxh64 of the UTF-8 bytes of ``s`` (ref ``Url.java:47-50``).

    LRU-cached: origin strings repeat heavily inside an Arrow batch.
    """
    return to_signed64(xxh64(s.encode("utf-8"), seed))
