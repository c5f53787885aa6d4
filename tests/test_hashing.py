"""xxh64 correctness: known spec vectors + cross-check vs Spark's JVM XXH64.

Spark's ``F.xxhash64(string)`` computes XXH64 over the UTF-8 bytes with
seed 42 — same algorithm, different seed — so it is a perfect independent
oracle for our pure-Python implementation on arbitrary-length inputs.
"""

import random
import string

from pyspark.sql import functions as F

from chronicrawl_spark.functions.hashing import hash_str, to_signed64, xxh64


def test_spec_vectors():
    # Published XXH64 test vectors (xxHash spec / reference implementation)
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999


def test_seed_and_lengths():
    # every code path: <4, 4-7, 8-31, >=32 bytes, with and without seed
    for n in [0, 1, 3, 4, 7, 8, 15, 31, 32, 33, 63, 64, 100, 1000]:
        data = bytes(range(256)) * (n // 256 + 1)
        h0 = xxh64(data[:n], 0)
        h1 = xxh64(data[:n], 12345)
        assert 0 <= h0 < 2**64
        if n > 0:
            assert h0 != h1


def test_against_spark_jvm(spark):
    rng = random.Random(42)
    samples = [
        "".join(rng.choices(string.printable, k=rng.randint(0, 200))) for _ in range(300)
    ] + ["http://example.org/", "héllo wörld ünïcode ✓", ""]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    jvm = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert to_signed64(xxh64(s.encode("utf-8"), 42)) == jvm[s], repr(s)


def test_hash_str_signed():
    # signed conversion matches Java long semantics
    assert hash_str("") == to_signed64(0xEF46DB3751D8E999)
    assert hash_str("") < 0
