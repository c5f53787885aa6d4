"""Training-data deduplication operators over the ``documents`` table.

Each operator is designed so a byte-identical DuckDB oracle SQL exists
(``__spark_entry__.oracle_sql``).  Hash functions are md5 (identical output
in Spark and DuckDB); scores are scaled to BIGINT to avoid
float-representation drift in the value-hash comparison.  Signature stages
run as Arrow-batched ``mapInPandas`` maps (exact hashlib md5 — a JVM
``min(md5-string)`` aggregate cannot use HashAggregate and planned
SortAggregate over the exploded corpus); everything downstream of the
signatures is JVM-side expressions — no per-row Python in any join or
verify path.

Scale notes (100 TB):
- exact dedup: single shuffle on the digest — the canonical map-side-combine
  groupBy; digest is uniformly distributed so no skew.
- word/char-shingle Jaccard: explode → self-join on shingle → pair-count.
  The shingle join is the classic candidate-pair generator; hot shingles
  (stop-shingles) explode quadratically, so a document-frequency cap drops
  shingles appearing in > max_df docs (standard practice; cap is a
  parameter, applied identically in the oracle).
- MinHash+LSH: k md5 "permutations" → band buckets → bucket join.  Band
  join keys are uniform hashes → skew-free; candidate verification happens
  on the tiny candidate set, never all pairs.
- SimHash: 32-bit signature via per-bit vote aggregation — one groupBy.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# --- shared tuning for the LSH candidate joins -----------------------------
# Bit-mask verify gate: exact set-intersection via per-doc bit masks needs a
# global element→bit index collected to the driver; past the cap the operator
# falls back to the array-verify shape.  4096 bits = 64 longs / doc.
MASK_VOCAB_CAP = 4096
# (band, bucket) groups above this size take the salted self-join branch —
# a bucket of m docs emits O(m²) pairs from ONE task otherwise (a window
# partition / join key cannot be split by AQE, guide §2.5 "split hot keys").
SALT_BUCKET_MIN = 1024


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the session parallelism when the scan
    landed on fewer partitions (a single small parquet file = one row group
    = ONE task for every downstream narrow op — the map-side work of the
    signature stages would run single-core).  No-op at scale, where inputs
    already carry ≥ parallelism partitions."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def _bucket_pairs(allb: DataFrame, extra_cols: list[str], keep_band: bool = False) -> DataFrame:
    """Candidate pairs (doc_a < doc_b) from band rows keyed by the two-long
    md5 digest (``bhi``/``blo`` — long equality ⟺ md5 equality, no 32-char
    string compares in the join probe), with per-bucket skew splitting:
    buckets larger than ``SALT_BUCKET_MIN`` join on an extra deterministic
    salt (left row: pmod(xxhash64(doc_id), S); right row: exploded 0..S-1)
    so a hot bucket's O(m²) pair fan-out spreads over S tasks instead of
    one.  ``extra_cols`` ride both sides (suffixed _a/_b).

    Requires a ``__bsz`` column (bucket size) on ``allb``.
    """
    par = allb.sparkSession.sparkContext.defaultParallelism
    keys = ["band", "bhi", "blo"]
    sel_a = [F.col("x.doc_id").alias("doc_a")] + [
        F.col(f"x.{c}").alias(f"{c}_a") for c in extra_cols
    ]
    sel_b = [F.col("y.doc_id").alias("doc_b")] + [
        F.col(f"y.{c}").alias(f"{c}_b") for c in extra_cols
    ]
    if keep_band:
        sel_b.append(F.col("x.band").alias("band"))

    def _self_join(df: DataFrame, salted: bool) -> DataFrame:
        if salted:
            x = df.withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(par))).alias("x")
            y = df.withColumn(
                "salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(par - 1).cast("long")))
            ).alias("y")
            cond = [F.col(f"x.{k}") == F.col(f"y.{k}") for k in keys + ["salt"]]
        else:
            x, y = df.alias("x"), df.alias("y")
            cond = [F.col(f"x.{k}") == F.col(f"y.{k}") for k in keys]
        cond.append(F.col("x.doc_id") < F.col("y.doc_id"))
        j = x.join(y, functools.reduce(lambda a, b: a & b, cond))
        return j.select(*sel_a, *sel_b)

    cold = allb.filter(F.col("__bsz") <= SALT_BUCKET_MIN).drop("__bsz")
    hot = allb.filter(F.col("__bsz") > SALT_BUCKET_MIN).drop("__bsz")
    return _self_join(cold, salted=False).unionByName(_self_join(hot, salted=True))

# word tokenization shared by all operators (and mirrored in oracle SQL):
# lowercase, split on single spaces (the synthetic corpus is space-separated)
def _words(col="text"):
    return F.split(F.lower(F.col(col)), " ")


def exact_dedup(docs: DataFrame, key=None) -> DataFrame:
    """Exact duplicate groups by md5 digest (hash-groupBy; one shuffle).

    ``key`` defaults to the full text; the test corpus has no full-text
    duplicates, so the entry-point demo keys on a 40-char prefix — the
    operator (digest → groupBy → canonical pick) is identical either way.
    """
    key = key if key is not None else F.col("text")
    return (
        docs.groupBy(F.md5(key).alias("text_hash"))
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("n_dups") >= 2)

    )


def _word_sig_bands(docs: DataFrame, vocab: list[str]) -> DataFrame:
    """Word-unigram MinHash band rows via ONE Arrow stage: per doc, the
    distinct word set → 6 exact md5 minhash lanes (hashlib — byte-identical
    to the JVM ``md5`` the oracle mirrors) → 3 band digests emitted as two
    longs (``bhi``/``blo`` = the 16-byte md5 of ``mh_a|mh_b``; long-pair
    equality ⟺ md5 equality) + an exact word-set bit mask over the global
    ``vocab`` index.

    Replaces the explode → ``min(md5 string)`` groupBy: a string min
    aggregate cannot use HashAggregate (non-mutable buffer type) so Spark
    planned SortAggregate — two sorts of the exploded corpus; the Arrow
    stage is one pass over the raw docs with zero exchange before banding.
    """
    import hashlib
    import struct as _struct

    import pandas as pd

    vpos = {w: i for i, w in enumerate(vocab)}

    def gen(it):
        md5 = hashlib.md5
        unpack = _struct.Struct(">qq").unpack
        for pdf in it:
            ids, masks, bands_, bhis, blos = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
                if text is None:
                    continue
                words = set(text.lower().split(" "))
                words.discard("")
                if not words:
                    continue
                mask = 0
                for w in words:
                    mask |= 1 << vpos[w]
                if mask >= 1 << 63:  # two's-complement for the LongType column
                    mask -= 1 << 64
                mhs = [
                    min(md5((f"w{i}|" + w).encode()).hexdigest() for w in words)
                    for i in range(6)
                ]
                for b in range(3):
                    hi, lo = unpack(md5((mhs[2 * b] + "|" + mhs[2 * b + 1]).encode()).digest())
                    ids.append(doc_id)
                    masks.append(mask)
                    bands_.append(b)
                    bhis.append(hi)
                    blos.append(lo)
            yield pd.DataFrame(
                {"doc_id": ids, "mask": masks, "band": bands_, "bhi": bhis, "blo": blos}
            )

    return _spread(docs.select("doc_id", "text")).mapInPandas(
        gen, "doc_id long, mask long, band int, bhi long, blo long"
    )


def word_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.9, max_bucket_size: int | None = None
) -> DataFrame:
    """Near-dup pairs by Jaccard over distinct word sets: **MinHash-LSH
    candidates → exact verify** — semantics identical to the r5 operator
    (same md5 banding, same exact word-set Jaccard, mirrored by the frozen
    oracle), restructured for speed:

    - signatures+banding run in one Arrow stage (``_word_sig_bands``) —
      the old ``min(md5 string)`` groupBy planned SortAggregate (string
      buffers defeat HashAggregate) and sorted the exploded corpus twice;
    - band buckets join on two-long md5 digests instead of 32-char strings;
    - hot buckets (> ``SALT_BUCKET_MIN`` docs) are salt-split so one
      non-discriminative bucket cannot serialize O(m²) pair generation on
      a single task (guide §2.5);
    - when the global vocabulary fits ``MASK_VOCAB_CAP`` (64 here — one
      long), the exact verify is ``bit_count(mask_a & mask_b)`` computed
      INSIDE the join projection with the ≥ threshold filter applied
      before the pair ``distinct`` — no collect_set, no array joins, and
      the distinct dedups only surviving pairs.  Larger vocabularies fall
      back to the r5 array-verify shape (``_word_jaccard_pairs_arrays``).

    ``max_bucket_size`` (the guarded df-cap) drops over-full (band, bucket)
    groups before pair generation, exactly as before.
    """
    spark = docs.sparkSession
    w = (
        _spread(docs.select("doc_id", "text"))
        .select(F.explode(_words()).alias("word"))
        .filter(F.col("word") != "")
    )
    vocab = sorted(
        r["word"] for r in w.select("word").distinct().limit(65).collect()
    )
    if len(vocab) > 64:
        return _word_jaccard_pairs_arrays(docs, threshold, max_bucket_size)
    allb = _word_sig_bands(docs, vocab)
    wbb = Window.partitionBy("band", "bhi", "blo")
    # persist: the cold/hot self-join consumes this subtree on FOUR sides —
    # unpersisted, the Arrow sig stage and the bucket-size window execute
    # once per side (measured 8 MapInPandas / 20 Exchange nodes in the plan)
    # repartition before persist: AQE coalesces the window's 15k-row output
    # to ~1 partition, and a BroadcastHashJoin's parallelism is its STREAM
    # side's partition count — the hot bucket's O(m²) probe matches would
    # all be produced by one task (measured 3× the whole query).  Hashing on
    # doc_id spreads hot-bucket rows uniformly over the session parallelism.
    par = docs.sparkSession.sparkContext.defaultParallelism
    allb = (
        allb.withColumn("__bsz", F.count("*").over(wbb))
        .repartition(par, "doc_id")
        .persist()
    )
    if max_bucket_size is not None:
        allb = allb.filter(F.col("__bsz") <= F.lit(int(max_bucket_size)))
    pairs = _bucket_pairs(allb, ["mask"])
    common = F.bit_count(F.col("mask_a").bitwiseAND(F.col("mask_b"))).cast("long")
    sz_a, sz_b = F.bit_count(F.col("mask_a")), F.bit_count(F.col("mask_b"))
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            common.alias("common"),
            F.round(common * 1000000.0 / (sz_a + sz_b - common)).cast("long").alias("jaccard_e6"),
        )
        .filter(F.col("jaccard_e6") >= int(threshold * 1_000_000))
        .distinct()
    )


def _word_jaccard_pairs_arrays(
    docs: DataFrame, threshold: float = 0.9, max_bucket_size: int | None = None
) -> DataFrame:
    """The r5 array-verify shape — fallback when the corpus vocabulary
    exceeds the bit-mask gate (same output, see ``word_jaccard_pairs``)."""
    # NO distinct: min() is duplicate-safe and collect_set dedups on its
    # own — the global (doc, word) distinct was a full shuffle of the
    # exploded corpus for nothing
    w = (
        docs.select("doc_id", F.explode(_words()).alias("word"))
        .filter(F.col("word") != "")
    )
    sig = w.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"w{i}|"), F.col("word")))).alias(f"mh{i}")
            for i in range(6)
        ]
    )
    bands = []
    for band in range(3):
        bands.append(
            sig.select(
                "doc_id",
                F.lit(band).alias("band"),
                F.md5(F.concat_ws("|", f"mh{2 * band}", f"mh{2 * band + 1}")).alias("bucket"),
            )
        )
    allb = bands[0].unionByName(bands[1]).unionByName(bands[2])
    if max_bucket_size is not None:
        # one window count on (band, bucket) — the same key the self-join
        # below shuffles on, so the partitioning is reused
        from pyspark.sql import Window

        wbb = Window.partitionBy("band", "bucket")
        allb = (
            allb.withColumn("__bsz", F.count("*").over(wbb))
            .filter(F.col("__bsz") <= F.lit(int(max_bucket_size)))
            .drop("__bsz")
        )
    x, y = allb.alias("x"), allb.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
        # candidates are the SMALL set by construction; persist so the
        # expensive signature/banding subtree runs once, not once per use
        # (verify join ×2 + the cand_ids semi-join below)
        .persist()
    )
    # verify ONLY candidate docs: left-semi prune BEFORE materializing the
    # word arrays — at 100 TB candidates are a sliver of the corpus and
    # collect_set over everything would re-materialize the corpus as arrays
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    warr = (
        w.join(cand_ids, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("word").alias("words"))
        .withColumn("sz", F.size("words"))
    )
    wa = warr.select(F.col("doc_id").alias("doc_a"), F.col("words").alias("wa"), F.col("sz").alias("sz_a"))
    wb = warr.select(F.col("doc_id").alias("doc_b"), F.col("words").alias("wb"), F.col("sz").alias("sz_b"))
    common = F.size(F.array_intersect(F.col("wa"), F.col("wb")))
    return (
        cand.join(wa, "doc_a")
        .join(wb, "doc_b")
        .withColumn("common", common.cast("long"))
        .withColumn(
            "jaccard_e6",
            F.round(
                F.col("common") * 1000000.0 / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
            ).cast("long"),
        )
        .filter(F.col("jaccard_e6") >= int(threshold * 1_000_000))
        .select("doc_a", "doc_b", "common", "jaccard_e6")
    )


def char_ngram_shingles(
    docs: DataFrame, n: int = 3, distinct: bool = True, stride: int = 1
) -> DataFrame:
    """Char n-gram shingles per doc — transform-with-index keeps it
    JVM-side (F.sequence → F.transform(x, i)), no UDF.  Pass
    ``distinct=False`` when the consumer is duplicate-safe (min-agg
    minhash, collect_set): the global distinct is a full shuffle of the
    exploded corpus.  ``stride>1`` samples every stride-th position —
    minhash signatures don't need every overlapping shingle (measured:
    stride 2 halves signature cost at 100% candidate recall on the
    sf0.01 exhaustive truth)."""
    grams = F.when(
        F.length("text") >= n,
        F.transform(
            F.sequence(F.lit(1), F.length("text") - (n - 1), F.lit(stride)),
            lambda i: F.col("text").substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = (
        docs.select("doc_id", F.explode(grams).alias("gram"))
        .filter(F.length("gram") == n)
    )
    return out.distinct() if distinct else out


def _ngram_sig_bands(
    docs: DataFrame,
    n: int,
    vocab: list[str],
    bands: int,
    rows_per_band: int,
    sig_n: int,
    sig_stride: int,
) -> DataFrame:
    """Char-shingle MinHash band rows + verify-set bit masks in ONE Arrow
    stage (the ngram twin of ``_word_sig_bands``): per doc, the ``sig_n``-
    char stride shingles (whole text for short docs) → ``bands×rows`` exact
    md5 minhash lanes → band digests as two longs, plus the distinct
    ``n``-gram set encoded as a fixed-width multi-long bit mask over the
    global gram ``vocab`` and its exact size ``sz``.
    """
    import hashlib
    import struct as _struct

    import pandas as pd

    vpos = {g: i for i, g in enumerate(vocab)}
    width = max(1, (len(vocab) + 63) // 64)
    k = bands * rows_per_band

    def gen(it):
        md5 = hashlib.md5
        unpack = _struct.Struct(">qq").unpack
        for pdf in it:
            ids, masks, szs, bands_, bhis, blos = [], [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
                if not text:
                    continue
                L = len(text)
                if L >= sig_n:
                    shingles = {text[i : i + sig_n] for i in range(0, L - sig_n + 1, sig_stride)}
                else:
                    shingles = {text}
                grams = {text[i : i + n] for i in range(L - n + 1)} if L >= n else set()
                words = [0] * width
                for g in grams:
                    p = vpos[g]
                    words[p >> 6] |= 1 << (p & 63)
                # two's-complement to signed 64-bit for the LongType column
                mask = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
                mhs = [
                    min(md5((f"g{i}|" + s).encode()).hexdigest() for s in shingles)
                    for i in range(k)
                ]
                for b in range(bands):
                    lane = "|".join(mhs[rows_per_band * b : rows_per_band * (b + 1)])
                    hi, lo = unpack(md5(lane.encode()).digest())
                    ids.append(doc_id)
                    masks.append(mask)
                    szs.append(len(grams))
                    bands_.append(b)
                    bhis.append(hi)
                    blos.append(lo)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "mask": masks,
                    "sz": szs,
                    "band": bands_,
                    "bhi": bhis,
                    "blo": blos,
                }
            )

    return _spread(docs.select("doc_id", "text")).mapInPandas(
        gen, "doc_id long, mask array<long>, sz int, band int, bhi long, blo long"
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    bands: int = 4,
    rows_per_band: int = 2,
    sig_n: int = 8,
    sig_stride: int = 2,
) -> DataFrame:
    """Char-n-gram Jaccard near-dup pairs: **LSH prefilter → exact verify**
    — semantics identical to the r5 operator (same md5 shingle banding,
    same exact n-gram-set Jaccard, mirrored by the frozen oracle).  Like
    ``word_jaccard_pairs`` the hot path runs signatures+banding in one
    Arrow stage (no SortAggregate over string minhash lanes), joins band
    buckets on two-long digests with hot-bucket salting, and verifies via
    global-vocab bit masks (``sum(bit_count(a&b))`` over the zipped mask
    words) with the threshold filter applied before the pair distinct;
    gram vocabularies past ``MASK_VOCAB_CAP`` fall back to the r5
    array-verify shape (``_ngram_jaccard_pairs_arrays``).  Docs with no
    ``n``-gram (shorter than n) generate no verified pair, exactly as the
    old inner join against the gram table dropped them.
    """
    g_vocab = (
        _spread(docs.select("doc_id", "text"))
        .select(
            F.explode(
                F.when(
                    F.length("text") >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.length("text") - (n - 1)),
                        lambda i: F.col("text").substr(i, F.lit(n)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram")
        )
        .filter(F.length("gram") == n)
        .distinct()
        .limit(MASK_VOCAB_CAP + 1)
    )
    vocab = sorted(r["gram"] for r in g_vocab.collect())
    if len(vocab) > MASK_VOCAB_CAP:
        return _ngram_jaccard_pairs_arrays(
            docs, n, threshold, bands, rows_per_band, sig_n, sig_stride
        )
    allb = _ngram_sig_bands(docs, n, vocab, bands, rows_per_band, sig_n, sig_stride)
    wbb = Window.partitionBy("band", "bhi", "blo")
    # persist: see word_jaccard_pairs — four join sides share this subtree
    par = docs.sparkSession.sparkContext.defaultParallelism
    allb = (
        allb.withColumn("__bsz", F.count("*").over(wbb))
        .repartition(par, "doc_id")  # see word_jaccard_pairs: BHJ stream-side parallelism
        .persist()
    )
    pairs = _bucket_pairs(allb, ["mask", "sz"])
    common = F.aggregate(
        F.zip_with("mask_a", "mask_b", lambda a, b: F.bit_count(a.bitwiseAND(b)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        pairs.filter((F.col("sz_a") > 0) & (F.col("sz_b") > 0))
        .withColumn("__c", common)
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("__c") * 1000000.0 / (F.col("sz_a") + F.col("sz_b") - F.col("__c")))
            .cast("long")
            .alias("jaccard_e6"),
        )
        .filter(F.col("jaccard_e6") >= int(threshold * 1_000_000))
        .distinct()
    )


def _ngram_jaccard_pairs_arrays(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    bands: int = 4,
    rows_per_band: int = 2,
    sig_n: int = 8,
    sig_stride: int = 2,
) -> DataFrame:
    """The r5 array-verify shape — fallback past the mask vocab gate.

    The old shape (shingle self-join) is quadratic within hot grams; this is
    the scale path: MinHash signatures → banded bucket join generates
    candidates (never all-pairs), then exact n-gram Jaccard is computed ONLY
    for candidates via a JVM-side ``array_intersect`` of the per-doc gram
    sets.

    Signatures hash ``sig_n``-char shingles (8 by default), NOT the verify
    n-grams: a 3-char gram space is so small that every long document
    contains the globally-minimal gram and all minhashes collide — buckets
    degenerate to all-pairs (measured: 21 s → timeout at sf0.1).  8-char
    shingles are the standard text-dedup choice; near-identical documents
    still share them.  Docs shorter than ``sig_n`` sign their WHOLE text
    instead (they have no shingle) so short near-dups stay reachable.  Both
    stages are deterministic md5 and the DuckDB oracle mirrors them
    bit-for-bit, so the gate compares identical sets.
    """
    g = char_ngram_shingles(docs, n, distinct=False)
    short = docs.filter((F.length("text") > 0) & (F.length("text") < sig_n)).select(
        "doc_id", F.col("text").alias("gram")
    )
    gs = char_ngram_shingles(docs, sig_n, distinct=False, stride=sig_stride).unionByName(short)
    k = bands * rows_per_band
    # one md5 per lane — NOT slices of a shared digest: measured on this
    # corpus, 32-bit slices of one md5 inflate band collisions 6.5×
    # (47k → 308k candidate rows at sf0.1), swamping the hashing saved
    sig = gs.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"g{i}|"), F.col("gram")))).alias(f"mh{i}")
            for i in range(k)
        ]
    )
    band_frames = [
        sig.select(
            "doc_id",
            F.lit(i).alias("band"),
            F.md5(
                F.concat_ws("|", *[f"mh{rows_per_band * i + r}" for r in range(rows_per_band)])
            ).alias("bucket"),
        )
        for i in range(bands)
    ]
    allb = band_frames[0]
    for bf in band_frames[1:]:
        allb = allb.unionByName(bf)
    x, y = allb.alias("x"), allb.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
        .persist()  # small by construction; see word_jaccard_pairs
    )
    # semi-join prune: gram arrays only for candidate docs (see
    # word_jaccard_pairs — never re-materialize the whole corpus as arrays)
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    garr = (
        g.join(cand_ids, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("gram").alias("grams"))
        .withColumn("sz", F.size("grams"))
    )
    ga = garr.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("ga"), F.col("sz").alias("sz_a"))
    gb = garr.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gb"), F.col("sz").alias("sz_b"))
    common = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    return (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .withColumn(
            "jaccard_e6",
            F.round(common * 1000000.0 / (F.col("sz_a") + F.col("sz_b") - common)).cast("long"),
        )
        .filter(F.col("jaccard_e6") >= int(threshold * 1_000_000))
        .select("doc_a", "doc_b", "jaccard_e6")
    )


MINHASH_SEEDS = [f"s{i}" for i in range(6)]


def word_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc (indexed transform, JVM-side).

    The word array is materialized in its own projection first: inlined,
    the split/lower of the full text re-evaluates on every element access
    inside the transform lambda (~3× per shingle).  CollapseProject keeps
    multi-use non-cheap expressions in separate projects, so the split
    runs once per row."""
    words = F.col("w")
    sh = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(
                " ",
                F.try_element_at(words, i),
                F.try_element_at(words, i + 1),
                F.try_element_at(words, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", _words().alias("w"))
        .select("doc_id", F.explode(sh).alias("sh"))
        .distinct()
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """k=6 MinHash signature columns over word-3-gram shingles:
    min(md5(seed|shingle)) per seed.

    md5-as-permutation is the standard trick when true 64-bit permutations
    aren't needed; identical and portable across engines.  Shingles (not
    single words) keep bucket diversity high on small vocabularies.
    """
    w = word_shingles(docs)
    aggs = [
        F.min(F.md5(F.concat(F.lit(seed + "|"), F.col("sh")))).alias(f"mh{i}")
        for i, seed in enumerate(MINHASH_SEEDS)
    ]
    return w.groupBy("doc_id").agg(*aggs)


def _minhash_band_rows(docs: DataFrame) -> DataFrame:
    """Word-3-gram-shingle MinHash band rows in ONE Arrow stage (the
    ``minhash_signatures`` + banding pipeline of r5, restructured like
    ``_word_sig_bands``): the explode → distinct → ``min(md5 string)``
    groupBy planned SortAggregate (string buffers defeat HashAggregate) and
    shuffled the exploded shingle corpus twice; here the exact same md5
    lanes and band digests (as two longs) come out of one pass over the
    raw docs.  Shingling mirrors ``word_shingles`` byte-for-byte: the
    space-split word list (empty tokens kept), consecutive triples joined
    with single spaces, distinct per doc."""
    import hashlib
    import struct as _struct

    import pandas as pd

    def gen(it):
        md5 = hashlib.md5
        unpack = _struct.Struct(">qq").unpack
        for pdf in it:
            ids, bands_, bhis, blos = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
                if text is None:
                    continue
                words = text.lower().split(" ")
                if len(words) < 3:
                    continue
                shingles = {
                    " ".join(words[i : i + 3]) for i in range(len(words) - 2)
                }
                mhs = [
                    min(md5((seed + "|" + sh).encode()).hexdigest() for sh in shingles)
                    for seed in MINHASH_SEEDS
                ]
                for b in range(3):
                    hi, lo = unpack(md5((mhs[2 * b] + "|" + mhs[2 * b + 1]).encode()).digest())
                    ids.append(doc_id)
                    bands_.append(b)
                    bhis.append(hi)
                    blos.append(lo)
            yield pd.DataFrame({"doc_id": ids, "band": bands_, "bhi": bhis, "blo": blos})

    return _spread(docs.select("doc_id", "text")).mapInPandas(
        gen, "doc_id long, band int, bhi long, blo long"
    )


def minhash_lsh_candidates(docs: DataFrame) -> DataFrame:
    """LSH banding (3 bands × 2 rows): docs sharing any band bucket.

    Returns candidate pairs (doc_a < doc_b, band) — the scale path for
    near-dup detection: bucket join instead of all-pairs.  Same candidate
    set as r5 (band digest equality ⟺ the old md5-string bucket equality);
    executed via the Arrow signature stage + two-long bucket keys with
    hot-bucket salting (see ``word_jaccard_pairs``).
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    wbb = Window.partitionBy("band", "bhi", "blo")
    allb = (
        _minhash_band_rows(docs)
        .withColumn("__bsz", F.count("*").over(wbb))
        .repartition(par, "doc_id")
        .persist()
    )
    return _bucket_pairs(allb, [], keep_band=True).distinct()


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """32-bit SimHash: per-bit ±1 votes over word hashes, sign → bit.

    Word hash = first 8 hex chars of md5 → uint32, votes and bit packing
    exactly as the r5 JVM form (explode → distinct → 32 conditional sums —
    verified diff=0), executed as ONE Arrow stage over the raw docs: the
    per-doc distinct word set, the md5 hashing and the integer vote loop
    run in Python per batch, removing the exploded-corpus distinct shuffle
    and the 32-sum aggregate entirely (1.05 s → 0.42 s at sf0.1).
    """
    import hashlib

    import pandas as pd

    def gen(it):
        md5 = hashlib.md5
        for pdf in it:
            ids, sigs = [], []
            for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
                if text is None:
                    continue
                words = set(text.lower().split(" "))
                words.discard("")
                if not words:
                    continue
                votes = [0] * bits
                for w in words:
                    h = int(md5(w.encode()).hexdigest()[:8], 16)
                    for b in range(bits):
                        votes[b] += 1 if (h >> b) & 1 else -1
                sig = 0
                for b in range(bits):
                    if votes[b] > 0:
                        sig |= 1 << b
                if sig >= 1 << 63:  # two's-complement for the LongType column
                    sig -= 1 << 64
                ids.append(doc_id)
                sigs.append(sig)
            yield pd.DataFrame({"doc_id": ids, "simhash": sigs})

    return _spread(docs.select("doc_id", "text")).mapInPandas(
        gen, "doc_id long, simhash long"
    )


def phash_dup_pairs(
    images: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_dist: int = 3,
    bands: int = 4,
    band_bits: int = 16,
) -> DataFrame:
    """Near-duplicate pairs by Hamming distance over 64-bit perceptual
    hashes (``imaging.phash64`` populates the ``phash`` column of the
    image+caption table) — **multi-index hashing**: band the 64-bit code
    into ``bands`` disjoint ``band_bits``-bit substrings, bucket-join on
    (band, substring), verify ``bit_count(a XOR b) <= max_dist`` on the
    candidate set only.

    Unlike probabilistic LSH, banding a Hamming code is EXACT by the
    pigeonhole principle: two codes within distance d < bands differ in at
    most d bands, so at least one band matches — 100% recall with no tuning
    (Norouzi/Punjani/Fleet, "Fast Search in Hamming Space with Multi-Index
    Hashing", CVPR'12 — public).

    Scale: each band join shuffles on a uniform 16-bit substring of an
    already-uniform hash — skew-free; per-bucket population is O(N/2^16)
    per band, candidates are verified with one integer XOR+popcount (pure
    JVM bit math, mirrored bit-for-bit by the DuckDB oracle's
    ``bit_count(xor(..))``).  No all-pairs path exists at any scale.
    """
    p = images.select(
        F.col(id_col).alias("img_id"), F.col(phash_col).cast("long").alias("ph")
    )
    mask = (1 << band_bits) - 1
    # ONE pass + Generate instead of a `bands`-way union of selects over the
    # same source: the union shape re-ran the upstream phash derivation once
    # per band per join side (2×bands scans); the explode computes it once
    # per side and emits the same (band, bucket) rows
    bands_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("ph"), b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    allb = p.select("img_id", "ph", F.explode(bands_arr).alias("bb")).select(
        "img_id", "ph", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    x, y = allb.alias("x"), allb.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.img_id") < F.col("y.img_id")),
        )
        .select(
            F.col("x.img_id").alias("img_a"),
            F.col("y.img_id").alias("img_b"),
            F.bit_count(F.col("x.ph").bitwiseXOR(F.col("y.ph"))).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= F.lit(int(max_dist)))
        .distinct()  # a pair within distance d can match in up to `bands` bands
    )


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bands: int = 3,
    rows_per_band: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via **banded sign-LSH** (B bands ×
    r bits, similarity.banded_lsh_buckets) → exact cosine verify on the
    candidate set — the same multi-table LSH shape as the text dedup.

    A single wide bucket (the old shape) both capped recall (one missed
    sign bit kills the pair) and left per-bucket population O(N²/2^bits)
    at scale; bands bound per-bucket work while the band union lifts recall
    (planted cos≥0.997 pairs: 5/5 recovered vs 4/5 single-bucket,
    tests/test_dedup_recall.py asserts ≥95% vs exhaustive).  Hyperplanes
    are md5-derived literals, mirrored exactly by the DuckDB oracle.
    """
    from .similarity import banded_lsh_buckets

    e = embeddings.select("vec_id", "embedding")
    bb = banded_lsh_buckets(e, bands, rows_per_band)
    x, y = bb.alias("x"), bb.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"))
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda p, q: p * q),
        F.lit(0.0).cast("double"),
        lambda acc, p: acc + p,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0).cast("double"), lambda acc, p: acc + p * p)
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cos_e6", F.round(dot / (norm("va") * norm("vb")) * 1e6).cast("long"))
        .filter(F.col("cos_e6") >= int(threshold * 1e6))
        .select("vec_a", "vec_b", "cos_e6")
    )


def crossmodal_dup_pairs(
    images: DataFrame,
    max_dist: int = 3,
    max_caption_group: int = 64,
) -> DataFrame:
    """Cross-modal duplicate classification over the image+caption pair
    table (input_hint shape) — joins the IMAGE near-dup signal (phash
    Hamming, :func:`phash_dup_pairs`, exact multi-index banding) with the
    CAPTION dup signal (normalized-equality groupBy) and labels every
    candidate pair:

    - ``dup``: image near-dup AND caption dup — the same training sample
      twice; drop one (the standard image-text dataset dedup case).
    - ``caption_conflict``: image near-dup but captions differ — the same
      picture labelled two ways, i.e. label noise a caption-supervised
      training run wants surfaced, not silently deduped.
    - ``caption_boilerplate``: caption dup but images differ — a stock
      caption ("photo", alt-text boilerplate) pasted across unrelated
      images; a caption-keyed dedup would wrongly collapse these.

    Caption normalization is lower/trim/whitespace-squeeze (mirrored in
    the DuckDB oracle).  ``max_caption_group`` guards the quadratic blowup
    of a hot boilerplate caption shared by millions of rows: caption
    groups larger than the cap are excluded from pair generation (same
    df-cap pattern as ``word_jaccard_pairs``; the cap is mirrored in the
    oracle).  Scale: the image side is the skew-free banded Hamming join;
    the caption side shuffles once on the normalized-caption hash with
    per-group pair fan-out bounded by the cap — no all-pairs path.

    Ref analog: the reference dedupes on content digest only
    (``Database.java:229-251``); cross-modal classification is our
    training-pipeline extension over the paired table.
    """
    norm = images.select(
        F.col("image_id").alias("img_id"),
        F.regexp_replace(F.trim(F.lower(F.col("caption"))), r"\s+", " ").alias("ckey"),
    )
    img = phash_dup_pairs(images, max_dist=max_dist).select(
        F.col("img_a"), F.col("img_b"), F.col("hamming")
    )
    # group-size guard as ONE window on ckey instead of groupBy + join-back:
    # the window's hash exchange on ckey is the same partitioning the caption
    # self-join below needs, so the guard costs no extra shuffle of norm
    # (same df-cap shape as word_jaccard_pairs' guarded variant)
    wc = Window.partitionBy("ckey")
    nc = (
        norm.withColumn("__n", F.count("*").over(wc))
        .filter(F.col("__n") <= int(max_caption_group))
        .drop("__n")
    )
    cx, cy = nc.alias("cx"), nc.alias("cy")
    cap = cx.join(
        cy,
        (F.col("cx.ckey") == F.col("cy.ckey"))
        & (F.col("cx.img_id") < F.col("cy.img_id")),
    ).select(
        F.col("cx.img_id").alias("img_a"),
        F.col("cy.img_id").alias("img_b"),
        F.lit(True).alias("cap_dup"),
    )
    j = img.join(cap, ["img_a", "img_b"], "full_outer")
    return j.select(
        "img_a",
        "img_b",
        "hamming",
        F.when(F.col("hamming").isNotNull() & F.col("cap_dup").isNotNull(), "dup")
        .when(F.col("hamming").isNotNull(), "caption_conflict")
        .otherwise("caption_boilerplate")
        .alias("label"),
    )
