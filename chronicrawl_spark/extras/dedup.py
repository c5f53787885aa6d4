"""Training-data deduplication operators over the ``documents`` table.

Each operator is a pure DataFrame transform (JVM-side expressions only — no
Python UDFs in any hot path) designed so a byte-identical DuckDB oracle SQL
exists (``__spark_entry__.oracle_sql``).  Hash functions are md5 (identical
output in Spark and DuckDB); scores are scaled to BIGINT to avoid
float-representation drift in the value-hash comparison.

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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def word_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.9, max_bucket_size: int | None = None
) -> DataFrame:
    """Near-dup pairs by Jaccard over distinct word sets: **MinHash-LSH
    candidates → exact verify** (same scale shape as ``ngram_jaccard_pairs``
    — the word self-join candidate generator it replaces was quadratic
    within stop-words and capped recall with a df cutoff).

    Candidates come from **word-unigram** MinHash (min(md5(seed|word)) — the
    unbiased estimator of word-SET Jaccard; shingle signatures would miss
    reordered near-dups) with 3×2 banding: per-pair recall ≈ 1-(1-s²)³ ≈
    99.3% at s=0.9, deterministic given md5 and mirrored exactly by the
    oracle.  Exact word-set Jaccard is then computed only for candidates
    via ``array_intersect``.  score ×1e6 → BIGINT for oracle comparison.

    ``max_bucket_size`` bounds the worst case: a band bucket holding m docs
    contributes O(m²) candidate pairs, so a pathological corpus (this
    synthetic one: word sets overlap so heavily that ~70% of ALL pairs are
    true LSH candidates) makes the unguarded operator quadratic.  When set,
    (band, bucket) groups larger than the cap are dropped BEFORE the
    self-join — the standard LSH df-cap: an over-full bucket means that
    band is non-discriminative for those docs, and a true near-dup pair is
    still found by any of its other, selective bands.  Deterministic and
    mirrored exactly by the DuckDB oracle (dedup_word_jaccard_guarded);
    ``None`` (default) keeps the exact unguarded semantics.
    """
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


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    bands: int = 4,
    rows_per_band: int = 2,
    sig_n: int = 8,
    sig_stride: int = 2,
) -> DataFrame:
    """Char-n-gram Jaccard near-dup pairs: **LSH prefilter → exact verify**.

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


def minhash_lsh_candidates(docs: DataFrame) -> DataFrame:
    """LSH banding (3 bands × 2 rows): docs sharing any band bucket.

    Returns candidate pairs (doc_a < doc_b, band) — the scale path for
    near-dup detection: bucket join instead of all-pairs.
    """
    sig = minhash_signatures(docs)
    bands = []
    for band in range(3):
        b = sig.select(
            "doc_id",
            F.lit(band).alias("band"),
            F.md5(F.concat_ws("|", f"mh{2 * band}", f"mh{2 * band + 1}")).alias("bucket"),
        )
        bands.append(b)
    allb = bands[0].unionByName(bands[1]).unionByName(bands[2])
    a, b = allb.alias("a"), allb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"), F.col("a.band").alias("band"))
        .distinct()

    )


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """32-bit SimHash: per-bit ±1 votes over word hashes, sign → bit.

    Word hash = first 8 hex chars of md5 → uint32 (conv/hex-cast exists in
    both engines).  One explode + one groupBy with 32 conditional sums.
    """
    w = (
        docs.select("doc_id", F.explode(_words()).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
        .withColumn("h", F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = w.groupBy("doc_id").agg(*votes)
    sig = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << b)
        sig = bit if sig is None else sig + bit
    return agg.select("doc_id", sig.cast("long").alias("simhash"))


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
    band_frames = [
        p.select(
            "img_id",
            "ph",
            F.lit(b).alias("band"),
            F.shiftright(F.col("ph"), b * band_bits).bitwiseAND(F.lit(mask)).alias("bucket"),
        )
        for b in range(bands)
    ]
    allb = band_frames[0]
    for bf in band_frames[1:]:
        allb = allb.unionByName(bf)
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
    small = (
        norm.groupBy("ckey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") <= int(max_caption_group))
        .select("ckey")
    )
    nc = norm.join(small, "ckey")
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
