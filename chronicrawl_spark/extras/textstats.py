"""Text-analysis operators for training-data pipelines over ``documents``.

All JVM-side expressions (no UDFs): language-ID by marker-token voting,
quality scoring by length/punctuation/stopword ratios, token counting
(whitespace + a BPE-ish regex), and rolling min-hash document fingerprints.
Every operator has a value-identical DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker tokens per language (tiny, deterministic heuristic — the corpus is
# synthetic; the operator shape is what matters: array_intersect-style voting)
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to", "value", "key", "fast", "slow", "table"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "wert"],
    "fr": ["le", "la", "les", "et", "est", "une", "pas", "des", "avec"],
    "es": ["el", "la", "los", "y", "es", "una", "con", "por", "del"],
    "zh": ["表", "行", "值", "键", "的", "和"],
}

BPE_ISH_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _words(col="text"):
    return F.split(F.lower(F.col(col)), " ")


def _marker_hits(lang: str):
    return F.size(F.array_intersect(_words(), F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])))


def lang_id(docs: DataFrame) -> DataFrame:
    """Predicted language = argmax over marker-token distinct-hit counts,
    deterministic tie-break by language code."""
    cols = [_marker_hits(lang).alias(f"hits_{lang}") for lang in LANG_MARKERS]
    scored = docs.select("doc_id", "lang", *cols)
    # greatest + case chain (ties → first in sorted lang order)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = None
    for lg in langs:
        cond = F.col(f"hits_{lg}") == best
        pred = F.when(cond, F.lit(lg)) if pred is None else pred.when(cond, F.lit(lg))
    return scored.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        pred.alias("pred_lang"),
        best.alias("marker_hits"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Quality heuristics: length, mean word length, stopword ratio,
    non-alnum ratio → composite score (scaled BIGINT)."""
    words = _words()
    n_words = F.greatest(F.size(words), F.lit(1))
    mean_wlen = (F.length("text") - (n_words - 1)) / n_words  # chars minus spaces
    stop = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    stop_hits = F.size(F.array_intersect(words, stop))
    non_alnum = F.length(F.regexp_replace(F.lower("text"), "[a-z0-9 ]", ""))
    score = (
        F.least(F.length("text") / 400.0, F.lit(1.0)) * 40
        + F.when((mean_wlen >= 3) & (mean_wlen <= 10), 30).otherwise(0)
        + F.least(stop_hits * 5.0, F.lit(20.0))
        + F.when(non_alnum * 1.0 / F.greatest(F.length("text"), F.lit(1)) < 0.1, 10).otherwise(0)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wlen * 100).cast("long").alias("mean_word_len_e2"),
        stop_hits.alias("stopword_hits"),
        F.round(score * 100).cast("long").alias("quality_e2"),
    )


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (letters / digits / other)."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " +")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_ISH_TOKEN_RE), 0)).alias(
            "bpe_ish_tokens"
        ),
    )


def fingerprint(docs: DataFrame, shingle: int = 3) -> DataFrame:
    """Document fingerprint: min/max md5 over word 3-gram shingles (a
    winnowing-style rolling-hash selection, expressible in both engines via
    indexed list_transform)."""
    words = _words()
    n = F.size(words)
    shingles = F.when(
        n >= shingle,
        F.transform(
            F.sequence(F.lit(1), n - (shingle - 1)),
            lambda i: F.md5(
                F.concat_ws(
                    " ",
                    F.try_element_at(words, i),
                    F.try_element_at(words, i + 1),
                    F.try_element_at(words, i + 2),
                )
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id",
        F.array_min(shingles).alias("fp_min"),
        F.array_max(shingles).alias("fp_max"),
    )
