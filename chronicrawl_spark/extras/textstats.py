"""Text-analysis operators for training-data pipelines over ``documents``.

All JVM-side expressions (no UDFs): language-ID by marker-token voting,
quality scoring by length/punctuation/stopword ratios, token counting
(whitespace + a BPE-ish regex), and rolling min-hash document fingerprints.
Every operator has a value-identical DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
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


# --------------------------------------------------------------- real BPE
# A training-data pipeline budgets REAL tokenizer tokens, not whitespace
# counts.  This is the classic byte-pair-encoding algorithm (Sennrich,
# Haddow & Birch, "Neural Machine Translation of Rare Words with Subword
# Units", ACL 2016 — the public algorithm behind the GPT-2/tiktoken
# vocabularies): an ordered merge list is learned driver-side from a sample
# corpus (or swapped for a published vocab, see ``bpe_token_count``), then
# applied per word in an Arrow-batched stage with a per-batch word memo —
# corpus words repeat heavily, so encoding is amortized O(distinct words).
# The ``token_count`` oracle entry above is deliberately untouched: it
# stays the cheap JVM-side estimate; this is the faithful counter.


def _merge_pair(sym: tuple, pair: tuple) -> tuple:
    out, i = [], 0
    while i < len(sym):
        if i < len(sym) - 1 and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def learn_bpe(texts, n_merges: int = 200) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from a corpus sample (driver-side).
    Deterministic: ties on pair frequency break lexicographically, so the
    same corpus always yields the same vocabulary."""
    from collections import Counter

    vocab: Counter = Counter()
    for t in texts:
        for w in str(t).lower().split():
            vocab[tuple(w) + ("</w>",)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        vocab = Counter({_merge_pair(sym, best): c for sym, c in vocab.items()})
    return merges


def encode_bpe_word(word: str, ranks: dict) -> int:
    """Token count of one word under a merge-rank table: repeatedly merge
    the lowest-rank adjacent pair (exactly the GPT-2 encoder loop)."""
    sym = list(word) + ["</w>"]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return len(sym)


def bpe_token_count(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """``token_count`` plus a REAL BPE token column: (doc_id, ws_tokens,
    bpe_ish_tokens, bpe_tokens).  ``merges`` is an ordered merge list —
    from ``learn_bpe`` in the sandbox, or a published vocabulary on a real
    cluster: ``tiktoken.get_encoding("o200k_base")`` exposes the same
    mergeable ranks, and this stage only needs the rank dict, so the
    swap-in is one constructor call (tiktoken is not in this container).

    The merge table rides the UDF closure (a few KB — task-broadcast);
    each Arrow batch keeps a word→count memo, so cost is O(distinct
    words), not O(tokens)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def _count(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}
        out = []
        for t in texts:
            n = 0
            for w in str(t).lower().split():
                c = memo.get(w)
                if c is None:
                    c = encode_bpe_word(w, ranks)
                    memo[w] = c
                n += c
            out.append(n)
        return pd.Series(out, dtype="int32")

    n_bpe = F.pandas_udf(_count, "int")

    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col(text_col)), " +")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(text_col), F.lit(BPE_ISH_TOKEN_RE), 0)).alias(
            "bpe_ish_tokens"
        ),
        n_bpe(F.col(text_col)).alias("bpe_tokens"),
    )


def fingerprint(docs: DataFrame, shingle: int = 3) -> DataFrame:
    """Document fingerprint: min/max md5 over word 3-gram shingles (a
    winnowing-style rolling-hash selection, expressible in both engines via
    indexed list_transform).

    The word array and the shingle-hash array are materialized in their own
    projections: inlined, the split/lower of the full text re-evaluates per
    element access (3 per lambda) per aggregate (fp_min AND fp_max) —
    ~6×shingles redundant splits per row.  CollapseProject keeps multi-use
    non-cheap expressions in separate projects, so each evaluates once per
    row (measured 4.8 s → sub-second at sf0.1)."""
    w = F.col("w")
    n = F.size(w)
    shingles = F.when(
        n >= shingle,
        F.transform(
            F.sequence(F.lit(1), n - (shingle - 1)),
            lambda i: F.md5(
                F.concat_ws(
                    " ",
                    F.try_element_at(w, i),
                    F.try_element_at(w, i + 1),
                    F.try_element_at(w, i + 2),
                )
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", _words().alias("w"))
        .select("doc_id", shingles.alias("hs"))
        .select(
            "doc_id",
            F.array_min("hs").alias("fp_min"),
            F.array_max("hs").alias("fp_max"),
        )
    )
