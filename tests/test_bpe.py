"""Real BPE token counting (extras/textstats.py): learned merges, the
GPT-2-style lowest-rank-first encoder loop, and the Arrow counting stage."""

from chronicrawl_spark.extras.textstats import (
    bpe_token_count,
    encode_bpe_word,
    learn_bpe,
)


def test_learn_bpe_classic_example():
    # the canonical Sennrich corpus shape: 'low' variants dominate, so the
    # first merges assemble 'low'
    corpus = ["low low low low low lower lower newest newest newest widest"]
    merges = learn_bpe(corpus, n_merges=4)
    # ('o','w') and ('l','o') tie at 7; the deterministic lexicographic
    # tie-break picks ('o','w'), then 'low' assembles and absorbs </w>
    assert merges[0] == ("o", "w")
    assert merges[1] == ("l", "ow")
    assert merges[2] == ("low", "</w>")
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_bpe_word("low", ranks) == 1
    # unseen word degrades to ~chars+1, never errors
    assert encode_bpe_word("zq", {}) == 3


def test_bpe_token_count_stage(spark):
    texts = [
        (1, "low low lower"),
        (2, "the newest widest low"),
        (3, ""),
        (4, "LOW Low loW"),  # case-folded
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    merges = learn_bpe([t for _, t in texts], n_merges=50)
    out = {r["doc_id"]: r for r in bpe_token_count(docs, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}

    # spark stage == driver-side encoder, row for row
    for doc_id, text in texts:
        expect = sum(encode_bpe_word(w, ranks) for w in text.lower().split())
        assert out[doc_id]["bpe_tokens"] == expect, doc_id
    # enough merges: every in-corpus word collapses to one token
    assert out[1]["bpe_tokens"] == 3
    assert out[4]["bpe_tokens"] == 3
    # ws/bpe-ish columns still present (token_count superset); empty text
    # counts zero BPE tokens
    assert out[3]["ws_tokens"] >= 1 and out[3]["bpe_tokens"] == 0
