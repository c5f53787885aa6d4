"""LSH recall gates: the oracle entries mirror the banding bit-for-bit, so
they verify determinism, not recall — a banding regression would stay green
everywhere else.  These tests pin recall against the EXHAUSTIVE truth
(cheap in DuckDB / numpy at oracle scale): LSH pairs must recover ≥95% of
all-pairs results at the operator's threshold.
"""

import duckdb
import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.01"


def _docs_view():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    return con


def _exhaustive_word_jaccard(threshold=0.9):
    con = _docs_view()
    rows = con.execute(f"""
    WITH w AS (SELECT DISTINCT doc_id, unnest(string_split(lower(text),' ')) AS word FROM documents),
    wd AS (SELECT doc_id, word FROM w WHERE word <> ''),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM wd GROUP BY 1),
    c AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) common
          FROM wd a JOIN wd b ON a.word = b.word AND a.doc_id < b.doc_id GROUP BY 1,2)
    SELECT da, db FROM c JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
    WHERE CAST(ROUND(common*1000000.0/(sa.sz+sb.sz-common)) AS BIGINT) >= {int(threshold * 1e6)}
    """).fetchall()
    return {(a, b) for a, b in rows}


def _exhaustive_ngram_jaccard(threshold=0.8):
    con = _docs_view()
    rows = con.execute(f"""
    WITH g AS (SELECT DISTINCT doc_id, substr(text, i.i, 3) AS gram
           FROM documents d, LATERAL (SELECT unnest(range(1, GREATEST(LENGTH(d.text)-2,0)+1)) AS i) i
           WHERE LENGTH(substr(text, i.i, 3)) = 3),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
    c AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) common
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id GROUP BY 1,2)
    SELECT da, db FROM c JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
    WHERE CAST(ROUND(common*1000000.0/(sa.sz+sb.sz-common)) AS BIGINT) >= {int(threshold * 1e6)}
    """).fetchall()
    return {(a, b) for a, b in rows}


def test_word_jaccard_lsh_recall(spark):
    from chronicrawl_spark.extras.dedup import word_jaccard_pairs

    truth = _exhaustive_word_jaccard()
    assert truth, "fixture must contain near-dup pairs for the gate to mean anything"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"]) for r in word_jaccard_pairs(docs, threshold=0.9).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.95, f"word-jaccard LSH recall {recall:.3f} < 0.95 ({len(got & truth)}/{len(truth)})"
    assert got <= truth | got  # sanity: verify stage never invents pairs below threshold
    assert all(p in truth for p in got), "LSH+exact-verify must be a subset of exhaustive truth"


def test_ngram_jaccard_lsh_recall(spark):
    from chronicrawl_spark.extras.dedup import ngram_jaccard_pairs

    truth = _exhaustive_ngram_jaccard()
    assert truth
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.95, f"ngram-jaccard LSH recall {recall:.3f} < 0.95 ({len(got & truth)}/{len(truth)})"
    assert all(p in truth for p in got)


def test_ngram_short_doc_fallback(spark):
    """Docs shorter than the 8-char signature shingle sign their whole text:
    two identical 5-char docs must still be reported (regression: shingle-only
    signatures silently dropped all short docs from candidacy)."""
    from chronicrawl_spark.extras.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "abcde"), (2, "abcde"), (3, "zzzzz"), (4, "completely different text here")],
        "doc_id long, text string",
    )
    got = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs).collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_embedding_banded_lsh_recall(spark):
    """Planted near-duplicates (first component ×1.5, cos ≥ 0.997) must be
    recovered by the banded sign-LSH — the single-bucket shape this replaced
    recovered only 4/5 (one missed sign bit killed the pair)."""
    import __spark_entry__ as em

    # exhaustive truth with the same planting, via numpy
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in emb])
    M = np.array([r["embedding"] for r in emb], dtype=np.float64)
    P = M[:5].copy()
    P[:, 0] *= 1.5
    allv = np.vstack([M, P])
    allids = np.concatenate([ids, ids[:5] + 1_000_000_000])
    Mn = allv / np.linalg.norm(allv, axis=1, keepdims=True)
    C = Mn @ Mn.T
    iu = np.triu_indices(len(allv), 1)
    mask = np.round(C[iu] * 1e6).astype(np.int64) >= 950_000
    truth = {
        (int(min(allids[i], allids[j])), int(max(allids[i], allids[j])))
        for i, j in zip(iu[0][mask], iu[1][mask])
    }
    assert len(truth) >= 5  # the 5 planted pairs at minimum

    got = {(r["vec_a"], r["vec_b"]) for r in em.queries()["embed_dup_pairs"](spark, SF_DIR).collect()}
    assert got, "embed_dup_pairs must not be vacuous"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.95, f"banded sign-LSH recall {recall:.3f} < 0.95"
    assert all(p in truth for p in got)


def test_hyperplanes_distinct():
    """The md5-derived hyperplane matrix must have no duplicate planes —
    the old closed-form (i*31 + b*17) % 7 had period 7 in b, so bit 7
    duplicated bit 0 and 24-bit banding only had 7 effective planes."""
    from chronicrawl_spark.extras.similarity import hyperplane

    planes = {hyperplane(b) for b in range(24)}
    assert len(planes) == 24


def test_ivf_topk_recall(spark):
    """IVF-Flat (probe 8 of 16 cells) must recover ≥90% of the exact
    cosine top-10 on the synthetic corpus (measured 100% at sf0.01; IVF
    recall is data-dependent — isotropic vectors are its worst case, so
    the gate pins the floor, not the measurement)."""
    from pyspark.sql import functions as F

    from chronicrawl_spark.extras.similarity import cosine_topk, ivf_topk

    e = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    exact = [r["vec_id"] for r in cosine_topk(e, k=10).collect()]
    approx = [r["vec_id"] for r in ivf_topk(e, k=10, n_clusters=16, n_probe=8).collect()]
    assert len(set(exact) & set(approx)) / len(exact) >= 0.9
