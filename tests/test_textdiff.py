"""C19 text diff: opcode correctness on hand-derived cases."""

import pyspark.sql.functions as F

from chronicrawl_spark.extras.textdiff import diff_captures


def test_diff_ops_hand_cases(spark):
    rows = [
        ("same", "a b c", "a b c"),
        ("insert", "a b", "a b c d"),
        ("delete", "a b c d", "a b"),
        ("replace", "a x c", "a y c"),
        ("nulls", None, "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, old_text string, new_text string")
    out = {r["doc_id"]: r for r in diff_captures(df).collect()}

    assert [o["op"] for o in out["same"]["diff"]] == ["equal"]
    assert out["same"]["words_added"] == 0 and out["same"]["words_removed"] == 0
    assert out["same"]["unchanged_words"] == 3

    ins = out["insert"]
    assert ins["words_added"] == 2 and ins["words_removed"] == 0
    assert [(o["op"], o["b_text"]) for o in ins["diff"] if o["op"] == "insert"] == [("insert", "c d")]

    dele = out["delete"]
    assert dele["words_added"] == 0 and dele["words_removed"] == 2

    rep = out["replace"]
    assert rep["words_added"] == 1 and rep["words_removed"] == 1
    assert [(o["a_text"], o["b_text"]) for o in rep["diff"] if o["op"] == "replace"] == [("x", "y")]
    assert rep["unchanged_words"] == 2

    assert out["nulls"]["diff"] is None


def test_diff_roundtrip_reconstructs_new(spark):
    """Applying the opcodes must reconstruct the new text exactly."""
    rows = [("d", "the quick brown fox jumps", "the slow brown foxes jump high")]
    df = spark.createDataFrame(rows, "doc_id string, old_text string, new_text string")
    [r] = diff_captures(df).collect()
    rebuilt = " ".join(
        part
        for o in r["diff"]
        for part in ([o["b_text"]] if o["op"] != "delete" and o["b_text"] else [])
    )
    assert rebuilt == "the slow brown foxes jump high"
