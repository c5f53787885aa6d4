"""Physical-plan inspection helpers — plan *regression tests*.

Correctness tests prove the operators compute the right rows; these helpers
prove Catalyst produced the plan that survives a 100× scale-up: filters
pushed into the scan, columns pruned, dimensions broadcast, no redundant
shuffles.  Used by ``tests/test_plans.py`` so a refactor that silently
breaks pushdown or flips a broadcast join to sort-merge fails CI.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(plan: str) -> list[str]:
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def count_exchanges(plan: str) -> int:
    """Shuffle exchanges only (broadcast exchanges are cheap by design)."""
    return len(re.findall(r"\n\s*\(\d+\) Exchange\b", plan))

def count_broadcast_joins(plan: str) -> int:
    # count numbered operator entries only (formatted output repeats the
    # operator name in the details section)
    return len(re.findall(r"\n\s*\(\d+\) BroadcastHashJoin\b", plan))


def count_sortmerge_joins(plan: str) -> int:
    return len(re.findall(r"\n\s*\(\d+\) SortMergeJoin\b", plan))


def window_input_columns(plan: str) -> list[set[str]]:
    """Column names entering each Window operator (from the formatted
    details' ``Input [n]: [...]`` line).  The W2 ranking window must see
    only narrow ranking columns — a robots blob here means every due row
    of a host drags the host's robots.txt through the hash shuffle."""
    out = []
    for m in re.finditer(r"\(\d+\) Window\nInput \[\d+\]: \[([^\]]*)\]", plan):
        cols = {c.strip().split("#")[0] for c in m.group(1).split(",") if c.strip()}
        out.append(cols)
    return out


def scan_columns(plan: str) -> list[set[str]]:
    """Column sets actually read from each parquet scan (pruning check)."""
    out = []
    for schema in read_schemas(plan):
        cols = {c.split(":")[0] for c in schema.split(",") if c}
        out.append(cols)
    return out
