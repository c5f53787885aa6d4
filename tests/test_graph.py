"""Connected-components dedup clustering (extras/graph.py).

Truth oracle: a plain-Python union-find over the same edge list — the
algorithm-independent definition of the transitive closure.
"""

import random

from pyspark.sql import functions as F

from chronicrawl_spark.extras.graph import connected_components, dedup_clusters


def _uf_components(edges, nodes=None):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for n in set([x for e in edges for x in e]) | set(nodes or []):
        out[n] = find(n)
    return out


def _run_cc(spark, edges, local_threshold=200_000):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, local_threshold=local_threshold).collect()
    }
    return got


def test_cc_hand_graph(spark):
    edges = [(1, 2), (2, 3), (5, 6)]
    got = _run_cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_cc_path_graph_log_rounds(spark):
    # a 64-node path is the worst case for plain label propagation
    # (diameter 63); large-star/small-star must still converge inside
    # the max_iter=50 budget — and does, in O(log n) rounds
    edges = [(i, i + 1) for i in range(63)]
    got = _run_cc(spark, edges, local_threshold=0)
    assert set(got.values()) == {0}
    assert len(got) == 64


def test_cc_max_iter_exhaustion_observable(spark):
    # a path graph can't reach a fixed point in one star round; the
    # non-converged exit must SIGNAL (warning by default, raise in strict
    # mode), never silently return a split assignment
    import pytest

    from chronicrawl_spark.extras.graph import ComponentsNotConverged

    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.warns(RuntimeWarning, match="no fixed point"):
        connected_components(df, max_iter=1, local_threshold=0).collect()
    with pytest.raises(ComponentsNotConverged):
        connected_components(df, max_iter=1, local_threshold=0, strict=True)


def test_cc_matches_union_find_random(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    want = _uf_components(edges)
    # distributed star loop (local_threshold=0) and driver fast path must
    # both match the union-find truth — and therefore each other
    assert _run_cc(spark, edges, local_threshold=0) == want
    assert _run_cc(spark, edges) == want


def test_cc_duplicate_and_reversed_edges(spark):
    edges = [(2, 1), (1, 2), (2, 1), (3, 2), (9, 8)]
    got = _run_cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 8: 8, 9: 8}


def test_dedup_clusters_representatives(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (6, 7)], "doc_a long, doc_b long"
    )
    rows = {r["doc_id"]: (r["cluster_id"], r["is_rep"]) for r in dedup_clusters(docs, pairs).collect()}
    assert rows == {
        0: (0, 1), 3: (0, 0), 5: (0, 0),
        6: (6, 1), 7: (6, 0),
        1: (1, 1), 2: (2, 1), 4: (4, 1),
    }
    # the deduplicated corpus = one representative per cluster
    kept = sorted(k for k, (_c, rep) in rows.items() if rep)
    assert kept == [0, 1, 2, 4, 6]


def test_cc_empty_pairs(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    rows = {r["doc_id"]: (r["cluster_id"], r["is_rep"]) for r in dedup_clusters(docs, pairs).collect()}
    assert rows == {1: (1, 1), 2: (2, 1)}


def test_incremental_matches_batch(spark):
    from chronicrawl_spark.extras.graph import incremental_components

    rng = random.Random(7)
    old_nodes = list(range(100))
    # new ids interleave BELOW and above old ids (hash ids aren't
    # monotonic in a crawl) — the min-id invariant must still hold
    new_nodes = [-5, -2] + list(range(100, 140))
    p1 = [(rng.choice(old_nodes), rng.choice(old_nodes)) for _ in range(60)]
    p2 = (
        [(rng.choice(new_nodes), rng.choice(new_nodes)) for _ in range(25)]
        + [(rng.choice(new_nodes), rng.choice(old_nodes)) for _ in range(25)]
        + [(rng.choice(old_nodes), rng.choice(old_nodes)) for _ in range(5)]  # late old-old edges
    )
    p1 = [(a, b) for a, b in p1 if a != b]
    p2 = [(a, b) for a, b in p2 if a != b]

    df1 = spark.createDataFrame(p1, "doc_a long, doc_b long")
    df2 = spark.createDataFrame(p2, "doc_a long, doc_b long")
    both = spark.createDataFrame(p1 + p2, "doc_a long, doc_b long")

    base = connected_components(df1)
    inc = {
        r["node"]: r["component"]
        for r in incremental_components(base, df2).collect()
    }
    batch = {
        r["node"]: r["component"] for r in connected_components(both).collect()
    }
    # every node of the union graph, identically labelled
    assert inc == batch


def test_incremental_merges_two_clusters(spark):
    from chronicrawl_spark.extras.graph import incremental_components

    base = connected_components(
        spark.createDataFrame([(1, 2), (10, 11)], "doc_a long, doc_b long")
    )
    # new doc 50 bridges both clusters
    inc = {
        r["node"]: r["component"]
        for r in incremental_components(
            base, spark.createDataFrame([(50, 2), (50, 11)], "doc_a long, doc_b long")
        ).collect()
    }
    assert inc == {1: 1, 2: 1, 10: 1, 11: 1, 50: 1}
