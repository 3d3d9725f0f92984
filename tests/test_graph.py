"""Connected components / dedup clustering (operators.graph).

Differential model: a driver-side union-find over the same edge list —
the textbook-correct answer at test scale, compared exactly."""

import random

import pytest
from pyspark.sql import functions as F

from nyc_tlc_analytics_pipeline_spark.operators import dedup, graph


def union_find_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def assert_matches_union_find(spark, edges):
    nodes = sorted({n for e in edges for n in e})
    expected = union_find_components(edges, nodes)
    df = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
    got = {
        (r.node, r.component)
        for r in graph.connected_components(df).collect()
    }
    assert got == set(expected.items())


def test_two_separate_clusters(spark):
    assert_matches_union_find(spark, [(1, 2), (2, 3), (10, 11)])


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(40 + 20 * trial)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        assert_matches_union_find(spark, edges)


def test_long_chain_converges_in_log_rounds(spark):
    """A 200-node path graph is the worst case for min-label propagation
    (diameter 199 → 199 rounds); large-star/small-star must still finish
    inside the default 25-round cap and produce ONE component."""
    edges = [(i, i + 1) for i in range(199)]
    df = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
    cc = graph.connected_components(df).collect()
    assert len(cc) == 200
    assert {r.component for r in cc} == {0}


def test_self_loops_and_duplicate_edges_ignored(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2)]
    df = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
    got = {(r.node, r.component) for r in graph.connected_components(df).collect()}
    assert got == {(1, 1), (2, 1)}


def test_no_convergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "doc_a: long, doc_b: long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        graph.connected_components(df, max_iter=0)


def test_cluster_assignments_cover_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id: long")
    pairs = spark.createDataFrame([(0, 3), (3, 5), (6, 7)], "doc_a: long, doc_b: long")
    rows = {
        r.doc_id: (r.cluster_id, r.cluster_size, r.is_canonical)
        for r in graph.cluster_assignments(docs, pairs, "doc_id").collect()
    }
    assert rows == {
        0: (0, 3, True),
        3: (0, 3, False),
        5: (0, 3, False),
        6: (6, 2, True),
        7: (6, 2, False),
        1: (1, 1, True),
        2: (2, 1, True),
        4: (4, 1, True),
    }


def test_end_to_end_jaccard_clusters(spark):
    """Pairs from the real jaccard operator → clusters: three copies of
    one text and two of another collapse into two multi-doc clusters."""
    texts = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog yesterday"),
        (3, "completely different text about spark shuffle behavior here"),
        (4, "completely different text about spark shuffle behavior here"),
        (5, "nothing like the others at all in any way whatsoever"),
    ]
    docs = spark.createDataFrame(texts, "doc_id: long, text: string")
    pairs = dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    out = graph.cluster_assignments(docs, pairs, "doc_id")
    by_cluster = {
        r.cluster_id: r.cluster_size
        for r in out.select("cluster_id", "cluster_size").distinct().collect()
    }
    assert by_cluster == {0: 3, 3: 2, 5: 1}
    canon = {r.doc_id for r in out.filter(F.col("is_canonical")).collect()}
    assert canon == {0, 3, 5}


def test_label_propagation_two_cliques(spark):
    from nyc_tlc_analytics_pipeline_spark.operators.graph import (
        label_propagation,
    )

    # two triangles bridged by one weak edge: heavy intra-clique weights
    # pull each triangle to one community; the weak bridge cannot flip it
    edges = spark.createDataFrame(
        [
            ("a", "b", 10), ("b", "c", 10), ("a", "c", 10),
            ("x", "y", 10), ("y", "z", 10), ("x", "z", 10),
            ("c", "x", 1),
        ],
        "src string, dst string, w long",
    )
    got = {r.node: r.label for r in label_propagation(edges, iters=4).collect()}
    assert got["a"] == got["b"] == got["c"]
    assert got["x"] == got["y"] == got["z"]
    assert got["a"] != got["x"]


def test_label_propagation_tie_breaks_to_smallest_label(spark):
    from nyc_tlc_analytics_pipeline_spark.operators.graph import (
        label_propagation,
    )

    # m's two neighbors carry equal weight after sweep 1's input state
    # (initial labels = node names), so m's adoption is a pure tie:
    # {n: 5, a: 5} must resolve to the SMALLEST label deterministically
    edges = spark.createDataFrame(
        [("m", "n", 5), ("m", "a", 5)],
        "src string, dst string, w long",
    )
    got = {r.node: r.label for r in label_propagation(edges, iters=1).collect()}
    assert got["m"] == "a"
    # n and a each see only m
    assert got["n"] == "m" and got["a"] == "m"
