"""Unit tests for the round-3 additions: n-gram heavy hitters,
incremental partial-aggregate merge, and prefix-blocked edit-distance
near-dup (parity with the DuckDB oracles is covered separately by
test_catalog_parity; these pin the operator semantics on handcrafted
data, including the documented recall boundaries)."""

from __future__ import annotations

import pytest

from nyc_tlc_analytics_pipeline_spark.operators import dedup, incremental, text


def test_ngram_heavy_hitters_counts_and_docfreq(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),     # "a b" ×3, "b a" ×2
            (2, "a b c"),          # "a b", "b c"
            (3, "zz"),             # too short for a bigram
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.ngram: (r.occurrences, r.doc_freq)
        for r in text.ngram_heavy_hitters(df, "doc_id", "text", n=2, k=10).collect()
    }
    assert rows["a b"] == (4, 2)
    assert rows["b a"] == (2, 1)
    assert rows["b c"] == (1, 1)
    assert "zz" not in rows


def test_word_ngrams_short_doc_is_empty(spark):
    df = spark.createDataFrame([("one",), ("one two",)], ["text"])
    sizes = [
        r[0]
        for r in df.select(
            text.word_ngrams("text", n=2).cast("array<string>").alias("g")
        ).selectExpr("size(g)").collect()
    ]
    assert sizes == [0, 1]


def test_merge_partials_is_associative(spark):
    rows = [("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0), ("a", 4, 40.0)]
    df = spark.createDataFrame(rows, ["k", "n", "v"])
    spec = {"n": "count", "v": "sum"}

    def agg(d):
        return incremental.merge_partials([d], ["k"], spec)

    p1 = agg(df.limit(0).union(df.where("n <= 1")))
    p2 = agg(df.where("n in (2, 3)"))
    p3 = agg(df.where("n = 4"))
    left = incremental.merge_partials(
        [incremental.merge_partials([p1, p2], ["k"], spec), p3], ["k"], spec
    )
    right = incremental.merge_partials(
        [p1, incremental.merge_partials([p2, p3], ["k"], spec)], ["k"], spec
    )
    full = agg(df)
    as_set = lambda d: {tuple(r) for r in d.collect()}  # noqa: E731
    assert as_set(left) == as_set(right) == as_set(full)


def test_merge_partials_rejects_holistic_kinds(spark):
    df = spark.createDataFrame([("a", 1.0)], ["k", "v"])
    with pytest.raises(ValueError, match="non-mergeable"):
        incremental.merge_partials([df], ["k"], {"v": "median"})


def test_edit_distance_pairs_planted(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("dog", "cat")),       # dist 3, same prefix
            (3, base.upper()),                     # dist 0 after normalization
            (4, "totally different text that shares no prefix with base"),
            (5, "xx " + base),                     # edit inside the block: missed
        ],
        ["doc_id", "text"],
    )
    got = {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in dedup.edit_distance_pairs(
            df, "doc_id", "text", max_dist=8, prefix_len=16
        ).collect()
    }
    assert got[(1, 3)] == 0
    assert got[(1, 2)] == 3
    assert got[(2, 3)] == 3
    # documented recall boundary: a prefix edit moves doc 5 out of the block
    assert not any(5 in pair for pair in got)
    assert not any(4 in pair for pair in got)
