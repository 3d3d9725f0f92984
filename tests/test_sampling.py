"""Deterministic hash sampling: reproducibility under repartitioning,
rate accuracy, split disjointness/stability, stratified exactness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_tlc_analytics_pipeline_spark.operators import sampling


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("lang_id"),
    )


def test_bernoulli_rate_and_determinism(spark, corpus):
    kept = sampling.bernoulli_sample(corpus, "doc_id", 0.2, salt="s1")
    n = kept.count()
    assert 0.17 * 10_000 < n < 0.23 * 10_000  # ±3σ-ish of Binomial(10k, .2)
    # identical selection regardless of physical layout
    ids1 = {r.doc_id for r in kept.collect()}
    ids2 = {
        r.doc_id
        for r in sampling.bernoulli_sample(
            corpus.repartition(17), "doc_id", 0.2, salt="s1"
        ).collect()
    }
    assert ids1 == ids2
    # different salt → different (decorrelated) sample
    ids3 = {
        r.doc_id
        for r in sampling.bernoulli_sample(corpus, "doc_id", 0.2, salt="s2").collect()
    }
    assert ids1 != ids3


def test_bernoulli_rate_validation(corpus):
    with pytest.raises(ValueError, match="rate"):
        sampling.bernoulli_sample(corpus, "doc_id", 1.5)


def test_split_disjoint_exhaustive_and_stable(spark, corpus):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    split = sampling.assign_split(corpus, "doc_id", w)
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 10_000  # exhaustive
    assert 0.77 < counts["train"] / 10_000 < 0.83
    assert 0.08 < counts["val"] / 10_000 < 0.12
    # growth stability: assignments over a subset are identical to the
    # same rows' assignments over the full corpus
    sub = sampling.assign_split(corpus.filter("doc_id < 1000"), "doc_id", w)
    full = {r.doc_id: r.split for r in split.filter("doc_id < 1000").collect()}
    assert {r.doc_id: r.split for r in sub.collect()} == full


def test_split_weights_validation(corpus):
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.assign_split(corpus, "doc_id", {"a": 0.5, "b": 0.4})


def test_stratified_exact_n_per_group(spark, corpus):
    out = sampling.stratified_sample_exact(corpus, ["lang_id"], 25, "doc_id")
    counts = {r.lang_id: r.n for r in out.groupBy("lang_id").agg(F.count("*").alias("n")).collect()}
    assert counts == {i: 25 for i in range(7)}
    # deterministic across layouts
    a = {r.doc_id for r in out.collect()}
    b = {
        r.doc_id
        for r in sampling.stratified_sample_exact(
            corpus.repartition(13), ["lang_id"], 25, "doc_id"
        ).collect()
    }
    assert a == b


def test_stratified_small_group_returns_whole_group(spark):
    tiny = spark.range(3).select(F.col("id").alias("doc_id"), F.lit(0).alias("g"))
    assert sampling.stratified_sample_exact(tiny, ["g"], 10, "doc_id").count() == 3


def test_consistent_sampling_across_tables(spark, corpus):
    """Sampling two tables by the same key keeps them aligned: every
    sampled user keeps all their rows in both tables."""
    events = spark.range(30_000).select(
        (F.col("id") % 10_000).alias("user_id"), F.col("id").alias("event_id")
    )
    users_kept = {
        r.doc_id
        for r in sampling.bernoulli_sample(corpus, "doc_id", 0.1, "u").collect()
    }
    ev_kept = sampling.bernoulli_sample(events, "user_id", 0.1, "u")
    assert {r.user_id for r in ev_kept.collect()} <= users_kept
    # and nothing partially sampled: each kept user keeps all 3 events
    per_user = ev_kept.groupBy("user_id").count().filter("count <> 3").count()
    assert per_user == 0
