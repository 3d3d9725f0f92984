"""Round-7 operator tests: the unified pluggable pair source
(dedup.near_dup_pairs) and the production compositions that default to
MinHash-LSH — mode-equivalence between the exact (oracle-gated) and
MinHash (100 TB default) pair modes, per VERDICT r6 item 1."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from nyc_tlc_analytics_pipeline_spark.operators import (
    curation,
    dedup,
    sampling,
    similarity,
    text,
)
from nyc_tlc_analytics_pipeline_spark.sources.testdata import load_table

from .conftest import SF_SMOKE

_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").cache()


@pytest.fixture(scope="module")
def exact_pairs(docs):
    return {
        (r.doc_a, r.doc_b): round(r.jaccard, 6)
        for r in dedup.near_dup_pairs(
            docs, "doc_id", "text", pair_source="jaccard"
        ).collect()
    }


@pytest.fixture(scope="module")
def minhash_pairs(docs):
    return {
        (r.doc_a, r.doc_b): round(r.jaccard, 6)
        for r in dedup.near_dup_pairs(docs, "doc_id", "text").collect()
    }


def test_near_dup_pairs_minhash_subset_of_exact(exact_pairs, minhash_pairs):
    """Both modes verify candidates with exact Jaccard, so MinHash mode
    is a strict SUBSET of exact mode at the same threshold, with
    identical jaccard values on the shared pairs."""
    assert set(minhash_pairs) <= set(exact_pairs)
    for p, j in minhash_pairs.items():
        assert j == exact_pairs[p]
    # and the fixture actually exercises both modes non-trivially
    assert len(minhash_pairs) >= 5


def test_near_dup_pairs_passthrough_and_bad_source(spark, docs):
    pre = spark.createDataFrame([(1, 2, 0.9)], "doc_a long, doc_b long, jaccard double")
    out = dedup.near_dup_pairs(docs, "doc_id", "text", pairs=pre)
    assert out is pre  # explicit pairs= overrides everything
    with pytest.raises(ValueError, match="pair_source"):
        dedup.near_dup_pairs(docs, "doc_id", "text", pair_source="nope")


def test_canonical_dedup_minhash_default_refines_exact(docs):
    """MinHash pairs ⊆ exact pairs ⇒ MinHash clusters REFINE exact
    clusters ⇒ keep-best retains at least as many docs; on the planted
    ≥0.9 near-dup families (where LSH recall is 1.0) both modes must
    agree on every non-singleton cluster's survivor set."""
    scored = docs.select(
        "doc_id", "text", text.token_count("text").alias("n_tokens")
    )
    ex = dedup.canonical_dedup(
        scored, "doc_id", "text", "n_tokens", pair_source="jaccard"
    ).cache()
    mh = dedup.canonical_dedup(scored, "doc_id", "text", "n_tokens").cache()
    n_docs = docs.count()
    assert ex.count() == n_docs and mh.count() == n_docs
    kept_ex = ex.filter(col("keep")).count()
    kept_mh = mh.filter(col("keep")).count()
    assert kept_ex <= kept_mh  # fewer pairs -> more clusters -> more kept
    # identical downstream on the SHARED pair set: feeding the minhash
    # frame through pairs= must equal pair_source="minhash" exactly
    p = dedup.near_dup_pairs(docs, "doc_id", "text").select("doc_a", "doc_b")
    via_pairs = dedup.canonical_dedup(
        scored, "doc_id", "text", "n_tokens", pairs=p
    )
    assert sorted(map(tuple, via_pairs.collect())) == sorted(
        map(tuple, mh.collect())
    )


def test_threshold_curve_modes_are_ordered(docs):
    """Per threshold, MinHash-mode pair counts can never exceed exact
    mode's (subset property), and both curves are monotone decreasing
    in the threshold."""
    ts = (0.3, 0.5, 0.7, 0.9)
    ex = {
        r.threshold: (r.n_pairs, r.n_removable)
        for r in dedup.dedup_threshold_curve(
            docs, "doc_id", "text", ts, pair_source="jaccard"
        ).collect()
    }
    mh = {
        r.threshold: (r.n_pairs, r.n_removable)
        for r in dedup.dedup_threshold_curve(docs, "doc_id", "text", ts).collect()
    }
    assert set(ex) == set(mh) == set(ts)
    for t in ts:
        assert mh[t][0] <= ex[t][0]
        assert mh[t][1] <= ex[t][1]
    for lo, hi in zip(sorted(ts), sorted(ts)[1:]):
        assert ex[hi][0] <= ex[lo][0]
        assert mh[hi][0] <= mh[lo][0]


def test_counterfactual_leakage_cluster_mode_is_leak_free(docs):
    """The defining invariant holds in BOTH pair modes: the cluster-keyed
    split lets zero near-dup pairs straddle splits, while the naive
    per-doc hash split leaks (this corpus plants near-dups)."""
    for mode in ("minhash", "jaccard"):
        rows = {
            r.mode: r
            for r in sampling.counterfactual_leakage_report(
                docs.select("doc_id", "text"), "doc_id", "text",
                _WEIGHTS, salt="s", pair_source=mode,
            ).collect()
        }
        assert rows["cluster"].n_straddling == 0
        assert rows["cluster"].n_leaked_docs == 0
        assert rows["cluster"].n_pairs == rows["naive"].n_pairs
        assert rows["naive"].n_straddling >= 0


def test_funnel_attribution_partitions_corpus(docs):
    """Every document lands in exactly one stage in both modes; the
    stage sets obey the refinement direction (minhash finds ⊆ exact's
    duplicates, so its 'duplicate' count can't exceed exact's)."""
    n_docs = docs.count()
    counts = {}
    for mode in ("minhash", "jaccard"):
        attr = curation.funnel_attribution(
            docs, 3.41, pair_source=mode, threshold=0.5
        )
        by_stage = {
            r.stage: r.c
            for r in attr.groupBy("stage").agg(F.count("*").alias("c")).collect()
        }
        assert sum(by_stage.values()) == n_docs
        counts[mode] = by_stage
    assert counts["minhash"].get("duplicate", 0) <= counts["jaccard"].get(
        "duplicate", 0
    )
    # rules/perplexity stages are pair-source-independent
    for stage in ("rules", "perplexity"):
        assert counts["minhash"].get(stage, 0) == counts["jaccard"].get(stage, 0)


def test_hashed_cosine_calibration_modes(docs):
    """The calibration curve exists in both modes; MinHash-mode buckets
    are a subset with never-larger pair counts, and planted near-dups
    give the top bucket a high mean hashed cosine in both."""
    ex = {
        r.jacc_bucket: r
        for r in similarity.hashed_cosine_calibration(
            docs, "doc_id", "text", dim=64, pair_source="jaccard",
            threshold=0.05,
        ).collect()
    }
    mh = {
        r.jacc_bucket: r
        for r in similarity.hashed_cosine_calibration(
            docs, "doc_id", "text", dim=64, threshold=0.05
        ).collect()
    }
    assert set(mh) <= set(ex)
    for b, r in mh.items():
        assert r.n_pairs <= ex[b].n_pairs
    top = max(mh)
    assert top >= 0.8 and mh[top].avg_hashed_cosine > 0.8
