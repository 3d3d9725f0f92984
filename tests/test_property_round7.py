"""Hypothesis property tests for the round-7 pair-source unification:
structural invariants that must hold on ANY corpus, not just the
planted fixture."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_corpus = st.lists(
    st.lists(
        st.sampled_from(["w%d" % i for i in range(20)]),
        min_size=4,
        max_size=30,
    ),
    min_size=4,
    max_size=20,
)


@settings(max_examples=5, deadline=None)
@given(corpus=_corpus)
def test_minhash_pairs_subset_of_exact_any_corpus(spark, corpus):
    """Both sources verify candidates with exact Jaccard, so MinHash
    mode must be a subset of exact mode with identical jaccard values
    on the shared pairs — on arbitrary corpora, not just planted dups."""
    from nyc_tlc_analytics_pipeline_spark.operators.dedup import near_dup_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mh = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in near_dup_pairs(df, "doc_id", "text", threshold=0.3).collect()
    }
    ex = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in near_dup_pairs(
            df, "doc_id", "text", threshold=0.3, pair_source="jaccard"
        ).collect()
    }
    assert set(mh) <= set(ex)
    for p, j in mh.items():
        assert j == ex[p]
    # identical pairs -> identical Jaccard >= 0.9 survivors (LSH recall
    # at 0.9 with 16/4 banding is ~0.992 per pair; structural subset
    # still holds regardless, which is what we assert)
    assert all(j >= 0.3 for j in mh.values())


@settings(max_examples=5, deadline=None)
@given(corpus=_corpus)
def test_threshold_curve_monotone_any_corpus(spark, corpus):
    """The savings curve is monotone non-increasing in the threshold in
    BOTH pair modes, and n_removable never exceeds n_pairs' doc span."""
    from nyc_tlc_analytics_pipeline_spark.operators.dedup import (
        dedup_threshold_curve,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ts = (0.3, 0.6, 0.9)
    for mode in ("minhash", "jaccard"):
        got = {
            r.threshold: r
            for r in dedup_threshold_curve(
                df, "doc_id", "text", ts, pair_source=mode
            ).collect()
        }
        assert set(got) == set(ts)
        for lo, hi in zip(ts, ts[1:]):
            assert got[hi].n_pairs <= got[lo].n_pairs
            assert got[hi].n_removable <= got[lo].n_removable
        for r in got.values():
            assert r.n_removable <= r.n_pairs or r.n_pairs == 0
