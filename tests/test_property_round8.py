"""Hypothesis property tests for the round-8 operators: invariants over
ARBITRARY inputs (not just planted fixtures) for logistic-regression
training, int8/1-bit quantization, Kneser–Ney scoring, and the
incremental MinHash classifier."""

from __future__ import annotations

import math

from .conftest import prop_examples, full_tier
from hypothesis import given, settings
from hypothesis import strategies as st

_finite = st.floats(
    min_value=-5.0, max_value=5.0, allow_nan=False, allow_infinity=False
)

_feat_rows = st.lists(
    st.tuples(_finite, _finite, st.sampled_from([0.0, 1.0])),
    min_size=3,
    max_size=12,
)

_vecs = st.lists(
    st.lists(_finite, min_size=8, max_size=8),
    min_size=2,
    max_size=8,
)


@settings(max_examples=prop_examples(5), deadline=None)
@given(rows=_feat_rows)
def test_logreg_trajectory_matches_reference_any_frame(spark, rows):
    """The distributed trainer reproduces the pure-Python GD trajectory
    (same rounding discipline) on arbitrary feature frames."""
    from nyc_tlc_analytics_pipeline_spark.operators.train import logreg_train

    from .test_round8_ops import _reference_logreg

    df = spark.createDataFrame(rows, "f1 double, f2 double, y double")
    got = logreg_train(df, ["f1", "f2"], "y", iters=3, lr=1.0)
    ref = _reference_logreg(rows, iters=3, lr=1.0)
    for g, e in zip(got, ref):
        assert g["weights"][0] == round(g["weights"][0], 6)  # rounded state
        for a, b in zip(g["weights"], e["weights"]):
            assert abs(a - b) <= 2e-6
        assert abs(g["bias"] - e["bias"]) <= 2e-6
        assert abs(g["loss"] - e["loss"]) <= 2e-6


@settings(max_examples=prop_examples(5), deadline=None)
@given(vecs=_vecs)
def test_quantization_reconstruction_bound_any_vectors(spark, vecs):
    """For every component: |x − code·scale| ≤ scale/2 (+ nudge), codes
    within ±127 — on arbitrary float vectors including all-zero."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col, lit

    from nyc_tlc_analytics_pipeline_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    v = similarity.as_double_array("embedding")
    scale = F.greatest(F.array_max(F.transform(v, F.abs)) / lit(127.0), lit(1e-12))
    codes = similarity.quantize_codes("embedding")
    rows = df.select(
        F.array_max(F.transform(codes, F.abs)).alias("cmax"),
        (
            F.array_max(
                F.zip_with(v, codes, lambda x, c: F.abs(x - c.cast("double") * scale))
            )
            / scale
        ).alias("err"),
    ).collect()
    for r in rows:
        assert r.cmax <= 127
        assert r.err is None or r.err <= 0.5 + 1e-6


@settings(max_examples=prop_examples(5), deadline=None)
@given(vecs=_vecs)
def test_sign_code_hamming_equals_direct_bit_diff(spark, vecs):
    """hamming(codes(a), codes(b)) == #components where sign(a) differs
    from sign(b) — packing is lossless for the sign pattern."""
    from pyspark.sql.functions import col

    from nyc_tlc_analytics_pipeline_spark.operators import similarity

    dim = len(vecs[0])
    a, b = vecs[0], vecs[-1]
    expected = sum((x > 0) != (y > 0) for x, y in zip(a, b))
    pair = spark.createDataFrame([(a, b)], "va array<double>, vb array<double>")
    [r] = pair.select(
        similarity.hamming_words(
            similarity.sign_codes(col("va"), dim),
            similarity.sign_codes(col("vb"), dim),
        ).alias("h")
    ).collect()
    assert r.h == expected


_texts = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]), min_size=2, max_size=10
    ).map(" ".join),
    min_size=2,
    max_size=8,
)


@full_tier
@settings(max_examples=prop_examples(5), deadline=None)
@given(model=_texts, evals=_texts)
def test_kneser_ney_matches_reference_any_corpus(spark, model, evals):
    from nyc_tlc_analytics_pipeline_spark.operators import lm

    from .test_round8_ops import _kn_reference

    mdf = spark.createDataFrame([(t,) for t in model], "text string")
    edf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(evals)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_bigrams, r.n_unseen, r.log_ppl)
        for r in lm.kneser_ney_perplexity(edf, ["doc_id"], mdf).collect()
    }
    ref = _kn_reference(model, evals)
    assert len(got) == len(ref)
    for i, (nb, unseen, lp) in enumerate(ref):
        assert got[i][0] == nb and got[i][1] == unseen
        assert math.isclose(got[i][2], lp, abs_tol=1e-9)


@full_tier
@settings(max_examples=prop_examples(4), deadline=None)
@given(texts=_texts)
def test_incremental_classify_partitions_and_matches_full_pairs(spark, texts):
    """On any corpus: statuses partition the batch, and dup_vs_corpus
    equals the cross-population slice of the full-corpus pair set."""
    from pyspark.sql.functions import col

    from nyc_tlc_analytics_pipeline_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    batch = docs.filter(col("doc_id") % 2 == 0)
    standing = docs.filter(col("doc_id") % 2 == 1)
    st_rows = dedup.incremental_minhash_classify(
        batch, standing, "doc_id", "text", threshold=0.3
    ).collect()
    assert len(st_rows) == batch.count()
    batch_ids = {r.doc_id for r in batch.collect()}
    expected = set()
    for p in dedup.minhash_dedup_pairs(
        docs, "doc_id", "text", threshold=0.3
    ).collect():
        a_in, b_in = p.doc_a in batch_ids, p.doc_b in batch_ids
        if a_in != b_in:
            expected.add(p.doc_a if a_in else p.doc_b)
    got = {r.doc_id for r in st_rows if r.status == "dup_vs_corpus"}
    assert got == expected


_keys = st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40)


@settings(max_examples=prop_examples(5), deadline=None)
@given(ka=_keys, kb=_keys)
def test_cms_join_estimate_bounds_any_multisets(spark, ka, kb):
    """On ANY pair of key multisets: estimate ≥ true join size, and a
    collision-free-width sketch is exactly equal."""
    from collections import Counter

    from nyc_tlc_analytics_pipeline_spark.operators import sketch

    a = spark.createDataFrame([(k,) for k in ka], "k long")
    b = spark.createDataFrame([(k,) for k in kb], "k long")
    ca, cb = Counter(ka), Counter(kb)
    true_size = sum(ca[k] * cb[k] for k in ca)
    wide_a = sketch.cms_partials(a, "k", d=4, w=8192)
    wide_b = sketch.cms_partials(b, "k", d=4, w=8192)
    est_wide = sketch.cms_join_size(wide_a, wide_b).first()[0]
    narrow_a = sketch.cms_partials(a, "k", d=4, w=4)
    narrow_b = sketch.cms_partials(b, "k", d=4, w=4)
    est_narrow = sketch.cms_join_size(narrow_a, narrow_b).first()[0]
    if true_size == 0:
        # disjoint keys can still collide in a narrow sketch; the wide
        # sketch must report (near-)zero — allow only collision mass
        assert est_wide == 0
    else:
        assert est_wide == true_size
        assert est_narrow >= true_size
