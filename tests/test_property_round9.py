"""Hypothesis property tests for the round-9 quantile sketch:
invariants over ARBITRARY inputs — merge == whole under any shard
split, rank-accuracy bound, and bucket parity against an independent
pure-Python integer restatement.  (RRF's fusion algebra is pinned by
the deterministic unit test in test_round9_ops — its inputs are rank
lists, which hypothesis would only re-derive from the same code.)"""

from __future__ import annotations

import math

from .conftest import prop_examples
from hypothesis import given, settings
from hypothesis import strategies as st

from nyc_tlc_analytics_pipeline_spark.operators import sketch

_vals = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=4,
    max_size=60,
)


def _py_bucket(value: float, precision: int = 2, s: int = sketch.QHIST_SUBBITS) -> int:
    """Pure-Python twin of qhist_partials' bucket rule — the integer
    arithmetic restated independently (bit_length instead of bin())."""
    v = math.floor(value * 10**precision + 0.5 + 1e-9)
    a = abs(v)
    e = max(a.bit_length(), 1)  # bin(0) == '0' → length 1
    w = 1 << max(e - 1 - s, 0)
    lo = a - (a % w)
    return -lo if v < 0 else lo


@settings(max_examples=prop_examples(8), deadline=None)
@given(vals=_vals)
def test_qhist_bucket_rule_matches_python_twin(spark, vals):
    """Every Spark-computed bucket equals the independent integer
    restatement — bin/length/pow-cast == bit_length/shift, including
    negatives, zero, and near-zero values."""
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        (r.bucket, r.cnt)
        for r in sketch.qhist_partials(df, "v", []).collect()
    }
    from collections import Counter

    ref = Counter(_py_bucket(v) for v in vals)
    assert got == set(ref.items())


@settings(max_examples=prop_examples(8), deadline=None)
@given(vals=_vals, pivot=st.floats(min_value=-1e5, max_value=1e5))
def test_qhist_merge_equals_whole_any_split(spark, vals, pivot):
    """Sum-merging the partials of ANY two-way split equals the
    whole-data partials exactly — the mergeable-statistic closure law
    under arbitrary shard boundaries."""
    from pyspark.sql.functions import col

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    whole = sorted(map(tuple, sketch.qhist_partials(df, "v", []).collect()))
    a = sketch.qhist_partials(df.filter(col("v") <= pivot), "v", [])
    b = sketch.qhist_partials(df.filter(col("v") > pivot), "v", [])
    merged = sorted(
        map(tuple, sketch.qhist_merge(a.unionByName(b), []).collect())
    )
    assert merged == whole


@settings(max_examples=prop_examples(6), deadline=None)
@given(vals=_vals)
def test_qhist_quantile_within_one_bucket_of_order_statistic(spark, vals):
    """The sketch's ACTUAL guarantee, asserted for arbitrary inputs:
    the estimate lies within one dyadic bucket of the ⌈q·n⌉-th order
    statistic — the value the mass-based cumulative walk targets.
    (PERCENTILE_CONT's rank interpolation is a different CONVENTION:
    at tiny n with extreme gaps the two legitimately differ by an
    O(gap/n) term — hypothesis found vals=[0,0,0,1], q=0.9 where
    exact_cont = 0.7 but the mass walk correctly lands in the bucket
    holding the 4th value — so the convention gap is excluded here
    and covered for large n by the accuracy test in test_round9_ops,
    where the conventions converge.)"""
    import math as m

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    p = sketch.qhist_partials(df, "v", [])
    qs = [0.1, 0.5, 0.9]
    est = {r.q: r.q_est for r in sketch.qhist_quantiles(p, [], qs).collect()}
    ordered = sorted(vals)
    n = len(ordered)
    for q in qs:
        v_star = ordered[min(max(m.ceil(q * n) - 1, 0), n - 1)]
        tol = (
            max(abs(v_star), abs(est[q])) * 2.0 ** -sketch.QHIST_SUBBITS
            + 2 * 10.0**-2  # 2 resolution ticks at precision=2
            + 1e-9
        )
        assert abs(est[q] - v_star) <= tol, (q, est[q], v_star)
