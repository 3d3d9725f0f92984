"""Hypothesis property tests for the round-9 quantile sketch:
invariants over ARBITRARY inputs — merge == whole under any shard
split, rank-accuracy bound, and bucket parity against an independent
pure-Python integer restatement.  (RRF's fusion algebra is pinned by
the deterministic unit test in test_round9_ops — its inputs are rank
lists, which hypothesis would only re-derive from the same code.)"""

from __future__ import annotations

import math

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


@settings(max_examples=8, deadline=None)
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


@settings(max_examples=8, deadline=None)
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


@settings(max_examples=6, deadline=None)
@given(vals=_vals)
def test_qhist_quantile_within_relative_bound(spark, vals):
    """Every estimated quantile lands within one bucket width of the
    exact interpolated percentile: |est − exact| ≤ 2^-s·|exact| +
    10^-precision (the dyadic layout's worst case) for arbitrary
    inputs."""
    import numpy as np

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    p = sketch.qhist_partials(df, "v", [])
    qs = [0.1, 0.5, 0.9]
    est = {r.q: r.q_est for r in sketch.qhist_quantiles(p, [], qs).collect()}
    for q in qs:
        exact = float(np.quantile(sorted(vals), q, method="linear"))
        tol = abs(exact) * 2.0 ** -sketch.QHIST_SUBBITS + 0.02
        assert abs(est[q] - exact) <= tol, (q, est[q], exact)
