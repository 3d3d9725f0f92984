"""Hypothesis property tests for the round-4 operators.

Each property batches the generated case into ONE DataFrame/action
(Spark jobs per example are expensive — same trick as the other
property suites)."""

from __future__ import annotations

from collections import Counter

from .conftest import prop_examples
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from nyc_tlc_analytics_pipeline_spark.operators import profile, sampling, sketch


token_corpus = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4),
    min_size=1,
    max_size=300,
)


@settings(max_examples=prop_examples(10), deadline=None)
@given(corpus=token_corpus)
def test_cms_upper_bounds_every_count(spark, corpus):
    """CMS estimate ≥ exact count for EVERY key, on any corpus — the
    one-sided error guarantee is structural, not probabilistic."""
    df = spark.createDataFrame([(t,) for t in corpus], ["token"])
    partials = sketch.cms_partials(df, "token", d=3, w=32)
    exact = Counter(corpus)
    probes = spark.createDataFrame(
        [(t,) for t in exact], ["token"]
    )
    got = {
        r.token: r.cms_count
        for r in sketch.cms_estimate(partials, probes, "token", d=3, w=32).collect()
    }
    for t, n in exact.items():
        assert got[t] >= n, (t, n, got[t])
    # total sketch mass per row equals the corpus size (additivity)
    per_row = {
        r.row_i: r.s
        for r in partials.groupBy("row_i").agg(F.sum("cnt").alias("s")).collect()
    }
    assert set(per_row.values()) == {len(corpus)}


weights_strategy = st.lists(
    st.integers(min_value=1, max_value=1000), min_size=1, max_size=120
)


@settings(max_examples=prop_examples(10), deadline=None)
@given(weights=weights_strategy, k=st.integers(min_value=1, max_value=30))
def test_weighted_sample_size_and_membership(spark, weights, k):
    """|sample| = min(k, n); rows come from the input; repartitioning
    never changes the selection (determinism under layout)."""
    df = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate(weights)], ["id", "w"]
    )
    out = sampling.weighted_sample(df, "id", "w", k=k).collect()
    ids = [r.id for r in out]
    assert len(ids) == min(k, len(weights))
    assert set(ids) <= set(range(len(weights)))
    again = [
        r.id
        for r in sampling.weighted_sample(df.repartition(7), "id", "w", k=k).collect()
    ]
    assert ids == again


profile_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
        st.one_of(st.none(), st.text(alphabet="xyz", min_size=0, max_size=3)),
    ),
    min_size=1,
    max_size=100,
)


@settings(max_examples=prop_examples(10), deadline=None)
@given(rows=profile_rows)
def test_profile_matches_python_reference(spark, rows):
    df = spark.createDataFrame(rows, "a int, s string")
    out = {r.column_name: r for r in profile.profile_columns(df).collect()}
    a_vals = [r[0] for r in rows]
    s_vals = [r[1] for r in rows]
    for name, vals in (("a", a_vals), ("s", s_vals)):
        non_null = [v for v in vals if v is not None]
        assert out[name].n_rows == len(rows)
        assert out[name].n_nulls == vals.count(None)
        assert out[name].n_distinct == len(set(non_null))
        if non_null:
            assert out[name].min_value == str(min(non_null))
            assert out[name].max_value == str(max(non_null))
        else:
            assert out[name].min_value is None and out[name].max_value is None
