"""Hypothesis property tests for the round-5 operators.

Each property batches the generated case into ONE DataFrame/action
(Spark jobs per example are expensive — same trick as the other
property suites)."""

from __future__ import annotations

from .conftest import prop_examples
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from nyc_tlc_analytics_pipeline_spark.operators import sketch, text


docs = st.lists(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3),
        min_size=0,
        max_size=120,
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=prop_examples(10), deadline=None)
@given(corpus=docs, stride=st.integers(min_value=1, max_value=64))
def test_chunk_starts_cover_every_token_position(spark, corpus, stride):
    """Every token index lands in at least one [start, start+stride)
    window — chunking at window ≥ stride never drops text.  Also: the
    start set equals range(0, max(n,1), stride) exactly."""
    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.starts, r.n)
        for r in df.select(
            "doc_id",
            text.chunk_starts(text.tokens("text"), stride).alias("starts"),
            F.size(text.tokens("text")).alias("n"),
        ).collect()
    }
    for i, _ in enumerate(corpus):
        starts, n = got[i]
        assert starts == list(range(0, max(n, 1), stride))
        covered = set()
        for s in starts:
            covered.update(range(s, min(s + stride, n)))
        assert covered == set(range(n))


@settings(max_examples=prop_examples(8), deadline=None)
@given(
    members=st.sets(
        st.text(alphabet="xyz01", min_size=1, max_size=6), min_size=1, max_size=60
    ),
    probes=st.sets(
        st.text(alphabet="xyz01", min_size=1, max_size=6), min_size=1, max_size=60
    ),
)
def test_bloom_has_no_false_negatives_ever(spark, members, probes):
    """Structural guarantee: every true member's k positions are set, so
    membership probes never miss — on ANY key set."""
    mdf = spark.createDataFrame([(m,) for m in members], ["g"])
    pdf = spark.createDataFrame([(p,) for p in probes], ["g"])
    bloom = sketch.bloom_build(mdf, "g", m=256, k=3)
    tagged = {
        r.g: r.bloom_hit
        for r in sketch.bloom_probe(pdf, bloom, "g", m=256, k=3).collect()
    }
    for p in probes & members:
        assert tagged[p] is True


@settings(max_examples=prop_examples(8), deadline=None)
@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=3,
        max_size=200,
    )
)
def test_winsorized_mean_lies_within_cutpoints(spark, values):
    """Clipping at (p05, p95) bounds the mean by the cutpoints and never
    widens the range — the defining property of winsorization."""
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    cuts = df.agg(
        F.percentile("x", lit(0.05)).alias("lo"),
        F.percentile("x", lit(0.95)).alias("hi"),
    )
    r = (
        df.crossJoin(cuts)
        .select(
            F.avg(F.least(F.greatest(col("x"), col("lo")), col("hi"))).alias("m"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
        )
        .collect()[0]
    )
    assert r.lo - 1e-9 <= r.m <= r.hi + 1e-9


@settings(max_examples=prop_examples(6), deadline=None)
@given(
    corpus=st.lists(
        st.lists(
            st.sampled_from(["w%d" % i for i in range(25)]),
            min_size=4,
            max_size=40,
        ),
        min_size=4,
        max_size=25,
    )
)
def test_containment_dominates_jaccard_on_shared_pairs(spark, corpus):
    """Structural: containment = c/min(a,b) ≥ c/(a+b−c) = Jaccard for
    every pair — so a containment threshold can only ADD pairs relative
    to the same Jaccard threshold, never lose one (why it's the
    quote-inclusion measure)."""
    from nyc_tlc_analytics_pipeline_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    thr = 0.4
    cont = {
        (r.doc_a, r.doc_b)
        for r in containment_pairs(df, "doc_id", "text", threshold=thr).collect()
    }
    jac = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(
            df, "doc_id", "text", threshold=thr, prefix_filter=False
        ).collect()
    }
    assert jac <= cont
