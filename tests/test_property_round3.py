"""Hypothesis property tests for the round-3 curation operators.

Spark jobs per example are expensive, so each property batches many
generated cases into ONE DataFrame/action (the same trick as
test_property_parity.py)."""

from __future__ import annotations

from .conftest import prop_examples
from hypothesis import given, settings, strategies as st

from nyc_tlc_analytics_pipeline_spark.operators import packing, redact, sketch


# -- greedy packing == driver-side reference, any sizes/budget ------------

sizes_strategy = st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=60)


@settings(max_examples=prop_examples(15), deadline=None)
@given(sizes=sizes_strategy, budget=st.integers(min_value=8, max_value=300))
def test_pack_greedy_property(spark, sizes, budget):
    df = spark.createDataFrame(
        [("s", i, n) for i, n in enumerate(sizes)], "stream string, ord long, n long"
    )
    got = sorted(
        (
            (r["ord"], r["pack_id"], r["pack_fill"])
            for r in packing.pack_greedy(df, "stream", "ord", "n", budget).collect()
        )
    )
    expect = [
        (i, p, f)
        for i, (p, f) in enumerate(packing.greedy_pack_reference(sizes, budget))
    ]
    assert got == expect


# -- redaction is idempotent ----------------------------------------------

pii_fragments = st.sampled_from(
    [
        "user@example.com",
        "a.b+c@sub.dom.org",
        "(212) 555-0123",
        "+44 20 7946 0958",
        "4111 1111 1111 1111",
        "10.0.0.1",
        "plain words",
        "123 456",
    ]
)


@settings(max_examples=prop_examples(10), deadline=None)
@given(parts=st.lists(pii_fragments, min_size=1, max_size=6))
def test_redact_idempotent(spark, parts):
    """redact(redact(x)) == redact(x): placeholders must never re-match
    any pattern (else double-scrubs corrupt text)."""
    text = " ".join(parts)
    df = spark.createDataFrame([(text,)], "t string")
    once = df.select(redact.redact("t").alias("r1"))
    twice = once.select("r1", redact.redact(once.r1).alias("r2")).head()
    assert twice["r1"] == twice["r2"]


# -- HLL merge: associative + idempotent over random shard splits ---------

@settings(max_examples=prop_examples(8), deadline=None)
@given(
    cuts=st.lists(st.integers(min_value=0, max_value=2000), min_size=2, max_size=4),
    data=st.data(),
)
def test_hll_any_shard_split_merges_to_whole(spark, cuts, data):
    n = 2000
    bounds = sorted({0, n, *cuts})
    from pyspark.sql import functions as F

    whole_df = spark.range(n).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("k")
    )
    whole = sketch.hll_partials(whole_df, "k", ["grp"], b=7)
    shards = []
    for lo, hi in zip(bounds, bounds[1:]):
        if hi > lo:
            sdf = spark.range(lo, hi).select(
                F.lit("g").alias("grp"), F.col("id").cast("string").alias("k")
            )
            shards.append(sketch.hll_partials(sdf, "k", ["grp"], b=7))
    u = shards[0]
    for s in shards[1:]:
        u = u.unionByName(s)
    merged = sketch.hll_merge(u, ["grp"])
    assert {(r["bucket"], r["rho"]) for r in merged.collect()} == {
        (r["bucket"], r["rho"]) for r in whole.collect()
    }
