"""Hypothesis property tests for the round-6 operators.

Each property batches the generated case into ONE DataFrame/action
(Spark jobs per example are expensive — same trick as the other
property suites); pure-expression operators (zorder, rendezvous) are
additionally checked against a pure-python model.
"""

from __future__ import annotations

import hashlib

from .conftest import prop_examples
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from nyc_tlc_analytics_pipeline_spark.operators import layout


# ---------------------------------------------------------------------------
# Z-order key: interleave must be invertible and locality-monotone
# ---------------------------------------------------------------------------

def _deinterleave(z: int, n_dims: int, bits: int) -> list[int]:
    out = [0] * n_dims
    for d in range(n_dims):
        for b in range(bits):
            out[d] |= ((z >> (b * n_dims + d)) & 1) << b
    return out


@settings(max_examples=prop_examples(8), deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**12 - 1),
            st.integers(min_value=0, max_value=2**12 - 1),
            st.integers(min_value=0, max_value=2**12 - 1),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_zorder_key_is_invertible_3d(spark, pts):
    df = spark.createDataFrame(pts, "x long, y long, z long")
    got = df.select(
        "x", "y", "z", layout.zorder_key(["x", "y", "z"], bits=12).alias("m")
    ).collect()
    for r in got:
        assert _deinterleave(r.m, 3, 12) == [r.x, r.y, r.z]


# ---------------------------------------------------------------------------
# global_row_number: a permutation, layout-independent
# ---------------------------------------------------------------------------

@settings(max_examples=prop_examples(6), deadline=None)
@given(
    sizes=st.lists(
        st.integers(min_value=0, max_value=50), min_size=1, max_size=80
    ),
    nparts=st.integers(min_value=1, max_value=9),
)
def test_global_row_number_is_a_permutation(spark, sizes, nparts):
    rows = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "id long, size long").repartition(4)
    got = layout.global_row_number(
        df, [col("size").desc(), col("id")], n_partitions=nparts
    ).collect()
    ranks = sorted(r.rank for r in got)
    assert ranks == list(range(1, len(sizes) + 1))
    # rank order must equal the (size desc, id) total order
    by_rank = sorted(got, key=lambda r: r.rank)
    assert [(r.id) for r in by_rank] == [
        i for i, _ in sorted(rows, key=lambda t: (-t[1], t[0]))
    ]


# ---------------------------------------------------------------------------
# serpentine_shards: exhaustive, near-balanced
# ---------------------------------------------------------------------------

@settings(max_examples=prop_examples(6), deadline=None)
@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=1000), min_size=1, max_size=120
    ),
    n_shards=st.integers(min_value=1, max_value=7),
)
def test_serpentine_counts_differ_by_at_most_one(spark, sizes, n_shards):
    rows = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "id long, tokens long")
    got = layout.serpentine_shards(df, "tokens", "id", n_shards).collect()
    assert len(got) == len(sizes)
    per = {}
    for r in got:
        assert 0 <= r.shard < n_shards
        per[r.shard] = per.get(r.shard, 0) + 1
    assert max(per.values()) - min(per.values()) <= 1 if len(per) == n_shards else True


# ---------------------------------------------------------------------------
# rendezvous_shard: matches the pure-python HRW model; grow-by-one only
# moves keys TO the new shard
# ---------------------------------------------------------------------------

def _hrw(key: int, n: int, salt: str = "hrw") -> int:
    digs = [
        hashlib.md5(f"{salt}:{key}:{s}".encode()).hexdigest() for s in range(n)
    ]
    best = max(digs)
    return digs.index(best)


@settings(max_examples=prop_examples(6), deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=1, max_size=80
    ),
    n=st.integers(min_value=1, max_value=6),
)
def test_rendezvous_matches_python_model_and_hrw_property(spark, keys, n):
    df = spark.createDataFrame([(k,) for k in set(keys)], "id long")
    got = {
        r.id: (r.a, r.b)
        for r in df.select(
            "id",
            layout.rendezvous_shard("id", n).alias("a"),
            layout.rendezvous_shard("id", n + 1).alias("b"),
        ).collect()
    }
    for k, (a, b) in got.items():
        assert a == _hrw(k, n), (k, n)
        assert b == _hrw(k, n + 1)
        if b != a:
            assert b == n  # movers only ever land on the NEW shard


# ---------------------------------------------------------------------------
# epoch_allocation: invariants under arbitrary counts/weights/budgets
# ---------------------------------------------------------------------------

@settings(max_examples=prop_examples(8), deadline=None)
@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=10_000), min_size=1, max_size=8
    ),
    weights=st.lists(
        st.integers(min_value=1, max_value=9), min_size=8, max_size=8
    ),
    budget=st.integers(min_value=1, max_value=100_000),
    max_epochs=st.sampled_from([1.0, 2.0, 4.0]),
)
def test_epoch_allocation_invariants(spark, counts, weights, budget, max_epochs):
    from nyc_tlc_analytics_pipeline_spark.operators import sampling

    doms = [f"d{i}" for i in range(len(counts))]
    df = spark.createDataFrame(
        list(zip(doms, counts)), "domain string, tokens long"
    )
    w = {d: float(weights[i]) for i, d in enumerate(doms)}
    out = sampling.epoch_allocation(
        df, "domain", "tokens", w, float(budget), max_epochs
    ).collect()
    assert sorted(r.domain for r in out) == sorted(doms)
    total_alloc = sum(r.tokens_alloc for r in out)
    cap_total = sum(max_epochs * c for c in counts)
    for r in out:
        assert -1e-6 <= r.epochs <= max_epochs + 1e-6, r
        cap = max_epochs * dict(zip(doms, counts))[r.domain]
        assert r.tokens_alloc <= cap + 1e-6
        if r.capped:
            assert abs(r.tokens_alloc - cap) < 1e-6
    if cap_total <= budget:
        # budget exceeds capacity: everything caps
        assert all(r.capped for r in out)
        assert abs(total_alloc - cap_total) < 1e-3
    else:
        # exact fill (up to the 4-dp rounding of each allocation)
        assert abs(total_alloc - budget) < 0.01 * len(counts) + 0.1
