"""Round-9 operator tests: the count-derived LSH plane ladder behind
q142's first driver oracle, the estimated-size gate on held-out LM
model broadcasts, schema-agnostic quantized top-k, and the lazy
cms_join_size plan."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from nyc_tlc_analytics_pipeline_spark.operators import lm, similarity, sketch
from nyc_tlc_analytics_pipeline_spark.sources.testdata import load_table

from .conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# q142 — count-derived plane ladder
# ---------------------------------------------------------------------------


def test_auto_n_planes_matches_float_formula_and_sql_ladder():
    """The integer doubling ladder must agree with the textbook float
    formula (base + ceil(log2(n/occupancy)), capped) AND with the SQL
    CASE ladder the q142 oracle runs in DuckDB — including exactly at
    every power-of-two boundary, where a float log2 could flip."""
    from nyc_tlc_analytics_pipeline_spark.plans.catalog_datapipe import (
        _q142_ladder_sql,
    )

    ns = [1, 2, 3, 2047, 2048, 2049, 20480, 1_000_000, 123_456_789]
    for e in range(24):
        ns += [2048 * 2**e - 1, 2048 * 2**e, 2048 * 2**e + 1]
    con = duckdb.connect()
    ladder = _q142_ladder_sql()
    for n in ns:
        got = similarity.auto_n_planes(n)
        ref = min(4 + max(0, math.ceil(math.log2(max(1.0, n / 2048)))), 24)
        assert got == ref, (n, got, ref)
        (sql_val,) = con.execute(
            f"SELECT {ladder} FROM (SELECT {n}::BIGINT AS n)"
        ).fetchone()
        assert got == sql_val, (n, got, sql_val)
    con.close()


def test_counted_planes_smoke_equals_base_planes(spark):
    """The smoke embeddings table is under the occupancy target, so the
    exact-count sizing resolves to the base 4 planes — and plane i
    depends only on (seed, i, d), so counted mode must EQUAL the fixed
    4-plane q118 layout element-for-element."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a, b = emb.filter(col("label") < 5), emb.filter(col("label") >= 5)
    planes = similarity.counted_planes(a, b, dim=64)
    assert planes == similarity.random_hyperplanes(4, 64, seed=42)


# ---------------------------------------------------------------------------
# held-out LM model broadcast gate
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_heldout_lm_broadcast_gate_takes_merge_when_model_big(spark):
    """An over-cap model must NOT be force-broadcast: both held-out
    scorers fall back to sort-merge joins on the model type tables
    (the q59/q63 estimate-blind-broadcast precedent), and the scores
    are identical either way.  The in-cap model (a parquet-backed
    frame with a real size estimate — the q138/q148 shape) keeps the
    all-broadcast map-side plan."""
    docs = load_table(spark, SF_SMOKE, "documents")
    en = docs.filter(col("lang") == "en")
    model = en.filter(col("doc_id") % 3 == 0)
    ev = en.filter(col("doc_id") % 3 != 0).limit(20)
    for fn in (lm.heldout_bigram_perplexity, lm.kneser_ney_perplexity):
        small = fn(ev, ["doc_id"], model)
        big = fn(ev, ["doc_id"], model, broadcast_cap=0)
        assert "SortMergeJoin" in _plan(big)
        assert "SortMergeJoin" not in _plan(small)
        assert "BroadcastHashJoin" in _plan(small)
        # join strategy changes the aggregation's FP summation order →
        # ~1e-15 dust on the raw doubles; callers round to 6 dp (rnd)
        def rows(df):
            return sorted(
                tuple(round(v, 6) if isinstance(v, float) else v for v in r)
                for r in df.collect()
            )

        assert rows(small) == rows(big)


def test_model_token_estimate_fail_open_to_merge(spark):
    """No usable optimizer estimate → 'huge' → the merge path: the safe
    failure mode for a broadcast decision.  A createDataFrame local
    frame reports the planner's unknown-size default, which must also
    land above any sane cap (tested via the public scorer plan)."""

    class Broken:
        @property
        def _jdf(self):
            raise RuntimeError("no plan")

    assert lm._model_token_estimate(Broken()) >= 1 << 30
    model = spark.createDataFrame(
        [("m1", "a b c a b")], "doc_id string, text string"
    )
    assert lm._model_token_estimate(model) > lm.MODEL_BROADCAST_CAP_TOKENS


# ---------------------------------------------------------------------------
# schema-agnostic quantized retrieval
# ---------------------------------------------------------------------------


def test_quantized_topk_schema_agnostic(spark):
    """quantized_cosine_topk / binary_rerank_topk on a frame WITHOUT a
    'label' column (and with an arbitrary payload column) — every
    non-vector column rides through, like cosine_topk."""
    rows = [
        (i, f"p{i}", [float((i * 7 + d * 3) % 11 - 5) for d in range(64)])
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, payload string, embedding array<double>"
    )
    q = [float((d * 5 + 1) % 9 - 4) for d in range(64)]
    got_q = similarity.quantized_cosine_topk(df, q, k=5)
    assert set(got_q.columns) == {
        "vec_id", "payload", "q_dot", "q_cos", "cos_exact"
    }
    assert got_q.count() == 5
    got_b = similarity.binary_rerank_topk(df, q, k=5, m=10)
    assert set(got_b.columns) == {"vec_id", "payload", "hamming", "cos_sim"}
    assert got_b.count() == 5
    # and the expression twin stays pinned to the arrow kernel
    got_e = similarity.quantized_cosine_topk(df, q, k=5, kernel="expr")
    assert sorted(map(tuple, got_e.collect())) == sorted(
        map(tuple, got_q.collect())
    )


# ---------------------------------------------------------------------------
# cms_join_size is construction-lazy
# ---------------------------------------------------------------------------


def test_cms_join_size_runs_no_job_at_construction(spark):
    """Building the estimate frame must not launch a Spark job (the
    d-row count rides INSIDE the plan as a 1-row broadcast aggregate);
    the estimate itself is unchanged."""
    keys_a = spark.range(100).select(col("id").cast("string").alias("k"))
    keys_b = spark.range(50, 150).select(col("id").cast("string").alias("k"))
    sa = sketch.cms_partials(keys_a, "k", d=3, w=64)
    sb = sketch.cms_partials(keys_b, "k", d=3, w=64)
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    est_df = sketch.cms_join_size(sa, sb)
    after = set(tracker.getJobIdsForGroup(None))
    assert before == after  # construction is a pure plan build
    assert est_df.first()[0] >= 50  # true overlap, CMS never under
