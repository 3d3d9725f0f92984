"""Grouped-map standardization + cascading rollups: each must equal its
direct (single-pass) computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_tlc_analytics_pipeline_spark.operators.grouped import (
    cascade_rollups,
    standardize_embeddings_by_label,
)
from nyc_tlc_analytics_pipeline_spark.sources.testdata import load_table

from .conftest import SF_SMOKE


def test_standardized_embeddings_have_zero_mean_unit_std(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    z = standardize_embeddings_by_label(emb)
    assert z.count() == emb.count()
    # per label, each dimension's mean ≈ 0 and std ≈ 1
    stats = (
        z.select("label", F.explode(F.col("z_embedding")).alias("v"))
        .groupBy("label")
        .agg(F.avg("v").alias("mu"), F.stddev_pop("v").alias("sd"))
        .collect()
    )
    for r in stats:
        assert abs(r.mu) < 1e-9
        assert r.sd == pytest.approx(1.0, abs=1e-6)


def test_standardization_is_per_group_not_global(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    z = standardize_embeddings_by_label(emb)
    # z-scores of the same vector under different groupings differ unless
    # group moments coincide — spot-check one vector against a manual calc
    import numpy as np

    row = z.filter(F.col("vec_id") == 0).head()
    label = row.label
    group = np.vstack(
        [
            np.asarray(r.embedding, dtype="float64")
            for r in emb.filter(F.col("label") == label).collect()
        ]
    )
    orig = np.asarray(
        emb.filter(F.col("vec_id") == 0).head().embedding, dtype="float64"
    )
    mu, sd = group.mean(axis=0), group.std(axis=0)
    sd[sd == 0] = 1.0
    expected = (orig - mu) / sd
    assert np.allclose(np.asarray(row.z_embedding), expected, atol=1e-9)


def test_cascade_levels_match_direct_rollups(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    levels = cascade_rollups(ev)

    def direct(window):
        return (
            ev.filter(F.col("ts").isNotNull())
            .groupBy(
                F.window("ts", window).getField("start").alias("bucket_start"),
                "event_type",
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum("value").alias("sum_value"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
        )

    for key, window in (("1h", "1 hour"), ("1d", "1 day")):
        got = {
            (r.bucket_start, r.event_type): (
                r.n_events,
                round(r.sum_value, 6),
                r.min_value,
                r.max_value,
            )
            for r in levels[key].collect()
        }
        want = {
            (r.bucket_start, r.event_type): (
                r.n_events,
                round(r.sum_value, 6),
                r.min_value,
                r.max_value,
            )
            for r in direct(window).collect()
        }
        assert got == want, key


def test_coarser_levels_never_scan_raw(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    levels = cascade_rollups(ev)
    # the daily plan reads the hourly aggregate, not the events scan twice:
    # exactly ONE FileScan of events.parquet in the optimized plan
    plan = levels["1d"]._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") == 1
