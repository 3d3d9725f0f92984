"""Quality-check counting tests (reference:
tests/test_quality_checks.py:6-278 semantics; FIXTURES.md §5)."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from nyc_tlc_analytics_pipeline_spark.core.config import QualityThresholds
from nyc_tlc_analytics_pipeline_spark.operators.quality import (
    CheckResult,
    check_distance,
    check_fares,
    check_realistic_speed,
    check_timestamps,
    metrics_df,
    overall_quality_pct,
    run_all_checks,
)

from .tlc_fixtures import yellow_fixture

Q = QualityThresholds()


def _with(df: pd.DataFrame, **updates) -> pd.DataFrame:
    out = df.copy()
    for k, (idx, v) in updates.items():
        out.loc[idx, k] = v
    return out


def test_fare_check_counts_negative_and_excessive(spark):
    pdf = yellow_fixture()
    pdf.loc[0, "total_amount"] = -5.0
    pdf.loc[1, "total_amount"] = 2000.0
    r = check_fares(spark.createDataFrame(pdf), "yellow", Q)
    assert r.total_rows == 4 and r.failed_rows == 2 and r.passed_rows == 2
    assert r.details["negative_fares"] == 1 and r.details["excessive_fares"] == 1


def test_timestamp_check_counts_reversed(spark):
    pdf = yellow_fixture()
    pdf.loc[0, "tpep_dropoff_datetime"] = datetime(2024, 6, 1, 9, 0)
    r = check_timestamps(spark.createDataFrame(pdf), "yellow", Q)
    assert r.failed_rows == 1 and r.details["invalid_order"] == 1


def test_speed_check_counts_excessive(spark):
    pdf = yellow_fixture()
    # 150 miles in 15 min = 600 mph
    pdf.loc[0, "trip_distance"] = 150.0
    r = check_realistic_speed(spark.createDataFrame(pdf), "yellow", Q)
    assert r.total_rows == 4 and r.failed_rows == 1


def test_distance_check_counts_negative(spark):
    pdf = yellow_fixture()
    pdf.loc[0, "trip_distance"] = -1.0
    r = check_distance(spark.createDataFrame(pdf), "yellow", Q)
    assert r.failed_rows == 1 and r.details["negative_distance"] == 1


def test_speed_check_scopes_to_positive_distance(spark):
    pdf = yellow_fixture()
    pdf.loc[0, "trip_distance"] = 0.0  # excluded from the speed check scope
    r = check_realistic_speed(spark.createDataFrame(pdf), "yellow", Q)
    assert r.total_rows == 3


def test_overall_quality_rollup():
    """Reference: 3 checks of 1000 rows with 20/10/50 failed → ≈97.33%
    (tests/test_quality_checks.py:192-220)."""
    rs = [
        CheckResult("a", "yellow", 1000, 980, 20, 0.02, {}),
        CheckResult("b", "yellow", 1000, 990, 10, 0.01, {}),
        CheckResult("c", "yellow", 1000, 950, 50, 0.05, {}),
    ]
    assert overall_quality_pct(rs) == pytest.approx(97.3333, abs=1e-3)


def test_run_all_checks_and_metrics_sink(spark):
    results = run_all_checks(spark.createDataFrame(yellow_fixture()), "yellow")
    assert [r.check_type for r in results] == [
        "fare_validation",
        "timestamp_validation",
        "speed_validation",
        "distance_validation",
    ]
    assert all(r.failed_rows == 0 for r in results)
    m = metrics_df(spark, results)
    assert m.count() == 4
    assert set(m.columns) >= {
        "check_id",
        "service_type",
        "check_type",
        "total_rows",
        "passed_rows",
        "failed_rows",
        "failure_rate",
        "details",
    }


def test_hvfhv_check_uses_base_passenger_fare(spark):
    from .tlc_fixtures import hvfhv_fixture

    pdf = hvfhv_fixture()
    pdf.loc[0, "base_passenger_fare"] = -1.0
    r = check_fares(spark.createDataFrame(pdf), "hvfhv", Q)
    assert r.details["negative_fares"] == 1
