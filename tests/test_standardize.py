"""Semantic unit tests of the standardization formulas (SURVEY §2.9),
modeled on the reference's truth-table tests
(reference: tests/test_transformations.py:42-344)."""

from __future__ import annotations

from datetime import date, datetime

import pytest

from nyc_tlc_analytics_pipeline_spark.operators.standardize import (
    build_fact_trips,
    dedup_fact,
    standardize_green,
    standardize_hvfhv,
    standardize_yellow,
)

from .tlc_fixtures import green_fixture, hvfhv_fixture, yellow_fixture


@pytest.fixture(scope="module")
def yellow_fact(spark):
    return standardize_yellow(spark.createDataFrame(yellow_fixture())).orderBy(
        "pickup_datetime"
    ).collect()


@pytest.fixture(scope="module")
def hvfhv_fact(spark):
    return standardize_hvfhv(spark.createDataFrame(hvfhv_fixture())).orderBy(
        "pickup_datetime"
    ).collect()


def test_yellow_price_per_mile(yellow_fact):
    # 16.30/2.5, 31.30/5.0, 23.06/3.2, 12.80/1.8
    got = [r.price_per_mile for r in yellow_fact]
    assert got == pytest.approx([6.52, 6.26, 7.20625, 7.11111], abs=1e-5)


def test_yellow_duration_and_speed(yellow_fact):
    assert [r.trip_duration_minutes for r in yellow_fact] == [15.0, 20.0, 30.0, 10.0]
    # speed = distance / (duration/60): 2.5/(0.25h)=10, 5.0/(1/3h)=15, 3.2/0.5=6.4, 1.8/(1/6)=10.8
    assert [r.avg_speed_mph for r in yellow_fact] == pytest.approx([10.0, 15.0, 6.4, 10.8])


def test_yellow_surcharges_and_taxes(yellow_fact):
    # extra 0.5 + improvement 0.3 + congestion 2.5 = 3.3
    assert [round(r.surcharges, 2) for r in yellow_fact] == [3.3] * 4
    assert [r.taxes for r in yellow_fact] == [0.5] * 4
    assert [r.total_fare for r in yellow_fact] == [16.3, 31.3, 23.06, 12.8]


def test_yellow_date_extraction(yellow_fact):
    r = yellow_fact[0]
    assert r.pickup_date == date(2024, 6, 1)
    assert r.pickup_hour == 10
    assert r.pickup_day_of_week == 6  # Saturday, reference convention Sun=0


def test_yellow_trip_id_is_md5_of_service_ts_distance(yellow_fact):
    import hashlib

    r = yellow_fact[0]
    expected = hashlib.md5(b"y2024-06-01 10:00:002.5").hexdigest()
    assert r.trip_id == expected


def test_hvfhv_total_fare_formula(hvfhv_fact):
    # base + tips + tolls + bcf + sales_tax + congestion + airport
    # row0: 15.5+3.0+0+0.47+1.37+2.75+0 = 23.09
    assert round(hvfhv_fact[0].total_fare, 2) == 23.09
    # row2: 20.0+0+5.76+0.60+1.77+2.75+0 = 30.88
    assert round(hvfhv_fact[2].total_fare, 2) == 30.88


def test_hvfhv_take_rate(hvfhv_fact):
    # (total - driver_pay) / total
    r0 = hvfhv_fact[0]
    assert round(r0.take_rate, 6) == round((23.09 - 12.5) / 23.09, 6)


def test_hvfhv_duration_from_trip_time_seconds(hvfhv_fact):
    assert [r.trip_duration_minutes for r in hvfhv_fact] == [15.0, 22.0, 32.0]


def test_hvfhv_shared_flags(hvfhv_fact):
    assert [r.is_shared_request for r in hvfhv_fact] == [False, False, True]
    assert [r.is_shared_match for r in hvfhv_fact] == [False, False, False]


def test_take_rate_truth_table(spark):
    """Reference: tests/test_transformations.py:162-215 — (100,75)→0.25,
    (50,40)→0.20, (100,100)→0.0, (100,0)→1.0, (0,0)→NULL."""
    import pandas as pd

    rows = [(100.0, 75.0), (50.0, 40.0), (100.0, 100.0), (100.0, 0.0), (0.0, 0.0)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["total", "pay"]))
    from pyspark.sql.functions import col

    from nyc_tlc_analytics_pipeline_spark.functions.scalar import nullif_div

    got = [
        r.tr if r.tr is None else round(r.tr, 6)
        for r in df.select(
            nullif_div(col("total") - col("pay"), col("total")).alias("tr")
        ).collect()
    ]
    assert got == [0.25, 0.2, 0.0, 1.0, None]


def test_is_valid_truth_table(spark):
    """Reference: tests/test_transformations.py:218-315 — valid row TRUE,
    negative fare FALSE, reversed timestamps FALSE."""
    import pandas as pd

    base = yellow_fixture().iloc[:1].copy()
    neg = yellow_fixture().iloc[:1].copy()
    neg["total_amount"] = -5.0
    rev = yellow_fixture().iloc[:1].copy()
    rev["tpep_dropoff_datetime"] = datetime(2024, 6, 1, 9, 0)  # before pickup
    df = spark.createDataFrame(pd.concat([base, neg, rev]))
    got = [r.is_valid for r in standardize_yellow(df).collect()]
    assert got == [True, False, False]


def test_dedup_keeps_one_row_per_trip_id(spark):
    import pandas as pd

    dup = pd.concat([yellow_fixture(), yellow_fixture().iloc[:2]])
    fact = dedup_fact(standardize_yellow(spark.createDataFrame(dup)))
    assert fact.count() == 4
    assert fact.select("trip_id").distinct().count() == 4


def test_null_timestamp_rows_filtered(spark):
    import pandas as pd

    df = yellow_fixture()
    df.loc[0, "tpep_pickup_datetime"] = pd.NaT
    fact = standardize_yellow(spark.createDataFrame(df))
    assert fact.count() == 3


def test_build_fact_trips_unifies_services(spark):
    fact = build_fact_trips(
        yellow=spark.createDataFrame(yellow_fixture()),
        green=spark.createDataFrame(green_fixture()),
        hvfhv=spark.createDataFrame(hvfhv_fixture()),
    )
    rows = fact.collect()
    assert len(rows) == 10
    by_service = {r.service_type for r in rows}
    assert by_service == {"yellow", "green", "hvfhv"}
    # HVFHV ids are synthetic 'h_*'; yellow/green are md5 hex
    hv = [r for r in rows if r.service_type == "hvfhv"]
    assert all(r.trip_id.startswith("h_") for r in hv)
    assert len({r.trip_id for r in rows}) == 10


def test_fact_matches_duckdb_oracle_formulas(spark):
    """Differential: the same yellow fixture transformed by DuckDB SQL with
    the reference formulas must equal our Spark output (trip_id, metrics)."""
    import duckdb

    pdf = yellow_fixture()
    con = duckdb.connect()
    con.register("raw_yellow", pdf)
    duck = con.execute(
        """
        SELECT md5(concat('y', CAST(tpep_pickup_datetime AS VARCHAR), CAST(trip_distance AS VARCHAR))) AS trip_id,
               total_amount / nullif(trip_distance, 0) AS price_per_mile,
               extract(epoch FROM (tpep_dropoff_datetime - tpep_pickup_datetime)) / 60.0 AS trip_duration_minutes,
               extract(dow FROM tpep_pickup_datetime) AS dow
        FROM raw_yellow ORDER BY tpep_pickup_datetime
        """
    ).fetchall()
    ours = (
        standardize_yellow(spark.createDataFrame(pdf))
        .orderBy("pickup_datetime")
        .select("trip_id", "price_per_mile", "trip_duration_minutes", "pickup_day_of_week")
        .collect()
    )
    for d, s in zip(duck, ours):
        assert d[0] == s.trip_id
        assert round(d[1], 9) == round(s.price_per_mile, 9)
        assert d[2] == s.trip_duration_minutes
        assert d[3] == s.pickup_day_of_week
