"""Dimension builder tests (reference semantics from
sql/ddl/02_dimension_tables.sql)."""

from __future__ import annotations

from datetime import date

import pytest

from nyc_tlc_analytics_pipeline_spark.operators.dimensions import (
    build_dim_date,
    build_dim_hvfhs_company,
    build_dim_service,
    build_dim_time,
    build_dim_zones,
)

from .tlc_fixtures import zones_fixture


@pytest.fixture(scope="module")
def dim_date(spark):
    return {r.date_id: r for r in build_dim_date(spark, "2024-01-01", "2025-12-31").collect()}


def test_dim_zones_flags(spark):
    dz = {r.location_id: r for r in build_dim_zones(spark.createDataFrame(zones_fixture())).collect()}
    assert dz[1].is_airport is True  # Newark Airport (Zone LIKE '%Airport%')
    assert dz[1].is_manhattan is False
    assert dz[161].is_airport is False
    assert dz[161].is_manhattan is True
    assert dz[264].borough == "Unknown"
    assert len(dz) == 12


def test_dim_date_row_count_and_bounds(spark):
    df = build_dim_date(spark, "2021-01-01", "2025-12-31")
    assert df.count() == 1826  # 2021-2025 incl. leap 2024


def test_dim_date_weekend_and_dow(dim_date):
    sat = dim_date[date(2024, 6, 1)]
    assert sat.day_of_week == 6 and sat.is_weekend  # Saturday = 6 (Sun=0)
    sun = dim_date[date(2024, 6, 2)]
    assert sun.day_of_week == 0 and sun.is_weekend
    mon = dim_date[date(2024, 6, 3)]
    assert mon.day_of_week == 1 and not mon.is_weekend
    assert sat.day_name == "Saturday" and sat.month_name == "June"


def test_dim_date_holidays(dim_date):
    assert dim_date[date(2024, 1, 1)].is_holiday
    assert dim_date[date(2024, 7, 4)].is_holiday
    assert dim_date[date(2024, 12, 25)].is_holiday
    assert not dim_date[date(2024, 11, 28)].is_holiday  # Thanksgiving not flagged


def test_dim_date_congestion_epoch(dim_date):
    assert dim_date[date(2025, 1, 4)].is_before_congestion_fee
    assert not dim_date[date(2025, 1, 4)].is_after_congestion_fee
    assert dim_date[date(2025, 1, 5)].is_after_congestion_fee
    assert not dim_date[date(2025, 1, 5)].is_before_congestion_fee


def test_dim_time(spark):
    dt = {r.hour: r for r in build_dim_time(spark).collect()}
    assert len(dt) == 24
    assert dt[0].hour_12 == "12 AM" and dt[12].hour_12 == "12 PM" and dt[15].hour_12 == "3 PM"
    assert dt[8].is_rush_hour and dt[17].is_rush_hour and not dt[12].is_rush_hour
    assert dt[7].period == "Morning" and dt[13].period == "Afternoon"
    assert dt[19].period == "Evening" and dt[23].period == "Night"
    assert dt[6].time_bucket == "Day (6am-9pm)" and dt[21].time_bucket == "Night (9pm-6am)"


def test_static_dims(spark):
    svc = {r.service_type: r for r in build_dim_service(spark).collect()}
    assert set(svc) == {"yellow", "green", "hvfhv"}
    assert svc["hvfhv"].service_category == "Ride-Hailing"
    co = {r.hvfhs_license_num: r.company_name for r in build_dim_hvfhs_company(spark).collect()}
    assert co == {"HV0002": "Juno", "HV0003": "Uber", "HV0004": "Via", "HV0005": "Lyft"}


def test_dim_date_week_matches_duckdb(spark, duck_smoke):
    """ISO week/doy parity with the oracle engine on year boundaries
    (SURVEY §7.2 watch item)."""
    rows = (
        build_dim_date(spark, "2024-12-28", "2025-01-07")
        .select("date_id", "week_of_year", "day_of_year")
        .orderBy("date_id")
        .collect()
    )
    duck = duck_smoke.execute(
        """
        SELECT CAST(d AS DATE), extract(week FROM d), extract(doy FROM d)
        FROM generate_series(DATE '2024-12-28', DATE '2025-01-07', INTERVAL '1' DAY) t(d)
        ORDER BY 1
        """
    ).fetchall()
    for s, dk in zip(rows, duck):
        assert (s.date_id, s.week_of_year, s.day_of_year) == (dk[0], dk[1], dk[2])
