"""Gold-aggregate builder tests: HAVING/filter enforcement, share
invariants, and a DuckDB value check of the market-share math."""

from __future__ import annotations

import duckdb
import pytest

from nyc_tlc_analytics_pipeline_spark.operators.aggregations import (
    build_all,
    build_daily_summary,
    build_hvfhv_take_rates,
    build_market_share,
    build_pricing_by_zone_hour,
)
from nyc_tlc_analytics_pipeline_spark.operators.standardize import build_fact_trips

from .tlc_synth import synth_green, synth_hvfhv, synth_yellow


@pytest.fixture(scope="module")
def fact(spark):
    return build_fact_trips(
        yellow=spark.createDataFrame(synth_yellow(1000)),
        green=spark.createDataFrame(synth_green(300)),
        hvfhv=spark.createDataFrame(synth_hvfhv(3000)),
    ).cache()


def test_pricing_agg_filters_and_keys(fact):
    agg = build_pricing_by_zone_hour(fact)
    rows = agg.collect()
    assert len(rows) > 0
    # group keys are unique
    keys = [(r.service_type, r.pickup_zone_id, r.pickup_hour, r.trip_date) for r in rows]
    assert len(keys) == len(set(keys))
    for r in rows[:50]:
        assert r.valid_trip_count == r.trip_count  # scope is is_valid already
        assert r.p25_price_per_mile <= r.median_price_per_mile <= r.p75_price_per_mile


def test_take_rates_having_and_bounds(spark):
    # concentrate rows into one zone + 3 days so the fine-grained
    # (date, zone, hour, license) grain reaches the ≥5-trip HAVING
    import pandas as pd

    pdf = synth_hvfhv(4000)
    pdf["PULocationID"] = 161
    base = pd.Timestamp(2025, 1, 10)
    pdf["pickup_datetime"] = [
        base + pd.Timedelta(days=i % 3, hours=ts.hour, minutes=ts.minute)
        for i, ts in enumerate(pdf["pickup_datetime"])
    ]
    pdf["dropoff_datetime"] = pdf["pickup_datetime"] + pd.to_timedelta(
        pdf["trip_time"], unit="s"
    )
    dense = build_fact_trips(hvfhv=spark.createDataFrame(pdf))
    rows = build_hvfhv_take_rates(dense).collect()
    assert len(rows) > 0
    assert all(r.trip_count >= 5 for r in rows)
    assert all(0 <= r.median_take_rate <= 1 for r in rows)


def test_market_share_invariants(fact):
    rows = build_market_share(fact).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.total_trips >= 10  # HAVING
        assert r.yellow_trips + r.green_trips + r.hvfhv_trips == r.total_trips
        assert (r.yellow_share + r.green_share + r.hvfhv_share) == pytest.approx(1.0)


def test_daily_summary_quality_score_matches_duckdb(spark, fact):
    ours = {r.trip_date: r for r in build_daily_summary(fact).collect()}
    con = duckdb.connect()
    con.register("fact_trips", fact.toPandas())
    duck = con.execute(
        """
        SELECT pickup_date AS trip_date, count(*) AS total_trips,
               sum(CASE WHEN is_valid THEN 1 ELSE 0 END)::DOUBLE / count(*) AS dq
        FROM fact_trips GROUP BY pickup_date
        """
    ).fetchall()
    assert len(duck) == len(ours)
    for trip_date, total, dq in duck:
        r = ours[trip_date]
        assert r.total_trips == total
        assert r.data_quality_score == pytest.approx(dq)


def test_build_all_has_four_aggregates(fact):
    aggs = build_all(fact)
    assert set(aggs) == {
        "agg_pricing_by_zone_hour",
        "agg_hvfhv_take_rates",
        "agg_market_share",
        "agg_daily_summary",
    }
