"""Differential tests of the 14 analytics queries: our Spark DataFrame
builders vs the REFERENCE'S OWN SQL executed by DuckDB over the identical
fact/dim data (the reference SQL files are the conformance spec —
SURVEY §3.2).  Columns compared by name, rows order-insensitively, floats
with tolerance (cross-engine FP drift is expected here; the driver-grade
exact check lives in test_catalog_parity.py)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from nyc_tlc_analytics_pipeline_spark.operators.aggregations import build_all
from nyc_tlc_analytics_pipeline_spark.operators.dimensions import build_all_dims
from nyc_tlc_analytics_pipeline_spark.operators.standardize import build_fact_trips
from nyc_tlc_analytics_pipeline_spark.plans.analytics import ANALYTICS

from .tlc_synth import synth_green, synth_hvfhv, synth_yellow, synth_zones

REF_SQL_DIR = "/root/reference/sql/analytics"


@pytest.fixture(scope="module")
def tlc(spark):
    """Fact + dims + aggs built once from the synthetic raw data."""
    fact = build_fact_trips(
        yellow=spark.createDataFrame(synth_yellow()),
        green=spark.createDataFrame(synth_green()),
        hvfhv=spark.createDataFrame(synth_hvfhv()),
    ).cache()
    dims = build_all_dims(spark, raw_zones=spark.createDataFrame(synth_zones()))
    # narrow the date dim to the synthetic window (covers 2024-11..2025-01)
    from nyc_tlc_analytics_pipeline_spark.operators.dimensions import build_dim_date

    dims["dim_date"] = build_dim_date(spark, "2024-01-01", "2025-12-31")
    aggs = build_all(fact)
    tables = {"fact_trips": fact, **dims, **aggs}
    return tables


@pytest.fixture(scope="module")
def duck_tlc(tlc):
    """The same tables registered in DuckDB (via pandas interchange)."""
    con = duckdb.connect()
    for name in (
        "fact_trips",
        "dim_zones",
        "dim_date",
        "dim_time",
        "dim_service",
        "dim_hvfhs_company",
        "agg_market_share",
    ):
        con.register(f"_{name}", tlc[name].toPandas())
        con.execute(f"CREATE TABLE {name} AS SELECT * FROM _{name}")
    yield con
    con.close()


def _close(a, b, abs_tol=1e-6) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return math.isclose(af, bf, rel_tol=1e-6, abs_tol=abs_tol)
    return a == b


def assert_frames_match(spark_df, duck_res, name, abs_tol=1e-6):
    """Column-name + row-count + order-insensitive value comparison.

    ``abs_tol`` loosens float equality for queries whose OUTPUT columns
    are display-rounded by the reference SQL itself: a pre-round value on
    an exact decimal midpoint (x.xx5) legitimately rounds differently in
    Spark (HALF_UP on shortest repr) vs DuckDB (binary scaling), so
    rounded columns can differ by one rounding ulp without either engine
    being wrong."""
    scols = [c.lower() for c in spark_df.columns]
    dcols = [d[0].lower() for d in duck_res.description]
    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    srows = [tuple(r) for r in spark_df.collect()]
    drows = duck_res.fetchall()
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]

    def sort_key(t):
        # rounding-stable alignment: key on the non-float columns (the
        # group keys, unique per row in every checked query) so a one-ulp
        # rounded float difference cannot reorder the two sides; floats
        # join the key only as a last-resort tie-breaker
        primary = tuple(str(x) for x in t if not isinstance(x, float))
        fallback = tuple(str(x) for x in t)
        return (primary, fallback)

    def norm(rows, idx):
        return sorted((tuple(r[i] for i in idx) for r in rows), key=sort_key)

    for sr, dr in zip(norm(srows, sidx), norm(drows, didx)):
        for sv, dv in zip(sr, dr):
            assert _close(sv, dv, abs_tol), f"{name}: {sr} vs {dr}"


def _ref_sql(num: str) -> str:
    fname = next(f for f in sorted(os.listdir(REF_SQL_DIR)) if f.startswith(num))
    with open(os.path.join(REF_SQL_DIR, fname)) as fh:
        return fh.read().rstrip().rstrip(";")


# q01..q10 + q13A: our builder vs the reference's own SQL in DuckDB
_REF_CHECKED = {
    "a01_top_zones_by_revenue": "01",
    "a02_hourly_demand_patterns": "02",
    "a03_market_share_trends": "03",
    "a04_hvfhv_platform_economics": "04",
    "a05_pricing_comparison": "05",
    "a06_airport_trips_analysis": "06",
    "a07_weekend_vs_weekday": "07",
    "a08_shared_rides_analysis": "08",
    "a09_borough_comparison": "09",
    "a10_data_quality_summary": "10",
    "a12_cbd_congestion_fee_impact": "12",
    "a13_hvfhv_take_rate_variance": "13",
}
# a11/a14 are compared separately below with their LIMIT stripped from
# both sides: they cut at an ORDER BY with plausible ties (rounded price
# diffs / abs share changes), so the cut row-SET is engine-dependent even
# when every retained row is correct.


@pytest.mark.parametrize("name", sorted(_REF_CHECKED))
def test_analytics_match_reference_sql(tlc, duck_tlc, name):
    ours = ANALYTICS[name](tlc)
    res = duck_tlc.execute(_ref_sql(_REF_CHECKED[name]))
    assert_frames_match(ours, res, name)


def test_a11_runs_and_respects_having(tlc):
    df = ANALYTICS["a11_hvfhv_vs_taxi_pricing_by_zone_hour"](tlc)
    rows = df.collect()
    assert all(r.taxi_trip_count >= 10 and r.hvfhv_trip_count >= 10 for r in rows)
    assert len(rows) <= 50


def test_a11_matches_reference_sql_without_limit(tlc, duck_tlc):
    """Full-set comparison with the tie-sensitive LIMIT stripped from
    both sides (the cut row-set is engine-dependent; the full set isn't)."""
    from nyc_tlc_analytics_pipeline_spark.plans.analytics import _A11_SQL, _run_sql

    ours = _run_sql(tlc, ("fact_trips", "dim_zones", "dim_time"),
                    _A11_SQL.replace("LIMIT 50", ""))
    ref = _ref_sql("11").replace("LIMIT 50", "")
    assert_frames_match(ours, duck_tlc.execute(ref), "a11_nolimit")


def test_a12_before_after_pivot(tlc):
    df = ANALYTICS["a12_cbd_congestion_fee_impact"](tlc)
    rows = {r.service_type: r for r in df.collect()}
    assert set(rows) == {"yellow", "green", "hvfhv"}
    for r in rows.values():
        assert r.trips_before > 0 and r.trips_after > 0
    assert rows["yellow"].fee_absorption_pattern == "N/A - Traditional Taxi"


def test_a13b_trip_length_buckets(tlc):
    df = ANALYTICS["a13b_take_rate_by_trip_length"](tlc)
    cats = {r.trip_length_category for r in df.collect()}
    assert cats <= {
        "1. Short (<2 mi)",
        "2. Medium (2-5 mi)",
        "3. Long (5-10 mi)",
        "4. Very Long (>10 mi)",
    }
    assert len(cats) >= 3


def test_a13_zone_and_hour_variants(tlc):
    """Reference q13 Parts B (zone) and C (hour) — the commented-out
    alternate SELECTs of 13_hvfhv_take_rate_variance_analysis.sql."""
    zone = ANALYTICS["a13c_take_rate_by_zone"](tlc).collect()
    assert 0 < len(zone) <= 30
    assert all(r.trip_count >= 100 and r.borough != "Unknown" for r in zone)
    stds = [r.stddev_take_rate for r in zone]
    assert stds == sorted(stds, reverse=True)
    hour = ANALYTICS["a13d_take_rate_by_hour"](tlc).collect()
    assert len(hour) > 0
    assert all(0 <= r.median_take_rate <= 100 for r in hour)


def test_a14_share_shift(tlc):
    df = ANALYTICS["a14_market_share_shift_vs_pricing"](tlc)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.days_active >= 10 for r in rows)
    assert all(
        r.share_trend in ("Gaining Share", "Losing Share", "Stable") for r in rows
    )


def test_a14_matches_reference_sql_without_limit(tlc, duck_tlc):
    """Full-set comparison vs the reference's own q14 SQL with the LIMIT
    stripped (ABS-ordered cut is tie-prone; the set is deterministic).
    The date-quartile floor/ceil construction must reproduce DuckDB's
    interpolated-timestamp comparisons exactly."""
    from nyc_tlc_analytics_pipeline_spark.plans.analytics import _A14_SQL, _run_sql

    ours = _run_sql(
        tlc, ("fact_trips", "dim_zones"), _A14_SQL.replace("LIMIT 100", "")
    )
    ref = _ref_sql("14").replace("LIMIT 100", "")
    # abs_tol = one ulp of the coarsest rounding (1 decimal) in the
    # reference's display columns — midpoint values round differently
    # across engines (see assert_frames_match docstring)
    assert_frames_match(ours, duck_tlc.execute(ref), "a14_nolimit", abs_tol=0.101)
