"""Property-based differential tests (hypothesis): the two mechanisms the
whole oracle-parity story rests on must hold for arbitrary inputs, not
just the shipped testdata —

1. the nudged round (`round(x + 1e-9, d)`) agrees between Spark and
   DuckDB for arbitrary doubles;
2. the standardize formulas (§2.9) agree with the same formulas run by
   DuckDB over arbitrary trip rows.

Each hypothesis example is a BATCH of rows (one Spark job per example
keeps runtime sane)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import duckdb
import pytest
from .conftest import prop_examples
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# the nudge's DESIGNED domain: 1e-9 is representable next to x only while
# ulp(x) < 1e-9, i.e. |x| < 2^52·1e-9 ≈ 4.5e6.  Beyond that the nudge is
# absorbed and a value whose shortest decimal repr terminates exactly at
# the rounding grid's midpoint splits the engines (Java HALF_UP on the
# repr vs DuckDB binary scaling) — see
# test_nudge_is_absorbed_beyond_design_domain for the documented edge.
# Catalog usage respects the bound: every 4/6-dp rnd() is a ratio /
# score / log-prob ≪ 1e6, and money aggregates round at 2 dp where the
# 0.01 grid keeps midpoint-repr collisions out of reach of FP drift.
finite_doubles = st.floats(
    min_value=-4e6, max_value=4e6, allow_nan=False, allow_infinity=False
)
money = st.decimals(
    min_value=-1000, max_value=10000, places=2
).map(float)


@settings(max_examples=prop_examples(15), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(finite_doubles, min_size=1, max_size=50))
def test_nudged_round_agrees_across_engines(spark, values):
    from nyc_tlc_analytics_pipeline_spark.functions.scalar import rnd

    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = [
        (r.r2, r.r4, r.r6)
        for r in df.select(
            rnd("x", 2).alias("r2"), rnd("x", 4).alias("r4"), rnd("x", 6).alias("r6")
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    want = con.execute(
        "SELECT round(x + 1e-9, 2), round(x + 1e-9, 4), round(x + 1e-9, 6) FROM t"
    ).fetchall()
    for (g2, g4, g6), (w2, w4, w6) in zip(got, want):
        assert (g2, g4, g6) == (w2, w4, w6)


@st.composite
def yellow_rows(draw):
    base = datetime(2024, 6, 1)
    pickup = base + timedelta(minutes=draw(st.integers(0, 60 * 24 * 30)))
    dur = draw(st.integers(-10, 240))  # negative → reversed timestamps
    return {
        "tpep_pickup_datetime": pickup,
        "tpep_dropoff_datetime": pickup + timedelta(minutes=dur),
        "trip_distance": draw(st.decimals(min_value=0, max_value=500, places=2).map(float)),
        "fare_amount": draw(money),
        "tip_amount": draw(money),
        "tolls_amount": draw(money),
        "extra": draw(money),
        "mta_tax": draw(money),
        "improvement_surcharge": draw(money),
        "congestion_surcharge": draw(money),
        "Airport_fee": draw(money),
        "total_amount": draw(money),
    }


@settings(max_examples=prop_examples(10), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(yellow_rows(), min_size=1, max_size=30))
def test_standardize_formulas_match_duckdb_for_arbitrary_rows(spark, rows):
    import pandas as pd

    from nyc_tlc_analytics_pipeline_spark.operators.standardize import standardize_yellow

    pdf = pd.DataFrame(rows)
    for c in ("VendorID", "PULocationID", "DOLocationID", "payment_type"):
        pdf[c] = 1
    pdf["passenger_count"] = 1.0
    pdf["RatecodeID"] = 1.0
    pdf["store_and_fwd_flag"] = "N"
    pdf["source_file"] = "prop.parquet"
    ours = (
        standardize_yellow(spark.createDataFrame(pdf))
        .orderBy("pickup_datetime", "trip_id")
        .select(
            "trip_id",
            "pickup_day_of_week",
            "trip_duration_minutes",
            "price_per_mile",
            "avg_speed_mph",
            "surcharges",
            "is_valid",
        )
        .collect()
    )
    con = duckdb.connect()
    con.register("raw_yellow", pdf)
    duck = con.execute(
        """
        SELECT md5(concat('y', CAST(tpep_pickup_datetime AS VARCHAR), CAST(trip_distance AS VARCHAR))) AS trip_id,
               dayofweek(tpep_pickup_datetime) AS dow,
               extract(epoch FROM (tpep_dropoff_datetime - tpep_pickup_datetime)) / 60.0 AS dur_min,
               total_amount / nullif(trip_distance, 0) AS ppm,
               trip_distance / nullif(extract(epoch FROM (tpep_dropoff_datetime - tpep_pickup_datetime)) / 3600.0, 0) AS mph,
               extra + improvement_surcharge + congestion_surcharge AS surcharges,
               (total_amount >= 0 AND tpep_dropoff_datetime > tpep_pickup_datetime AND trip_distance >= 0) AS is_valid
        FROM raw_yellow
        ORDER BY tpep_pickup_datetime, trip_id
        """
    ).fetchall()

    def close(a, b):
        if a is None or b is None:
            return a is None and b is None
        if isinstance(a, float):
            return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)
        return a == b

    assert len(ours) == len(duck)
    for s, d in zip(ours, duck):
        assert s.trip_id == d[0]
        assert s.pickup_day_of_week == d[1]
        assert close(s.trip_duration_minutes, d[2])
        assert close(s.price_per_mile, d[3])
        assert close(s.avg_speed_mph, d[4])
        assert close(s.surcharges, d[5])
        assert s.is_valid == d[6]


def test_nudge_is_absorbed_beyond_design_domain():
    """DOCUMENTED limitation of the nudged round: once half an ulp
    exceeds the nudge — |x| ≥ 2^53·1e-9 ≈ 9.0e6 — ``x + 1e-9`` rounds
    back to ``x`` and the nudge vanishes, so a value whose shortest
    decimal repr terminates exactly at the grid midpoint can round
    differently across engines (hypothesis found 536870912.1791275 →
    Spark .179128 / DuckDB .179127).  This pins the mechanism's
    boundary so the main property test's ±4e6 domain bound is visibly
    justified; catalog rnd() sites stay far inside it (ratios, scores,
    log-probs — money rounds via money() at the 0.01 grid)."""
    import math

    edge = 2**53 * 1e-9
    below, above = edge * 0.5, edge * 2.0
    assert below + 1e-9 != below  # nudge representable inside the domain
    assert above + 1e-9 == above  # absorbed beyond it
    assert math.ulp(above) / 2 > 1e-9
