"""The 14 TLC analytics queries re-expressed Spark-first.

Conformance corpus parity with the reference's ``sql/analytics/*.sql``
(01–14): every query is a DataFrame builder over the unified fact +
broadcast dims (q11–q14, the heavy CTE queries, run as Spark SQL — the
declarative form Catalyst compiles identically; q14 needs scalar
subqueries which the DataFrame API cannot express directly, SURVEY §7.3).

Every builder takes a dict of tables
(``fact_trips``, ``dim_zones``, ``dim_date``, ``dim_time``,
``dim_hvfhs_company``, ``agg_market_share``) and returns a DataFrame.
Because the fixed fact schema includes ``dropoff_datetime``,
``dropoff_zone_id`` and ``is_shared_match`` (SURVEY §1.4 ⚠), all 14
queries actually run — in the reference, q06/q08/q10 reference dropped
columns and fail.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit, when

Tables = dict[str, DataFrame]

ANALYTICS: dict[str, Callable[[Tables], DataFrame]] = {}


def register_analytics(name: str):
    def deco(fn):
        ANALYTICS[name] = fn
        return fn

    return deco


def _valid(fact: DataFrame) -> DataFrame:
    return fact.filter(col("is_valid") == True)  # noqa: E712


@register_analytics("a01_top_zones_by_revenue")
def a01(t: Tables) -> DataFrame:
    """Top 20 zones by revenue (reference: 01_top_zones_by_revenue.sql)."""
    f, z = _valid(t["fact_trips"]), t["dim_zones"]
    return (
        f.join(broadcast(z), f.pickup_zone_id == z.location_id)
        .groupBy(col("zone").alias("pickup_zone"), "borough")
        .agg(
            F.count("trip_id").alias("total_trips"),
            F.sum("total_fare").alias("total_revenue"),
            F.avg("total_fare").alias("avg_fare"),
            F.avg("trip_distance_miles").alias("avg_distance"),
            F.sum(when(col("service_type") == "yellow", 1).otherwise(0)).alias("yellow_trips"),
            F.sum(when(col("service_type") == "green", 1).otherwise(0)).alias("green_trips"),
            F.sum(when(col("service_type") == "hvfhv", 1).otherwise(0)).alias("hvfhv_trips"),
        )
        .orderBy(F.desc("total_revenue"))
        .limit(20)
    )


@register_analytics("a02_hourly_demand_patterns")
def a02(t: Tables) -> DataFrame:
    """Hourly demand by service (reference: 02_hourly_demand_patterns.sql)."""
    f, dt = _valid(t["fact_trips"]), t["dim_time"]
    return (
        f.join(broadcast(dt), f.pickup_hour == dt.hour)
        .groupBy("hour", col("hour_12").alias("hour_label"), col("is_rush_hour").alias("is_peak_hour"))
        .agg(
            F.sum(when(col("service_type") == "yellow", 1).otherwise(0)).alias("yellow_trips"),
            F.sum(when(col("service_type") == "green", 1).otherwise(0)).alias("green_trips"),
            F.sum(when(col("service_type") == "hvfhv", 1).otherwise(0)).alias("hvfhv_trips"),
            F.count("*").alias("total_trips"),
            F.avg("total_fare").alias("avg_fare"),
            F.avg("trip_duration_minutes").alias("avg_duration_minutes"),
        )
        .orderBy("hour")
    )


@register_analytics("a03_market_share_trends")
def a03(t: Tables) -> DataFrame:
    """Daily market-share trends from the pre-computed agg
    (reference: 03_market_share_trends.sql — reads agg_market_share)."""
    m, d = t["agg_market_share"], t["dim_date"]
    daily = m.groupBy("trip_date").agg(
        F.sum("total_trips").alias("total_trips"),
        F.sum("yellow_trips").alias("yellow_trips"),
        F.sum("green_trips").alias("green_trips"),
        F.sum("hvfhv_trips").alias("hvfhv_trips"),
        F.avg("yellow_share").alias("yellow_share"),
        F.avg("green_share").alias("green_share"),
        F.avg("hvfhv_share").alias("hvfhv_share"),
        F.sum("total_revenue").alias("total_revenue"),
        (F.sum("yellow_total_revenue") / F.nullif(F.sum("total_revenue"), lit(0))).alias("y_rs"),
        (F.sum("green_total_revenue") / F.nullif(F.sum("total_revenue"), lit(0))).alias("g_rs"),
        (F.sum("hvfhv_total_revenue") / F.nullif(F.sum("total_revenue"), lit(0))).alias("h_rs"),
    )
    return (
        daily.join(broadcast(d), daily.trip_date == d.date_id)
        .select(
            col("date_id").alias("date"),
            "month_name",
            "year",
            "total_trips",
            "yellow_trips",
            "green_trips",
            "hvfhv_trips",
            F.round(col("yellow_share") * 100, 2).alias("yellow_share_pct"),
            F.round(col("green_share") * 100, 2).alias("green_share_pct"),
            F.round(col("hvfhv_share") * 100, 2).alias("hvfhv_share_pct"),
            "total_revenue",
            F.round(col("y_rs") * 100, 2).alias("yellow_revenue_share_pct"),
            F.round(col("g_rs") * 100, 2).alias("green_revenue_share_pct"),
            F.round(col("h_rs") * 100, 2).alias("hvfhv_revenue_share_pct"),
        )
        .orderBy("date")
    )


@register_analytics("a04_hvfhv_platform_economics")
def a04(t: Tables) -> DataFrame:
    """Take rates by company (reference: 04_hvfhv_platform_economics.sql)."""
    f, c = _valid(t["fact_trips"]), t["dim_hvfhs_company"]
    return (
        f.filter((col("service_type") == "hvfhv") & col("take_rate").between(0, 1))
        .join(broadcast(c), "hvfhs_license_num")
        .groupBy("company_name")
        .agg(
            F.count("*").alias("total_trips"),
            (F.avg("take_rate") * 100).alias("avg_take_rate_pct"),
            (F.percentile("take_rate", lit(0.5)) * 100).alias("median_take_rate_pct"),
            (F.percentile("take_rate", lit(0.25)) * 100).alias("p25_take_rate_pct"),
            (F.percentile("take_rate", lit(0.75)) * 100).alias("p75_take_rate_pct"),
            F.avg("driver_pay").alias("avg_driver_pay"),
            F.avg(col("total_fare") - col("driver_pay")).alias("avg_platform_commission"),
            F.sum(col("total_fare") - col("driver_pay")).alias("total_platform_revenue"),
            F.sum("driver_pay").alias("total_driver_pay"),
            F.sum("total_fare").alias("total_gross_revenue"),
        )
        .orderBy(F.desc("total_trips"))
    )


@register_analytics("a05_pricing_comparison")
def a05(t: Tables) -> DataFrame:
    """Cross-service pricing (reference: 05_pricing_comparison.sql)."""
    f = _valid(t["fact_trips"]).filter(
        col("price_per_mile").between(0.5, 50) & col("price_per_minute").between(0.1, 10)
    )
    return (
        f.groupBy("service_type")
        .agg(
            F.count("*").alias("trip_count"),
            F.avg("price_per_mile").alias("avg_price_per_mile"),
            F.percentile("price_per_mile", lit(0.5)).alias("median_price_per_mile"),
            F.avg("price_per_minute").alias("avg_price_per_minute"),
            F.percentile("price_per_minute", lit(0.5)).alias("median_price_per_minute"),
            F.avg("total_fare").alias("avg_total_fare"),
            F.avg("trip_distance_miles").alias("avg_trip_distance"),
            F.avg("trip_duration_minutes").alias("avg_trip_duration"),
            F.avg("tips").alias("avg_tips"),
            (F.avg("tips") / F.nullif(F.avg("total_fare"), lit(0)) * 100).alias(
                "avg_tip_percentage"
            ),
        )
        .orderBy(F.desc("trip_count"))
    )


@register_analytics("a06_airport_trips_analysis")
def a06(t: Tables) -> DataFrame:
    """Airport flows — zone dim joined in two roles (J5)
    (reference: 06_airport_trips_analysis.sql; needs dropoff_zone_id,
    present in OUR fact — §1.4 fix)."""
    f, z = _valid(t["fact_trips"]), t["dim_zones"]
    zp = z.select(
        col("location_id").alias("p_loc"), col("service_zone").alias("p_service_zone")
    )
    zd = z.select(
        col("location_id").alias("d_loc"), col("service_zone").alias("d_service_zone")
    )
    trip_type = (
        when(col("p_service_zone") == "Airports", "From Airport")
        .when(col("d_service_zone") == "Airports", "To Airport")
        .otherwise("Other")
    )
    return (
        f.join(broadcast(zp), f.pickup_zone_id == col("p_loc"))
        .join(broadcast(zd), f.dropoff_zone_id == col("d_loc"))
        .filter((col("p_service_zone") == "Airports") | (col("d_service_zone") == "Airports"))
        .groupBy(trip_type.alias("trip_type"), "service_type")
        .agg(
            F.count("*").alias("trip_count"),
            F.avg("trip_distance_miles").alias("avg_distance"),
            F.avg("trip_duration_minutes").alias("avg_duration"),
            F.avg("total_fare").alias("avg_fare"),
            F.avg("airport_fee").alias("avg_airport_fee"),
            F.sum("airport_fee").alias("total_airport_fees"),
            F.avg("price_per_mile").alias("avg_price_per_mile"),
        )
        .orderBy(F.desc("trip_count"))
    )


@register_analytics("a07_weekend_vs_weekday")
def a07(t: Tables) -> DataFrame:
    """Weekend/weekday split via dim_date (reference: 07_weekend_vs_weekday.sql)."""
    f, d = _valid(t["fact_trips"]), t["dim_date"]
    return (
        f.join(broadcast(d), f.pickup_date == d.date_id)
        .groupBy(
            "is_weekend",
            when(col("is_weekend"), "Weekend").otherwise("Weekday").alias("day_type"),
            "service_type",
        )
        .agg(
            F.count("*").alias("trip_count"),
            F.avg("total_fare").alias("avg_fare"),
            F.avg("trip_distance_miles").alias("avg_distance"),
            F.avg("trip_duration_minutes").alias("avg_duration"),
            F.avg("price_per_mile").alias("avg_price_per_mile"),
            (F.avg("tips") / F.nullif(F.avg("total_fare"), lit(0)) * 100).alias(
                "avg_tip_percentage"
            ),
            F.sum("total_fare").alias("total_revenue"),
        )
        .orderBy("is_weekend", F.desc("trip_count"))
    )


@register_analytics("a08_shared_rides_analysis")
def a08(t: Tables) -> DataFrame:
    """Shared-ride adoption with %-of-total window (W1)
    (reference: 08_shared_rides_analysis.sql; needs is_shared_match —
    §1.4 fix)."""
    from pyspark.sql import Window

    f = _valid(t["fact_trips"]).filter(col("service_type") == "hvfhv")
    status = (
        when(col("is_shared_request") & col("is_shared_match"), "Requested & Matched")
        .when(col("is_shared_request") & ~col("is_shared_match"), "Requested but Not Matched")
        .otherwise("Not Shared")
    )
    counts = f.groupBy(status.alias("shared_status")).agg(
        F.count("*").alias("trip_count"),
        F.avg("total_fare").alias("avg_fare"),
        F.avg("trip_distance_miles").alias("avg_distance"),
        F.avg("price_per_mile").alias("avg_price_per_mile"),
        (F.avg("take_rate") * 100).alias("avg_take_rate_pct"),
        F.avg("driver_pay").alias("avg_driver_pay"),
    )
    w = Window.partitionBy()
    return counts.select(
        "shared_status",
        "trip_count",
        F.round(col("trip_count") * 100.0 / F.sum("trip_count").over(w), 2).alias("percentage"),
        "avg_fare",
        "avg_distance",
        "avg_price_per_mile",
        "avg_take_rate_pct",
        "avg_driver_pay",
    ).orderBy(F.desc("trip_count"))


@register_analytics("a09_borough_comparison")
def a09(t: Tables) -> DataFrame:
    """Borough-level comparison (reference: 09_borough_comparison.sql)."""
    f, z = _valid(t["fact_trips"]), t["dim_zones"]
    return (
        f.join(broadcast(z), f.pickup_zone_id == z.location_id)
        .filter(col("borough") != "Unknown")
        .groupBy("borough")
        .agg(
            F.count("*").alias("total_trips"),
            F.sum(when(col("service_type") == "yellow", 1).otherwise(0)).alias("yellow_trips"),
            F.sum(when(col("service_type") == "green", 1).otherwise(0)).alias("green_trips"),
            F.sum(when(col("service_type") == "hvfhv", 1).otherwise(0)).alias("hvfhv_trips"),
            F.avg("total_fare").alias("avg_fare"),
            F.avg("trip_distance_miles").alias("avg_distance"),
            F.avg("trip_duration_minutes").alias("avg_duration"),
            F.avg("price_per_mile").alias("avg_price_per_mile"),
            F.sum("total_fare").alias("total_revenue"),
            F.round(
                F.sum(when(col("service_type") == "hvfhv", 1).otherwise(0)) * 100.0 / F.count("*"),
                2,
            ).alias("hvfhv_market_share_pct"),
        )
        .orderBy(F.desc("total_trips"))
    )


@register_analytics("a10_data_quality_summary")
def a10(t: Tables) -> DataFrame:
    """Quality summary per service (reference: 10_data_quality_summary.sql;
    needs dropoff_datetime/dropoff_zone_id — §1.4 fix)."""
    f = t["fact_trips"]
    return (
        f.groupBy("service_type")
        .agg(
            F.count("*").alias("total_records"),
            F.sum(when(col("is_valid"), 1).otherwise(0)).alias("valid_records"),
            F.sum(when(~col("is_valid"), 1).otherwise(0)).alias("invalid_records"),
            F.round(
                F.sum(when(col("is_valid"), 1).otherwise(0)) * 100.0 / F.count("*"), 2
            ).alias("data_quality_pct"),
            F.sum(when(col("total_fare") < 0, 1).otherwise(0)).alias("negative_fares"),
            F.sum(when(col("trip_distance_miles") < 0, 1).otherwise(0)).alias(
                "negative_distances"
            ),
            F.sum(when(col("trip_duration_minutes") < 0, 1).otherwise(0)).alias(
                "negative_durations"
            ),
            F.sum(when(col("dropoff_datetime") <= col("pickup_datetime"), 1).otherwise(0)).alias(
                "invalid_timestamps"
            ),
            F.sum(when(col("avg_speed_mph") > 100, 1).otherwise(0)).alias("excessive_speeds"),
            F.sum(when(col("pickup_zone_id").isNull(), 1).otherwise(0)).alias(
                "null_pickup_zones"
            ),
            F.sum(when(col("dropoff_zone_id").isNull(), 1).otherwise(0)).alias(
                "null_dropoff_zones"
            ),
            F.min("pickup_date").alias("earliest_trip"),
            F.max("pickup_date").alias("latest_trip"),
        )
        .orderBy(F.desc("total_records"))
    )


# ---------------------------------------------------------------------------
# q11–q14: multi-CTE queries kept in SQL form (Catalyst compiles the same
# plan; q14's scalar subqueries are not DataFrame-expressible — SURVEY §7.3)
# ---------------------------------------------------------------------------


def _run_sql(t: Tables, needed: tuple[str, ...], sql: str) -> DataFrame:
    any_df = next(iter(t.values()))
    spark = any_df.sparkSession
    for name in needed:
        t[name].createOrReplaceTempView(name)
    return spark.sql(sql)


_A11_SQL = """
WITH pricing AS (
    SELECT z.zone AS pickup_zone, z.borough, tm.hour, tm.hour_12 AS hour_label,
           tm.is_rush_hour AS is_peak_hour,
           avg(CASE WHEN f.service_type IN ('yellow','green') THEN f.price_per_mile END) AS taxi_avg_ppm,
           percentile(CASE WHEN f.service_type IN ('yellow','green') THEN f.price_per_mile END, 0.5) AS taxi_med_ppm,
           percentile(CASE WHEN f.service_type IN ('yellow','green') THEN f.price_per_minute END, 0.5) AS taxi_med_ppmin,
           count(CASE WHEN f.service_type IN ('yellow','green') THEN 1 END) AS taxi_trip_count,
           percentile(CASE WHEN f.service_type = 'hvfhv' THEN f.price_per_mile END, 0.5) AS hvfhv_med_ppm,
           percentile(CASE WHEN f.service_type = 'hvfhv' THEN f.price_per_minute END, 0.5) AS hvfhv_med_ppmin,
           count(CASE WHEN f.service_type = 'hvfhv' THEN 1 END) AS hvfhv_trip_count
    FROM fact_trips f
    JOIN dim_zones z ON f.pickup_zone_id = z.location_id
    JOIN dim_time tm ON f.pickup_hour = tm.hour
    WHERE f.is_valid = TRUE
      AND f.price_per_mile BETWEEN 0.5 AND 50
      AND f.price_per_minute BETWEEN 0.1 AND 10
      AND z.borough != 'Unknown'
    GROUP BY z.zone, z.borough, tm.hour, tm.hour_12, tm.is_rush_hour
    HAVING count(CASE WHEN f.service_type IN ('yellow','green') THEN 1 END) >= 10
       AND count(CASE WHEN f.service_type = 'hvfhv' THEN 1 END) >= 10
)
SELECT pickup_zone, borough, hour, hour_label, is_peak_hour,
       round(taxi_med_ppm, 2) AS taxi_price_per_mile,
       round(taxi_med_ppmin, 2) AS taxi_price_per_minute,
       taxi_trip_count,
       round(hvfhv_med_ppm, 2) AS hvfhv_price_per_mile,
       round(hvfhv_med_ppmin, 2) AS hvfhv_price_per_minute,
       hvfhv_trip_count,
       round(hvfhv_med_ppm - taxi_med_ppm, 2) AS price_diff_per_mile,
       round(hvfhv_med_ppmin - taxi_med_ppmin, 2) AS price_diff_per_minute,
       round((hvfhv_med_ppm - taxi_med_ppm) / nullif(taxi_med_ppm, 0) * 100, 1) AS price_diff_pct_per_mile,
       round((hvfhv_med_ppmin - taxi_med_ppmin) / nullif(taxi_med_ppmin, 0) * 100, 1) AS price_diff_pct_per_minute,
       CASE WHEN (hvfhv_med_ppm - taxi_med_ppm) / nullif(taxi_med_ppm, 0) > 0.10 THEN 'YES - HVFHV Higher'
            WHEN (hvfhv_med_ppm - taxi_med_ppm) / nullif(taxi_med_ppm, 0) < -0.10 THEN 'NO - Taxi Higher'
            ELSE 'Similar' END AS pricing_verdict
FROM pricing
ORDER BY CASE WHEN (hvfhv_med_ppm - taxi_med_ppm) / nullif(taxi_med_ppm, 0) > 0.10 THEN 1 ELSE 2 END,
         price_diff_pct_per_mile DESC
LIMIT 50
"""


@register_analytics("a11_hvfhv_vs_taxi_pricing_by_zone_hour")
def a11(t: Tables) -> DataFrame:
    """HVFHV vs taxi $/mile by zone+hour — masked percentiles, two-condition
    HAVING, CASE ordering (reference: 11_uber_lyft_vs_taxi_pricing_by_zone_hour.sql)."""
    return _run_sql(t, ("fact_trips", "dim_zones", "dim_time"), _A11_SQL)


_A12_SQL = """
WITH cbd_zones AS (
    SELECT location_id FROM dim_zones
    WHERE borough = 'Manhattan' AND service_zone IN ('Yellow Zone', 'Boro Zone')
),
ba AS (
    SELECT CASE WHEN f.pickup_date < DATE '2025-01-05' THEN 'before' ELSE 'after' END AS period,
           f.service_type,
           count(*) AS trip_count,
           percentile(f.total_fare, 0.5) AS median_total_fare,
           avg(f.price_per_mile) AS avg_ppm,
           avg(f.surcharges) AS avg_surcharges,
           avg(f.base_fare) AS avg_base_fare,
           avg(coalesce(f.airport_fee, 0)) AS avg_airport_fee,
           avg(CASE WHEN f.service_type = 'hvfhv' THEN f.driver_pay END) AS avg_driver_pay,
           avg(CASE WHEN f.service_type = 'hvfhv' THEN f.take_rate END) * 100 AS avg_take_rate_pct
    FROM fact_trips f
    WHERE f.is_valid = TRUE
      AND f.pickup_zone_id IN (SELECT location_id FROM cbd_zones)
      AND f.pickup_date BETWEEN DATE '2024-12-01' AND DATE '2025-01-31'
    GROUP BY period, f.service_type
)
SELECT b.service_type,
       b.trip_count AS trips_before,
       round(b.median_total_fare, 2) AS median_fare_before,
       round(b.avg_ppm, 2) AS price_per_mile_before,
       round(b.avg_surcharges, 2) AS avg_surcharges_before,
       round(b.avg_driver_pay, 2) AS driver_pay_before,
       round(b.avg_take_rate_pct, 1) AS take_rate_pct_before,
       a.trip_count AS trips_after,
       round(a.median_total_fare, 2) AS median_fare_after,
       round(a.avg_ppm, 2) AS price_per_mile_after,
       round(a.avg_surcharges, 2) AS avg_surcharges_after,
       round(a.avg_driver_pay, 2) AS driver_pay_after,
       round(a.avg_take_rate_pct, 1) AS take_rate_pct_after,
       round(a.median_total_fare - b.median_total_fare, 2) AS fare_change_dollars,
       round(a.avg_ppm - b.avg_ppm, 2) AS price_per_mile_change,
       round(a.avg_surcharges - b.avg_surcharges, 2) AS surcharge_change,
       round(a.avg_driver_pay - b.avg_driver_pay, 2) AS driver_pay_change,
       round(a.avg_take_rate_pct - b.avg_take_rate_pct, 1) AS take_rate_change_pct,
       round((a.median_total_fare - b.median_total_fare) / nullif(b.median_total_fare, 0) * 100, 1) AS fare_change_pct,
       round((a.avg_surcharges - b.avg_surcharges) / nullif(b.avg_surcharges, 0) * 100, 1) AS surcharge_change_pct,
       CASE WHEN b.service_type = 'hvfhv' THEN
              CASE WHEN (a.avg_take_rate_pct - b.avg_take_rate_pct) > 1 THEN 'Platform kept more (driver absorbed fee)'
                   WHEN (a.avg_take_rate_pct - b.avg_take_rate_pct) < -1 THEN 'Driver got more (platform absorbed fee)'
                   ELSE 'Passed to rider' END
            ELSE 'N/A - Traditional Taxi' END AS fee_absorption_pattern
FROM ba b
LEFT JOIN ba a ON b.service_type = a.service_type AND a.period = 'after'
WHERE b.period = 'before'
ORDER BY fare_change_pct DESC
"""


@register_analytics("a12_cbd_congestion_fee_impact")
def a12(t: Tables) -> DataFrame:
    """Before/after the CBD congestion-fee epoch — IN-subquery semi-join +
    grouped-CTE self-left-join pivot (reference: 12_cbd_congestion_fee_impact.sql)."""
    return _run_sql(t, ("fact_trips", "dim_zones"), _A12_SQL)


_A13_SQL = """
SELECT d.year, d.month, d.month_name, c.company_name,
       count(*) AS trip_count,
       percentile(f.take_rate, 0.25) * 100 AS p25_take_rate,
       percentile(f.take_rate, 0.5) * 100 AS median_take_rate,
       percentile(f.take_rate, 0.75) * 100 AS p75_take_rate,
       avg(f.take_rate) * 100 AS avg_take_rate,
       stddev(f.take_rate) * 100 AS stddev_take_rate,
       (percentile(f.take_rate, 0.75) - percentile(f.take_rate, 0.25)) * 100 AS iqr_take_rate
FROM fact_trips f
JOIN dim_date d ON f.pickup_date = d.date_id
JOIN dim_hvfhs_company c ON f.hvfhs_license_num = c.hvfhs_license_num
WHERE f.service_type = 'hvfhv' AND f.is_valid = TRUE AND f.take_rate BETWEEN 0 AND 1
GROUP BY d.year, d.month, d.month_name, c.company_name
ORDER BY d.year, d.month, c.company_name
"""


@register_analytics("a13_hvfhv_take_rate_variance")
def a13(t: Tables) -> DataFrame:
    """Monthly take-rate distribution per company (reference:
    13_hvfhv_take_rate_variance_analysis.sql — Part A, the active SELECT)."""
    return _run_sql(t, ("fact_trips", "dim_date", "dim_hvfhs_company"), _A13_SQL)


@register_analytics("a13c_take_rate_by_zone")
def a13c(t: Tables) -> DataFrame:
    """Take-rate variance by zone (reference: 13 Part B — geographic
    factors; HAVING count >= 100, Unknown borough excluded)."""
    f, z, c = _valid(t["fact_trips"]), t["dim_zones"], t["dim_hvfhs_company"]
    return (
        f.filter((col("service_type") == "hvfhv") & col("take_rate").between(0, 1))
        .join(broadcast(z), f.pickup_zone_id == z.location_id)
        .filter(col("borough") != "Unknown")
        .join(broadcast(c), "hvfhs_license_num")
        .groupBy("zone", "borough", "service_zone", "company_name")
        .agg(
            F.count("*").alias("trip_count"),
            (F.percentile("take_rate", lit(0.5)) * 100).alias("median_take_rate"),
            (F.stddev("take_rate") * 100).alias("stddev_take_rate"),
            F.avg("trip_distance_miles").alias("avg_trip_distance"),
            F.avg("total_fare").alias("avg_total_fare"),
        )
        .filter(col("trip_count") >= 100)
        .orderBy(F.desc("stddev_take_rate"))
        .limit(30)
    )


@register_analytics("a13d_take_rate_by_hour")
def a13d(t: Tables) -> DataFrame:
    """Take-rate variance by hour (reference: 13 Part C — temporal
    factors)."""
    f, dt, c = _valid(t["fact_trips"]), t["dim_time"], t["dim_hvfhs_company"]
    return (
        f.filter((col("service_type") == "hvfhv") & col("take_rate").between(0, 1))
        .join(broadcast(dt), f.pickup_hour == dt.hour)
        .join(broadcast(c), "hvfhs_license_num")
        .groupBy(
            "hour",
            col("hour_12").alias("hour_label"),
            col("is_rush_hour").alias("is_peak_hour"),
            "company_name",
        )
        .agg(
            F.count("*").alias("trip_count"),
            (F.percentile("take_rate", lit(0.5)) * 100).alias("median_take_rate"),
            (F.stddev("take_rate") * 100).alias("stddev_take_rate"),
        )
        .orderBy("hour", "company_name")
    )


@register_analytics("a13b_take_rate_by_trip_length")
def a13b(t: Tables) -> DataFrame:
    """Take-rate by trip-length bucket (reference: 13 Part D — the
    CASE-bucketed GROUP BY variant)."""
    f, c = _valid(t["fact_trips"]), t["dim_hvfhs_company"]
    bucket = (
        when(col("trip_distance_miles") < 2, "1. Short (<2 mi)")
        .when(col("trip_distance_miles") < 5, "2. Medium (2-5 mi)")
        .when(col("trip_distance_miles") < 10, "3. Long (5-10 mi)")
        .otherwise("4. Very Long (>10 mi)")
    )
    return (
        f.filter((col("service_type") == "hvfhv") & col("take_rate").between(0, 1))
        .join(broadcast(c), "hvfhs_license_num")
        .groupBy(bucket.alias("trip_length_category"), "company_name")
        .agg(
            F.count("*").alias("trip_count"),
            (F.percentile("take_rate", lit(0.25)) * 100).alias("p25_take_rate"),
            (F.percentile("take_rate", lit(0.5)) * 100).alias("median_take_rate"),
            (F.percentile("take_rate", lit(0.75)) * 100).alias("p75_take_rate"),
            (F.avg("take_rate") * 100).alias("avg_take_rate"),
            F.avg("trip_distance_miles").alias("avg_distance"),
            F.avg("total_fare").alias("avg_fare"),
        )
        .orderBy("trip_length_category", "company_name")
    )


_A14_SQL = """
WITH daily_zone_metrics AS (
    SELECT f.pickup_date, z.zone, z.borough, f.service_type,
           count(*) AS trip_count,
           avg(f.price_per_mile) AS avg_price_per_mile,
           avg(f.total_fare) AS avg_total_fare,
           sum(f.total_fare) AS total_revenue
    FROM fact_trips f
    JOIN dim_zones z ON f.pickup_zone_id = z.location_id
    WHERE f.is_valid = TRUE AND f.price_per_mile BETWEEN 0.5 AND 50 AND z.borough != 'Unknown'
    GROUP BY f.pickup_date, z.zone, z.borough, f.service_type
),
zone_day_totals AS (
    SELECT pickup_date, zone, borough,
           sum(trip_count) AS total_trips, sum(total_revenue) AS total_revenue
    FROM daily_zone_metrics
    GROUP BY pickup_date, zone, borough
),
share AS (
    SELECT m.pickup_date, m.zone, m.borough, m.service_type,
           m.trip_count, t.total_trips,
           -- 100e0: a 100.0 literal is DECIMAL in Spark SQL and would make
           -- every downstream share column DecimalType (the reference SQL
           -- runs in an engine where it is DOUBLE)
           round(m.trip_count * 100e0 / nullif(t.total_trips, 0), 2) AS market_share_pct,
           round(m.avg_price_per_mile, 2) AS price_per_mile
    FROM daily_zone_metrics m
    JOIN zone_day_totals t ON m.pickup_date = t.pickup_date AND m.zone = t.zone
    WHERE t.total_trips >= 50
),
quartile_dates AS (
    -- interpolated percentile over dates via day-number (Spark's percentile
    -- rejects DATE).  The reference's PERCENTILE_CONT over dates yields an
    -- interpolated TIMESTAMP; for a DATE column d (midnight-valued):
    --   d <= interp_ts  ⟺  d <= floor_day(interp_ts)
    --   d >= interp_ts  ⟺  d >= ceil_day(interp_ts)
    -- so floor for the early cut and ceil for the late cut reproduce the
    -- reference comparisons exactly.
    SELECT date_add(DATE '1970-01-01',
                    CAST(floor(percentile(datediff(pickup_date, DATE '1970-01-01'), 0.25)) AS INT)) AS q1,
           date_add(DATE '1970-01-01',
                    CAST(ceil(percentile(datediff(pickup_date, DATE '1970-01-01'), 0.75)) AS INT)) AS q3
    FROM share
),
share_q AS (
    -- Spark disallows scalar subqueries inside aggregate arguments
    -- (AGGREGATE_FUNCTION_WITH_NONDETERMINISTIC_EXPRESSION); a 1-row cross
    -- join is the equivalent plan (broadcast nested loop of a scalar)
    SELECT s.*, q.q1, q.q3 FROM share s CROSS JOIN quartile_dates q
),
changes AS (
    SELECT zone, borough, service_type,
           avg(CASE WHEN pickup_date <= q1 THEN market_share_pct END) AS early_market_share,
           avg(CASE WHEN pickup_date <= q1 THEN price_per_mile END) AS early_price,
           avg(CASE WHEN pickup_date >= q3 THEN market_share_pct END) AS late_market_share,
           avg(CASE WHEN pickup_date >= q3 THEN price_per_mile END) AS late_price,
           avg(market_share_pct) AS avg_market_share,
           avg(price_per_mile) AS avg_price,
           count(DISTINCT pickup_date) AS days_active,
           sum(trip_count) AS total_trips
    FROM share_q
    GROUP BY zone, borough, service_type
    HAVING count(DISTINCT pickup_date) >= 10
),
relative AS (
    SELECT c.*,
           round(late_market_share - early_market_share, 2) AS share_change_pct,
           round(late_price - early_price, 2) AS price_change_dollars,
           round((late_price - early_price) / nullif(early_price, 0) * 100e0, 1) AS price_change_pct,
           round(avg_price - avg(avg_price) OVER (PARTITION BY zone), 2) AS price_premium_vs_zone,
           CASE WHEN late_market_share - early_market_share > 5 THEN 'Gaining Share'
                WHEN late_market_share - early_market_share < -5 THEN 'Losing Share'
                ELSE 'Stable' END AS share_trend,
           CASE WHEN avg_price > avg(avg_price) OVER (PARTITION BY zone) * 1.1 THEN 'Premium Priced'
                WHEN avg_price < avg(avg_price) OVER (PARTITION BY zone) * 0.9 THEN 'Discount Priced'
                ELSE 'Market Priced' END AS pricing_position
    FROM changes c
)
SELECT zone, borough, service_type,
       round(early_market_share, 1) AS early_share_pct,
       round(late_market_share, 1) AS late_share_pct,
       share_change_pct,
       share_trend,
       round(early_price, 2) AS early_price_per_mile,
       round(late_price, 2) AS late_price_per_mile,
       price_change_dollars,
       price_change_pct,
       pricing_position,
       price_premium_vs_zone,
       total_trips,
       days_active,
       CASE WHEN share_trend = 'Gaining Share' AND pricing_position = 'Discount Priced'
                THEN '✓ Gaining via Lower Price'
            WHEN share_trend = 'Gaining Share' AND pricing_position = 'Premium Priced'
                THEN '✓ Gaining Despite Higher Price (Quality/Service)'
            WHEN share_trend = 'Losing Share' AND pricing_position = 'Premium Priced'
                THEN '✗ Losing due to High Price'
            WHEN share_trend = 'Losing Share' AND pricing_position = 'Discount Priced'
                THEN '✗ Losing Despite Low Price (Quality Issues?)'
            ELSE 'Stable Market' END AS competitive_insight
FROM relative
WHERE total_trips >= 500
ORDER BY abs(share_change_pct) DESC, zone, service_type
LIMIT 100
"""


@register_analytics("a14_market_share_shift_vs_pricing")
def a14(t: Tables) -> DataFrame:
    """Market-share shift vs relative pricing — scalar agg subqueries (A9)
    inside CASE inside AVG + per-zone window (W2)
    (reference: 14_market_share_shift_vs_pricing.sql).

    The `percentile(pickup_date, q)` scalar subqueries mirror the
    reference's PERCENTILE_CONT over dates — Spark's percentile works on
    dates via implicit numeric; we cast explicitly for safety in the view.
    """
    return _run_sql(t, ("fact_trips", "dim_zones"), _A14_SQL)
