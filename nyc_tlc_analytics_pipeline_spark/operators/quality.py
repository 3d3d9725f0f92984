"""Data-quality checks over the raw service tables.

Re-expression of the reference's four aggregate checks per table
(reference: src/transformations/quality_checks.py:17-186) as single-pass
global aggregations (SURVEY §2.4 A11) — each check is one ``df.agg(...)``
job, no shuffle beyond the final partial-merge.

The metrics sink mirrors ``data_quality_metrics``
(reference: sql/ddl/03_fact_tables.sql:70-95) as an append-only table with
the same idempotency contract: re-running a service's checks replaces its
prior rows (quality_checks.py:202-210).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit, when

from ..core.config import QualityThresholds
from ..functions.scalar import to_epoch_seconds

# per-service column mapping (quality_checks.py:22-26,66-77,106-121,157)
_SERVICE_COLS = {
    "yellow": {
        "fare": "total_amount",
        "pickup": "tpep_pickup_datetime",
        "dropoff": "tpep_dropoff_datetime",
        "distance": "trip_distance",
    },
    "green": {
        "fare": "total_amount",
        "pickup": "lpep_pickup_datetime",
        "dropoff": "lpep_dropoff_datetime",
        "distance": "trip_distance",
    },
    "hvfhv": {
        "fare": "base_passenger_fare",
        "pickup": "pickup_datetime",
        "dropoff": "dropoff_datetime",
        "distance": "trip_miles",
    },
}


@dataclass
class CheckResult:
    check_type: str
    service_type: str
    total_rows: int
    passed_rows: int
    failed_rows: int
    failure_rate: float
    details: dict


def _one(df: DataFrame) -> dict:
    return df.collect()[0].asDict()


def check_fares(raw: DataFrame, service: str, q: QualityThresholds) -> CheckResult:
    """Negative + excessive fares (quality_checks.py:17-59)."""
    fare = col(_SERVICE_COLS[service]["fare"])
    r = _one(
        raw.agg(
            F.count("*").alias("total"),
            F.sum(when(fare < 0, 1).otherwise(0)).alias("negative"),
            F.sum(when(fare > q.max_fare, 1).otherwise(0)).alias("excessive"),
            F.min(fare).alias("min_fare"),
            F.max(fare).alias("max_fare"),
            F.avg(fare).alias("avg_fare"),
        )
    )
    failed = (r["negative"] or 0) + (r["excessive"] or 0)
    return CheckResult(
        "fare_validation",
        service,
        r["total"],
        r["total"] - failed,
        failed,
        failed / r["total"] if r["total"] else 0.0,
        {
            "negative_fares": r["negative"],
            "excessive_fares": r["excessive"],
            "min_fare": r["min_fare"],
            "max_fare": r["max_fare"],
            "avg_fare": r["avg_fare"],
        },
    )


def check_timestamps(raw: DataFrame, service: str, q: QualityThresholds) -> CheckResult:
    """Dropoff-before-pickup + NULL timestamps (quality_checks.py:61-100)."""
    cols = _SERVICE_COLS[service]
    pickup, dropoff = col(cols["pickup"]), col(cols["dropoff"])
    r = _one(
        raw.agg(
            F.count("*").alias("total"),
            F.sum(when(dropoff < pickup, 1).otherwise(0)).alias("invalid_order"),
            F.sum(when(pickup.isNull() | dropoff.isNull(), 1).otherwise(0)).alias("nulls"),
        )
    )
    failed = (r["invalid_order"] or 0) + (r["nulls"] or 0)
    return CheckResult(
        "timestamp_validation",
        service,
        r["total"],
        r["total"] - failed,
        failed,
        failed / r["total"] if r["total"] else 0.0,
        {"invalid_order": r["invalid_order"], "null_timestamps": r["nulls"]},
    )


def check_realistic_speed(raw: DataFrame, service: str, q: QualityThresholds) -> CheckResult:
    """Speed > max_speed_mph over positive-distance rows
    (quality_checks.py:102-151; note the WHERE distance > 0 scope)."""
    cols = _SERVICE_COLS[service]
    pickup, dropoff, distance = col(cols["pickup"]), col(cols["dropoff"]), col(cols["distance"])
    seconds = to_epoch_seconds(dropoff) - to_epoch_seconds(pickup)
    speeding = (
        (distance > 0) & (seconds > 0) & (distance / (seconds / 3600.0) > q.max_speed_mph)
    )
    scoped = raw.filter(distance > 0)
    r = _one(
        scoped.agg(
            F.count("*").alias("total"),
            F.sum(when(speeding, 1).otherwise(0)).alias("excessive"),
        )
    )
    failed = r["excessive"] or 0
    return CheckResult(
        "speed_validation",
        service,
        r["total"],
        r["total"] - failed,
        failed,
        failed / r["total"] if r["total"] else 0.0,
        {"excessive_speed": failed, "max_speed_mph": q.max_speed_mph},
    )


def check_distance(raw: DataFrame, service: str, q: QualityThresholds) -> CheckResult:
    """Negative + excessive distances (quality_checks.py:153-186)."""
    distance = col(_SERVICE_COLS[service]["distance"])
    r = _one(
        raw.agg(
            F.count("*").alias("total"),
            F.sum(when(distance < 0, 1).otherwise(0)).alias("negative"),
            F.sum(when(distance > q.max_distance_miles, 1).otherwise(0)).alias("excessive"),
            F.avg(distance).alias("avg_distance"),
        )
    )
    failed = (r["negative"] or 0) + (r["excessive"] or 0)
    return CheckResult(
        "distance_validation",
        service,
        r["total"],
        r["total"] - failed,
        failed,
        failed / r["total"] if r["total"] else 0.0,
        {
            "negative_distance": r["negative"],
            "excessive_distance": r["excessive"],
            "avg_distance": r["avg_distance"],
        },
    )


def run_all_checks(
    raw: DataFrame, service: str, q: QualityThresholds | None = None
) -> list[CheckResult]:
    """The reference's four checks in order (quality_checks.py:188-199)."""
    q = q or QualityThresholds()
    return [
        check_fares(raw, service, q),
        check_timestamps(raw, service, q),
        check_realistic_speed(raw, service, q),
        check_distance(raw, service, q),
    ]


def metrics_df(spark: SparkSession, results: list[CheckResult]) -> DataFrame:
    """CheckResults → data_quality_metrics rows (S11 parameterized insert;
    quality_checks.py:212-231)."""
    rows = [
        (
            f"raw_{r.service_type}_{r.check_type}_{r.total_rows}",
            r.service_type,
            r.check_type,
            r.total_rows,
            r.passed_rows,
            r.failed_rows,
            float(r.failure_rate),
            str(r.details),
        )
        for r in results
    ]
    return spark.createDataFrame(
        rows,
        "check_id string, service_type string, check_type string, total_rows long, "
        "passed_rows long, failed_rows long, failure_rate double, details string",
    ).withColumn("check_timestamp", F.current_timestamp())


def overall_quality_pct(results: list[CheckResult]) -> float:
    """Σpassed / Σtotal across checks (quality_checks.py:233-238)."""
    total = sum(r.total_rows for r in results)
    passed = sum(r.passed_rows for r in results)
    return passed / total * 100.0 if total else 0.0
