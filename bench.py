#!/usr/bin/env python
"""Benchmark harness: times the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of all timed queries (collect() forces
execution). Set BENCH_ALL=1 to time every catalog query, not just the
headline set."""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)

    from nyc_tlc_analytics_pipeline_spark.core.session import build_session
    from nyc_tlc_analytics_pipeline_spark.plans.catalog import QUERIES

    spark = build_session(app_name="bench", master=f"local[{cpus}]")

    names = [
        n
        for n, spec in sorted(QUERIES.items())
        if spec.headline or os.environ.get("BENCH_ALL") == "1"
    ]

    # warm the JVM + parquet footers with the cheapest query once
    QUERIES[names[0]].build(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        QUERIES[name].build(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        # second run: whole-stage-codegen classes are JIT-compiled, so this
        # is the steady-state (scale-relevant) latency
        t0 = time.perf_counter()
        QUERIES[name].build(spark, sf_dir).collect()
        warm[name] = round(time.perf_counter() - t0, 3)

    # ingest/standardize throughput: generate yellow-shaped rows with pure
    # Spark expressions, run the full standardize+dedup transform, count.
    # Comparable to the reference's raw-load throughput (BASELINE.md:
    # ~49M rows in ≤2 min ≈ 400k+ rows/s single node).
    from pyspark.sql import functions as F

    from nyc_tlc_analytics_pipeline_spark.operators.standardize import build_fact_trips

    n_rows = int(os.environ.get("BENCH_INGEST_ROWS", "2000000"))
    base_ts = F.lit("2025-01-01 00:00:00").cast("timestamp")
    raw = spark.range(n_rows).select(
        (F.col("id") % 2 + 1).cast("int").alias("VendorID"),
        (base_ts + F.make_interval(secs=(F.col("id") % 2592000).cast("double"))).alias(
            "tpep_pickup_datetime"
        ),
        (
            base_ts
            + F.make_interval(secs=((F.col("id") % 2592000) + 300 + F.col("id") % 3600).cast("double"))
        ).alias("tpep_dropoff_datetime"),
        F.lit(1.0).alias("passenger_count"),
        ((F.col("id") % 1800) / 100.0 + 0.3).alias("trip_distance"),
        F.lit(1.0).alias("RatecodeID"),
        F.lit("N").alias("store_and_fwd_flag"),
        (F.col("id") % 260 + 1).cast("int").alias("PULocationID"),
        (F.col("id") % 259 + 1).cast("int").alias("DOLocationID"),
        F.lit(1).alias("payment_type"),
        ((F.col("id") % 4000) / 100.0 + 3.0).alias("fare_amount"),
        F.lit(0.5).alias("extra"),
        F.lit(0.5).alias("mta_tax"),
        ((F.col("id") % 700) / 100.0).alias("tip_amount"),
        F.lit(0.0).alias("tolls_amount"),
        F.lit(0.3).alias("improvement_surcharge"),
        ((F.col("id") % 4000) / 100.0 + 6.8).alias("total_amount"),
        F.lit(2.5).alias("congestion_surcharge"),
        F.lit(0.0).alias("Airport_fee"),
        F.lit("bench.parquet").alias("source_file"),
    )
    t0 = time.perf_counter()
    fact_rows = build_fact_trips(yellow=raw).count()
    ingest_secs = time.perf_counter() - t0
    ingest_rows_per_sec = int(fact_rows / ingest_secs)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline-query wall-clock (sum)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(cpus),
        "n_queries": len(timings),
        "ingest_rows": fact_rows,
        "ingest_secs": round(ingest_secs, 3),
        "ingest_rows_per_sec": ingest_rows_per_sec,
        "queries_warm": warm,
        "warm_total": round(sum(warm.values()), 3),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
