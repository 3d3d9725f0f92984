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
    for name in names:
        t0 = time.perf_counter()
        QUERIES[name].build(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline-query wall-clock (sum)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(cpus),
        "n_queries": len(timings),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
