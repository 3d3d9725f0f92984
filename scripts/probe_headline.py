#!/usr/bin/env python
"""Per-query measurement harness for the optimization rounds (guide §1).

For each selected catalog query:

- times the computation against the **noop sink** (guide §1.4 — every
  column of every row is computed and discarded, so the timing excludes
  collect/driver transfer) — cold then warm within the session;
- labels the jobs (`setJobDescription`) so the UI/event log attribute
  work per query;
- optionally writes ``.explain("formatted")`` to ``plans/<tag>/<name>_<suffix>.txt``
  (the judge-checkable plan artifact).

Usage:
    python scripts/probe_headline.py [--plans plans/r14 --suffix before]
                                     [--queries q55,q64] [--runs 2]

Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32).  Prints one JSON line at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="directory for explain artifacts")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--queries", default=None, help="comma substrings filter")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--all", action="store_true", help="every catalog query, not just headline")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)

    from bench import host_calibration

    from nyc_tlc_analytics_pipeline_spark.core.pins import release_pins
    from nyc_tlc_analytics_pipeline_spark.core.session import build_session
    from nyc_tlc_analytics_pipeline_spark.plans.catalog import QUERIES

    spark = build_session(app_name="probe-headline", master=f"local[{cpus}]")

    names = [n for n, s in sorted(QUERIES.items()) if s.headline or args.all]
    if args.queries:
        subs = args.queries.split(",")
        names = [n for n in names if any(s in n for s in subs)]

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def quiesce() -> None:
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)

    # session warm-up on the cheapest query
    QUERIES[names[0]].build(spark, sf_dir).collect()
    quiesce()

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            noop(QUERIES[name].build(spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
            quiesce()
        cal = round(host_calibration(), 4)
        out[name] = {"runs": runs, "warm": runs[-1], "cal": cal}
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = QUERIES[name].build(spark, sf_dir)
            p = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(p, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        release_pins()
        spark.sparkContext.setJobDescription(None)

    total_warm = round(sum(v["warm"] for v in out.values()), 3)
    print(json.dumps({
        "sf_dir": sf_dir, "cpus": int(cpus), "runs": args.runs,
        "warm_total": total_warm,
        "queries": out,
        "cal_max": max(v["cal"] for v in out.values()),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
