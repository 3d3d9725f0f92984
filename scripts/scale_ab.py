#!/usr/bin/env python
"""Interleaved-capable scaled A/B probe with per-query shuffle-bytes
evidence (VERDICT r14 item 1: demonstrate the r14/r15 shuffle-bytes
changes at sf1, where they stop being invisible under page cache).

Runs the named catalog queries against a scaled data dir under the
bench.py protocol (cold + honest-recompute warm windows, pins released
between windows, per-query calibration), with the Spark event log
enabled; after the run it parses the event log and reports, per query
window, the total shuffle bytes WRITTEN and READ by its jobs (mapped
stage->window via the job-description property).

Usage (run once per code tree, alternating for the interleave):
    SCALE_AB_DIR=/root/repo/.bench_scaled/sf0.1x10 \
    SCALE_AB_QUERIES=q25,q28,q68,q75,q91 \
    python scripts/scale_ab.py

Prints one JSON line.  This is a measurement tool: nothing here caches
results across runs; every window computes from the scaled parquet.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_event_logs(log_dir: str) -> dict[str, dict[str, int]]:
    """description -> {write_bytes, read_bytes, shuffle_records} summed
    over every task of every stage of the jobs carrying that
    description."""
    stage_desc: dict[int, str] = {}
    out: dict[str, dict[str, int]] = {}
    for path in glob.glob(os.path.join(log_dir, "*")):
        if os.path.isdir(path):
            continue
        with open(path, errors="replace") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                k = ev.get("Event")
                if k == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )
                    for sid in ev.get("Stage IDs", []):
                        stage_desc[sid] = desc
                elif k == "SparkListenerTaskEnd":
                    desc = stage_desc.get(ev.get("Stage ID"), "")
                    m = ev.get("Task Metrics") or {}
                    w = (m.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Bytes Written", 0
                    )
                    r_ = m.get("Shuffle Read Metrics") or {}
                    r = r_.get("Remote Bytes Read", 0) + r_.get(
                        "Local Bytes Read", 0
                    )
                    d = out.setdefault(
                        desc, {"write_bytes": 0, "read_bytes": 0}
                    )
                    d["write_bytes"] += int(w or 0)
                    d["read_bytes"] += int(r or 0)
    return out


def main() -> None:
    sf_dir = os.environ["SCALE_AB_DIR"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)
    subs = os.environ.get("SCALE_AB_QUERIES", "q25,q28,q68,q75,q91").split(",")
    runs_tag = os.environ.get("SCALE_AB_TAG", "run")

    from bench import host_calibration

    try:
        from nyc_tlc_analytics_pipeline_spark.core.pins import release_pins
    except ImportError:  # r13 code tree: no pin registry yet
        def release_pins():
            return 0
    from nyc_tlc_analytics_pipeline_spark.core.session import build_session
    from nyc_tlc_analytics_pipeline_spark.plans.catalog import QUERIES

    log_dir = os.path.join("/tmp", f"scale_ab_events_{runs_tag}_{os.getpid()}")
    os.makedirs(log_dir, exist_ok=True)
    spark = build_session(
        app_name=f"scale-ab-{runs_tag}",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            # single plain-text log: Spark 4 defaults to a rolling
            # zstd-compressed directory, which the parser below skips
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    cal_pre = round(host_calibration(), 4)

    names = [
        n for n in sorted(QUERIES) if any(s in n for s in subs)
    ]

    def quiesce() -> None:
        # honest-recompute warm on BOTH code trees: drop every cached
        # entry (r14+ pins register persist() frames; r13's persist()
        # frames are cache-manager entries too) so each timed window
        # computes from the scaled parquet
        release_pins()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.7)

    # JVM warm-up on the cheapest selected query
    QUERIES[names[0]].build(spark, sf_dir).collect()
    quiesce()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    mid_cal: dict[str, float] = {}
    for name in names:
        sc = spark.sparkContext
        sc.setJobDescription(f"{name}|cold")
        t0 = time.perf_counter()
        QUERIES[name].build(spark, sf_dir).collect()
        cold[name] = round(time.perf_counter() - t0, 3)
        quiesce()
        sc.setJobDescription(f"{name}|warm")
        t0 = time.perf_counter()
        QUERIES[name].build(spark, sf_dir).collect()
        warm[name] = round(time.perf_counter() - t0, 3)
        sc.setJobDescription(None)
        quiesce()
        mid_cal[name] = round(host_calibration(), 4)

    spark.stop()
    time.sleep(1.0)
    shuffles = parse_event_logs(log_dir)
    per_q = {
        n: {
            "cold_s": cold[n],
            "warm_s": warm[n],
            "warm_shuffle_write_mb": round(
                shuffles.get(f"{n}|warm", {}).get("write_bytes", 0) / 1e6, 1
            ),
            "warm_shuffle_read_mb": round(
                shuffles.get(f"{n}|warm", {}).get("read_bytes", 0) / 1e6, 1
            ),
        }
        for n in names
    }
    print(
        json.dumps(
            {
                "tag": runs_tag,
                "sf_dir": sf_dir,
                "cpus": int(cpus),
                "cold_total": round(sum(cold.values()), 3),
                "warm_total": round(sum(warm.values()), 3),
                "queries": per_q,
                "calibration_pre": cal_pre,
                "calibration_post": round(host_calibration(), 4),
                "queries_calibration": mid_cal,
                "calibration_mid_max": max(mid_cal.values()) if mid_cal else None,
                "event_log_dir": log_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
