"""Structured-Streaming throughput probe: drain the BENCH_SCALE events
table through the registered streaming pipelines with availableNow
micro-batches and report end-to-end events/second.

    BENCH_SCALE=100 python scripts/stream_probe.py

The numbers answer the §2.10 scale question the batch probes cannot:
does the WATERMARKED, stateful path keep up when the backlog is 100x —
i.e. state stays window/key-bounded and each micro-batch's cost is its
input, not the history.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_COPIES = int(os.environ.get("BENCH_SCALE", "100"))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
FILES_PER_TRIGGER = int(os.environ.get("STREAM_FILES_PER_TRIGGER", "10"))


def main() -> int:
    from bench import materialize_scaled
    from nyc_tlc_analytics_pipeline_spark.core.session import build_session
    from nyc_tlc_analytics_pipeline_spark.streaming import events as ev

    spark = build_session(app_name="stream-probe", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = materialize_scaled(spark, SRC, N_COPIES)
    path = os.path.join(scaled, "events.parquet")
    n_rows = spark.read.parquet(path).count()

    pipelines = {
        # tumbling windowed agg (q20's streaming form)
        "hourly_counts": lambda s: ev.hourly_type_counts_stream(s),
        # overlapping sliding windows (q37's streaming form)
        "sliding_value": lambda s: ev.sliding_value_stream(s),
        # watermarked exactly-once dedup (state = keys inside watermark)
        "dedup": lambda s: ev.dedup_stream(s),
    }
    out: dict[str, dict] = {}
    for name, build in pipelines.items():
        stream = build(
            ev.read_event_stream(
                spark, path, max_files_per_trigger=FILES_PER_TRIGGER
            )
        )
        t0 = time.perf_counter()
        q = (
            stream.writeStream.format("noop")
            .option(
                "checkpointLocation",
                f"/tmp/stream_probe_ckpt/{name}-{time.time_ns()}",
            )
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.perf_counter() - t0
        batches = q.lastProgress["batchId"] + 1 if q.lastProgress else None
        out[name] = {
            "secs": round(dt, 1),
            "events_per_sec": int(n_rows / dt),
            "micro_batches": batches,
        }
        print(f"{name:15s} {dt:7.1f}s  {int(n_rows/dt):>10,} ev/s", flush=True)
    print(json.dumps({"rows": n_rows, "scale": N_COPIES, "pipelines": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
