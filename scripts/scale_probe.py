"""Per-operator 10x scale probe: times the given catalog queries warm at
sf0.1 and at the BENCH_SCALE-materialized Nx copy (default 10x ~= sf1),
printing growth factors for BENCH_SCALING.md.

    python scripts/scale_probe.py q65_tfidf_lang_terms q67_weighted_sample ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_COPIES = int(os.environ.get("BENCH_SCALE", "10"))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    from bench import materialize_scaled
    from nyc_tlc_analytics_pipeline_spark.core.session import build_session
    from nyc_tlc_analytics_pipeline_spark.plans.catalog import QUERIES

    names = sys.argv[1:]
    from bench import host_calibration

    # single-thread CPU reference — makes probe tables comparable across
    # sessions/hosts (see BENCH_SCALING.md round-9 calibration note)
    print(f"host calibration: {host_calibration():.4f}s")
    spark = build_session(app_name="scale-probe", master=f"local[{CPUS}]")
    scaled = materialize_scaled(spark, SRC, N_COPIES)
    QUERIES[names[0]].build(spark, SRC).collect()  # JVM warmup

    def _quiesce() -> None:
        # bench.py's measurement hygiene, which at BENCH_SCALE=100 is
        # also a CORRECTNESS condition: each 100x query's broadcast
        # blocks + codegen classes linger on the 8g driver heap until
        # the async ContextCleaner runs, and five back-to-back 100x
        # queries can fail the NEXT broadcast build with
        # "Not enough memory to build and broadcast" (observed on q28
        # after q137/q140/q138/q142 — q28 alone in a fresh session
        # passes in 27s).  GC between queries, outside timed windows.
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.7)

    def warm_time(name: str, sf_dir: str) -> float:
        QUERIES[name].build(spark, sf_dir).collect()  # cold (JIT) pass
        _quiesce()
        t0 = time.perf_counter()
        QUERIES[name].build(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        _quiesce()
        return dt

    print(f"{'query':35s} {'sf0.1 warm':>11s} {f'{N_COPIES}x warm':>9s}  growth")
    for name in names:
        t1 = warm_time(name, SRC)
        tn = warm_time(name, scaled)
        print(f"{name:35s} {t1:10.2f}s {tn:8.2f}s  {tn / t1:5.1f}x", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
