"""10× growth probe for leakage_safe_splits in its two pair-source
modes (VERDICT r5 #4): warm-times the full split+summary plan at sf0.1
and at the BENCH_SCALE-materialized 10× copy, MinHash (production
default) vs exact Jaccard (oracle-gated mode).

    python scripts/probe_q77_minhash.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_COPIES = int(os.environ.get("BENCH_SCALE", "10"))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
THRESHOLD = 0.4


def main() -> int:
    from pyspark.sql import functions as F

    from bench import materialize_scaled
    from nyc_tlc_analytics_pipeline_spark.core.session import build_session
    from nyc_tlc_analytics_pipeline_spark.operators import sampling
    from nyc_tlc_analytics_pipeline_spark.sources.testdata import load_table

    spark = build_session(app_name="q77-probe", master=f"local[{CPUS}]")
    scaled = materialize_scaled(spark, SRC, N_COPIES)

    def build(sf_dir: str, mode: str):
        # rebuilt per timed run: connected_components localCheckpoints,
        # so re-collecting ONE DataFrame would skip the pair build
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        return (
            sampling.leakage_safe_splits(
                docs, "doc_id", "text",
                {"train": 0.9, "val": 0.05, "test": 0.05},
                salt="leak", pair_source=mode, threshold=THRESHOLD,
            )
            .groupBy("split")
            .agg(F.count("*").alias("n_docs"), F.count_distinct("g").alias("n_groups"))
        )

    def run(sf_dir: str, mode: str) -> float:
        build(sf_dir, mode).collect()  # cold/JIT pass
        t0 = time.perf_counter()
        rows = build(sf_dir, mode).collect()
        dt = time.perf_counter() - t0
        assert sum(r.n_docs for r in rows) > 0
        return dt

    print(f"{'mode':10s} {'sf0.1 warm':>11s} {f'{N_COPIES}x warm':>9s}  growth")
    for mode in ("minhash", "jaccard"):
        t1 = run(SRC, mode)
        tn = run(scaled, mode)
        print(f"{mode:10s} {t1:10.2f}s {tn:8.2f}s  {tn / t1:5.1f}x", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
