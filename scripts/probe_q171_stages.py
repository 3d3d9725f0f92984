"""Stage-level decomposition of q171 (adaptive IVF probe) at sf0.1 and
the BENCH_SCALE-materialized Nx fixture — VERDICT r11 item 2: prove
where the 100x growth goes instead of asserting 'linear floor +
amortization'.

Stages (each forced with its own action, shared frames checkpointed the
way the operator does):
  truth     — one brute-force panel x corpus top-k pass
  assign    — ONE nearest-centroid bucket assignment over the corpus
              (K cosines/row; shared by both configs after the r12
              restructure — the pre-r12 form paid this twice)
  fixed     — candidate join + recall report for the fixed_4 rule
  adaptive  — candidate join + recall report for the adaptive rule
  whole     — the registered q171 end-to-end, for cross-check

    BENCH_SCALE=100 python scripts/probe_q171_stages.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_COPIES = int(os.environ.get("BENCH_SCALE", "100"))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    from bench import host_calibration, materialize_scaled
    from nyc_tlc_analytics_pipeline_spark.core.session import build_session
    from nyc_tlc_analytics_pipeline_spark.operators import similarity as sim
    from nyc_tlc_analytics_pipeline_spark.operators.similarity import (
        _assigned_corpus,
        _brute_truth,
        _config_report,
        _ivf_candidates,
        _ivf_candidates_adaptive,
        as_double_array,
        audit_summary,
    )
    from nyc_tlc_analytics_pipeline_spark.plans.catalog import QUERIES
    from nyc_tlc_analytics_pipeline_spark.sources.testdata import (
        load_table_parallel,
    )

    print(f"host calibration: {host_calibration():.4f}s")
    spark = build_session(app_name="q171-stages", master=f"local[{CPUS}]")
    scaled = materialize_scaled(spark, SRC, N_COPIES)

    def stages(sf_dir: str) -> dict[str, float]:
        emb = load_table_parallel(spark, sf_dir, "embeddings")
        panel = emb.filter((col("vec_id") % 25 == 0) & (col("vec_id") < 500))
        out: dict[str, float] = {}

        def timed(label: str, fn):
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            t0 = time.perf_counter()
            r = fn()
            out[label] = round(time.perf_counter() - t0, 2)
            return r

        cents = timed("centroids", lambda: sim.ivf_centroids(emb, k=16))
        q = panel.select(
            col("vec_id").alias("query_id"),
            as_double_array("embedding").alias("__qv"),
        )
        corpus = emb.select(col("vec_id"), as_double_array("embedding").alias("__v"))
        truth = _brute_truth(corpus, q, 10, "vec_id").localCheckpoint(
            eager=False
        )
        timed("truth", truth.count)
        assigned = _assigned_corpus(corpus, cents)
        timed("assign", assigned.count)
        timed(
            "fixed",
            lambda: audit_summary(
                _config_report(
                    corpus,
                    q,
                    truth,
                    _ivf_candidates(
                        corpus, q, cents, 4, "vec_id", assigned=assigned
                    ),
                    10,
                    "vec_id",
                ),
                "ivf_probe",
                "fixed_4",
            ).collect(),
        )
        timed(
            "adaptive",
            lambda: audit_summary(
                _config_report(
                    corpus,
                    q,
                    truth,
                    _ivf_candidates_adaptive(
                        corpus, q, cents, 0.05, 16, "vec_id", assigned=assigned
                    ),
                    10,
                    "vec_id",
                ),
                "ivf_probe",
                "adaptive_0.05",
            ).collect(),
        )
        timed(
            "whole_q171",
            lambda: QUERIES["q171_adaptive_ivf_probe"].build(spark, sf_dir).collect(),
        )
        return out

    # warmup (JIT + parquet footer caches) before either measured pass
    QUERIES["q171_adaptive_ivf_probe"].build(spark, SRC).collect()
    base = stages(SRC)
    big = stages(scaled)
    print(f"\n{'stage':12s} {'sf0.1':>8s} {f'{N_COPIES}x':>9s}   growth")
    for k in base:
        g = big[k] / base[k] if base[k] else float("inf")
        print(f"{k:12s} {base[k]:7.2f}s {big[k]:8.2f}s  {g:5.1f}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
