"""Job-level 100x spot probe for curate-e2e (VERDICT r12 item 3): times
the COMPOSED job, both faces, against the materialized Nx fixture —

1. **batch face**: ``CurateJob.run()`` on sf0.1 documents and on the Nx
   copy (growth should track the corpus: the funnel's stages are all
   individually probed linear-ish shapes);
2. **incremental face**: ONE fixed batch (500 sf0.1 docs, ids remapped)
   classified against the completed 1x run and against the completed Nx
   run — the O(batch + matches) contract says this should grow with the
   index SCAN, not re-derive O(standing) artifacts (the round-13
   persisted-index restructure: stage_index + _standing_indexes).

Also plans the incremental gate's frames against the Nx standing run
and runs the broadcast audit (`scripts/broadcast_audit.audit_plan`)
over them — the estimate-vs-reality divergence class q95/q167 proved
is the live failure mode.

    BENCH_SCALE=100 python scripts/probe_curate_e2e.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

N_COPIES = int(os.environ.get("BENCH_SCALE", "100"))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BATCH_DOCS = 500


def main() -> int:
    from pyspark.sql import functions as F

    from bench import host_calibration, materialize_scaled
    from broadcast_audit import audit_plan
    from nyc_tlc_analytics_pipeline_spark.core.session import build_session
    from nyc_tlc_analytics_pipeline_spark.curate import CurateJob
    from nyc_tlc_analytics_pipeline_spark.operators import curation

    print(f"host calibration: {host_calibration():.4f}s", flush=True)
    spark = build_session(app_name="curate-e2e-probe", master=f"local[{CPUS}]")
    scaled = materialize_scaled(spark, SRC, N_COPIES)
    root = tempfile.mkdtemp(prefix="curate_probe_")
    print(f"probe root: {root}", flush=True)

    # one fixed batch for both incremental probes: 500 raw sf0.1 docs,
    # ids remapped clear of both corpora — a realistic mix (some fail
    # rules/ppl, survivors of the base funnel classify dup_vs_corpus,
    # funnel-dropped docs come out 'new')
    batch_path = os.path.join(root, "batch.parquet")
    (
        spark.read.parquet(os.path.join(SRC, "documents.parquet"))
        .orderBy("doc_id")
        .limit(BATCH_DOCS)
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000_000))
        .select("doc_id", "source", "lang", "text")
        .write.mode("overwrite")
        .parquet(batch_path)
    )

    results: dict[str, dict[str, float]] = {"run": {}, "incremental": {}}
    jobs: dict[str, CurateJob] = {}
    for label, sf_dir in (("1x", SRC), (f"{N_COPIES}x", scaled)):
        out = os.path.join(root, f"out_{label}")
        job = CurateJob(
            spark, os.path.join(sf_dir, "documents.parquet"), out
        )
        t0 = time.perf_counter()
        summary = job.run()
        dt = time.perf_counter() - t0
        results["run"][label] = dt
        jobs[label] = job
        print(
            f"run  {label:>5s}: {dt:8.1f}s  shards={summary['shards']}",
            flush=True,
        )
        t0 = time.perf_counter()
        inc = job.run_incremental(batch_path, batch_tag="probe")
        dt = time.perf_counter() - t0
        results["incremental"][label] = dt
        print(
            f"inc  {label:>5s}: {dt:8.1f}s  gate={inc['gate']}"
            f"  appended={inc['appended']}",
            flush=True,
        )

    g_run = results["run"][f"{N_COPIES}x"] / max(results["run"]["1x"], 1e-9)
    g_inc = results["incremental"][f"{N_COPIES}x"] / max(
        results["incremental"]["1x"], 1e-9
    )
    print(f"\ngrowth @ {N_COPIES}x: run {g_run:.1f}x   incremental {g_inc:.1f}x")

    # broadcast audit over the incremental gate's EXECUTED-shape plans
    # against the Nx standing run (plan-only, fresh tag so nothing is
    # journal-skipped)
    big = jobs[f"{N_COPIES}x"]
    batch = spark.read.parquet(batch_path)
    standing = big._standing_pool(exclude_tag="audit")
    lm_stats, bands, segs = big._standing_indexes(exclude_tag="audit")
    attr, classified = curation.incremental_gate_attribution(
        batch, standing, big.ppl_cutoff, threshold=big.threshold,
        lm_stats=lm_stats, standing_bands=bands,
    )
    from nyc_tlc_analytics_pipeline_spark.operators import dedup

    seg_cls = dedup.incremental_segment_classify(
        batch, segs, "doc_id", "text", big.seg_len, group_col=None
    )
    n_explode = 0
    for name, frame in (
        ("inc_gate.attr", attr),
        ("inc_gate.classified", classified),
        ("inc_segment.classify", seg_cls),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        e_hits, f_hits = audit_plan(plan)
        n_explode += len(e_hits)
        status = "OK" if not (e_hits or f_hits) else "FLAG"
        print(f"audit {name:22s} {status}  explode={e_hits}  fact={f_hits}")
    shutil.rmtree(root, ignore_errors=True)
    return 1 if n_explode else 0


if __name__ == "__main__":
    raise SystemExit(main())
