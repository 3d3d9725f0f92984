"""Job-level 100x spot probe for curate-e2e (VERDICT r12 item 3), both
faces.  The shared .bench_scaled token-salted fixture is WRONG for this
job — the salt lengthens tokens, so 99/100 copies die at the rules gate
and the funnel degenerates to the 1x workload (observed: identical
shards at both scales).  Two purpose-built fixtures instead:

1. **batch face** — EXACT-copy 100x corpus (ids remapped, text
   untouched): every copy passes rules/perplexity identically, so the
   funnel carries the full 100x load and the dedup stage sees the
   realistic shape of a crawl with 100x duplication (copy clusters of
   ~N_COPIES members through MinHash banding + keep-best closure).
2. **incremental face** — the 1x run's FINAL pool replicated 100x under
   a length-preserving character cipher (rotate letters by i%26, digits
   by i//26 — token lengths, rule stats and within-copy structure
   identical; vocabularies disjoint across cipher keys), indexed once
   by stage_index; then ONE fixed batch (500 raw sf0.1 docs, remapped
   ids) timed against the 1x standing run and the 100x standing dir.
   This isolates exactly the batch-vs-100x-standing shape.

Also audits the incremental gate's 100x-standing plans with
`scripts/broadcast_audit.audit_plan` (the q95/q167 estimate-divergence
class).  Resumable: pin CURATE_PROBE_ROOT and the jobs' stage journals
skip completed work on re-invocation.

    BENCH_SCALE=100 CURATE_PROBE_ROOT=... python scripts/probe_curate_e2e.py
"""

from __future__ import annotations

import os
import shutil
import string
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
_ID_OFF = 100_000_000  # per-copy doc_id stride; batch sits above all copies
# PROBE_FACES=inc skips the composed-run face (face 1) at N x — the
# r14 three-decade (1000x-standing) probe only needs the incremental
# face, and a 1000x composed funnel run would dominate the wall clock
# for a face already measured at 100x (2.6x, BENCH_SCALING.md r13).
# The 1x composed run always executes: its final pool seeds face 2.
FACES = set(os.environ.get("PROBE_FACES", "run,inc").split(","))


def _cipher(i: int) -> tuple[str, str]:
    # keyspace = 26*10 = 260 distinct keys; beyond 260 copies the keys
    # repeat, so a 1000x standing pool carries ~4 exact-duplicate copies
    # of each text group.  That's intentional at the three-decade scale:
    # a real 100 TB standing corpus is heavily self-duplicated, and the
    # batch's candidate volume should grow with the duplicated buckets
    # it probes — the probe's growth bound reports that honestly.
    letters, digits = string.ascii_lowercase, string.digits
    rl = letters[i % 26 :] + letters[: i % 26]
    rd = digits[(i // 26) % 10 :] + digits[: (i // 26) % 10]
    return letters + digits, rl + rd


def main() -> int:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    from bench import host_calibration
    from broadcast_audit import audit_plan
    from nyc_tlc_analytics_pipeline_spark.core.session import build_session
    from nyc_tlc_analytics_pipeline_spark.curate import CurateJob
    from nyc_tlc_analytics_pipeline_spark.operators import curation, dedup

    print(f"host calibration: {host_calibration():.4f}s", flush=True)
    spark = build_session(app_name="curate-e2e-probe", master=f"local[{CPUS}]")
    root = os.environ.get("CURATE_PROBE_ROOT") or tempfile.mkdtemp(
        prefix="curate_probe_"
    )
    os.makedirs(root, exist_ok=True)
    keep = "CURATE_PROBE_ROOT" in os.environ
    print(f"probe root: {root}  scale: {N_COPIES}x", flush=True)
    docs1 = os.path.join(SRC, "documents.parquet")

    # fixed batch: 500 raw sf0.1 docs, ids clear of every fixture copy
    batch_path = os.path.join(root, "batch.parquet")
    if not os.path.exists(os.path.join(batch_path, "_SUCCESS")):
        (
            spark.read.parquet(docs1)
            .orderBy("doc_id")
            .limit(BATCH_DOCS)
            .withColumn("doc_id", col("doc_id") + F.lit(10_000_000_000))
            .select("doc_id", "source", "lang", "text")
            .write.mode("overwrite")
            .parquet(batch_path)
        )

    # ---- face 1: composed run, 1x then exact-copy Nx ----------------------
    faces = [("1x", docs1)]
    if "run" in FACES:
        docsN = os.path.join(root, f"docs_{N_COPIES}x.parquet")
        if not os.path.exists(os.path.join(docsN, "_SUCCESS")):
            base = spark.read.parquet(docs1).select(
                "doc_id", "source", "lang", "text"
            )
            scaled = base
            for i in range(1, N_COPIES):
                scaled = scaled.unionByName(
                    base.withColumn(
                        "doc_id", col("doc_id") + F.lit(i * _ID_OFF)
                    )
                )
            scaled.repartition(64).write.mode("overwrite").parquet(docsN)
        faces.append((f"{N_COPIES}x", docsN))

    runs: dict[str, float] = {}
    jobs: dict[str, CurateJob] = {}
    for label, path in faces:
        out = os.path.join(root, f"out_{label}")
        job = CurateJob(spark, path, out)
        t0 = time.perf_counter()
        summary = job.run()
        runs[label] = time.perf_counter() - t0
        jobs[label] = job
        print(
            f"run  {label:>5s}: {runs[label]:8.1f}s  shards={summary['shards']}",
            flush=True,
        )
    if "run" in FACES:
        g_run = runs[f"{N_COPIES}x"] / max(runs["1x"], 1e-9)
    else:
        g_run = float("nan")

    # ---- face 2: fixed batch vs 1x standing and vs CIPHERED Nx standing ---
    standing_dir = os.path.join(root, f"standing_{N_COPIES}x")
    sjob = CurateJob(spark, docs1, standing_dir)  # docs_path unused below
    if not os.path.exists(
        os.path.join(standing_dir, "index/lsh_bands/_SUCCESS")
    ):
        final1 = spark.read.parquet(jobs["1x"].path("final"))
        scaled_final = final1
        for i in range(1, N_COPIES):
            src_chars, dst_chars = _cipher(i)
            scaled_final = scaled_final.unionByName(
                final1.withColumn(
                    "doc_id", col("doc_id") + F.lit(i * _ID_OFF)
                ).withColumn("text", F.translate("text", src_chars, dst_chars))
            )
        scaled_final.repartition(64).write.mode("overwrite").parquet(
            sjob.path("final")
        )
        t0 = time.perf_counter()
        idx = sjob.stage_index()
        print(
            f"index build @ {N_COPIES}x standing: "
            f"{time.perf_counter() - t0:.1f}s  {idx}",
            flush=True,
        )

    incs: dict[str, float] = {}
    for label, job in (("1x", jobs["1x"]), (f"{N_COPIES}x", sjob)):
        t0 = time.perf_counter()
        inc = job.run_incremental(batch_path, batch_tag="probe", resume=False)
        incs[label] = time.perf_counter() - t0
        print(
            f"inc  {label:>5s}: {incs[label]:8.1f}s  gate={inc['gate']}"
            f"  appended={inc['appended']}",
            flush=True,
        )
    g_inc = incs[f"{N_COPIES}x"] / max(incs["1x"], 1e-9)
    print(f"\ngrowth @ {N_COPIES}x: run {g_run:.1f}x   incremental {g_inc:.1f}x")

    # ---- broadcast audit over the gate's Nx-standing plans ----------------
    batch = spark.read.parquet(batch_path)
    standing = sjob._standing_pool(exclude_tag="audit")
    lm_stats, bands, segs = sjob._standing_indexes(exclude_tag="audit")
    attr, classified = curation.incremental_gate_attribution(
        batch, standing, sjob.ppl_cutoff, threshold=sjob.threshold,
        lm_stats=lm_stats, standing_bands=bands,
    )
    seg_cls = dedup.incremental_segment_classify(
        batch, segs, "doc_id", "text", sjob.seg_len, group_col=None
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
    if not keep:
        shutil.rmtree(root, ignore_errors=True)
    return 1 if n_explode else 0


if __name__ == "__main__":
    raise SystemExit(main())
