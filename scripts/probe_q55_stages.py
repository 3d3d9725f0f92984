"""Stage-level decomposition of q55 (curation funnel v2) at sf0.1 —
VERDICT r13 item 6: q55 has been the #1 headline for three rounds
(5.48 -> 4.09 s); prove where the remaining cost sits before cutting
further or declaring the floor.

Cumulative-prefix stages (each forced with its own count/collect, pins
released between measurements so no stage rides another's cache):

  gate     — scan + tokenize + Gopher rules + bench split (the pool pin)
  decontam — + 4-gram explode, broadcast-gated semi-join vs the bench
             gram set, anti-join back (q55's documented dominant term)
  mixture  — + two-pass mixture_sample (quota aggregate + windowed main)
  pack     — + greedy applyInPandas packer
  whole    — the registered q55 end-to-end (cross-check: ~= pack)

Per-stage DELTAS are the report; each row carries the calibration probe
measured right after it (the r14 mid-run-load idiom — a burst lands on
a named stage, not on the whole table).  Run twice: the second pass is
the warm (steady-state) figure.

    python scripts/probe_q55_stages.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    from bench import host_calibration
    from nyc_tlc_analytics_pipeline_spark.core.pins import pin, release_pins
    from nyc_tlc_analytics_pipeline_spark.core.session import build_session
    from nyc_tlc_analytics_pipeline_spark.operators import (
        decontam,
        packing,
        rules,
        sampling,
        text as T,
    )
    from nyc_tlc_analytics_pipeline_spark.plans.catalog import QUERIES
    from nyc_tlc_analytics_pipeline_spark.plans.catalog_datapipe import (
        _Q55_BUDGET,
        _Q55_WEIGHTS,
    )
    from nyc_tlc_analytics_pipeline_spark.sources.testdata import (
        load_table_parallel,
    )

    print(f"host calibration: {host_calibration():.4f}s", flush=True)
    spark = build_session(app_name="q55-stages", master=f"local[{CPUS}]")

    def prefix(upto: str):
        """Build the q55 prefix plan exactly as the registered query
        does (same pins), ending at the named stage."""
        docs = load_table_parallel(spark, SRC, "documents")
        tk = docs.withColumn("tk", T.tokens("text"))
        gated = rules.filter_by_rules(tk, "text", toks="tk")
        pool = pin(
            gated.filter(col("doc_id") % 50 != 0).select(
                "doc_id", "lang", "tk"
            )
        )
        if upto == "gate":
            return pool
        bench = docs.filter(col("doc_id") % 50 == 0)
        clean = decontam.decontaminate(pool, bench, n=4, toks_col="tk")
        curated = pin(
            clean.select("doc_id", "lang", F.size("tk").alias("n_tokens"))
        )
        if upto == "decontam":
            return curated
        sampled = sampling.mixture_sample(
            curated, "lang", _Q55_WEIGHTS, "doc_id", salt="mix"
        )
        if upto == "mixture":
            return sampled
        return packing.pack_greedy(
            sampled, "lang", "doc_id", "n_tokens", _Q55_BUDGET
        )

    stages = ("gate", "decontam", "mixture", "pack", "whole")
    for run in ("cold", "warm"):
        tot, prev = {}, 0.0
        rows = []
        for st in stages:
            t0 = time.perf_counter()
            if st == "whole":
                QUERIES["q55_curation_funnel_v2"].build(spark, SRC).collect()
            else:
                prefix(st).count()
            dt = time.perf_counter() - t0
            release_pins()
            cal = host_calibration()
            tot[st] = dt
            delta = dt - (prev if st != "whole" else 0.0)
            rows.append((st, dt, delta, cal))
            if st != "whole":
                prev = dt
        print(f"\n[{run}]  stage      cumul     delta    cal")
        for st, dt, delta, cal in rows:
            print(f"  {st:9s} {dt:7.2f}s  {delta:7.2f}s  {cal:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
