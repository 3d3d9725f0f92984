"""Catalog-wide physical-plan lint: flags the scale anti-patterns the
round verdicts hunt for —

- GLOBAL window nodes (no PARTITION BY → single-partition sort); each
  flagged site must be justified by a bounded input frame,
- CartesianProduct / large BroadcastNestedLoopJoin,
- Python row-UDF stages (BatchEvalPython; ArrowEvalPython is fine),

over every catalog query at sf0.001.  Exit 1 if a NEW unjustified site
appears (allowlist documents the audited-bounded ones).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("PLAN_LINT_SF", "/root/testdata/sf0.001")

# global-window sites audited as BOUNDED input frames (see SCALE.md):
#   q08/q14: window over an already-grouped frame of ≤ tens of rows
#   q52/q55/q80: quota window over the |domains|-row counts frame
#   q69: rank window ABOVE TakeOrderedAndProject(limit=100)
#   q116: offset running-sum over the |range partitions|-row counts frame
#         (the two-pass global_row_number — the DATA rank itself is
#         partition-local; only the per-partition offsets are global)
# Anything NOT in this set that grows a global window fails the lint.
GLOBAL_WINDOW_OK = {
    "q08_event_type_share",
    "q100_mom_growth",  # lag over the pre-aggregated |months| frame
    "q14_nation_share_vs_global",
    "q52_mixture_sampling",
    "q55_curation_funnel_v2",
    "q69_zipf_fit",
    "q80_temperature_mixture",
    "q116_serpentine_shards",
    "q121_epoch_allocation",  # waterfilling cumsums over the |domains| frame
    "q122_curation_funnel_v3",  # q116's offsets window (shard stage)
    "q124_hill_tail_index",  # rank window ABOVE TakeOrdered(k+1), q69 posture
    "q127_vocab_coverage",  # cumulative walk over the distinct-freq histogram
    "q152_neyman_stratified_sample",  # Σ N_h·S_h normalizer over the |strata| frame (q52 posture)
    "q159_hybrid_rrf_retrieval",  # rank windows over the two pool-sized TakeOrdered lists (q69/q124 posture)
    "q169_padding_efficiency_curve",  # q116's offsets window — newly VISIBLE
    # to the lint in r14: the builder's localCheckpoint became a lazy
    # pin (core.pins), so the cached plan (with the bounded
    # |partitions|-row offsets window inside) now prints in explain
    "q175_curriculum_schedule",  # q116's offsets window (two-pass global rank)
    "q177_shuffle_order_audit",  # q116's offsets window (two-pass global rank)
    "q182_curriculum_packed_shards",  # q175's offsets window (schedule stage)
}


def main() -> int:
    from pyspark.sql import SparkSession

    from nyc_tlc_analytics_pipeline_spark.plans.catalog import QUERIES

    spark = SparkSession.builder.master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    bad = []
    for name, spec in QUERIES.items():
        plan = (
            spec.build(spark, SF)._jdf.queryExecution().executedPlan().toString()
        )
        findings = []
        # a window is GLOBAL iff its windowspecdefinition has no partition
        # columns — partition refs are the leading args WITHOUT an
        # ASC/DESC sort direction (the frame spec is ignored)
        for spec in re.findall(r"windowspecdefinition\((.*?)\) AS ", plan):
            head = spec.split("specifiedwindowframe")[0]
            args = [a.strip() for a in head.split(",") if a.strip()]
            has_partition = any(
                " ASC" not in a and " DESC" not in a for a in args
            )
            if not has_partition:
                findings.append("global-window")
        if "CartesianProduct" in plan:
            findings.append("cartesian")
        if "BatchEvalPython" in plan:
            findings.append("row-python-udf")
        findings = sorted(set(findings))
        if findings == ["global-window"] and name in GLOBAL_WINDOW_OK:
            continue
        if findings:
            bad.append((name, findings))
            print(f"FLAG {name}: {findings}")
    print(f"\nchecked {len(QUERIES)} queries, {len(bad)} flagged")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
