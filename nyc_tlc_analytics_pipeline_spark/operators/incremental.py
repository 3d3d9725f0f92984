"""Incremental aggregate maintenance: refresh a gold aggregate from a
delta batch without re-scanning the full fact history.

The pattern (mirrors the reference's gold-table rebuild stage, reference
src/orchestration/flows.py gold stage, re-expressed as algebraic
partial-aggregate merge): keep gold tables in PARTIAL form — additive
components only (counts, sums, min/max) — and refresh by aggregating just
the delta batch to the same shape, then merging partials by key.  Merge
cost is bounded by the KEY space (nation × year here), never the fact
history; derived metrics (averages, shares) are re-derived from the
merged sums at read time, which is exactly why they must never be stored
pre-divided.

At cluster scale the merge is one shuffle over |keys| + |delta keys|
rows; with the gold table bucketed by key it degrades to a map-side
merge.  AVG/STDDEV stay mergeable via (count, sum, sum-of-squares);
percentiles do NOT (holistic) — those need the sketch path
(operators/sketch.py) instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# aggregate → how its partial merges across batches
_MERGE_FN = {
    "sum": F.sum,
    "count": F.sum,  # a count partial merges by SUMMING the partial counts
    "min": F.min,
    "max": F.max,
}


def merge_partials(
    partials: Sequence[DataFrame],
    keys: Sequence[str],
    merge_spec: dict[str, str],
) -> DataFrame:
    """Merge same-schema partial aggregates (``merge_spec`` maps column →
    one of sum/count/min/max) into one partial of the same shape, so the
    result can itself be stored as the next gold state and merged again
    (associativity is the whole contract)."""
    unknown = {v for v in merge_spec.values()} - set(_MERGE_FN)
    if unknown:
        raise ValueError(f"non-mergeable aggregate kinds: {sorted(unknown)}")
    merged = partials[0]
    for p in partials[1:]:
        merged = merged.unionByName(p)
    return merged.groupBy(*keys).agg(
        *[_MERGE_FN[kind](c).alias(c) for c, kind in merge_spec.items()]
    )
