"""Round-11 operator tests: the gate audit's fail-closed source budget,
the deterministic fixed-size md5 sample behind it, forward/nearest as-of
joins, incremental IVF maintenance, and the recall-remediation loop."""

from __future__ import annotations

import pytest

import tests.conftest as C
from nyc_tlc_analytics_pipeline_spark.operators import dedup, sampling
from nyc_tlc_analytics_pipeline_spark.sources.testdata import load_table


# ---------------------------------------------------------------------------
# hash_top_n — deterministic fixed-size sample
# ---------------------------------------------------------------------------


def test_hash_top_n_fixed_size_and_layout_invariant(spark):
    """The sample is exactly n rows, stable under repartitioning, and
    equals the n smallest hash fractions (the q47 convention)."""
    docs = load_table(spark, C.SF_SMOKE, "documents").select("doc_id", "text")
    s1 = {r.doc_id for r in sampling.hash_top_n(docs, "doc_id", 50, "gate").collect()}
    s2 = {
        r.doc_id
        for r in sampling.hash_top_n(
            docs.repartition(7, "doc_id"), "doc_id", 50, "gate"
        ).collect()
    }
    assert len(s1) == 50
    assert s1 == s2
    # ground truth: order ALL ids by the same hash fraction, take 50
    from pyspark.sql.functions import col

    ordered = (
        docs.select("doc_id", sampling.hash_fraction("doc_id", "gate").alias("h"))
        .orderBy("h", col("doc_id"))
        .collect()
    )
    assert s1 == {r.doc_id for r in ordered[:50]}


def test_hash_top_n_salt_changes_sample(spark):
    docs = load_table(spark, C.SF_SMOKE, "documents").select("doc_id", "text")
    a = {r.doc_id for r in sampling.hash_top_n(docs, "doc_id", 50, "gate").collect()}
    b = {r.doc_id for r in sampling.hash_top_n(docs, "doc_id", 50, "other").collect()}
    assert a != b


# ---------------------------------------------------------------------------
# near_dup_gate_audit — fail-closed source budget
# ---------------------------------------------------------------------------


def test_gate_audit_source_budget_fails_closed(spark):
    """A source frame with no size estimate (or over the cap) must raise
    toward sampling instead of silently running a corpus-sized shingle
    self-join (the q161 round-10 finding)."""

    class Huge:
        @property
        def _jdf(self):
            raise RuntimeError("no estimate")

    with pytest.raises(ValueError, match="hash_top_n"):
        dedup.near_dup_gate_audit(Huge(), "doc_id", "text")


def test_gate_audit_sampled_source_passes_budget(spark):
    """hash_top_n's GlobalLimit carries a row-bounded size estimate, so
    the sampled frame passes the budget gate no matter the source scan
    size — and the audit's numbers agree with its constituent frames
    computed independently over the same sample."""
    docs = load_table(spark, C.SF_SMOKE, "documents").select("doc_id", "text")
    sample = sampling.hash_top_n(docs, "doc_id", 100, "gate")
    rep = dedup.near_dup_gate_audit(sample, "doc_id", "text", n=3).collect()
    assert len(rep) == 1
    r = rep[0]
    truth = {
        (x.doc_a, x.doc_b)
        for x in dedup.jaccard_pairs(
            sample, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    sigs = dedup.minhash_signatures(sample, "doc_id", "text", 3, 16, "md5")
    cand = {
        (x.doc_a, x.doc_b)
        for x in dedup.lsh_candidate_pairs(sigs, 4, 4).collect()
    }
    assert r.n_true == len(truth)
    assert r.n_candidates == len(cand)
    assert r.n_hits == len(truth & cand)
