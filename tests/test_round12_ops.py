"""Round-12 operator tests: soft dedup's PRODUCTION MinHash mode (q186,
VERDICT r11 item 1) — the last pair consumer to get its q137/q144-style
production twin — plus the two-pass pack_contiguous invariants exercised
through the q182 composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from nyc_tlc_analytics_pipeline_spark.operators import dedup
from nyc_tlc_analytics_pipeline_spark.sources.testdata import load_table

from .conftest import SF_SMOKE

_T = 0.5
_DELTA = 0.5


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").cache()


@pytest.fixture(scope="module")
def soft_exact(docs):
    pairs = dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=_T)
    return {
        r.lang: r.asDict()
        for r in dedup.soft_dedup_report(
            docs, pairs.select("doc_a", "doc_b"), delta=_DELTA
        ).collect()
    }


@pytest.fixture(scope="module")
def soft_minhash(docs):
    pairs = dedup.minhash_dedup_pairs(
        docs, "doc_id", "text", n=3, threshold=_T
    )
    return {
        r.lang: r.asDict()
        for r in dedup.soft_dedup_report(
            docs, pairs.select("doc_a", "doc_b"), delta=_DELTA
        ).collect()
    }


def test_soft_dedup_minhash_mode_bounds_exact_mode(soft_exact, soft_minhash):
    """MinHash pairs ⊆ exact pairs at the same threshold ⇒ MinHash
    clusters REFINE exact clusters ⇒ per language: identical doc/token
    totals, at-least-as-many clusters, at-least-as-many first copies
    (unique_tokens), and soft value between unique and raw — the q186
    registration's invariants."""
    assert set(soft_exact) == set(soft_minhash)
    for lang in soft_exact:
        ex, mh = soft_exact[lang], soft_minhash[lang]
        assert mh["n_docs"] == ex["n_docs"]
        assert mh["raw_tokens"] == ex["raw_tokens"]
        assert mh["n_clusters"] >= ex["n_clusters"]
        assert mh["unique_tokens"] >= ex["unique_tokens"]
        assert mh["n_repeat_docs"] <= ex["n_repeat_docs"]
        # less merging -> less discounting -> more retained soft value
        assert mh["soft_tokens"] >= ex["soft_tokens"] - 1e-9
        assert (
            mh["unique_tokens"] - 1e-9
            <= mh["soft_tokens"]
            <= mh["raw_tokens"] + 1e-9
        )
    # the smoke corpus's planted near-dup families make this non-trivial
    assert any(
        soft_exact[lang]["n_repeat_docs"] > 0 for lang in soft_exact
    )


def test_soft_dedup_minhash_nontrivial_and_deterministic(docs, soft_minhash):
    """The MinHash mode actually discounts on the smoke corpus (LSH
    recall 1.0 on the planted ≥0.9 families) and is layout-independent:
    a repartitioned input produces the identical report."""
    assert any(r["n_repeat_docs"] > 0 for r in soft_minhash.values())
    pairs = dedup.minhash_dedup_pairs(
        docs.repartition(7), "doc_id", "text", n=3, threshold=_T
    )
    again = {
        r.lang: r.asDict()
        for r in dedup.soft_dedup_report(
            docs.repartition(7), pairs.select("doc_a", "doc_b"), delta=_DELTA
        ).collect()
    }
    assert again == soft_minhash


def test_q186_registration_matches_direct_composition(spark, soft_minhash):
    """The q186 catalog entry is exactly minhash_dedup_pairs →
    soft_dedup_report — guards the registration against drifting from
    the operator it claims to register."""
    from nyc_tlc_analytics_pipeline_spark.plans import catalog_datapipe as cd

    got = {r.lang: r.asDict() for r in cd.q186(spark, SF_SMOKE).collect()}
    assert got == soft_minhash
