"""Round-7 operator tests: the unified pluggable pair source
(dedup.near_dup_pairs) and the production compositions that default to
MinHash-LSH — mode-equivalence between the exact (oracle-gated) and
MinHash (100 TB default) pair modes, per VERDICT r6 item 1."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from nyc_tlc_analytics_pipeline_spark.operators import (
    curation,
    dedup,
    sampling,
    similarity,
    text,
)
from nyc_tlc_analytics_pipeline_spark.sources.testdata import load_table

from .conftest import SF_SMOKE

_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").cache()


@pytest.fixture(scope="module")
def exact_pairs(docs):
    return {
        (r.doc_a, r.doc_b): round(r.jaccard, 6)
        for r in dedup.near_dup_pairs(
            docs, "doc_id", "text", pair_source="jaccard"
        ).collect()
    }


@pytest.fixture(scope="module")
def minhash_pairs(docs):
    return {
        (r.doc_a, r.doc_b): round(r.jaccard, 6)
        for r in dedup.near_dup_pairs(docs, "doc_id", "text").collect()
    }


def test_near_dup_pairs_minhash_subset_of_exact(exact_pairs, minhash_pairs):
    """Both modes verify candidates with exact Jaccard, so MinHash mode
    is a strict SUBSET of exact mode at the same threshold, with
    identical jaccard values on the shared pairs."""
    assert set(minhash_pairs) <= set(exact_pairs)
    for p, j in minhash_pairs.items():
        assert j == exact_pairs[p]
    # and the fixture actually exercises both modes non-trivially
    assert len(minhash_pairs) >= 5


def test_near_dup_pairs_passthrough_and_bad_source(spark, docs):
    pre = spark.createDataFrame([(1, 2, 0.9)], "doc_a long, doc_b long, jaccard double")
    out = dedup.near_dup_pairs(docs, "doc_id", "text", pairs=pre)
    assert out is pre  # explicit pairs= overrides everything
    with pytest.raises(ValueError, match="pair_source"):
        dedup.near_dup_pairs(docs, "doc_id", "text", pair_source="nope")


def test_canonical_dedup_minhash_default_refines_exact(docs):
    """MinHash pairs ⊆ exact pairs ⇒ MinHash clusters REFINE exact
    clusters ⇒ keep-best retains at least as many docs; on the planted
    ≥0.9 near-dup families (where LSH recall is 1.0) both modes must
    agree on every non-singleton cluster's survivor set."""
    scored = docs.select(
        "doc_id", "text", text.token_count("text").alias("n_tokens")
    )
    ex = dedup.canonical_dedup(
        scored, "doc_id", "text", "n_tokens", pair_source="jaccard"
    ).cache()
    mh = dedup.canonical_dedup(scored, "doc_id", "text", "n_tokens").cache()
    n_docs = docs.count()
    assert ex.count() == n_docs and mh.count() == n_docs
    kept_ex = ex.filter(col("keep")).count()
    kept_mh = mh.filter(col("keep")).count()
    assert kept_ex <= kept_mh  # fewer pairs -> more clusters -> more kept
    # identical downstream on the SHARED pair set: feeding the minhash
    # frame through pairs= must equal pair_source="minhash" exactly
    p = dedup.near_dup_pairs(docs, "doc_id", "text").select("doc_a", "doc_b")
    via_pairs = dedup.canonical_dedup(
        scored, "doc_id", "text", "n_tokens", pairs=p
    )
    assert sorted(map(tuple, via_pairs.collect())) == sorted(
        map(tuple, mh.collect())
    )


def test_threshold_curve_modes_are_ordered(docs):
    """Per threshold, MinHash-mode pair counts can never exceed exact
    mode's (subset property), and both curves are monotone decreasing
    in the threshold."""
    ts = (0.3, 0.5, 0.7, 0.9)
    ex = {
        r.threshold: (r.n_pairs, r.n_removable)
        for r in dedup.dedup_threshold_curve(
            docs, "doc_id", "text", ts, pair_source="jaccard"
        ).collect()
    }
    mh = {
        r.threshold: (r.n_pairs, r.n_removable)
        for r in dedup.dedup_threshold_curve(docs, "doc_id", "text", ts).collect()
    }
    assert set(ex) == set(mh) == set(ts)
    for t in ts:
        assert mh[t][0] <= ex[t][0]
        assert mh[t][1] <= ex[t][1]
    for lo, hi in zip(sorted(ts), sorted(ts)[1:]):
        assert ex[hi][0] <= ex[lo][0]
        assert mh[hi][0] <= mh[lo][0]


def test_counterfactual_leakage_cluster_mode_is_leak_free(docs):
    """The defining invariant holds in BOTH pair modes: the cluster-keyed
    split lets zero near-dup pairs straddle splits, while the naive
    per-doc hash split leaks (this corpus plants near-dups)."""
    for mode in ("minhash", "jaccard"):
        rows = {
            r.mode: r
            for r in sampling.counterfactual_leakage_report(
                docs.select("doc_id", "text"), "doc_id", "text",
                _WEIGHTS, salt="s", pair_source=mode,
            ).collect()
        }
        assert rows["cluster"].n_straddling == 0
        assert rows["cluster"].n_leaked_docs == 0
        assert rows["cluster"].n_pairs == rows["naive"].n_pairs
        assert rows["naive"].n_straddling >= 0


def test_funnel_attribution_partitions_corpus(docs):
    """Every document lands in exactly one stage in both modes; the
    stage sets obey the refinement direction (minhash finds ⊆ exact's
    duplicates, so its 'duplicate' count can't exceed exact's)."""
    n_docs = docs.count()
    counts = {}
    for mode in ("minhash", "jaccard"):
        attr = curation.funnel_attribution(
            docs, 3.41, pair_source=mode, threshold=0.5
        )
        by_stage = {
            r.stage: r.c
            for r in attr.groupBy("stage").agg(F.count("*").alias("c")).collect()
        }
        assert sum(by_stage.values()) == n_docs
        counts[mode] = by_stage
    assert counts["minhash"].get("duplicate", 0) <= counts["jaccard"].get(
        "duplicate", 0
    )
    # rules/perplexity stages are pair-source-independent
    for stage in ("rules", "perplexity"):
        assert counts["minhash"].get(stage, 0) == counts["jaccard"].get(stage, 0)


def test_heldout_perplexity_smooths_unseen_mass(spark):
    """The production CCNet property: a bigram absent from the model
    gets the add-1 floor instead of being silently dropped — the doc
    with the unseen transition must score STRICTLY worse, and its
    n_bigrams must count every bigram, seen or not."""
    import math

    from nyc_tlc_analytics_pipeline_spark.operators import lm

    model = spark.createDataFrame(
        [("m1", "a b a b a b"), ("m2", "a b c")], "doc_id string, text string"
    )
    ev = spark.createDataFrame(
        [("seen", "a b"), ("unseen", "a z")], "doc_id string, text string"
    )
    got = {
        r.doc_id: r
        for r in lm.heldout_bigram_perplexity(ev, ["doc_id"], model).collect()
    }
    # model stats: bigrams {a b:4, b a:2, b c:1}, cprev {a:4, b:3}, V=3
    assert got["seen"].n_bigrams == 1
    assert got["unseen"].n_bigrams == 1
    exp_seen = -math.log((4 + 1) / (4 + 3))
    exp_unseen = -math.log((0 + 1) / (4 + 3))
    assert abs(got["seen"].log_ppl - exp_seen) < 1e-9
    assert abs(got["unseen"].log_ppl - exp_unseen) < 1e-9
    assert got["unseen"].log_ppl > got["seen"].log_ppl
    # unseen CONTEXT too: cprev coalesces to 0
    ev2 = spark.createDataFrame([("ctx", "z q")], "doc_id string, text string")
    (r,) = lm.heldout_bigram_perplexity(ev2, ["doc_id"], model).collect()
    assert abs(r.log_ppl - -math.log((0 + 1) / (0 + 3))) < 1e-9


def test_auto_n_planes_occupancy_holding():
    """One extra plane per corpus doubling above the target occupancy,
    floored at base, capped at max_planes."""
    assert similarity.auto_n_planes(1) == 4
    assert similarity.auto_n_planes(2048) == 4
    assert similarity.auto_n_planes(2049) == 5
    assert similarity.auto_n_planes(20480) == 8  # the measured-good 10x dial
    assert similarity.auto_n_planes(2048 * 2**30) == 24  # capped
    for n in (10, 1000, 5000, 50_000, 1_000_000):
        assert similarity.auto_n_planes(2 * n) <= similarity.auto_n_planes(n) + 1


def test_margin_mining_auto_equals_fixed_at_small_scale(spark):
    """Plan-stats row estimate for the smoke embeddings is under the
    occupancy target, so auto mode resolves to the base 4 planes — and
    random_hyperplanes is per-index deterministic, so the auto result
    must EQUAL the fixed-4-plane (q118 oracle) result exactly."""
    from nyc_tlc_analytics_pipeline_spark.sources.testdata import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    a, b = emb.filter(col("label") < 5), emb.filter(col("label") >= 5)
    fixed = similarity.margin_mine_pairs(
        a, b, similarity.random_hyperplanes(8, 64, seed=42)[:4], k=4
    )
    auto = similarity.margin_mine_pairs(a, b, k=4)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, fixed.collect())
    )


def test_collect_bounded_guards_model_sized_state(spark):
    """The cardinality guard: under-cap frames collect normally; an
    over-cap frame raises BEFORE materializing more than cap+1 rows,
    naming the operator and its bounded-enum assumption."""
    from nyc_tlc_analytics_pipeline_spark.core.guards import collect_bounded

    small = spark.range(10)
    assert len(collect_bounded(small, 10, "op", "ten rows")) == 10
    big = spark.range(10_000)
    with pytest.raises(ValueError, match="op.*model-size cap.*enum"):
        collect_bounded(big, 100, "op", "a bounded enum")


def test_power_iteration_guard_catches_dim_mismatch(spark):
    """Pointing the dim-sized-state operator at wider vectors than
    declared must fail loudly, not silently collect the wide state."""
    from nyc_tlc_analytics_pipeline_spark.operators import linalg

    df = spark.createDataFrame(
        [([float(i) for i in range(64)],)], "embedding array<double>"
    )
    with pytest.raises(ValueError, match="power_iteration_top_pc"):
        linalg.power_iteration_top_pc(df, "embedding", dim=2, n_iter=1)


def test_driver_ledger_rotation(tmp_path):
    """The scoreboard ordering is self-maintaining: green rows are read
    from CORRECTNESS ledgers (err -> not green, explicit false -> not
    green, null hash fields on rows-only entries -> green), the newest
    round wins, and the real ordering puts never-green queries ahead of
    everything except the warmup, then stalest-first."""
    import json

    import __spark_entry__ as e

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "qA": {"rows_match": True, "schema_match": True, "hash_match": True,
               "err": None},
        "qB": {"rows_match": True, "schema_match": True, "hash_match": False,
               "err": None},
        "qC": {"rows_match": True, "schema_match": True, "hash_match": None,
               "err": None},
        "qD": {"rows_match": None, "schema_match": None, "hash_match": None,
               "err": "boom"},
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "qB": {"rows_match": True, "schema_match": True, "hash_match": True,
               "err": None},
    }))
    (tmp_path / "not_a_ledger.json").write_text("junk")
    got = e._last_green_round(str(tmp_path))
    # qA green in r1; qB failed r1 but green r3; qC rows-only green; qD err
    assert got == {"qA": 1, "qB": 3, "qC": 1}
    # and the live ordering: warmup first, then every query with NO
    # green row in any committed ledger (derived live, so newly
    # registered queries join the block — and newly-greened ones LEAVE
    # it — without editing this test; asserting specific members here
    # would re-break every round a new ledger lands), then stale-first
    names = e._ordered_names()
    assert names[0] == "q67_weighted_sample"
    live = e._last_green_round()
    expected_fresh = {
        n for n in names if n not in live and n != "q67_weighted_sample"
    }
    n_fresh = len(expected_fresh)
    assert set(names[1 : 1 + n_fresh]) == expected_fresh
    rest = names[1 + n_fresh :]
    assert not expected_fresh & set(rest)  # fresh block never repeats
    stale_rounds = [live[n] for n in rest]
    assert stale_rounds == sorted(stale_rounds)  # stalest-first


def test_cli_attribution_and_dedup_curve(spark, tmp_path, capsys):
    """The new CLI verbs: `attribution` partitions the corpus into
    funnel stages; `dedup-curve` reports a monotone savings curve —
    both run in the MinHash production mode by default and accept
    --pair-mode jaccard for the exact oracle mode."""
    import json

    from nyc_tlc_analytics_pipeline_spark.cli import main

    wh = str(tmp_path / "wh")
    rc = main(["--warehouse-dir", wh, "attribution", "--sf-dir", SF_SMOKE])
    rep = json.loads(capsys.readouterr().out)
    assert rc == 0
    total = sum(v["n_docs"] for stages in rep.values() for v in stages.values())
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert total == n_docs
    assert all(
        set(stages) <= {"rules", "perplexity", "duplicate", "kept"}
        for stages in rep.values()
    )
    rc = main(
        ["--warehouse-dir", wh, "dedup-curve", "--sf-dir", SF_SMOKE,
         "--thresholds", "0.4,0.8"]
    )
    curve = json.loads(capsys.readouterr().out)
    assert rc == 0 and set(curve) == {"0.4", "0.8"}
    assert curve["0.8"]["n_pairs"] <= curve["0.4"]["n_pairs"]


def test_hashed_cosine_calibration_modes(docs):
    """The calibration curve exists in both modes; MinHash-mode buckets
    are a subset with never-larger pair counts, and planted near-dups
    give the top bucket a high mean hashed cosine in both."""
    ex = {
        r.jacc_bucket: r
        for r in similarity.hashed_cosine_calibration(
            docs, "doc_id", "text", dim=64, pair_source="jaccard",
            threshold=0.05,
        ).collect()
    }
    mh = {
        r.jacc_bucket: r
        for r in similarity.hashed_cosine_calibration(
            docs, "doc_id", "text", dim=64, threshold=0.05
        ).collect()
    }
    assert set(mh) <= set(ex)
    for b, r in mh.items():
        assert r.n_pairs <= ex[b].n_pairs
    top = max(mh)
    assert top >= 0.8 and mh[top].avg_hashed_cosine > 0.8
