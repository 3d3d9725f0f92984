"""Unigram-LM scorer: hand-computed micro corpus + held-out stats path."""

from __future__ import annotations

import math

from nyc_tlc_analytics_pipeline_spark.operators import lm


def test_scores_match_hand_computation(spark):
    # corpus: "a a b" and "b c" → counts a:2 b:2 c:1, N=5, V=3, k=1
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in lm.doc_logprob_scores(df, ["doc_id"]).collect()
    }
    p = lambda c: math.log((c + 1.0) / (5 + 1.0 * 3))
    exp1 = (p(2) + p(2) + p(2)) / 3  # a a b
    exp2 = (p(2) + p(1)) / 2  # b c
    assert abs(got[1] - exp1) < 1e-12
    assert abs(got[2] - exp2) < 1e-12


def test_rare_token_docs_score_lower(spark):
    rows = [(i, "common words repeated here") for i in range(20)]
    rows.append((99, "zzz qqq xxx www"))  # singleton vocabulary
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_logprob"] for r in lm.doc_logprob_scores(df, ["doc_id"]).collect()}
    assert got[99] < min(v for k, v in got.items() if k != 99)


def test_heldout_stats_scoring(spark):
    """Scoring against a reference corpus' stats: tokens unseen in the
    reference simply drop out of the join (documented contract), so the
    score reflects only in-vocabulary mass."""
    ref = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    stats = lm.corpus_token_stats(ref)
    target = spark.createDataFrame([(7, "a b")], "doc_id long, text string")
    row = lm.doc_logprob_scores(target, ["doc_id"], stats=stats).head()
    p = lambda c: math.log((c + 1.0) / (4 + 1.0 * 2))
    assert abs(row["avg_logprob"] - (p(2) + p(2)) / 2) < 1e-12
