"""Hypothesis property tests for the round-7 pair-source unification:
structural invariants that must hold on ANY corpus, not just the
planted fixture."""

from __future__ import annotations

from .conftest import prop_examples, full_tier
from hypothesis import given, settings
from hypothesis import strategies as st

_corpus = st.lists(
    st.lists(
        st.sampled_from(["w%d" % i for i in range(20)]),
        min_size=4,
        max_size=30,
    ),
    min_size=4,
    max_size=20,
)


@settings(max_examples=prop_examples(5), deadline=None)
@given(corpus=_corpus)
def test_minhash_pairs_subset_of_exact_any_corpus(spark, corpus):
    """Both sources verify candidates with exact Jaccard, so MinHash
    mode must be a subset of exact mode with identical jaccard values
    on the shared pairs — on arbitrary corpora, not just planted dups."""
    from nyc_tlc_analytics_pipeline_spark.operators.dedup import near_dup_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mh = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in near_dup_pairs(df, "doc_id", "text", threshold=0.3).collect()
    }
    ex = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in near_dup_pairs(
            df, "doc_id", "text", threshold=0.3, pair_source="jaccard"
        ).collect()
    }
    assert set(mh) <= set(ex)
    for p, j in mh.items():
        assert j == ex[p]
    # identical pairs -> identical Jaccard >= 0.9 survivors (LSH recall
    # at 0.9 with 16/4 banding is ~0.992 per pair; structural subset
    # still holds regardless, which is what we assert)
    assert all(j >= 0.3 for j in mh.values())


def _bpe_reference(words: dict[str, int], n_merges: int):
    """Pure-Python Sennrich BPE reference: freq-weighted adjacent pair
    counts (every occurrence), argmax by (count DESC, l, r), plain
    left-to-right non-overlapping merge — the semantics
    text.bpe_train_merges implements distributively."""
    vocab = {tuple(w): f for w, f in words.items()}
    out = []
    total = sum(vocab.values())
    for r in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, rr), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged: dict[tuple, int] = {}
        for sym, f in vocab.items():
            new = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == rr:
                    new.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            key = tuple(new)
            merged[key] = merged.get(key, 0) + f
        vocab = merged
        n_sym = sum(len(sym) * f for sym, f in vocab.items())
        out.append((r, l, rr, c, round(n_sym / total + 1e-9, 6)))
    return out


@settings(max_examples=prop_examples(5), deadline=None)
@given(
    corpus=st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            min_size=2,
            max_size=15,
        ),
        min_size=2,
        max_size=8,
    )
)
def test_bpe_trainer_matches_python_reference(spark, corpus):
    """The single-job-per-round trainer (min_by argmax + analytic stat
    from pair-count totals) must follow the classic Sennrich trajectory
    exactly — merges, counts, AND the weighted avg-symbols stat — on
    arbitrary corpora."""
    from nyc_tlc_analytics_pipeline_spark.operators import text as T

    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    words: dict[str, int] = {}
    for toks in corpus:
        for w in toks:
            words[w.lower()] = words.get(w.lower(), 0) + 1
    expect = _bpe_reference(words, 4)
    got = T.bpe_train_merges(df, n_merges=4)
    assert [(r, l, rr, c) for r, l, rr, c, _ in got] == [
        (r, l, rr, c) for r, l, rr, c, _ in expect
    ]
    for (_, _, _, _, sg), (_, _, _, _, se) in zip(got, expect):
        assert abs(sg - se) < 1e-9


@settings(max_examples=prop_examples(5), deadline=None)
@given(
    model=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=2, max_size=10),
        min_size=1,
        max_size=6,
    ),
    evals=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "z"]), min_size=2, max_size=10),
        min_size=1,
        max_size=6,
    ),
)
def test_heldout_perplexity_matches_python_reference(spark, model, evals):
    """lm.heldout_bigram_perplexity == a direct add-1-smoothed Python
    computation on arbitrary model/eval corpora, including unseen
    bigrams and unseen contexts (the LEFT-join smoothing floor)."""
    import math

    from nyc_tlc_analytics_pipeline_spark.operators import lm

    c2: dict[tuple[str, str], int] = {}
    cp: dict[str, int] = {}
    vocab = set()
    for toks in model:
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            cp[a] = cp.get(a, 0) + 1
    V = len(vocab)

    def ref_ppl(toks):
        lps = [
            math.log(
                (c2.get((a, b), 0) + 1.0) / (cp.get(a, 0) + 1.0 * V)
            )
            for a, b in zip(toks, toks[1:])
        ]
        return -sum(lps) / len(lps)

    mdf = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(model)],
        "doc_id long, text string",
    )
    edf = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(evals)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.log_ppl)
        for r in lm.heldout_bigram_perplexity(edf, ["doc_id"], mdf).collect()
    }
    assert set(got) == set(range(len(evals)))
    for i, toks in enumerate(evals):
        nb, ppl = got[i]
        assert nb == len(toks) - 1
        assert abs(ppl - ref_ppl(toks)) < 1e-9


@full_tier
@settings(max_examples=prop_examples(5), deadline=None)
@given(corpus=_corpus)
def test_threshold_curve_monotone_any_corpus(spark, corpus):
    """The savings curve is monotone non-increasing in the threshold in
    BOTH pair modes, and n_removable never exceeds n_pairs' doc span."""
    from nyc_tlc_analytics_pipeline_spark.operators.dedup import (
        dedup_threshold_curve,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ts = (0.3, 0.6, 0.9)
    for mode in ("minhash", "jaccard"):
        got = {
            r.threshold: r
            for r in dedup_threshold_curve(
                df, "doc_id", "text", ts, pair_source=mode
            ).collect()
        }
        assert set(got) == set(ts)
        for lo, hi in zip(ts, ts[1:]):
            assert got[hi].n_pairs <= got[lo].n_pairs
            assert got[hi].n_removable <= got[lo].n_removable
        for r in got.values():
            assert r.n_removable <= r.n_pairs or r.n_pairs == 0
