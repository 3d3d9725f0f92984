"""Hypothesis property tests for the round-11 operators: the b-bit
minwise packer/estimator against an independent pure-Python twin over
ARBITRARY hex signatures, and the as-of time-reversal duality
(forward == backward under negated timestamps) over arbitrary unique
per-key event times."""

from __future__ import annotations

from .conftest import prop_examples
from hypothesis import given, settings
from hypothesis import strategies as st

from nyc_tlc_analytics_pipeline_spark.operators import dedup

_hex8 = st.text(alphabet="0123456789abcdef", min_size=8, max_size=8)
_sigs = st.lists(
    st.tuples(st.lists(_hex8, min_size=16, max_size=16)),
    min_size=2,
    max_size=6,
)


def _py_pack(sig: list[str], b: int) -> int:
    return sum((int(h[7], 16) % (1 << b)) << (i * b) for i, h in enumerate(sig))


def _py_est(pa: int, pb: int, k: int, b: int) -> float:
    x = pa ^ pb
    mask = (1 << b) - 1
    matches = sum(1 for i in range(k) if (x >> (i * b)) & mask == 0)
    r = 1.0 / (1 << b)
    return (matches / k - r) / (1.0 - r)


@settings(max_examples=prop_examples(8), deadline=None)
@given(rows=_sigs, b=st.sampled_from([1, 2, 3]))
def test_bbit_pack_and_estimate_match_python_twin(spark, rows, b):
    """Spark's packed longs and pairwise estimates equal an independent
    pure-Python restatement for every generated signature set and every
    b the 16-component signature supports (16·b ≤ 63 — b=4 with 16
    hashes cannot fit a signed long and is refused by the pack guard,
    asserted separately below)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, list(sig)) for i, (sig,) in enumerate(rows)],
        "doc long, signature array<string>",
    )
    packed = {
        r.doc: r.pk
        for r in df.select(
            "doc", dedup.bbit_pack(F.col("signature"), 16, b).alias("pk")
        ).collect()
    }
    for i, (sig,) in enumerate(rows):
        assert packed[i] == _py_pack(sig, b)
    a = df.select(F.col("doc").alias("da"), F.col("signature").alias("sa"))
    bb = df.select(F.col("doc").alias("db"), F.col("signature").alias("sb"))
    pairs = (
        a.crossJoin(bb)
        .filter(F.col("da") < F.col("db"))
        .select(
            "da",
            "db",
            dedup.bbit_jaccard(
                dedup.bbit_pack(F.col("sa"), 16, b),
                dedup.bbit_pack(F.col("sb"), 16, b),
                16,
                b,
            ).alias("j"),
        )
        .collect()
    )
    for r in pairs:
        want = _py_est(
            _py_pack(rows[r.da][0], b), _py_pack(rows[r.db][0], b), 16, b
        )
        assert abs(r.j - want) < 1e-9


def test_bbit_pack_refuses_overflowing_width():
    """16 components × b=4 = 64 bits — one more than a signed long
    holds; the pack guard must refuse instead of silently overflowing
    into the sign bit."""
    import pytest
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="must fit a long"):
        dedup.bbit_pack(F.col("signature"), 16, 4)


_events = st.lists(
    st.tuples(st.integers(1, 3), st.integers(-1000, 1000)),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t,
)


@settings(max_examples=prop_examples(8), deadline=None)
@given(lrows=_events, rrows=_events)
def test_asof_time_reversal_duality(spark, lrows, rrows):
    """forward(left, right) == backward(−left, −right): negating every
    timestamp swaps 'earliest at-or-after' with 'latest at-or-before'
    (equal-timestamp matches survive on both sides of the duality).
    Timestamps are made unique per (key, side) pair by hypothesis's
    unique_by, and right values are keyed off the timestamp so a match
    identifies the exact matched row."""
    from nyc_tlc_analytics_pipeline_spark.operators.temporal import asof_join

    # de-dup right timestamps per key (duplicate ts would make the pick
    # among equal rows undefined in BOTH directions — not the property
    # under test)
    seen = set()
    rclean = []
    for k, ts in rrows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            rclean.append((k, ts, float(ts)))
    left = spark.createDataFrame(lrows, "k int, ts long")
    right = spark.createDataFrame(rclean, "k int, ts long, v double")
    fwd = {
        (r.k, r.ts): r.asof_v
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], direction="forward",
        ).collect()
    }
    nleft = left.selectExpr("k", "-ts AS ts")
    nright = right.selectExpr("k", "-ts AS ts", "v")
    back = {
        (r.k, -r.ts): r.asof_v
        for r in asof_join(
            nleft, nright, on="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], direction="backward",
        ).collect()
    }
    assert fwd == back


# ---------------------------------------------------------------------------
# segment dedup (q174/q180): reconstruction + keep-first conservation
# ---------------------------------------------------------------------------

_words = st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=4), min_size=1, max_size=30
)
_corpus = st.lists(st.tuples(_words), min_size=1, max_size=6)


@settings(max_examples=prop_examples(8), deadline=None)
@given(rows=_corpus, seg_len=st.sampled_from([1, 3, 8]))
def test_segment_table_reconstruction_property(spark, rows, seg_len):
    """For ANY corpus and segment width: concatenating a document's
    segments in order reproduces its token stream exactly, and segment
    token counts sum to the document token count."""
    df = spark.createDataFrame(
        [(i, "xx", " ".join(ws)) for i, (ws,) in enumerate(rows)],
        ["doc_id", "lang", "text"],
    )
    segs = dedup.segment_table(df, seg_len=seg_len).collect()
    by_doc = {}
    for r in sorted(segs, key=lambda r: (r.doc_id, r.seg_idx)):
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, (ws,) in enumerate(rows):
        toks = " ".join(ws).lower().split()
        got = " ".join(r.seg_text for r in by_doc[i]).split()
        assert got == toks
        assert sum(r.seg_tokens for r in by_doc[i]) == len(toks)
        # every segment except possibly the last is full-width
        widths = [r.seg_tokens for r in by_doc[i]]
        assert all(w == seg_len for w in widths[:-1])


@settings(max_examples=prop_examples(8), deadline=None)
@given(rows=_corpus)
def test_segment_dedup_conservation_property(spark, rows):
    """Keep-first conservation on ANY corpus: total kept tokens (total −
    removed) equal the token count of the distinct-segment set with one
    occurrence each — and appending a verbatim copy of every document
    leaves the kept-token count UNCHANGED (the copy contributes only
    removable duplicates)."""
    base = [(i, "xx", " ".join(ws)) for i, (ws,) in enumerate(rows)]
    df = spark.createDataFrame(base, ["doc_id", "lang", "text"])
    rep = dedup.segment_dedup_report(df, seg_len=3).collect()[0]
    # python twin of kept tokens: first occurrence per segment text
    seen, kept = set(), 0
    for i, (ws,) in enumerate(rows):
        toks = " ".join(ws).lower().split()
        for s in range(0, len(toks), 3):
            seg = " ".join(toks[s : s + 3])
            if seg not in seen:
                seen.add(seg)
                kept += len(toks[s : s + 3])
    assert rep.total_tokens - rep.removed_tokens == kept

    doubled = base + [
        (1000 + i, "xx", t) for i, (_, _, t) in enumerate(base)
    ]
    df2 = spark.createDataFrame(doubled, ["doc_id", "lang", "text"])
    rep2 = dedup.segment_dedup_report(df2, seg_len=3).collect()[0]
    # the copy contributes only duplicates: kept tokens are unchanged
    assert rep2.total_tokens - rep2.removed_tokens == kept


# ---------------------------------------------------------------------------
# shard-balance Gini (q178): python-twin equality on arbitrary weights
# ---------------------------------------------------------------------------


@settings(max_examples=prop_examples(8), deadline=None)
@given(
    weights=st.lists(st.integers(0, 1000), min_size=1, max_size=40),
    s=st.sampled_from([2, 4, 8]),
)
def test_shard_gini_matches_python_twin(spark, weights, s):
    from nyc_tlc_analytics_pipeline_spark.operators import layout

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], ["doc_id", "n_chars"]
    )
    rep = {r.strategy: r for r in layout.shard_balance_report(df, s).collect()}

    def py_gini(shard_of):
        buckets = [0] * s
        for i, w in enumerate(weights):
            buckets[shard_of(i)] += w
        tot = sum(buckets)
        if tot == 0:
            return None
        w_sorted = sorted(buckets)
        return round(
            sum((2 * (i + 1) - s - 1) * w for i, w in enumerate(w_sorted))
            / (s * tot)
            + 1e-9,
            6,
        )

    import hashlib

    def hashmod(i):
        return int(hashlib.md5(f"shard:{i}".encode()).hexdigest()[:8], 16) % s

    lo, hi = 0, len(weights) - 1
    def idrange(i):
        return min((i - lo) * s // (hi - lo + 1), s - 1)

    if sum(weights) > 0:
        assert rep["hashmod"].gini == py_gini(hashmod)
        assert rep["idrange"].gini == py_gini(idrange)
        for r in rep.values():
            assert 0.0 <= r.gini < 1.0
