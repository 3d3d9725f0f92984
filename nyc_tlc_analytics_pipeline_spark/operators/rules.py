"""Gopher/C4-style quality-rule filters for training-data curation.

Each rule is a pure column expression (JVM-side, inside whole-stage
codegen) over the token array — no Python, no shuffle: the whole rule
battery is a map-only pass that Catalyst fuses into the scan stage, so
it costs one corpus read at any scale (the published pipelines — Gopher
rules, C4 heuristics — are exactly this shape: cheap per-document
predicates applied before any pairwise dedup).

The repetition rules need per-document n-gram frequencies.  For the
≤ few-hundred-token documents here they are computed INSIDE the row via
array expressions (``list_distinct`` × ``filter`` — O(k²) comparisons on
k tokens, all in codegen, zero data motion).  For book-length documents
the same rule should switch to the explode → groupBy(doc, gram) form,
which trades a shuffle for linear per-row work; the cutover is a
caller-side choice, both forms are equivalence-tested.

Rule battery (token-adapted from the Gopher paper's Table A1 — the
line-based rules are omitted because this corpus is single-line):

- token count within [min_tokens, max_tokens]
- mean token length within [2, 10]
- ≥ 80% of tokens contain an alphabetic character (any script)
- symbol ratio (non-alphanumeric, non-space chars / all chars) ≤ 10%
- repeated-token fraction (1 − distinct/total) ≤ 60%
- top-bigram coverage (2 · max bigram frequency / tokens) ≤ 10%
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from . import text


def bigrams(toks: Column) -> Column:
    """Adjacent token pairs as 'a b' strings (k−1 bigrams for k tokens)."""
    return F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, lit(0))),
        lambda t, i: F.concat_ws(" ", t, F.element_at(toks, i + 2)),
    )


def top_bigram_fraction(toks: Column) -> Column:
    """Fraction of tokens covered by the single most frequent bigram:
    2 · max_count / n_tokens (each bigram occurrence spans 2 tokens).

    In-row O(k log k) form: sort the bigram array, then the max frequency
    is the longest run of equal adjacent elements — one linear aggregate
    pass.  (The earlier distinct × filter form was O(k²) higher-order
    steps, and lambda expressions are interpreted, not codegen'd — it
    dominated the whole rule battery's runtime ~50×.)  See the module
    docstring for the explode → groupBy form for book-length rows."""
    bg = F.array_sort(bigrams(toks))
    zero = F.struct(
        lit("").alias("prev"), lit(0).alias("run"), lit(0).alias("best")
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    max_count = F.aggregate(bg, zero, step, lambda acc: acc["best"])
    return (
        F.coalesce(max_count, lit(0)) * lit(2.0) / F.nullif(F.size(toks), lit(0))
    )


def repeated_token_fraction(toks: Column) -> Column:
    """1 − distinct/total: how much of the document is re-used vocabulary."""
    return lit(1.0) - F.size(F.array_distinct(toks)) / F.nullif(
        F.size(toks), lit(0)
    )


def mean_token_length(toks: Column) -> Column:
    return F.aggregate(
        toks, lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ) / F.nullif(F.size(toks), lit(0))


def symbol_ratio(text_col: Column) -> Column:
    """Punctuation chars / all chars.  Unlike ``text.punct_ratio`` (which
    counts every non-[a-z0-9] char and would flag ALL CJK text), only
    ASCII punctuation counts as a symbol, so non-Latin scripts pass."""
    n_sym = F.length(F.regexp_replace(text_col, r"[^\p{Punct}]", ""))
    return n_sym / F.nullif(F.length(text_col), lit(0))


def alpha_token_fraction(toks: Column) -> Column:
    """Share of tokens containing at least one letter (unicode-aware:
    anything that is not digit/punct/space counts as a letter, so CJK
    scripts pass)."""
    has_alpha = F.filter(
        toks, lambda t: t.rlike(r"[^0-9\p{Punct}\s]")
    )
    return F.size(has_alpha) / F.nullif(F.size(toks), lit(0))


# thresholds: module-level so the oracle SQL derives from the same values
MIN_TOKENS = 20
MAX_TOKENS = 1000
MEAN_LEN_LO = 2.0
MEAN_LEN_HI = 10.0
ALPHA_MIN = 0.8
SYMBOL_MAX = 0.1
REPEAT_MAX = 0.6
TOP_BIGRAM_MAX = 0.1


def rule_flags(
    text_col: Column | str, toks: Column | str | None = None
) -> dict[str, Column]:
    """The rule battery as named boolean columns (True = rule VIOLATED,
    matching how curation pipelines report per-rule rejection counts).

    ``toks``: optionally a pre-computed token-array column (semantics of
    :func:`operators.text.tokens`).  Pipelines that tokenize once and
    feed several consumers (gate + decontam + token counts — the q55
    funnel) pass it to avoid re-splitting the text per consumer."""
    c = col(text_col) if isinstance(text_col, str) else text_col
    if toks is None:
        toks = text.tokens(c)
    elif isinstance(toks, str):
        toks = col(toks)
    n = F.size(toks)
    return {
        "bad_length": (n < MIN_TOKENS) | (n > MAX_TOKENS),
        "bad_mean_len": ~mean_token_length(toks).between(MEAN_LEN_LO, MEAN_LEN_HI),
        "bad_alpha": alpha_token_fraction(toks) < ALPHA_MIN,
        "bad_symbols": F.coalesce(symbol_ratio(c), lit(0.0)) > SYMBOL_MAX,
        "bad_repetition": repeated_token_fraction(toks) > REPEAT_MAX,
        "bad_top_bigram": top_bigram_fraction(toks) > TOP_BIGRAM_MAX,
    }


RULE_FLAG_NAMES = (
    "bad_length",
    "bad_mean_len",
    "bad_alpha",
    "bad_symbols",
    "bad_repetition",
    "bad_top_bigram",
)


def apply_rules(
    df: DataFrame,
    text_col: str = "text",
    toks: Column | str | None = None,
    impl: str = "expr",
) -> DataFrame:
    """Attach per-rule violation flags and the overall ``rules_pass``
    verdict.  Map-only either way: no shuffle, one corpus pass.

    - ``impl="expr"`` (default): pure column expressions.  The battery
      fuses into the scan, but the array rules run as INTERPRETED
      higher-order lambdas (array_sort/aggregate/filter are not
      codegen'd), ~0.2–0.4 s each per corpus pass at sf0.1 — measured
      as 58% of the q55 funnel (BENCH_SCALING.md round-14 stage table).
    - ``impl="arrow"``: one ``mapInArrow`` kernel computes all six
      flags per batch with vectorized pyarrow/numpy (dictionary-encode
      the flattened token child array once, then O(tokens) segment
      arithmetic) — the documented Arrow-kernel exception (guide §4.2,
      the ``cluster.py`` precedent).  Value-identical to the expr form
      including null propagation and float comparison order
      (equality-pinned in tests/test_rules_packing.py); every ratio is
      a single IEEE division of exact integer counts, so there is no
      FP-association drift between the two impls.
    """
    if impl == "arrow" and isinstance(text_col, str):
        return _apply_rules_arrow(df, text_col, toks)
    flags = rule_flags(text_col, toks)
    out = df.withColumns(flags)
    verdict = None
    for name in flags:
        bad = col(name)
        verdict = bad if verdict is None else (verdict | bad)
    return out.withColumn("rules_pass", ~verdict)


#: ASCII punctuation, exactly Java's non-UNICODE_CHARACTER_CLASS
#: ``\p{Punct}`` (0x21-0x2F, 0x3A-0x40, 0x5B-0x60, 0x7B-0x7E) — re2
#: character-class form for the Arrow kernel
_PUNCT_RE2 = r"[!-/:-@\[-`{-~]"
#: a character that makes a token "alphabetic": anything outside
#: digits / ASCII punct / Java ``\s`` (= [ \t\n\x0B\f\r]); mirrors
#: ``alpha_token_fraction``'s ``[^0-9\p{Punct}\s]`` rlike exactly
_ALPHA_RE2 = r"[^0-9!-/:-@\[-`{-~ \t\n\x0B\f\r]"


def _apply_rules_arrow(
    df: DataFrame, text_col: str, toks: Column | str | None
) -> DataFrame:
    """Arrow-batched rule battery (see :func:`apply_rules` ``impl="arrow"``).

    Tokenization stays in the JVM (``text.tokens`` — regex-split parity
    with the oracle is the JVM expression's contract); the kernel
    consumes the token LIST column zero-copy (child values + offsets),
    dictionary-encodes the flattened tokens ONCE (C++), and derives all
    six per-document statistics from integer segment arithmetic:

    - token count / mean length: cumsum of ``utf8_length`` over offsets;
    - alpha fraction: cumsum of one vectorized re2 match over tokens;
    - symbol ratio: ``count_substring_regex`` over the raw text column;
    - distinct fraction / top-bigram: per-segment ``np.unique`` on the
      dictionary codes (bigram = code[i]·V + code[i+1]; tokens cannot
      contain whitespace, so code-pair identity == joined-string
      identity).

    Null parity with the expression form: null text/tokens yield null
    flags (except ``bad_symbols``, whose ``coalesce(..., 0.0)`` makes it
    False), and ``rules_pass`` follows three-valued OR.
    """
    from . import text as _text

    tmp_tk = None
    if toks is None:
        tmp_tk = "__rules_tk"
        df = df.withColumn(tmp_tk, _text.tokens(text_col))
        tk_name = tmp_tk
    elif isinstance(toks, str):
        tk_name = toks
    else:
        tmp_tk = "__rules_tk"
        df = df.withColumn(tmp_tk, toks)
        tk_name = tmp_tk

    in_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = (
        in_fields
        + ", "
        + ", ".join(f"{n} boolean" for n in RULE_FLAG_NAMES)
        + ", rules_pass boolean"
    )
    min_t, max_t = MIN_TOKENS, MAX_TOKENS
    len_lo, len_hi = MEAN_LEN_LO, MEAN_LEN_HI
    alpha_min, sym_max = ALPHA_MIN, SYMBOL_MAX
    rep_max, bigram_max = REPEAT_MAX, TOP_BIGRAM_MAX
    text_name, tk = text_col, tk_name

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            m = rb.num_rows
            if m == 0:
                continue
            lst = rb.column(rb.schema.get_field_index(tk))
            if isinstance(lst, pa.ChunkedArray):  # defensive; batches are flat
                lst = lst.combine_chunks()
            txt = rb.column(rb.schema.get_field_index(text_name))
            tk_valid = lst.is_valid().to_numpy(zero_copy_only=False)
            off = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            flat = lst.values
            # one C++ pass each over the flattened tokens
            tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
            tok_alpha = pc.match_substring_regex(flat, _ALPHA_RE2).to_numpy(
                zero_copy_only=False
            )
            codes_arr = pc.dictionary_encode(flat)
            codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            vocab = np.int64(len(codes_arr.dictionary))
            cs_len = np.concatenate(
                ([0], np.cumsum(tok_len.astype(np.int64)))
            )
            cs_alpha = np.concatenate(
                ([0], np.cumsum(tok_alpha.astype(np.int64)))
            )
            # symbol ratio inputs (raw text column)
            txt_valid = txt.is_valid().to_numpy(zero_copy_only=False)
            n_sym = pc.count_substring_regex(txt, _PUNCT_RE2).to_numpy(
                zero_copy_only=False
            )
            n_chr = pc.utf8_length(txt).to_numpy(zero_copy_only=False)

            # ---- fully vectorized per-row flags (no Python row loop) ----
            # offsets are ABSOLUTE indices into lst.values (the raw
            # child), even for sliced arrays — verified.  n per row:
            n = off[1:] - off[:-1]
            # null rows contribute nothing; their offset span is not
            # guaranteed empty, so gather segments through an explicit
            # index (contiguity across rows is then irrelevant)
            n_eff = np.where(tk_valid, n, 0).astype(np.int64)
            nonempty = tk_valid & (n > 0)
            # segment sums from the cumsums at the row boundaries —
            # same integer sums, same single IEEE division as the
            # scalar form (parity-critical)
            seg_len = cs_len[off[1:]] - cs_len[off[:-1]]
            seg_alpha = cs_alpha[off[1:]] - cs_alpha[off[:-1]]
            with np.errstate(divide="ignore", invalid="ignore"):
                mean_len = seg_len / n
                alpha_frac = seg_alpha / n
                sym_ratio = n_sym.astype(np.float64) / n_chr.astype(
                    np.float64
                )

            # bad_symbols: coalesce(ratio, 0.0) > max — False on null
            f_sym = np.where(
                txt_valid & (n_chr > 0), sym_ratio > sym_max, False
            )
            # expr-path parity under legacy sizeOfNull (ansi off):
            # size(null) = -1, so bad_length is TRUE on null tokens,
            # alpha = -1/-1 = 1.0 (False), repetition 0.0 (False),
            # top-bigram -0.0 (False); only mean_len stays null
            f_len = np.where(tk_valid, (n < min_t) | (n > max_t), True)
            f_mean = np.where(
                nonempty, ~((mean_len >= len_lo) & (mean_len <= len_hi)), False
            )
            f_alpha = np.where(nonempty, alpha_frac < alpha_min, False)

            # distinct / top-bigram counts over ALL rows at once: gather
            # every valid row's codes behind a row-id, then one global
            # np.unique per statistic
            starts = off[:-1]
            cum = np.concatenate(([0], np.cumsum(n_eff)))
            total = int(cum[-1])
            gather = np.repeat(starts, n_eff) + (
                np.arange(total, dtype=np.int64)
                - np.repeat(cum[:-1], n_eff)
            )
            codes_g = codes[gather]
            row_ids = np.repeat(np.arange(m, dtype=np.int64), n_eff)
            drow = np.zeros(m, dtype=np.int64)
            mx = np.zeros(m, dtype=np.int64)
            if total:
                uniq_rows = np.unique(row_ids * vocab + codes_g) // vocab
                drow += np.bincount(uniq_rows, minlength=m)
                within = row_ids[1:] == row_ids[:-1]
                if within.any():
                    r = row_ids[1:][within]
                    bg = codes_g[:-1][within] * vocab + codes_g[1:][within]
                    # keyed unique needs m·vocab² < 2^63; fall back to a
                    # lexsorted pair unique for pathological vocabularies
                    if vocab > 0 and m * vocab * vocab < (1 << 62):
                        uk, cnt = np.unique(
                            r * (vocab * vocab) + bg, return_counts=True
                        )
                        rows_u = uk // (vocab * vocab)
                    else:
                        order = np.lexsort((bg, r))
                        rs, bs = r[order], bg[order]
                        new = np.concatenate(
                            ([True], (rs[1:] != rs[:-1]) | (bs[1:] != bs[:-1]))
                        )
                        idx = np.flatnonzero(new)
                        cnt = np.diff(np.concatenate((idx, [len(rs)])))
                        rows_u = rs[idx]
                    np.maximum.at(mx, rows_u, cnt)
            with np.errstate(divide="ignore", invalid="ignore"):
                f_rep = np.where(nonempty, (1.0 - drow / n) > rep_max, False)
                f_big = np.where(nonempty, (mx * 2.0) / n > bigram_max, False)

            # null masks: mean is null when tokens are null OR empty;
            # the other array stats only when non-null-but-empty
            null_mean = ~nonempty
            null_stats = tk_valid & (n == 0)
            # rules_pass = NOT (f1 OR ... OR f6), three-valued OR
            any_true = (
                f_len
                | (f_mean & ~null_mean)
                | (f_alpha & ~null_stats)
                | f_sym
                | (f_rep & ~null_stats)
                | (f_big & ~null_stats)
            )
            any_null = null_mean | null_stats
            rp_null = ~any_true & any_null
            rp = ~any_true

            def _b(values, mask=None):
                return pa.array(
                    values.astype(bool),
                    type=pa.bool_(),
                    mask=None if mask is None else mask.astype(bool),
                )

            arrays = list(rb.columns) + [
                _b(f_len),
                _b(f_mean, null_mean),
                _b(f_alpha, null_stats),
                _b(f_sym),
                _b(f_rep, null_stats),
                _b(f_big, null_stats),
                _b(rp, rp_null),
            ]
            names = list(rb.schema.names) + list(RULE_FLAG_NAMES) + [
                "rules_pass"
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    out = df.mapInArrow(kernel, out_schema)
    if tmp_tk is not None:
        out = out.drop(tmp_tk)
    return out


def filter_by_rules(
    df: DataFrame,
    text_col: str = "text",
    toks: Column | str | None = None,
    impl: str = "expr",
) -> DataFrame:
    """Keep only rule-passing documents (the curation gate form)."""
    return apply_rules(df, text_col, toks, impl=impl).filter(col("rules_pass"))
