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


def apply_rules(
    df: DataFrame,
    text_col: str = "text",
    toks: Column | str | None = None,
) -> DataFrame:
    """Attach per-rule violation flags and the overall ``rules_pass``
    verdict.  Map-only: fused into the scan, no shuffle, no Python."""
    flags = rule_flags(text_col, toks)
    out = df.withColumns(flags)
    verdict = None
    for name in flags:
        bad = col(name)
        verdict = bad if verdict is None else (verdict | bad)
    return out.withColumn("rules_pass", ~verdict)


def filter_by_rules(
    df: DataFrame,
    text_col: str = "text",
    toks: Column | str | None = None,
) -> DataFrame:
    """Keep only rule-passing documents (the curation gate form)."""
    return apply_rules(df, text_col, toks).filter(col("rules_pass"))
