"""Unigram language-model scoring: the cheap statistical tier of
LM-based quality filtering (the step between regex heuristics and a
real KenLM/fastText model in published curation pipelines — documents
whose token distribution is unlike the corpus score low and get
routed to review/drop).

Two-pass shape, which is the part that matters at 100 TB:

- **pass 1 (corpus statistics)**: explode → groupBy(token) → count.
  One shuffle keyed by token; the result is |vocab| rows.  The total
  token count N and vocab size V come from a 1-ROW global aggregate of
  the counts table, broadcast-cross-joined back onto it.  (Not an
  empty-partition window: ``Window.partitionBy()`` would move the
  entire vocabulary — easily 10⁸ rows at 100 TB — onto one executor.
  The 1-row agg is a map-side-combined reduce plus a broadcast; the
  counts table itself never leaves its token-keyed partitioning.)
- **pass 2 (scoring)**: explode the documents again and hash-join the
  counts table on token.  The counts side is |vocab| — broadcast it
  while it fits (a 10M-type vocab is ~100 MB, still broadcastable);
  beyond that the join degrades to a token-keyed shuffle whose keys are
  Zipf-skewed, which AQE's skew splitting handles (or pre-salt the head
  tokens with ``operators.skew``).

Scoring is add-k-smoothed log-likelihood per token:
``log((c_t + k) / (N + k·V))``, averaged per document.  Everything is
column expressions; the DuckDB oracle restates the same two passes, so
even this statistical operator is exactly hash-checked (log/exp are
IEEE doubles in both engines; final aggregates are nudge-rounded like
every other double in the catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from . import text


def corpus_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pass 1: (token, cnt) plus constant N (total tokens) and V (vocab
    size) columns — a 1-row global aggregate broadcast back onto the
    counts frame (never an empty-partition window, which would funnel
    the whole vocabulary through one partition)."""
    counts = (
        df.select(F.explode(text.tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    totals = counts.agg(
        F.sum("cnt").alias("N"), F.count("*").alias("V")
    )
    return counts.crossJoin(F.broadcast(totals))


def doc_logprob_scores(
    df: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    k: float = 1.0,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Pass 2: per-document mean add-k-smoothed unigram log-likelihood
    (``avg_logprob``, natural log) and token count.  ``stats`` defaults
    to pass-1 over ``df`` itself (self-scoring); pass a held-out corpus'
    stats to score against a reference distribution instead."""
    if stats is None:
        stats = corpus_token_stats(df, text_col)
    toks = df.select(
        *id_cols,
        text.token_count(text_col).alias("__n_tokens"),
        F.explode(text.tokens(text_col)).alias("token"),
    )
    logp = F.log((col("cnt") + lit(k)) / (col("N") + lit(k) * col("V")))
    return (
        toks.join(F.broadcast(stats), "token")
        .groupBy(*id_cols, "__n_tokens")
        .agg(F.sum(logp).alias("__sum_logp"))
        .withColumn("avg_logprob", col("__sum_logp") / col("__n_tokens"))
        .withColumnRenamed("__n_tokens", "n_tokens")
        .drop("__sum_logp")
    )
