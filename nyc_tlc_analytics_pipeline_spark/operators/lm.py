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

#: broadcast cap for held-out-MODEL frames, in estimated model-corpus
#: TOKENS (the bigram/context/continuation type tables are each bounded
#: by the model's token count).  4M tokens ≈ a ~100 MB hash relation at
#: the string-key row width — comfortably executor-sized.  Above the
#: cap every model join falls back to a sort-merge on its key: "bounded
#: by construction" holds only while the held-out corpus is actually
#: small, and a wiki-sized reference corpus is tens of millions of
#: bigram types — an unconditional broadcast there is the exact
#: estimate-blind-broadcast bug class fixed in doc_logprob_scores.
MODEL_BROADCAST_CAP_TOKENS = 4_000_000


def _model_token_estimate(model_df: DataFrame) -> int:
    """Zero-job estimate of the model corpus' token count: plan bytes
    over ~8 bytes/token (NOT rowCount — that counts documents; bytes
    track token volume no matter the doc split).  The type tables built
    from the model are each ≤ its token count, so this one number gates
    ALL of a scorer's model-frame joins.  Shared machinery:
    ``core.guards.estimated_source_units`` (fails open to 'huge' →
    merge path)."""
    from ..core.guards import estimated_source_units

    return estimated_source_units(model_df, bytes_per_unit=8)


def _model_side(bounded: bool):
    """Join-side wrapper for a held-out-model frame — see
    ``core.guards.reference_join_side`` (broadcast while provably
    small, merge-hint beyond)."""
    from ..core.guards import reference_join_side

    return reference_join_side(bounded)


#: the OOV class every out-of-vocab token maps to under ``vocab_cap``.
UNK = "<unk>"


def _map_bigrams_unk(big: DataFrame, vocab: DataFrame) -> DataFrame:
    """Rewrite a bigram stream (bigram, __prev, __cur, …) so every
    token outside ``vocab`` (single column ``t``) becomes :data:`UNK` —
    two left joins against the V-row vocab, broadcast unconditionally
    because V is bounded BY THE CAP, not by any corpus."""
    kp = F.broadcast(vocab.select(col("t").alias("__kp")))
    kc = F.broadcast(vocab.select(col("t").alias("__kc")))
    keep = [c for c in big.columns if c not in ("bigram", "__prev", "__cur")]
    return (
        big.join(kp, col("__prev") == col("__kp"), "left")
        .join(kc, col("__cur") == col("__kc"), "left")
        .select(
            *keep,
            F.coalesce(col("__kp"), lit(UNK)).alias("__prev"),
            F.coalesce(col("__kc"), lit(UNK)).alias("__cur"),
        )
        .withColumn("bigram", F.concat(col("__prev"), lit(" "), col("__cur")))
    )


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
        # merge hint — BOTH naive strategies break at scale here: a
        # forced broadcast of the CORPUS-derived stats (|vocab| rows)
        # fails the driver once the vocab outgrows it, and the
        # hint-free plan is worse — Catalyst's size estimate for the
        # exploded-token side is file-size based and blind to the
        # explode fan-out, so at BENCH_SCALE=100 the planner statically
        # broadcast the 3.9 GiB EXPLODED CORPUS (estimated < 64 MB).
        # Sort-merge on the token key is the shape the module docstring
        # promises: corpus side shuffles by token, AQE splits the Zipf
        # head, nothing is ever built in one memory.
        toks.join(stats.hint("merge"), "token")
        .groupBy(*id_cols, "__n_tokens")
        .agg(F.sum(logp).alias("__sum_logp"))
        .withColumn("avg_logprob", col("__sum_logp") / col("__n_tokens"))
        .withColumnRenamed("__n_tokens", "n_tokens")
        .drop("__sum_logp")
    )


# ---------------------------------------------------------------------------
# bigram LM perplexity (the CCNet-style LM quality filter, one order up)
# ---------------------------------------------------------------------------

def bigrams(t) -> "F.Column":
    """Adjacent-token bigram array ("prev cur" strings) from a token
    array — pure column expressions (zip of the array with its own
    shift), empty for docs under 2 tokens."""
    n = F.size(t)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, lit(1), n - lit(1)),
            F.slice(t, lit(2), n - lit(1)),
            lambda a, b: F.concat(a, lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def corpus_bigram_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pass 1 for the bigram LM: (bigram, prev, c2, cprev, V) where
    ``c2`` = bigram count, ``cprev`` = context (previous-token) count
    and ``V`` = unigram vocabulary size.  Two token-keyed aggregate
    shuffles (|bigram vocab| + |vocab| rows) and a 1-row V aggregate
    broadcast back — the ``corpus_token_stats`` posture, never an
    empty-partition window."""
    t = text.tokens(text_col)
    big = df.select(F.explode(bigrams(t)).alias("bigram"))
    c2 = big.groupBy("bigram").agg(F.count("*").alias("c2"))
    cp = (
        big.select(F.substring_index("bigram", " ", 1).alias("prev"))
        .groupBy("prev")
        .agg(F.count("*").alias("cprev"))
    )
    v = df.select(F.explode(t).alias("token")).agg(
        F.count_distinct("token").alias("V")
    )
    return (
        c2.withColumn("prev", F.substring_index("bigram", " ", 1))
        # cp is corpus-derived (|unigram vocab| rows): merge hint for
        # the same estimate-blindness reason as doc_logprob_scores —
        # never broadcast a frame that grows with the corpus, never let
        # the planner broadcast the bigger side off a bad estimate; v is
        # a 1-row reduce, always safe to broadcast
        .join(cp.hint("merge"), "prev")
        .crossJoin(F.broadcast(v))
    )


def doc_bigram_perplexity(
    df: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    k: float = 1.0,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Per-document bigram-LM log-perplexity — the workhorse of
    CCNet-style LM filtering (documents whose word-to-word transitions
    surprise the corpus model score high and get routed to drop):

    ``log_ppl = -mean over bigrams of ln p̂(cur | prev)`` with add-k
    smoothing ``p̂ = (c2 + k) / (cprev + k·V)``.

    ``stats`` defaults to pass-1 over ``df`` itself (self-perplexity);
    pass a held-out/high-quality corpus' ``corpus_bigram_stats`` to
    score against a reference model — the actual CCNet setup.  Documents
    under 2 tokens have no bigrams and drop out (nothing to score).

    Scale shape: explode + ONE bigram-keyed join against the stats
    table (broadcast while it fits, AQE skew-split beyond), then a
    doc-keyed aggregate.  Returns ``id_cols`` + (n_bigrams, log_ppl).
    """
    t = text.tokens(text_col)
    big = df.select(
        *id_cols,
        (F.size(t) - lit(1)).alias("__nb"),
        F.explode(bigrams(t)).alias("bigram"),
    )
    logp = F.log((col("c2") + lit(k)) / (col("cprev") + lit(k) * col("V")))
    heldout = stats is not None
    if not heldout:
        stats = corpus_bigram_stats(df, text_col)
    return (
        # self-model stats are corpus-sized: merge hint (see
        # doc_logprob_scores — the estimate-blind static planner
        # otherwise broadcasts the exploded corpus at 100x); a caller-
        # provided held-out model is bounded, so AQE may broadcast it
        big.join(stats if heldout else stats.hint("merge"), "bigram")
        .groupBy(*id_cols, "__nb")
        .agg(F.sum(logp).alias("__s"))
        .withColumn("log_ppl", -col("__s") / col("__nb"))
        .withColumnRenamed("__nb", "n_bigrams")
        .drop("__s")
    )


def heldout_bigram_perplexity(
    df: DataFrame,
    id_cols: list[str],
    model_df: DataFrame,
    text_col: str = "text",
    k: float = 1.0,
    broadcast_cap: int = MODEL_BROADCAST_CAP_TOKENS,
) -> DataFrame:
    """The PRODUCTION CCNet shape: score ``df`` against a bigram model
    trained on a FIXED held-out corpus ``model_df`` (the high-quality
    reference — wiki in CCNet).  Differs from self-model
    :func:`doc_bigram_perplexity` in the two ways that matter:

    - **unseen mass is scored, not dropped**: an eval bigram absent from
      the model gets the smoothing floor ``(0 + k) / (cprev + k·V)``
      (and an unseen context gets ``cprev = 0``) via LEFT joins +
      coalesce — an inner join would silently skip exactly the
      surprising transitions the filter exists to punish;
    - **the join side is constant-size**: the model's bigram/context
      count frames and the 1-row vocab size depend only on the held-out
      corpus, so they broadcast no matter how large the SCORED corpus
      grows — scoring a 100 TB corpus is explode + two map-side hash
      joins + a doc-keyed aggregate, with NO stats recomputation per
      batch (measured: the self-model mode's bigram-keyed shuffle join
      grows 2.9× at 10× data; this mode grows with the scan only).
      Constant-size is NOT the same as small: the broadcast is gated on
      the MODEL corpus' estimated token count (``broadcast_cap``,
      zero-job plan-stats estimate) — a wiki-sized reference model is
      tens of millions of bigram types, and above the cap the model
      joins take a bigram-keyed sort-merge instead of OOMing the
      executors on an unconditional broadcast.

    Returns ``id_cols`` + (n_bigrams, log_ppl), log-perplexity in nats;
    documents under 2 tokens drop out (nothing to score)."""
    t_m = text.tokens(text_col)
    side = _model_side(_model_token_estimate(model_df) <= broadcast_cap)
    big_m = model_df.select(F.explode(bigrams(t_m)).alias("bigram"))
    c2 = big_m.groupBy("bigram").agg(F.count("*").alias("c2"))
    cp = (
        big_m.select(F.substring_index("bigram", " ", 1).alias("__prev"))
        .groupBy("__prev")
        .agg(F.count("*").alias("cprev"))
    )
    v = model_df.select(F.explode(t_m).alias("token")).agg(
        F.count_distinct("token").alias("V")
    )
    t_e = text.tokens(text_col)
    big_e = df.select(
        *id_cols,
        (F.size(t_e) - lit(1)).alias("__nb"),
        F.explode(bigrams(t_e)).alias("bigram"),
    ).withColumn("__prev", F.substring_index("bigram", " ", 1))
    logp = F.log(
        (F.coalesce(col("c2"), lit(0)) + lit(k))
        / (F.coalesce(col("cprev"), lit(0)) + lit(k) * col("V"))
    )
    return (
        big_e.join(side(c2), "bigram", "left")
        .join(side(cp), "__prev", "left")
        .crossJoin(F.broadcast(v))
        .groupBy(*id_cols, "__nb")
        .agg(F.sum(logp).alias("__s"))
        .withColumn("log_ppl", -col("__s") / col("__nb"))
        .withColumnRenamed("__nb", "n_bigrams")
        .drop("__s")
    )


def kneser_ney_perplexity(
    df: DataFrame,
    id_cols: list[str],
    model_df: DataFrame,
    text_col: str = "text",
    d: float = 0.75,
    broadcast_cap: int = MODEL_BROADCAST_CAP_TOKENS,
    vocab_cap: int | None = None,
) -> DataFrame:
    """Interpolated Kneser–Ney bigram perplexity against a held-out
    model — the smoothing KenLM actually ships (the real CCNet filter
    backend), upgrading :func:`heldout_bigram_perplexity`'s add-k floor
    with absolute discounting + a continuation-probability backoff:

    ``p(w|v) = max(c(vw)−d, 0)/c(v) + (d·N1+(v,·)/c(v))·Pcont(w)``
    when context v is seen, else ``Pcont(w)``; the continuation
    probability ``Pcont(w) = (N1+(·,w) + 1)/(T + V)`` carries add-1 on
    the continuation TYPE counts so unseen words still score (T =
    distinct bigram types, V = vocab size).  d = 0.75 (Chen & Goodman's
    fixed discount) — 3/4, exactly representable, so both engines hold
    the identical constant.

    Scale shape — identical to the held-out add-k scorer: every model
    frame (bigram counts, per-context totals + continuation fan-outs,
    per-word continuation counts, the 1-row T/V) is bounded BY
    CONSTRUCTION by the held-out corpus, so while the model's estimated
    token count stays under ``broadcast_cap`` all the model joins
    broadcast and scoring any corpus size is explode → map-side hash
    joins → doc-keyed aggregate.  Above the cap (a wiki-sized reference
    model) the type-table joins take a key-wise sort-merge instead —
    bounded-by-construction is not the same as executor-sized.

    Returns ``id_cols`` + (n_bigrams, n_unseen, log_ppl): ``n_unseen``
    counts eval bigrams absent from the model (the KN diagnostic — a
    high unseen share means the discount mass, not the ML estimate, is
    doing the scoring).  Documents under 2 tokens drop out.

    ``vocab_cap`` (KenLM's actual deployment shape) keeps the top-V
    model unigrams by (count desc, token asc) and maps every other
    token — model AND eval side — to the single ``<unk>`` class BEFORE
    bigram construction, so a genuinely large held-out corpus yields a
    model bounded BY CONSTRUCTION (≤ (V+1)² bigram types): the
    complement to ``broadcast_cap``'s join-side gate.  The vocab pick
    plans as TakeOrderedAndProject (distributed per-partition top-V
    merge, never a global window), and the mapping joins broadcast the
    V-row vocab — bounded by the cap itself."""
    t_m = text.tokens(text_col)
    side = _model_side(_model_token_estimate(model_df) <= broadcast_cap)
    big_m = model_df.select(F.explode(bigrams(t_m)).alias("bigram")).select(
        "bigram",
        F.substring_index("bigram", " ", 1).alias("__prev"),
        F.substring_index("bigram", " ", -1).alias("__cur"),
    )
    vocab = None
    if vocab_cap is not None:
        vocab = (
            model_df.select(F.explode(t_m).alias("t"))
            .groupBy("t")
            .agg(F.count("*").alias("__c"))
            .orderBy(F.desc("__c"), "t")
            .limit(vocab_cap)
            .select("t")
        )
        big_m = _map_bigrams_unk(big_m, vocab)
    c2 = big_m.groupBy("bigram").agg(F.count("*").alias("c2"))
    ctx = big_m.groupBy("__prev").agg(
        F.count("*").alias("cprev"), F.count_distinct("__cur").alias("n1f")
    )
    cont = big_m.groupBy("__cur").agg(F.count_distinct("__prev").alias("n1b"))
    toks_m = model_df.select(F.explode(text.tokens(text_col)).alias("t"))
    if vocab is not None:
        # V under the cap: kept types + <unk> when anything fell outside
        toks_m = toks_m.join(
            F.broadcast(vocab.select(col("t").alias("__kp"))),
            col("t") == col("__kp"),
            "left",
        ).select(F.coalesce(col("__kp"), lit(UNK)).alias("t"))
    consts = big_m.agg(
        F.count_distinct("bigram").alias("T")
    ).crossJoin(toks_m.agg(F.count_distinct("t").alias("V")))
    t_e = text.tokens(text_col)
    big_e = df.select(
        *id_cols,
        (F.size(t_e) - lit(1)).alias("__nb"),
        F.explode(bigrams(t_e)).alias("bigram"),
    ).select(
        "*",
        F.substring_index("bigram", " ", 1).alias("__prev"),
        F.substring_index("bigram", " ", -1).alias("__cur"),
    )
    if vocab is not None:
        big_e = _map_bigrams_unk(big_e, vocab)
    pcont = (F.coalesce(col("n1b"), lit(0)) + lit(1.0)) / (col("T") + col("V"))
    p = F.when(
        col("cprev").isNotNull(),
        F.greatest(F.coalesce(col("c2"), lit(0)) - lit(d), lit(0.0)) / col("cprev")
        + lit(d) * col("n1f") / col("cprev") * pcont,
    ).otherwise(pcont)
    return (
        big_e.join(side(c2), "bigram", "left")
        .join(side(ctx), "__prev", "left")
        .join(side(cont), "__cur", "left")
        .crossJoin(F.broadcast(consts))
        .groupBy(*id_cols, "__nb")
        .agg(
            F.sum(F.log(p)).alias("__s"),
            F.sum(col("c2").isNull().cast("long")).alias("n_unseen"),
        )
        .withColumn("log_ppl", -col("__s") / col("__nb"))
        .withColumnRenamed("__nb", "n_bigrams")
        .drop("__s")
    )
