"""Deterministic hash-based sampling for training-data pipelines.

``df.sample()`` is the wrong tool for corpus curation at 100 TB: its RNG
is seeded per-partition, so the sample CHANGES whenever partitioning,
file layout, or cluster size changes — a re-run of the same pipeline
selects different documents.  Every sampler here instead derives its
decision from ``md5(salt || key)``, which gives:

- **reproducibility**: same key + salt → same decision, on any cluster
  layout, forever (and in any engine that shares md5 — the DuckDB
  oracles recompute the identical samples);
- **no data motion**: bernoulli sampling and splitting are pure map-side
  filters — no shuffle, no sort, fully pushed into the scan stage;
- **consistency across tables**: sampling two fact tables by the same
  join key keeps them aligned (a sampled user keeps ALL their rows).

The hash fraction is the first 8 hex chars of the digest read as a
uniform 32-bit integer — u/2³² ~ U[0,1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from ..core.pins import pin


def hash_fraction(key: Column | str, salt: str = "") -> Column:
    """Deterministic U[0,1) from a key: first 32 bits of md5(salt || key)
    over 2³².  Pure column expression — evaluated inside codegen."""
    k = F.col(key) if isinstance(key, str) else key
    digest = F.md5(F.concat(lit(salt), k.cast("string")))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("double") / lit(2.0**32)


def hash_top_n(df: DataFrame, key: str, n: int, salt: str = "") -> DataFrame:
    """Deterministic fixed-SIZE global sample: the ``n`` rows with the
    smallest md5 hash fractions (ties broken on the key).  Unlike
    :func:`bernoulli_sample` (fixed FRACTION — grows with the corpus),
    the output is bounded by construction no matter how large the
    source grows: the right shape for audit inputs whose downstream
    cost is superlinear (e.g. the exact-Jaccard truth side of
    :func:`~..dedup.near_dup_gate_audit`'s shingle self-join).

    Physically a ``TakeOrderedAndProject`` (per-partition top-n, then
    merge) — no global sort, no single-partition window — and the
    ``GlobalLimit`` gives Catalyst a row-bounded size estimate, so
    downstream fail-closed budget gates (``estimated_source_units``)
    see the SAMPLE's size, not the source scan's."""
    return df.orderBy(hash_fraction(key, salt), col(key)).limit(n)


def bernoulli_sample(
    df: DataFrame, key: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep each row iff hash_fraction(key) < rate — a map-side filter
    with NO shuffle; the expected kept fraction is ``rate`` and the
    decision is stable under any repartitioning or re-run."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(hash_fraction(key, salt) < lit(float(rate)))


def assign_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Disjoint, exhaustive train/val/test assignment: the [0,1) hash
    line is cut at the cumulative weights (insertion order of
    ``weights``), so every row lands in exactly one split and membership
    never changes as the corpus grows — new keys don't reshuffle old
    ones (the property random split lacks)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    u = hash_fraction(key, salt)
    expr = None
    edge = 0.0
    names = list(weights)
    for name in names[:-1]:
        edge += weights[name]
        cond_val = F.when(u < lit(edge), lit(name))
        expr = cond_val if expr is None else expr.when(u < lit(edge), lit(name))
    expr = (
        lit(names[0]) if expr is None else expr.otherwise(lit(names[-1]))
    )
    return df.withColumn(out_col, expr)


def leakage_safe_splits(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, float],
    salt: str = "split",
    pairs: DataFrame | None = None,
    pair_source: str = "minhash",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Group-aware train/val/test assignment: near-duplicate documents
    are clustered (connected components over a near-dup pair set) and
    the SPLIT decision hashes the cluster id, so no near-duplicate of a
    training document can ever land in an eval split.

    The near-dup pair set is pluggable — that choice IS the scale knob:

    - ``pair_source="minhash"`` (DEFAULT, the production path): banded
      MinHash-LSH candidates verified by exact Jaccard
      (:func:`dedup.minhash_dedup_pairs`) — candidate volume is
      bucket-bounded, measured ~2.4× at 10× corpus growth.
    - ``pair_source="jaccard"``: exact all-qualifying-pairs via the
      prefix-filtered shingle join (:func:`dedup.jaccard_pairs`) —
      recall 1.0 but pair-join growth ~5.6× at 10×; the oracle-gated
      verification mode, not the 100 TB default.
    - ``pairs=<DataFrame>``: any precomputed (doc_a, doc_b) frame
      (SimHash, embedding LSH, SemDeDup...) — overrides pair_source.

    Returns ``docs`` columns plus ``g`` (cluster id, singletons = own
    doc id) and ``split``.  Membership is stable as the corpus grows:
    the hash line never reshuffles existing groups
    (:func:`assign_split` semantics)."""
    from . import dedup, graph

    pairs = dedup.near_dup_pairs(
        docs, id_col, text_col, pairs=pairs, pair_source=pair_source,
        n=n, threshold=threshold, num_hashes=num_hashes, bands=bands,
    )
    cc = graph.connected_components(pairs.select("doc_a", "doc_b"))
    grouped = docs.join(
        cc.select(col("node").alias(id_col), col("component")), id_col, "left"
    ).withColumn("g", F.coalesce(col("component"), col(id_col)))
    return assign_split(grouped.drop("component"), "g", weights, salt=salt)


def counterfactual_leakage_report(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, float],
    salt: str = "split",
    *,
    pairs: DataFrame | None = None,
    pair_source: str = "minhash",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Why :func:`leakage_safe_splits` exists, quantified on THIS corpus:
    the same near-dup pair set is evaluated under the cluster-keyed
    assignment (zero pairs may straddle splits, by construction) versus
    a naive per-doc hash split (every cross-assigned near-dup pair is
    train/test contamination).  One row per mode with pair counts,
    straddle share, and distinct leaked docs.

    The pair set is pluggable (:func:`dedup.near_dup_pairs`) and feeds
    BOTH the cluster assignment and the audit join, so report and split
    always agree on what counts as a near-duplicate.  MinHash-LSH is the
    default — a leakage audit of a 100 TB corpus has to run at the same
    scale as the split itself; exact Jaccard is the oracle-gated mode.

    Scale shape: the pair frame is pinned once (it feeds the
    closure, two split joins, and the audit aggregate), split assignment
    is a map-side hash, and each mode is one pair-keyed join + a 1-row
    aggregate."""
    from . import dedup
    from ..functions.scalar import rnd

    p = dedup.near_dup_pairs(
        docs, id_col, text_col, pairs=pairs, pair_source=pair_source,
        n=n, threshold=threshold, num_hashes=num_hashes, bands=bands,
    ).select("doc_a", "doc_b").transform(pin)
    cl = leakage_safe_splits(
        docs.select(id_col, text_col), id_col, text_col, weights,
        salt=salt, pairs=p,
    ).select(id_col, "split")
    nv = assign_split(
        docs.select(id_col), id_col, weights, salt=salt
    ).select(id_col, "split")

    def mode_stats(assign: DataFrame, mode: str) -> DataFrame:
        a = assign.select(col(id_col).alias("doc_a"), col("split").alias("sa"))
        b = assign.select(col(id_col).alias("doc_b"), col("split").alias("sb"))
        ed = (
            p.join(a, "doc_a")
            .join(b, "doc_b")
            .select(
                (col("sa") != col("sb")).cast("long").alias("straddle"),
                F.explode(F.array("doc_a", "doc_b")).alias("d"),
            )
        )
        return ed.agg(
            lit(mode).alias("mode"),
            (F.count("*") / 2).cast("long").alias("n_pairs"),
            (F.sum("straddle") / 2).cast("long").alias("n_straddling"),
            rnd(F.sum("straddle") / F.count("*"), 6).alias("straddle_share"),
            F.count_distinct(
                F.when(col("straddle") == 1, col("d"))
            ).cast("long").alias("n_leaked_docs"),
        )

    return (
        mode_stats(cl, "cluster")
        .unionByName(mode_stats(nv, "naive"))
        .orderBy("mode")
    )


def dsir_importance_select(
    raw: DataFrame,
    target: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    k: int = 50,
    salt: str = "dsir",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    simplified to unigram features): pick the ``k`` raw documents whose
    token distribution looks most like the TARGET corpus, by Gumbel
    top-k over the per-document log importance ratio — the published
    recipe for "select pretraining data that matches a high-quality
    in-domain set" without training a classifier.

    Mechanics, all deterministic and oracle-checkable:

    - token stats for target and raw (two token-keyed shuffles, |vocab|
      rows each) are FULL-OUTER merged on token and smoothed add-1 over
      the UNION vocabulary; totals N_T/N_R/V are a 1-row aggregate
      broadcast back (the ``lm.corpus_token_stats`` posture — never an
      empty-partition window).
    - each raw document scores ``logw`` = mean over its tokens of
      ``ln p̂_target(t) − ln p̂_raw(t)`` (length-normalized so long
      documents aren't favored), nudge-rounded 9 dp.
    - Gumbel trick: selection key = ``logw + g`` with
      ``g = −ln(−ln u)``, u md5-derived from the first id column (the
      q67 convention: (h+0.5)/2³², never 0/1; 9-dp rank rounding +
      id tie-break) — a deterministic sample ∝ exp(logw), stable
      across layouts, re-runs and engines.
    - top-k is one TakeOrderedAndProject — no global sort.

    At 100 TB the paper's hashed n-gram features drop in by replacing
    ``text.tokens`` with a hashed-gram explode; the plan shape (two
    counts tables, broadcast totals, score join, top-k) is unchanged.

    Returns the selected rows: ``id_cols`` + ``logw`` + ``gumbel`` +
    ``sel_key``."""
    from ..functions.scalar import rnd
    from . import text as T

    tt = target.select(F.explode(T.tokens(text_col)).alias("token"))
    ct = tt.groupBy("token").agg(F.count("*").alias("ct"))
    rtoks = raw.select(
        *[col(c) for c in id_cols],
        F.size(T.tokens(text_col)).alias("__n"),
        F.explode(T.tokens(text_col)).alias("token"),
    )
    cr = rtoks.groupBy("token").agg(F.count("*").alias("cr"))
    # union vocab with add-1 smoothing: raw tokens are a subset of the
    # union by construction, so the scoring join below is an inner join
    u = ct.join(cr, "token", "full_outer").select(
        "token",
        F.coalesce("ct", lit(0)).alias("ct"),
        F.coalesce("cr", lit(0)).alias("cr"),
    )
    tot = u.agg(
        F.sum("ct").alias("NT"), F.sum("cr").alias("NR"), F.count("*").alias("V")
    )
    stats = u.crossJoin(F.broadcast(tot))
    term = F.log((col("ct") + lit(1.0)) / (col("NT") + col("V"))) - F.log(
        (col("cr") + lit(1.0)) / (col("NR") + col("V"))
    )
    scored = (
        rtoks.join(stats, "token")
        .groupBy(*id_cols, "__n")
        .agg(F.sum(term).alias("__s"))
        .withColumn("logw", rnd(col("__s") / col("__n"), 9))
        .drop("__s", "__n")
    )
    key0 = col(id_cols[0])
    h = F.conv(
        F.substring(F.md5(F.concat(lit(salt), key0.cast("string"))), 1, 8), 16, 10
    ).cast("double")
    u01 = (h + lit(0.5)) / lit(2.0**32)
    return (
        scored.withColumn("gumbel", rnd(-F.log(-F.log(u01)), 9))
        .withColumn("sel_key", col("logw") + col("gumbel"))
        .orderBy(col("sel_key").desc(), key0)
        .limit(k)
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    key: str,
    salt: str = "mix",
) -> DataFrame:
    """Downsample a multi-domain corpus to a TARGET MIXTURE: the largest
    subcorpus whose domain proportions equal ``weights`` (the standard
    "rebalance web/books/code to 60/20/20" curation step).

    With per-domain counts c_d and target weights w_d, the feasible total
    is T = min_d(c_d / w_d) and each domain keeps n_d = floor(w_d * T)
    rows — the binding (scarcest-relative-to-weight) domain is kept
    ~whole and every other domain is downsampled to match.  Rows kept are
    the n_d smallest hash fractions, so membership is deterministic and
    layout-independent, and a domain's sample only shrinks/grows at its
    own boundary when the corpus changes.

    Scale shape: one aggregate over (domain) — a handful of rows,
    auto-broadcast back — plus one window per domain for the hash-order
    rank.  No driver-side loop, no collect; domains with a weight of 0
    (or absent from ``weights``) are dropped.
    """
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("at least one weight must be positive")
    norm = {d: w / total_w for d, w in weights.items() if w > 0}

    wmap = F.create_map(*[x for d, w in norm.items() for x in (lit(d), lit(w))])
    # counts is |domains| rows; the feasible total T = min(c_d / w_d) is a
    # global window min over that tiny frame (no cross join, no collect)
    quota = (
        df.groupBy(domain_col)
        .agg(F.count("*").alias("__c"))
        .withColumn("__w", wmap[col(domain_col)])
        .filter(col("__w").isNotNull())
        .withColumn(
            "__t", F.min(col("__c") / col("__w")).over(Window.partitionBy())
        )
        .select(domain_col, F.floor(col("__w") * col("__t")).alias("__n"))
    )
    w = Window.partitionBy(domain_col).orderBy(hash_fraction(key, salt), col(key))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(quota), domain_col)
        .filter(col("__rn") <= col("__n"))
        .drop("__rn", "__n")
    )


def stratified_sample_exact(
    df: DataFrame, group_cols: list[str], n_per_group: int, key: str, salt: str = ""
) -> DataFrame:
    """EXACTLY min(n, |group|) rows per group, chosen as the n smallest
    hash fractions — deterministic, uniform within the group, and
    one shuffle (the window partition).  This is the scale-safe form of
    "give me 10k examples per language": no per-group count pass, no
    driver-side loop, skew handled by AQE like any keyed window."""
    w = Window.partitionBy(*group_cols).orderBy(
        hash_fraction(key, salt), col(key)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(col("__rn") <= n_per_group)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row draws u = hash_fraction(key, salt) and is
    ranked by es_key = u^(1/weight); the top-k ranks are exactly a
    weighted sample without replacement — inclusion probability
    proportional to weight, in ONE distributed pass (a TakeOrdered top-k,
    no per-row state, no rejection loop), which is the property
    sequential A-Res reservoir sampling can't give a shuffle-free
    distributed form.

    Determinism contract (same as every md5-keyed operator here): u is
    md5-derived, so the sample is stable across layouts, re-runs and
    engines; es_key is rank-rounded (nudged, 9 dp) with a key tie-break
    so a last-ulp libm divergence between engines cannot flip the
    selection.  The ranking runs in the LOG domain —
    ``es_key = ln(−ln u) − ln w`` (monotone in u^(1/w); SMALLEST k win)
    — because the direct u^(1/w) form collapses under rounding at large
    weights: for w = 5000 every key lives in [0.9956, 1), so fixed-dp
    rounding quantizes the ranking into a handful of levels and the
    id tie-break, not the weight, decides the sample.  The log form
    spreads keys over ~(−44, 3] at ANY weight.  u is (h + 0.5)/2³²
    (never exactly 0 or 1, so both logs are finite).  Non-positive
    weights are excluded (their inclusion probability is 0 by
    definition)."""
    from ..functions.scalar import rnd

    wcol = col(weight_col).cast("double")
    k_ = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(lit(salt), k_.cast("string"))), 1, 8), 16, 10
    ).cast("double")
    u = (h + lit(0.5)) / lit(2.0**32)
    es = rnd(F.log(-F.log(u)) - F.log(wcol), 9)
    return (
        df.filter(wcol > 0)
        .withColumn("es_key", es)
        .orderBy(col("es_key").asc(), col(key))
        .limit(k)
    )


def coverage_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    per_bucket: int = 1,
) -> DataFrame:
    """Diversity-preserving subset: bucket the embedding space by
    random-hyperplane signs and keep the ``per_bucket`` deterministically
    lowest-md5 rows per bucket — every occupied region of the space
    contributes, so the sample covers the corpus's modes instead of its
    density (what uniform sampling does, over-representing the head).
    The distributed-friendly stand-in for sequential greedy MMR/k-center
    selection: one bucket expression (map-side) + one per-bucket window,
    deterministic under any layout (md5 order, id tie-break)."""
    from .similarity import lsh_bucket

    bucketed = df.withColumn("bucket", lsh_bucket(col(vec_col), planes))
    w = Window.partitionBy("bucket").orderBy(
        F.md5(col(id_col).cast("string")), col(id_col)
    )
    return (
        bucketed.withColumn("__rn", F.row_number().over(w))
        .filter(col("__rn") <= per_bucket)
        .drop("__rn")
    )

def mixture_sample_temperature(
    df: DataFrame,
    domain_col: str,
    alpha: float,
    key: str,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-based mixture rebalancing: target weights DERIVED from
    the corpus itself as w_d ∝ c_d^alpha (the multilingual standard —
    mBERT/XLM use alpha≈0.3-0.7 to up-weight low-resource domains
    without flattening the mixture entirely; alpha=1 keeps raw
    proportions, alpha=0 makes them uniform).

    Fully distributed: the c^alpha normalization runs inside the
    |domains|-row quota frame (1-row sum broadcast back) — no collect,
    no driver-side weight dict.  Selection is the same deterministic
    hash-order-per-domain rank as :func:`mixture_sample`.  The quota
    product is nudge-rounded (6 dp) before floor so cross-engine pow()
    drift can never flip a row count."""
    from ..functions.scalar import rnd

    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(domain_col).agg(F.count("*").alias("__c"))
    counts = counts.withColumn("__ca", F.pow(col("__c"), lit(alpha)))
    z = counts.agg(F.sum("__ca").alias("__z"))
    quota = (
        counts.crossJoin(F.broadcast(z))
        .withColumn("__w", col("__ca") / col("__z"))
        .withColumn(
            "__t", F.min(col("__c") / col("__w")).over(Window.partitionBy())
        )
        .select(
            domain_col,
            F.floor(rnd(col("__w") * col("__t"), 6)).alias("__n"),
        )
    )
    w = Window.partitionBy(domain_col).orderBy(hash_fraction(key, salt), col(key))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(quota), domain_col)
        .filter(col("__rn") <= col("__n"))
        .drop("__rn", "__n")
    )


def epoch_allocation(
    counts: DataFrame,
    domain_col: str,
    tokens_col: str,
    weights: dict[str, float],
    budget: float,
    max_epochs: float,
) -> DataFrame:
    """Data-constrained epoch planner (the Muennighoff-style question
    "how many epochs of each domain fill a B-token budget?"): allocate
    ``budget`` tokens across domains toward the target mixture
    ``weights``, capping every domain at ``max_epochs`` passes over its
    available tokens and redistributing capped-domain overflow to the
    rest in proportion to their weights — exact waterfilling, solved in
    one pass over the |domains|-row counts frame.

    Mechanics: with cap_d = max_epochs·c_d and fill rate s, domain d
    caps iff r_d = cap_d / w_d ≤ s.  Sorting by r_d makes capping a
    PREFIX property, so per-row prefix cumsums give the candidate rate
    s_j = (B − Σ_prefix cap) / (W − Σ_prefix w); the first row whose
    r exceeds its s_j starts the uncapped region, whose common rate s*
    is that row's s_j.  All boundary compares use nudge-rounded values
    so the prefix cut is cross-engine deterministic.  Every window runs
    on the bounded domains frame (the q52/q80 quota posture); s* joins
    back as a 1-row broadcast.

    Returns per domain: tokens available, weight, capped flag,
    tokens_alloc, epochs.  If the budget exceeds total capacity, every
    domain caps and the residual budget simply goes unallocated."""
    from ..functions.scalar import rnd

    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    tot = sum(weights.values())
    if tot <= 0:
        raise ValueError("at least one weight must be positive")
    norm = {d: w / tot for d, w in weights.items() if w > 0}
    wmap = F.create_map(*[x for d, w in norm.items() for x in (lit(d), lit(w))])

    d = (
        counts.withColumn("__w", wmap[col(domain_col)])
        .filter(col("__w").isNotNull())
        .withColumn("__cap", lit(float(max_epochs)) * col(tokens_col))
        .withColumn("__r", rnd(col("__cap") / col("__w"), 6))
    )
    w_ord = Window.orderBy("__r", domain_col)
    prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    full = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    d = (
        d.withColumn("__pE", F.coalesce(F.sum("__cap").over(prev), lit(0.0)))
        .withColumn("__pW", F.coalesce(F.sum("__w").over(prev), lit(0.0)))
        .withColumn("__tW", F.sum("__w").over(full))
        .withColumn(
            "__s",
            rnd(
                (lit(float(budget)) - col("__pE"))
                / F.nullif(col("__tW") - col("__pW"), lit(0.0)),
                6,
            ),
        )
        .withColumn(
            "capped",
            F.min((col("__r") <= col("__s")).cast("int")).over(
                w_ord.rowsBetween(Window.unboundedPreceding, 0)
            )
            == lit(1),
        )
    )
    # the first uncapped row's rate IS the max: removing a capped row
    # (ratio above the running average) always lowers later candidates,
    # so max() needs no tie-break even when rounded r values collide
    s_star = d.filter(~col("capped")).agg(F.max("__s").alias("__sstar"))
    alloc = F.when(col("capped"), col("__cap")).otherwise(
        rnd(col("__w") * col("__sstar"), 4)
    )
    return (
        d.crossJoin(F.broadcast(s_star))
        .select(
            col(domain_col).alias("domain"),
            col(tokens_col).cast("long").alias("tokens_avail"),
            rnd(col("__w"), 6).alias("weight"),
            "capped",
            rnd(alloc, 4).alias("tokens_alloc"),
            rnd(alloc / col(tokens_col), 4).alias("epochs"),
        )
        .orderBy("domain")
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation: n_h ∝ N_h·S_h —
    variance-minimizing for a fixed budget (the survey-sampling
    counterpart of q131's Horvitz–Thompson estimation: spend the sample
    where the strata are big AND noisy, not merely big).

    One aggregate over the stratum key (|strata| rows, the
    mixture_sample posture), the normalizer a global window over that
    bounded frame.  Per-stratum S_h is the sample stddev of
    ``value_col`` nudge-rounded 6 dp (cross-engine determinism), the
    allocation ``clamp(round(total_n·N_h·S_h/Σ), 1, N_h)`` — rounded
    independently per stratum, so Σn_h may differ from ``total_n`` by
    the rounding (documented, deterministic).  Zero/NULL-variance
    strata (constant or single-row) get the floor allocation of 1."""
    from ..functions.scalar import rnd

    st = df.groupBy(stratum_col).agg(
        F.count("*").alias("n_pop"),
        rnd(F.coalesce(F.stddev_samp(col(value_col)), lit(0.0)), 6).alias("__s"),
    )
    z = F.sum(col("n_pop") * col("__s")).over(Window.partitionBy())
    return st.select(
        stratum_col,
        col("n_pop").cast("long").alias("n_pop"),
        col("__s").alias("stddev_value"),
        F.least(
            F.greatest(
                F.floor(lit(float(total_n)) * col("n_pop") * col("__s") / z
                        + lit(0.5) + lit(1e-9)),
                lit(1).cast("long"),
            ),
            col("n_pop"),
        ).cast("long").alias("n_alloc"),
    )


def neyman_stratified_sample(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int,
    id_col: str,
) -> DataFrame:
    """Draw the Neyman-allocated sample: within each stratum keep the
    ``n_alloc`` smallest md5-hash ranks (deterministic,
    layout-independent — the repo's standard hash-order selection).
    Returns the sampled rows with their stratum's allocation columns
    attached; the stratified estimator of any population mean is then
    ``Σ_h (N_h/N)·ȳ_h`` over this frame."""
    alloc = neyman_allocation(df, stratum_col, value_col, total_n)
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(col(id_col).cast("string")), col(id_col)
    )
    return (
        df.join(alloc, stratum_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(col("__rn") <= col("n_alloc"))
        .drop("__rn")
    )
