"""Curriculum scheduling: quality-staged training order.

Beyond-reference extension (SURVEY §7.1 step 9): given a scored corpus,
assign every document to one of ``n_stages`` equal-frequency stages by
quality (stage 0 = cleanest — curriculum training consumes the easy,
high-quality slice first and anneals toward the noisy tail), and give
each document a deterministic position WITHIN its stage via a salted
md5 hash (the within-stage shuffle: documents of similar quality must
not arrive in id order, which correlates with source/time).

Everything is data-parallel: the equal-frequency stage boundary uses
the two-pass global rank (``layout.global_row_number`` — range shuffle
+ broadcast offsets, the terasort shape, never a single-partition
window), the corpus size is a broadcast 1-row aggregate, and the
per-stage head sample uses the two-stage top-k so no task ever holds a
whole stage.  Cost at 100 TB: one range shuffle + one stage-cardinality
rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from ..functions.scalar import rnd
from . import layout, text


def position_hash(id_col: Column | str, salt: str = "curr") -> Column:
    """Deterministic within-stage shuffle key: ``md5(salt:id)`` — stable
    under re-runs and repartitioning, identical in the DuckDB oracle."""
    c = col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(lit(f"{salt}:"), c.cast("string")))


def curriculum_schedule(
    df: DataFrame,
    n_stages: int = 4,
    salt: str = "curr",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document curriculum assignment: ``stage`` (0-based, stage 0 =
    highest quality) and ``pos`` (the within-stage md5 shuffle key).
    Consuming rows in ``(stage, pos, id)`` order IS the curriculum.

    Stage boundaries are equal-frequency: rank documents by
    ``(quality DESC, id)`` with the two-pass global rank, then
    ``stage = min(floor((rank-1)·n_stages/N), n_stages-1)`` — the
    explicit formula (not ntile) so the DuckDB oracle replays it
    bit-for-bit.  Quality is rounded to 6 dp BEFORE ranking (the q36
    convention: a 1-ulp cross-engine drift must not reorder the rank)."""
    if n_stages < 1:
        raise ValueError(f"n_stages must be >= 1, got {n_stages}")
    scored = df.select(
        col(id_col),
        col(text_col),
        rnd(text.quality_score(col(text_col)), 6).alias("quality"),
        text.token_count(col(text_col)).cast("long").alias("n_tokens"),
    )
    ranked = layout.global_row_number(
        scored, [col("quality").desc(), col(id_col).asc()], "rank"
    )
    n = ranked.agg(F.count("*").alias("__n"))
    return (
        ranked.join(F.broadcast(n))
        .withColumn(
            "stage",
            # integer DIV keeps the boundary exact at any corpus size —
            # (rank-1)·k/N through doubles can flip the rank that lands
            # exactly on a stage boundary by one ulp cross-engine
            F.expr(
                f"least(((rank - 1) * {int(n_stages)}) div __n,"
                f" {int(n_stages) - 1})"
            ).cast("long"),
        )
        .withColumn("pos", position_hash(id_col, salt))
        .drop("__n")
    )


def _stage_head(
    sched: DataFrame, k: int, id_col: str
) -> DataFrame:
    """First ``k`` documents of each stage in curriculum order, without
    ever windowing a whole stage into one task: partition-local top-k
    per (stage, input partition), then global top-k over the P·k
    survivors (the _multi_query_topk shape keyed by stage)."""
    pre = sched.withColumn("__pid", F.spark_partition_id())
    local = (
        pre.withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy("stage", "__pid").orderBy(
                    col("pos"), col(id_col)
                )
            ),
        )
        .filter(col("__r") <= k)
        .drop("__r", "__pid")
    )
    return local.withColumn(
        "head_rank",
        F.row_number().over(
            Window.partitionBy("stage").orderBy(col("pos"), col(id_col))
        ),
    ).filter(col("head_rank") <= k)


def curriculum_report(
    df: DataFrame,
    n_stages: int = 4,
    salt: str = "curr",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-stage curriculum summary: document/token volume, the quality
    envelope (stages must be non-overlapping and monotone — the schedule
    sanity check), and the first three document ids in curriculum order
    (the reproducibility probe: a re-run or a differently-partitioned
    run must produce the identical head)."""
    sched = curriculum_schedule(
        df, n_stages=n_stages, salt=salt, id_col=id_col, text_col=text_col
    )
    head = (
        _stage_head(sched, 3, id_col)
        .groupBy("stage")
        .agg(
            F.max(F.when(col("head_rank") == 1, col(id_col))).alias("first_id"),
            F.max(F.when(col("head_rank") == 2, col(id_col))).alias("second_id"),
            F.max(F.when(col("head_rank") == 3, col(id_col))).alias("third_id"),
        )
    )
    stats = sched.groupBy("stage").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        rnd(F.avg("quality"), 6).alias("avg_quality"),
        rnd(F.min("quality"), 6).alias("min_quality"),
        rnd(F.max("quality"), 6).alias("max_quality"),
    )
    return stats.join(head, "stage").orderBy("stage")


def shuffle_audit(
    df: DataFrame,
    group_col: str = "source",
    salt: str = "ord",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-order randomization audit: does the salted-md5 global
    shuffle actually decorrelate neighbors?  A bad shuffle (or a
    pipeline that silently emits ingestion order) feeds the optimizer
    long same-source runs — correlated gradients, the failure the
    shuffle exists to prevent — and nothing downstream notices unless
    something measures it.

    Measures, per group: the count of ADJACENT pairs (positions i, i+1
    in shuffle order) whose both members are the group, against the
    exact random-permutation expectation ``n_g·(n_g−1)/N``.  A healthy
    shuffle has ratio ≈ 1 for every group; ingestion order has ratios
    ≫ 1 for clustered groups.

    Scale shape: position = the two-pass global rank on the hash (range
    shuffle, never a single-partition window); adjacency = a self-join
    on ``rank = rank+1`` — an equi-join on a dense unique key, uniform
    by construction; group sizes are one hash aggregate.  No window
    ever sees more than one range partition.
    """
    h = position_hash(id_col, salt)
    ranked = layout.global_row_number(
        df.select(col(id_col), col(group_col), h.alias("__h")),
        [col("__h").asc(), col(id_col).asc()],
        "rank",
    )
    left = ranked.select(
        col("rank").alias("__r"), col(group_col).alias("__ga")
    )
    right = ranked.select(
        (col("rank") - 1).alias("__r"), col(group_col).alias("__gb")
    )
    adj = left.join(right, "__r")  # pair (i, i+1)
    same = (
        adj.filter(col("__ga") == col("__gb"))
        .groupBy(col("__ga").alias(group_col))
        .agg(F.count("*").cast("long").alias("same_adj_pairs"))
    )
    sizes = df.groupBy(group_col).agg(F.count("*").cast("long").alias("n_docs"))
    n = df.agg(F.count("*").alias("__n"))
    return (
        sizes.join(same, group_col, "left")
        .join(F.broadcast(n))
        .select(
            group_col,
            "n_docs",
            rnd(col("n_docs") / col("__n"), 6).alias("share"),
            F.coalesce(col("same_adj_pairs"), lit(0))
            .cast("long")
            .alias("same_adj_pairs"),
            rnd(
                col("n_docs") * (col("n_docs") - 1) / col("__n"), 4
            ).alias("expected_pairs"),
            rnd(
                F.coalesce(col("same_adj_pairs"), lit(0))
                / F.nullif(
                    col("n_docs") * (col("n_docs") - 1) / col("__n"), lit(0.0)
                ),
                4,
            ).alias("ratio"),
        )
        .orderBy(group_col)
    )
