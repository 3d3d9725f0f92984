"""Column profiler: per-column statistics over any DataFrame in ONE pass.

The naive profiler runs one query per column (N scans of a 100 TB
table); this one computes every column's aggregates inside a single
grouped-aggregate stage — count / nulls / exact distinct / min / max
per column — then unpivots driver-side expression results into the
per-column report shape with a ``stack`` projection (the unpivot is
over the 1-row aggregate, so it moves bytes, not data).

min/max are reported as strings so heterogeneous column types share one
report schema (the same choice every profiler UI makes); numeric
ordering still happens in the typed aggregate before the cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-pass per-column profile: (column_name, n_rows, n_nulls,
    n_distinct, min_value, max_value)."""
    cols = columns if columns is not None else df.columns
    # index-based internal aliases + df[c] access (not F.col, which
    # parses dots) so arbitrary column names — spaces, dashes, dots,
    # quotes — survive the generated stack() expression
    aggs = [F.count(lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(df[c].isNull().cast("long")).alias(f"__nulls_{i}"),
            F.count_distinct(df[c]).alias(f"__dist_{i}"),
            F.min(df[c]).cast("string").alias(f"__min_{i}"),
            F.max(df[c]).cast("string").alias(f"__max_{i}"),
        ]
    one = df.agg(*aggs)

    def _lit(name: str) -> str:
        return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack_args = ", ".join(
        f"{_lit(c)}, __nulls_{i}, __dist_{i}, __min_{i}, __max_{i}"
        for i, c in enumerate(cols)
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        col("__n").alias("n_rows"),
    ).select(
        "column_name",
        col("n_rows").cast("long"),
        col("n_nulls").cast("long"),
        col("n_distinct").cast("long"),
        "min_value",
        "max_value",
    )


# ---------------------------------------------------------------------------
# PSI drift (shared by batch q123 and the streaming drift monitor)
# ---------------------------------------------------------------------------

def value_bucket_counts(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo: float,
    width: float,
    n_buckets: int,
) -> DataFrame:
    """(group, bucket, c) counts over fixed equal-width edge-clipped
    value buckets.  Data-INDEPENDENT edges — the binning is a map-side
    expression, deterministic at any scale, and the counts are an
    ADDITIVE partial (mergeable by sum), which is what lets the
    streaming drift monitor maintain them incrementally."""
    bucket = F.least(
        lit(n_buckets - 1),
        F.greatest(
            lit(0), F.floor((col(value_col) - lit(lo)) / lit(width)).cast("int")
        ),
    )
    return (
        df.select(col(group_col).alias("grp"), bucket.alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


def psi_from_counts(
    cur: DataFrame,
    ref: DataFrame,
    eps: float = 1e-6,
    alert: float = 0.1,
) -> DataFrame:
    """Population Stability Index per group from two (grp, bucket, c)
    count frames: PSI = Σ_buckets (p_cur − p_ref)·ln(p_cur/p_ref) with
    add-ε smoothing for empty buckets; ``drifted`` flags PSI above the
    classic action threshold on the nudge-rounded value.

    Count frames are |groups|×|buckets| rows (bounded), so every join
    and aggregate here is frame-sized regardless of corpus scale — the
    scan cost lives in :func:`value_bucket_counts`."""
    from ..functions.scalar import rnd

    tot_c = cur.groupBy("grp").agg(F.sum("c").alias("n_cur"))
    tot_r = ref.groupBy("grp").agg(F.sum("c").alias("n_ref"))
    joined = (
        cur.select("grp", "bucket", col("c").alias("cc"))
        .join(
            ref.select("grp", "bucket", col("c").alias("cr")),
            ["grp", "bucket"],
            "full_outer",
        )
        .join(tot_c, "grp")
        .join(tot_r, "grp")
        .select(
            "grp",
            "n_ref",
            "n_cur",
            (F.coalesce(col("cc"), lit(0)) / col("n_cur") + lit(eps)).alias("pc"),
            (F.coalesce(col("cr"), lit(0)) / col("n_ref") + lit(eps)).alias("pr"),
        )
    )
    return (
        joined.groupBy("grp", "n_ref", "n_cur")
        .agg(
            rnd(
                F.sum((col("pc") - col("pr")) * F.log(col("pc") / col("pr"))), 6
            ).alias("psi")
        )
        .select(
            "grp",
            col("n_ref").cast("long"),
            col("n_cur").cast("long"),
            "psi",
            (col("psi") > lit(alert)).alias("drifted"),
        )
    )


def control_chart(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    ref_end: str = "2024-01-15",
    sigma: float = 3.0,
) -> DataFrame:
    """Shewhart control chart over daily ingestion batches: the metric
    monitoring layer a continuously-fed corpus needs on top of the
    structural drift report — schema drift is caught by column
    reconciliation, but a feed whose VALUES quietly shift (a scraper
    change, an upstream unit change) passes every schema check.

    Days strictly before ``ref_end`` form the reference window; their
    per-day means set the center line and the ±``sigma``·stddev control
    limits (stddev of DAY MEANS — the chart monitors the batch
    statistic, not row noise).  Every later day reports its z-score and
    an out-of-control flag.

    Scale shape: one day-grain hash aggregate over the feed (uniform
    key), then a 1-row reference aggregate broadcast to the
    day-cardinality frame — nothing data-sized past the first shuffle.
    Day means round to 6 dp BEFORE the reference stats and the z-score
    (the q36 convention) so cross-engine sum-order ulps can't flip a
    flag at the 3-sigma boundary.
    """
    from ..functions.scalar import rnd

    days = (
        df.filter(col(ts_col).isNotNull())
        .groupBy(col(ts_col).cast("date").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            rnd(F.avg(value_col), 6).alias("day_mean"),
        )
    )
    ref = (
        days.filter(col("day") < F.to_date(lit(ref_end)))
        .agg(
            rnd(F.avg("day_mean"), 6).alias("ref_mean"),
            rnd(F.stddev_samp("day_mean"), 6).alias("ref_sd"),
            F.count("*").cast("long").alias("ref_days"),
        )
    )
    z = rnd(
        (col("day_mean") - col("ref_mean")) / F.nullif(col("ref_sd"), lit(0.0)),
        4,
    )
    return (
        days.filter(col("day") >= F.to_date(lit(ref_end)))
        .join(F.broadcast(ref))
        .select(
            "day",
            "n_events",
            "day_mean",
            "ref_mean",
            "ref_sd",
            "ref_days",
            z.alias("z_score"),
            (F.abs(z) > lit(float(sigma))).alias("out_of_control"),
        )
        .orderBy("day")
    )


def contract_audit(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    group_col: str,
    right_len_col: str | None = None,
    expected_len: int | None = None,
) -> DataFrame:
    """Cross-table data-contract audit: referential integrity between a
    primary corpus and a derived table that is SUPPOSED to cover it 1:1
    (documents ↔ embeddings, docs ↔ tokenized shards, facts ↔ features).
    Schema checks can't see a silently failed embedding job — only a
    key-level reconciliation can.

    Per group (plus an ``__all__`` rollup row): primary rows, rows with
    a matching derived row, coverage %, derived-side duplicates (keys
    with >1 derived row — double-written features corrupt training),
    and optionally the count of derived rows whose payload length
    differs from ``expected_len`` (a truncated vector passes every
    other check).  Orphan derived rows (no primary) ride the rollup row
    only — they have no group to attribute to.

    Scale shape: one distinct-aggregate on the derived key (count +
    length flags), one left join from the primary (equi-join on the
    key), group-cardinality rollups.  Nothing wider than the key and
    two small flags shuffles.
    """
    from ..functions.scalar import rnd

    r_cols = [F.count("*").cast("long").alias("__n_rows")]
    if right_len_col is not None and expected_len is not None:
        r_cols.append(
            F.sum(
                (F.size(col(right_len_col)) != expected_len).cast("long")
            ).cast("long").alias("__n_badlen")
        )
    else:
        r_cols.append(lit(0).cast("long").alias("__n_badlen"))
    rkeys = right.groupBy(col(right_key).alias("__k")).agg(*r_cols)

    joined = left.select(
        col(left_key).alias("__k"), col(group_col).alias("__g")
    ).join(rkeys, "__k", "left")

    def _agg(df: DataFrame, label_col):
        return df.groupBy(label_col.alias("grp")).agg(
            F.count("*").cast("long").alias("n_primary"),
            F.sum(col("__n_rows").isNotNull().cast("long"))
            .cast("long")
            .alias("n_matched"),
            F.sum(F.when(col("__n_rows") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_keys"),
            F.sum(F.coalesce(col("__n_badlen"), lit(0)))
            .cast("long")
            .alias("n_bad_payload"),
        )

    per_group = _agg(joined, col("__g"))
    overall = _agg(joined, lit("__all__"))
    orphans = (
        rkeys.join(
            left.select(col(left_key).alias("__k")).distinct(),
            "__k",
            "left_anti",
        )
        .agg(F.count("*").cast("long").alias("n_orphans"))
    )
    out = per_group.withColumn("n_orphans", lit(0).cast("long")).unionByName(
        overall.join(F.broadcast(orphans))
    )
    return out.select(
        "grp",
        "n_primary",
        "n_matched",
        rnd(lit(100.0) * col("n_matched") / F.nullif(col("n_primary"), lit(0)), 4).alias(
            "coverage_pct"
        ),
        "n_dup_keys",
        "n_bad_payload",
        "n_orphans",
    ).orderBy("grp")
