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
