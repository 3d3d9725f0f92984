"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every conformance query from ``nyc_tlc_analytics_pipeline_spark.plans``
(one per operator family in SURVEY §2 + the data-pipeline extensions);
``oracle_sql()`` gives the DuckDB-equivalent SQL for the hash-compare.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nyc_tlc_analytics_pipeline_spark.plans.catalog import QUERIES

_FLAGSHIP = "q01_top_nations_by_revenue"
_SF001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES[_FLAGSHIP].build(spark, _SF001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY §2."""
    return {name: spec.build for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every hash-checkable query."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
