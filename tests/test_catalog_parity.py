"""Differential tests: every oracle-checkable catalog query must
hash-match its DuckDB oracle — the same contract the driver enforces at
sf0.01 (run here at sf0.001 for speed; set SPARK_GRAFT_TEST_SF to rerun
at a bigger scale factor)."""

from __future__ import annotations

import pytest

from nyc_tlc_analytics_pipeline_spark.plans.catalog import QUERIES

from .conftest import SF_SMOKE, assert_matches_oracle

ORACLE_QUERIES = sorted(name for name, spec in QUERIES.items() if spec.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, spec in QUERIES.items() if not spec.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck_smoke, name):
    spec = QUERIES[name]
    df = spec.build(spark, SF_SMOKE)
    assert_matches_oracle(df, duck_smoke, spec.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    spec = QUERIES[name]
    df = spec.build(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
