"""The oracle comparator itself must fail loudly on the divergences it
exists to catch — seeded-divergence tests for the NaN/NULL and dtype
tagging (a comparator that silently passes these is worse than none)."""

from __future__ import annotations

import duckdb
import pytest

from .conftest import _frame_key, _strict_cell, assert_matches_oracle


def test_nan_is_not_null(spark):
    """Spark NaN cell vs DuckDB NULL cell: must mismatch."""
    sdf = spark.sql("SELECT 'a' AS k, CAST('NaN' AS DOUBLE) AS x")
    con = duckdb.connect()
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_matches_oracle(sdf, con, "SELECT 'a' AS k, CAST(NULL AS DOUBLE) AS x")


def test_nan_equals_nan(spark):
    sdf = spark.sql("SELECT CAST('NaN' AS DOUBLE) AS x")
    con = duckdb.connect()
    assert_matches_oracle(sdf, con, "SELECT CAST('NaN' AS DOUBLE) AS x")


def test_int_is_not_float(spark):
    """The HUGEINT bug class: int64 5 must not equal float64 5.0."""
    sdf = spark.sql("SELECT CAST(5 AS BIGINT) AS x")
    con = duckdb.connect()
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_matches_oracle(sdf, con, "SELECT CAST(5 AS DOUBLE) AS x")


def test_cell_tags():
    import numpy as np

    assert _strict_cell(None) == "NULL"
    assert _strict_cell(float("nan")) == "F:nan"
    assert _strict_cell(np.float64("nan")) == "F:nan"
    assert _strict_cell(5) != _strict_cell(5.0)
    assert _strict_cell(True) != _strict_cell(1)
