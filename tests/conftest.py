"""Shared fixtures: one tuned SparkSession per test session, a DuckDB
oracle connection per scale factor, and a driver-equivalent comparator
(column-name sort + order-insensitive row compare on rounded values)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from nyc_tlc_analytics_pipeline_spark.core.session import build_session
from nyc_tlc_analytics_pipeline_spark.sources.testdata import TESTDATA_TABLES

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # pin the oracle's session tz so tz-sensitive casts can never depend on
    # the host (Spark side is pinned to UTC by sources.testdata)
    con.execute("SET TimeZone='UTC'")
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.fixture(scope="session")
def duck_smoke():
    con = make_duck(SF_SMOKE)
    yield con
    con.close()


def _normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and FP dust; queries already round explicitly, so
        # this is belt-and-braces for the comparator itself
        return round(v + 0.0, 9)
    if hasattr(v, "item"):  # numpy scalars from duckdb fetch
        return _normalize_cell(v.item())
    if isinstance(v, int):
        return v
    return v


def rows_key(rows, columns):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_normalize_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def assert_matches_oracle(spark_df, duck_con, oracle_sql_text, name=""):
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    res = duck_con.execute(oracle_sql_text)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    sk = rows_key(spark_rows, spark_cols)
    dk = rows_key(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(sk, dk) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"
