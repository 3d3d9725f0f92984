"""Shared scalar expression helpers.

These encode the semantic deltas between Spark and the reference engine's
SQL dialect (SURVEY §2.8/§7.2), so every operator uses one canonical,
oracle-compatible formulation:

- day-of-week: reference convention is Sunday=0..Saturday=6
  (reference: sql/ddl/02_dimension_tables.sql:68); Spark ``dayofweek`` is
  Sunday=1 → subtract 1.
- zero-safe division: ``NULLIF(denominator, 0)``
  (reference: src/transformations/standardize.py:57-59).
- epoch-difference duration in minutes
  (reference: src/transformations/standardize.py:46).
- stable rounding for double aggregates so distributed summation order
  cannot flip the oracle value-hash (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def day_of_week(col: Column | str) -> Column:
    """Sunday=0 .. Saturday=6 (reference DOW convention)."""
    return F.dayofweek(col) - F.lit(1)


def is_weekend(col: Column | str) -> Column:
    return day_of_week(col).isin(0, 6)


def nullif_div(num: Column, den: Column) -> Column:
    """num / NULLIF(den, 0) — zero-safe division returning NULL."""
    return num / F.nullif(den, F.lit(0))


def to_epoch(c: Column | str) -> Column:
    """Seconds since epoch as BIGINT — NTZ-safe.

    ``cast(TIMESTAMP_NTZ as long)`` is an AnalysisException in Spark 4;
    routing through ``timestamp_ltz`` first is a no-op for TimestampType
    and a wall-clock-preserving conversion for NTZ under the engine's UTC
    session timezone — i.e. identical to DuckDB ``epoch(ts)`` on its
    naive timestamps.  Use this EVERYWHERE a timestamp becomes a number.
    """
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("timestamp_ltz").cast("long")


def to_epoch_seconds(c: Column | str) -> Column:
    """Seconds since epoch as DOUBLE (fractional µs preserved) — NTZ-safe."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("timestamp_ltz").cast("double")


def epoch_minutes(start: Column | str, end: Column | str) -> Column:
    """EXTRACT(EPOCH FROM (end - start)) / 60.0 as double minutes."""
    return (to_epoch_seconds(end) - to_epoch_seconds(start)) / F.lit(60.0)


def rnd(c: Column | str, d: int) -> Column:
    """Nudged round: ``round(x + 1e-9, d)`` — applied identically in the
    DuckDB oracle SQL.  Exact decimal midpoints (e.g. avg = 53.24975) round
    differently in Spark (HALF_UP on the shortest decimal repr) vs DuckDB
    (binary scaling); the nudge pushes both engines to the same side.  The
    1e-9 epsilon is far above cross-engine FP drift (~1e-11) and far below
    the coarsest rounding grid used (1e-6).

    Domain bound: once half an ulp exceeds the epsilon — |x| ≥ 2^53·1e-9
    ≈ 9.0e6 — the nudge is absorbed by FP rounding and midpoint
    disambiguation is lost (property-tested boundary:
    tests/test_property_parity.py).  Every 4/6-dp ``rnd`` site in the
    catalog is a ratio / score / log-prob far inside the bound.  Large
    monetary SUMS (2 dp, magnitudes to ~1e9) sit beyond it with a
    quantified residual risk, accepted: a cell disagrees only if the
    sum's shortest repr terminates exactly at a .xx5 midpoint
    (≈ ulp/grid ≈ 6e-6 per cell) or the engines' own summation drift
    (~1e-15 relative) straddles a grid boundary (≈ 3e-5 per cell) —
    the latter is inherent to exact-compare of re-associated double
    sums and no epsilon can remove it."""
    c = F.col(c) if isinstance(c, str) else c
    return F.round(c + F.lit(1e-9), d)


def money(col: Column) -> Column:
    """Round a monetary aggregate to cents (stable across partition order)."""
    return F.round(col, 2)


def r4(col: Column) -> Column:
    return F.round(col, 4)


def r6(col: Column) -> Column:
    return F.round(col, 6)
