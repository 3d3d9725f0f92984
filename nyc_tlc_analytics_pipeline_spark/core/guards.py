"""Driver-state guards for operators that intentionally collect
MODEL-sized frames (k-means centroids, PCA dim-vectors, Markov
transition matrices).

Collecting model-sized state is the correct distributed shape — k×dim
centroids or a dim-sized gradient are a few KB no matter how large the
DATA is.  The failure mode is MISUSE: pointing a bounded-enum operator
at a high-cardinality column silently turns the driver into the
bottleneck (a Markov chain over user_id instead of event_type collects
millions of states).  ``collect_bounded`` makes that failure LOUD and
cheap: it fetches at most ``cap + 1`` rows (a LIMIT, not a full
collect), so the misuse is detected before the driver materializes the
oversized state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row


def collect_bounded(
    df: DataFrame,
    cap: int,
    operator: str,
    assumption: str,
) -> list[Row]:
    """Collect ``df`` asserting it holds at most ``cap`` rows.

    Fetches ``cap + 1`` rows via LIMIT — the overflow check never pulls
    more than one extra row onto the driver.  Raises ``ValueError``
    naming the operator and its bounded-enum assumption when exceeded.

    NOTE: LIMIT makes the returned row ORDER nondeterministic; callers
    that need an order must sort the returned list (or carry an
    orderable key), exactly as they must with a plain ``collect()``.
    """
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"{operator}: collected frame exceeds the model-size cap "
            f"({cap} rows) — this operator assumes {assumption}. "
            f"A larger-than-model frame here means the driver would "
            f"become the bottleneck; re-point the operator at a "
            f"bounded-cardinality column or raise the cap explicitly."
        )
    return rows


def estimated_source_units(df: DataFrame, bytes_per_unit: int = 8) -> int:
    """Zero-job size proxy for a REFERENCE-corpus frame (a held-out LM
    model, a benchmark gram set): the optimizer's plan size in BYTES
    over an assumed unit width — deliberately not the rowCount (that
    counts documents, and a 50-doc reference can still hold 50M
    tokens/grams; bytes track unit volume no matter the row split).
    Falls back to 'huge' when no estimate exists — the safe failure
    mode for a broadcast decision (similarity.estimated_rows's
    posture)."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return max(1, int(stats.sizeInBytes()) // bytes_per_unit)
    except Exception:
        return 1 << 30


def reference_join_side(bounded: bool):
    """Join-side wrapper for a reference-corpus-derived frame:
    broadcast while the source is provably small, merge-hint beyond.
    Never let the static planner decide — its size estimate is blind
    to explode fan-out, and 'bounded by construction' (by a reference
    corpus) is not the same as executor-sized (the round-9 held-out-LM
    bug class)."""
    from pyspark.sql import functions as F

    if bounded:
        return F.broadcast
    return lambda f: f.hint("merge")
