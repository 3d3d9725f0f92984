"""Grouped-map (``applyInPandas``) and cascading time-rollup operators.

- ``standardize_embeddings_by_label``: per-group vector standardization
  (z-score per dimension within each label) — the grouped-map pattern
  where the computation needs the WHOLE group as one pandas frame
  (group-level moments), the canonical ``applyInPandas`` use.  One
  shuffle on the group key; Arrow batches both ways.

- ``cascade_rollups``: multi-resolution time aggregates (the
  'hypertable continuous aggregate' pattern): the finest rollup is built
  from raw events once, every coarser level is built from the NEXT FINER
  level's partials — sum-of-sums / min-of-mins — so a 1-day rollup never
  rescans raw data.  At 100 TB this is the difference between one raw
  scan per resolution and one raw scan total.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

EMB_OUT_SCHEMA = "vec_id long, label int, z_embedding array<double>"


def _standardize_group(pdf: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    mat = np.vstack(pdf["embedding"].apply(lambda v: np.asarray(v, dtype="float64")))
    mu = mat.mean(axis=0)
    sd = mat.std(axis=0, ddof=0)
    sd[sd == 0.0] = 1.0
    z = (mat - mu) / sd
    return pd.DataFrame(
        {"vec_id": pdf["vec_id"], "label": pdf["label"], "z_embedding": list(z)}
    )


def standardize_embeddings_by_label(emb: DataFrame) -> DataFrame:
    """Per-label z-score standardization of the embedding column."""
    return emb.groupBy("label").applyInPandas(_standardize_group, EMB_OUT_SCHEMA)


# --------------------------------------------------------------------------
# cascading rollups
# --------------------------------------------------------------------------

RESOLUTIONS: dict[str, str] = {
    "15m": "15 minutes",
    "1h": "1 hour",
    "1d": "1 day",
}


def _finest_rollup(events: DataFrame, window: str) -> DataFrame:
    return (
        events.filter(col("ts").isNotNull())
        .groupBy(
            F.window("ts", window).getField("start").alias("bucket_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def _coarsen(finer: DataFrame, window: str) -> DataFrame:
    """Build a coarser rollup from a finer one's algebraic partials —
    never from raw data."""
    return (
        finer.groupBy(
            F.window("bucket_start", window).getField("start").alias("bucket_start"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def cascade_rollups(events: DataFrame) -> dict[str, DataFrame]:
    """{'15m': df, '1h': df, '1d': df} where only the 15m level touches
    raw events; 1h aggregates 15m partials, 1d aggregates 1h partials.
    Aggregates are algebraic so every level is EXACTLY what a direct
    raw-data groupBy would produce (tested)."""
    finest = _finest_rollup(events, RESOLUTIONS["15m"])
    hourly = _coarsen(finest, RESOLUTIONS["1h"])
    daily = _coarsen(hourly, RESOLUTIONS["1d"])
    return {"15m": finest, "1h": hourly, "1d": daily}
