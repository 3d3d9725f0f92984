"""Custom stateful streaming operator via ``applyInPandasWithState``.

Built-in windows cover time bucketing; anything with per-key *running*
state (EWMA drift scores, per-user counters that survive batches) needs
the arbitrary-state API.  State is a tiny per-key tuple, so memory is
O(active keys); Arrow batches keep the Python crossing amortized.

``user_value_monitor`` maintains, per user: event count, running EWMA of
``value``, and the max value seen — emitting one update row per user per
micro-batch.  Events inside a batch are folded in timestamp order so the
result is deterministic and equal to the batch-mode fold (tested)."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, ewma_value double, max_value double"
STATE_SCHEMA = "n long, ewma double, mx double"

DEFAULT_ALPHA = 0.3


def _monitor_fn(alpha: float):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, ewma, mx = state.get
        else:
            n, ewma, mx = 0, None, float("-inf")
        for pdf in pdfs:
            for v in pdf.sort_values("ts")["value"]:
                v = float(v)
                n += 1
                ewma = v if ewma is None else alpha * v + (1 - alpha) * ewma
                mx = max(mx, v)
        state.update((n, ewma, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "ewma_value": [ewma],
                "max_value": [mx],
            }
        )

    return fn


def user_value_monitor(events: DataFrame, alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """Streaming per-user running EWMA/count/max (arbitrary keyed state)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _monitor_fn(alpha),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_equivalent(events: DataFrame, alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """The same fold in batch mode (aggregate over ts-sorted value arrays)
    — the differential oracle for the streaming operator."""
    from pyspark.sql import functions as F

    vals = (
        events.groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
                lambda s: s["value"],
            ).alias("vs")
        )
    )
    ewma = F.aggregate(
        F.expr("slice(vs, 2, size(vs))"),
        F.element_at("vs", 1),
        lambda acc, v: F.lit(alpha) * v + F.lit(1 - alpha) * acc,
    )
    return vals.select(
        "user_id",
        F.size("vs").cast("long").alias("n_events"),
        ewma.alias("ewma_value"),
        F.array_max("vs").alias("max_value"),
    )
