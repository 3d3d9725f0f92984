"""Sequence packing: group documents into fixed token-budget training
sequences (the "pack short documents into 4k-token rows" step that sits
between curation and tokenized-shard writing in an LLM data pipeline).

Two strategies, two cost shapes:

- ``pack_greedy`` — greedy no-split packing: walk the documents of a
  stream in a deterministic order, start a new pack whenever adding the
  next document would exceed the budget (documents never straddle
  packs).  The running-fill state makes this inherently sequential PER
  STREAM, so it runs as an Arrow-batched ``applyInPandas`` over the
  stream key: each stream's rows are shuffled to one task, sorted, and
  packed in a single vectorized pass.  At 100 TB the stream key must be
  (domain, shard) with shards sized to executor memory — the operator
  is agnostic to how fine the keying is, and packs are independent
  across streams by construction.

- ``pack_contiguous`` — split-allowed packing (documents are
  concatenated and cut at exact budget boundaries, the common
  "concat-and-chunk" pretraining layout): pack id = floor(running token
  offset / budget).  This is a pure window cumulative sum — no Python,
  one shuffle (the window partition), and unlike the greedy form it is
  expressible identically in the SQL oracle, so it carries the
  hash-checked parity gate for both.

Both are deterministic for a given (stream, order) — re-runs produce
identical pack assignments, which matters for resumable shard writing.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from ..core.pins import pin


def pack_contiguous(
    df: DataFrame,
    stream_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Split-allowed packing: each document's tokens occupy the half-open
    offset range [cum − n, cum) of its stream's concatenation; the pack
    of a document is the pack its FIRST token lands in.  Adds
    ``pack_id`` (0-based within stream) and ``pack_offset`` (the
    document's start offset within its pack).

    Cumulative offsets use the two-pass global-rank shape
    (``layout.global_row_number``), NOT a per-stream window: range-
    partition on (stream, order), cumulate locally inside each
    (partition, stream) slice, then add the stream's running cross-
    partition offset from a |partitions × streams|-row aggregate joined
    back broadcast.  A stream larger than one partition — the 100 TB
    case where stream count is a constant factor, not a data-sized one
    — SPLITS across range partitions instead of concentrating into a
    single window task; no task ever holds more than one partition's
    slice of any stream (ADVICE r11 on q182)."""
    part = (
        df.repartitionByRange(col(stream_col), col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        # Pin BEFORE branching (core.pins rule): both consumers (the
        # offset aggregate and the main frame) read the one cached range
        # shuffle instead of two independent ones, so __pid is assigned
        # exactly once — correctness no longer rides on
        # RangePartitioner's seeded bounds sampling agreeing across
        # replays (ADVICE r12).  A lazy persist keeps that guarantee
        # (both branches resolve to the same InMemoryRelation, and a
        # recompute of an evicted block replays the SAME materialized
        # shuffle output) while keeping the builder plan-only — the
        # prior localCheckpoint(eager=False) fired a job at build time.
        .transform(pin)
    )
    local_cum = F.sum(tokens_col).over(
        Window.partitionBy("__pid", stream_col).orderBy(order_col)
    )
    counts = (
        part.groupBy("__pid", stream_col)
        .agg(F.sum(tokens_col).alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    # one row per (partition, stream): bounded by the
                    # partition count, never by the data
                    Window.partitionBy(stream_col)
                    .orderBy("__pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                lit(0),
            ),
        )
        .select(
            col("__pid").alias("__cpid"),
            col(stream_col).alias("__cstream"),
            "__offset",
        )
    )
    joined = part.withColumn("__cum", local_cum).join(
        F.broadcast(counts),
        (col("__pid") == col("__cpid"))
        # eqNullSafe: a NULL stream is a legal group (the window form
        # grouped it); a null-unsafe key would silently drop its rows
        & col(stream_col).eqNullSafe(col("__cstream")),
    )
    start = (col("__offset") + col("__cum") - col(tokens_col)).cast("long")
    return (
        joined.withColumn("__start", start)
        .withColumns(
            {
                "pack_id": (col("__start") / budget).cast("long"),
                "pack_offset": (col("__start") % budget).cast("long"),
            }
        )
        .select(*df.columns, "pack_id", "pack_offset")
    )


def pack_greedy(
    df: DataFrame,
    stream_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Greedy no-split packing per stream (see module docstring).  Adds
    ``pack_id`` (0-based within stream) and ``pack_fill`` (tokens in the
    pack so far, including this document).  A document larger than the
    whole budget gets a pack of its own (never dropped — the caller
    decides whether to truncate)."""
    from pyspark.sql.types import StructType

    # fresh StructType — .add() mutates in place and must not touch df.schema
    schema = StructType(list(df.schema.fields)).add("pack_id", "long").add(
        "pack_fill", "long"
    )

    def pack_one_stream(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        pack_ids: list[int] = []
        fills: list[int] = []
        pack, fill = 0, 0
        for n in pdf[tokens_col].astype("int64"):
            if fill > 0 and fill + n > budget:
                pack += 1
                fill = 0
            fill += int(n)
            pack_ids.append(pack)
            fills.append(fill)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["pack_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    return df.groupBy(stream_col).applyInPandas(pack_one_stream, schema)


def pack_summary(
    packed: DataFrame, stream_col: str, tokens_col: str, budget: int
) -> DataFrame:
    """Per-stream packing efficiency: pack count, mean docs/pack, and
    utilization (tokens / (packs × budget)) — the number a pipeline
    owner watches to size the budget."""
    per_pack = packed.groupBy(stream_col, "pack_id").agg(
        F.count("*").alias("n_docs"), F.sum(tokens_col).alias("n_tokens")
    )
    return per_pack.groupBy(stream_col).agg(
        F.count("*").alias("n_packs"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.sum("n_tokens") / (F.count("*") * lit(float(budget)))).alias(
            "utilization"
        ),
    )


def greedy_pack_reference(
    sizes: Iterable[int], budget: int
) -> list[tuple[int, int]]:
    """Driver-side reference implementation (tests): returns
    (pack_id, pack_fill) per item in order."""
    out: list[tuple[int, int]] = []
    pack, fill = 0, 0
    for n in sizes:
        if fill > 0 and fill + n > budget:
            pack += 1
            fill = 0
        fill += int(n)
        out.append((pack, fill))
    return out


def padding_efficiency_curve(
    df: DataFrame,
    id_col: str,
    len_col: Column | str,
    seq_cap: int,
    bucket_counts: list[int],
) -> DataFrame:
    """Padding-waste curve for LENGTH-BUCKETED batching: for each
    candidate bucket count B, sort documents by (capped) length, split
    the sorted order into B equal-rank buckets, pad every doc to its
    bucket's max length, and report the padded-token overhead — the
    knob-sizing report a training pipeline reads before fixing its
    bucketing config (B=1 is pad-to-global-max, the no-bucketing
    baseline; waste falls monotonically as B grows while per-bucket
    batch pools shrink).

    Scale shape: lengths rank once via the two-pass
    :func:`~.layout.global_row_number` (range shuffle — never a
    single-partition window), the total count rides a broadcast 1-row
    frame, and each B's report is a |B|-row aggregate over the SAME
    ranked frame (pinned once, core.pins) — no re-scan per rung.  Returns one
    row per B: (n_buckets, n_docs, useful_tokens, padded_tokens,
    waste_pct), waste_pct = 100·(padded − useful)/padded at 4 dp."""
    from ..functions.scalar import rnd
    from .layout import global_row_number

    c = col(len_col) if isinstance(len_col, str) else len_col
    lens = df.select(
        col(id_col).alias("__id"), F.least(c, lit(seq_cap)).alias("__len")
    )
    ranked = global_row_number(
        lens, [col("__len"), col("__id")], rank_col="__rank"
    ).transform(pin)
    total = ranked.agg(F.count("*").cast("long").alias("__n"))
    parts = []
    for nb in bucket_counts:
        bucketed = ranked.crossJoin(F.broadcast(total)).withColumn(
            "__bucket",
            F.floor((col("__rank") - 1) * lit(nb) / col("__n")).cast("long"),
        )
        per_bucket = bucketed.groupBy("__bucket").agg(
            F.max("__len").alias("__pad"),
            F.count("*").alias("__cnt"),
            F.sum("__len").alias("__useful"),
        )
        parts.append(
            per_bucket.agg(
                F.sum(col("__pad") * col("__cnt")).cast("long").alias("padded_tokens"),
                F.sum("__useful").cast("long").alias("useful_tokens"),
                F.sum("__cnt").cast("long").alias("n_docs"),
            ).select(
                lit(nb).cast("long").alias("n_buckets"),
                "n_docs",
                "useful_tokens",
                "padded_tokens",
                rnd(
                    100.0
                    * (col("padded_tokens") - col("useful_tokens"))
                    / col("padded_tokens"),
                    4,
                ).alias("waste_pct"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("n_buckets")
