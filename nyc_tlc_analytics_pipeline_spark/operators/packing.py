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
    document's start offset within its pack)."""
    w = Window.partitionBy(stream_col).orderBy(order_col)
    start = (F.coalesce(F.sum(tokens_col).over(w), lit(0)) - col(tokens_col)).cast(
        "long"
    )
    return df.withColumn("__start", start).withColumns(
        {
            "pack_id": (col("__start") / budget).cast("long"),
            "pack_offset": (col("__start") % budget).cast("long"),
        }
    ).drop("__start")


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
