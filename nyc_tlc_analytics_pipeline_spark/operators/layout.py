"""Physical data-layout operators: Z-order clustering for
multi-dimensional data skipping, scalable global row numbering, and
balanced shard assignment.

Design for 100 TB:

- ``zorder_key`` is a pure column expression (bit interleaving unrolled
  into shift/and/or terms) — whole-stage codegen, no UDF, no shuffle.
  A Z-ordered write is one ``repartitionByRange`` on the key plus a
  within-partition sort; every parquet row group then carries TIGHT
  min/max stats on ALL interleaved dimensions, so point/range predicates
  on any of them prune files (the Delta/Databricks OPTIMIZE ZORDER idea,
  done with stock Spark primitives).
- ``global_row_number`` avoids the classic Spark trap — a window with no
  ``partitionBy`` collapses to ONE partition — by the two-pass
  range-partitioned scheme (the terasort shape): range-partition on the
  order key, rank locally per partition, then add per-partition offsets
  (a |partitions|-row frame, broadcast back).  Rank values depend only
  on the total order, not the layout.
- ``serpentine_shards`` balances training shards by size with a
  boustrophedon pass over the size-ranked rows: shard loads differ by at
  most one inter-rank gap per round — near-LPT balance without the
  sequential greedy loop, fully parallel given the global rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit


# ---------------------------------------------------------------------------
# Z-order (Morton) keys
# ---------------------------------------------------------------------------

def zorder_key(dims: list[Column | str], bits: int = 16) -> Column:
    """Morton / Z-order key: interleave the low ``bits`` bits of each
    dimension (dim 0 owns the least-significant interleaved bit).  Pure
    integer shift/and arithmetic — identical semantics in any engine —
    unrolled at plan-build time into ``bits × len(dims)`` OR-terms that
    whole-stage codegen fuses into the scan.

    Dimensions must already be non-negative integers below ``2**bits``
    (rank- or bucket-normalize wider domains first); values at or above
    ``2**bits`` wrap (only their low bits interleave), which degrades
    locality but never correctness of downstream min/max pruning."""
    n = len(dims)
    if n < 2:
        raise ValueError("zorder_key needs at least 2 dimensions")
    if bits * n > 63:
        raise ValueError(f"bits={bits} × {n} dims exceeds a signed 64-bit key")
    z: Column = lit(0).cast("long")
    for d, dim in enumerate(dims):
        c = (col(dim) if isinstance(dim, str) else dim).cast("long")
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(lit(1)), b * n + d)
            )
    return z


def zorder_file_profile(
    df: DataFrame,
    dims: list[str],
    bits: int = 16,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-file min/max profile of a Z-ordered layout: assign each row
    to one of ``n_buckets`` files by the TOP bits of its Z-key (the
    file boundaries a range-partitioned Z-write produces on uniform
    data), then report each file's row count and per-dimension min/max —
    exactly the parquet footer stats a scan's predicate pushdown prunes
    against.  Static bucket edges (key-space, not data-dependent) keep
    the assignment deterministic and oracle-checkable.  ``n_buckets``
    is effectively rounded UP to a power of two (file id = the key's
    top ceil(log2(n_buckets)) bits) — non-power-of-two values get the
    next wider split, never a silent mis-bucketing."""
    total_bits = bits * len(dims)
    shift = total_bits - max(n_buckets - 1, 1).bit_length()
    zb = F.shiftright(zorder_key(list(dims), bits), shift).alias("file_id")
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for d in dims:
        aggs.append(F.min(d).cast("long").alias(f"min_{d}"))
        aggs.append(F.max(d).cast("long").alias(f"max_{d}"))
    return df.groupBy(zb).agg(*aggs).orderBy("file_id")


def write_zordered(
    df: DataFrame,
    dims: list[str],
    path: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Materialize ``df`` as a Z-ordered parquet dataset: range-partition
    on the Z-key into ``n_files`` output files and sort within each, so
    every file (and row group) carries tight min/max footer stats on ALL
    ``dims`` — multi-dimensional file skipping with stock Spark.

    One shuffle (the range partitioner) + a per-partition sort; the sort
    key is dropped before the write."""
    zc = zorder_key(list(dims), bits)
    (
        df.withColumn("__z", zc)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# scalable global row_number
# ---------------------------------------------------------------------------

def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    n_partitions: int | None = None,
) -> DataFrame:
    """1-based dense global row number under ``order_cols`` WITHOUT the
    single-partition window Spark plans for ``row_number().over(orderBy)``
    with no partition key.  Two passes, both parallel:

    1. ``repartitionByRange`` on the order columns — every row in range
       partition *p* sorts before every row in *p+1*;
    2. rank locally inside each partition (window keyed by
       ``spark_partition_id()``), count rows per partition, and add the
       running offset (a |partitions|-row frame joined back broadcast).

    ``order_cols`` must be a TOTAL order (add a unique id tie-break);
    the assigned ranks then depend only on the data, not the layout.
    Cost: one range shuffle + one tiny aggregate — the terasort shape,
    which is how a 100 TB corpus gets a stable training order."""
    if n_partitions:
        part = df.repartitionByRange(n_partitions, *order_cols)
    else:
        part = df.repartitionByRange(*order_cols)
    part = part.withColumn("__pid", F.spark_partition_id())
    local = F.row_number().over(
        Window.partitionBy("__pid").orderBy(*order_cols)
    )
    counts = (
        part.groupBy("__pid")
        .agg(F.count("*").alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                lit(0),
            ),
        )
        .select("__pid", "__offset")
    )
    return (
        part.join(F.broadcast(counts), "__pid")
        .withColumn(rank_col, (col("__offset") + local).cast("long"))
        .drop("__pid", "__offset")
    )


# ---------------------------------------------------------------------------
# balanced shard assignment (serpentine over the size rank)
# ---------------------------------------------------------------------------

def serpentine_shards(
    df: DataFrame,
    size_col: str,
    id_col: str,
    n_shards: int,
    shard_col: str = "shard",
) -> DataFrame:
    """Assign every row to one of ``n_shards`` training shards, balanced
    by ``size_col``: rank rows by size descending (id tie-break), then
    deal them out boustrophedon — rank 1..n left-to-right, n+1..2n
    right-to-left, and so on.  Each round of 2n rows gives every shard
    exactly one "large" and one "small" pick, so shard totals track the
    optimum to within one inter-rank gap per round (near-LPT) with no
    sequential greedy state.

    Built on ``global_row_number`` — fully parallel, no single-partition
    window.  Returns ``df`` + (rank, <shard_col>)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    ranked = global_row_number(
        df, [col(size_col).desc(), col(id_col)], rank_col="rank"
    )
    r = (col("rank") - 1) % lit(2 * n_shards)
    return ranked.withColumn(
        shard_col,
        F.when(r < n_shards, r)
        .otherwise(lit(2 * n_shards - 1) - r)
        .cast("long"),
    )


# ---------------------------------------------------------------------------
# rendezvous (highest-random-weight) consistent sharding
# ---------------------------------------------------------------------------

def rendezvous_shard(
    id_col: Column | str,
    n_shards: int,
    salt: str = "hrw",
) -> Column:
    """Rendezvous / highest-random-weight shard assignment: the shard
    whose ``md5(salt:id:shard)`` digest is lexicographically largest
    wins.  The HRW property is what matters for a growing corpus:
    adding shard N+1 steals exactly the keys whose new digest beats all
    prior ones — an expected 1/(N+1) of the data moves and NOTHING else
    reshuffles (modulo hashing would move ~half).

    Pure unrolled column expressions (greatest over n md5 strings +
    a CASE to recover the argmax) — portable to any engine, no UDF,
    no shuffle; md5 hex strings compare identically everywhere and
    make ties impossible in practice (the first-match CASE breaks a
    digest collision toward the smaller shard id deterministically)."""
    c = col(id_col) if isinstance(id_col, str) else id_col
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    digests = [
        F.md5(F.concat(lit(f"{salt}:"), c.cast("string"), lit(f":{s}")))
        for s in range(n_shards)
    ]
    best = digests[0] if n_shards == 1 else F.greatest(*digests)
    out = lit(n_shards - 1)
    for s in range(n_shards - 2, -1, -1):
        out = F.when(digests[s] == best, lit(s)).otherwise(out)
    return out.cast("long")


# ---------------------------------------------------------------------------
# shard-balance audit: byte skew + Gini per assignment strategy
# ---------------------------------------------------------------------------

def shard_balance_report(
    df: DataFrame,
    n_shards: int = 8,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Byte-balance audit of three shard-assignment strategies side by
    side — the decision table for how a 100 TB corpus writes its output
    shards.  The straggler tax is set by ``max/mean`` (the slowest
    shard gates the stage) and the overall inequality by the Gini
    coefficient of shard byte sizes:

    - ``rendezvous`` — :func:`rendezvous_shard` (HRW): balanced AND
      minimal-movement when shards are added;
    - ``hashmod`` — md5 mod S: balanced, but resharding moves ~half the
      keys;
    - ``idrange`` — contiguous id ranges: the tempting-but-wrong
      baseline; balanced only when weight is uncorrelated with id, and
      any ingestion-order drift (newer docs longer) skews it silently.

    Scale shape: each strategy is one map-side assignment expression +
    one groupBy on the shard key (S groups); the Gini rank runs in a
    window PARTITIONED BY strategy over exactly S rows per partition —
    bounded by construction, never data-sized.  Integer weights keep
    every sum exact; the only FP ops are the two final divisions.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from ..functions.scalar import rnd

    w = col(weight_col).cast("long")
    hashmod = (
        F.conv(
            F.substring(
                F.md5(F.concat(lit("shard:"), col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    )
    bounds = df.agg(
        F.min(col(id_col)).alias("__lo"), F.max(col(id_col)).alias("__hi")
    )
    # integer DIV: a double boundary can flip the id that lands exactly
    # on a range edge by one ulp cross-engine (the q175 convention)
    idrange = F.expr(
        f"least((({id_col} - __lo) * {int(n_shards)})"
        f" div (__hi - __lo + 1), {int(n_shards) - 1})"
    ).cast("long")
    base = df.join(F.broadcast(bounds))
    tagged = None
    for name, expr in (
        ("rendezvous", rendezvous_shard(id_col, n_shards)),
        ("hashmod", hashmod),
        ("idrange", idrange),
    ):
        part = base.select(
            lit(name).alias("strategy"), expr.alias("shard"), w.alias("__w")
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    occupied = tagged.groupBy("strategy", "shard").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("__w").cast("long").alias("bytes"),
    )
    # spine: EMPTY shards are still shards — dropping them would shrink
    # the Gini denominator and hide exactly the imbalance being audited
    spine = (
        df.sparkSession.range(n_shards)
        .select(col("id").alias("shard"))
        .crossJoin(
            df.sparkSession.createDataFrame(
                [("rendezvous",), ("hashmod",), ("idrange",)], ["strategy"]
            )
        )
    )
    # both sides are S-sized aggregates; the preserved side of a left
    # join can't broadcast, and it doesn't need to
    shards = (
        spine.join(occupied, ["strategy", "shard"], "left")
        .select(
            "strategy",
            "shard",
            F.coalesce(col("n_rows"), lit(0)).cast("long").alias("n_rows"),
            F.coalesce(col("bytes"), lit(0)).cast("long").alias("bytes"),
        )
    )
    i = F.row_number().over(
        Window.partitionBy("strategy").orderBy(col("bytes"), col("shard"))
    )
    ranked = shards.withColumn("__i", i)
    return (
        ranked.groupBy("strategy")
        .agg(
            F.count("*").cast("long").alias("n_shards"),
            F.sum("n_rows").cast("long").alias("total_rows"),
            F.sum("bytes").cast("long").alias("total_bytes"),
            F.min("bytes").cast("long").alias("min_shard_bytes"),
            F.max("bytes").cast("long").alias("max_shard_bytes"),
            rnd(
                F.max("bytes") / (F.sum("bytes") / F.count("*")), 4
            ).alias("max_over_mean"),
            rnd(
                F.sum(
                    (lit(2) * col("__i") - F.lit(n_shards) - 1) * col("bytes")
                )
                / (lit(n_shards) * F.sum("bytes")),
                6,
            ).alias("gini"),
        )
        .orderBy("strategy")
    )
