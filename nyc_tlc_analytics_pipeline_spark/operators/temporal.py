"""Temporal join operators Spark lacks as primitives: as-of join and
range (interval) join — expressed as compositions of existing DataFrame
ops (SURVEY §7 extension; the conformance oracles use DuckDB's native
ASOF JOIN / inequality joins).

Scale design:

- **as-of join** uses the union-and-carry-forward plan: tag both sides,
  union, one shuffle+sort per key by (ts, side), then a window
  ``last(value, ignorenulls)`` carries the most recent right-side row
  onto each left row.  One shuffle total — no range explosion, no
  per-row binary search, skew bounded by the key partitioning (same
  shape Flink/kdb use for temporal joins).
- **range join** buckets both sides to ``window`` granularity and joins
  each left bucket to its two adjacent right buckets before the exact
  interval filter — turning an inequality join (cartesian per key) into
  an equi-join with ≤2× duplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit
from pyspark.sql.types import TimestampNTZType


def _ts_as_double(df: DataFrame, name: str):
    """Epoch-seconds double for a timestamp column of either flavor.
    TIMESTAMP_NTZ rejects direct numeric casts (Spark 4); route it through
    LTZ — wall-clock-preserving under the engine's UTC session timezone.
    Numeric columns (already epoch seconds) pass through unchanged."""
    c = col(name)
    if isinstance(df.schema[name].dataType, TimestampNTZType):
        c = c.cast("timestamp_ltz")
    return c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from ONE matched right
    row:

    - ``backward`` (default): the latest right row with
      ``right_ts <= left_ts`` — the classic trades/quotes as-of.
    - ``forward``: the earliest right row with ``right_ts >= left_ts``
      — the next-observation join (next price tick, next sensor
      reading, next deploy after an alert).
    - ``nearest``: whichever of the two is closer in time; exact
      distance ties prefer the BACKWARD row (the pandas
      ``merge_asof(direction='nearest')`` convention).

    Equal timestamps match in every direction (a quote stamped exactly
    at the trade is visible to it).  Returns all left columns + the
    as-of value columns (NULL when no matching right row exists).

    All three directions are the same one-shuffle union-and-carry plan:
    both sides union, one hash partition by key, and per-key sorted
    windows carry the adjacent right struct onto each left row —
    ``last(ignorenulls)`` over the preceding frame for backward,
    ``first(ignorenulls)`` over the following frame for forward;
    nearest computes both carries in the SAME partitioning (two sorts,
    one exchange) and picks per row.  No range explosion, no per-row
    binary search, skew bounded by the key partitioning.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    lt = left.withColumn("__ts", col(left_ts)).withColumn("__side", lit(1))
    # SQL as-of semantics: a right row with a NULL key or NULL timestamp can
    # never match (ON l.k = r.k AND l.ts >= r.ts is NULL-rejecting) — drop
    # them up front so they cannot be carried forward
    rt = (
        right.filter(col(on).isNotNull() & col(right_ts).isNotNull())
        .select(
            col(on),
            col(right_ts).alias("__ts"),
            # ONE struct per right row so all value columns always come from
            # the SAME matched row (per-column carry would mix rows when a
            # value column contains NULLs); __mtsd rides along so `nearest`
            # can compare distances to the matched row
            F.struct(
                _ts_as_double(right, right_ts).alias("__mtsd"),
                *[col(c).alias(c) for c in value_cols],
            ).alias("__vals"),
        )
        .withColumn("__side", lit(0))
    )
    lt_aligned = lt.withColumn("__vals", lit(None).cast(rt.schema["__vals"].dataType))
    unioned = lt_aligned.unionByName(rt, allowMissingColumns=True)
    unioned = unioned.withColumn("__tsd", _ts_as_double(unioned, "__ts"))

    # backward: right rows sort BEFORE left rows at the same ts (side
    # 0 < 1) so an exactly-simultaneous quote is inside the preceding
    # frame; forward mirrors it (left before right) so the same quote is
    # inside the following frame
    w_back = (
        Window.partitionBy(on)
        .orderBy("__tsd", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(on)
        .orderBy("__tsd", (lit(1) - col("__side")))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction == "backward":
        carried = unioned.withColumn(
            "__asof", F.last("__vals", ignorenulls=True).over(w_back)
        )
    elif direction == "forward":
        # a NULL-ts left row sorts first (nulls-first) and would otherwise
        # see the whole right side in its following frame — mask it out
        carried = unioned.withColumn(
            "__asof",
            F.when(
                col("__tsd").isNotNull(),
                F.first("__vals", ignorenulls=True).over(w_fwd),
            ),
        )
    else:  # nearest
        b = F.last("__vals", ignorenulls=True).over(w_back)
        f = F.when(
            col("__tsd").isNotNull(),
            F.first("__vals", ignorenulls=True).over(w_fwd),
        )
        db = col("__tsd") - b.getField("__mtsd")
        df_ = f.getField("__mtsd") - col("__tsd")
        carried = unioned.withColumn(
            "__asof",
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(df_ < db, f)
            .otherwise(b),
        )
    out = carried.filter(col("__side") == 1).select(
        *[c for c in left.columns],
        *[col("__asof").getField(c).alias(f"asof_{c}") for c in value_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """All (left, right) pairs with the same key whose timestamps are
    within ``window_seconds`` of each other (|l.ts − r.ts| ≤ w), as an
    equi-join on (key, time bucket) probing each left row's own and two
    adjacent buckets — never a per-key cross product.

    The timestamp comparison uses internally aliased columns, so
    ``left_ts`` and ``right_ts`` may share a name; any OTHER shared
    column names surface as duplicate output columns (rename first)."""
    lt = (
        left.withColumn("__lts", _ts_as_double(left, left_ts))
        .withColumn("__bl", F.floor(col("__lts") / window_seconds))
        .withColumn("__probe", F.explode(F.array(lit(-1), lit(0), lit(1))))
        .withColumn("__bucket", col("__bl") + col("__probe"))
    )
    rt = right.withColumn("__rts", _ts_as_double(right, right_ts)).withColumn(
        "__bucket", F.floor(col("__rts") / window_seconds)
    )
    joined = lt.join(rt, [on, "__bucket"])
    keep = F.abs(col("__lts") - col("__rts")) <= window_seconds
    return joined.filter(keep).drop("__bl", "__probe", "__bucket", "__lts", "__rts")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    keys: list[str] | None = None,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Interval-×-interval OVERLAP join (half-open: ``l.start < r.end AND
    r.start < l.end``) — the third temporal primitive after as-of
    (point→latest-point) and range (point→interval).

    Two scale paths:

    - ``keys`` given: plain equi-join on the keys with the overlap
      predicate as a post-filter — correct whenever a natural entity key
      (user, instrument, machine) bounds the per-key interval count.
    - no keys: ``bucket_seconds`` REQUIRED.  Each interval explodes to
      the time buckets it covers, the join runs as a bucket equi-join,
      and duplicate pairs (intervals sharing >1 bucket) collapse with a
      distinct on a synthetic (left row id, right row id) pair identity
      — NOT on the full row, so genuinely duplicate input rows keep
      their multiset semantics, matching the keyed path and the naive
      inequality join.  This is the standard interval-bucketing
      trick that turns an inequality join (cartesian per key) into an
      equi-join whose fan-out is interval_length/bucket_seconds.
      Pick ``bucket_seconds`` ≈ the TYPICAL interval length: much
      smaller multiplies the explode, much larger multiplies the
      per-bucket pair count.

    Right columns are suffixed ``_r`` where they collide.
    """
    rn = {
        c: (f"{c}_r" if c in set(left.columns) else c) for c in right.columns
    }
    r = right.select([col(c).alias(rn[c]) for c in right.columns])
    rs, re_ = rn[right_start], rn[right_end]
    overlap = (col(left_start) < col(re_)) & (col(rs) < col(left_end))
    if keys:
        cond = overlap
        for k in keys:
            cond = (col(k) == col(rn[k])) & cond
        joined = left.join(r, cond)
        return joined.drop(*[rn[k] for k in keys if rn[k] != k])
    if not bucket_seconds:
        raise ValueError("keyless interval join requires bucket_seconds")

    def bucketed(df: DataFrame, s: str, e: str, rid: str) -> DataFrame:
        # row id BEFORE the explode: the multi-bucket copies of one row
        # share an id, so the post-join dedup collapses exactly the
        # bucket-induced duplicates and nothing else
        df = df.withColumn(rid, F.monotonically_increasing_id())
        sb = F.floor(_ts_as_double(df, s) / bucket_seconds).cast("long")
        eb = F.floor(_ts_as_double(df, e) / bucket_seconds).cast("long")
        return df.withColumn("__bucket", F.explode(F.sequence(sb, eb)))

    lb = bucketed(left, left_start, left_end, "__lid")
    rb = bucketed(r, rs, re_, "__rid")
    return (
        lb.join(rb, "__bucket")
        .filter(overlap)
        .drop("__bucket")
        .dropDuplicates(["__lid", "__rid"])
        .drop("__lid", "__rid")
    )


def gap_fill_daily(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    round_decimals: int = 4,
) -> DataFrame:
    """Dense daily series with forward-fill — the hypertable
    ``time_bucket_gapfill + locf`` primitive: aggregate ``value_col``
    per (key, day), left-join onto the full key × day spine, and carry
    the last observed value forward into the gaps.

    Scale shape: one (key, day) aggregate shuffle; the spine is
    |keys| × |days| rows generated from a 1-ROW global min/max
    aggregate broadcast-cross-joined onto the distinct keys (the S14
    sequence+explode generator — no data-sized collect, no driver
    loop); the fill is one ``last(ignorenulls)`` window per key — the
    as-of-join carry-forward machinery re-keyed to the spine.  Days
    before a key's first observation stay NULL (``filled`` true,
    ``value_filled`` null): forward fill has nothing to carry.

    The daily aggregate is nudge-rounded BEFORE the fill so every
    downstream comparison sees cross-engine-identical values.

    Returns (key, day, value_filled, filled)."""
    from ..functions.scalar import rnd

    day = col(ts_col).cast("date")
    daily = (
        df.select(col(key_col).alias("key"), day.alias("day"),
                  col(value_col).alias("v"))
        .groupBy("key", "day")
        .agg(rnd(F.sum("v"), round_decimals).alias("v"))
    )
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = (
        daily.select("key")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "key",
            F.explode(F.sequence(col("lo"), col("hi"))).alias("day"),
        )
    )
    j = spine.join(daily, ["key", "day"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        col("key").alias(key_col),
        "day",
        F.last("v", ignorenulls=True).over(w).alias("value_filled"),
        col("v").isNull().alias("filled"),
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: adds ``session_seq`` (1-based per user)
    to the input rows — a new session starts when the gap to the
    previous event exceeds ``gap_seconds`` (strict >; integer-second
    grain via :func:`to_epoch`, the DuckDB ``date_diff('second', ...)``
    convention).  The ONE definition of a session boundary — q19's
    per-user stats and q184's transcript assembly both call this, so
    the gap rule can never drift between them.

    Scale shape: two windows per user partition (lag + running sum —
    a user's history is the partition); NULL timestamps are dropped
    (they order nowhere)."""
    from ..functions.scalar import to_epoch

    order_w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = to_epoch(ts_col) - to_epoch("__prev_ts")
    return (
        events.filter(col(ts_col).isNotNull())
        .withColumn("__prev_ts", F.lag(ts_col).over(order_w))
        .withColumn(
            "__new",
            F.when(
                col("__prev_ts").isNull() | (gap > gap_seconds), 1
            ).otherwise(0),
        )
        .withColumn("session_seq", F.sum("__new").over(run_w).cast("long"))
        .drop("__prev_ts", "__new")
    )
