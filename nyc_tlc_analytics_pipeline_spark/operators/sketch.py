"""Mergeable cardinality sketches: an expression-level HyperLogLog.

``approx_count_distinct`` already gives Spark a native HLL, but its
register layout is engine-private — no other system can verify or merge
it.  This module builds the SAME sketch out of plain column expressions
(md5 → bucket/rank, groupBy max) so that:

- the sketch is **portable**: any engine with md5 can recompute it
  bit-for-bit (the DuckDB oracle for q54 does exactly that, making this
  the rare APPROXIMATE operator with an EXACT conformance gate);
- partials are **mergeable data**, not opaque binary: a (group, bucket,
  rho) table max-merges across days/shards — the standard incremental-
  rollup pattern for 100 TB telemetry (union partials → groupBy max);
- the cost shape is explicit: one shuffle of at most m rows per group
  (m = 2^b buckets, default 512), then a tiny per-group fold.

Flajolet et al.'s HLL with the 32-bit md5 prefix as the hash: bucket =
top ``b`` bits, rho = 1-based position of the first 1-bit in the
remaining ``32−b`` bits (0 → 33−b), estimate = α·m²/Σ2^−M_j with the
linear-counting small-range correction.  The 2^−rho terms are dyadic
rationals whose sums stay exactly representable in doubles, so the
estimate is bit-stable under any partition/merge order.  (The classic
large-range correction for cardinalities near 2^32 is omitted — at that
scale switch to b ≥ 14 or the native sketch.)

Determinism caveat shared with every md5-keyed operator here: keys are
cast to string before hashing, so the sketch is stable across layouts,
engines, and re-runs.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_partials(
    df: DataFrame,
    key: str,
    group_cols: list[str],
    b: int = 9,
    salt: str = "hll",
) -> DataFrame:
    """The mergeable sketch table: one (group, bucket, rho) row per
    non-empty register.  Union partial tables from any number of shards
    and re-run ``hll_merge`` — max is associative/commutative/idempotent,
    so merging is exact."""
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    w_bits = 32 - b
    h = F.conv(
        F.substring(F.md5(F.concat(lit(salt), col(key).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    bucket = F.floor(h / lit(float(2**w_bits))).cast("long")
    w = (h % lit(2**w_bits)).cast("long")
    # rank of the first 1-bit of the w_bits-wide remainder (string form:
    # identical in Spark and any oracle engine with bin/lpad/instr)
    padded = F.lpad(F.bin(w), w_bits, "0")
    rho = F.when(w == 0, lit(w_bits + 1)).otherwise(F.instr(padded, "1"))
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Max-merge unioned partial sketch tables (exact, order-free)."""
    return partials.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    partials: DataFrame, group_cols: list[str], b: int = 9
) -> DataFrame:
    """Per-group cardinality estimate from a (merged) sketch table.
    Adds ``hll_distinct`` (double) and ``n_buckets_used``."""
    m = 2**b
    alpha = _alpha(m)
    agg = partials.groupBy(*group_cols).agg(
        F.count("*").alias("n_buckets_used"),
        F.sum(F.pow(lit(2.0), -col("rho"))).alias("inv_sum"),
    )
    # empty registers contribute 2^0 = 1 each
    raw = lit(alpha * m * m) / (
        (lit(m) - col("n_buckets_used")).cast("double") + col("inv_sum")
    )
    small = (raw <= lit(2.5 * m)) & (col("n_buckets_used") < lit(m))
    corrected = F.when(
        small,
        lit(float(m)) * F.log(lit(float(m)) / (lit(m) - col("n_buckets_used"))),
    ).otherwise(raw)
    return agg.withColumn("hll_distinct", corrected).drop("inv_sum")


def approx_distinct(
    df: DataFrame,
    key: str,
    group_cols: list[str],
    b: int = 9,
    salt: str = "hll",
) -> DataFrame:
    """One-shot grouped approximate COUNT DISTINCT via the portable HLL."""
    return hll_estimate(hll_partials(df, key, group_cols, b, salt), group_cols, b)


def expected_rel_error(b: int) -> float:
    """The sketch's standard error ≈ 1.04/√m — sizing guidance."""
    return 1.04 / math.sqrt(2**b)


# ---------------------------------------------------------------------------
# Count-Min sketch: portable approximate frequencies
# ---------------------------------------------------------------------------

def _cms_bucket(key: Column, row_i: Column, w: int, salt: str) -> Column:
    """Row-i hash bucket: first 32 md5 bits of 'salt:i:key' mod w — the
    same portable-md5 idiom as the HLL, so any engine recomputes it
    bit-for-bit."""
    digest = F.md5(
        F.concat(lit(salt), lit(":"), row_i.cast("string"), lit(":"), key)
    )
    return (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % lit(w)
    )


def cms_partials(
    df: DataFrame,
    key: str,
    d: int = 4,
    w: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Mergeable Count-Min sketch table over key OCCURRENCES (one input
    row = one count): ``(row_i, bucket, cnt)`` with d×w cells total.

    Cormode & Muthukrishnan's CM sketch with md5-derived row hashes:
    estimate(x) = min_i cnt[i][h_i(x)] ≥ true count, overestimating by
    collision mass only.  Partials from any number of shards/days
    UNION + ``cms_merge`` exactly (counts are additive), the same
    incremental-rollup shape as the HLL — and the whole sketch is
    ≤ d·w rows, so the shuffle is model-sized, never data-sized."""
    rows = df.select(
        col(key).cast("string").alias("k"),
        F.explode(F.array(*[lit(i) for i in range(d)])).alias("row_i"),
    )
    return (
        rows.withColumn("bucket", _cms_bucket(col("k"), col("row_i"), w, salt))
        .groupBy("row_i", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(partials: DataFrame) -> DataFrame:
    """Sum-merge unioned partial sketch tables (exact, order-free)."""
    return partials.groupBy("row_i", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    partials: DataFrame,
    probes: DataFrame,
    key: str,
    d: int = 4,
    w: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-query a (merged) sketch for every row of ``probes``: adds
    ``cms_count``.  The probe side explodes to d (row, bucket) lookups
    joined against the ≤ d·w-row sketch (broadcast-sized by
    construction); an absent cell means nothing hashed there → 0."""
    # collision-proof internal names: probes is an ARBITRARY frame and
    # may itself carry row_i/bucket/cnt columns
    keyed = probes.withColumn(
        "__cms_row_i", F.explode(F.array(*[lit(i) for i in range(d)]))
    ).withColumn(
        "__cms_bucket",
        _cms_bucket(col(key).cast("string"), col("__cms_row_i"), w, salt),
    )
    sk = partials.select(
        col("row_i").alias("__cms_row_i"),
        col("bucket").alias("__cms_bucket"),
        col("cnt").alias("__cms_cnt"),
    )
    looked = keyed.join(F.broadcast(sk), ["__cms_row_i", "__cms_bucket"], "left")
    return (
        looked.groupBy(*probes.columns)
        .agg(F.min(F.coalesce(col("__cms_cnt"), lit(0))).alias("cms_count"))
    )


# ---------------------------------------------------------------------------
# Bloom filter — the mergeable MEMBERSHIP sketch (HLL = cardinality,
# Count-Min = frequency, Bloom = membership).  Same portability contract:
# bit positions derive from md5, so any engine recomputes the filter
# bit-for-bit and the oracle gate is exact.
# ---------------------------------------------------------------------------


def bloom_positions(key: Column, m: int, k: int, salt: str = "bloom") -> Column:
    """Array of ``k`` bit positions for ``key``:
    ``pos_i = int(md5('{salt}:{i}:' || key)[:8 hex]) mod m`` — the
    i-salted-md5 family every sketch in this module uses."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(lit(f"{salt}:{i}:"), key.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % m
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame,
    key: str,
    group_cols: list[str] | None = None,
    m: int = 4096,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Mergeable Bloom partials: the DISTINCT (group, pos) table —
    at most ``m`` rows per group, i.e. the set-bit list rather than an
    opaque bitmask.  Merging shards = union + distinct (idempotent,
    order-free); a dense bitmask materializes only if a consumer wants
    one.  Cost: one map-side explode (k rows per key) + one distinct
    shuffle bounded by m per group."""
    group_cols = group_cols or []
    return (
        df.select(
            *group_cols,
            F.explode(bloom_positions(col(key), m, k, salt)).alias("pos"),
        )
        .distinct()
    )


def bloom_probe(
    probes: DataFrame,
    bloom: DataFrame,
    key: str,
    m: int = 4096,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Tag each probe row with ``bloom_hit`` (all k positions set — may
    include false positives, never false negatives).  Distributed form:
    explode probe positions, LEFT-join the ≤m-row set-bit table
    (broadcast — a Bloom filter is small by construction), then regroup
    to one row per probe with ``count(matched) == k``.  No driver-side
    bitmask, no UDF — and the probe lineage is consumed exactly ONCE
    (the earlier inner-join + join-back form re-executed the whole
    probe-side plan — scan, explode, distinct — a second time for the
    join's left input; measured as q91's doubled corpus subtree).
    Probe rows are keyed by their full column tuple, so duplicate probe
    rows collapse to one output row — every in-repo consumer probes a
    distinct frame (q91 probes distinct (source, gram) pairs)."""
    probe_pos = probes.select(
        "*", F.explode(bloom_positions(col(key), m, k, salt)).alias("pos")
    )
    return (
        probe_pos.join(
            F.broadcast(bloom.withColumn("__set", lit(1))), "pos", "left"
        )
        .groupBy(*probes.columns)
        .agg((F.count("__set") == k).alias("bloom_hit"))
    )


def bloom_fpp(bits_set: Column, m: int, k: int) -> Column:
    """Measured-occupancy false-positive estimate ``(bits_set/m)^k``."""
    return F.pow(bits_set.cast("double") / m, lit(k))


def cms_join_size(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
) -> DataFrame:
    """Equi-join cardinality estimate from two Count-Min sketches built
    over the join keys with the SAME (d, w, salt): the classic CM
    inner-product estimator (Cormode & Muthukrishnan §4.2) —
    ``|A ⋈ B| = Σ_k cA(k)·cB(k) ≈ min_i Σ_b cntA[i][b]·cntB[i][b]`` —
    an upper bound that exceeds the truth only by collision mass.

    This is optimizer-grade statistics machinery: the sketches are
    model-sized (≤ d·w rows each), mergeable across shards/days like
    every sketch in this module, and the estimate itself is one
    (row_i, bucket)-keyed join over two tiny frames — so a 100 TB
    engine can keep per-column/per-day CM sketches in its catalog and
    price candidate joins without touching the fact tables.  Returns
    one row: ``join_size_estimate``.

    Fully lazy like every other builder in this module: the hash-row
    count d rides as a 1-row broadcast aggregate inside the returned
    plan — no job runs at construction time (an eager ``.count()``
    here would scan the sketch lineage, i.e. the underlying fact
    table, just to BUILD the frame)."""
    a = sketch_a.select("row_i", "bucket", col("cnt").alias("__ca"))
    b = sketch_b.select("row_i", "bucket", col("cnt").alias("__cb"))
    nr = sketch_a.select("row_i").distinct().agg(F.count("*").alias("__nr"))
    per_row = (
        a.join(b, ["row_i", "bucket"])
        .groupBy("row_i")
        .agg(F.sum(col("__ca") * col("__cb")).alias("__ip"))
    )
    # a hash row whose buckets never overlap has inner product 0 and is
    # ABSENT from the join — it must still win the min (disjoint key
    # sets estimate 0, not NULL)
    return (
        per_row.agg(
            F.count("*").alias("__np"), F.min("__ip").alias("__mn")
        )
        .crossJoin(F.broadcast(nr))
        .select(
            F.when(col("__np") < col("__nr"), lit(0))
            .otherwise(col("__mn"))
            .cast("long")
            .alias("join_size_estimate")
        )
    )


def hll_overlap(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    b: int = 9,
) -> DataFrame:
    """Distinct-key overlap between two register tables built with the
    SAME (b, salt): inclusion–exclusion on HyperLogLog —
    ``|A ∩ B| ≈ est(A) + est(B) − est(A ∪ B)``, where the union sketch
    is the max-merge of the registers (exact for the union, the HLL
    closure property).  Clamped at 0: subtraction can go slightly
    negative when the true overlap is tiny relative to the sketch
    error.

    The companion planning stat to ``cms_join_size``: CMS prices the
    JOIN ROW COUNT (Σ cA·cB), this prices the DISTINCT KEY MATCH — the
    pair an optimizer needs to choose between shuffle strategies and to
    estimate semi-join selectivity.  All three estimates come from
    model-sized mergeable register tables a catalog maintains
    incrementally.  Returns one row: (distinct_a, distinct_b,
    distinct_union, overlap_estimate), all raw doubles."""
    union = hll_merge(sketch_a.unionByName(sketch_b), [])
    ea = hll_estimate(sketch_a, [], b).select(col("hll_distinct").alias("da"))
    eb = hll_estimate(sketch_b, [], b).select(col("hll_distinct").alias("db"))
    eu = hll_estimate(union, [], b).select(col("hll_distinct").alias("du"))
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            col("da").alias("distinct_a"),
            col("db").alias("distinct_b"),
            col("du").alias("distinct_union"),
            F.greatest(col("da") + col("db") - col("du"), lit(0.0)).alias(
                "overlap_estimate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# mergeable quantile sketch: HDR-style dyadic histogram partials
# ---------------------------------------------------------------------------

#: default sub-bucket bits: 2^s sub-buckets per octave → worst-case
#: relative error 2^-s ≈ 3.1% per estimated quantile.
QHIST_SUBBITS = 5


def _qhist_width(a: Column, s: int) -> Column:
    """Bucket width for an absolute scaled-integer magnitude ``a``:
    ``2^max(0, bitlen(a) − 1 − s)`` — 1 (exact) below 2^(s+1), then one
    power of two per octave.  bitlen via length(bin(x)), identical in
    Spark and DuckDB; pow(2, e) is exactly representable in a double
    far past any 64-bit magnitude, so the long cast is exact — the
    oracle's ``1::BIGINT << e`` lands on the same integer."""
    e = F.length(F.bin(a)).cast("int")
    return F.pow(lit(2.0), F.greatest(e - lit(1 + s), lit(0)).cast("double")).cast(
        "long"
    )


def qhist_partials(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    precision: int = 2,
    s: int = QHIST_SUBBITS,
) -> DataFrame:
    """The mergeable QUANTILE partial: one (group, bucket, cnt) row per
    non-empty dyadic histogram bucket — the missing member of the
    catalog-statistics sketch family (HLL = distincts, CMS =
    frequencies, Bloom = membership, THIS = quantiles), so percentile
    questions stop costing a data pass once partials are maintained
    per shard/day and merged by summation.

    Bucketing is HdrHistogram's (Tene, public domain) dyadic layout in
    pure INTEGER arithmetic, chosen over DDSketch's ln-based buckets
    deliberately: both give a bounded RELATIVE error, but ``ln`` is not
    correctly-rounded identically across runtimes (a value a ulp from a
    bucket boundary could land differently in Spark vs a verifier),
    while bit-length/shift/mod are exact everywhere — the whole partial
    table is bit-identical cross-engine (the q54/q66 conformance
    posture):

    * scale: ``v = floor(value·10^precision + 0.5 + 1e-9)`` (the
      quantize_codes half-up nudge) — absolute resolution 10^-precision;
    * magnitude ``a = |v| < 2^(s+1)``: bucket = v exactly (near-zero
      values pay ZERO quantization error);
    * larger: drop ``a`` to the multiple of ``2^(bitlen(a)-1-s)`` below
      it — 2^s sub-buckets per power-of-two octave, worst-case relative
      error 2^-s; signed values mirror (bucket key = sign·floor).

    Merge is ``groupBy(bucket).sum(cnt)`` — associative, commutative,
    exact, any shard/partition order (:func:`qhist_merge`); estimation
    is :func:`qhist_quantiles`.  Bucket count per group is bounded by
    ~2^s per octave × 64 octaves regardless of data size — model-sized
    catalog state, never data-sized."""
    v = F.floor(
        col(value_col).cast("double") * lit(float(10**precision))
        + lit(0.5)
        + lit(1e-9)
    ).cast("long")
    a = F.abs(v)
    w = _qhist_width(a, s)
    lo = a - (a % w)
    bucket = F.when(v < 0, -lo).otherwise(lo)
    return (
        df.where(col(value_col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def qhist_merge(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Sum-merge any union of partial tables built with the same
    (precision, s): merge(shards) == whole, exactly."""
    return (
        partials.groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def qhist_quantiles(
    partials: DataFrame,
    group_cols: list[str],
    qs: list[float],
    precision: int = 2,
    s: int = QHIST_SUBBITS,
) -> DataFrame:
    """Quantile estimates from a (group, bucket, cnt) partial table:
    one row per (group, q) with ``q_est`` = linear interpolation inside
    the bucket holding rank ``q·n`` of the cumulative walk — the q96
    histogram-walk posture: the window runs over the BOUNDED bucket
    frame (≤ ~2^s·64 rows per group), never the data.

    Bucket bounds are reconstructed from the key alone (width from the
    key's own bit length — the top bit survives the floor, so
    bitlen(bucket) == bitlen(original magnitude)); negative buckets
    mirror.  All interpolation arithmetic is doubles built from exact
    integers in the same order both engines evaluate, rounded 6 dp."""
    from pyspark.sql import Window

    a = F.abs(col("bucket"))
    w = _qhist_width(a, s)
    lo = F.when(col("bucket") < 0, (-(a + w)).cast("double")).otherwise(
        col("bucket").cast("double")
    )
    hi = lo + w.cast("double")
    bounded = partials.select(*group_cols, "bucket", "cnt").withColumn(
        "__lo", lo
    ).withColumn("__hi", hi)
    win = Window.partitionBy(*[col(c) for c in group_cols]).orderBy("__lo")
    cum = bounded.withColumn("__cum", F.sum("cnt").over(win)).withColumn(
        "__n", F.sum("cnt").over(Window.partitionBy(*group_cols))
    )
    qf = F.explode(F.array(*[lit(float(q)) for q in qs])).alias("q")
    ranked = cum.select(*group_cols, "bucket", "cnt", "__lo", "__hi",
                        "__cum", "__n", qf)
    target = col("q") * col("__n").cast("double")
    hit = ranked.filter(col("__cum").cast("double") >= target)
    pick = Window.partitionBy(*group_cols, "q").orderBy("__lo")
    scale = float(10**precision)
    est = (
        col("__lo")
        + (col("__hi") - col("__lo"))
        * (target - (col("__cum") - col("cnt")).cast("double"))
        / col("cnt").cast("double")
    ) / lit(scale)
    return (
        hit.withColumn("__rn", F.row_number().over(pick))
        .filter(col("__rn") == 1)
        .select(
            *group_cols,
            col("q"),
            F.round(est + lit(1e-9), 6).alias("q_est"),
            col("__n").alias("n_rows"),
        )
    )
