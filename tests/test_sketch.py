"""Portable HLL sketch: merge exactness, accuracy bound, sizing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nyc_tlc_analytics_pipeline_spark.operators import sketch


def _keys(spark, lo, hi, grp="g"):
    return spark.range(lo, hi).select(
        F.lit(grp).alias("grp"), F.col("id").cast("string").alias("k")
    )


def test_estimate_within_expected_error(spark):
    n = 20_000
    df = _keys(spark, 0, n)
    est = sketch.approx_distinct(df, "k", ["grp"], b=9).head()
    rel = abs(est["hll_distinct"] - n) / n
    # 1.04/sqrt(512) ≈ 4.6%; allow 3 sigma
    assert rel < 3 * sketch.expected_rel_error(9)


def test_shard_merge_equals_whole(spark):
    """Sketching shards independently and max-merging the partials must
    give EXACTLY the same registers (and estimate) as sketching the full
    set — the property that makes HLL an incremental-rollup citizen."""
    whole = sketch.hll_partials(_keys(spark, 0, 5000), "k", ["grp"], b=8)
    shard_a = sketch.hll_partials(_keys(spark, 0, 3000), "k", ["grp"], b=8)
    shard_b = sketch.hll_partials(_keys(spark, 2000, 5000), "k", ["grp"], b=8)  # overlap
    merged = sketch.hll_merge(shard_a.unionByName(shard_b), ["grp"])
    w = {(r["bucket"]): r["rho"] for r in whole.collect()}
    m = {(r["bucket"]): r["rho"] for r in merged.collect()}
    assert w == m
    e_w = sketch.hll_estimate(whole, ["grp"], b=8).head()["hll_distinct"]
    e_m = sketch.hll_estimate(merged, ["grp"], b=8).head()["hll_distinct"]
    assert e_w == e_m  # bit-identical, not just close


def test_duplicates_do_not_inflate(spark):
    base = _keys(spark, 0, 1000)
    dup3 = base.unionByName(base).unionByName(base)
    e1 = sketch.approx_distinct(base, "k", ["grp"], b=9).head()["hll_distinct"]
    e3 = sketch.approx_distinct(dup3, "k", ["grp"], b=9).head()["hll_distinct"]
    assert e1 == e3


def test_grouped_sketches_are_independent(spark):
    df = _keys(spark, 0, 1000, "a").unionByName(_keys(spark, 0, 3000, "b"))
    rows = {
        r["grp"]: r["hll_distinct"]
        for r in sketch.approx_distinct(df, "k", ["grp"], b=9).collect()
    }
    assert rows["b"] > rows["a"] * 2


def test_register_bound(spark):
    n_rows = 50_000
    p = sketch.hll_partials(_keys(spark, 0, n_rows), "k", ["grp"], b=6)
    assert p.count() <= 64  # at most m register rows reach the group fold


def test_b_validation(spark):
    with pytest.raises(ValueError):
        sketch.hll_partials(_keys(spark, 0, 10), "k", ["grp"], b=2)


def test_bloom_never_false_negative_and_merge_idempotent(spark):
    from pyspark.sql import functions as F

    from nyc_tlc_analytics_pipeline_spark.operators.sketch import (
        bloom_build,
        bloom_fpp,
        bloom_probe,
    )

    members = spark.createDataFrame(
        [(f"key_{i}",) for i in range(200)], "g string"
    )
    probes = spark.createDataFrame(
        [(f"key_{i}",) for i in range(150, 350)], "g string"
    )
    bloom = bloom_build(members, "g", m=1024, k=3)
    tagged = bloom_probe(probes, bloom, "g", m=1024, k=3)
    rows = {r.g: r.bloom_hit for r in tagged.collect()}
    # no false negatives: every true member hits
    assert all(rows[f"key_{i}"] for i in range(150, 200))
    # merging a shard with itself changes nothing (union + distinct)
    merged = bloom.unionByName(bloom).distinct()
    assert merged.count() == bloom.count()
    # occupancy-based FPP is sane for this sizing
    bits = bloom.count()
    fpp = members.sparkSession.range(1).select(
        bloom_fpp(F.lit(bits), 1024, 3).alias("p")
    ).collect()[0].p
    assert 0.0 < fpp < 0.5


def test_bloom_split_build_equals_single_build(spark):
    from nyc_tlc_analytics_pipeline_spark.operators.sketch import bloom_build

    full = spark.createDataFrame([(f"k{i}",) for i in range(300)], "g string")
    a = full.filter("substring(g, 2, 10) % 2 = 0")
    b = full.filter("substring(g, 2, 10) % 2 = 1")
    whole = {r.pos for r in bloom_build(full, "g", m=512, k=3).collect()}
    sharded = {
        r.pos
        for r in bloom_build(a, "g", m=512, k=3)
        .unionByName(bloom_build(b, "g", m=512, k=3))
        .distinct()
        .collect()
    }
    assert whole == sharded
