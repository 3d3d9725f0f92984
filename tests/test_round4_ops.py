"""Round-4 extension operators: Count-Min sketch, weighted sampling,
TF-IDF group terms, duplicated-span stats — property tests beyond the
oracle parity gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_tlc_analytics_pipeline_spark.operators import dedup, retrieval, sampling, sketch


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

def _token_df(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], ["token"])


def test_cms_never_underestimates(spark):
    corpus = ["a"] * 50 + ["b"] * 20 + [f"x{i}" for i in range(200)]
    df = _token_df(spark, corpus)
    partials = sketch.cms_partials(df, "token", d=4, w=64)
    probes = spark.createDataFrame([("a", 50), ("b", 20), ("x0", 1)], ["token", "exact"])
    got = {r.token: r.cms_count for r in
           sketch.cms_estimate(partials, probes, "token", d=4, w=64).collect()}
    assert got["a"] >= 50 and got["b"] >= 20 and got["x0"] >= 1


def test_cms_absent_key_estimates_low(spark):
    """A key never inserted can only pick up collision mass — with a
    sparse sketch it must estimate 0."""
    df = _token_df(spark, [f"k{i}" for i in range(10)])
    partials = sketch.cms_partials(df, "token", d=4, w=256)
    probes = spark.createDataFrame([("never-seen",)], ["token"])
    got = sketch.cms_estimate(partials, probes, "token", d=4, w=256).collect()[0]
    assert got.cms_count <= 1


def test_cms_partials_merge_exactly(spark):
    """Shard the corpus, sketch each shard, union + sum-merge: the merged
    sketch must equal the single-pass sketch cell-for-cell (additive
    counts — the 100-TB incremental-rollup contract)."""
    corpus = [f"t{i % 37}" for i in range(500)]
    whole = _token_df(spark, corpus)
    s1 = _token_df(spark, corpus[:200])
    s2 = _token_df(spark, corpus[200:])
    one = sketch.cms_partials(whole, "token")
    merged = sketch.cms_merge(
        sketch.cms_partials(s1, "token").unionByName(
            sketch.cms_partials(s2, "token")
        )
    )
    k = lambda df: {(r.row_i, r.bucket): r.cnt for r in df.collect()}
    assert k(one) == k(merged)


def test_cms_sketch_is_model_sized(spark):
    df = _token_df(spark, [f"u{i}" for i in range(5000)])
    assert sketch.cms_partials(df, "token", d=4, w=64).count() <= 4 * 64


# ---------------------------------------------------------------------------
# weighted sampling
# ---------------------------------------------------------------------------

def test_weighted_sample_deterministic_and_k(spark):
    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(500)], ["id", "w"]
    )
    a = [r.id for r in sampling.weighted_sample(df, "id", "w", k=25).collect()]
    b = [r.id for r in
         sampling.weighted_sample(df.repartition(13), "id", "w", k=25).collect()]
    assert len(a) == 25 and a == b  # layout-independent, ordered identically


def test_weighted_sample_prefers_heavy_rows(spark):
    """1000 rows, 10 of them with 100× weight: the heavy rows must be
    overrepresented in a k=100 sample (probability of the contrary is
    astronomically small under E-S)."""
    rows = [(i, 100.0 if i < 10 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = {r.id for r in sampling.weighted_sample(df, "id", "w", k=100).collect()}
    assert len(got & set(range(10))) >= 7


def test_weighted_sample_excludes_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0)], ["id", "w"]
    )
    got = {r.id for r in sampling.weighted_sample(df, "id", "w", k=10).collect()}
    assert got == {1}


# ---------------------------------------------------------------------------
# TF-IDF group terms
# ---------------------------------------------------------------------------

def test_tfidf_surfaces_group_specific_terms(spark):
    df = spark.createDataFrame(
        [
            (1, "en", "shared words here plus unique apple apple apple"),
            (2, "en", "shared words here too"),
            (3, "de", "shared words here plus unique banane banane"),
            (4, "de", "shared words here also"),
        ],
        ["doc_id", "lang", "text"],
    )
    out = retrieval.tfidf_group_terms(df, "doc_id", "text", "lang", top_k=1)
    top = {r.lang: r.term for r in out.collect()}
    assert top == {"en": "apple", "de": "banane"}
    # corpus-wide terms have idf = ln(1) = 0 → never characteristic
    all_terms = {r.term for r in
                 retrieval.tfidf_group_terms(df, "doc_id", "text", "lang", 3).collect()}
    assert "shared" not in all_terms and "here" not in all_terms


# ---------------------------------------------------------------------------
# duplicated spans
# ---------------------------------------------------------------------------

def test_duplicated_span_stats_planted(spark):
    boiler = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [
            (1, "a", boiler + " tail alpha beta"),      # shares the 10-gram
            (2, "a", boiler + " tail gamma delta"),     # shares the 10-gram
            (3, "b", "totally unique text " + " ".join(f"w{i}" for i in range(12))),
        ],
        ["doc_id", "source", "text"],
    )
    out = {r.source: r for r in
           dedup.duplicated_span_stats(df, "doc_id", "text", n=10, group_col="source")
           .collect()}
    assert out["a"].total_dup_spans >= 2      # the shared span, both docs
    assert out["b"].total_dup_spans == 0
    assert out["b"].avg_dup_frac == 0.0
    assert out["a"].avg_dup_frac > 0


# ---------------------------------------------------------------------------
# column profiler
# ---------------------------------------------------------------------------

def test_profile_columns_values(spark):
    from nyc_tlc_analytics_pipeline_spark.operators import profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (None, "a")],
        "id int, s string",
    )
    out = {r.column_name: r for r in profile.profile_columns(df).collect()}
    assert out["id"].n_rows == 4 and out["id"].n_nulls == 1
    assert out["id"].n_distinct == 3
    assert out["id"].min_value == "1" and out["id"].max_value == "3"
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2


def test_profile_is_single_pass(spark, tmp_path):
    """The profiler must scan the table ONCE however many columns it
    profiles — one FileScan in the plan, not one per column."""
    from nyc_tlc_analytics_pipeline_spark.operators import profile

    p = str(tmp_path / "t")
    spark.range(100).selectExpr("id", "id % 7 AS a", "CAST(id AS STRING) AS b")\
        .write.parquet(p)
    df = spark.read.parquet(p)
    plan = profile.profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1


def test_zipf_slope_near_minus_one_on_zipfian_corpus(spark):
    """A corpus whose token frequencies are constructed 1/r-Zipfian must
    fit slope ≈ −1 with high R² — the diagnostic's calibration check."""
    rows = []
    for r in range(1, 101):
        rows += [(f"tok{r}",)] * max(1, int(1000 / r))
    toks = spark.createDataFrame(rows, ["token"])
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    freq = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    ranked = freq.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.col("cnt").desc(), "token"))
    )
    fit = ranked.agg(
        F.regr_slope(F.log("cnt"), F.log("rank")).alias("s"),
        F.regr_r2(F.log("cnt"), F.log("rank")).alias("r2"),
    ).collect()[0]
    assert abs(fit.s + 1.0) < 0.05 and fit.r2 > 0.99


def test_coverage_sample_spans_buckets_and_is_deterministic(spark):
    """Coverage sampling must pick from EVERY occupied bucket (mode
    coverage, not density), cap per-bucket membership, and select the
    same rows under any partitioning."""
    import numpy as np

    from nyc_tlc_analytics_pipeline_spark.operators import sampling, similarity

    rng = np.random.default_rng(11)
    base = rng.standard_normal((400, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(400)],
        "vec_id long, embedding array<double>",
    )
    planes = similarity.random_hyperplanes(6, 16, seed=5)
    out = sampling.coverage_sample(df, "vec_id", "embedding", planes, per_bucket=1)
    rows = out.collect()
    all_buckets = {
        r.bucket
        for r in df.withColumn(
            "bucket", similarity.lsh_bucket("embedding", planes)
        ).select("bucket").distinct().collect()
    }
    assert {r.bucket for r in rows} == all_buckets      # every mode covered
    assert len(rows) == len(all_buckets)                # exactly one per bucket
    again = sampling.coverage_sample(
        df.repartition(9), "vec_id", "embedding", planes, per_bucket=1
    ).collect()
    assert {r.vec_id for r in rows} == {r.vec_id for r in again}


def test_weighted_sample_discriminates_at_large_weights(spark):
    """Regression: the direct u^(1/w) key rounds to a handful of levels
    once w is in the thousands (all keys in [0.995, 1)), letting the id
    tie-break decide the sample.  The log-domain key must keep
    discriminating: with ALL weights equal and large, selection must
    follow the hash order, not ascending ids."""
    df = spark.createDataFrame(
        [(i, 50000.0) for i in range(2000)], ["id", "w"]
    )
    got = [r.id for r in sampling.weighted_sample(df, "id", "w", k=50).collect()]
    assert got != sorted(got) or set(got) != set(range(50)), (
        "selection degenerated to ascending ids — key collapsed"
    )
    # distinct es_keys: the ranking is still informative
    keys = [r.es_key for r in sampling.weighted_sample(df, "id", "w", k=50).collect()]
    assert len(set(keys)) > 40
