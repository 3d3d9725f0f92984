"""Round-10 regression tests — the round-9 advisor items.

1. semantic_contamination: zero-norm vectors score cosine 0.0 in BOTH
   kernels (the IEEE 0/0=NaN alternative makes argmax and the
   contaminated predicate engine-dependent).
2. semantic_contamination arrow kernel: id column types derive from the
   input schemas — string doc ids work like longs.
3. auto_n_planes: result clamps to max_planes even when base is
   misconfigured above the cap.
"""

from __future__ import annotations

import os



def test_auto_n_planes_clamped_when_base_exceeds_cap():
    from nyc_tlc_analytics_pipeline_spark.operators import similarity

    # misconfigured caller: base above the cap -> clamp, don't exceed
    assert similarity.auto_n_planes(1, base=30, max_planes=24) == 24
    assert (
        similarity.auto_n_planes(1 << 40, base=30, max_planes=24) == 24
    )
    # unaffected normal path
    assert similarity.auto_n_planes(2048) == 4
    assert similarity.auto_n_planes(2048 * 2**30) == 24


def _roundtrip(spark, tmp_path, name, rows, schema):
    # parquet round-trip: local frames have no size estimate and the
    # reference-corpus gate correctly fails closed on them
    p = os.path.join(str(tmp_path), name)
    spark.createDataFrame(rows, schema).write.parquet(p)
    return spark.read.parquet(p)


def test_semantic_contamination_zero_norm_convention(spark, tmp_path):
    """A zero-norm corpus vector and a zero-norm bench vector must both
    score cosine 0.0 — identically in the arrow and expr kernels."""
    from nyc_tlc_analytics_pipeline_spark.operators import decontam

    bench = _roundtrip(
        spark,
        tmp_path,
        "bench",
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = _roundtrip(
        spark,
        tmp_path,
        "corpus",
        [
            (1, [0.0, 0.0, 0.0]),  # zero-norm corpus vector
            (2, [2.0, 0.0, 0.0]),  # exact match of bench 100
            (3, [0.0, 3.0, 0.0]),  # orthogonal to bench 100
        ],
        "vec_id long, embedding array<double>",
    )
    a = {
        r.vec_id: r
        for r in decontam.semantic_contamination(
            corpus, bench, 0.5, kernel="arrow"
        ).collect()
    }
    e = {
        r.vec_id: r
        for r in decontam.semantic_contamination(
            corpus, bench, 0.5, kernel="expr"
        ).collect()
    }
    for got in (a, e):
        # zero-norm corpus vector: cos 0.0 everywhere, smallest bid wins
        assert got[1].max_cos == 0.0
        assert got[1].nearest_bench == 100
        assert not got[1].contaminated
        # normal vector: zero-norm BENCH vector contributes 0.0, not NaN
        assert got[2].max_cos == 1.0 and got[2].nearest_bench == 100
        assert got[3].max_cos == 0.0 and got[3].nearest_bench == 100
    assert sorted(map(tuple, a.values())) == sorted(map(tuple, e.values()))


def test_semantic_contamination_string_ids_arrow(spark, tmp_path):
    """The arrow kernel derives id types from the schemas: string doc
    ids must come back as strings with correct attribution."""
    from nyc_tlc_analytics_pipeline_spark.operators import decontam

    bench = _roundtrip(
        spark,
        tmp_path,
        "bench_s",
        [("b-a", [1.0, 0.0]), ("b-b", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    corpus = _roundtrip(
        spark,
        tmp_path,
        "corpus_s",
        [("d-1", [2.0, 0.0]), ("d-2", [1.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    out = decontam.semantic_contamination(corpus, bench, 0.9, kernel="arrow")
    assert dict(out.dtypes)["vec_id"] == "string"
    assert dict(out.dtypes)["nearest_bench"] == "string"
    got = {r.vec_id: r for r in out.collect()}
    assert got["d-1"].max_cos == 1.0
    assert got["d-1"].nearest_bench == "b-a" and got["d-1"].contaminated
    # tie between b-a and b-b at cos ~0.707107 -> smallest bid
    assert got["d-2"].nearest_bench == "b-a"
    assert not got["d-2"].contaminated
