"""Fixed-batch EMBEDDING incremental-refresh probe (q163's claimed
O(batch + matches) scale law, isolated): hold the increment CONSTANT
while the standing vector corpus grows 10x/100x, and time the refresh
against a PERSISTED (doc, bucket) hyperplane index — the production
steady state.  The embedding twin of probe_q147_fixed_batch.py.

The per-round q163 registration fixes batch = corpus/3, so its growth
probe conflates batch growth with corpus growth; this probe removes
the conflation.  The batch is a fixed slice of the BASE corpus (ids
shifted above every standing id); under bench.materialize_scaled the
scaled embedding copies keep their values (ids shift per copy), so the
batch finds cosine-matches in EVERY copy — match volume grows with the
corpus here, making this probe an upper bound on the pure
O(batch + matches) claim rather than its clean isolation (the verify
join is |matches|-sized by construction either way; what the probe
demonstrates is that the STANDING side is only ever touched through
the index + left-semi candidate fetch).

    BENCH_FIXED_SCALES=1,10,100 python scripts/probe_q163_fixed_batch.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SCALES = [
    int(s) for s in os.environ.get("BENCH_FIXED_SCALES", "1,10,100").split(",")
]
BATCH_VECS = int(os.environ.get("BENCH_FIXED_BATCH", "500"))
ID_SHIFT = 1 << 40  # far above any scaled standing id
THRESHOLD = 0.3


def main() -> int:
    from pyspark.sql import functions as F

    from bench import materialize_scaled
    from nyc_tlc_analytics_pipeline_spark.core.session import build_session
    from nyc_tlc_analytics_pipeline_spark.operators import dedup, similarity
    from nyc_tlc_analytics_pipeline_spark.sources.testdata import load_table

    spark = build_session(app_name="q163-fixed-batch", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    planes = similarity.random_hyperplanes(8, 64, seed=42)

    base = load_table(spark, SRC, "embeddings")
    batch = (
        base.filter(F.col("vec_id") < BATCH_VECS)
        .withColumn("vec_id", F.col("vec_id") + F.lit(ID_SHIFT))
        .localCheckpoint(eager=True)
    )

    def quiesce() -> None:
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.7)

    print(
        f"{'scale':>5s} {'standing':>10s} {'index build':>12s} "
        f"{'refresh cold':>13s} {'refresh warm':>13s}"
    )
    rows = []
    for scale in SCALES:
        sf_dir = SRC if scale == 1 else materialize_scaled(spark, SRC, scale)
        standing = load_table(spark, sf_dir, "embeddings")
        n_standing = standing.count()
        idx_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "..", ".bench_scaled", f"q163_idx_x{scale}",
        )
        quiesce()
        t0 = time.perf_counter()
        dedup.embedding_bucket_table(standing, planes).write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(idx_path)
        t_index = time.perf_counter() - t0

        def refresh() -> float:
            quiesce()
            t0 = time.perf_counter()
            dedup.incremental_embedding_report(
                batch,
                standing,
                planes,
                "label",
                threshold=THRESHOLD,
                standing_buckets=spark.read.parquet(idx_path),
            ).collect()
            return time.perf_counter() - t0

        t_cold = refresh()
        t_warm = refresh()
        print(
            f"{scale:5d} {n_standing:10d} {t_index:11.2f}s "
            f"{t_cold:12.2f}s {t_warm:12.2f}s",
            flush=True,
        )
        rows.append((scale, n_standing, t_index, t_cold, t_warm))

    base_warm = rows[0][4]
    for scale, n, ti, tc, tw in rows[1:]:
        print(
            f"refresh growth at {scale}x standing corpus: "
            f"{tw / base_warm:.2f}x (index build {ti:.1f}s amortized)"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
