"""Streaming near-duplicate ingest: the streaming face of the
incremental MinHash refresh (``dedup.incremental_minhash_classify``,
conformance q147).

Each document micro-batch is classified against the ACCUMULATED survivor
store — dup_vs_corpus / dup_in_batch / new — and only the survivors
(status ``new``) join the store and its persisted (doc, band, bucket)
LSH index, so the index a batch probes is exactly the set of documents
an offline keep-first dedup would have kept at that point in the
arrival order.  Per-batch cost is O(batch + candidate matches): the
probe is one (band, bucket) equi-join against the index and standing
text is only shingled for candidates (left-semi prune), never the whole
store — the property that lets a 100 TB corpus ingest continuously
instead of re-pairing weekly.

Exactly-once across at-least-once foreachBatch replays follows
``run_incremental_gold``'s manifest discipline: each of the three
stores (statuses, survivor docs, band index) commits the batch under an
idempotency tag, and the standing snapshot is filtered to
``__batch_id < current`` so a replay that finds some tables committed
and others not can never classify a batch against its own survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from ..core.pins import releasing
from ..operators import dedup
from ..sources.manifest import ManifestTable


def run_streaming_near_dup(
    doc_stream: DataFrame,
    status_path: str,
    docs_path: str,
    bands_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> None:
    """Drain ``doc_stream`` (availableNow) through the near-dup ingest.

    Writes three manifest tables: ``status_path`` — every input doc with
    its batch id and status; ``docs_path`` — the survivor store (the
    deduplicated corpus); ``bands_path`` — the survivors' LSH band
    index, the only thing future batches probe."""
    spark = doc_stream.sparkSession

    @releasing  # drop the dedup pins (core.pins) after each micro-batch
    def classify_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tag = f"batch-{batch_id:020d}"
        status_t = ManifestTable(spark, status_path)
        docs_t = ManifestTable(spark, docs_path)
        bands_t = ManifestTable(spark, bands_path)

        # replay-safe standing snapshot: strictly earlier batches only
        snap = docs_t.snapshot()
        if snap["dirs"]:
            standing = docs_t.read(version=snap["version"]).filter(
                col("__batch_id") < lit(batch_id)
            )
            standing_bands = (
                ManifestTable(spark, bands_path)
                .read()
                .filter(col("__batch_id") < lit(batch_id))
                .select("doc", "band", "bucket")
            )
        else:
            standing = batch_df.limit(0)
            standing_bands = None

        # a micro-batch is small by construction; classifying it uses it
        # several times (bands, shingles, within-batch pairs) — pin it
        batch_df = batch_df.localCheckpoint(eager=True)
        st = dedup.incremental_minhash_classify(
            batch_df,
            standing.drop("__batch_id"),
            id_col,
            text_col,
            n,
            num_hashes,
            bands,
            threshold,
            standing_bands=standing_bands,
        ).withColumn("__batch_id", lit(batch_id))
        st = st.localCheckpoint(eager=True)

        status_t.append(st.select(id_col, "status", "__batch_id"), tag=tag)
        survivors = st.filter(col("status") == "new").drop("status")
        docs_t.append(survivors, tag=tag)
        bands_t.append(
            dedup.lsh_band_table(
                survivors, id_col, text_col, n, num_hashes, bands
            ).withColumn("__batch_id", lit(batch_id)),
            tag=tag,
        )

    (
        doc_stream.writeStream.outputMode("append")
        .foreachBatch(classify_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def compact_near_dup_store(
    spark,
    docs_path: str,
    bands_path: str,
    status_path: str | None = None,
    target_partitions: int = 8,
) -> dict[str, int | None]:
    """Maintenance pass for the streaming near-dup stores: N micro-
    batches append N small file sets to each manifest table, and the
    band INDEX is the one every future batch's (band, bucket) probe
    reads — so its file count is a per-batch planning/IO tax that grows
    without bound unless compacted.  Rewrites each table's current
    snapshot into ``target_partitions`` files via
    ``ManifestTable.compact`` (CAS-protected: a concurrent ingest
    commit aborts the compaction, never loses rows; idempotency tags
    survive, so replay safety is untouched).

    The ``__batch_id`` column rides through the rewrite, so the
    replay-safe ``< current batch`` snapshot filter keeps working on a
    compacted store.  Returns {table: new_version_or_None} — None means
    the CAS lost to a concurrent writer (retry at a quiet moment)."""
    out: dict[str, int | None] = {}
    for name, path in (
        ("docs", docs_path),
        ("bands", bands_path),
        ("status", status_path),
    ):
        if path is None:
            continue
        out[name] = ManifestTable(spark, path).compact(target_partitions)
    return out


def run_streaming_embedding_near_dup(
    vec_stream: DataFrame,
    status_path: str,
    vecs_path: str,
    buckets_path: str,
    checkpoint_path: str,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> None:
    """Streaming face of the SEMANTIC incremental refresh
    (``dedup.incremental_embedding_classify``, conformance q163) — the
    embedding twin of :func:`run_streaming_near_dup` for the leaks
    lexical bands can't see (paraphrases, templated rewrites,
    re-encodes).

    Each vector micro-batch is classified against the accumulated
    survivor store (dup_vs_corpus / dup_in_batch / new) and only the
    survivors join the store and its persisted (doc, bucket) hyperplane
    index (``dedup.embedding_bucket_table``) — so the index a batch
    probes is exactly what an offline keep-first semantic dedup would
    have kept at that point in arrival order.  Per-batch cost matches
    the q163 contract: one bucket equi-join against the index, standing
    VECTORS fetched for candidate matches only (left-semi prune inside
    the classifier).  Replay idempotency follows the text twin: three
    manifest tables committed under one batch tag, standing snapshot
    filtered to strictly earlier batches."""
    spark = vec_stream.sparkSession

    @releasing  # drop the dedup pins (core.pins) after each micro-batch
    def classify_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tag = f"batch-{batch_id:020d}"
        status_t = ManifestTable(spark, status_path)
        vecs_t = ManifestTable(spark, vecs_path)
        buckets_t = ManifestTable(spark, buckets_path)

        # replay-safe standing snapshot: strictly earlier batches only
        snap = vecs_t.snapshot()
        if snap["dirs"]:
            standing = vecs_t.read(version=snap["version"]).filter(
                col("__batch_id") < lit(batch_id)
            )
            standing_buckets = (
                ManifestTable(spark, buckets_path)
                .read()
                .filter(col("__batch_id") < lit(batch_id))
                .select("doc", "bucket")
            )
        else:
            standing = batch_df.limit(0)
            standing_buckets = None

        batch_df = batch_df.localCheckpoint(eager=True)
        st = dedup.incremental_embedding_classify(
            batch_df,
            standing.drop("__batch_id"),
            planes,
            threshold,
            id_col,
            vec_col,
            standing_buckets=standing_buckets,
        ).withColumn("__batch_id", lit(batch_id))
        st = st.localCheckpoint(eager=True)

        status_t.append(st.select(id_col, "status", "__batch_id"), tag=tag)
        survivors = st.filter(col("status") == "new").drop("status")
        vecs_t.append(survivors, tag=tag)
        buckets_t.append(
            dedup.embedding_bucket_table(
                survivors, planes, id_col, vec_col
            ).withColumn("__batch_id", lit(batch_id)),
            tag=tag,
        )

    (
        vec_stream.writeStream.outputMode("append")
        .foreachBatch(classify_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_streaming_ivf_ingest(
    vec_stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Streaming maintenance of the IVF search index under FROZEN
    centroids — the ingest face of ``similarity.append_ivf_index``
    (q165).  Each vector micro-batch is assigned to its nearest frozen
    centroid and committed to a ManifestTable under the batch's
    idempotency tag, so an at-least-once foreachBatch replay can never
    double-insert (a raw ``mode=append`` parquet write would).  The
    parquet-partition-dir layout (``write_ivf_index`` +
    ``append_ivf_index``) stays the READ-optimized twin — compact the
    manifest into it periodically to get partition pruning back; this
    face trades directory pruning for exactly-once ingest, probing via
    a ``cid`` filter instead.  Staleness monitoring is unchanged:
    ``similarity.ivf_staleness_report`` over the manifest's resident
    vs fresh batches is the retrain alarm."""
    from ..operators.similarity import assign_ivf_bucket

    spark = vec_stream.sparkSession

    @releasing  # drop the dedup pins (core.pins) after each micro-batch
    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx = ManifestTable(spark, index_path)
        idx.append(
            batch_df.withColumn(
                "cid", assign_ivf_bucket(vec_col, centroids)
            ).withColumn("__batch_id", lit(batch_id)),
            tag=f"batch-{batch_id:020d}",
        )

    (
        vec_stream.writeStream.outputMode("append")
        .foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_streaming_segment_dedup(
    doc_stream: DataFrame,
    status_path: str,
    index_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_len: int = 8,
) -> None:
    """Streaming face of the incremental SEGMENT dedup
    (``dedup.incremental_segment_classify``, conformance q180): each
    micro-batch's fixed-width token segments classify against the
    ACCUMULATED segment-hash index — dup_vs_corpus / dup_in_batch /
    new — and only the NEW segments' hashes join the index, so the
    index a batch probes is exactly what an offline keep-first pass
    over the arrival order would have kept.  Per-batch cost is
    O(batch segments + matches): the probe is one hash equi-join, the
    standing corpus' text is never re-read.

    Exactly-once follows ``run_streaming_near_dup``'s manifest
    discipline: both stores commit under the batch idempotency tag and
    the standing snapshot filters to ``__batch_id < current``, so a
    replay can never classify a batch against its own appends."""
    spark = doc_stream.sparkSession

    @releasing  # drop the dedup pins (core.pins) after each micro-batch
    def classify_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tag = f"batch-{batch_id:020d}"
        status_t = ManifestTable(spark, status_path)
        index_t = ManifestTable(spark, index_path)

        snap = index_t.snapshot()
        if snap["dirs"]:
            standing_index = (
                index_t.read(version=snap["version"])
                .filter(col("__batch_id") < lit(batch_id))
                .select("seg_hash", "first_doc", "first_idx")
            )
        else:
            standing_index = (
                batch_df.sparkSession.createDataFrame(
                    [], "seg_hash string, first_doc long, first_idx int"
                )
            )

        batch_df = batch_df.localCheckpoint(eager=True)
        st = dedup.incremental_segment_classify(
            batch_df, standing_index, id_col, text_col, seg_len,
            group_col=None,  # the stores key on (id, seg_idx) only — any
            # (id, text) stream works, no lang column required
        ).withColumn("__batch_id", lit(batch_id))
        st = st.localCheckpoint(eager=True)

        status_t.append(
            st.select(id_col, "seg_idx", "status", "__batch_id"), tag=tag
        )
        index_t.append(
            st.filter(col("status") == "new").select(
                col("__h").alias("seg_hash"),
                col(id_col).alias("first_doc"),
                col("seg_idx").alias("first_idx"),
                "__batch_id",
            ),
            tag=tag,
        )

    (
        doc_stream.writeStream.outputMode("append")
        .foreachBatch(classify_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def compact_ivf_manifest_to_index(
    spark,
    manifest_path: str,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """The maintenance pass ``run_streaming_ivf_ingest`` promises:
    rewrite the exactly-once ingest manifest into the READ-optimized
    ``ivf_bucket=`` partition-dir layout (``similarity.write_ivf_index``
    's layout), restoring partition pruning for probes.  Assignments
    are taken AS COMMITTED (the frozen ``cid`` column) — compaction
    must never re-assign, or a concurrent centroid retrain would make
    the compacted index disagree with the manifest it replaced.

    One read of the manifest snapshot + one bucket-repartitioned write
    (each partition dir written by one task); returns the row count
    written.  The manifest keeps accepting batches while this runs —
    compaction is a snapshot copy, the streaming store stays the source
    of truth until the operator swaps probe paths."""
    snap = ManifestTable(spark, manifest_path)
    rows = snap.read().select(
        col(id_col), col(vec_col), col("cid").alias("ivf_bucket")
    )
    (
        rows.repartition(col("ivf_bucket"))
        .write.mode("overwrite")
        .partitionBy("ivf_bucket")
        .parquet(index_path)
    )
    return spark.read.parquet(index_path).count()
