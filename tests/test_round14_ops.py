"""Round-14 advisor-fix tests (ADVICE r13):

1. A completed increment whose band/segidx slices are MISSING (crash
   between inc_decontam's _SUCCESS and inc_append's slice writes, or a
   legacy increment predating stage_index) must still be visible to the
   standing indexes — `_standing_indexes` self-heals the slices from
   the increment's text, so a later batch repeating that content
   classifies duplicate_corpus instead of being appended twice.
2. The legacy (no persisted index) run_incremental path must judge a
   batch by the SAME fixed base-final bigram model as the indexed path
   — identical gate attribution for the same batch either way.
3. `incremental_segment_classify` must emit exactly ONE row per batch
   segment occurrence even when the standing index holds the same hash
   in several per-increment slices, on BOTH the small-batch broadcast
   path and the big-batch join path.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .conftest import SF_SMOKE


def _mk_batch(spark, tmp_path, name, rows):
    p = str(tmp_path / name)
    spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    ).write.parquet(p)
    return p


def _splice(standing_rows, a, b, c):
    # same off-grid splice recipe as test_round13_ops: in-model tokens,
    # sub-threshold overlap with any single parent, off the 8-token
    # segment grid
    return " ".join(
        standing_rows[a]["text"].split()[3:23]
        + standing_rows[b]["text"].split()[23:43]
        + standing_rows[c]["text"].split()[3:23]
    )


def test_missing_increment_slices_self_heal(spark, tmp_path, curate_job_copy):
    """Delete b1's band/segidx slices after it completed; batch 2
    repeating b1's novel content must STILL classify duplicate_corpus
    (pre-fix: the missing slices were silently skipped while the pool
    counted b1 as standing → the duplicate re-appended)."""
    job = curate_job_copy  # completed base run (session fixture copy)
    standing_rows = (
        spark.read.parquet(job.path("final")).orderBy("doc_id").limit(8)
        .collect()
    )
    novel1 = _splice(standing_rows, 2, 3, 4)
    b1 = _mk_batch(spark, tmp_path, "b1.parquet",
                   [(910001, "web", "en", novel1)])
    s1 = job.run_incremental(b1, batch_tag="b1")
    assert s1["appended"]["n_docs_appended"] == 1

    # simulate the crash-between-stages / legacy-increment state
    shutil.rmtree(job.path("increments/b1_bands"))
    shutil.rmtree(job.path("increments/b1_segidx"))

    b2 = _mk_batch(spark, tmp_path, "b2.parquet",
                   [(920001, "web", "en", novel1)])
    s2 = job.run_incremental(b2, batch_tag="b2")
    assert s2["gate"].get("duplicate_corpus", 0) == 1
    assert s2["gate"].get("kept", 0) == 0
    assert spark.read.parquet(job.path("increments/b2")).count() == 0
    # and the slices were healed back onto disk for the NEXT batch
    assert os.path.isfile(
        os.path.join(job.path("increments/b1_bands"), "_SUCCESS")
    )
    assert os.path.isfile(
        os.path.join(job.path("increments/b1_segidx"), "_SUCCESS")
    )


def test_legacy_path_same_fixed_model_as_indexed(spark, tmp_path, curate_job_copy):
    """Indexed run vs index-less copy of the SAME run state: one batch
    must get identical per-document gate attribution — the legacy path
    now fixes the bigram model on base `final` exactly like the indexed
    path (pre-fix it scored against the drifting final ∪ increments
    union)."""
    job = curate_job_copy  # completed base run (session fixture copy)
    standing_rows = (
        spark.read.parquet(job.path("final")).orderBy("doc_id").limit(8)
        .collect()
    )
    b1 = _mk_batch(spark, tmp_path, "b1.parquet",
                   [(910001, "web", "en", _splice(standing_rows, 2, 3, 4))])
    job.run_incremental(b1, batch_tag="b1")

    from nyc_tlc_analytics_pipeline_spark.curate import CurateJob

    out2 = str(tmp_path / "out2")
    shutil.copytree(job.out_dir, out2)
    shutil.rmtree(os.path.join(out2, "index"))
    job2 = CurateJob(
        spark, os.path.join(SF_SMOKE, "documents.parquet"), out2
    )

    batch = [
        (920001, "web", "en", _splice(standing_rows, 5, 6, 7)),
        (920002, "web", "en", _splice(standing_rows, 2, 3, 4)),  # dup of b1
        (920003, "web", "en", "zz qq xx vv " * 10),  # rules/ppl fodder
    ]
    b2a = _mk_batch(spark, tmp_path, "b2a.parquet", batch)
    b2b = _mk_batch(spark, tmp_path, "b2b.parquet", batch)
    job.run_incremental(b2a, batch_tag="b2")
    job2.run_incremental(b2b, batch_tag="b2")

    attr1 = {
        r["doc_id"]: r["stage"]
        for r in spark.read.parquet(
            job.path("increments/b2_attribution")
        ).collect()
    }
    attr2 = {
        r["doc_id"]: r["stage"]
        for r in spark.read.parquet(
            os.path.join(out2, "increments/b2_attribution")
        ).collect()
    }
    assert attr1 == attr2 and len(attr1) == 3
    assert attr1[920002] == "duplicate_corpus"


def test_segment_classify_one_row_per_occurrence_both_paths(spark):
    """Duplicate the index's hashes across 'slices' (union of the base
    index with itself): both join paths must still emit exactly one row
    per batch segment occurrence, with identical statuses."""
    from nyc_tlc_analytics_pipeline_spark.operators import dedup

    words = ("alpha bravo charlie delta echo foxtrot golf hotel "
             "india juliet kilo lima mike november oscar papa")
    standing = spark.createDataFrame(
        [(1, "en", words)], "doc_id long, lang string, text string"
    )
    batch = spark.createDataFrame(
        [(10, "en", words), (11, "en", words + " " + words)],
        "doc_id long, lang string, text string",
    )
    idx = dedup.segment_index_table(standing, "doc_id", "text", 8)
    doubled = idx.unionByName(idx)  # same hash in two "slices"

    def rows(small):
        return sorted(
            (r["doc_id"], r["seg_idx"], r["status"])
            for r in dedup.incremental_segment_classify(
                batch, doubled, "doc_id", "text", 8, small_batch=small
            ).collect()
        )

    big, small = rows(False), rows(True)
    assert big == small
    # doc 10: two 8-token segments, both already in the corpus — ONE
    # row each; doc 11: four segments, all dup (vs corpus)
    n_segs = {10: 2, 11: 4}
    from collections import Counter

    counts = Counter((d for d, _, _ in big))
    assert dict(counts) == n_segs
    assert all(s == "dup_vs_corpus" for _, _, s in big)
