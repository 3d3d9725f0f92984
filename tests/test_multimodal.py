"""Multimodal column plumbing tests: schema, Arrow-batched kernels,
fan-out shape, metadata-only pruning, exact media dedup."""

from __future__ import annotations

import hashlib

import pytest

from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
    DECODED_IMAGE_SCHEMA,
    FRAME_SAMPLE_SCHEMA,
    MEDIA_SCHEMA,
    attach_content_metadata,
    decode_image_stub,
    dedup_media_exact,
    media_stats_by_kind,
    sample_video_frames_stub,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "png", 64, 64, None, b"\x89PNG-fake-payload-1"),
        (2, "image", "jpeg", 128, 96, None, b"\xff\xd8-fake-payload-2"),
        (3, "image", "png", 64, 64, None, b"\x89PNG-fake-payload-1"),  # dup of 1
        (4, "audio", "wav", None, None, 4_000, b"RIFF-fake-audio"),
        (5, "video", "mp4", 640, 360, 3_500, b"ftyp-fake-video"),
        (6, "image", "png", 32, 32, None, None),  # null payload
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_content_metadata(media):
    got = {r.media_id: r for r in attach_content_metadata(media).collect()}
    assert got[1].content_bytes == len(b"\x89PNG-fake-payload-1")
    assert got[1].content_sha256 == hashlib.sha256(b"\x89PNG-fake-payload-1").hexdigest()
    assert got[6].content_bytes is None


def test_exact_media_dedup(media):
    kept = dedup_media_exact(media.filter("content IS NOT NULL"))
    assert kept.count() == 4  # rows 1/3 collapse


def test_fake_image_decode_kernel(media):
    out = media.filter("kind = 'image'").mapInPandas(
        decode_image_stub(fake=True), DECODED_IMAGE_SCHEMA
    )
    rows = {r.media_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 6}
    d = hashlib.sha256(b"\x89PNG-fake-payload-1").digest()
    assert rows[1].mean_r == pytest.approx(d[0] / 255.0)
    assert rows[1].mean_r == rows[3].mean_r  # identical payload, identical stats
    assert rows[6].mean_r is None  # null payload propagates


def test_real_decode_raises_not_implemented(media):
    out = media.filter("media_id = 1").mapInPandas(
        decode_image_stub(fake=False), DECODED_IMAGE_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        out.collect()


def test_frame_sampling_fanout(media):
    out = media.mapInPandas(sample_video_frames_stub(every_ms=1000, fake=True), FRAME_SAMPLE_SCHEMA)
    rows = out.collect()
    # 3500ms video sampled at 1000ms → frames at 0,1000,2000,3000
    assert [r.frame_ts_ms for r in rows] == [0, 1000, 2000, 3000]
    assert all(r.media_id == 5 for r in rows)
    assert len({r.frame_digest for r in rows}) == 4


def test_metadata_rollup_prunes_content(media, tmp_path):
    """media_stats_by_kind must NOT read the binary payload: its scan's
    ReadSchema excludes content, with byte totals coming from the
    content_bytes metadata column written at ingest."""
    path = str(tmp_path / "media")
    attach_content_metadata(media).write.parquet(path)
    df = media.sparkSession.read.parquet(path)
    agg = media_stats_by_kind(df)
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "content:binary" not in plan  # the payload column is pruned
    assert "content_bytes" in plan  # totals come from the metadata column
    got = {(r.kind, r.format): r for r in agg.collect()}
    assert got[("image", "png")].total_bytes == len(b"\x89PNG-fake-payload-1") * 2
    assert got[("audio", "wav")].total_bytes == len(b"RIFF-fake-audio")


def test_metadata_rollup_without_content_bytes_stays_metadata_only(media):
    """Inputs that predate attach_content_metadata get NULL totals instead
    of a silent full payload read."""
    agg = media_stats_by_kind(media)
    rows = {(r.kind, r.format): r for r in agg.collect()}
    assert all(r.total_bytes is None for r in rows.values())
    assert rows[("image", "png")].n_items == 3
