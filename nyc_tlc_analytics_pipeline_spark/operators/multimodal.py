"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns with a typed metadata struct — the
standard large-scale layout: bytes travel in parquet/iceberg row groups,
metadata is queryable without touching the payload (column pruning means a
metadata-only query never reads the bytes at all).

The decode / feature-extraction kernels are the only places Python touches
the data, so they run as Arrow-batched ``mapInPandas`` stages: one Python
worker per partition, zero-copy Arrow transfer, linear scale-out.  The
actual codec calls (PIL/librosa/ffmpeg) are NOT available in this
container, so the kernel bodies are stubbed: ``decode_image_stub`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (bytes → pseudo pixel stats) exercises the full
Spark plumbing — schema, batching, partitioning — for real.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("format", StringType()),  # png, jpeg, wav, mp4, ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("content", BinaryType()),
    ]
)


def attach_content_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap byte-level metadata derivable without decoding: size, digest.
    Pure JVM expressions — the scan stays codegen'd."""
    return df.withColumns(
        {
            "content_bytes": F.length(col(content_col)),
            "content_sha256": F.sha2(col(content_col), 256),
        }
    )


def dedup_media_exact(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Exact media dedup on the payload digest — identical plan shape to
    text fingerprint dedup (hash groupBy; uniform key, no skew)."""
    digest = F.sha2(col(content_col), 256)
    return df.withColumn("_digest", digest).dropDuplicates(["_digest"]).drop("_digest")


# --------------------------------------------------------------------------
# decode / feature-extract kernels (mapInPandas)
# --------------------------------------------------------------------------

DECODED_IMAGE_SCHEMA = (
    "media_id long, format string, width int, height int, "
    "mean_r double, mean_g double, mean_b double, sharpness double"
)


def _fake_pixel_stats(payload: bytes) -> tuple[float, float, float, float]:
    """Deterministic fake 'decode': derives pseudo pixel statistics from a
    digest of the bytes.  Stands in for PIL so the Spark-side contract
    (batch shape, schema, null handling) is fully testable."""
    d = hashlib.sha256(payload).digest()
    return (d[0] / 255.0, d[1] / 255.0, d[2] / 255.0, d[3] / 255.0)


def decode_image_stub(fake: bool = False):
    """Returns a mapInPandas kernel: (media rows) → per-image pixel stats.

    With ``fake=False`` this raises NotImplementedError at first batch —
    the real implementation drops PIL into `_decode`. Usage:

        df.mapInPandas(decode_image_stub(fake=True), DECODED_IMAGE_SCHEMA)
    """

    def _decode(payload: bytes) -> tuple[float, float, float, float]:
        if fake:
            return _fake_pixel_stats(payload)
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "plug PIL/opencv into multimodal.decode_image_stub"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [
                _decode(c) if c is not None else (None, None, None, None)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pdf["format"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "mean_r": [s[0] for s in stats],
                    "mean_g": [s[1] for s in stats],
                    "mean_b": [s[2] for s in stats],
                    "sharpness": [s[3] for s in stats],
                }
            )

    return kernel


FRAME_SAMPLE_SCHEMA = "media_id long, frame_index int, frame_ts_ms long, frame_digest string"


def sample_video_frames_stub(every_ms: int = 1000, fake: bool = False):
    """mapInPandas kernel: video rows → one row per sampled frame
    (frame extraction itself is stubbed; the fan-out shape — one input row
    to N output rows inside Arrow batches — is the real contract)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "frame_index": [],
                "frame_ts_ms": [],
                "frame_digest": [],
            }
            for _, row in pdf.iterrows():
                if row["kind"] != "video" or row["content"] is None:
                    continue
                if not fake:
                    raise NotImplementedError(
                        "video codecs are not available; plug ffmpeg into "
                        "multimodal.sample_video_frames_stub"
                    )
                duration = int(row["duration_ms"] or 0)
                for i, ts in enumerate(range(0, max(duration, 1), every_ms)):
                    digest = hashlib.sha256(
                        bytes(row["content"]) + i.to_bytes(4, "big")
                    ).hexdigest()[:16]
                    out["media_id"].append(row["media_id"])
                    out["frame_index"].append(i)
                    out["frame_ts_ms"].append(ts)
                    out["frame_digest"].append(digest)
            yield pd.DataFrame(out)

    return kernel


def media_stats_by_kind(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — never touches the binary column, so the
    parquet reader prunes it (verify via ReadSchema in explain).

    Byte totals come from the ``content_bytes`` metadata column
    (:func:`attach_content_metadata` writes it at ingest); if the input
    predates that column it is aggregated as NULL rather than silently
    forcing a full payload read — reading ``length(content)`` here would
    break the pruning guarantee this operator exists for."""
    size_col = (
        F.sum("content_bytes")
        if "content_bytes" in df.columns
        else F.lit(None).cast("bigint")
    )
    return (
        df.groupBy("kind", "format")
        .agg(
            F.count("*").alias("n_items"),
            size_col.alias("total_bytes"),
            F.avg("width").alias("avg_width"),
            F.avg("height").alias("avg_height"),
            F.avg("duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("kind", "format")
    )
