"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns with a typed metadata struct — the
standard large-scale layout: bytes travel in parquet/iceberg row groups,
metadata is queryable without touching the payload (column pruning means a
metadata-only query never reads the bytes at all).

The decode / feature-extraction kernels are the only places Python touches
the data, so they run as Arrow-batched ``mapInPandas`` stages: one Python
worker per partition, zero-copy Arrow transfer, linear scale-out.

Codec support is format-tiered:

- **Real decoders, no external libs**: PPM/PGM images (pure numpy header
  + raster parsing) and WAV audio (stdlib ``wave``) are decoded for real
  — pixel means/sharpness, sample RMS/zero-crossings, nearest-neighbor
  resize with PPM re-encode all operate on actual payload bytes.
- **Feature-probed codecs**: if PIL (images) or soundfile (compressed
  audio) is importable, JPEG/PNG/... decode for real through the same
  kernels — the probe runs at module import, in the driver AND in each
  Python worker (kernels are pickled by reference and re-import this
  module), so no plumbing changes when the environment grows codecs.
- **Stubbed codecs**: with the libraries absent (this container), those
  paths raise ``NotImplementedError`` unless ``fake=True``, where a
  deterministic digest-derived fake exercises the full Spark plumbing —
  schema, batching, partitioning — for real.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
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

def _try_import(name: str):
    import importlib

    try:
        return importlib.import_module(name)
    except ImportError:
        return None


#: feature probes — evaluated wherever the module is imported (driver and
#: Python workers alike), so kernels pick up real codecs automatically
_PIL_IMAGE = _try_import("PIL.Image")
_SOUNDFILE = _try_import("soundfile")
_IMAGEIO = _try_import("imageio.v3")
HAS_PIL = _PIL_IMAGE is not None
HAS_SOUNDFILE = _SOUNDFILE is not None
HAS_IMAGEIO = _IMAGEIO is not None


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
# real codecs: PPM/PGM (pure numpy) and WAV (stdlib wave)
# --------------------------------------------------------------------------

def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse a binary PPM (P6, RGB) or PGM (P5, gray) payload into an
    (h, w, 3) / (h, w) uint8 array.  Pure numpy — no codec library."""
    if not payload[:2] in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM payload: {payload[:2]!r}")
    # header = magic, width, height, maxval — whitespace/comment separated
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval, then the raster
    w, h, maxval = int(fields[0]), int(fields[1]), int(fields[2])
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM/PGM supported, maxval={maxval}")
    channels = 3 if payload[:2] == b"P6" else 1
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels, offset=i)
    return raster.reshape((h, w, 3) if channels == 3 else (h, w))


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary P6 payload (inverse of :func:`decode_ppm`)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _image_stats(arr: np.ndarray) -> tuple[float, float, float, float]:
    """Channel means + sharpness (mean absolute 4-neighbor Laplacian of the
    gray plane — flat images score 0, edges/noise score high)."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    means = arr.reshape(-1, 3).mean(axis=0) / 255.0
    gray = arr.mean(axis=-1)
    if gray.shape[0] < 3 or gray.shape[1] < 3:
        sharp = 0.0
    else:
        lap = (
            4 * gray[1:-1, 1:-1]
            - gray[:-2, 1:-1]
            - gray[2:, 1:-1]
            - gray[1:-1, :-2]
            - gray[1:-1, 2:]
        )
        sharp = float(np.abs(lap).mean() / 255.0)
    return (float(means[0]), float(means[1]), float(means[2]), sharp)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV payload → (mono float32 samples in [-1, 1], sample_rate) via the
    stdlib ``wave`` reader (PCM 8/16/32-bit)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate, nch, width = f.getframerate(), f.getnchannels(), f.getsampwidth()
        raw = f.readframes(f.getnframes())
    dtype, scale = {1: (np.uint8, 128.0), 2: (np.int16, 32768.0), 4: (np.int32, 2147483648.0)}[width]
    x = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    if width == 1:
        x -= 128.0
    x /= scale
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


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

    PPM/PGM payloads are decoded FOR REAL (pure numpy); other formats
    need PIL/opencv, which are absent here — they raise
    NotImplementedError unless ``fake=True`` (deterministic digest-derived
    stats that exercise the identical batch/schema contract).  Usage:

        df.mapInPandas(decode_image_stub(fake=True), DECODED_IMAGE_SCHEMA)
    """

    def _decode(payload: bytes, fmt: str) -> tuple[float, float, float, float]:
        if fmt in ("ppm", "pgm"):
            return _image_stats(decode_ppm(bytes(payload)))
        if _PIL_IMAGE is not None:  # real codec when the env provides it
            with _PIL_IMAGE.open(io.BytesIO(bytes(payload))) as im:
                return _image_stats(np.asarray(im.convert("RGB")))
        if fake:
            return _fake_pixel_stats(payload)
        raise NotImplementedError(
            f"no codec for image format {fmt!r} in this environment; "
            "install PIL and multimodal.decode_image_stub uses it automatically"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [
                _decode(c, f) if c is not None else (None, None, None, None)
                for c, f in zip(pdf["content"], pdf["format"])
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


DECODED_AUDIO_SCHEMA = (
    "media_id long, format string, sample_rate int, n_samples long, "
    "duration_ms long, rms double, peak double, zero_crossing_rate double"
)


def decode_audio_kernel(fake: bool = False):
    """mapInPandas kernel: (media rows) → per-clip audio features.  WAV is
    decoded FOR REAL via the stdlib reader — duration, RMS loudness, peak,
    zero-crossing rate from actual samples; compressed formats (mp3/ogg)
    would need ffmpeg and follow the stub/fake contract."""

    def _sample_features(x: np.ndarray, rate: int):
        n = int(x.size)
        zcr = float(np.mean(np.diff(np.signbit(x)) != 0)) if n > 1 else 0.0
        return (
            rate,
            n,
            int(round(1000.0 * n / rate)) if rate else 0,
            float(np.sqrt(np.mean(x**2))) if n else 0.0,
            float(np.abs(x).max()) if n else 0.0,
            zcr,
        )

    def _features(payload: bytes, fmt: str):
        if fmt == "wav":
            return _sample_features(*decode_wav(bytes(payload)))
        if _SOUNDFILE is not None:  # real codec when the env provides it
            x, rate = _SOUNDFILE.read(
                io.BytesIO(bytes(payload)), dtype="float32"
            )
            if x.ndim > 1:
                x = x.mean(axis=1)
            return _sample_features(x, int(rate))
        if fake:
            d = hashlib.sha256(payload).digest()
            return (16000, 16000, 1000, d[0] / 255.0, d[1] / 255.0, d[2] / 255.0)
        raise NotImplementedError(
            f"no codec for audio format {fmt!r} in this environment; "
            "install soundfile and multimodal.decode_audio_kernel uses it "
            "automatically"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _features(c, f) if c is not None else (None,) * 6
                for c, f in zip(pdf["content"], pdf["format"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pdf["format"],
                    "sample_rate": [t[0] for t in feats],
                    "n_samples": [t[1] for t in feats],
                    "duration_ms": [t[2] for t in feats],
                    "rms": [t[3] for t in feats],
                    "peak": [t[4] for t in feats],
                    "zero_crossing_rate": [t[5] for t in feats],
                }
            )

    return kernel


RESIZED_IMAGE_SCHEMA = "media_id long, format string, width int, height int, content binary"


def resize_images_kernel(target_w: int, target_h: int):
    """mapInPandas kernel: PPM/PGM rows → nearest-neighbor-resized P6
    payloads — a REAL binary-in/binary-out media transform (the shape of
    every production resize stage): decode, numpy index-grid resample,
    re-encode.  Non-PPM rows pass through unchanged with their original
    dimensions so a mixed corpus doesn't fail mid-batch."""

    def _resize(arr: np.ndarray) -> np.ndarray:
        h, w = arr.shape[:2]
        rows = (np.arange(target_h) * h) // target_h
        cols = (np.arange(target_w) * w) // target_w
        out = arr[rows][:, cols]
        if out.ndim == 2:
            out = np.stack([out] * 3, axis=-1)
        return out

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "format": [], "width": [], "height": [], "content": [],
            }
            for _, row in pdf.iterrows():
                fmt, payload = row["format"], row["content"]
                if payload is not None and fmt in ("ppm", "pgm"):
                    resized = _resize(decode_ppm(bytes(payload)))
                    out["media_id"].append(row["media_id"])
                    out["format"].append("ppm")
                    out["width"].append(target_w)
                    out["height"].append(target_h)
                    out["content"].append(encode_ppm(resized))
                else:
                    out["media_id"].append(row["media_id"])
                    out["format"].append(fmt)
                    out["width"].append(row["width"])
                    out["height"].append(row["height"])
                    out["content"].append(payload)
            yield pd.DataFrame(out)

    return kernel


FRAME_SAMPLE_SCHEMA = "media_id long, frame_index int, frame_ts_ms long, frame_digest string"


def _real_video_frames(
    payload: bytes, every_ms: int
) -> list[tuple[int, int, str]]:
    """REAL frame sampling via imageio.v3 (ffmpeg/pyav/pillow backends,
    whichever the payload's container has a plugin for): stream frames,
    keep every ``round(fps · every_ms/1000)``-th, digest actual pixels.
    Streaming iteration — never materializes the whole video."""
    import io as _io

    try:
        meta = _IMAGEIO.immeta(_io.BytesIO(payload))
        fps = float(meta.get("fps") or 0.0)
    except Exception:  # noqa: BLE001 — containers without an fps field
        fps = 0.0
    if fps <= 0:
        fps = 1000.0 / max(every_ms, 1)  # no rate metadata: take all frames
    step = max(int(round(fps * every_ms / 1000.0)), 1)
    out: list[tuple[int, int, str]] = []
    for j, frame in enumerate(_IMAGEIO.imiter(_io.BytesIO(payload))):
        if j % step:
            continue
        ts = int(round(j * 1000.0 / fps))
        digest = hashlib.sha256(
            np.ascontiguousarray(frame).tobytes()
        ).hexdigest()[:16]
        out.append((j // step, ts, digest))
    return out


def sample_video_frames_stub(every_ms: int = 1000, fake: bool = False):
    """mapInPandas kernel: video rows → one row per sampled frame.
    Decode is feature-probed like the image/audio kernels (the PIL
    pattern): REAL frame extraction via imageio.v3 when the env
    provides it, the deterministic digest fake behind ``fake=True``
    otherwise, a loud NotImplementedError when neither applies.  The
    fan-out shape — one input row to N output rows inside Arrow
    batches — is identical on every path."""

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
                # fake=True is a CONTRACT (deterministic digest frames
                # for non-container payloads), not a fallback: it must
                # hold even when imageio IS importable, else merely
                # installing the media extra feeds fake payloads to the
                # real decoder which raises mid-task (ADVICE r12).
                if not fake and _IMAGEIO is not None:
                    for i, ts, digest in _real_video_frames(
                        bytes(row["content"]), every_ms
                    ):
                        out["media_id"].append(row["media_id"])
                        out["frame_index"].append(i)
                        out["frame_ts_ms"].append(ts)
                        out["frame_digest"].append(digest)
                    continue
                if not fake:
                    raise NotImplementedError(
                        "no video codec in this environment; install "
                        "imageio (+ffmpeg/pyav plugin) and multimodal."
                        "sample_video_frames_stub uses it automatically"
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


# ---------------------------------------------------------------------------
# Perceptual hashing + near-duplicate media detection
# ---------------------------------------------------------------------------

PHASH_SCHEMA = "media_id long, format string, phash long"


def average_phash(arr: np.ndarray, hash_size: int = 8) -> int:
    """Average-hash: block-mean downscale of the gray plane to
    ``hash_size²`` cells, 1 bit per cell (above/below the mean), packed
    row-major into an int.  Robust to re-encode/resize/small noise;
    near-duplicates differ in a few bits (Hamming distance)."""
    if arr.ndim == 3:
        arr = arr.mean(axis=-1)
    h, w = arr.shape
    ys = (np.arange(hash_size + 1) * h) // hash_size
    xs = (np.arange(hash_size + 1) * w) // hash_size
    cells = np.empty((hash_size, hash_size), dtype=np.float64)
    for i in range(hash_size):
        for j in range(hash_size):
            cells[i, j] = arr[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (cells > cells.mean()).reshape(-1)
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # interpret the 64-bit pattern as signed (Spark LongType)
    return v - (1 << 64) if v >= (1 << 63) else v


def phash_kernel(fake: bool = False, hash_size: int = 8):
    """mapInPandas kernel: media rows → (media_id, format, phash).
    PPM/PGM decode for real; other formats use PIL when present, else
    a digest-derived fake hash under ``fake=True`` (plumbing-only)."""

    def _hash(payload: bytes, fmt: str) -> int:
        if fmt in ("ppm", "pgm"):
            return average_phash(decode_ppm(bytes(payload)), hash_size)
        if _PIL_IMAGE is not None:
            with _PIL_IMAGE.open(io.BytesIO(bytes(payload))) as im:
                return average_phash(np.asarray(im.convert("RGB")), hash_size)
        if fake:
            d = hashlib.sha256(bytes(payload)).digest()
            return int.from_bytes(d[:8], "big", signed=True)
        raise NotImplementedError(
            f"no codec for image format {fmt!r} in this environment"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pdf["format"],
                    "phash": [
                        _hash(c, f) if c is not None else None
                        for c, f in zip(pdf["content"], pdf["format"])
                    ],
                }
            )

    return kernel


def near_dup_media_pairs(
    phashes: DataFrame,
    max_hamming: int = 6,
    n_bands: int = 8,
    allow_incomplete: bool = False,
) -> DataFrame:
    """Near-duplicate images by banded phash join — the multimodal face
    of the SimHash text pipeline (operators.dedup): split the 64-bit
    phash into ``n_bands`` bit-bands; within ``max_hamming`` ≤
    ``n_bands − 1`` total flipped bits, at least one band is untouched
    (pigeonhole), so candidates come from a band-value EQUI-join — no
    all-pairs stage at any scale.  Candidates verify with
    ``bit_count(xor)``; pairs dedupe on (a < b).

    Guarantee: complete ONLY for ``max_hamming < n_bands`` (hence the
    default 8 bands for the default hamming ≤ 6); a violating combo is
    rejected with ``ValueError`` rather than silently missing pairs
    whose flipped bits touch every band.  Pass
    ``allow_incomplete=True`` to run anyway as a recall/cost trade
    (fewer, longer bands → fewer candidates) — candidate volume grows
    with collision odds per shorter band, the standard LSH trade."""
    if max_hamming >= n_bands and not allow_incomplete:
        raise ValueError(
            f"banded join is only complete for max_hamming < n_bands "
            f"(got max_hamming={max_hamming}, n_bands={n_bands}); raise "
            f"n_bands or pass allow_incomplete=True for best-effort recall"
        )
    band_bits = 64 // n_bands
    mask = (1 << band_bits) - 1
    sides = []
    for side in ("a", "b"):
        bands = phashes.select(
            col("media_id").alias(side),
            col("phash").alias(f"ph_{side}"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            lit(i).alias("band"),
                            F.shiftrightunsigned(col("phash"), i * band_bits)
                            .bitwiseAND(lit(mask))
                            .alias("val"),
                        )
                        for i in range(n_bands)
                    ]
                )
            ).alias("bv"),
        ).select(side, f"ph_{side}", col("bv.band").alias("band"), col("bv.val").alias("val"))
        sides.append(bands)
    cand = (
        sides[0]
        .join(sides[1], ["band", "val"])
        .filter(col("a") < col("b"))
        .select("a", "b", "ph_a", "ph_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(col("ph_a").bitwiseXOR(col("ph_b")))
        )
        .filter(col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# ---------------------------------------------------------------------------
# audio fingerprint (chromaprint-flavored) — the WAV face of the phash
# ---------------------------------------------------------------------------

def audio_fingerprint(samples: np.ndarray, rate: int, grid: int = 8) -> int:
    """64-bit spectral fingerprint: split the signal into ``grid`` time
    segments × ``grid`` log-spaced frequency bands, 1 bit per cell
    (band energy above the fingerprint-wide mean), packed row-major —
    the audio analogue of :func:`average_phash`.  Energies are
    normalized per segment, so the fingerprint is volume-invariant;
    small additive noise flips only a few bits (Hamming-near dups).

    Pure numpy (rfft) on the DECODED samples — runs inside the Arrow
    kernel, never on the driver."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim > 1:
        x = x.mean(axis=-1)
    n = len(x)
    if n < grid * 2:
        x = np.pad(x, (0, grid * 2 - n))
        n = len(x)
    seg_edges = (np.arange(grid + 1) * n) // grid
    cells = np.empty((grid, grid), dtype=np.float64)
    for s in range(grid):
        seg = x[seg_edges[s] : seg_edges[s + 1]]
        spec = np.abs(np.fft.rfft(seg)) ** 2
        m = len(spec)
        # log-spaced band edges over [1, m): low bands narrow, high wide
        edges = np.unique(
            np.round(np.logspace(0, np.log10(max(m - 1, 2)), grid + 1)).astype(int)
        )
        while len(edges) < grid + 1:  # tiny segments: pad edge list
            edges = np.append(edges, edges[-1] + 1)
        tot = spec.sum() or 1.0
        for b in range(grid):
            lo, hi = edges[b], max(edges[b + 1], edges[b] + 1)
            cells[s, b] = spec[lo:hi].sum() / tot
    bits = (cells > cells.mean()).reshape(-1)
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def audio_fp_kernel(fake: bool = False, grid: int = 8):
    """mapInPandas kernel: media rows → (media_id, format, phash) with
    the spectral fingerprint in the ``phash`` column, so
    :func:`near_dup_media_pairs` works unchanged on audio (the banded
    hamming join is modality-agnostic).  WAV decodes for real;
    soundfile-supported formats when the lib exists; else fake-mode
    digest hashes (plumbing-only) or ``NotImplementedError``."""

    def _fp(payload: bytes, fmt: str) -> int:
        if fmt == "wav":
            samples, rate = decode_wav(bytes(payload))
            return audio_fingerprint(samples, rate, grid)
        if _SOUNDFILE is not None:
            data, rate = _SOUNDFILE.read(io.BytesIO(bytes(payload)))
            return audio_fingerprint(np.asarray(data), rate, grid)
        if fake:
            d = hashlib.sha256(bytes(payload)).digest()
            return int.from_bytes(d[:8], "big", signed=True)
        raise NotImplementedError(
            f"no codec for audio format {fmt!r} in this environment"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pdf["format"],
                    "phash": [
                        _fp(c, f) if c is not None else None
                        for c, f in zip(pdf["content"], pdf["format"])
                    ],
                }
            )

    return kernel
