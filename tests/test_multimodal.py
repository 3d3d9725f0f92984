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
    from nyc_tlc_analytics_pipeline_spark.operators import multimodal

    if multimodal.HAS_PIL:
        pytest.skip("PIL present: non-PPM formats decode for real")
    out = media.filter("media_id = 1").mapInPandas(
        decode_image_stub(fake=False), DECODED_IMAGE_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        out.collect()


def test_frame_sampling_fanout(media):
    from nyc_tlc_analytics_pipeline_spark.operators import multimodal

    if multimodal.HAS_IMAGEIO:
        pytest.skip(
            "imageio present: video decodes for real (fake payloads are "
            "not a container); the real path is covered by "
            "test_real_video_perturbed_copy_detection"
        )
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

# --------------------------------------------------------------------------
# REAL codecs: PPM/PGM images (pure numpy) and WAV audio (stdlib wave)
# --------------------------------------------------------------------------

def _make_ppm(w, h, rgb):
    import numpy as np

    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import encode_ppm

    arr = np.zeros((h, w, 3), dtype=np.uint8)
    arr[:, :] = rgb
    return encode_ppm(arr), arr


def _make_wav(freq_hz=440, rate=8000, secs=0.5, amp=0.5):
    import io
    import wave

    import numpy as np

    t = np.arange(int(rate * secs)) / rate
    x = (amp * np.sin(2 * np.pi * freq_hz * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(x.tobytes())
    return buf.getvalue()


def test_ppm_roundtrip_and_comment_header():
    import numpy as np

    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(arr)) == arr).all()
    with_comment = b"P6\n# a comment\n7 5\n255\n" + arr.tobytes()
    assert (decode_ppm(with_comment) == arr).all()


def test_real_ppm_decode_through_spark(spark):
    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
        DECODED_IMAGE_SCHEMA,
        MEDIA_SCHEMA,
        decode_image_stub,
    )

    red, _ = _make_ppm(8, 6, (255, 0, 0))
    import numpy as np

    rng = np.random.default_rng(7)
    noisy_arr = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import encode_ppm

    df = spark.createDataFrame(
        [
            (1, "image", "ppm", 8, 6, None, red),
            (2, "image", "ppm", 8, 6, None, encode_ppm(noisy_arr)),
        ],
        MEDIA_SCHEMA,
    )
    # fake=False: ppm MUST decode for real, no stub fallback involved
    rows = {
        r.media_id: r
        for r in df.mapInPandas(decode_image_stub(), DECODED_IMAGE_SCHEMA).collect()
    }
    assert rows[1].mean_r == pytest.approx(1.0)
    assert rows[1].mean_g == pytest.approx(0.0)
    assert rows[1].sharpness == pytest.approx(0.0)  # flat image, no edges
    exp = noisy_arr.reshape(-1, 3).mean(axis=0) / 255.0
    assert rows[2].mean_r == pytest.approx(exp[0])
    assert rows[2].sharpness > 0.05  # noise has strong Laplacian response


def test_real_wav_decode_through_spark(spark):
    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
        DECODED_AUDIO_SCHEMA,
        MEDIA_SCHEMA,
        decode_audio_kernel,
    )

    wav = _make_wav(freq_hz=440, rate=8000, secs=0.5, amp=0.5)
    df = spark.createDataFrame(
        [(1, "audio", "wav", None, None, None, wav)], MEDIA_SCHEMA
    )
    r = df.mapInPandas(decode_audio_kernel(), DECODED_AUDIO_SCHEMA).head()
    assert r.sample_rate == 8000
    assert r.n_samples == 4000
    assert r.duration_ms == 500
    assert r.rms == pytest.approx(0.5 / 2**0.5, rel=1e-3)  # sine RMS = A/sqrt(2)
    assert r.peak == pytest.approx(0.5, rel=1e-3)
    # a 440 Hz sine crosses zero 2*440 times/sec
    assert r.zero_crossing_rate == pytest.approx(2 * 440 / 8000, rel=0.02)


def test_resize_kernel_real_end_to_end(spark):
    import numpy as np

    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        RESIZED_IMAGE_SCHEMA,
        decode_ppm,
        resize_images_kernel,
    )

    # left half black, right half white → resize must preserve the split
    arr = np.zeros((16, 16, 3), dtype=np.uint8)
    arr[:, 8:] = 255
    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import encode_ppm

    df = spark.createDataFrame(
        [
            (1, "image", "ppm", 16, 16, None, encode_ppm(arr)),
            (2, "image", "jpeg", 64, 64, None, b"\xff\xd8not-a-real-jpeg"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {
        r.media_id: r
        for r in df.mapInPandas(resize_images_kernel(4, 4), RESIZED_IMAGE_SCHEMA).collect()
    }
    small = decode_ppm(bytes(rows[1].content))
    assert small.shape == (4, 4, 3)
    assert (small[:, :2] == 0).all() and (small[:, 2:] == 255).all()
    # non-ppm passes through untouched
    assert bytes(rows[2].content) == b"\xff\xd8not-a-real-jpeg"
    assert rows[2].width == 64


def test_pil_codec_auto_detected_through_spark(spark):
    """When PIL is importable (feature probe), PNG/JPEG decode for REAL
    through the same mapInPandas kernel — auto-skips where PIL is absent
    (this container), runs unchanged where the environment grows it."""
    from nyc_tlc_analytics_pipeline_spark.operators import multimodal

    if not multimodal.HAS_PIL:
        pytest.skip("PIL absent: probe leaves the stub contract in place")
    import io

    import numpy as np

    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
        _image_stats,
    )

    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    arr[:, 4:] = 200
    im = multimodal._PIL_IMAGE.fromarray(arr)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, "image", "png", 8, 8, None, buf.getvalue())], MEDIA_SCHEMA
    )
    row = df.mapInPandas(
        decode_image_stub(fake=False), DECODED_IMAGE_SCHEMA
    ).collect()[0]
    want = _image_stats(arr)
    assert abs(row.mean_r - want[0]) < 1e-9
    assert abs(row.sharpness - want[3]) < 1e-9


def test_soundfile_codec_auto_detected_through_spark(spark):
    """When soundfile is importable, compressed audio decodes for real
    through decode_audio_kernel — auto-skips where the lib is absent."""
    from nyc_tlc_analytics_pipeline_spark.operators import multimodal

    if not multimodal.HAS_SOUNDFILE:
        pytest.skip("soundfile absent: probe leaves the stub contract")
    import io

    import numpy as np

    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
        DECODED_AUDIO_SCHEMA,
        decode_audio_kernel,
    )

    rate, secs = 8000, 0.25
    t = np.arange(int(rate * secs)) / rate
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype("float32")
    buf = io.BytesIO()
    multimodal._SOUNDFILE.write(buf, x, rate, format="OGG")
    df = spark.createDataFrame(
        [(1, "audio", "ogg", None, None, 250, buf.getvalue())], MEDIA_SCHEMA
    )
    row = df.mapInPandas(
        decode_audio_kernel(fake=False), DECODED_AUDIO_SCHEMA
    ).collect()[0]
    assert row.sample_rate == rate
    assert abs(row.rms - float(np.sqrt(np.mean(x**2)))) < 0.05


def test_phash_near_dup_detects_perturbed_copy(spark):
    import numpy as np

    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
        PHASH_SCHEMA,
        encode_ppm,
        near_dup_media_pairs,
        phash_kernel,
    )

    rng = np.random.RandomState(3)
    base = rng.randint(0, 256, size=(32, 32, 3)).astype("uint8")
    noisy = base.copy()
    noisy[:2, :2] = 255 - noisy[:2, :2]  # tiny perturbation
    other = rng.randint(0, 256, size=(32, 32, 3)).astype("uint8")
    df = spark.createDataFrame(
        [
            (1, "ppm", bytearray(encode_ppm(base))),
            (2, "ppm", bytearray(encode_ppm(noisy))),
            (3, "ppm", bytearray(encode_ppm(other))),
        ],
        "media_id long, format string, content binary",
    )
    ph = df.mapInPandas(phash_kernel(), PHASH_SCHEMA)
    pairs = {(r.a, r.b) for r in near_dup_media_pairs(ph, max_hamming=3).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_phash_identical_payloads_hamming_zero(spark):
    import numpy as np

    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
        average_phash,
        decode_ppm,
        encode_ppm,
    )

    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, size=(16, 24, 3)).astype("uint8")
    # phash survives the PPM encode/decode roundtrip bit-for-bit
    assert average_phash(arr) == average_phash(decode_ppm(encode_ppm(arr)))


def test_phash_banded_join_is_equi_join_not_cartesian(spark):
    import numpy as np

    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
        PHASH_SCHEMA,
        encode_ppm,
        near_dup_media_pairs,
        phash_kernel,
    )

    rng = np.random.RandomState(9)
    rows = [
        (i, "ppm", bytearray(encode_ppm(rng.randint(0, 256, size=(8, 8, 3)).astype("uint8"))))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "media_id long, format string, content binary")
    ph = df.mapInPandas(phash_kernel(), PHASH_SCHEMA)
    plan = (
        near_dup_media_pairs(ph, max_hamming=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _make_mix_wav(freqs, rate=8000, secs=0.5, amp=0.3, noise=0.0, seed=0):
    import io
    import wave

    import numpy as np

    rng = np.random.RandomState(seed)
    t = np.arange(int(rate * secs)) / rate
    x = sum(np.sin(2 * np.pi * f * t) for f in freqs) * amp / len(freqs)
    if noise:
        x = x + rng.normal(0, noise, len(t))
    pcm = np.clip(x * 32767, -32768, 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_audio_fingerprint_volume_invariant_and_discriminative():
    import numpy as np

    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
        audio_fingerprint,
        decode_wav,
    )

    a, _ = decode_wav(_make_mix_wav((440, 1200), amp=0.3))
    loud, _ = decode_wav(_make_mix_wav((440, 1200), amp=0.9))
    other, _ = decode_wav(_make_mix_wav((523, 2000, 3100)))
    fa = audio_fingerprint(a, 8000)
    assert fa == audio_fingerprint(a, 8000)  # deterministic
    ham_loud = bin((fa ^ audio_fingerprint(loud, 8000)) & (2**64 - 1)).count("1")
    ham_other = bin((fa ^ audio_fingerprint(other, 8000)) & (2**64 - 1)).count("1")
    assert ham_loud <= 4  # volume change barely moves the fingerprint
    assert ham_other > 10  # different content is far


def test_audio_near_dup_via_banded_join(spark):
    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
        PHASH_SCHEMA,
        audio_fp_kernel,
        near_dup_media_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "wav", bytearray(_make_mix_wav((440, 1200)))),
            (2, "wav", bytearray(_make_mix_wav((440, 1200), noise=0.004, seed=7))),
            (3, "wav", bytearray(_make_mix_wav((523, 2000, 3100)))),
        ],
        "media_id long, format string, content binary",
    )
    fp = df.mapInPandas(audio_fp_kernel(), PHASH_SCHEMA)
    pairs = {(r.a, r.b) for r in near_dup_media_pairs(fp, max_hamming=6).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


@pytest.mark.skipif(
    not __import__(
        "nyc_tlc_analytics_pipeline_spark.operators.multimodal",
        fromlist=["HAS_PIL"],
    ).HAS_PIL,
    reason="PIL not installed — JPEG decode path needs a real codec",
)
def test_phash_near_dup_detects_perturbed_copy_real_jpeg(spark):
    """The REAL-format twin of the PPM perturbed-copy test: JPEG bytes
    produced and re-decoded by PIL through the same phash kernel +
    banded join.  Lossy re-encode noise must not break the match, and
    an unrelated image must not pair.  Skip-marked when PIL is absent
    (this container); green wherever the codec exists."""
    import io as _io

    import numpy as np

    from nyc_tlc_analytics_pipeline_spark.operators import multimodal
    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
        PHASH_SCHEMA,
        near_dup_media_pairs,
        phash_kernel,
    )

    PIL_Image = multimodal._PIL_IMAGE

    def jpeg_bytes(arr, quality=90):
        buf = _io.BytesIO()
        PIL_Image.fromarray(arr, "RGB").save(buf, format="JPEG", quality=quality)
        return buf.getvalue()

    # smooth structured image: phash is stable under JPEG quantization
    y, x = np.mgrid[0:64, 0:64]
    base = np.stack(
        [(x * 4) % 256, (y * 4) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype("uint8")
    perturbed = np.clip(base.astype(int) + 6, 0, 255).astype("uint8")
    rng = np.random.RandomState(7)
    other = rng.randint(0, 256, size=(64, 64, 3)).astype("uint8")
    df = spark.createDataFrame(
        [
            (1, "jpeg", bytearray(jpeg_bytes(base))),
            (2, "jpeg", bytearray(jpeg_bytes(perturbed, quality=75))),
            (3, "jpeg", bytearray(jpeg_bytes(other))),
        ],
        "media_id long, format string, content binary",
    )
    ph = df.mapInPandas(phash_kernel(), PHASH_SCHEMA)
    pairs = {(r.a, r.b) for r in near_dup_media_pairs(ph, max_hamming=6).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs

    # real decode path: pixel stats come from the actual JPEG planes
    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
        DECODED_IMAGE_SCHEMA,
        decode_image_stub,
    )

    stats = {
        r.media_id: r
        for r in df.withColumn("width", F.lit(64))
        .withColumn("height", F.lit(64))
        .mapInPandas(decode_image_stub(), DECODED_IMAGE_SCHEMA)
        .collect()
    }
    want = base.mean(axis=(0, 1)) / 255.0
    assert abs(stats[1].mean_r - want[0]) < 0.02
    assert abs(stats[1].mean_g - want[1]) < 0.02
    assert abs(stats[1].mean_b - want[2]) < 0.02


@pytest.mark.skipif(
    not __import__(
        "nyc_tlc_analytics_pipeline_spark.operators.multimodal",
        fromlist=["HAS_PIL"],
    ).HAS_PIL,
    reason="PIL not installed — PNG decode path needs a real codec",
)
def test_decode_real_png_roundtrip(spark):
    """PNG is lossless, so the real decode path must reproduce the
    source pixel means exactly (tighter than the JPEG tolerance), and
    a PNG byte-duplicate must phash to hamming 0 against its source
    array encoded as PPM.  Skip-marked when PIL is absent."""
    import io as _io

    import numpy as np

    from nyc_tlc_analytics_pipeline_spark.operators import multimodal
    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
        DECODED_IMAGE_SCHEMA,
        PHASH_SCHEMA,
        decode_image_stub,
        encode_ppm,
        phash_kernel,
    )

    PIL_Image = multimodal._PIL_IMAGE
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, size=(32, 32, 3)).astype("uint8")
    buf = _io.BytesIO()
    PIL_Image.fromarray(arr, "RGB").save(buf, format="PNG")
    df = spark.createDataFrame(
        [
            (1, "png", bytearray(buf.getvalue()), 32, 32),
            (2, "ppm", bytearray(encode_ppm(arr)), 32, 32),
        ],
        "media_id long, format string, content binary, width int, height int",
    )
    stats = {
        r.media_id: r
        for r in df.mapInPandas(decode_image_stub(), DECODED_IMAGE_SCHEMA).collect()
    }
    for ch, m in zip(("mean_r", "mean_g", "mean_b"), arr.mean(axis=(0, 1)) / 255.0):
        assert abs(getattr(stats[1], ch) - m) < 1e-9
        assert abs(getattr(stats[2], ch) - m) < 1e-9
    ph = {r.media_id: r.phash for r in df.mapInPandas(phash_kernel(), PHASH_SCHEMA).collect()}
    assert ph[1] == ph[2]


def test_real_video_perturbed_copy_detection(spark):
    """Where a video codec exists (imageio — the `media` extra), frame
    sampling must digest REAL pixels: a byte-perturbed copy of a video
    produces identical frame digests except at the perturbed frame
    (the perceptual-dedup contract the digest feeds)."""
    from nyc_tlc_analytics_pipeline_spark.operators import multimodal
    from nyc_tlc_analytics_pipeline_spark.operators.multimodal import (
        FRAME_SAMPLE_SCHEMA,
        MEDIA_SCHEMA,
        sample_video_frames_stub,
    )

    if not multimodal.HAS_IMAGEIO:
        pytest.skip("imageio absent: real video decode unavailable "
                    "(install the 'media' extra)")
    import imageio.v3 as iio
    import numpy as np

    frames = [
        np.full((16, 16, 3), 10 * (i + 1), dtype=np.uint8) for i in range(5)
    ]
    buf_a = iio.imwrite("<bytes>", frames, extension=".gif")
    perturbed = [f.copy() for f in frames]
    perturbed[2][0, 0, :] = 255  # one pixel in frame 2
    buf_b = iio.imwrite("<bytes>", perturbed, extension=".gif")
    media = spark.createDataFrame(
        [
            (1, "video", "gif", 16, 16, 5000, bytearray(buf_a)),
            (2, "video", "gif", 16, 16, 5000, bytearray(buf_b)),
        ],
        MEDIA_SCHEMA,
    )
    # every_ms large relative to fps metadata absence -> keep all frames
    out = media.mapInPandas(
        sample_video_frames_stub(every_ms=1000, fake=False),
        FRAME_SAMPLE_SCHEMA,
    )
    rows = out.collect()
    a = {r.frame_index: r.frame_digest for r in rows if r.media_id == 1}
    b = {r.frame_index: r.frame_digest for r in rows if r.media_id == 2}
    assert set(a) == set(b) and len(a) == 5
    diff = [i for i in a if a[i] != b[i]]
    assert diff == [2]  # only the perturbed frame's digest moved


def test_media_codec_skip_accounting():
    """Skips in the codec-gated tests are legitimate ONLY when the lib
    is genuinely unimportable — the 'media' pyproject extra exists so an
    env can provision them and run the real paths (VERDICT r11 item 7).
    Pins the extra's contents so it can't silently drift."""
    import importlib.util
    import tomllib
    from pathlib import Path

    from nyc_tlc_analytics_pipeline_spark.operators import multimodal

    assert multimodal.HAS_PIL == (importlib.util.find_spec("PIL") is not None)
    assert multimodal.HAS_SOUNDFILE == (
        importlib.util.find_spec("soundfile") is not None
    )
    assert multimodal.HAS_IMAGEIO == (
        importlib.util.find_spec("imageio") is not None
    )
    py = tomllib.loads(
        (Path(__file__).parent.parent / "pyproject.toml").read_text()
    )
    extra = py["project"]["optional-dependencies"]["media"]
    assert any(d.startswith("pillow") for d in extra)
    assert any(d.startswith("soundfile") for d in extra)
    assert any(d.startswith("imageio") for d in extra)
