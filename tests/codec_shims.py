"""Vendored pure-stdlib codec shims (VERDICT r12 item 2).

This container is offline and the build rules forbid installing
packages, so PIL / soundfile / imageio can never be importable here —
yet ``operators/multimodal.py``'s probe-true branches (`_PIL_IMAGE is
not None`, `_SOUNDFILE is not None`, `_IMAGEIO is not None`) are real
production code that must execute SOMEWHERE.  These shims implement the
exact API slice those branches call, backed by real decoders for real
formats that need nothing beyond the stdlib + numpy:

- :class:`PilShim` — ``open(fp)`` → context manager → ``convert("RGB")``
  → ``np.asarray``-able, for **BMP** (24-bit uncompressed, little-endian
  struct parsing);
- :class:`SoundfileShim` — ``read(fp, dtype=...)`` → ``(samples, rate)``
  for **WAV** (stdlib ``wave``), preserving multi-channel shape so the
  branch's own ``x.mean(axis=1)`` downmix executes;
- :class:`ImageioShim` — ``immeta(fp)`` / ``imiter(fp)`` for animated
  **GIF** (a from-scratch LZW decoder), streaming frames as RGB arrays.

Tests monkeypatch ``multimodal._PIL_IMAGE = PilShim`` (etc.) and push
real format bytes through the unmodified Spark kernels, so the
probe-true code paths — BytesIO wrapping, convert/downmix calls, stat
extraction, frame stepping — run against ground-truth pixels/samples.
The matching encoders below exist only to build fixtures; decoders are
validated by source-array equality after a byte round-trip.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB) — the PIL slice
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise ValueError(f"not a BMP payload: {payload[:2]!r}")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp, compression = (
        struct.unpack_from("<H", payload, 28)[0],
        struct.unpack_from("<I", payload, 30)[0],
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp})")
    bottom_up, h = h > 0, abs(h)
    row_size = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    arr = np.zeros((h, w, 3), np.uint8)
    for r in range(h):
        row = np.frombuffer(
            payload, np.uint8, w * 3, data_offset + r * row_size
        ).reshape(w, 3)[:, ::-1]  # stored BGR
        arr[h - 1 - r if bottom_up else r] = row
    return arr


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → 24-bit bottom-up BMP bytes (fixture builder)."""
    h, w = arr.shape[:2]
    row_size = (w * 3 + 3) & ~3
    raster = bytearray()
    for r in range(h - 1, -1, -1):
        row = arr[r][:, ::-1].astype(np.uint8).tobytes()
        raster += row + b"\x00" * (row_size - w * 3)
    return (
        struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
        )
        + bytes(raster)
    )


class _ShimArray:
    def __init__(self, a: np.ndarray) -> None:
        self._a = a

    def __array__(self, dtype=None, copy=None):
        return self._a if dtype is None else self._a.astype(dtype)


class _ShimImage:
    def __init__(self, arr: np.ndarray) -> None:
        self._arr = arr

    def __enter__(self) -> "_ShimImage":
        return self

    def __exit__(self, *exc) -> bool:
        return False

    def convert(self, mode: str) -> _ShimArray:
        if mode != "RGB":
            raise ValueError(f"shim supports RGB only, got {mode!r}")
        a = self._arr
        if a.ndim == 2:
            a = np.stack([a] * 3, axis=-1)
        return _ShimArray(a)


class PilShim:
    """The ``PIL.Image`` slice multimodal's probe-true branches call."""

    @staticmethod
    def open(fp) -> _ShimImage:
        return _ShimImage(decode_bmp(fp.read()))


# ---------------------------------------------------------------------------
# WAV — the soundfile slice
# ---------------------------------------------------------------------------


class SoundfileShim:
    """``soundfile.read`` for PCM WAV, multi-channel shape preserved
    (the production branch downmixes with ``x.mean(axis=1)`` itself)."""

    @staticmethod
    def read(fp, dtype: str = "float64"):
        with wave.open(fp, "rb") as f:
            rate, nch, width = (
                f.getframerate(), f.getnchannels(), f.getsampwidth(),
            )
            raw = f.readframes(f.getnframes())
        np_dtype, scale = {
            1: (np.uint8, 128.0),
            2: (np.int16, 32768.0),
            4: (np.int32, 2147483648.0),
        }[width]
        x = np.frombuffer(raw, dtype=np_dtype).astype(np.float64)
        if width == 1:
            x -= 128.0
        x /= scale
        if nch > 1:
            x = x.reshape(-1, nch)
        return x.astype(dtype), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float [-1, 1] mono or (n, ch) → 16-bit PCM WAV bytes."""
    x = np.clip(np.asarray(samples, np.float64), -1.0, 1.0)
    nch = 1 if x.ndim == 1 else x.shape[1]
    pcm = np.round(x * 32767.0).astype("<i2").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(nch)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# animated GIF — the imageio.v3 slice (from-scratch LZW)
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, npix: int) -> bytes:
    """GIF-flavor LZW: LSB-first variable-width codes, table reset on
    CLEAR, width grows when the table fills (capped at 12 bits)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos, nbits = 0, len(data) * 8
    while bitpos + code_size <= nbits and len(out) < npix:
        code = 0
        for i in range(code_size):
            code |= ((data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1) << i
        bitpos += code_size
        if code == clear:
            table, code_size, prev = list(base), min_code_size + 1, None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return bytes(out[:npix])


def _lzw_encode_literal(min_code_size: int, indices: bytes) -> bytes:
    """'Uncompressed' GIF LZW: every pixel emitted as a literal code,
    with a CLEAR before the decoder's table would force a width bump —
    valid LZW any conforming decoder accepts (fixture builder)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    out = bytearray()
    cur = ncur = 0

    def emit(code: int) -> None:
        nonlocal cur, ncur
        cur |= code << ncur
        ncur += code_size
        while ncur >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            ncur -= 8

    emit(clear)
    count = 0
    for idx in indices:
        emit(idx)
        count += 1
        if count >= clear - 2:  # decoder table at 2·clear−1 < capacity
            emit(clear)
            count = 0
    emit(end)
    if ncur:
        out.append(cur & 0xFF)
    return bytes(out)


def _gif_blocks(payload: bytes):
    """Yield ('gce', delay_cs) and ('frame', indices, w, h, palette)
    from a GIF payload (full-frame, non-interlaced images only)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF payload: {payload[:6]!r}")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            label = payload[pos]
            pos += 1
            subs = []
            while payload[pos]:
                ln = payload[pos]
                subs.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1  # terminator
            if label == 0xF9 and subs:
                (delay_cs,) = struct.unpack_from("<H", subs[0], 1)
                yield ("gce", delay_cs)
            continue
        if b == 0x2C:  # image descriptor
            left, top, w, h = struct.unpack_from("<HHHH", payload, pos)
            ipacked = payload[pos + 8]
            pos += 9
            if (left, top, w, h) != (0, 0, sw, sh) or ipacked & 0x40:
                raise ValueError("shim supports full-frame non-interlaced")
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(mcs, bytes(data), w * h), np.uint8
            )
            yield ("frame", idx, w, h, pal)
            continue
        raise ValueError(f"unknown GIF block 0x{b:02x}")


class ImageioShim:
    """The ``imageio.v3`` slice ``_real_video_frames`` calls."""

    @staticmethod
    def immeta(fp) -> dict:
        payload = fp.read()
        for kind, *rest in _gif_blocks(payload):
            if kind == "gce" and rest[0]:
                return {"fps": 100.0 / rest[0]}
        return {}

    @staticmethod
    def imiter(fp):
        payload = fp.read()
        for kind, *rest in _gif_blocks(payload):
            if kind == "frame":
                idx, w, h, pal = rest
                yield pal[idx].reshape(h, w, 3)


def encode_gif(frames: list[np.ndarray], delay_cs: int = 50) -> bytes:
    """Grayscale animated GIF from (h, w) uint8 frames — 256-entry gray
    palette, one GCE per frame carrying ``delay_cs`` (fixture builder)."""
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h) + bytes([0x80 | 0x07, 0, 0])
    for i in range(256):  # global gray palette: index i → (i, i, i)
        out += bytes([i, i, i])
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must share the screen size")
        out += bytes([0x21, 0xF9, 4, 0]) + struct.pack("<H", delay_cs)
        out += bytes([0, 0])  # transparent idx, terminator
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        out += bytes([8])  # LZW min code size
        data = _lzw_encode_literal(8, fr.astype(np.uint8).tobytes())
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)
