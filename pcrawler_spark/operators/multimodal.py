"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct, exactly like ``pages.html`` does for HTML.  The Spark-side
plumbing (schema, batch iteration, partition sizing) is real and tested.

Decode status per format:

* **PPM (P6) images — REAL decode** (pure stdlib+numpy header/raster parse):
  width/height + per-channel means + grayscale std features;
* **BMP (24-bit uncompressed, BITMAPINFOHEADER) images — REAL decode**
  (little-endian header + padded BGR raster, bottom-up and top-down rows):
  same feature shape as PPM;
* **WAV (PCM16) audio — REAL decode** (stdlib ``wave`` + numpy): duration,
  rate, channels, rms/peak/zero-cross features;
* **everything codec-bound (jpeg/png/mp3/mp4/...) — STUB**: the codec
  libraries (PIL/ffmpeg) are not in this container, so unknown payloads fall
  back to a deterministic blake2b-derived fake, clearly marked below.

Pattern: ``mapInPandas`` so each Arrow batch is decoded once per partition
(bounded memory: tune spark.sql.execution.arrow.maxRecordsPerBatch down for
large blobs; at 100 TB the table is partitioned by content-size bucket so a
batch of 4K thumbnails and a batch of videos get different parallelism).
"""

from __future__ import annotations

import io
import struct
import wave
from hashlib import blake2b
from typing import Iterable, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, codec string, feat array<float>, decode_ok boolean"
)

FEATURE_DIM = 8


def _parse_ppm(payload: bytes):
    """P6 header + raster parse → (w, h, maxval, uint8 ndarray[h,w,3]) or
    None on malformed input.  Shared by decode and resize."""
    if not payload or not payload.startswith(b"P6"):
        return None
    # header tokens may be separated by any whitespace/comments
    tokens, pos = [], 2
    while len(tokens) < 3 and pos < len(payload):
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    if len(tokens) < 3:
        return None
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    pos += 1  # single whitespace after maxval
    raster = payload[pos : pos + w * h * 3]
    if w <= 0 or h <= 0 or maxval <= 0 or len(raster) != w * h * 3:
        return None
    return w, h, maxval, np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _decode_ppm(payload: bytes) -> Optional[list[float]]:
    """REAL P6 PPM decode: header (magic, dims, maxval) + raw RGB raster.
    Features: [w, h, mean_r, mean_g, mean_b, std_gray, maxval, 3]."""
    parsed = _parse_ppm(payload)
    if parsed is None:
        return None
    w, h, maxval, raw = parsed
    px = raw.astype(np.float32)
    gray = px.mean(axis=2)
    return [float(w), float(h),
            float(px[:, :, 0].mean() / maxval), float(px[:, :, 1].mean() / maxval),
            float(px[:, :, 2].mean() / maxval), float(gray.std() / maxval),
            float(maxval), 3.0]


def _parse_bmp(payload: bytes):
    """24-bit uncompressed BMP (BITMAPINFOHEADER) → (w, h, uint8 RGB
    ndarray[h,w,3]) or None.  Handles the 4-byte row padding and both row
    orders (positive biHeight = bottom-up, negative = top-down)."""
    if not payload or not payload.startswith(b"BM") or len(payload) < 54:
        return None
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        return None
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    planes = int.from_bytes(payload[26:28], "little")
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    top_down, ah = h < 0, abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_off + row_bytes * ah
    if data_off < 54 or len(payload) < need:
        return None
    arr = (np.frombuffer(payload[data_off:need], dtype=np.uint8)
             .reshape(ah, row_bytes)[:, : w * 3].reshape(ah, w, 3))
    arr = arr[:, :, ::-1]  # stored BGR → RGB
    if not top_down:
        arr = arr[::-1]  # bottom-up storage → top-down array
    return w, ah, arr


def _decode_bmp(payload: bytes) -> Optional[list[float]]:
    """REAL BMP decode; same feature shape as PPM (maxval is fixed 255):
    [w, h, mean_r, mean_g, mean_b, std_gray, 255, 3]."""
    parsed = _parse_bmp(payload)
    if parsed is None:
        return None
    w, h, raw = parsed
    px = raw.astype(np.float32)
    gray = px.mean(axis=2)
    return [float(w), float(h),
            float(px[:, :, 0].mean() / 255.0), float(px[:, :, 1].mean() / 255.0),
            float(px[:, :, 2].mean() / 255.0), float(gray.std() / 255.0),
            255.0, 3.0]


def _decode_wav(payload: bytes) -> Optional[list[float]]:
    """REAL PCM16 WAV decode via stdlib ``wave``.
    Features: [duration_s, rate, n_channels, mean_abs, rms, peak, zcr, 16]."""
    if not payload or not payload.startswith(b"RIFF") or payload[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(payload)) as f:
            if f.getsampwidth() != 2:
                return None
            rate, n_ch, n_frames = f.getframerate(), f.getnchannels(), f.getnframes()
            raw = f.readframes(n_frames)
    except (wave.Error, EOFError, struct.error):
        return None
    if not raw:
        return None
    x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
    return [float(n_frames) / rate, float(rate), float(n_ch),
            float(np.abs(x).mean()), float(np.sqrt((x ** 2).mean())),
            float(np.abs(x).max()), zc, 16.0]


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """STUB: deterministic stand-in for codec-bound formats (jpeg/mp4/...).
    Derives `dim` floats from a blake2b of the payload so tests are exact.
    Replace with PIL/torchvision/ffmpeg feature extraction in production."""
    d = blake2b(payload or b"", digest_size=dim * 2).digest()
    return [int.from_bytes(d[2 * i : 2 * i + 2], "big") / 65535.0 for i in range(dim)]


def _decode_one(payload: Optional[bytes]) -> tuple[str, Optional[list[float]], bool]:
    """(codec, features, ok): real decode when the magic bytes say PPM/WAV,
    stub otherwise; malformed real-format payloads fail honestly."""
    if payload is None:
        return "none", None, False
    b = bytes(payload)
    if b.startswith(b"P6"):
        feats = _decode_ppm(b)
        return "ppm", feats, feats is not None
    if b.startswith(b"BM"):
        feats = _decode_bmp(b)
        return "bmp", feats, feats is not None
    if b.startswith(b"RIFF") and b[8:12] == b"WAVE":
        feats = _decode_wav(b)
        return "wav", feats, feats is not None
    return "stub", _fake_decode_features(b), True


def decode_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """media(binary payload) → per-item feature vector via mapInPandas."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            codecs, feats, ok = [], [], []
            for payload in pdf["payload"]:
                try:
                    c, f, o = _decode_one(payload)
                except Exception:
                    c, f, o = "error", None, False
                codecs.append(c)
                feats.append(f)
                ok.append(o)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "codec": codecs,
                    "feat": feats,
                    "decode_ok": ok,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "resize_ok boolean"
)


def _resize_ppm(payload: bytes, tw: int, th: int) -> Optional[bytes]:
    """REAL nearest-neighbor resize of a P6 raster (pure numpy index
    sampling — deterministic, no codec lib), re-encoded as P6."""
    parsed = _parse_ppm(bytes(payload)) if payload is not None else None
    if parsed is None:
        return None
    w, h, maxval, raw = parsed
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    out = raw[ys][:, xs]
    return b"P6\n%d %d\n%d\n" % (tw, th, maxval) + out.tobytes()


def _resize_bmp(payload: bytes, tw: int, th: int) -> Optional[bytes]:
    """REAL nearest-neighbor resize of a 24-bit BMP (same index sampling
    as :func:`_resize_ppm`), re-encoded top-down (negative biHeight — a
    valid, simpler layout; round-trips through :func:`_parse_bmp`)."""
    parsed = _parse_bmp(bytes(payload)) if payload is not None else None
    if parsed is None:
        return None
    w, h, raw = parsed  # RGB, top-down array
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    out = raw[ys][:, xs]
    row_bytes = (tw * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - tw * 3)
    raster = b"".join(out[r, :, ::-1].tobytes() + pad for r in range(th))
    header = (b"BM"
              + (54 + len(raster)).to_bytes(4, "little") + b"\x00" * 4
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + tw.to_bytes(4, "little", signed=True)
              + (-th).to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little")
              + len(raster).to_bytes(4, "little")
              + b"\x00" * 16)
    return header + raster


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """media(binary payload) → resized payloads via ``mapInPandas``.  PPM
    and 24-bit BMP rasters are REALLY resized (nearest-neighbor);
    codec-bound formats (jpeg/...) pass through unchanged with
    ``resize_ok=false`` — the decode seam where PIL/ffmpeg slots in at
    production (same stub contract as :func:`_fake_decode_features`)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs, ok = [], [], [], []
            for payload in pdf["payload"]:
                try:
                    if payload is not None and bytes(payload)[:2] == b"BM":
                        resized = _resize_bmp(payload, width, height)
                    else:
                        resized = _resize_ppm(payload, width, height)
                except Exception:
                    resized = None
                if resized is None:
                    payloads.append(payload)
                    ws.append(None)
                    hs.append(None)
                    ok.append(False)
                else:
                    payloads.append(resized)
                    ws.append(width)
                    hs.append(height)
                    ok.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "resize_ok": ok,
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into the frame
    timestamps a decoder would extract (video decode itself is codec-bound →
    stubbed).  Pure JVM-side sequence/explode — demonstrates the
    row-expansion shape without Python."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ),
        )
        .select("media_id", "frame_ms")
    )


# ---------------------------------------------------------------------------
# deterministic REAL-format payload builders (synthetic corpus / tests)
# ---------------------------------------------------------------------------

def make_ppm(width: int, height: int, seed: int) -> bytes:
    """A valid P6 PPM with deterministic pixel content."""
    header = f"P6\n# synthetic {seed}\n{width} {height}\n255\n".encode()
    n = width * height * 3
    d = blake2b(f"ppm:{seed}".encode(), digest_size=32).digest()
    px = np.frombuffer((d * (n // 32 + 1))[:n], dtype=np.uint8)
    return header + px.tobytes()


def make_bmp(width: int, height: int, seed: int, top_down: bool = False) -> bytes:
    """A valid 24-bit uncompressed BMP with deterministic pixel content
    (same blake2b pixel stream as make_ppm so cross-format tests can
    compare features)."""
    row_bytes = (width * 3 + 3) & ~3
    n = width * height * 3
    d = blake2b(f"bmp:{seed}".encode(), digest_size=32).digest()
    px = np.frombuffer((d * (n // 32 + 1))[:n], dtype=np.uint8).reshape(
        height, width, 3)
    rows = []
    order = range(height) if top_down else range(height - 1, -1, -1)
    pad = b"\x00" * (row_bytes - width * 3)
    for r in order:
        rows.append(px[r, :, ::-1].tobytes() + pad)  # RGB → stored BGR
    raster = b"".join(rows)
    biheight = -height if top_down else height
    header = (b"BM"
              + (54 + len(raster)).to_bytes(4, "little") + b"\x00" * 4
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + width.to_bytes(4, "little", signed=True)
              + biheight.to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little")
              + len(raster).to_bytes(4, "little")
              + b"\x00" * 16)
    return header + raster


def make_wav(n_frames: int, rate: int, seed: int, n_channels: int = 1) -> bytes:
    """A valid 16-bit PCM WAV with a deterministic sine-ish signal."""
    t = np.arange(n_frames * n_channels, dtype=np.float32)
    x = np.sin(t * (0.01 + (seed % 7) * 0.005)) * 0.5
    pcm = (x * 32767).astype("<i2").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(n_channels)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm)
    return buf.getvalue()
