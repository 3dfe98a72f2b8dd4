"""Multimodal decode: REAL PPM/WAV parsing correctness + stub fallback."""

import math

import numpy as np

from pcrawler_spark.operators.multimodal import (
    _decode_one,
    _decode_ppm,
    _decode_wav,
    decode_features,
    frame_sample_plan,
    make_ppm,
    make_wav,
)


def test_ppm_decode_exact():
    # hand-built 2x1 image: red pixel + blue pixel
    payload = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 0, 255])
    f = _decode_ppm(payload)
    assert f is not None
    w, h, mr, mg, mb, sgray, maxval, ch = f
    assert (w, h, maxval, ch) == (2.0, 1.0, 255.0, 3.0)
    assert math.isclose(mr, 127.5 / 255) and math.isclose(mb, 127.5 / 255)
    assert mg == 0.0
    # comments in the header parse
    assert _decode_ppm(b"P6\n# c\n2 1\n255\n" + bytes(6)) is not None
    # malformed: truncated raster, bad magic, garbage dims
    assert _decode_ppm(b"P6\n2 1\n255\n" + bytes(3)) is None
    assert _decode_ppm(b"P5\n2 1\n255\n" + bytes(6)) is None
    assert _decode_ppm(b"P6\nx y\n255\n") is None


def test_wav_decode_exact():
    # constant half-scale signal: rms == mean_abs == peak
    pcm = (np.full(1600, 0.5) * 32767).astype("<i2")
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(pcm.tobytes())
    feats = _decode_wav(buf.getvalue())
    dur, rate, nch, mean_abs, rms, peak, zcr, bits = feats
    assert (rate, nch, bits) == (16000.0, 1.0, 16.0)
    assert math.isclose(dur, 0.1)
    assert math.isclose(mean_abs, rms) and math.isclose(rms, peak)
    assert zcr == 0.0
    assert _decode_wav(b"RIFFxxxxWAVEgarbage") is None


def test_decode_one_routing():
    assert _decode_one(make_ppm(4, 4, 1))[0] == "ppm"
    assert _decode_one(make_wav(800, 8000, 1))[0] == "wav"
    codec, feat, ok = _decode_one(b"\x89PNG\r\n unknown codec bytes")
    assert codec == "stub" and ok and len(feat) == 8
    assert _decode_one(make_ppm(4, 4, 1)[:10]) == ("ppm", None, False)
    assert _decode_one(None) == ("none", None, False)


def test_decode_features_spark(spark):
    from pyspark.sql import functions as F

    rows = [
        (1, "image", make_ppm(8, 6, 3), 8, 6, 0),
        (2, "audio", make_wav(2000, 8000, 3), 0, 0, 250),
        (3, "video", b"\x00\x00\x00 ftypmp42 fake", 0, 0, 2500),
        (4, "image", b"P6\nbroken", 0, 0, 0),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, width int, height int, duration_ms int"
    )
    out = {r["media_id"]: r for r in decode_features(media).collect()}
    assert out[1]["codec"] == "ppm" and out[1]["decode_ok"]
    assert out[1]["feat"][0] == 8.0 and out[1]["feat"][1] == 6.0
    assert out[2]["codec"] == "wav" and out[2]["decode_ok"]
    assert abs(out[2]["feat"][0] - 0.25) < 1e-6  # 2000 frames @ 8kHz
    assert out[3]["codec"] == "stub" and out[3]["decode_ok"]
    assert out[4]["codec"] == "ppm" and not out[4]["decode_ok"] and out[4]["feat"] is None
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert {r["media_id"] for r in frames} == {3}
    assert len(frames) == 3  # 0, 1000, 2000 ms


def test_resize_ppm_exact():
    """Nearest-neighbor resize: exact index-sampling semantics, header
    re-encoded, malformed/codec-bound payloads decline with None."""
    from pcrawler_spark.operators.multimodal import _parse_ppm, _resize_ppm, make_ppm

    src = make_ppm(8, 6, seed=3)
    out = _resize_ppm(src, 4, 3)
    assert out is not None and out.startswith(b"P6\n4 3\n")
    w, h, maxval, raw = _parse_ppm(out)
    assert (w, h) == (4, 3)
    sw, sh, _, sraw = _parse_ppm(src)
    # exact nearest-neighbor positions: ys = i*6//3, xs = j*8//4
    for i in range(3):
        for j in range(4):
            assert (raw[i, j] == sraw[i * 6 // 3, j * 8 // 4]).all()
    # upscale works too (repeats pixels)
    up = _resize_ppm(src, 16, 12)
    uw, uh, _, uraw = _parse_ppm(up)
    assert (uw, uh) == (16, 12)
    assert (uraw[0, 0] == sraw[0, 0]).all() and (uraw[1, 1] == sraw[0, 0]).all()
    # malformed: truncated raster
    assert _resize_ppm(src[:-5], 4, 3) is None
    assert _resize_ppm(b"\xff\xd8jpegdata", 4, 3) is None


def test_resize_images_spark(spark):
    from pcrawler_spark.operators.multimodal import make_ppm, resize_images

    rows = [
        (1, "image", bytearray(make_ppm(10, 10, seed=1))),
        (2, "image", bytearray(b"\xff\xd8notppm")),
        (3, "image", None),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r["media_id"]: r for r in resize_images(df, 5, 5).collect()}
    assert out[1]["resize_ok"] and out[1]["width"] == 5 and out[1]["height"] == 5
    assert bytes(out[1]["payload"]).startswith(b"P6\n5 5\n")
    # codec-bound passes through unchanged, flagged
    assert not out[2]["resize_ok"] and bytes(out[2]["payload"]) == b"\xff\xd8notppm"
    assert out[2]["width"] is None
    assert not out[3]["resize_ok"] and out[3]["payload"] is None


def test_bmp_real_decode_padding_and_row_order():
    """24-bit BMP: 4-byte row padding honored (w=5 → 15-byte rows pad to
    16), bottom-up and top-down storage decode to identical pixels, and
    BMP/PPM built from the same pixel function agree on dimensions."""
    import numpy as np

    from pcrawler_spark.operators.multimodal import (_decode_bmp, _decode_one,
                                                     _parse_bmp, make_bmp)

    up, down = make_bmp(5, 3, 11), make_bmp(5, 3, 11, top_down=True)
    w1, h1, a1 = _parse_bmp(up)
    w2, h2, a2 = _parse_bmp(down)
    assert (w1, h1) == (5, 3) and (a1 == a2).all()
    assert _decode_bmp(up) == _decode_bmp(down)

    codec, feats, ok = _decode_one(up)
    assert codec == "bmp" and ok and feats[0] == 5.0 and feats[1] == 3.0

    # hand-computed: a 1x1 image's mean channels are the pixel itself
    one = make_bmp(1, 1, 3)
    _, _, px = _parse_bmp(one)
    f = _decode_bmp(one)
    assert [round(v * 255) for v in f[2:5]] == list(px[0, 0])

    # malformed inputs fail honestly, still labeled bmp by magic
    codec, feats, ok = _decode_one(up[:20])
    assert codec == "bmp" and not ok and feats is None
    assert _decode_bmp(b"BM" + b"\x00" * 60) is None  # zero-dim header


def test_resize_images_handles_bmp(spark):
    """resize_images really resizes BMP payloads (nearest-neighbor), keeps
    codec-bound payloads flagged pass-through, and the resized BMP
    re-decodes at the new dimensions."""
    from pcrawler_spark.operators.multimodal import (_decode_one, make_bmp,
                                                     make_ppm, resize_images)

    media = spark.createDataFrame(
        [(1, "image", make_bmp(16, 12, 1), 16, 12, 0),
         (2, "image", make_ppm(16, 12, 2), 16, 12, 0),
         (3, "video", bytes([7] * 60), None, None, 3000)],
        "media_id long, kind string, payload binary, width int, height int, duration_ms int",
    )
    out = {r["media_id"]: r for r in resize_images(media, 8, 6).collect()}
    assert out[1]["resize_ok"] and out[2]["resize_ok"] and not out[3]["resize_ok"]
    codec, feats, ok = _decode_one(bytes(out[1]["payload"]))
    assert codec == "bmp" and ok and feats[0] == 8.0 and feats[1] == 6.0
    codec, feats, ok = _decode_one(bytes(out[2]["payload"]))
    assert codec == "ppm" and ok and feats[0] == 8.0
    assert bytes(out[3]["payload"]) == bytes([7] * 60)  # untouched
