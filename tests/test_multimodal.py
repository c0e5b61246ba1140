"""Multimodal binary-column plumbing (decode stubbed, plumbing real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.operators.multimodal import (
    FEATURE_DIM, extract_features, fake_image_decoder, frame_sample_plan,
    real_decoder, resize_stub,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, bytearray(b"\x89PNG-fake-bytes-1"), "image/png", 64, 64,
         {"n_frames": "1"}),
        (2, bytearray(b"\x89PNG-fake-bytes-2"), "image/png", 32, 32,
         {"n_frames": "1"}),
        (3, bytearray(b"RIFF-fake-video"), "video/avi", 640, 480,
         {"n_frames": "25"}),
    ]
    return spark.createDataFrame(
        rows, "media_id long, media binary, media_type string, "
              "width int, height int, metadata map<string,string>")


def test_real_decoder_is_explicit_stub():
    # PNG decodes natively now; the stub boundary is the lossy formats
    with pytest.raises(NotImplementedError):
        real_decoder(b"abc", "image/jpeg")


def test_extract_features_shapes_and_determinism(spark, media):
    out1 = extract_features(media, decode_fn=fake_image_decoder).collect()
    out2 = extract_features(media, decode_fn=fake_image_decoder).collect()
    assert len(out1) == 3
    by_id = {r["media_id"]: r for r in out1}
    assert all(len(r["feature"]) == FEATURE_DIM for r in out1)
    assert by_id[1]["n_bytes"] == len(b"\x89PNG-fake-bytes-1")
    # deterministic across runs and different from each other
    assert [r["feature"] for r in out1] == [r["feature"] for r in out2]
    assert by_id[1]["feature"] != by_id[2]["feature"]


def test_resize_updates_declared_dims(spark, media):
    out = resize_stub(media, 8, 8).select("width", "height").distinct().collect()
    assert [(r["width"], r["height"]) for r in out] == [(8, 8)]


def test_frame_sample_explodes_video(spark, media):
    frames = frame_sample_plan(media, every_n=10).collect()
    per_id = {}
    for r in frames:
        per_id.setdefault(r["media_id"], []).append(r["frame_index"])
    assert per_id[1] == [0]
    assert per_id[3] == [0, 10, 20]


# ------------------------------------------------- real codec-free path ----

def _ppm_bytes():
    """2x2 P6 image with known pixels."""
    import numpy as np
    from tb_lakehouse_enhanced_spark.operators.multimodal import encode_netpbm
    arr = np.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
                    [[0.0, 0.0, 1.0], [1.0, 1.0, 1.0]]])
    return encode_netpbm(arr)


def _wav_bytes(freq_bin=8, n=1024, rate=8000):
    """Mono 16-bit PCM sine whose frequency lands on FFT bin `freq_bin`
    of the first 1024 samples."""
    import io
    import wave

    import numpy as np
    t = np.arange(n)
    x = 0.5 * np.sin(2 * np.pi * freq_bin * t / 1024.0)
    pcm = (x * 32767).astype("<i2").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm)
    return buf.getvalue()


def test_netpbm_decode_roundtrip():
    import numpy as np
    from tb_lakehouse_enhanced_spark.operators.multimodal import (
        decode_netpbm, encode_netpbm,
    )
    arr = decode_netpbm(_ppm_bytes())
    assert arr.shape == (2, 2, 3)
    assert np.allclose(arr[0, 0], [1, 0, 0]) and np.allclose(arr[1, 1], [1, 1, 1])
    # grayscale P5 + comment header also parses
    p5 = b"P5\n# a comment\n2 1\n255\n" + bytes([0, 255])
    g = decode_netpbm(p5)
    assert g.shape == (1, 2) and g[0, 0] == 0.0 and g[0, 1] == 1.0
    # 8-bit re-encode is lossless for 8-bit-representable pixels
    assert decode_netpbm(encode_netpbm(arr)).tolist() == arr.tolist()


def test_real_decoder_dispatch_and_stub_boundary():
    import numpy as np
    import pytest
    from tb_lakehouse_enhanced_spark.operators.multimodal import real_decoder
    assert real_decoder(_ppm_bytes(), "image/x-portable-pixmap").shape == (2, 2, 3)
    wav = real_decoder(_wav_bytes(), "audio/wav")
    assert wav.shape == (1024, 1)
    assert abs(float(np.sqrt((wav ** 2).mean())) - 0.5 / 2 ** 0.5) < 1e-3
    with pytest.raises(NotImplementedError, match="codec"):
        real_decoder(b"\xff\xd8\xff\xe0JFIF", "image/jpeg")  # JPEG magic


def test_image_features_and_resize_through_spark(spark):
    from tb_lakehouse_enhanced_spark.operators.multimodal import (
        MEDIA_SCHEMA_DDL, image_features, resize_images,
    )
    rows = [(1, bytearray(_ppm_bytes()), "image/x-portable-pixmap", 2, 2, {})]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA_DDL)
    f = image_features(media, n_bins=4).collect()[0]
    # luma of the 4 pixels: 1/3, 1/3, 1/3, 1 -> mean 0.5
    assert f["width"] == 2 and f["height"] == 2
    assert abs(f["mean_luma"] - 0.5) < 1e-9
    assert abs(sum(f["histogram"]) - 1.0) < 1e-9
    # real resize: bytes change, redecode at the new dims, content kept
    big = resize_images(media, 4, 4)
    r = big.collect()[0]
    assert (r["width"], r["height"]) == (4, 4)
    f2 = image_features(big, n_bins=4).collect()[0]
    assert (f2["width"], f2["height"]) == (4, 4)
    # nearest-neighbor 2x upscale preserves the mean exactly
    assert abs(f2["mean_luma"] - 0.5) < 1e-9


def test_audio_features_known_tone(spark):
    from tb_lakehouse_enhanced_spark.operators.multimodal import (
        MEDIA_SCHEMA_DDL, audio_features,
    )
    rows = [(7, bytearray(_wav_bytes(freq_bin=8)), "audio/wav", 0, 0, {})]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA_DDL)
    f = audio_features(media).collect()[0]
    assert f["n_samples"] == 1024 and f["n_channels"] == 1
    # sine RMS = amplitude/sqrt(2) = 0.3536
    assert abs(f["rms"] - 0.35355) < 1e-3
    # 8 cycles over 1024 samples -> 16 zero crossings/1023 diffs
    assert abs(f["zero_cross_rate"] - 16 / 1023) < 2e-3
    assert f["dominant_bin"] == 8


def test_png_decode_all_filters_and_spark_path(spark):
    """PNG decode: round-trip via our encoder (filter 0), plus
    hand-built Sub/Up/Average/Paeth filtered rows decode correctly
    (cross-checked against a reference unfiltering), RGBA alpha
    excluded from luminance, and the Spark feature/resize path accepts
    PNG blobs and re-encodes PNG."""
    import struct
    import zlib

    import numpy as np
    from tb_lakehouse_enhanced_spark.operators.multimodal import (
        MEDIA_SCHEMA_DDL, decode_png, encode_png, image_features,
        real_decoder, resize_images,
    )
    rng = np.random.default_rng(5)
    arr = rng.random((6, 5, 3))
    got = decode_png(encode_png(arr))
    assert got.shape == (6, 5, 3)
    assert np.array_equal(got, np.round(arr * 255) / 255)

    # hand-build a PNG whose rows use filters 1..4 over known bytes
    pix = (rng.random((5, 4, 3)) * 255).astype(np.uint8)
    stride = 4 * 3

    def filt(y, ftype):
        cur = pix[y].reshape(-1).astype(int)
        prior = pix[y - 1].reshape(-1).astype(int) if y else [0] * stride
        out = []
        for x in range(stride):
            a = cur[x - 3] if x >= 3 else 0
            b = prior[x]
            c = (prior[x - 3] if x >= 3 else 0)
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((cur[x] - pred) & 0xFF)
        return bytes([ftype]) + bytes(out)

    raw = filt(0, 1) + filt(1, 2) + filt(2, 3) + filt(3, 4) + filt(4, 1)

    def chunk(ctype, data):
        body = ctype + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))
    dec = decode_png(blob)
    assert np.array_equal((dec * 255).round().astype(np.uint8), pix)

    # RGBA: alpha present in decode, excluded from luminance features
    rgba = np.dstack([np.full((2, 2), 0.5)] * 3 + [np.ones((2, 2))])
    assert real_decoder(encode_png(rgba), "image/png").shape == (2, 2, 4)
    rows = [(1, bytearray(encode_png(rgba)), "image/png", 2, 2, {})]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA_DDL)
    f = image_features(media, n_bins=4).collect()[0]
    assert abs(f["mean_luma"] - 0.5) < 0.01   # alpha=1 not averaged in
    r = resize_images(media, 4, 4).collect()[0]
    assert bytes(r["media"])[:8] == b"\x89PNG\r\n\x1a\n"
    assert (r["width"], r["height"]) == (4, 4)
