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
    with pytest.raises(NotImplementedError):
        real_decoder(b"abc", "image/png")


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
