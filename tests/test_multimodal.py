"""Multimodal plumbing: schemas, mapInPandas batch flow, fan-out
shapes. The codec itself is a deterministic stub (no image/audio libs
in this container) — these tests pin the Spark-side contracts."""

from __future__ import annotations

import pytest

from paqarin_spark.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    media_table,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, b"\x89PNG fake image bytes", ("image", "png", 640, 480, None, None)),
        (2, b"RIFF fake audio bytes", ("audio", "wav", None, None, None, 16000)),
        (3, b"\x00\x00mp4 fake video", ("video", "mp4", 1280, 720, 6, None)),
        (4, None, ("image", "png", 1, 1, None, None)),  # missing payload
    ]
    return media_table(spark, rows)


def test_decode_media(assets):
    out = {r["asset_id"]: r for r in decode_media(assets).collect()}
    assert len(out) == 4
    assert out[1]["width"] == 640 and out[1]["height"] == 480
    assert out[1]["n_bytes"] == len(b"\x89PNG fake image bytes")
    assert len(out[1]["content_hash"]) == 32
    assert out[4]["content_hash"] is None  # null payload -> null decode
    # determinism: same bytes, same hash
    again = {r["asset_id"]: r for r in decode_media(assets).collect()}
    assert again[1]["content_hash"] == out[1]["content_hash"]


def test_extract_features_long_form(assets):
    out = extract_features(assets).collect()
    by_asset = {}
    for r in out:
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert set(by_asset) == {1, 2, 3}  # null-payload asset dropped
    assert all(len(v) == FEATURE_DIM for v in by_asset.values())
    assert all(0.0 <= r["value"] <= 1.0 for r in out)


def test_resize_updates_metadata_only(assets):
    out = {r["asset_id"]: r for r in resize_images(assets, 64, 64).collect()}
    assert out[1]["meta"]["width"] == 64
    assert out[1]["meta"]["height"] == 64
    assert out[1]["meta"]["format"] == "png"
    assert bytes(out[1]["content"]) == b"\x89PNG fake image bytes"


def test_sample_frames_fanout(assets):
    out = sample_frames(assets, every_nth=2).collect()
    # only the video asset (6 frames, every 2nd -> 0,2,4)
    assert {r["asset_id"] for r in out} == {3}
    assert sorted(r["frame_index"] for r in out) == [0, 2, 4]
    assert all(len(r["frame_hash"]) == 32 for r in out)


def test_chunk_audio_fanout_and_bounds(spark):
    from paqarin_spark.multimodal import chunk_audio, media_table

    rows = [
        # 2.5 s at 4 Hz -> chunks of 4, 4, 2 samples
        (1, b"pcm-a", ("audio", "wav", None, None, 10, 4)),
        (2, b"img", ("image", "png", 8, 8, None, None)),  # skipped
        (3, b"pcm-b", ("audio", "wav", None, None, 4, 4)),  # exactly 1 chunk
    ]
    df = media_table(spark, rows)
    got = {
        (r["asset_id"], r["chunk_index"]): (r["start_sample"], r["n_samples"])
        for r in chunk_audio(df, window_seconds=1.0).collect()
    }
    assert got == {
        (1, 0): (0, 4),
        (1, 1): (4, 4),
        (1, 2): (8, 2),
        (3, 0): (0, 4),
    }
