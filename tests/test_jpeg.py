"""Baseline JPEG codec (paqarin_spark/jpeg.py): real Huffman entropy
decode + IDCT, encoder round trips, malformed-input contracts."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from paqarin_spark.jpeg import encode_jpeg, parse_jpeg


def test_solid_color_flat_and_predictable():
    img = np.zeros((16, 8, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 200, 30, 100
    for sub in ("444", "420"):
        dec = parse_jpeg(encode_jpeg(img, subsampling=sub))
        assert (dec["width"], dec["height"]) == (8, 16)
        px = dec["pixels"]
        # flat output, within DC-quantization distance of the input
        assert all(len(np.unique(px[..., c])) == 1 for c in range(3))
        assert np.abs(px[0, 0].astype(int) - [200, 30, 100]).max() <= 9


def test_random_block_round_trip_within_quant_error():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
    dec = parse_jpeg(encode_jpeg(img))
    assert dec["pixels"].shape == img.shape
    # noise is the worst case for JPEG; bounded, not tight
    assert np.abs(dec["pixels"].astype(float) - img.astype(float)).mean() < 40


def test_smooth_gradient_close_round_trip():
    xx, yy = np.meshgrid(np.arange(32), np.arange(24))
    img = np.stack(
        [(xx * 2 + 40) % 200, (yy * 3 + 30) % 200, (xx + yy + 20) % 200],
        axis=-1,
    ).astype(np.uint8)
    for sub in ("444", "420"):
        dec = parse_jpeg(encode_jpeg(img, subsampling=sub))
        err = np.abs(dec["pixels"].astype(float) - img.astype(float))
        assert err.mean() < 12.0, sub


def test_non_multiple_of_8_dimensions_crop_back():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (13, 21, 3)).astype(np.uint8)
    for sub in ("444", "420"):
        dec = parse_jpeg(encode_jpeg(img, subsampling=sub))
        assert (dec["width"], dec["height"]) == (21, 13)
        assert dec["pixels"].shape == (13, 21, 3)


def test_malformed_inputs_return_none():
    assert parse_jpeg(b"") is None
    assert parse_jpeg(b"notajpeg") is None
    assert parse_jpeg(b"\xff\xd8\xff\xd9") is None  # no frame
    good = encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))
    assert parse_jpeg(good[: len(good) // 2]) is None  # truncated scan


def test_progressive_sof_rejected():
    good = bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    idx = bytes(good).find(b"\xff\xc0")
    assert idx > 0
    good[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    assert parse_jpeg(bytes(good)) is None


def test_restart_interval_rejected():
    good = bytes(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    idx = good.find(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 8)
    assert parse_jpeg(good[:idx] + dri + good[idx:]) is None


def test_bad_subsampling_raises():
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), subsampling="422")


def test_jpeg_pixel_stats_through_spark(spark):
    from paqarin_spark.multimodal import jpeg_assets_from_ids, jpeg_pixel_stats

    ids = spark.range(0, 6).withColumnRenamed("id", "doc_id")
    out = {
        r.asset_id: r
        for r in jpeg_pixel_stats(jpeg_assets_from_ids(ids, "doc_id")).collect()
    }
    assert len(out) == 6
    for aid, r in out.items():
        assert r.width == (aid % 4 + 1) * 8
        assert r.height == (aid % 3 + 1) * 8
        # solid fixtures decode flat -> integral means
        assert r.mean_r == int(r.mean_r)
        assert 0.0 <= r.mean_r <= 255.0


def test_fill_bytes_before_markers_accepted():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[..., 0] = 120
    good = encode_jpeg(img)
    # inject spec-legal 0xFF fill padding before the SOF0 marker
    idx = good.find(b"\xff\xc0")
    padded = good[:idx] + b"\xff\xff\xff" + good[idx:]
    dec = parse_jpeg(padded)
    assert dec is not None and (dec["width"], dec["height"]) == (8, 8)
