"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata (north-star surface; no counterpart in the
reference — SURVEY.md §2 'Not present').

Design: media travel as ``struct<content: binary, meta: struct<...>>``
— one row per asset, co-partitioned with the documents that own them.
All heavy per-asset work (decode, resize, feature extraction, frame
sampling) runs as Arrow-batched ``mapInPandas`` transforms: the Spark
side (schemas, partitioning, UDF signatures, batch shapes) is real and
tested; the codec call itself is STUBBED behind ``_decode_bytes``
because image/audio libraries are not available in this container —
swap the stub for PIL/ffmpeg in production, nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("format", StringType(), True),       # png|wav|mp4|...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("meta", MEDIA_META, True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("content_hash", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("feature", StringType(), False),
        StructField("value", DoubleType(), True),
    ]
)


def _decode_bytes(content: bytes | None, width: int | None, height: int | None):
    """STUB decode. Production: replace with PIL.Image.open /
    soundfile / pyav — the surrounding plumbing is codec-agnostic.

    The deterministic fake hashes the payload and trusts metadata for
    dimensions, so tests pin real schemas and batch flow without codecs.
    """
    if content is None:
        return None
    digest = hashlib.md5(content).hexdigest()
    return {
        "content_hash": digest,
        "n_bytes": len(content),
        "width": width,
        "height": height,
    }


def decode_media(df: DataFrame) -> DataFrame:
    """Decode assets to per-asset records via Arrow-batched mapInPandas.

    Batches stream through Python with Arrow transfer; nothing is
    collected to the driver. O(1) state per batch."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                decoded = _decode_bytes(
                    row["content"],
                    None if meta is None else meta["width"],
                    None if meta is None else meta["height"],
                )
                if decoded is None:
                    decoded = {
                        "content_hash": None,
                        "n_bytes": None,
                        "width": None,
                        "height": None,
                    }
                out.append({"asset_id": row["asset_id"], **decoded})
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Per-asset feature vector in long form (asset_id, feature, value).

    STUB features: deterministic bytes-derived values standing in for a
    real embedding model. Long form keeps the schema stable as ``dim``
    changes and feeds the similarity operators directly."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                content = row["content"]
                if content is None:
                    continue
                digest = hashlib.sha256(content).digest()
                for j in range(dim):
                    rows.append(
                        {
                            "asset_id": row["asset_id"],
                            "feature": f"f{j}",
                            "value": digest[j] / 255.0,
                        }
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "feature", "value"])

    return df.mapInPandas(feats, schema=FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: emits the same asset rows with updated metadata
    and (stub) re-encoded content. Production swaps the identity
    re-encode for a real resampler inside the same mapInPandas."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["meta"] = [
                None
                if m is None
                else {**m, "width": width, "height": height}
                for m in out["meta"]
            ]
            yield out

    return df.mapInPandas(resize, schema=df.schema)


def sample_frames(df: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling for video assets: one output row per kept frame,
    ``(asset_id, frame_index, frame_hash)``. Frame decode is stubbed;
    the fan-out shape (1 asset row -> n_frames/every_nth rows) is real.
    """
    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("frame_index", IntegerType(), False),
            StructField("frame_hash", StringType(), True),
        ]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                if meta is None or meta["media_type"] != "video":
                    continue
                # nullable struct ints arrive as floats through Arrow
                n = int(meta["n_frames"] or 0)
                for idx in range(0, n, every_nth):
                    h = hashlib.md5(
                        (row["content"] or b"") + idx.to_bytes(4, "big")
                    ).hexdigest()
                    rows.append(
                        {"asset_id": row["asset_id"], "frame_index": idx, "frame_hash": h}
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_index", "frame_hash"])

    return df.mapInPandas(frames, schema=schema)


def chunk_audio(df: DataFrame, window_seconds: float = 1.0) -> DataFrame:
    """Audio windowing: one output row per fixed-duration chunk of each
    audio asset, ``(asset_id, chunk_index, start_sample, n_samples,
    chunk_hash)``. PCM decode is stubbed (the hash stands in for the
    samples); the fan-out shape — 1 asset row ->
    ceil(total_samples / window) rows, Arrow-batched, no driver loop —
    is real, and is what an ASR/embedding pre-processor consumes.

    Total samples per asset are ``n_frames`` (sample count) at
    ``sample_rate`` Hz, both from the typed metadata struct.
    """
    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("chunk_index", IntegerType(), False),
            StructField("start_sample", LongType(), False),
            StructField("n_samples", IntegerType(), False),
            StructField("chunk_hash", StringType(), True),
        ]
    )

    def chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["asset_id", "chunk_index", "start_sample", "n_samples", "chunk_hash"]
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                if meta is None or meta["media_type"] != "audio":
                    continue
                # nullable struct ints arrive as floats through Arrow
                rate = int(meta["sample_rate"] or 0)
                total = int(meta["n_frames"] or 0)
                if rate <= 0 or total <= 0:
                    continue
                per = max(int(rate * window_seconds), 1)
                idx = 0
                for start in range(0, total, per):
                    n = min(per, total - start)
                    h = hashlib.md5(
                        (row["content"] or b"") + start.to_bytes(8, "big")
                    ).hexdigest()
                    rows.append(
                        {
                            "asset_id": row["asset_id"],
                            "chunk_index": idx,
                            "start_sample": start,
                            "n_samples": n,
                            "chunk_hash": h,
                        }
                    )
                    idx += 1
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(chunks, schema=schema)


def media_table(spark, rows: list[tuple]) -> DataFrame:
    """Helper to build a media DataFrame with the canonical schema."""
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
