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
                n = meta["n_frames"] or 0
                for idx in range(0, n, every_nth):
                    h = hashlib.md5(
                        (row["content"] or b"") + idx.to_bytes(4, "big")
                    ).hexdigest()
                    rows.append(
                        {"asset_id": row["asset_id"], "frame_index": idx, "frame_hash": h}
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_index", "frame_hash"])

    return df.mapInPandas(frames, schema=schema)


def media_table(spark, rows: list[tuple]) -> DataFrame:
    """Helper to build a media DataFrame with the canonical schema."""
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
