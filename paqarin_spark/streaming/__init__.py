"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2 'Not present in the
reference': no watermarks/tumbling windows) — its
``normalise_sequences`` calendar buckets are the batch analogue of
tumbling windows. This module provides the streaming duals of the core
operators so the same engine serves continuous ingestion at scale:

- :func:`stream_time_bucket_sum` — op D1 as a watermarked tumbling
  window aggregation.
- :func:`stream_keep_first` — op E2 as watermarked streaming dedup.
- :func:`stream_running_minmax` — op D3/G4's fit-state as a streaming
  aggregation (feeds a MinMaxState for online scaling).

All are *transformations* on an unbounded DataFrame: callers plug any
``readStream`` source in and any ``writeStream`` sink out; tests drive
them with a file source + memory sink under ``Trigger.AvailableNow``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paqarin_spark.schema import TimeSeriesSchema, freq_to_spark

_UNIT_TO_WINDOW = {
    "DAY": "1 day",
    "HOUR": "1 hour",
    "MINUTE": "1 minute",
    "WEEK": "1 week",
    "SECOND": "1 second",
}


def _window_duration(frequency: str) -> str:
    unit, _ = freq_to_spark(frequency)
    if unit not in _UNIT_TO_WINDOW:
        raise ValueError(
            f"frequency {frequency!r} has no fixed-length streaming window"
        )
    return _UNIT_TO_WINDOW[unit]


def stream_time_bucket_sum(
    stream: DataFrame,
    schema: TimeSeriesSchema,
    watermark: str = "1 day",
    bucket_column: str = "bucket",
) -> DataFrame:
    """Streaming dual of op D1: per-entity tumbling-window sums with a
    watermark bounding state and admitting late data up to ``watermark``.

    Output schema matches the batch :func:`time_bucket_sum` (bucket =
    window start), so a batch backfill and the streaming path are
    interchangeable — the lambda-architecture contract.
    """
    ts = schema.timestamp_column
    duration = _window_duration(schema.frequency)
    win = F.window(F.col(ts), duration)
    agg = (
        stream.withWatermark(ts, watermark)
        .groupBy(*schema.ids, win.alias("_w"))
        .agg(*[F.sum(F.col(c)).alias(c) for c in schema.values])
    )
    return agg.select(
        *schema.ids, F.col("_w.start").alias(bucket_column), *schema.values
    )


def stream_keep_first(
    stream: DataFrame,
    schema: TimeSeriesSchema,
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming dual of op E2: drop later duplicates of
    (entity, timestamp) with bounded state via watermark.

    Batch keep-first picks the first row by explicit arrival order;
    in a stream, arrival order IS the stream order, so
    ``dropDuplicatesWithinWatermark`` keeps the first-seen row per key.
    """
    keys = [*schema.ids, schema.timestamp_column]
    return stream.withWatermark(
        schema.timestamp_column, watermark
    ).dropDuplicatesWithinWatermark(keys)


def stream_running_minmax(
    stream: DataFrame,
    schema: TimeSeriesSchema,
) -> DataFrame:
    """Streaming dual of op D3 (scaler fit state): running global
    min/max per value column, emitted in update mode. Collecting the
    latest row yields a MinMaxState for online min-max scaling."""
    aggs = []
    for c in schema.values:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return stream.agg(*aggs)
