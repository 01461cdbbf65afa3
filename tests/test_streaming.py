"""Structured Streaming duals of the core ops, driven with a file
source -> memory sink under availableNow (bounded, deterministic)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from paqarin_spark.schema import TimeSeriesSchema
from paqarin_spark.operators import time_bucket_sum
from paqarin_spark.streaming import (
    stream_keep_first,
    stream_time_bucket_sum,
)

SCHEMA = TimeSeriesSchema(
    item_id_columns=("item_id",),
    timestamp_column="ts",
    value_columns=("v",),
    frequency="D",
)


@pytest.fixture(scope="module")
def source_dir(spark, tmp_path_factory):
    rows = [
        ("a", dt.datetime(2020, 1, 1, 1), 1.0),
        ("a", dt.datetime(2020, 1, 1, 13), 2.0),
        ("a", dt.datetime(2020, 1, 2, 0), 5.0),
        ("b", dt.datetime(2020, 1, 1, 0), 10.0),
        ("b", dt.datetime(2020, 1, 1, 0), 11.0),  # duplicate (entity, ts)
    ]
    df = spark.createDataFrame(rows, "item_id string, ts timestamp, v double")
    path = str(tmp_path_factory.mktemp("stream") / "in")
    df.repartition(2).write.parquet(path)
    return path


def _run(spark, stream_df, name: str, output_mode: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_bucket_sum_matches_batch(spark, source_dir):
    batch = spark.read.parquet(source_dir)
    stream = spark.readStream.schema(batch.schema).parquet(source_dir)
    # complete mode: append would hold back windows the final watermark
    # never passes (bounded source) — complete emits the full table.
    out = _run(
        spark,
        stream_time_bucket_sum(stream, SCHEMA, watermark="1 day"),
        "t_bucket_sum",
        "complete",
    )
    got = {
        (r["item_id"], str(r["bucket"])[:10]): r["v"] for r in out.collect()
    }
    expected = {
        (r["item_id"], str(r["bucket"])[:10]): r["v"]
        for r in time_bucket_sum(batch, SCHEMA).collect()
    }
    assert got == expected
    assert got[("a", "2020-01-01")] == 3.0


def test_stream_keep_first_dedups(spark, source_dir):
    batch = spark.read.parquet(source_dir)
    stream = spark.readStream.schema(batch.schema).parquet(source_dir)
    out = _run(
        spark,
        stream_keep_first(stream, SCHEMA, watermark="1 day"),
        "t_keep_first",
        "append",
    )
    rows = out.collect()
    keys = [(r["item_id"], r["ts"]) for r in rows]
    assert len(keys) == len(set(keys)) == 4  # the dup (b, 1/1) collapsed
