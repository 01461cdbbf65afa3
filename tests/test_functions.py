"""Scalar functions G1-G9: format translation, weekend covariate,
null fill, prefixing (SURVEY.md §2)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from paqarin_spark.functions import (
    add_prefix,
    constant_column,
    fill_nulls,
    format_ts,
    is_weekend,
    parse_ts,
    strip_prefix,
    truncate_day,
)
from paqarin_spark.schema import strftime_to_java


def test_strftime_translation():
    assert strftime_to_java("%d/%m/%Y") == "dd/MM/yyyy"
    assert strftime_to_java("%Y-%m-%d %H:%M:%S.%f") == "yyyy-MM-dd HH:mm:ss.SSSSSS"
    with pytest.raises(ValueError):
        strftime_to_java("%Q")


def test_parse_format_roundtrip(spark):
    df = spark.createDataFrame([("26/10/2018",)], "d string")
    parsed = df.select(parse_ts(F.col("d"), "%d/%m/%Y").alias("ts"))
    assert parsed.collect()[0]["ts"] == dt.datetime(2018, 10, 26)
    back = parsed.select(format_ts(F.col("ts"), "%d/%m/%Y").alias("d"))
    assert back.collect()[0]["d"] == "26/10/2018"


def test_wrong_format_is_error_not_coercion(spark):
    # Reference contract: wrong date format raises
    # (`/root/reference/tests/test_synthcity_adapter.py:135-145`).
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame([("2018-10-26",)], "d string")
    with pytest.raises(Exception):
        df.select(parse_ts(F.col("d"), "%d/%m/%Y").alias("ts")).collect()


def test_is_weekend_remap(spark):
    # 2020-01-04 Sat, 2020-01-05 Sun, 2020-01-06 Mon.
    df = spark.createDataFrame(
        [(dt.datetime(2020, 1, 4),), (dt.datetime(2020, 1, 5),), (dt.datetime(2020, 1, 6),)],
        "ts timestamp",
    )
    got = [r["w"] for r in df.select(is_weekend(F.col("ts")).alias("w")).collect()]
    assert got == [1.0, 1.0, 0.0]


def test_truncate_day(spark):
    df = spark.createDataFrame([(dt.datetime(2020, 1, 4, 13, 45),)], "ts timestamp")
    got = df.select(truncate_day(F.col("ts")).alias("d")).collect()[0]["d"]
    assert got == dt.datetime(2020, 1, 4)


def test_fill_and_constant_and_prefix(spark):
    df = spark.createDataFrame([(None,), (2.0,)], "v double")
    filled = fill_nulls(df, 0.0)
    assert sorted(r["v"] for r in filled.collect()) == [0.0, 2.0]

    with_c = constant_column(df, "outcome", 0)
    assert all(r["outcome"] == 0 for r in with_c.collect())

    pref = add_prefix(df, "seq_temporal_", ["v"])
    assert pref.columns == ["seq_temporal_v"]
    assert strip_prefix(pref, "seq_temporal_").columns == ["v"]
