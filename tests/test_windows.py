"""Port of the windowing/split golden tests
(`/root/reference/tests/test_multivariate_metrics.py:36-85`,
`/root/reference/tests/test_univariate_metrics.py:152-174`,
`/root/reference/tests/test_doppleganger.py:135-147`)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from paqarin_spark.operators import (
    attach_date_index,
    forecast_horizon,
    positional_split,
    sliding_windows,
    tail_trim,
    window_starts,
    xy_split,
)
from paqarin_spark.schema import TimeSeriesSchema

SCHEMA = TimeSeriesSchema(
    item_id_columns=("item_id",),
    timestamp_column="ts",
    value_columns=("v",),
    frequency="D",
)


def _series(spark, item: str, n: int, base: float = 0.0):
    start = dt.datetime(2020, 1, 1)
    return [
        (item, start + dt.timedelta(days=i), base + float(i)) for i in range(n)
    ]


@pytest.fixture(scope="module")
def ten_days(spark):
    return spark.createDataFrame(
        _series(spark, "item_1", 10) + _series(spark, "item_2", 5, base=100.0),
        "item_id string, ts timestamp, v double",
    )


def test_sliding_window_count(ten_days):
    # n - L + 1 windows per entity (stride 1, golden F3 contract).
    out = sliding_windows(ten_days, SCHEMA, sequence_length=3)
    counts = {r["item_id"]: r["n"] for r in out.groupBy("item_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"item_1": 8, "item_2": 3}


def test_sliding_window_contents_oldest_first(ten_days):
    out = sliding_windows(ten_days, SCHEMA, sequence_length=3)
    first = out.where((F.col("item_id") == "item_1") & (F.col("sequence_id") == 0)).collect()[0]
    assert [s["v"] for s in first["sequence"]] == [0.0, 1.0, 2.0]


def test_sliding_window_stride(ten_days):
    out = sliding_windows(ten_days, SCHEMA, sequence_length=3, stride=2)
    one = out.where(F.col("item_id") == "item_1")
    # starts at ordinals 0,2,4,6 -> 4 windows
    assert one.count() == 4


def test_window_starts_matches_sliding(ten_days):
    ws = window_starts(ten_days, SCHEMA, sequence_length=3)
    sw = sliding_windows(ten_days, SCHEMA, sequence_length=3)
    assert ws.count() == sw.count()


def test_xy_split_golden(spark):
    # Reference golden (test_multivariate_metrics.py:36-62): sequences of
    # length 3, features = first 2 steps, label = last step.
    seqs = [
        ("s0", [(0.0, 0.0), (1.0, 10.0), (2.0, 20.0)]),
        ("s1", [(2.0, 20.0), (3.0, 30.0), (4.0, 40.0)]),
    ]
    df = spark.createDataFrame(
        seqs, "sequence_id string, sequence array<struct<a:double,b:double>>"
    )
    out = {r["sequence_id"]: r for r in xy_split(df, 3).collect()}
    assert [(s["a"], s["b"]) for s in out["s0"]["features"]] == [(0.0, 0.0), (1.0, 10.0)]
    assert (out["s0"]["label"]["a"], out["s0"]["label"]["b"]) == (2.0, 20.0)
    assert (out["s1"]["label"]["a"], out["s1"]["label"]["b"]) == (4.0, 40.0)


def test_positional_split_golden(spark):
    # Reference golden (test_multivariate_metrics.py:65-85): n=3,
    # training_size=0.4 -> t=1 train, 1 valid, 1 test.
    df = spark.createDataFrame([(i,) for i in range(1, 4)], "ordinal long")
    out = positional_split(df, "ordinal", training_size=0.4)
    got = {r["ordinal"]: r["split"] for r in out.collect()}
    assert got == {1: "train", 2: "valid", 3: "test"}


def test_positional_split_75(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 17)], "ordinal long")
    out = positional_split(df, "ordinal", training_size=0.75)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"train": 12, "valid": 2, "test": 2}


def test_tail_trim_golden(ten_days):
    # Reference: slice_by_timestep(None, -p) drops last p steps/entity.
    out = tail_trim(ten_days, SCHEMA, prediction_length=2)
    counts = {r["item_id"]: r["n"] for r in out.groupBy("item_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"item_1": 8, "item_2": 3}
    # kept rows are the OLDEST n-p rows
    kept = sorted(
        r["v"] for r in out.where(F.col("item_id") == "item_1").collect()
    )
    assert kept == [float(i) for i in range(8)]


def test_forecast_horizon(ten_days):
    out = forecast_horizon(ten_days, SCHEMA, prediction_length=3)
    rows = out.where(F.col("item_id") == "item_2").orderBy("ts").collect()
    # item_2 ends 2020-01-05; horizon = 06, 07, 08.
    assert [r["ts"].day for r in rows] == [6, 7, 8]
    assert len(rows) == 3


def test_attach_date_index(spark):
    # Reference golden (test_doppleganger.py:135-147): every generated
    # sequence gets the same timestamp vector.
    seqs = [
        (0, [(1.0,), (2.0,), (3.0,)]),
        (1, [(4.0,), (5.0,), (6.0,)]),
    ]
    df = spark.createDataFrame(seqs, "sequence_id long, sequence array<struct<v:double>>")
    out = attach_date_index(df, SCHEMA, start="2020-05-01")
    rows = out.orderBy("sequence_id", "step").collect()
    days = sorted({str(r["ts"])[:10] for r in rows})
    assert days == ["2020-05-01", "2020-05-02", "2020-05-03"]
    assert [r["v"] for r in rows if r["sequence_id"] == 1] == [4.0, 5.0, 6.0]


def test_distributed_ntile_matches_global_ntile(spark):
    """distributed_ntile must be BIT-IDENTICAL to F.ntile over the
    same total order — sizes (first N mod k tiles get one extra row)
    and tie handling included — while never sorting the whole relation
    on one task."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from paqarin_spark.operators import distributed_ntile

    # adversarial shapes: duplicates straddling bucket edges, N not
    # divisible by k, k > N, single distinct value (degenerate range)
    rows = [(i, float((i * 7919) % 97)) for i in range(101)]
    rows += [(200 + i, 42.0) for i in range(13)]  # heavy tie block
    df = spark.createDataFrame(rows, "rid long, v double")
    for k in (1, 3, 10, 7):
        got = {
            r.rid: r.tile
            for r in distributed_ntile(
                df, ["v", "rid"], k, num_buckets=8
            ).collect()
        }
        want = {
            r.rid: r.t
            for r in df.select(
                "rid", F.ntile(k).over(Window.orderBy("v", "rid")).alias("t")
            ).collect()
        }
        assert got == want, f"k={k}"
    # k > N and constant column (zero-width range -> one bucket)
    tiny = spark.createDataFrame([(1, 5.0), (2, 5.0), (3, 5.0)], "rid long, v double")
    got = {
        r.rid: r.tile
        for r in distributed_ntile(tiny, ["v", "rid"], 5).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3}
