"""Forecast error metrics (op I5), generation rounds (op H2), and the
deep-provider parameter translation contracts."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from paqarin_spark.generator import GeneratorParameters, generate_rounds
from paqarin_spark.generators import BlockBootstrapGenerator
from paqarin_spark.generators.params import (
    DoppleGanGerParameters,
    ParParameters,
    TimeGanParameters,
)
from paqarin_spark.metrics.errors import evaluate_forecast
from paqarin_spark.schema import TimeSeriesSchema


def test_evaluate_forecast(spark):
    df = spark.createDataFrame(
        [(2.0, 1.0), (4.0, 5.0), (0.0, 1.0)], "y double, p double"
    )
    m = evaluate_forecast(df, "y", "p")
    assert m["mae"] == pytest.approx(1.0)
    # mape excludes the y=0 row: avg(1/2, 1/4)
    assert m["mape"] == pytest.approx(0.375)
    assert m["rmse"] == pytest.approx(1.0)
    assert m["smape"] == pytest.approx((2 / 3 + 2 / 9 + 2.0) / 3)


def test_generate_rounds(spark):
    rows = []
    for i in range(12):
        rows.append(("a", dt.datetime(2020, 1, 1) + dt.timedelta(days=i), float(i)))
    df = spark.createDataFrame(rows, "item_id string, ts timestamp, v double")
    schema = TimeSeriesSchema(("item_id",), "ts", ("v",), frequency="D")
    gen = BlockBootstrapGenerator(
        GeneratorParameters(schema=schema, sequence_length=4, seed=1)
    ).fit(df)
    out = generate_rounds(gen, number_of_sequences=3, rounds=2)
    rows = out.collect()
    assert len(rows) == 6
    assert sorted(r["sequence_id"] for r in rows) == list(range(6))


def test_timegan_parameter_translation():
    p = TimeGanParameters(
        item_id_column="item",
        timestamp_column="ts",
        numerical_columns=("a", "b"),
        epochs=50,
        batch_size=128,
        learning_rate=1e-3,
        latent_dimension=24,
        gamma=2.0,
    )
    gp = p.to_generator_parameters()
    assert gp.schema.value_columns == ("a", "b")
    assert gp.sequence_length == 24
    assert gp.provider_options == {
        "epochs": 50,
        "batch_size": 128,
        "learning_rate": 1e-3,
        "latent_dimension": 24,
        "gamma": 2.0,
    }


def test_doppleganger_parameter_translation():
    p = DoppleGanGerParameters(
        item_id_column="item",
        timestamp_column="ts",
        measurement_columns=("m",),
        categorical_columns=("c",),
        sample_length=8,
    )
    gp = p.to_generator_parameters()
    assert gp.schema.attribute_columns == ("c",)
    assert gp.provider_options["sample_length"] == 8


def test_par_parameter_translation():
    p = ParParameters(
        item_id_columns=("i1", "i2"),
        timestamp_column="ts",
        numerical_columns=("v",),
        context_columns=("ctx",),
    )
    gp = p.to_generator_parameters()
    assert gp.schema.item_id_columns == ("i1", "i2")
    assert gp.provider_options["context_columns"] == ["ctx"]
