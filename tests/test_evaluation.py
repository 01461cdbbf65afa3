"""Evaluation pipeline (op K2) golden contracts
(`/root/reference/tests/test_evaluation.py:11-38`): already-trained
generators are skipped; summary rows appear per generator; best is the
argmin of average predictive score."""

from __future__ import annotations

import datetime as dt

import pytest

from paqarin_spark.adapter import get_generator_adapter
from paqarin_spark.evaluation import (
    EvaluationPipeline,
    LinearLastStepForecaster,
    MultivariatePredictiveScorer,
    TRAIN_ON_REAL,
)
from paqarin_spark.generator import GeneratorParameters
from paqarin_spark.schema import TimeSeriesSchema

SCHEMA = TimeSeriesSchema(
    item_id_columns=("item_id",),
    timestamp_column="ts",
    value_columns=("v",),
    frequency="D",
)


@pytest.fixture(scope="module")
def training(spark):
    rows = []
    for item_n, item in enumerate(("a", "b", "c")):
        for i in range(20):
            rows.append(
                (item, dt.datetime(2020, 1, 1) + dt.timedelta(days=i), float((i * (item_n + 1)) % 7))
            )
    return spark.createDataFrame(rows, "item_id string, ts timestamp, v double")


def _pipeline():
    p = GeneratorParameters(schema=SCHEMA, sequence_length=4, seed=3)
    gens = {
        "bootstrap": get_generator_adapter("paqarin_spark", "bootstrap", p),
        "gaussian": get_generator_adapter("paqarin_spark", "gaussian", p),
    }
    scorer = MultivariatePredictiveScorer(
        sequence_length=4, iterations=2, number_of_sequences=10
    )
    return EvaluationPipeline(gens, scorer)


def test_pipeline_fits_scores_and_ranks(training):
    pipe = _pipeline().fit(training)
    gens = {r["generator"] for r in pipe.scorer.metric_manager.summary("predictive_score").collect()}
    assert gens == {"bootstrap", "gaussian", TRAIN_ON_REAL}
    assert pipe.best_generator_name in ("bootstrap", "gaussian")
    assert pipe.best_generator is pipe.generator_map[pipe.best_generator_name]
    names = {row["generator"] for row in pipe.training_results}
    assert names == {"bootstrap", "gaussian", TRAIN_ON_REAL}
    for row in pipe.training_results:
        assert row["avg_predictive_score"] is not None


def test_pipeline_skips_trained_generators(training):
    pipe = _pipeline()
    boot = pipe.generator_map["bootstrap"]
    boot.fit(training)
    fitted_windows = boot._windows
    pipe.fit(training)
    # fit() must not re-train an already-fitted generator (golden).
    assert boot._windows is fitted_windows


def test_linear_forecaster_learns_identity(spark):
    # label == last feature step -> a=1, b=0, MAE 0.
    rows = [
        ([{"v": 1.0}, {"v": 2.0}], {"v": 2.0}),
        ([{"v": 3.0}, {"v": 4.0}], {"v": 4.0}),
        ([{"v": 5.0}, {"v": 6.0}], {"v": 6.0}),
    ]
    df = spark.createDataFrame(
        rows, "features array<struct<v:double>>, label struct<v:double>"
    )
    model = LinearLastStepForecaster(["v"]).fit(df)
    a, b = model.coef["v"]
    assert a == pytest.approx(1.0)
    assert b == pytest.approx(0.0)
    assert model.evaluate_mae(df) == pytest.approx(0.0)
