"""Port of the metric-registry golden tests
(`/root/reference/tests/test_evaluation.py:41-70`): per-generator
mean / population std across iterations, best-generator argmin."""

from __future__ import annotations

import math

import pytest

from paqarin_spark.metrics.registry import MetricManager, mean_absolute_error


@pytest.fixture()
def manager(spark):
    m = MetricManager(spark)
    m.register_iteration("gen_a", 0, {"mae": 1.0})
    m.register_iteration("gen_a", 1, {"mae": 3.0})
    m.register_iteration("gen_b", 0, {"mae": 2.0})
    m.register_iteration("gen_b", 1, {"mae": 2.0})
    return m


def test_average_and_population_std(manager):
    assert manager.calculate_average("gen_a", "mae") == 2.0
    # population std (ddof=0): sqrt(((1-2)^2 + (3-2)^2)/2) = 1.0
    assert math.isclose(manager.calculate_standard_deviation("gen_a", "mae"), 1.0)
    assert manager.calculate_standard_deviation("gen_b", "mae") == 0.0


def test_summary_matches_local_math(manager):
    rows = {r["generator"]: r for r in manager.summary("mae").collect()}
    assert rows["gen_a"]["avg_mae"] == 2.0
    assert rows["gen_a"]["std_mae"] == 1.0
    assert rows["gen_b"]["std_mae"] == 0.0


def test_best_generator_smaller_wins(manager):
    # gen_a avg 2.0 == gen_b avg 2.0 -> lexicographic tie-break
    assert manager.best_generator("mae") == "gen_a"
    manager.register_iteration("gen_b", 2, {"mae": 0.5})
    assert manager.best_generator("mae") == "gen_b"


def test_get_all_values(manager):
    allv = manager.get_all_values("mae")
    assert allv == {"gen_a": [1.0, 3.0], "gen_b": [2.0, 2.0]}


def test_mean_absolute_error(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (3.0, 1.0)], "label double, pred double"
    )
    assert mean_absolute_error(df, "label", "pred") == 1.5
