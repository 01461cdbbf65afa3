"""Plot-data preparation (reference utils/data_plots.py:17-108): the
engine side is distributed reduction to a tiny pandas frame; rendering
is import-gated matplotlib (absent here) and raises a clear error."""

from __future__ import annotations

import pytest

from paqarin_spark.metrics.registry import MetricManager
from paqarin_spark.plots import (
    metrics_boxplot_data,
    plot_metrics,
    sequence_comparison_data,
)


@pytest.fixture()
def seq_frames(spark):
    real = spark.createDataFrame(
        [(0, [{"v": 1.0}, {"v": 2.0}, {"v": 3.0}]), (1, [{"v": 9.0}] * 3)],
        "sequence_id long, sequence array<struct<v:double>>",
    )
    synth = spark.createDataFrame(
        [(0, [{"v": 1.5}, {"v": 2.5}, {"v": 3.5}])],
        "sequence_id long, sequence array<struct<v:double>>",
    )
    return real, synth


def test_sequence_comparison_data(seq_frames):
    real, synth = seq_frames
    frame = sequence_comparison_data(real, synth, ["v"], sequence_id=0)
    assert list(frame.columns) == ["Real_v", "Synthetic_v"]
    assert frame["Real_v"].tolist() == [1.0, 2.0, 3.0]
    assert frame["Synthetic_v"].tolist() == [1.5, 2.5, 3.5]
    assert frame.index.tolist() == [0, 1, 2]


def test_metrics_boxplot_data(spark):
    mm = MetricManager(spark)
    mm.register_iteration("g1", 0, {"mae": 1.0})
    mm.register_iteration("g1", 1, {"mae": 3.0})
    mm.register_iteration("g2", 0, {"mae": 2.0})
    mm.register_iteration("g2", 1, {"mae": 2.0})
    frame = metrics_boxplot_data(mm, "mae")
    assert sorted(frame.columns) == ["g1", "g2"]
    assert frame["g1"].tolist() == [1.0, 3.0]


def test_forecast_plot_data(spark):
    from paqarin_spark.plots import forecast_plot_data

    train = spark.createDataFrame(
        [("a", "2024-01-01", 1.0), ("a", "2024-01-02", 2.0), ("b", "2024-01-01", 5.0)],
        "item_id string, timestamp string, target double",
    )
    actual = spark.createDataFrame(
        [("a", "2024-01-03", 3.0)], "item_id string, timestamp string, target double"
    )
    preds = spark.createDataFrame(
        [("a", "2024-01-03", 2.5), ("a", "2024-01-03", 3.5)],
        "item_id string, timestamp string, target_pred double",
    )
    data = forecast_plot_data(train, actual, preds, ["a"])
    assert data["past"]["past"].tolist() == [1.0, 2.0]
    assert data["real"]["real"].tolist() == [3.0]
    assert data["forecast"]["mean"].tolist() == [3.0]
    assert data["forecast"]["0.1"].tolist()[0] <= 2.5
    assert data["forecast"]["0.9"].tolist()[0] >= 3.4


def test_render_requires_matplotlib(spark):
    try:
        import matplotlib  # noqa: F401

        pytest.skip("matplotlib present in this environment")
    except ImportError:
        pass
    mm = MetricManager(spark)
    mm.register_iteration("g1", 0, {"mae": 1.0})
    with pytest.raises(ImportError, match="matplotlib"):
        plot_metrics(mm, "mae")
