"""Plotting utilities (reference `utils/data_plots.py:17-108`,
`metrics/univariate_metrics.py:479-538`).

Spark-first split: the ENGINE work is preparing plot-ready frames —
distributed filters/aggregations that reduce a billion-row table to
the handful of points a figure can show — and only that tiny result
crosses ``toPandas()``. RENDERING is client-side matplotlib behind an
import gate (``plot_*`` functions raise a clear ImportError when
matplotlib is absent, e.g. on a cluster edge node); every ``*_data``
function returns the exact pandas frame the corresponding reference
plot draws, so callers can hand it to any plotting stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paqarin_spark.operators.windows import SEQUENCE, SEQUENCE_ID

MARKER = "*"
LINE_STYLE = "dashed"


def _require_matplotlib():
    try:
        from matplotlib import pyplot as plt
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "plot_* rendering requires matplotlib, which is not "
            "installed; use the *_data companions to get the prepared "
            "pandas frames and render them with your own plotting stack"
        ) from exc
    return plt


def sequence_comparison_data(
    real: DataFrame,
    synthetic: DataFrame,
    columns: list[str],
    sequence_id: int = 0,
):
    """Data for `plot_and_compare` (`utils/data_plots.py:36-48`): one
    real and one synthetic sequence side by side, one Real_<col> /
    Synthetic_<col> column pair per value column, indexed by step.
    Inputs are ``(sequence_id, sequence)`` frames; only the two chosen
    sequences are exploded and collected."""

    def one(df: DataFrame, label: str):
        rows = (
            df.where(F.col(SEQUENCE_ID) == sequence_id)
            .select(F.posexplode(SEQUENCE).alias("step", "_obs"))
            .select("step", *[F.col(f"_obs.{c}").alias(c) for c in columns])
            .orderBy("step")
            .toPandas()
            .set_index("step")
        )
        return rows.rename(columns={c: f"{label}_{c}" for c in columns})

    return one(real, "Real").join(one(synthetic, "Synthetic"))


def metrics_boxplot_data(metric_manager, metric_key: str):
    """Data for `plot_metrics` (`utils/data_plots.py:95-108`): one
    column per generator holding its per-iteration metric values. The
    registry is driver-side already — no Spark job."""
    import pandas as pd

    return pd.DataFrame(metric_manager.get_all_values(metric_key))


def forecast_plot_data(
    train_panel: DataFrame,
    actuals_panel: DataFrame,
    predictions: DataFrame,
    item_ids: list[str],
    quantiles: tuple[float, float] = (0.1, 0.9),
):
    """Data for `plot_forecast` (`metrics/univariate_metrics.py:479-538`):
    per requested item, the past values, the real held-out values, and
    the mean prediction. Quantile bands come from the per-timestamp
    spread of ``target_pred`` across prediction variants when
    ``predictions`` carries several rows per (item, timestamp) (e.g.
    one per iteration); with a single prediction the band collapses to
    the mean — same shape the reference draws from AutoGluon's quantile
    columns. Only the chosen items' rows are collected."""
    from paqarin_spark.metrics.univariate import ITEM_ID, TARGET, TIMESTAMP

    lo, hi = quantiles
    wanted = F.col(ITEM_ID).isin([str(i) for i in item_ids] + list(item_ids))
    past = (
        train_panel.where(wanted)
        .select(ITEM_ID, TIMESTAMP, F.col(TARGET).alias("past"))
        .orderBy(ITEM_ID, TIMESTAMP)
        .toPandas()
    )
    real = (
        actuals_panel.where(wanted)
        .select(ITEM_ID, TIMESTAMP, F.col(TARGET).alias("real"))
        .orderBy(ITEM_ID, TIMESTAMP)
        .toPandas()
    )
    fcst = (
        predictions.where(wanted)
        .groupBy(ITEM_ID, TIMESTAMP)
        .agg(
            F.avg("target_pred").alias("mean"),
            F.percentile_approx("target_pred", lo).alias(str(lo)),
            F.percentile_approx("target_pred", hi).alias(str(hi)),
        )
        .orderBy(ITEM_ID, TIMESTAMP)
        .toPandas()
    )
    return {"past": past, "real": real, "forecast": fcst}


def plot_column_comparison(
    real: DataFrame,
    synthetic: DataFrame,
    column_name: str,
    sequence_id: int = 0,
    figure_size: tuple[int, int] = (10, 6),
):
    """Render one real-vs-synthetic column (`utils/data_plots.py:51-69`)."""
    plt = _require_matplotlib()
    frame = sequence_comparison_data(real, synthetic, [column_name], sequence_id)
    frame.plot(
        title=column_name, marker=MARKER, linestyle=LINE_STYLE, figsize=figure_size
    )
    plt.show()


def plot_metrics(metric_manager, metric_key: str):
    """Render the per-generator metric boxplot
    (`utils/data_plots.py:95-108`)."""
    plt = _require_matplotlib()
    frame = metrics_boxplot_data(metric_manager, metric_key)
    plt.boxplot(frame)
    plt.xticks(range(1, len(frame.columns) + 1), frame.columns.to_list())
    plt.show()


def plot_forecast(
    train_panel: DataFrame,
    actuals_panel: DataFrame,
    predictions: DataFrame,
    item_ids: list[str],
    figure_size: tuple[int, int] = (20, 3),
):
    """Render per-item past/forecast/real panels with a quantile band
    (`metrics/univariate_metrics.py:479-538`)."""
    from paqarin_spark.metrics.univariate import ITEM_ID, TIMESTAMP

    plt = _require_matplotlib()
    data = forecast_plot_data(train_panel, actuals_panel, predictions, item_ids)
    _, axes = plt.subplots(
        nrows=len(item_ids), figsize=figure_size, sharex=True, squeeze=False
    )
    for index, item_id in enumerate(item_ids):
        axis = axes[index][0]
        axis.set_title(f"Item: {item_id}")
        sel_p = data["past"][data["past"][ITEM_ID] == str(item_id)]
        sel_r = data["real"][data["real"][ITEM_ID] == str(item_id)]
        sel_f = data["forecast"][data["forecast"][ITEM_ID] == str(item_id)]
        axis.plot(sel_p[TIMESTAMP], sel_p["past"], marker=MARKER,
                  linestyle=LINE_STYLE, label="Past values")
        axis.plot(sel_f[TIMESTAMP], sel_f["mean"], marker=MARKER,
                  linestyle=LINE_STYLE, label="Mean forecast")
        axis.plot(sel_r[TIMESTAMP], sel_r["real"], marker=MARKER,
                  linestyle=LINE_STYLE, label="Real values")
        axis.fill_between(
            sel_f[TIMESTAMP],
            sel_f[str(0.1)],
            sel_f[str(0.9)],
            alpha=0.1,
            label="Confidence Interval",
            color="red",
        )
    plt.legend(loc="upper left")
    plt.show()
