"""Forecast error metrics (SURVEY.md §2 op I5).

Reference: the univariate scorer defers to
``predictor.evaluate(test)`` (`paqarin/metrics/univariate_metrics.py:434-476`);
the metrics themselves are standard aggregations, expressed here as
reusable aggregate expressions (one distributed pass computes all of
them) — avg(abs), avg(abs/y), sqrt(avg(pow)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mae(label, prediction) -> F.Column:
    return F.avg(F.abs(prediction - label))


def mape(label, prediction) -> F.Column:
    """Mean absolute percentage error; rows with label == 0 are
    excluded from the mean (avg ignores nulls)."""
    return F.avg(
        F.when(label != 0, F.abs((prediction - label) / label))
    )


def rmse(label, prediction) -> F.Column:
    return F.sqrt(F.avg(F.pow(prediction - label, F.lit(2))))


def smape(label, prediction) -> F.Column:
    """Symmetric MAPE in [0, 2]; 0/0 rows are excluded."""
    denom = (F.abs(label) + F.abs(prediction)) / F.lit(2.0)
    return F.avg(F.when(denom != 0, F.abs(prediction - label) / denom))


def evaluate_forecast(
    df: DataFrame, label_column: str, prediction_column: str
) -> dict[str, float]:
    """One-pass evaluation: all error metrics from a single action,
    shaped like the reference's ``{metric: value}`` dict."""
    y = F.col(label_column)
    p = F.col(prediction_column)
    row = df.agg(
        mae(y, p).alias("mae"),
        mape(y, p).alias("mape"),
        rmse(y, p).alias("rmse"),
        smape(y, p).alias("smape"),
    ).collect()[0]
    return {k: (None if row[k] is None else float(row[k])) for k in ("mae", "mape", "rmse", "smape")}
