"""Metric registry + summary (SURVEY.md §2 ops I1, I2, I3, I4, D5).

Reference: ``MetricManager`` dict-of-lists per generator
(`paqarin/evaluation.py:57-104`, golden `tests/test_evaluation.py:41-70`),
summary rows `avg_<metric>` / `std_<metric>` (`paqarin/evaluation.py:125-140`),
best-generator argmin (`paqarin/metrics/multivariate_metrics.py:207-217`).

Spark-native shape: an append-only metrics DataFrame
``(generator, iteration, metric_key, metric_value)``; every registry
query is a filter/aggregation over it. Std is **population** std
(numpy default ddof=0 → ``stddev_pop``, SURVEY.md op D5 pins this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

METRICS_SCHEMA = StructType(
    [
        StructField("generator", StringType(), False),
        StructField("iteration", IntegerType(), False),
        StructField("metric_key", StringType(), False),
        StructField("metric_value", DoubleType(), True),
    ]
)


def mean_absolute_error(
    df: DataFrame, label_column: str, prediction_column: str
) -> float:
    """Op I1: MAE = avg(|pred - label|)
    (`paqarin/metrics/multivariate_metrics.py:219-230`)."""
    row = df.agg(
        F.avg(F.abs(F.col(prediction_column) - F.col(label_column))).alias("mae")
    ).collect()[0]
    return float(row["mae"])


def mae_columns(label, prediction) -> F.Column:
    """MAE as a reusable aggregate expression."""
    return F.avg(F.abs(prediction - label))


class MetricManager:
    """Append-only metric registry (op I2) with distributed summaries.

    Values registered per (generator, iteration, key); summaries are
    ``groupBy(generator)`` aggregations — identical math to the
    reference's ``calculate_average`` (np.mean) and
    ``calculate_standard_deviation`` (np.std, ddof=0).
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._rows: list[tuple[str, int, str, float]] = []

    def register_iteration(
        self, generator: str, iteration: int, values: dict[str, float]
    ) -> None:
        for key, value in values.items():
            self._rows.append((generator, iteration, key, float(value)))

    def to_df(self) -> DataFrame:
        return self.spark.createDataFrame(self._rows, METRICS_SCHEMA)

    def get_iteration_values(self, generator: str, metric_key: str) -> list[float]:
        return [
            v
            for (g, _, k, v) in self._rows
            if g == generator and k == metric_key
        ]

    def get_all_values(self, metric_key: str) -> dict[str, list[float]]:
        out: dict[str, list[float]] = {}
        for g, _, k, v in self._rows:
            if k == metric_key:
                out.setdefault(g, []).append(v)
        return out

    def calculate_average(self, generator: str, metric_key: str) -> float:
        vals = self.get_iteration_values(generator, metric_key)
        return sum(vals) / len(vals)

    def calculate_standard_deviation(self, generator: str, metric_key: str) -> float:
        vals = self.get_iteration_values(generator, metric_key)
        mean = sum(vals) / len(vals)
        return (sum((v - mean) ** 2 for v in vals) / len(vals)) ** 0.5

    def summary(self, metric_key: str) -> DataFrame:
        """Op I3/D5: per-generator avg + population std of a metric.

        The registry holds a handful of driver-registered scalars —
        aggregating them is driver arithmetic (the reference's np.mean
        / np.std ddof=0), not a distributed job; shipping ~12 floats
        through a shuffle costs ~1.5 s of pure job overhead per call.
        Metrics that live in DataFrames at scale aggregate via
        ``groupBy`` directly (see q08)."""
        out = []
        for g in sorted(self.get_all_values(metric_key)):
            out.append(
                (
                    g,
                    round(self.calculate_average(g, metric_key), 6),
                    round(self.calculate_standard_deviation(g, metric_key), 6),
                )
            )
        schema = StructType(
            [
                StructField("generator", StringType(), False),
                StructField(f"avg_{metric_key}", DoubleType(), True),
                StructField(f"std_{metric_key}", DoubleType(), True),
            ]
        )
        return self.spark.createDataFrame(out, schema)

    def best_generator(self, metric_key: str) -> str:
        """Op I4: argmin of the average metric ("smaller wins",
        `paqarin/metrics/multivariate_metrics.py:207-217`)."""
        row = (
            self.summary(metric_key)
            .orderBy(F.col(f"avg_{metric_key}").asc(), F.col("generator").asc())
            .limit(1)
            .collect()
        )
        if not row:
            raise ValueError("no metrics registered")
        return row[0]["generator"]
