"""Metric computation and the iteration-metric registry."""

from paqarin_spark.metrics.registry import MetricManager, mean_absolute_error

__all__ = ["MetricManager", "mean_absolute_error"]
