"""Spark-native generation providers (SURVEY.md §7 step 3)."""

from paqarin_spark.generators.bootstrap import BlockBootstrapGenerator
from paqarin_spark.generators.gaussian import GaussianPerStepGenerator

__all__ = ["BlockBootstrapGenerator", "GaussianPerStepGenerator"]
