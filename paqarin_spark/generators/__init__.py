"""Spark-native generation providers (SURVEY.md §7 step 3) and the
deep-provider data-contract views."""

from paqarin_spark.generators.adversarial import GANWindowGenerator
from paqarin_spark.generators.bootstrap import BlockBootstrapGenerator
from paqarin_spark.generators.conditional import ConditionalBootstrapGenerator
from paqarin_spark.generators.deep import DeepProviderGenerator
from paqarin_spark.generators.gaussian import GaussianPerStepGenerator
from paqarin_spark.generators.markov import MarkovEventGenerator
from paqarin_spark.generators.neural import ARNetGenerator
from paqarin_spark.generators.recurrent import GRUNetGenerator
from paqarin_spark.generators.views import (
    SynthcityLoaderViews,
    add_prefixes,
    par_context,
    strip_prefixes,
    synthcity_loader_views,
)

__all__ = [
    "ARNetGenerator",
    "GANWindowGenerator",
    "GRUNetGenerator",
    "BlockBootstrapGenerator",
    "ConditionalBootstrapGenerator",
    "DeepProviderGenerator",
    "GaussianPerStepGenerator",
    "MarkovEventGenerator",
    "SynthcityLoaderViews",
    "add_prefixes",
    "par_context",
    "strip_prefixes",
    "synthcity_loader_views",
]
