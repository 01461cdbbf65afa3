"""Provider/method dispatch registry (SURVEY.md §2 ops K1/K3).

Reference: `paqarin/adapter.py:17-31,64-97` — an enum-dispatch table
with lazy imports and ``ValueError`` for invalid combinations (golden
`tests/test_adapter.py:9-59`, `tests/test_par.py:65-69`). Here it is a
plain ``{(provider, method): factory}`` dict; deep-learning providers
(ydata/synthcity/sdv) register only if their libraries import, so the
engine stays dependency-free by default.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession

from paqarin_spark.generator import GeneratorParameters, TimeSeriesGenerator
from paqarin_spark.generators.bootstrap import BlockBootstrapGenerator
from paqarin_spark.generators.conditional import ConditionalBootstrapGenerator
from paqarin_spark.generators.gaussian import GaussianPerStepGenerator
from paqarin_spark.generators.markov import MarkovEventGenerator
from paqarin_spark.generators.neural import ARNetGenerator
from paqarin_spark.generators.adversarial import GANWindowGenerator
from paqarin_spark.generators.recurrent import GRUNetGenerator

Factory = Callable[[GeneratorParameters], TimeSeriesGenerator]

_REGISTRY: dict[tuple[str, str], Factory] = {
    ("paqarin_spark", "arnet"): ARNetGenerator,
    ("paqarin_spark", "grunet"): GRUNetGenerator,
    ("paqarin_spark", "gan"): GANWindowGenerator,
    ("paqarin_spark", "bootstrap"): BlockBootstrapGenerator,
    ("paqarin_spark", "conditional_bootstrap"): ConditionalBootstrapGenerator,
    ("paqarin_spark", "gaussian"): GaussianPerStepGenerator,
    ("paqarin_spark", "markov"): MarkovEventGenerator,
}

# The reference's 3x3 provider/method grid has 5 valid cells
# (`paqarin/adapter.py:64-97`): ydata x {timegan, doppleganger},
# synthcity x timegan, sdv x par. Each cell dispatches to the
# applyInPandas-hosted DeepProviderGenerator (generators/deep.py),
# which carries the reference adapters' parameter translation; its
# constructor raises ImportError naming the missing library when the
# provider package is absent, so the dependency-free default is kept.


def _deep(provider: str, method: str) -> Factory:
    def factory(parameters: GeneratorParameters) -> TimeSeriesGenerator:
        from paqarin_spark.generators.deep import DeepProviderGenerator

        return DeepProviderGenerator(parameters, provider, method)

    def load(spark: SparkSession, path: str) -> TimeSeriesGenerator:
        from paqarin_spark.generators.deep import DeepProviderGenerator

        return DeepProviderGenerator.load(spark, path)

    factory.load = load  # type: ignore[attr-defined] — load_generator dispatch
    return factory


for _provider, _method in [
    ("ydata", "timegan"),
    ("ydata", "doppleganger"),
    ("synthcity", "timegan"),
    ("sdv", "par"),
]:
    _REGISTRY[(_provider, _method)] = _deep(_provider, _method)


def register_generator(provider: str, method: str, factory: Factory) -> None:
    """Extension point: plug in a provider (e.g. an applyInPandas-hosted
    deep model) without touching the engine."""
    _REGISTRY[(provider, method)] = factory


def get_generator_adapter(
    provider: str, method: str, parameters: GeneratorParameters
) -> TimeSeriesGenerator:
    """Op K1. Invalid (provider, method) raises ValueError — the
    reference contract (`tests/test_adapter.py:9-59`)."""
    key = (provider, method)
    if key not in _REGISTRY:
        raise ValueError(
            f"No generator for provider={provider!r} method={method!r}; "
            f"valid: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[key](parameters)


def load_generator(
    spark: SparkSession, provider: str, method: str, path: str
) -> TimeSeriesGenerator:
    """Op K3 (`paqarin/adapter.py:100-111`): reconstruct a persisted
    generator. State is parquet + JSON, never a pickle."""
    key = (provider, method)
    if key not in _REGISTRY:
        raise ValueError(
            f"No generator for provider={provider!r} method={method!r}"
        )
    cls = _REGISTRY[key]
    if not hasattr(cls, "load"):
        raise NotImplementedError(f"{provider}/{method} does not support load")
    return cls.load(spark, path)  # type: ignore[union-attr]
