"""Generator API: the Spark-native analogue of the reference's
`TimeSeriesGenerator` / `GeneratorParameters` surface
(`paqarin/generator.py:52-98`, `paqarin/adapter.py:33-61`).

Shape differences by design (SURVEY.md §1.1, §3 entry point 2):
- ``generate`` returns ONE DataFrame ``(sequence_id, sequence)`` with
  ``sequence: array<struct<...>>`` — never a Python list of frames.
- fitted state is small DataFrames/JSON (windows parquet + scaler
  min/max), never a pickle (`adapters/ydata_adapter.py:255-264` is the
  pickle path we replace).
"""

from __future__ import annotations

import json
import os
from abc import ABC, abstractmethod
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession

from paqarin_spark.schema import TimeSeriesSchema


@dataclass
class GeneratorParameters:
    """Analogue of the reference's parameter objects
    (`paqarin/generators/timegan.py:42-70`): data roles come from
    ``schema``; training knobs are per-provider kwargs."""

    schema: TimeSeriesSchema
    sequence_length: int = 8
    seed: int = 42
    provider_options: dict = field(default_factory=dict)

    def to_json(self) -> str:
        d = asdict(self)
        return json.dumps(d, default=str)


class TimeSeriesGenerator(ABC):
    """fit → generate contract (`paqarin/generator.py:65-98`).

    ``generate`` must be lazy (returns a DataFrame; the caller decides
    when to act) and deterministic given ``seed``.
    """

    provider: str = "abstract"
    method: str = "abstract"

    def __init__(self, parameters: GeneratorParameters):
        self.parameters = parameters

    @property
    @abstractmethod
    def is_fitted(self) -> bool:
        ...

    @abstractmethod
    def fit(self, training_data: DataFrame) -> "TimeSeriesGenerator":
        ...

    @abstractmethod
    def generate(self, number_of_sequences: int, seed: int | None = None) -> DataFrame:
        ...

    def save(self, path: str) -> None:  # pragma: no cover - provider-specific
        raise NotImplementedError(f"{type(self).__name__} does not persist")

    @classmethod
    def load(
        cls, spark: SparkSession, path: str
    ) -> "TimeSeriesGenerator":  # pragma: no cover
        raise NotImplementedError(f"{cls.__name__} does not persist")


def generate_rounds(
    generator: TimeSeriesGenerator,
    number_of_sequences: int,
    rounds: int,
    base_seed: int | None = None,
) -> DataFrame:
    """Op H2 (`paqarin/metrics/univariate_metrics.py:332-359`,
    `paqarin/metrics/multivariate_metrics.py:239-260`): repeated
    generation rounds unioned into one DataFrame, with globally unique
    ``sequence_id`` (round r occupies [r*n, (r+1)*n)). Each round uses
    an independent derived seed — one lazy union, no driver-side list.
    """
    from pyspark.sql import functions as F

    seed0 = generator.parameters.seed if base_seed is None else base_seed
    out: DataFrame | None = None
    for r in range(rounds):
        batch = generator.generate(number_of_sequences, seed=seed0 + r)
        batch = batch.withColumn(
            "sequence_id",
            (F.col("sequence_id") + F.lit(r * number_of_sequences)).cast("long"),
        )
        out = batch if out is None else out.unionByName(batch)
    if out is None:
        raise ValueError("rounds must be >= 1")
    return out


def _write_params(
    path: str,
    parameters: GeneratorParameters,
    extra: dict,
    spark: SparkSession | None = None,
) -> None:
    """Persist the generator sidecar JSON. Local and ``file://`` paths
    write directly; any other scheme goes through the Hadoop FileSystem
    API (op A5) when a session is available — so ``save(path)`` works
    with an ``s3a://``/``gs://`` model dir exactly like the DataFrame
    state writers already do."""
    meta = {
        "schema": {
            "item_id_columns": list(parameters.schema.item_id_columns),
            "timestamp_column": parameters.schema.timestamp_column,
            "value_columns": list(parameters.schema.value_columns),
            "attribute_columns": list(parameters.schema.attribute_columns),
            "frequency": parameters.schema.frequency,
            "date_format": parameters.schema.date_format,
            "order_columns": list(parameters.schema.order_columns),
        },
        "sequence_length": parameters.sequence_length,
        "seed": parameters.seed,
        "provider_options": parameters.provider_options,
        **extra,
    }
    from paqarin_spark.sources import hadoop_write_text, local_path

    lpath = local_path(path)
    if lpath is None:
        if spark is None:
            raise ValueError(f"remote model path {path!r} requires a SparkSession")
        hadoop_write_text(spark, f"{path.rstrip('/')}/generator.json", json.dumps(meta))
        return
    os.makedirs(lpath, exist_ok=True)
    with open(os.path.join(lpath, "generator.json"), "w", encoding="utf-8") as fh:
        json.dump(meta, fh)


def _read_params(
    path: str, spark: SparkSession | None = None
) -> tuple[GeneratorParameters, dict]:
    from paqarin_spark.sources import hadoop_read_text, local_path

    lpath = local_path(path)
    if lpath is None:
        if spark is None:
            raise ValueError(f"remote model path {path!r} requires a SparkSession")
        meta = json.loads(
            hadoop_read_text(spark, f"{path.rstrip('/')}/generator.json")
        )
    else:
        with open(os.path.join(lpath, "generator.json"), encoding="utf-8") as fh:
            meta = json.load(fh)
    s = meta["schema"]
    schema = TimeSeriesSchema(
        item_id_columns=tuple(s["item_id_columns"]),
        timestamp_column=s["timestamp_column"],
        value_columns=tuple(s["value_columns"]),
        attribute_columns=tuple(s["attribute_columns"]),
        frequency=s["frequency"],
        date_format=s["date_format"],
        order_columns=tuple(s["order_columns"]),
    )
    params = GeneratorParameters(
        schema=schema,
        sequence_length=meta["sequence_length"],
        seed=meta["seed"],
        provider_options=meta["provider_options"],
    )
    return params, meta
