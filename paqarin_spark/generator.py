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


def _write_params(path: str, parameters: GeneratorParameters, extra: dict) -> None:
    os.makedirs(path, exist_ok=True)
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
    with open(os.path.join(path, "generator.json"), "w", encoding="utf-8") as fh:
        json.dump(meta, fh)


def _read_params(path: str) -> tuple[GeneratorParameters, dict]:
    with open(os.path.join(path, "generator.json"), encoding="utf-8") as fh:
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
