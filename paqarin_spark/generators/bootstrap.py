"""Block-bootstrap time-series generator: the dependency-free
Spark-native provider (SURVEY.md §7 step 3 'ship one dependency-free
provider first').

Semantics: ``fit`` preprocesses the real data exactly like the deep
providers do (scale via op G4, stride-1 windows via op F3 — the same
pipeline as `paqarin/adapters/ydata_adapter.py:233-239,267-288`) and
keeps the resulting window population as a DataFrame; ``generate(n)``
draws n windows by deterministic hash-rank (seeded, reproducible,
cluster-stable — no ``orderBy(rand())`` nondeterminism across retries)
and inverse-scales them (op G5).

Everything is DataFrame ops; fitted state persists as parquet + JSON —
runs on any cluster with zero TF/torch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from paqarin_spark.generator import (
    GeneratorParameters,
    TimeSeriesGenerator,
    _read_params,
    _write_params,
)
from paqarin_spark.operators.resample import parse_timestamps
from paqarin_spark.operators.scaling import MinMaxScaler, MinMaxState
from paqarin_spark.operators.windows import SEQUENCE, SEQUENCE_ID, sliding_windows


def scale_sequence_column(
    df: DataFrame,
    state: MinMaxState,
    columns: list[str],
    inverse: bool,
    sequence_column: str = SEQUENCE,
) -> DataFrame:
    """Apply (inverse) min-max scaling inside an array<struct> sequence
    column — op G5 lifted over sequences, pure transform expressions."""

    def remap(x):
        fields = []
        for c in columns:
            mn, mx = state.column_range[c]
            if inverse:
                expr = x[c] * F.lit(mx - mn) + F.lit(mn)
            else:
                expr = (
                    F.lit(0.0)
                    if mx == mn
                    else (x[c] - F.lit(mn)) / F.lit(mx - mn)
                )
            fields.append(expr.alias(c))
        return F.struct(*fields)

    return df.withColumn(sequence_column, F.transform(F.col(sequence_column), remap))


class BlockBootstrapGenerator(TimeSeriesGenerator):
    provider = "paqarin_spark"
    method = "bootstrap"

    def __init__(self, parameters: GeneratorParameters):
        super().__init__(parameters)
        self._windows: DataFrame | None = None
        self.scaler = MinMaxScaler(list(parameters.schema.value_columns))

    @property
    def is_fitted(self) -> bool:
        return self._windows is not None

    def fit(self, training_data: DataFrame) -> "BlockBootstrapGenerator":
        schema = self.parameters.schema
        parsed = parse_timestamps(training_data, schema)
        if not self.scaler.is_fitted:
            self.scaler.fit(parsed)
        scaled = self.scaler.transform(parsed)
        # Persist the window population: ``generate`` is called
        # repeatedly (H2 generation rounds, scorer iterations) and each
        # call would otherwise recompute the full window pipeline.
        self._windows = (
            sliding_windows(scaled, schema, self.parameters.sequence_length)
            .select(
                F.concat_ws(
                    "|", *[F.col(c).cast("string") for c in schema.ids], SEQUENCE_ID
                ).alias("_window_key"),
                F.col(SEQUENCE),
            )
            .persist()
        )
        return self

    def unpersist(self) -> None:
        if self._windows is not None:
            self._windows.unpersist()

    def generate(self, number_of_sequences: int, seed: int | None = None) -> DataFrame:
        if self._windows is None:
            raise RuntimeError("generator is not fitted")
        seed = self.parameters.seed if seed is None else seed
        # Deterministic sample: md5(key, seed) rank — stable under
        # retries/re-partitioning, unlike rand(). The global sort runs
        # over window KEYS only (TakeOrderedAndProject for the limit).
        ranked = self._windows.withColumn(
            "_r", F.md5(F.concat_ws("#", F.col("_window_key"), F.lit(str(seed))))
        )
        sampled = ranked.orderBy("_r").limit(number_of_sequences)
        out = sampled.select(
            (F.row_number().over(Window.orderBy("_r")) - 1).alias(SEQUENCE_ID),
            SEQUENCE,
        )
        return scale_sequence_column(
            out,
            self.scaler.state,
            list(self.parameters.schema.value_columns),
            inverse=True,
        )

    def save(self, path: str) -> None:
        if self._windows is None:
            raise RuntimeError("generator is not fitted")
        spark = self._windows.sparkSession
        _write_params(
            path,
            self.parameters,
            {"provider": self.provider, "method": self.method},
            spark=spark,
        )
        self.scaler.state.save(os.path.join(path, "scaler.json"), spark=spark)
        self._windows.write.mode("overwrite").parquet(os.path.join(path, "windows.parquet"))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "BlockBootstrapGenerator":
        params, _ = _read_params(path, spark=spark)
        gen = cls(params)
        gen.scaler.state = MinMaxState.load(
            os.path.join(path, "scaler.json"), spark=spark
        )
        gen._windows = spark.read.parquet(os.path.join(path, "windows.parquet"))
        return gen
