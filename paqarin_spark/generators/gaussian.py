"""Per-step Gaussian generator: a second dependency-free provider
(Gaussian-copula-lite per SURVEY.md §7 step 3).

``fit`` learns per-(step, column) mean/std over the scaled window
population (one distributed aggregation); ``generate(n)`` samples
``mean + std * z`` per step with Box–Muller over md5-prefix uniforms
keyed on (sequence, step, column, seed) — layout-INDEPENDENT, unlike
``F.randn`` whose draws depend on partition ids and row order, so the
same seed yields the same sequences on any cluster size, retry, or
repartitioning (the gen5 determinism contract).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paqarin_spark.generator import (
    GeneratorParameters,
    TimeSeriesGenerator,
    _read_params,
    _write_params,
)
from paqarin_spark.operators.resample import parse_timestamps
from paqarin_spark.operators.scaling import MinMaxScaler, MinMaxState
from paqarin_spark.operators.windows import SEQUENCE, SEQUENCE_ID, STEP, sliding_windows


class GaussianPerStepGenerator(TimeSeriesGenerator):
    provider = "paqarin_spark"
    method = "gaussian"

    def __init__(self, parameters: GeneratorParameters):
        super().__init__(parameters)
        self._profile: DataFrame | None = None  # (step, per-col mean/std)
        self.scaler = MinMaxScaler(list(parameters.schema.value_columns))
        self._spark: SparkSession | None = None

    @property
    def is_fitted(self) -> bool:
        return self._profile is not None

    def fit(self, training_data: DataFrame) -> "GaussianPerStepGenerator":
        schema = self.parameters.schema
        parsed = parse_timestamps(training_data, schema)
        if not self.scaler.is_fitted:
            self.scaler.fit(parsed)
        scaled = self.scaler.transform(parsed)
        windows = sliding_windows(scaled, schema, self.parameters.sequence_length)
        exploded = windows.select(
            F.posexplode(SEQUENCE).alias(STEP, "_obs")
        ).select(STEP, "_obs.*")
        aggs = []
        for c in schema.values:
            aggs.append(F.avg(c).alias(f"_mean_{c}"))
            aggs.append(F.coalesce(F.stddev_pop(c), F.lit(0.0)).alias(f"_std_{c}"))
        # The profile is tiny (L rows) but sits on the full window
        # pipeline; persist so repeated generate calls don't recompute.
        self._profile = exploded.groupBy(STEP).agg(*aggs).persist()
        self._spark = training_data.sparkSession
        return self

    def unpersist(self) -> None:
        if self._profile is not None:
            self._profile.unpersist()

    def generate(self, number_of_sequences: int, seed: int | None = None) -> DataFrame:
        if self._profile is None or self._spark is None:
            raise RuntimeError("generator is not fitted")
        seed = self.parameters.seed if seed is None else seed
        schema = self.parameters.schema
        L = self.parameters.sequence_length
        seqs = self._spark.range(number_of_sequences).select(
            F.col("id").alias(SEQUENCE_ID)
        )
        steps = seqs.crossJoin(
            F.broadcast(self._profile)
        )
        from paqarin_spark.functions import uniform_hash

        cols = []
        for j, c in enumerate(schema.values):
            # Box–Muller from two portable uniforms; u1 nudged away
            # from 0 so ln() stays finite.
            u1 = F.greatest(
                uniform_hash(
                    F.lit("gauss-u1"),
                    F.col(SEQUENCE_ID).cast("string"),
                    F.col(STEP).cast("string"),
                    F.lit(str(j)),
                    F.lit(str(seed)),
                ),
                F.lit(1e-18),
            )
            u2 = uniform_hash(
                F.lit("gauss-u2"),
                F.col(SEQUENCE_ID).cast("string"),
                F.col(STEP).cast("string"),
                F.lit(str(j)),
                F.lit(str(seed)),
            )
            noise = F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(
                F.lit(2.0 * 3.141592653589793) * u2
            )
            cols.append(
                (F.col(f"_mean_{c}") + F.col(f"_std_{c}") * noise).alias(c)
            )
        obs = steps.select(SEQUENCE_ID, STEP, *cols)
        # Re-assemble per-sequence arrays ordered by step; inverse-scale
        # back to data units (op G5).
        assembled = (
            obs.groupBy(SEQUENCE_ID)
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(STEP, *[F.col(c) for c in schema.values]))
                ).alias("_sorted")
            )
            .select(
                SEQUENCE_ID,
                F.transform(
                    "_sorted",
                    lambda x: F.struct(
                        *[
                            (
                                x[c] * F.lit(self._range(c)) + F.lit(self._min(c))
                            ).alias(c)
                            for c in schema.values
                        ]
                    ),
                ).alias(SEQUENCE),
            )
        )
        return assembled

    def _min(self, c: str) -> float:
        return self.scaler.state.column_range[c][0]

    def _range(self, c: str) -> float:
        mn, mx = self.scaler.state.column_range[c]
        return mx - mn

    def save(self, path: str) -> None:
        if self._profile is None:
            raise RuntimeError("generator is not fitted")
        spark = self._profile.sparkSession
        _write_params(
            path,
            self.parameters,
            {"provider": self.provider, "method": self.method},
            spark=spark,
        )
        self.scaler.state.save(os.path.join(path, "scaler.json"), spark=spark)
        self._profile.write.mode("overwrite").parquet(os.path.join(path, "profile.parquet"))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "GaussianPerStepGenerator":
        params, _ = _read_params(path, spark=spark)
        gen = cls(params)
        gen.scaler.state = MinMaxState.load(
            os.path.join(path, "scaler.json"), spark=spark
        )
        gen._profile = spark.read.parquet(os.path.join(path, "profile.parquet"))
        gen._spark = spark
        return gen
