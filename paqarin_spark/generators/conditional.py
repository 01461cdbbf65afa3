"""Attribute-conditional block-bootstrap generator — the Spark-native
analogue of the reference's PAR sampling contract: ``generate``
REQUIRES a ``context`` frame of static attribute rows and emits one
sequence per context row drawn from entities with matching attributes
(`paqarin/generators/par.py:27-41`, `paqarin/adapters/sdv_adapter.py:38-68`;
missing-context error pinned by `tests/test_par.py:43-44`).

Everything is DataFrame ops: the fitted state is the window population
joined to each entity's static attributes; sampling is a hash-rank
row_number per context row over the matching candidate set — one
shuffle keyed on the attribute tuple, deterministic under retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from paqarin_spark.generator import GeneratorParameters, TimeSeriesGenerator
from paqarin_spark.generators.bootstrap import scale_sequence_column
from paqarin_spark.operators.resample import parse_timestamps
from paqarin_spark.operators.scaling import MinMaxScaler
from paqarin_spark.operators.windows import SEQUENCE, SEQUENCE_ID, sliding_windows


class ConditionalBootstrapGenerator(TimeSeriesGenerator):
    """J1/J2 with the PAR context contract. Static attributes are the
    per-entity values of ``schema.attribute_columns`` (must be
    constant within an entity — the PAR data model)."""

    provider = "paqarin_spark"
    method = "conditional_bootstrap"

    def __init__(self, parameters: GeneratorParameters):
        super().__init__(parameters)
        if not parameters.schema.attribute_columns:
            raise ValueError(
                "conditional generation needs schema.attribute_columns"
            )
        self._windows: DataFrame | None = None
        self.scaler = MinMaxScaler(list(parameters.schema.value_columns))

    @property
    def is_fitted(self) -> bool:
        return self._windows is not None

    def fit(self, training_data: DataFrame) -> "ConditionalBootstrapGenerator":
        schema = self.parameters.schema
        parsed = parse_timestamps(training_data, schema)
        if not self.scaler.is_fitted:
            self.scaler.fit(parsed)
        scaled = self.scaler.transform(parsed)
        attrs = list(schema.attribute_columns)
        # Entity -> static attribute dim (first by entity's own order
        # when attributes vary; the PAR model assumes they don't).
        dim = parsed.groupBy(*schema.ids).agg(
            *[F.min(a).alias(a) for a in attrs]
        )
        windows = sliding_windows(scaled, schema, self.parameters.sequence_length)
        self._windows = (
            windows.join(dim, on=list(schema.ids))
            .select(
                *attrs,
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

    def generate(
        self,
        number_of_sequences: int | None = None,
        seed: int | None = None,
        context: DataFrame | None = None,
    ) -> DataFrame:
        """One sequence per ``context`` row, drawn from windows whose
        entity shares the row's attribute tuple. ``number_of_sequences``
        is ignored when a context is given (the context defines the
        count — the reference's PAR semantics); a missing context
        raises, mirroring the reference contract."""
        if self._windows is None:
            raise RuntimeError("generator is not fitted")
        if context is None:
            raise ValueError(
                "conditional generation requires a context DataFrame "
                "(one row of attribute values per sequence to generate)"
            )
        seed = self.parameters.seed if seed is None else seed
        attrs = list(self.parameters.schema.attribute_columns)
        ctx_w = Window.orderBy(*attrs)
        ctx = context.select(*attrs).withColumn(
            "_ctx_id", F.row_number().over(ctx_w) - 1
        )
        cand = ctx.join(self._windows, on=attrs, how="left")
        rank = F.md5(
            F.concat_ws(
                "#", F.col("_ctx_id"), F.col("_window_key"), F.lit(str(seed))
            )
        )
        pick_w = Window.partitionBy("_ctx_id").orderBy(rank)
        out = (
            cand.withColumn("_rk", F.row_number().over(pick_w))
            .where(F.col("_rk") == 1)
            .select(
                F.col("_ctx_id").alias(SEQUENCE_ID),
                *attrs,
                F.col(SEQUENCE),
            )
        )
        return scale_sequence_column(
            out.where(F.col(SEQUENCE).isNotNull()),
            self.scaler.state,
            list(self.parameters.schema.value_columns),
            inverse=True,
        )

    def save(self, path: str) -> None:
        import os

        from paqarin_spark.generator import _write_params
        from paqarin_spark.operators.scaling import MinMaxState  # noqa: F401

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
        self._windows.write.mode("overwrite").parquet(
            os.path.join(path, "windows.parquet")
        )

    @classmethod
    def load(cls, spark, path: str) -> "ConditionalBootstrapGenerator":
        import os

        from paqarin_spark.generator import _read_params
        from paqarin_spark.operators.scaling import MinMaxState

        params, _ = _read_params(path, spark=spark)
        gen = cls(params)
        gen.scaler.state = MinMaxState.load(
            os.path.join(path, "scaler.json"), spark=spark
        )
        gen._windows = spark.read.parquet(os.path.join(path, "windows.parquet"))
        return gen
