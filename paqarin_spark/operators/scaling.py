"""Min-max scaling as Catalyst expressions (SURVEY.md §2 ops D3/G4/G5).

Reference: MinMaxScaler fit = per-column min/max
(`paqarin/adapters/ydata_adapter.py:48-54,221-223`), transform
``x' = (x - min)/(max - min)`` on a copy
(`paqarin/adapters/ydata_adapter.py:64-73`), inverse
``x = x'(max - min) + min`` (`:75-93,241-253`). Golden:
`tests/test_doppleganger.py:36-57`, `tests/test_timegan.py:25-57`
(roundtrip reproduces input).

Design choice (SURVEY.md §4): plain expressions from a collected
min/max row, NOT MLlib's vector path — keeps everything inside
whole-stage codegen and gives exact float parity with the SQL oracle.
The fitted state is a tiny dict (2 doubles per column), persisted as
JSON — never a pickle.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MinMaxState:
    """Fitted per-column (min, max). The whole state is O(columns)."""

    column_range: dict[str, tuple[float, float]]

    def save(self, path: str, spark=None) -> None:
        """Local and ``file://`` paths write directly; other schemes go
        through the Hadoop FileSystem API (op A5) when a session is
        given, so model dirs can live on any connector-backed store."""
        from paqarin_spark.sources import hadoop_write_text, local_path

        payload = json.dumps({k: list(v) for k, v in self.column_range.items()})
        lpath = local_path(path)
        if lpath is None:
            if spark is None:
                raise ValueError(f"remote path {path!r} requires a SparkSession")
            hadoop_write_text(spark, path, payload)
            return
        os.makedirs(os.path.dirname(lpath) or ".", exist_ok=True)
        with open(lpath, "w", encoding="utf-8") as fh:
            fh.write(payload)

    @staticmethod
    def load(path: str, spark=None) -> "MinMaxState":
        from paqarin_spark.sources import hadoop_read_text, local_path

        lpath = local_path(path)
        if lpath is None:
            if spark is None:
                raise ValueError(f"remote path {path!r} requires a SparkSession")
            raw = json.loads(hadoop_read_text(spark, path))
        else:
            with open(lpath, encoding="utf-8") as fh:
                raw = json.load(fh)
        return MinMaxState({k: (v[0], v[1]) for k, v in raw.items()})


class MinMaxScaler:
    """fit / transform / inverse_transform over named numeric columns.

    MLlib-Estimator-shaped but DataFrame-native: ``fit`` runs one
    distributed min/max aggregation (op D3); transform/inverse are pure
    column expressions (ops G4/G5) — no UDF, no vector assembly.
    """

    def __init__(self, columns: list[str]):
        self.columns = list(columns)
        self.state: MinMaxState | None = None

    @property
    def is_fitted(self) -> bool:
        return self.state is not None

    def fit(self, df: DataFrame) -> "MinMaxScaler":
        aggs = []
        for c in self.columns:
            aggs.append(F.min(c).alias(f"__mn_{c}"))
            aggs.append(F.max(c).alias(f"__mx_{c}"))
        row = df.agg(*aggs).collect()[0]
        self.state = MinMaxState(
            {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in self.columns}
        )
        return self

    def _require_state(self) -> MinMaxState:
        if self.state is None:
            raise RuntimeError("MinMaxScaler is not fitted")
        return self.state

    def transform(self, df: DataFrame) -> DataFrame:
        state = self._require_state()
        out = df
        for c in self.columns:
            mn, mx = state.column_range[c]
            denom = mx - mn
            if denom == 0:
                # Degenerate constant column scales to 0.0 (pandas
                # MinMaxScaler maps constant columns to 0).
                out = out.withColumn(c, F.lit(0.0))
            else:
                out = out.withColumn(c, (F.col(c) - F.lit(mn)) / F.lit(denom))
        return out

    def inverse_transform(self, df: DataFrame) -> DataFrame:
        state = self._require_state()
        out = df
        for c in self.columns:
            mn, mx = state.column_range[c]
            out = out.withColumn(c, F.col(c) * F.lit(mx - mn) + F.lit(mn))
        return out
