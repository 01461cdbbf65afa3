"""Scalar functions (SURVEY.md §2 ops G1-G9)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from paqarin_spark.schema import strftime_to_java


def parse_ts(col, date_format: str) -> Column:
    """Op G1: strict format-driven timestamp parse
    (`paqarin/utils/data_utils.py:45-50`)."""
    return F.to_timestamp(col, strftime_to_java(date_format))


def format_ts(col, date_format: str) -> Column:
    """Op G2: timestamp → formatted string
    (`paqarin/adapters/synthcity_adapter.py:210-213`)."""
    return F.date_format(col, strftime_to_java(date_format))


def truncate_day(col) -> Column:
    """Op G3: floor("D") (`paqarin/utils/data_utils.py:45-50`)."""
    return F.date_trunc("DAY", col)


def is_weekend(ts_col) -> Column:
    """Op G6: weekend covariate, weekday ∈ {Sat, Sun} → 1.0/0.0.

    Reference: `paqarin/metrics/univariate_metrics.py:121-127` (pandas
    ``weekday`` Mon=0..Sun=6, weekend = {5, 6}). Spark ``dayofweek`` is
    Sun=1..Sat=7, so the remap is {1, 7} (SURVEY.md §7 pins this).
    """
    return F.dayofweek(ts_col).isin(1, 7).cast("double")


def fill_nulls(df: DataFrame, value: float, columns: list[str] | None = None) -> DataFrame:
    """Op G7: fillna (`paqarin/adapters/sdv_adapter.py:133-138`)."""
    return df.na.fill(value, subset=columns)


def constant_column(df: DataFrame, name: str, value) -> DataFrame:
    """Op G8: constant column, e.g. the synthcity dummy outcome
    (`paqarin/adapters/synthcity_adapter.py:237-243`)."""
    return df.withColumn(name, F.lit(value))


def add_prefix(df: DataFrame, prefix: str, columns: list[str]) -> DataFrame:
    """Op G9: synthcity-style column prefixing
    (`paqarin/adapters/synthcity_adapter.py:46-48`). Metadata-only."""
    mapping = {c: f"{prefix}{c}" for c in columns}
    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
    )


def strip_prefix(df: DataFrame, prefix: str) -> DataFrame:
    """Op G9 inverse (`paqarin/adapters/synthcity_adapter.py:74-87`)."""
    return df.select(
        *[
            F.col(c).alias(c[len(prefix):] if c.startswith(prefix) else c)
            for c in df.columns
        ]
    )


TWO_POW_60 = float(1 << 60)


def uniform_hash(*cols: Column) -> Column:
    """Deterministic uniform(0,1) from an md5 prefix — THE portable
    random-draw construction shared by the Markov generator (gen5),
    mixture sampling (tx27), split assignment (q72), and the KMV
    sketch (q67). DuckDB replays it with
    ``('0x' || substring(md5(..),1,15))::UBIGINT / 2^60`` — keep the
    two in lockstep; this is the single Spark-side source."""
    return (
        F.conv(F.substring(F.md5(F.concat_ws("#", *cols)), 1, 15), 16, 10)
        .cast("double")
        / F.lit(TWO_POW_60)
    )
