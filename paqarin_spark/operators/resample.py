"""Time-bucket aggregation, calendar gap-fill, and sequence-length
normalization (SURVEY.md §2 ops D1, D2, C2, F1, F2, D3).

Reference semantics: `paqarin/utils/data_utils.py:33-113` — per entity,
``resample(freq).sum(numeric_only=True)`` then ``reindex`` against a
global calendar and ``fillna(0)``. The reference loops over entities
with repeated full-table scans (O(entities × rows)); here each op is a
single distributed pass: one shuffle keyed on (entity, bucket).

Scale notes (100 TB posture):
- the calendar is built once from global min/max (a 2-value agg) with
  ``sequence()``+``explode`` — tiny, always broadcast. For multi-decade
  second-granularity ranges, pass an explicit pre-computed calendar.
- the entity×calendar grid is a broadcast nested-loop of dim×dim, never
  touching the fact table; the fact side joins on (entity, bucket) via
  a normal shuffled hash join that AQE can re-plan for skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paqarin_spark.schema import TimeSeriesSchema, freq_to_spark, strftime_to_java

BUCKET = "bucket"


def parse_timestamps(df: DataFrame, schema: TimeSeriesSchema) -> DataFrame:
    """Op G1: format-driven timestamp parsing.

    Reference: ``pd.to_datetime(col, format=fmt)``
    (`paqarin/utils/data_utils.py:45-50`); a wrong format is an error,
    not a coercion (`tests/test_synthcity_adapter.py:135-145`) — hence
    ANSI-strict ``to_timestamp``, not ``try_to_timestamp``.
    """
    ts = schema.timestamp_column
    if schema.date_format is None:
        return df.withColumn(ts, F.col(ts).cast("timestamp"))
    java_fmt = strftime_to_java(schema.date_format)
    return df.withColumn(ts, F.to_timestamp(F.col(ts), java_fmt))


def format_timestamps(df: DataFrame, column: str, date_format: str) -> DataFrame:
    """Op G2: timestamp → string with an explicit strftime format
    (`paqarin/adapters/synthcity_adapter.py:210-213`)."""
    return df.withColumn(column, F.date_format(F.col(column), strftime_to_java(date_format)))


def time_bucket_sum(
    df: DataFrame,
    schema: TimeSeriesSchema,
    bucket_column: str = BUCKET,
) -> DataFrame:
    """Op D1: downsample-sum per entity and time bucket.

    Reference: ``resample(freq).sum(numeric_only=True)``
    (`paqarin/utils/data_utils.py:76-78`; golden
    `tests/test_doppleganger.py:150-200`). Non-numeric columns drop, as
    in pandas. Partial (map-side) aggregation is automatic for sum.
    """
    unit, _ = freq_to_spark(schema.frequency)
    bucket = F.date_trunc(unit, F.col(schema.timestamp_column)).alias(bucket_column)
    sums = [F.sum(F.col(c)).alias(c) for c in schema.values]
    return df.groupBy(*schema.ids, bucket).agg(*sums)


def global_calendar(
    df: DataFrame,
    schema: TimeSeriesSchema,
    bucket_column: str = BUCKET,
) -> DataFrame:
    """Ops D3+C2 (calendar build): global [min, max] bucket range.

    Reference floors bounds to day then builds ``pd.date_range``
    (`paqarin/utils/data_utils.py:45-59`). One row per bucket.
    """
    unit, interval = freq_to_spark(schema.frequency)
    ts = F.col(schema.timestamp_column)
    bounds = df.agg(
        F.date_trunc(unit, F.min(ts)).alias("_mn"),
        F.date_trunc(unit, F.max(ts)).alias("_mx"),
    )
    return bounds.select(
        F.explode(F.sequence(F.col("_mn"), F.col("_mx"), F.expr(interval))).alias(
            bucket_column
        )
    )


def calendar_fill(
    df: DataFrame,
    schema: TimeSeriesSchema,
    fill_value: float | None = 0.0,
    calendar: DataFrame | None = None,
    bucket_column: str = BUCKET,
) -> DataFrame:
    """Ops F1 = D1 + C2 + G7: the reference's ``normalise_sequences``
    data transform (`paqarin/utils/data_utils.py:33-90`).

    Per entity: bucket-sum, then LEFT JOIN against the global calendar
    so every entity has exactly one row per bucket in [min, max], with
    missing buckets filled with ``fill_value`` (``None`` keeps nulls —
    that is op D2, ``resample(freq).asfreq()``,
    `paqarin/utils/data_utils.py:93-113`).
    """
    cal = calendar if calendar is not None else global_calendar(df, schema, bucket_column)
    entities = df.select(*schema.ids).distinct()
    grid = entities.crossJoin(F.broadcast(cal))
    agg = time_bucket_sum(df, schema, bucket_column)
    out = grid.join(agg, on=[*schema.ids, bucket_column], how="left")
    if fill_value is not None:
        out = out.na.fill(fill_value, subset=schema.values)
    return out


def normalise_sequences(
    df: DataFrame,
    schema: TimeSeriesSchema,
) -> tuple[DataFrame, int, int]:
    """Op F1 with the reference's full return contract:
    ``(long_df, n_entities, seq_len)`` (`paqarin/utils/data_utils.py:85-90`).

    The two counts force a small action each; callers that don't need
    them should use :func:`calendar_fill` and stay fully lazy.
    """
    parsed = parse_timestamps(df, schema)
    filled = calendar_fill(parsed, schema, fill_value=0.0)
    n_entities = parsed.select(*schema.ids).distinct().count()
    seq_len = global_calendar(parsed, schema).count()
    return filled, n_entities, seq_len


def regular_index_filter(
    df: DataFrame,
    schema: TimeSeriesSchema,
) -> DataFrame:
    """Op F2's "no inferable frequency" filter, re-specified
    deterministically (SURVEY.md §7 'What's hard').

    Reference: AutoGluon drops items whose per-item index has no
    inferable frequency (`paqarin/metrics/univariate_metrics.py:53-119`).
    Deterministic contract: keep entities with >= 2 observations whose
    consecutive gaps are all equal. Single window pass + one agg.
    """
    from pyspark.sql import Window

    ts = schema.timestamp_column
    w = Window.partitionBy(*schema.ids).orderBy(ts)
    gaps = df.withColumn(
        "_gap",
        F.col(ts).cast("long") - F.lag(F.col(ts).cast("long")).over(w),
    )
    ok = (
        gaps.groupBy(*schema.ids)
        .agg(
            F.countDistinct("_gap").alias("_ngaps"),
            F.count(F.lit(1)).alias("_n"),
        )
        .where((F.col("_n") >= 2) & (F.col("_ngaps") == 1))
        .select(*schema.ids)
    )
    return df.join(F.broadcast(ok), on=schema.ids, how="left_semi")
