"""Provider data-contract views: the reshaped inputs the deep-provider
libraries consume, derived lazily from the one long-format DataFrame.

The reference materializes these eagerly as Python lists of pandas
frames (synthcity 4-part loader input:
`paqarin/adapters/synthcity_adapter.py:190-245`; SDV PAR context frame:
`paqarin/adapters/sdv_adapter.py:38-68`). Here every part stays a
DataFrame — one row per entity with array columns instead of a Python
list of per-entity frames — so the reshape is cluster-parallel and the
provider boundary (`applyInPandas`) receives ready-shaped groups.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from paqarin_spark.schema import TimeSeriesSchema

SEQ_TEMPORAL_PREFIX = "seq_temporal_"
SEQ_STATIC_PREFIX = "seq_static_"
SEQ_OUT_PREFIX = "seq_out_"


@dataclass(frozen=True)
class SynthcityLoaderViews:
    """The 4-part loader input as lazy DataFrames.

    - ``temporal``: one row per entity — ids + ``observations`` =
      array<struct<value cols>> in event-time order (the per-entity
      numeric frame).
    - ``observation_times``: one row per entity — ids + ``times`` =
      array<string> of formatted timestamps.
    - ``static``: one row per entity — ids + attribute columns.
    - ``outcome``: one row per entity — ids + ``outcome`` dummy zeros
      (`paqarin/adapters/synthcity_adapter.py:237-243`).
    """

    temporal: DataFrame
    observation_times: DataFrame
    static: DataFrame
    outcome: DataFrame


def synthcity_loader_views(
    df: DataFrame,
    schema: TimeSeriesSchema,
    date_format: str = "yyyy-MM-dd",
) -> SynthcityLoaderViews:
    """Derive the synthcity 4-part loader input from the long frame.

    One ordered ``collect_list`` pass builds both the temporal arrays
    and the observation times; static attributes and the zero outcome
    are per-entity reductions. Nothing is collected to the driver and
    no per-entity Python loop exists (the reference iterates
    ``unique()`` ids and filters the full frame per entity —
    `paqarin/adapters/synthcity_adapter.py:221-231` — an O(entities ×
    rows) scan pattern).
    """
    ids = schema.ids
    order = [schema.timestamp_column, *schema.order_columns]
    w = (
        Window.partitionBy(*ids)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    obs = F.collect_list(F.struct(*schema.values)).over(w)
    times = F.collect_list(
        F.date_format(F.col(schema.timestamp_column), date_format)
    ).over(w)
    per_entity = (
        df.withColumn("observations", obs)
        .withColumn("times", times)
        .dropDuplicates(ids)
    )
    temporal = per_entity.select(*ids, "observations")
    observation_times = per_entity.select(*ids, "times")
    static_cols = list(schema.attribute_columns)
    static = (
        df.select(*ids, *static_cols).dropDuplicates(ids)
        if static_cols
        else df.select(*ids).distinct()
    )
    outcome = static.select(*ids, F.lit(0).alias("outcome"))
    return SynthcityLoaderViews(temporal, observation_times, static, outcome)


def add_prefixes(df: DataFrame, schema: TimeSeriesSchema) -> DataFrame:
    """Op G9 (`paqarin/adapters/synthcity_adapter.py:46-48`): rename
    user columns to the provider's ``seq_temporal_*`` / ``seq_static_*``
    namespace. Metadata-only — a select of aliases."""
    cols = []
    for c in df.columns:
        if c in schema.values:
            cols.append(F.col(c).alias(f"{SEQ_TEMPORAL_PREFIX}{c}"))
        elif c in schema.attribute_columns:
            cols.append(F.col(c).alias(f"{SEQ_STATIC_PREFIX}{c}"))
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def strip_prefixes(df: DataFrame) -> DataFrame:
    """Inverse of :func:`add_prefixes`
    (`paqarin/adapters/synthcity_adapter.py:74-87`)."""
    cols = []
    for c in df.columns:
        for p in (SEQ_TEMPORAL_PREFIX, SEQ_STATIC_PREFIX, SEQ_OUT_PREFIX):
            if c.startswith(p):
                cols.append(F.col(c).alias(c[len(p):]))
                break
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def par_context(df: DataFrame, schema: TimeSeriesSchema) -> DataFrame:
    """SDV PAR's required ``context`` frame
    (`paqarin/adapters/sdv_adapter.py:38-68`, missing-context error
    pinned by `tests/test_par.py:43-44`): one row per entity with the
    static attribute columns — the join input handed to
    ``sample_sequential_columns``."""
    return df.select(
        *schema.ids, *schema.attribute_columns
    ).dropDuplicates(schema.ids)
