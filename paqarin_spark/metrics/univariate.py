"""Univariate scorer data transformer (SURVEY.md §2 op F2): the
Spark-native ``AutoGluonDataTransformer.transform`` analogue.

Reference (`paqarin/metrics/univariate_metrics.py:53-119`, golden
`tests/test_univariate_metrics.py:33-87`): rename to panel columns
(B4), keep-first dedup on (item, timestamp) (E2), upsample to a
regular index (D2), drop items with no inferable frequency, fill
missing values with 0 (G7), add the weekend covariate (G6).

The "no inferable frequency" heuristic is re-specified as the
deterministic gap-regularity predicate of
:func:`paqarin_spark.operators.resample.regular_index_filter`
(SURVEY.md §7 'What's hard' — deliberate, pinned deviation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paqarin_spark.functions import is_weekend
from paqarin_spark.operators.dedup import keep_first
from paqarin_spark.operators.resample import parse_timestamps
from paqarin_spark.schema import TimeSeriesSchema, freq_to_spark

ITEM_ID = "item_id"
TIMESTAMP = "timestamp"
TARGET = "target"
WEEKEND = "is_weekend"


def to_panel(df: DataFrame, schema: TimeSeriesSchema, value_column: str | None = None) -> DataFrame:
    """Op B4: rename role columns to the fixed panel names
    (item_id, timestamp, target)."""
    value = value_column or schema.values[0]
    if len(schema.ids) != 1:
        df = df.withColumn("_item", F.concat_ws("|", *schema.ids))
        id_col = "_item"
    else:
        id_col = schema.ids[0]
    return df.select(
        F.col(id_col).alias(ITEM_ID),
        F.col(schema.timestamp_column).alias(TIMESTAMP),
        F.col(value).cast("double").alias(TARGET),
    )


def panel_transform(
    df: DataFrame,
    schema: TimeSeriesSchema,
    fill_value: float = 0.0,
    add_covariates: bool = True,
) -> DataFrame:
    """Op F2 end-to-end: panel rename -> E2 keep-first dedup -> per-item
    calendar upsample (D2, spanning each ITEM's own [min, max], not the
    global range) -> drop irregular items -> fill -> weekend covariate.

    Returns one row per (item, tick) with a dense regular index per
    surviving item. Single shuffle on item; the per-item calendar is a
    sequence() over that item's bounds — no driver loop.
    """
    parsed = parse_timestamps(df, schema)
    panel_schema = TimeSeriesSchema(
        item_id_columns=(ITEM_ID,),
        timestamp_column=TIMESTAMP,
        value_columns=(TARGET,),
        frequency=schema.frequency,
        order_columns=(),
    )
    panel = to_panel(parsed, schema)
    deduped = keep_first(panel, [ITEM_ID, TIMESTAMP], [TARGET])

    # Regularity filter BEFORE upsampling (reference drops items whose
    # raw index has no inferable frequency).
    from paqarin_spark.operators.resample import regular_index_filter

    regular = regular_index_filter(deduped, panel_schema)

    unit, interval = freq_to_spark(schema.frequency)
    bounds = regular.groupBy(ITEM_ID).agg(
        F.date_trunc(unit, F.min(TIMESTAMP)).alias("_mn"),
        F.date_trunc(unit, F.max(TIMESTAMP)).alias("_mx"),
    )
    grid = bounds.select(
        ITEM_ID,
        F.explode(F.sequence(F.col("_mn"), F.col("_mx"), F.expr(interval))).alias(
            TIMESTAMP
        ),
    )
    filled = grid.join(regular, on=[ITEM_ID, TIMESTAMP], how="left").na.fill(
        fill_value, subset=[TARGET]
    )
    if add_covariates:
        filled = filled.withColumn(WEEKEND, is_weekend(F.col(TIMESTAMP)))
    return filled
