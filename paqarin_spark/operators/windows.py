"""Sequence windowing, splits, trims, and horizon generation
(SURVEY.md §2 ops F3, F4, F5, F6, F7, H1).

All per-entity ordering is explicit (`(ts, *order_cols)`) because Spark
has no implicit row order; this encodes the same first-appearance /
positional contracts the reference gets implicitly from pandas row
order (SURVEY.md §7 "First-appearance ordering").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from paqarin_spark.schema import TimeSeriesSchema, freq_to_spark

SEQUENCE = "sequence"
SEQUENCE_ID = "sequence_id"
STEP = "step"
SPLIT = "split"


def _order_cols(schema: TimeSeriesSchema) -> list[Column]:
    return [F.col(c) for c in schema.arrival_order()]


def sliding_windows(
    df: DataFrame,
    schema: TimeSeriesSchema,
    sequence_length: int,
    stride: int = 1,
    columns: list[str] | None = None,
) -> DataFrame:
    """Op F3: every stride-``stride`` window of length L per entity,
    oldest-first, as one row per window with an array-of-struct column.

    Reference: `paqarin/adapters/ydata_adapter.py:267-288` — stride-1
    overlapping windows ``[i, i+L)`` for ``i ∈ [0, n-L]``, oldest first
    (the provider's reversed/flip dance nets out to ordered windows).
    The reference hard-codes stride=1; window explosion multiplies data
    ×L, so ``stride`` is exposed for scale (SURVEY.md §7).

    Output: entity ids, ``sequence_id`` (0-based window ordinal per
    entity), ``sequence`` = array<struct<columns>> of length L.
    """
    cols = columns or list(schema.values)
    fwd = (
        Window.partitionBy(*schema.ids)
        .orderBy(*_order_cols(schema))
        .rowsBetween(Window.currentRow, sequence_length - 1)
    )
    ordinal = Window.partitionBy(*schema.ids).orderBy(*_order_cols(schema))
    out = (
        df.withColumn(SEQUENCE, F.collect_list(F.struct(*cols)).over(fwd))
        .withColumn("_rn", F.row_number().over(ordinal) - F.lit(1))
        .where(F.size(SEQUENCE) == sequence_length)
        .where(F.col("_rn") % stride == 0)
        .withColumn(SEQUENCE_ID, (F.col("_rn") / stride).cast("long"))
        .select(*schema.ids, SEQUENCE_ID, SEQUENCE)
    )
    return out


def window_starts(
    df: DataFrame,
    schema: TimeSeriesSchema,
    sequence_length: int,
) -> DataFrame:
    """F3's cheap projection: the set of valid window-start ordinals
    (1-based), without materializing sequence contents. Used by the
    oracle query Q5 (SURVEY.md §2.2)."""
    ordinal = Window.partitionBy(*schema.ids).orderBy(*_order_cols(schema))
    per_entity = Window.partitionBy(*schema.ids)
    return (
        df.withColumn("_rn", F.row_number().over(ordinal))
        .withColumn("_n", F.count(F.lit(1)).over(per_entity))
        .where(F.col("_rn") <= F.col("_n") - (sequence_length - 1))
        .select(*schema.ids, F.col("_rn").alias("win_start"))
    )


def tail_trim(
    df: DataFrame,
    schema: TimeSeriesSchema,
    prediction_length: int,
) -> DataFrame:
    """Op F4: drop the last ``prediction_length`` steps of every entity
    (train/test time split).

    Reference: ``slice_by_timestep(None, -prediction_length)``
    (`paqarin/metrics/univariate_metrics.py:421-432`; golden
    `tests/test_univariate_metrics.py:152-174`).
    """
    desc = Window.partitionBy(*schema.ids).orderBy(
        *[c.desc() for c in _order_cols(schema)]
    )
    return (
        df.withColumn("_rn_desc", F.row_number().over(desc))
        .where(F.col("_rn_desc") > prediction_length)
        .drop("_rn_desc")
    )


def forecast_horizon(
    df: DataFrame,
    schema: TimeSeriesSchema,
    prediction_length: int,
) -> DataFrame:
    """Op F5: ``prediction_length`` future ticks per entity directly
    after each series' end.

    Reference: autogluon's
    ``get_forecast_horizon_index_ts_dataframe``
    (`paqarin/metrics/univariate_metrics.py:384-405`). One groupBy for
    max(ts), then sequence+explode — no per-entity loop.
    """
    unit, interval = freq_to_spark(schema.frequency)
    ts = schema.timestamp_column
    ends = df.groupBy(*schema.ids).agg(F.max(F.col(ts)).alias("_end"))
    return ends.select(
        *schema.ids,
        F.explode(
            F.sequence(
                F.col("_end") + F.expr(interval),
                F.col("_end") + F.expr(
                    interval.replace("interval 1", f"interval {prediction_length}")
                ),
                F.expr(interval),
            )
        ).alias(ts),
    )


def xy_split(
    sequences: DataFrame,
    sequence_length: int,
    sequence_column: str = SEQUENCE,
) -> DataFrame:
    """Op F6: per-sequence feature/label split.

    Reference: features = steps [0, L-1), label = last step
    (`paqarin/metrics/multivariate_metrics.py:29-36`; golden
    `tests/test_multivariate_metrics.py:36-62`). Array slicing on the
    sequence column — no shuffle, no Python.
    """
    return sequences.withColumn(
        "features", F.slice(F.col(sequence_column), 1, sequence_length - 1)
    ).withColumn("label", F.element_at(F.col(sequence_column), -1))


def positional_split(
    sequences: DataFrame,
    ordinal_column: Column | str,
    training_size: float = 0.75,
    split_column: str = SPLIT,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Op H1: deterministic positional train/valid/test split.

    Reference (`paqarin/metrics/multivariate_metrics.py:39-82`, golden
    `tests/test_multivariate_metrics.py:65-85`):
    ``t = int(training_size * n)``; ``v = t + int((n - t) / 2)``;
    first t → train, next (v - t) → valid, rest → test. No shuffle —
    a deterministic ordinal, not randomSplit, to keep oracle parity.

    ``ordinal_column`` must be a 1-based global or per-group position;
    n is counted over the ordinal's full partition (pass a pre-windowed
    frame for per-entity splits).
    """
    ord_col = F.col(ordinal_column) if isinstance(ordinal_column, str) else ordinal_column
    everything = Window.partitionBy(*(partition_by or []))
    n = F.count(F.lit(1)).over(everything)
    t = F.floor(F.lit(training_size) * n)
    v = t + F.floor((n - t) / F.lit(2))
    return sequences.withColumn(
        split_column,
        F.when(ord_col <= t, F.lit("train"))
        .when(ord_col <= v, F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def attach_date_index(
    sequences: DataFrame,
    schema: TimeSeriesSchema,
    start: str,
    sequence_column: str = SEQUENCE,
) -> DataFrame:
    """Op F7: assign the same timestamp vector to every generated
    sequence (`paqarin/generators/doppleganger.py:176-181`, golden
    `tests/test_doppleganger.py:135-147`).

    Explodes each sequence with its position and maps position →
    ``start + pos * freq`` — pure expressions, no join needed.
    """
    unit, _ = freq_to_spark(schema.frequency)
    exploded = sequences.select(
        *sequences.columns,
        F.posexplode(F.col(sequence_column)).alias(STEP, "_obs"),
    ).drop(sequence_column)
    exploded = exploded.withColumn(
        schema.timestamp_column,
        F.expr(f"timestampadd({unit}, {STEP}, to_timestamp('{start}'))"),
    )
    return exploded.select(
        *[c for c in exploded.columns if c != "_obs"], F.col("_obs.*")
    )


def distributed_rank(
    df: DataFrame,
    order_columns: list[str],
    rank_column: str = "rank",
    count_column: str | None = None,
    num_buckets: int = 1024,
) -> DataFrame:
    """Exact global ``row_number`` over a total order WITHOUT a global
    sort — the shared core of :func:`distributed_ntile` and the
    exact-order-statistic extractions (ev27's PSI decile edges):
    (1) equal-width bucket on the LEADING order column against its
    broadcast [min, max] (monotone in the total order — equal values
    share a bucket); (2) ``row_number`` within each bucket in
    parallel; (3) per-bucket counts roll to exclusive offsets over
    the constant-size (≤``num_buckets``-row) bucket table — the only
    single-partition step; (4) global rank = offset + local rank.
    ``count_column`` optionally appends the total row count (needed
    by rank→quantile arithmetic). NULLs in the leading column land in
    bucket 0, where ASC NULLS FIRST ordering already places them; a
    non-numeric leading column casts to NULL and degrades to one
    bucket — the plain global window — without changing results."""
    B = int(num_buckets)
    lead = F.col(order_columns[0]).cast("double")
    ext = df.agg(
        F.min(lead).alias("_lo"),
        F.max(lead).alias("_hi"),
        F.count(F.lit(1)).alias("_dr_nn"),
    )
    bdf = df.crossJoin(F.broadcast(ext)).withColumn(
        "_bkt",
        F.when(
            lead.isNull() | (F.col("_hi") <= F.col("_lo")), F.lit(0)
        )
        .otherwise(
            F.least(
                F.lit(B - 1).cast("long"),
                F.floor(
                    (lead - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo"))
                    * B
                ),
            )
        )
        .cast("int"),
    )
    woff = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        bdf.groupBy("_bkt")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .select(
            "_bkt",
            F.coalesce(F.sum("_bn").over(woff), F.lit(0)).alias("_boff"),
        )
    )
    in_bucket = Window.partitionBy("_bkt").orderBy(
        *[F.col(c) for c in order_columns]
    )
    ranked = (
        bdf.withColumn("_lrk", F.row_number().over(in_bucket))
        .join(offsets, on="_bkt")
        .withColumn(
            rank_column, (F.col("_boff") + F.col("_lrk")).cast("long")
        )
    )
    keep = list(df.columns) + [rank_column]
    if count_column is not None:
        ranked = ranked.withColumn(
            count_column, F.col("_dr_nn").cast("long")
        )
        keep.append(count_column)
    return ranked.select(*keep)


def distributed_ntile(
    df: DataFrame,
    order_columns: list[str],
    n_tiles: int,
    tile_column: str = "tile",
    num_buckets: int = 1024,
) -> DataFrame:
    """Exact NTILE over a total order WITHOUT a global sort — the
    two-level prefix-rank layout (keys.add_surrogate_key /
    corpus.pack_sequences family) applied to quantile binning.

    Standard ``NTILE(k)`` needs every row's exact global rank, which a
    plain ``Window.orderBy`` computes by moving the whole relation to
    ONE task. Here: (1) rows equal-width-bucket on the LEADING order
    column against its broadcast [min, max] — bucketing on the leading
    key is monotone in the total order (equal values share a bucket;
    decimal→double bucketing is monotone), so bucket index ≍ rank
    order; (2) ``row_number`` runs WITHIN each bucket in parallel;
    (3) per-bucket counts roll to exclusive offsets over the
    constant-size (≤``num_buckets``-row) bucket table — the only
    single-partition step; (4) global rank = offset + local rank, and
    the ANSI NTILE arithmetic (first ``N mod k`` tiles hold
    ``⌈N/k⌉`` rows, the rest ``⌊N/k⌋``) assigns the tile from (rank,
    N) in pure integer expressions. Bit-identical to ``F.ntile`` over
    the same total order. NULLs in the leading column land in bucket
    0, where ASC NULLS FIRST ordering already places them.

    A non-numeric leading column casts to NULL and degrades to one
    bucket — the plain global window — without changing results.
    """
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    ranked = distributed_rank(
        df, order_columns, rank_column="_grk", count_column="_nn",
        num_buckets=num_buckets,
    )
    # ANSI NTILE from (global rank, N) in pure integer `div` — no
    # doubles, so exact at any N: small = N div k, rem = N mod k,
    # big = small + 1; the first rem tiles take big rows each.
    k = int(n_tiles)
    small = f"(_nn div {k})"
    rem = f"(_nn % {k})"
    big = f"(_nn div {k} + 1)"
    tile = F.expr(
        f"CASE WHEN _grk <= {rem} * {big}"
        f" THEN (_grk - 1) div {big} + 1"
        f" ELSE {rem} + (_grk - {rem} * {big} - 1)"
        f" div greatest({small}, 1) + 1 END"
    )
    keep = [c for c in df.columns]
    return ranked.select(*keep, tile.cast("int").alias(tile_column))
