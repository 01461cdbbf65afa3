"""Surrogate-key assignment (SURVEY.md §2 op C1).

Reference semantics (`paqarin/utils/data_utils.py:13-30`, golden test
`tests/test_data_utils.py:8-31`): distinct entity tuples get dense
integer ids 0..n-1 in *first-appearance order*; every row gets its
entity's id appended as ``surrogate_item_id``.

The reference does a row-at-a-time Python ``apply`` (O(rows)
interpreter cost). Spark-first design: build the entity dim with a
map-side-combinable ``groupBy().agg(min(struct(order)))``, rank the dim
(small: one row per distinct entity) with a window, then hash-join
back on the id columns. No global row_number over the fact table —
the only single-partition step touches the dim. The join carries NO
broadcast hint by default: the entity count scales with the data, so
AQE picks broadcast when the dim actually fits and a shuffle join
when it doesn't (pass ``broadcast_dim=True`` only when the entity
domain is bounded by construction).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from paqarin_spark.schema import SURROGATE_ITEM_ID

# Constant bucket count for the two-level first-appearance numbering:
# the per-bucket offset table is AT MOST this many rows regardless of
# SF, so its rollup window is bounded by a compile-time constant.
_NUM_RANK_BUCKETS = 1024


def add_surrogate_key(
    df: DataFrame,
    item_id_columns: Sequence[str],
    order_columns: Sequence[str],
    key_column: str = SURROGATE_ITEM_ID,
    broadcast_dim: bool = False,
) -> DataFrame:
    """Append a dense first-appearance surrogate id per entity tuple.

    ``order_columns`` define arrival order deterministically (pandas
    relies on implicit row order; Spark must not — SURVEY.md §7).
    """
    ids = list(item_id_columns)
    first_seen = F.min(F.struct(*[F.col(c) for c in order_columns])).alias("_first_seen")
    dim = df.groupBy(*ids).agg(first_seen)
    # Dense first-appearance numbering WITHOUT a global sort of the
    # dim: the entity count scales with the data, so even a dim-only
    # single-partition row_number is one task sorting every distinct
    # entity at 100 TB. Two-level prefix numbering instead (the
    # pack_sequences layout): equal-width-bucket the dim on the FIRST
    # order column against its broadcast [min,max] (bucketing on the
    # leading struct field is monotone in the struct order — equal
    # values share a bucket), rank WITHIN each bucket in parallel,
    # and add back exclusive per-bucket count offsets rolled up over
    # the constant-size (_NUM_RANK_BUCKETS-row) bucket table. A
    # non-numeric leading order column casts to NULL and degrades to
    # one bucket — the old global window — without changing results.
    B = _NUM_RANK_BUCKETS
    lead = F.col(f"_first_seen.{order_columns[0]}").cast("double")
    ext = dim.agg(
        F.min(lead).alias("_lo"), F.max(lead).alias("_hi")
    )
    bdim = dim.crossJoin(F.broadcast(ext)).withColumn(
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
        bdim.groupBy("_bkt")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .select(
            "_bkt",
            F.coalesce(F.sum("_bn").over(woff), F.lit(0)).alias("_base"),
        )
    )
    in_bucket = Window.partitionBy("_bkt").orderBy("_first_seen")
    dim = (
        bdim.withColumn("_lrk", F.row_number().over(in_bucket))
        .join(offsets, on="_bkt")
        .withColumn(key_column, F.col("_base") + F.col("_lrk") - F.lit(1))
        .drop("_first_seen", "_bkt", "_lrk", "_base", "_lo", "_hi")
    )
    dim = F.broadcast(dim) if broadcast_dim else dim
    return df.join(dim, on=ids, how="inner")


def entity_dim(df: DataFrame, item_id_columns: Sequence[str]) -> DataFrame:
    """Distinct entity tuples (op E1, `paqarin/utils/data_utils.py:18`,
    `paqarin/adapters/synthcity_adapter.py:234-235`)."""
    return df.select(*item_id_columns).distinct()
