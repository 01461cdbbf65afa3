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
    # The window runs over the (small) entity dim only.
    rank_window = Window.orderBy("_first_seen")
    dim = dim.withColumn(key_column, F.row_number().over(rank_window) - F.lit(1)).drop(
        "_first_seen"
    )
    dim = F.broadcast(dim) if broadcast_dim else dim
    return df.join(dim, on=ids, how="inner")


def entity_dim(df: DataFrame, item_id_columns: Sequence[str]) -> DataFrame:
    """Distinct entity tuples (op E1, `paqarin/utils/data_utils.py:18`,
    `paqarin/adapters/synthcity_adapter.py:234-235`)."""
    return df.select(*item_id_columns).distinct()
