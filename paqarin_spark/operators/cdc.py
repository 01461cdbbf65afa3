"""Warehouse-maintenance operators: SCD2 interval construction and
CDC (change-data-capture) latest-wins merge — the two table-
maintenance shapes every lakehouse pipeline runs (MERGE INTO /
dimension versioning), expressed as pure window plans.

Both shuffle exactly once on the entity key; no driver state, no
iterative passes — the plans a 1000-executor nightly maintenance job
wants.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    keys: Sequence[str],
    order_column: str,
    value_column: str,
) -> DataFrame:
    """Collapse a per-period observation table into SLOWLY-CHANGING-
    DIMENSION (type 2) validity intervals: one row per (key, run of
    equal values), with ``valid_from`` = first period of the run and
    ``valid_to`` = start of the next run (NULL = still current).

    Plan: one key-ordered window pass marks change points
    (``value`` differs from its lag), a second pass over the change
    points alone takes the lead — both windows share the same
    partitioning, so the whole operator is ONE exchange on the key.
    Equality is evaluated null-safely (a null value is a state like
    any other).
    """
    w = Window.partitionBy(*keys).orderBy(order_column)
    changed = df.withColumn(
        "_chg",
        ~F.col(value_column).eqNullSafe(
            F.lag(F.col(value_column)).over(w)
        )
        | F.row_number().over(w).eqNullSafe(F.lit(1)),
    ).where(F.col("_chg"))
    return changed.select(
        *keys,
        F.col(order_column).alias("valid_from"),
        F.lead(F.col(order_column)).over(w).alias("valid_to"),
        F.col(value_column),
    )


def apply_cdc(
    changes: DataFrame,
    keys: Sequence[str],
    version_columns: Sequence[str],
    op_column: str,
    delete_op: str = "delete",
) -> DataFrame:
    """Latest-wins CDC merge (the batch form of MERGE INTO): for each
    key keep only the change record with the highest version; if that
    record is a delete, the key vanishes from the snapshot.

    Plan: one row_number window over (keys / version desc) — a single
    exchange on the key — then a filter. Version columns break ties in
    order, so the result is deterministic whenever the composite
    version is unique per key (the CDC contract).
    """
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in version_columns]
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .where(F.col(op_column) != delete_op)
        .drop("_rn")
    )
