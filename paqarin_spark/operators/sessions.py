"""Gap-based sessionization (north-star extension; the reference has
no session concept — SURVEY.md §2 'Not present in the reference' notes
the absence of session windows; a large-scale event pipeline needs
them).

Deterministic batch formulation: a new session starts whenever the gap
from the previous event of the same entity exceeds ``gap``. This is
the exact batch dual of Structured Streaming's ``session_window`` but
produces stable integer session ordinals, so it is DuckDB-oracle
checkable (LAG + running SUM — same plan shape on both engines).

Cost: one shuffle on the entity key + a per-partition sort; session
assembly is a second aggregation on (entity, session) that reuses the
same partitioning (no extra exchange needed under AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_column: str,
    timestamp_column: str,
    gap_seconds: float,
    session_column: str = "session_id",
    order_columns: tuple[str, ...] = (),
) -> DataFrame:
    """Attach a 0-based per-entity session ordinal: a row opens a new
    session when it is the entity's first event or follows the
    previous one by more than ``gap_seconds``.

    Gaps compare in integer microseconds (``unix_micros``) so the
    boundary is exact — no float or truncate-to-second drift against
    the oracle. ``order_columns`` break timestamp ties
    deterministically (tie rows have gap 0, so session ids are
    tie-order-invariant either way; the tiebreak pins row order for
    downstream first/last picks)."""
    w = Window.partitionBy(entity_column).orderBy(timestamp_column, *order_columns)
    micros = F.unix_micros(F.col(timestamp_column))
    prev = F.lag(micros).over(w)
    is_new = (
        prev.isNull() | (micros - prev > int(gap_seconds * 1_000_000))
    ).cast("long")
    return df.withColumn(
        session_column,
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def session_stats(
    df: DataFrame,
    entity_column: str,
    timestamp_column: str,
    gap_seconds: float,
    value_column: str | None = None,
    order_columns: tuple[str, ...] = (),
) -> DataFrame:
    """Per-session summary rows: bounds, event count, optional value
    sum. One extra aggregation over :func:`sessionize` output."""
    sessions = sessionize(
        df, entity_column, timestamp_column, gap_seconds, order_columns=order_columns
    )
    aggs = [
        F.min(timestamp_column).alias("session_start"),
        F.max(timestamp_column).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_column is not None:
        aggs.append(F.round(F.sum(value_column), 6).alias("value_sum"))
    return sessions.groupBy(entity_column, "session_id").agg(*aggs)
