"""Skew-aware join helper (scale posture, SURVEY.md §4 "Skew" row).

The default skew answer is AQE (`spark.sql.adaptive.skewJoin`,
enabled by `session.get_session`), which splits oversized sort-merge
partitions at runtime. Salting is the explicit fallback for the case
AQE cannot fix: a shuffled hash/sort-merge join where a handful of hot
keys dominate AND the other side is too large to broadcast. Spreading
each hot key across ``salt_buckets`` sub-keys costs a ``salt_buckets``×
replication of the (smaller) right side in exchange for even task
sizing on the left.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with key salting: rows of the (big, skewed) ``left``
    scatter uniformly across ``salt_buckets`` sub-keys; the ``right``
    side is replicated once per bucket so every sub-key still meets
    its full match set. Join semantics are preserved for ``inner`` and
    ``left`` joins (each left row carries exactly one salt value).

    The salt is a content hash of the FULL left row
    (``pmod(xxhash64(*cols, seed), buckets)``), not ``rand(seed)``:
    any per-row value is correct (the right side covers all buckets),
    but a rand-derived salt is partition-layout-dependent — an AQE
    coalesce or task retry can re-salt rows mid-query. A row-content
    hash is layout- and retry-independent for free. Hashing the whole
    row (not just the join keys, which would pin every hot-key row to
    one bucket and defeat the salting) spreads a hot key's rows across
    buckets whenever they differ in any other column; byte-identical
    duplicates share a bucket, which is harmless.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join preserves semantics for inner/left joins only; "
            f"got {how!r} (the replicated right side would duplicate "
            "right-preserved rows)"
        )
    # xxhash64 rejects MAP-typed inputs (hash order is undefined), so
    # hash only the hashable columns; a frame with NO hashable column
    # falls back to the layout-dependent rand salt (still correct —
    # the right side covers every bucket — just not retry-stable).
    hashable = [
        F.col(c) for c in left.columns if "map<" not in left.schema[c].dataType.simpleString()
    ]
    salt = (
        F.pmod(F.xxhash64(*hashable, F.lit(seed)), F.lit(salt_buckets))
        if hashable
        else (F.rand(seed) * salt_buckets)
    )
    salted_left = left.withColumn(_SALT, salt.cast("int"))
    buckets = F.array(*[F.lit(i) for i in range(salt_buckets)])
    salted_right = right.withColumn(_SALT, F.explode(buckets))
    return salted_left.join(salted_right, on=[*on, _SALT], how=how).drop(_SALT)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, attach the payload of the
    right row with the greatest ``right_ts <= left_ts`` (``backward``,
    inclusive) or smallest ``right_ts >= left_ts`` (``forward``) within
    the same ``on`` keys. Unmatched left rows keep nulls.

    Implementation is the union+ordered-window trick, not a range
    join: tag sides, union, then ``last(payload, ignorenulls=True)``
    over ``Window.partitionBy(on).orderBy(ts, side)`` with rows
    unbounded-preceding..current. Cost is ONE shuffle on the keys plus
    a per-partition sort — no interval explosion, no nested-loop —
    so the plan survives arbitrarily long histories; skewed keys are
    split by AQE like any other sort.

    The right side must be unique per ``(on, right_ts)`` (dedupe with
    ``keep_first`` first if not) — with duplicates the surviving match
    is sort-nondeterministic.

    ``tolerance`` (e.g. ``"7 days"``): matches farther than the
    interval from the left timestamp are nulled out, mirroring
    ``pandas.merge_asof(tolerance=...)``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_ts = right_ts or left_ts
    payload = [c for c in right.columns if c not in on and c != right_ts]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right payload columns collide with left columns: {sorted(overlap)}"
        )
    matched = "__matched_ts"
    side = "__side"
    left_cols = [c for c in left.columns]
    tagged_left = left.select(
        *left_cols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
        F.lit(None).cast(left.schema[left_ts].dataType).alias(matched),
        F.lit(1).alias(side),
    )
    tagged_right = right.select(
        *on,
        F.col(right_ts).alias(left_ts),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in on and c != left_ts
        ],
        *payload,
        F.col(right_ts).alias(matched),
        F.lit(0).alias(side),
    ).select(*left_cols, *payload, matched, F.col(side))
    unioned = tagged_left.unionByName(tagged_right)

    ts_order = F.col(left_ts).asc() if direction == "backward" else F.col(left_ts).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col(side).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left_cols,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
        F.last(matched, ignorenulls=True).over(w).alias(matched),
        F.col(side),
    ).filter(F.col(side) == 1)

    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        in_range = (
            F.col(left_ts) <= F.col(matched) + bound
            if direction == "backward"
            else F.col(left_ts) >= F.col(matched) - bound
        )
        filled = filled.select(
            *left_cols,
            *[F.when(in_range, F.col(c)).alias(c) for c in payload],
            F.when(in_range, F.col(matched)).alias(matched),
        )
    return filled.select(
        *left_cols, *payload, F.col(matched).alias("matched_ts")
    )


def range_point_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    point: str,
    range_start: str,
    range_end: str,
    bin_width_seconds: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: left rows whose ``point`` falls in
    ``[range_start, range_end)`` of a right interval with equal ``on``
    keys (``on`` may be empty for keyless interval tables).

    Without binning, a keyless range join is a nested-loop cross
    product — O(|L|·|R|) and a driver-killer at scale. With
    ``bin_width_seconds`` the join becomes an EQUI-join on
    ``(keys, bin)``: each left point hashes to one bin, each right
    interval replicates across the bins it overlaps (cheap when
    intervals are short relative to the bin width), and the exact
    range predicate filters residuals after the hash match. Pick the
    bin width near the typical interval length: replication factor is
    ``⌈interval/bin⌉+1``.

    ``how='left'`` keeps unmatched left rows with null interval
    payload. It is computed as inner ∪ (left ANTI inner): the residual
    range predicate cannot run post-join on outer rows (null interval
    columns would silently drop them), so unmatched rows are recovered
    with a null-safe anti-join on the full left row — exact even with
    duplicate left rows, because byte-identical rows share one match
    status. Costs one extra shuffle over the inner result.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_point_join supports inner|left, got {how!r}")
    pred = (F.col(point) >= F.col(range_start)) & (F.col(point) < F.col(range_end))
    if bin_width_seconds is None:
        inner = (
            left.join(right, on=on, how="inner").filter(pred)
            if on
            else left.join(right, pred, "inner")
        )
    else:
        bin_col = "__bin"
        secs = F.unix_timestamp
        lb = left.withColumn(bin_col, F.floor(secs(F.col(point)) / bin_width_seconds))
        rb = right.withColumn(
            bin_col,
            F.explode(
                F.sequence(
                    F.floor(secs(F.col(range_start)) / bin_width_seconds),
                    # end is exclusive but sequence() is inclusive: a point in
                    # the end bin can still precede range_end, so keep it.
                    F.floor(secs(F.col(range_end)) / bin_width_seconds),
                )
            ),
        )
        inner = lb.join(rb, on=[*on, bin_col], how="inner").filter(pred).drop(bin_col)
    if how == "inner":
        return inner
    payload = [c for c in right.columns if c not in on]
    matched = inner.select(*left.columns)
    anti_cond = None
    for c in left.columns:
        eq = F.col(f"__l.{c}").eqNullSafe(F.col(f"__m.{c}"))
        anti_cond = eq if anti_cond is None else (anti_cond & eq)
    unmatched = (
        left.alias("__l")
        .join(matched.alias("__m"), anti_cond, "left_anti")
        .select(
            *[F.col(f"__l.{c}") for c in left.columns],
            *[
                F.lit(None).cast(right.schema[c].dataType).alias(c)
                for c in payload
            ],
        )
    )
    return inner.unionByName(unmatched)
