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

from pyspark.sql import DataFrame
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

    The salt is ``rand(seed)``-derived: any per-row value works for
    correctness since the right side covers all buckets; a seeded draw
    keeps retries deterministic per task attempt.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join preserves semantics for inner/left joins only; "
            f"got {how!r} (the replicated right side would duplicate "
            "right-preserved rows)"
        )
    salted_left = left.withColumn(
        _SALT, (F.rand(seed) * salt_buckets).cast("int")
    )
    buckets = F.array(*[F.lit(i) for i in range(salt_buckets)])
    salted_right = right.withColumn(_SALT, F.explode(buckets))
    return salted_left.join(salted_right, on=[*on, _SALT], how=how).drop(_SALT)
