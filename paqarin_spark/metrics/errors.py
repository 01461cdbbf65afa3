"""Forecast error metrics (SURVEY.md §2 op I5).

Reference: the univariate scorer defers to
``predictor.evaluate(test)`` (`paqarin/metrics/univariate_metrics.py:434-476`);
the metrics themselves are standard aggregations, expressed here as
reusable aggregate expressions (one distributed pass computes all of
them) — avg(abs), avg(abs/y), sqrt(avg(pow)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mae(label, prediction) -> F.Column:
    return F.avg(F.abs(prediction - label))


def mape(label, prediction) -> F.Column:
    """Mean absolute percentage error; rows with label == 0 are
    excluded from the mean (avg ignores nulls)."""
    return F.avg(
        F.when(label != 0, F.abs((prediction - label) / label))
    )


def rmse(label, prediction) -> F.Column:
    return F.sqrt(F.avg(F.pow(prediction - label, F.lit(2))))


def smape(label, prediction) -> F.Column:
    """Symmetric MAPE in [0, 2]; 0/0 rows are excluded."""
    denom = (F.abs(label) + F.abs(prediction)) / F.lit(2.0)
    return F.avg(F.when(denom != 0, F.abs(prediction - label) / denom))


def evaluate_forecast(
    df: DataFrame, label_column: str, prediction_column: str
) -> dict[str, float]:
    """One-pass evaluation: all error metrics from a single action,
    shaped like the reference's ``{metric: value}`` dict."""
    y = F.col(label_column)
    p = F.col(prediction_column)
    row = df.agg(
        mae(y, p).alias("mae"),
        mape(y, p).alias("mape"),
        rmse(y, p).alias("rmse"),
        smape(y, p).alias("smape"),
    ).collect()[0]
    return {k: (None if row[k] is None else float(row[k])) for k in ("mae", "mape", "rmse", "smape")}


def paired_permutation_test(
    df: DataFrame,
    key_column: str,
    diff_column: str,
    rounds: int = 200,
    seed: str = "perm",
) -> DataFrame:
    """Paired sign-flip permutation test (Fisher randomization) over
    per-unit metric differences — the significance check an
    evaluation pipeline runs before declaring one forecaster/generator
    better than another ("is the mean paired difference explainable by
    chance?").

    ``df`` holds one row per paired unit: (key, diff) with ``diff``
    already on the caller's 12dp replay lattice. Each of ``rounds``
    permutations flips every unit's sign by the portable md5 uniform
    keyed on (seed, round, key) — the q72/tx27 draw construction — and
    the two-sided p-value is the add-one estimate
    (1 + #{|T_r| >= |T_obs|}) / (rounds + 1).

    Determinism: sums accumulate as exact DECIMAL(38,12) (order-free),
    and because every permutation shares the same unit count, the
    |mean| comparison reduces to comparing the exact-decimal SUMS — no
    division anywhere near the decision boundary.

    Scale posture: the corpus reduces to one row per unit BEFORE the
    rounds × units fan-out; the fan-out is linear, fully
    partial-aggregatable (``rounds`` groups), and never touches raw
    rows. The unit table is localCheckpointed: two consumers (observed
    stat + the fan-out) would otherwise re-run the caller's whole
    error pipeline.

    Returns one row: (n_units, mean_diff, n_extreme, p_value)."""
    from paqarin_spark.functions import uniform_hash

    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    d = (
        df.select(
            F.col(key_column).cast("string").alias("_k"),
            F.round(F.col(diff_column), 12)
            .cast("decimal(38,12)")
            .alias("_d"),
        )
        .where(F.col("_d").isNotNull())
        .localCheckpoint()
    )
    obs = d.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_d").alias("_t_obs"),
    )
    spark = df.sparkSession
    perms = (
        d.crossJoin(
            spark.range(1, rounds + 1).select(F.col("id").alias("_r"))
        )
        .select(
            "_r",
            F.when(
                uniform_hash(F.lit(seed), F.col("_r"), F.col("_k"))
                < F.lit(0.5),
                F.col("_d"),
            )
            .otherwise(-F.col("_d"))
            .alias("_sd"),
        )
        .groupBy("_r")
        .agg(F.sum("_sd").alias("_t"))
    )
    extreme = perms.crossJoin(F.broadcast(obs)).agg(
        F.sum(
            F.when(
                F.abs(F.col("_t")) >= F.abs(F.col("_t_obs")), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("n_extreme")
    )
    return (
        obs.crossJoin(F.broadcast(extreme))
        .select(
            F.col("_n").cast("long").alias("n_units"),
            (
                F.round(
                    F.col("_t_obs").cast("double") / F.col("_n"), 6
                )
                + F.lit(0.0)
            ).alias("mean_diff"),
            F.col("n_extreme").cast("long").alias("n_extreme"),
            F.round(
                (F.lit(1) + F.col("n_extreme"))
                / F.lit(float(rounds + 1)),
                6,
            ).alias("p_value"),
        )
    )
