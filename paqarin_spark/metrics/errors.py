"""Forecast error metrics (SURVEY.md §2 op I5).

Reference: the univariate scorer defers to
``predictor.evaluate(test)`` (`paqarin/metrics/univariate_metrics.py:434-476`);
the metrics themselves are standard aggregations, expressed here as
reusable aggregate expressions (one distributed pass computes all of
them) — avg(abs), avg(abs/y), sqrt(avg(pow)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    # NULL keys are dropped, not drawn: uniform_hash's concat_ws would
    # silently SKIP a NULL key column ('seed#r') while SQL '||'
    # propagates NULL — the draws would diverge between engines
    d = (
        df.select(
            F.col(key_column).cast("string").alias("_k"),
            F.round(F.col(diff_column), 12)
            .cast("decimal(38,12)")
            .alias("_d"),
        )
        .where(F.col("_d").isNotNull() & F.col("_k").isNotNull())
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


# Cumulative Poisson(1) pmf thresholds, truncated at 4 draws — the
# deterministic bootstrap weights. The literals are mirrored VERBATIM
# in the ev19 oracle SQL; both engines parse the same decimal text to
# the same double.
POISSON1_CDF = (
    0.3678794411714423,
    0.7357588823428846,
    0.9196986029286058,
    0.9810118431238462,
)


def bootstrap_ci(
    df: DataFrame,
    key_column: str,
    value_column: str,
    rounds: int = 200,
    seed: str = "boot",
) -> DataFrame:
    """Percentile bootstrap confidence interval for a per-unit metric
    mean — the uncertainty quantification beside
    :func:`paired_permutation_test`'s significance test. Each of
    ``rounds`` resamples draws every unit's multiplicity from a
    truncated Poisson(1) (the classical Poisson bootstrap — the
    resampling scheme that needs NO global n and therefore
    distributes: weights are per-row md5 draws, the q72 construction)
    and the 95% interval is the [floor(0.025·R)+1, R−floor(0.025·R)]
    order statistics of the replicate means.

    Determinism: weighted sums build from exact-decimal self-additions
    (weight ∈ {0..4} → x, x+x, ... — no decimal×int precision cap in
    sight), replicate means are 12dp-rounded doubles of exact inputs,
    and the order statistics tie-break on the replicate index.
    Zero-weight replicates (possible only for tiny corpora) are
    excluded by the same predicate on both engines.

    Scale posture: corpus reduces to one row per unit first
    (localCheckpointed — two consumers); the rounds × units fan-out is
    linear and partial-aggregatable (``rounds`` groups); ranking runs
    on ≤``rounds`` rows.

    Returns one row: (n_units, mean_value, n_rounds, ci_lo, ci_hi)."""
    from paqarin_spark.functions import uniform_hash

    if rounds < 2:
        raise ValueError("rounds must be >= 2")
    # NULL keys dropped for the same engine-divergence reason as in
    # paired_permutation_test: concat_ws skips NULLs, SQL '||' does not
    d = (
        df.select(
            F.col(key_column).cast("string").alias("_k"),
            F.round(F.col(value_column), 12)
            .cast("decimal(38,12)")
            .alias("_x"),
        )
        .where(F.col("_x").isNotNull() & F.col("_k").isNotNull())
        .localCheckpoint()
    )
    base = d.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_x").alias("_s")
    )
    spark = df.sparkSession
    c0, c1, c2, c3 = POISSON1_CDF
    x = F.col("_x")
    zero = F.lit("0").cast("decimal(38,12)")
    u = uniform_hash(F.lit(seed), F.col("_r"), F.col("_k"))
    term = (
        F.when(u < c0, zero)
        .when(u < c1, x)
        .when(u < c2, (x + x).cast("decimal(38,12)"))
        .when(u < c3, (x + x + x).cast("decimal(38,12)"))
        .otherwise((x + x + x + x).cast("decimal(38,12)"))
    )
    wcol = (
        F.when(u < c0, F.lit(0))
        .when(u < c1, F.lit(1))
        .when(u < c2, F.lit(2))
        .when(u < c3, F.lit(3))
        .otherwise(F.lit(4))
    )
    stats = (
        d.crossJoin(
            spark.range(1, rounds + 1).select(F.col("id").alias("_r"))
        )
        .select("_r", term.alias("_sx"), wcol.alias("_w"))
        .groupBy("_r")
        .agg(F.sum("_sx").alias("_ss"), F.sum("_w").alias("_ww"))
    )
    kept = stats.where(F.col("_ww") > 0).select(
        "_r",
        F.round(F.col("_ss").cast("double") / F.col("_ww"), 12).alias("_t"),
    )
    wr = Window.orderBy(F.asc("_t"), F.asc("_r"))
    wall = Window.partitionBy()
    ranked = kept.select(
        "_t",
        F.row_number().over(wr).alias("_rk"),
        F.count(F.lit(1)).over(wall).alias("_c"),
    )
    ci = ranked.agg(
        F.max("_c").alias("n_rounds"),
        F.max(
            F.when(
                F.col("_rk") == F.floor(0.025 * F.col("_c")) + 1,
                F.col("_t"),
            )
        ).alias("_lo"),
        F.max(
            F.when(
                F.col("_rk")
                == F.col("_c") - F.floor(0.025 * F.col("_c")),
                F.col("_t"),
            )
        ).alias("_hi"),
    )
    return base.crossJoin(F.broadcast(ci)).select(
        F.col("_n").cast("long").alias("n_units"),
        (
            F.round(F.col("_s").cast("double") / F.col("_n"), 6)
            + F.lit(0.0)
        ).alias("mean_value"),
        F.col("n_rounds").cast("long").alias("n_rounds"),
        (F.round(F.col("_lo"), 6) + F.lit(0.0)).alias("ci_lo"),
        (F.round(F.col("_hi"), 6) + F.lit(0.0)).alias("ci_hi"),
    )
