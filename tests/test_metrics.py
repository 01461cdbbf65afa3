"""Port of the metric-registry golden tests
(`/root/reference/tests/test_evaluation.py:41-70`): per-generator
mean / population std across iterations, best-generator argmin."""

from __future__ import annotations

import math

import pytest

from paqarin_spark.metrics.registry import MetricManager, mean_absolute_error


@pytest.fixture()
def manager(spark):
    m = MetricManager(spark)
    m.register_iteration("gen_a", 0, {"mae": 1.0})
    m.register_iteration("gen_a", 1, {"mae": 3.0})
    m.register_iteration("gen_b", 0, {"mae": 2.0})
    m.register_iteration("gen_b", 1, {"mae": 2.0})
    return m


def test_average_and_population_std(manager):
    assert manager.calculate_average("gen_a", "mae") == 2.0
    # population std (ddof=0): sqrt(((1-2)^2 + (3-2)^2)/2) = 1.0
    assert math.isclose(manager.calculate_standard_deviation("gen_a", "mae"), 1.0)
    assert manager.calculate_standard_deviation("gen_b", "mae") == 0.0


def test_summary_matches_local_math(manager):
    rows = {r["generator"]: r for r in manager.summary("mae").collect()}
    assert rows["gen_a"]["avg_mae"] == 2.0
    assert rows["gen_a"]["std_mae"] == 1.0
    assert rows["gen_b"]["std_mae"] == 0.0


def test_best_generator_smaller_wins(manager):
    # gen_a avg 2.0 == gen_b avg 2.0 -> lexicographic tie-break
    assert manager.best_generator("mae") == "gen_a"
    manager.register_iteration("gen_b", 2, {"mae": 0.5})
    assert manager.best_generator("mae") == "gen_b"


def test_get_all_values(manager):
    allv = manager.get_all_values("mae")
    assert allv == {"gen_a": [1.0, 3.0], "gen_b": [2.0, 2.0]}


def test_mean_absolute_error(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (3.0, 1.0)], "label double, pred double"
    )
    assert mean_absolute_error(df, "label", "pred") == 1.5


# ----------------------------------------- paired permutation test


def test_paired_permutation_test_separates_signal_from_noise(spark):
    """A strongly one-sided diff set is significant (every sign flip
    shrinks |T|), a symmetric one is not; the add-one p-value bounds
    hold and n_extreme is consistent with p."""
    import pytest

    from paqarin_spark.metrics.errors import paired_permutation_test

    signal = spark.createDataFrame(
        [(i, 1.0 + 0.01 * i) for i in range(40)], "k int, d double"
    )
    r = paired_permutation_test(signal, "k", "d", rounds=99).collect()[0]
    assert r["n_units"] == 40
    assert r["mean_diff"] > 1.0
    assert r["p_value"] <= 0.05
    assert r["n_extreme"] == round(r["p_value"] * 100) - 1

    # antisymmetric diffs: T_obs == 0, every permutation is >= in
    # absolute value, so the p-value is exactly 1
    noise = spark.createDataFrame(
        [(i, 1.0 if i % 2 == 0 else -1.0) for i in range(40)],
        "k int, d double",
    )
    r2 = paired_permutation_test(noise, "k", "d", rounds=99).collect()[0]
    assert r2["mean_diff"] == 0.0
    assert r2["p_value"] == 1.0

    with pytest.raises(ValueError, match="rounds"):
        paired_permutation_test(signal, "k", "d", rounds=0)


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    """The percentile interval brackets the sample mean for a
    well-behaved sample, both endpoints are replicate means (within
    the value range), the run is bit-deterministic, and validation
    raises."""
    import pytest

    from paqarin_spark.metrics.errors import bootstrap_ci

    df = spark.createDataFrame(
        [(i, 10.0 + (i % 11) * 0.5) for i in range(80)], "k int, v double"
    )
    r1 = bootstrap_ci(df, "k", "v", rounds=99).collect()[0]
    r2 = bootstrap_ci(df, "k", "v", rounds=99).collect()[0]
    assert r1 == r2
    assert r1["n_units"] == 80
    assert r1["n_rounds"] == 99
    assert r1["ci_lo"] <= r1["mean_value"] <= r1["ci_hi"]
    assert 10.0 <= r1["ci_lo"] <= r1["ci_hi"] <= 15.0
    assert r1["ci_lo"] < r1["ci_hi"]  # non-degenerate

    with pytest.raises(ValueError, match="rounds"):
        bootstrap_ci(df, "k", "v", rounds=1)


def test_permutation_and_bootstrap_drop_null_keys(spark):
    """NULL unit keys are excluded, not drawn: concat_ws would skip a
    NULL key (different md5 input than the oracle's NULL-propagating
    ||), so both stats operators drop those units symmetrically."""
    from paqarin_spark.metrics.errors import (
        bootstrap_ci,
        paired_permutation_test,
    )

    df = spark.createDataFrame(
        [(None, 5.0)] + [(str(i), 1.0 + i * 0.01) for i in range(20)],
        "k string, d double",
    )
    r = paired_permutation_test(df, "k", "d", rounds=19).collect()[0]
    assert r["n_units"] == 20
    b = bootstrap_ci(df, "k", "d", rounds=19).collect()[0]
    assert b["n_units"] == 20


def test_ev30_wasserstein_closed_form_across_buckets(spark, tmp_path):
    """Closed-form pin for ev30's bucketed prefix-sum W1: halves
    [1, 2] vs [2, 3] have Wasserstein-1 distance exactly 1.0, and the
    three distinct micro-values land in DIFFERENT equal-width buckets
    (min 1e6, max 3e6, 1024 bins), so the next-value gap for each
    bucket's last row must come from the next-bucket-minimum stitch —
    a wrong or missing stitch changes the sum, not just the plan."""
    import pandas as pd

    from paqarin_spark.plans.queries import ev30_wasserstein_split

    pd.DataFrame(
        {
            "event_id": [0, 2, 1, 3],
            "ts": pd.to_datetime(["2024-01-01"] * 4),
            "user_id": [1, 1, 1, 1],
            "event_type": ["A"] * 4,
            "value": [1.0, 2.0, 2.0, 3.0],
            "props": [""] * 4,
        }
    ).to_parquet(str(tmp_path / "events.parquet"))
    row = ev30_wasserstein_split(spark, str(tmp_path)).collect()[0]
    assert row["event_type"] == "A"
    assert row["n_a"] == 2 and row["n_b"] == 2
    assert row["w1"] == 1.0
