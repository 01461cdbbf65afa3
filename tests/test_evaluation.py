"""Evaluation pipeline (op K2) golden contracts
(`/root/reference/tests/test_evaluation.py:11-38`): already-trained
generators are skipped; summary rows appear per generator; best is the
argmin of average predictive score."""

from __future__ import annotations

import datetime as dt

import pytest

from paqarin_spark.adapter import get_generator_adapter
from paqarin_spark.evaluation import (
    EvaluationPipeline,
    LinearLastStepForecaster,
    MultivariatePredictiveScorer,
    TRAIN_ON_REAL,
)
from paqarin_spark.generator import GeneratorParameters
from paqarin_spark.schema import TimeSeriesSchema

SCHEMA = TimeSeriesSchema(
    item_id_columns=("item_id",),
    timestamp_column="ts",
    value_columns=("v",),
    frequency="D",
)


@pytest.fixture(scope="module")
def training(spark):
    rows = []
    for item_n, item in enumerate(("a", "b", "c")):
        for i in range(20):
            rows.append(
                (item, dt.datetime(2020, 1, 1) + dt.timedelta(days=i), float((i * (item_n + 1)) % 7))
            )
    return spark.createDataFrame(rows, "item_id string, ts timestamp, v double")


def _pipeline():
    p = GeneratorParameters(schema=SCHEMA, sequence_length=4, seed=3)
    gens = {
        "bootstrap": get_generator_adapter("paqarin_spark", "bootstrap", p),
        "gaussian": get_generator_adapter("paqarin_spark", "gaussian", p),
    }
    scorer = MultivariatePredictiveScorer(
        sequence_length=4, iterations=2, number_of_sequences=10
    )
    return EvaluationPipeline(gens, scorer)


def test_pipeline_fits_scores_and_ranks(training):
    pipe = _pipeline().fit(training)
    gens = {r["generator"] for r in pipe.scorer.metric_manager.summary("predictive_score").collect()}
    assert gens == {"bootstrap", "gaussian", TRAIN_ON_REAL}
    assert pipe.best_generator_name in ("bootstrap", "gaussian")
    assert pipe.best_generator is pipe.generator_map[pipe.best_generator_name]
    names = {row["generator"] for row in pipe.training_results}
    assert names == {"bootstrap", "gaussian", TRAIN_ON_REAL}
    for row in pipe.training_results:
        assert row["avg_predictive_score"] is not None


def test_pipeline_skips_trained_generators(training):
    pipe = _pipeline()
    boot = pipe.generator_map["bootstrap"]
    boot.fit(training)
    fitted_windows = boot._windows
    pipe.fit(training)
    # fit() must not re-train an already-fitted generator (golden).
    assert boot._windows is fitted_windows


def test_linear_forecaster_learns_identity(spark):
    # label == last feature step -> a=1, b=0, MAE 0.
    rows = [
        ([{"v": 1.0}, {"v": 2.0}], {"v": 2.0}),
        ([{"v": 3.0}, {"v": 4.0}], {"v": 4.0}),
        ([{"v": 5.0}, {"v": 6.0}], {"v": 6.0}),
    ]
    df = spark.createDataFrame(
        rows, "features array<struct<v:double>>, label struct<v:double>"
    )
    model = LinearLastStepForecaster(["v"]).fit(df)
    a, b = model.coef["v"]
    assert a == pytest.approx(1.0)
    assert b == pytest.approx(0.0)
    assert model.evaluate_mae(df) == pytest.approx(0.0)


def test_ridge_forecaster_uses_all_lags(spark):
    """y = 0.5*x[t-2] + 0.3*x[t-1]: invisible to the last-step-only
    linear head, exactly recoverable from the full lag design."""
    import random

    from paqarin_spark.evaluation import RidgeLagForecaster

    rng = random.Random(5)
    rows = []
    for _ in range(200):
        x1, x2 = rng.uniform(-1, 1), rng.uniform(-1, 1)
        rows.append(([{"v": x1}, {"v": x2}], {"v": 0.5 * x1 + 0.3 * x2}))
    df = spark.createDataFrame(
        rows, "features array<struct<v:double>>, label struct<v:double>"
    )
    ridge = RidgeLagForecaster(["v"], ridge_lambda=1e-6).fit(df)
    w = ridge.weights["v"]
    assert w[0] == pytest.approx(0.5, abs=1e-3)  # lag step 1
    assert w[1] == pytest.approx(0.3, abs=1e-3)  # lag step 2
    assert abs(w[2]) < 1e-3  # bias
    assert ridge.evaluate_mae(df) == pytest.approx(0.0, abs=1e-3)
    # the last-step head structurally cannot fit this relationship
    linear_mae = LinearLastStepForecaster(["v"]).fit(df).evaluate_mae(df)
    assert linear_mae > 10 * max(ridge.evaluate_mae(df), 1e-6)


def test_ridge_fit_invariant_to_partitioning(spark):
    """The Gram partials pre-reduce on the cluster (driver receives
    O(d²) rows, not O(partitions)); the solved weights must not depend
    on how the training set is partitioned."""
    import random

    from paqarin_spark.evaluation import RidgeLagForecaster

    rng = random.Random(11)
    rows = []
    for _ in range(300):
        x1, x2 = rng.uniform(-1, 1), rng.uniform(-1, 1)
        rows.append(([{"v": x1}, {"v": x2}], {"v": 0.4 * x1 - 0.2 * x2 + 0.1}))
    df = spark.createDataFrame(
        rows, "features array<struct<v:double>>, label struct<v:double>"
    )
    w1 = RidgeLagForecaster(["v"]).fit(df.coalesce(1)).weights["v"]
    w32 = RidgeLagForecaster(["v"]).fit(df.repartition(32)).weights["v"]
    assert w32 == pytest.approx(w1, abs=1e-9)
    assert w1[0] == pytest.approx(0.4, abs=1e-2)


def test_ridge_tstr_ranks_faithful_generator_first(training):
    """TSTR ordering with the trainable forecaster: a generator whose
    samples follow the real dynamics must out-rank one emitting noise —
    the defensible-ranking contract VERDICT asks the J3 model for."""
    from paqarin_spark.evaluation import RidgeLagForecaster

    p = GeneratorParameters(schema=SCHEMA, sequence_length=4, seed=3)
    faithful = get_generator_adapter("paqarin_spark", "bootstrap", p)

    class NoiseGenerator:
        """Samples uniform noise shaped like bootstrap output."""

        parameters = p
        is_fitted = False

        def fit(self, df):
            self._spark = df.sparkSession
            self.is_fitted = True
            return self

        def generate(self, n, seed=None):
            import pyspark.sql.functions as F

            seqs = self._spark.range(n).select(F.col("id").alias("sequence_id"))
            return seqs.select(
                "sequence_id",
                F.array(
                    *[
                        F.struct((F.rand(17 + j) * 1000 - 500).alias("v"))
                        for j in range(4)
                    ]
                ).alias("sequence"),
            )

    scorer = MultivariatePredictiveScorer(
        sequence_length=4,
        iterations=2,
        number_of_sequences=10,
        forecaster_factory=RidgeLagForecaster,
    )
    pipe = EvaluationPipeline(
        {"bootstrap": faithful, "noise": NoiseGenerator()}, scorer
    ).fit(training)
    assert pipe.best_generator_name == "bootstrap"
    by_gen = {
        r["generator"]: r["avg_predictive_score"] for r in pipe.training_results
    }
    assert by_gen["bootstrap"] < by_gen["noise"]
    pipe.unpersist()


def test_mlp_evaluate_mae_empty_test_raises(spark):
    """evaluate_mae on an empty test frame must raise a clear error,
    not an opaque None/None TypeError (ADVICE r4)."""
    import pytest

    from paqarin_spark.evaluation import MLPLagForecaster

    train = spark.createDataFrame(
        [
            ([{"v": 0.1}, {"v": 0.2}], {"v": 0.3}),
            ([{"v": 0.2}, {"v": 0.3}], {"v": 0.4}),
            ([{"v": 0.3}, {"v": 0.4}], {"v": 0.5}),
        ],
        "features array<struct<v double>>, label struct<v double>",
    )
    f = MLPLagForecaster(["v"], epochs=1, hidden=4).fit(train)
    with pytest.raises(ValueError, match="empty test set"):
        f.evaluate_mae(train.limit(0))


def test_gbt_forecaster_beats_linear_on_nonlinear_dynamics(spark):
    """J4 ensemble-tree closure: MLlib gradient-boosted trees must fit
    y = x1*x2 (pure interaction, invisible to any linear model) far
    better than the linear head — real distributed boosting, in-env."""
    import random

    from paqarin_spark.evaluation import (
        GBTLagForecaster,
        LinearLastStepForecaster,
    )

    rng = random.Random(11)
    rows = []
    for _ in range(400):
        x1, x2 = rng.uniform(-1, 1), rng.uniform(-1, 1)
        rows.append(([{"v": x1}, {"v": x2}], {"v": x1 * x2}))
    df = spark.createDataFrame(
        rows, "features array<struct<v:double>>, label struct<v:double>"
    )
    gbt = GBTLagForecaster(["v"], max_iter=30, max_depth=4).fit(df)
    lin = LinearLastStepForecaster(["v"]).fit(df)
    gbt_mae = gbt.evaluate_mae(df)
    lin_mae = lin.evaluate_mae(df)
    assert gbt_mae < 0.5 * lin_mae
    assert gbt_mae < 0.1


def test_gbt_forecaster_multivariate_and_empty_contracts(spark):
    """Two value columns -> one boosted model per target; empty
    train/test raise the same clear errors as the other lag heads."""
    import pytest

    from paqarin_spark.evaluation import GBTLagForecaster

    rows = [
        (
            [{"a": 0.1 * i, "b": 0.2}, {"a": 0.3, "b": 0.1 * i}],
            {"a": 0.1 * i + 0.3, "b": 0.2 + 0.1 * i},
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows,
        "features array<struct<a:double,b:double>>, "
        "label struct<a:double,b:double>",
    )
    f = GBTLagForecaster(["a", "b"], max_iter=5, max_depth=2).fit(df)
    assert set(f.models) == {"a", "b"}
    assert f.evaluate_mae(df) < 1.0
    with pytest.raises(ValueError, match="empty training set"):
        GBTLagForecaster(["a", "b"]).fit(df.limit(0))
    with pytest.raises(ValueError, match="empty test set"):
        f.evaluate_mae(df.limit(0))


def test_gbt_forecaster_in_tstr_scorer_factory(spark):
    """GBTLagForecaster satisfies the forecaster_factory contract of
    MultivariatePredictiveScorer (factory(cols) -> fit -> mae)."""
    from paqarin_spark.evaluation import GBTLagForecaster

    rows = [
        ([{"v": 0.1 * i}, {"v": 0.1 * i + 0.1}], {"v": 0.1 * i + 0.2})
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "features array<struct<v:double>>, label struct<v:double>"
    )
    factory = lambda cols: GBTLagForecaster(cols, max_iter=30, max_depth=4)  # noqa: E731
    f = factory(["v"]).fit(df)
    assert f.evaluate_mae(df) < 0.2
