"""Univariate panel transform (op F2), golden contract port of
`/root/reference/tests/test_univariate_metrics.py:33-87`: dedup,
regularity filter, dense upsample, zero fill, weekend covariate."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from paqarin_spark.metrics.univariate import panel_transform, to_panel
from paqarin_spark.schema import TimeSeriesSchema

SCHEMA = TimeSeriesSchema(
    item_id_columns=("entity",),
    timestamp_column="ts",
    value_columns=("v",),
    frequency="D",
)


@pytest.fixture(scope="module")
def raw(spark):
    def d(day):
        return dt.datetime(2020, 1, day)

    rows = [
        # regular daily entity with a duplicate key (second arrival dropped)
        ("reg", d(1), 1.0),
        ("reg", d(1), 99.0),
        ("reg", d(2), 2.0),
        ("reg", d(3), 3.0),
        # entity with irregular gaps -> dropped by the frequency filter
        ("irr", d(1), 1.0),
        ("irr", d(2), 1.0),
        ("irr", d(5), 1.0),
        # regular entity with a constant 2-day gap -> kept, upsampled
        ("gap2", d(1), 10.0),
        ("gap2", d(3), 30.0),
    ]
    return spark.createDataFrame(rows, "entity string, ts timestamp, v double")


def test_panel_rename(raw):
    p = to_panel(raw, SCHEMA)
    assert p.columns == ["item_id", "timestamp", "target"]


def test_panel_transform_golden(raw):
    out = panel_transform(raw, SCHEMA)
    items = {r["item_id"] for r in out.select("item_id").distinct().collect()}
    assert items == {"reg", "gap2"}  # irregular entity dropped

    reg = {
        str(r["timestamp"])[:10]: r["target"]
        for r in out.where(F.col("item_id") == "reg").collect()
    }
    # keep-first kept 1.0 (not 99.0); index dense over [01-01, 01-03]
    assert reg == {"2020-01-01": 1.0, "2020-01-02": 2.0, "2020-01-03": 3.0}

    gap2 = {
        str(r["timestamp"])[:10]: r["target"]
        for r in out.where(F.col("item_id") == "gap2").collect()
    }
    # upsampled at schema frequency (daily): missing tick filled with 0
    assert gap2 == {"2020-01-01": 10.0, "2020-01-02": 0.0, "2020-01-03": 30.0}


def test_panel_transform_weekend_covariate(raw):
    out = panel_transform(raw, SCHEMA)
    # 2020-01-04/05 are Sat/Sun; our fixture covers 01-01..03 (Wed-Fri)
    assert all(r["is_weekend"] == 0.0 for r in out.collect())


def test_univariate_forecast_scorer_end_to_end(spark):
    import datetime as dt

    from paqarin_spark.generator import GeneratorParameters
    from paqarin_spark.generators import BlockBootstrapGenerator, GaussianPerStepGenerator
    from paqarin_spark.metrics.univariate import (
        FORECAST_SCORE,
        TRAIN_ON_REAL,
        UnivariateForecastScorer,
    )
    from paqarin_spark.schema import TimeSeriesSchema

    schema = TimeSeriesSchema(
        item_id_columns=("item",),
        timestamp_column="ts",
        value_columns=("v",),
        frequency="D",
        order_columns=(),
    )
    rows = [
        (item, dt.datetime(2021, 3, 1) + dt.timedelta(days=i),
         10.0 + (i % 7) + ord(item[0]) % 5)
        for item in ("a", "b", "c")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "item string, ts timestamp, v double")
    params = GeneratorParameters(schema=schema, sequence_length=8, seed=3)
    gens = {
        "bootstrap": BlockBootstrapGenerator(params).fit(df),
        "gaussian": GaussianPerStepGenerator(params).fit(df),
    }
    scorer = UnivariateForecastScorer(
        prediction_length=7, iterations=2, number_of_sequences=20
    )
    for name, g in gens.items():
        scorer.calculate(g, name, df)
    summary = {r["generator"]: r for r in scorer.summary_metrics}
    # one row per generator + the control; scores are finite positives
    assert set(summary) == {"bootstrap", "gaussian", TRAIN_ON_REAL}
    assert all(r[f"avg_{FORECAST_SCORE}"] >= 0 for r in summary.values())
    assert scorer.best_generator_name in ("bootstrap", "gaussian")
    # iterations were registered individually (op I2)
    vals = scorer.metric_manager.get_iteration_values("bootstrap", FORECAST_SCORE)
    assert len(vals) == 2
    scorer.unpersist()
    for g in gens.values():
        g.unpersist()


def test_forecasters_disagree_and_ranking_follows_mae(spark):
    """VERDICT r2 item 4: the two J4 pluggables must make DIFFERENT
    errors on constructed panels — drift wins on a linear trend,
    the multiplicative weekday profile wins on scaled seasonality —
    and the best-generator argmin (I4) follows forecast MAE."""
    import datetime as dt

    from paqarin_spark.metrics.errors import mae
    from paqarin_spark.metrics.registry import MetricManager
    from paqarin_spark.metrics.univariate import (
        FORECAST_SCORE,
        ITEM_ID,
        TARGET,
        TIMESTAMP,
        GlobalWeekdayProfileForecaster,
        SeasonalNaiveDriftForecaster,
    )

    def panel(rows):
        return spark.createDataFrame(
            rows, f"{ITEM_ID} string, {TIMESTAMP} timestamp, {TARGET} double"
        )

    def score(model, train, actuals):
        preds = model.predict(train, actuals.select(ITEM_ID, TIMESTAMP))
        joined = actuals.join(preds, on=[ITEM_ID, TIMESTAMP], how="inner")
        return joined.agg(
            mae(F.col(TARGET), F.col("target_pred")).alias("m")
        ).collect()[0]["m"]

    base_day = dt.datetime(2021, 3, 1)

    # --- linear trend, no seasonality: drift must win ---
    trend_rows = [
        ("a", base_day + dt.timedelta(days=i), 10.0 + 2.0 * i) for i in range(28)
    ]
    trend = panel(trend_rows)
    train = panel(trend_rows[:21])
    actuals = panel(trend_rows[21:])
    profile_mae = score(GlobalWeekdayProfileForecaster().fit(train), train, actuals)
    drift_mae = score(SeasonalNaiveDriftForecaster().fit(train), train, actuals)
    assert drift_mae != profile_mae  # genuinely different models
    assert drift_mae < profile_mae  # trend: drift extrapolates, profile cannot

    # --- multiplicative weekly pattern at two item scales: profile wins ---
    mult = [1.0, 0.5, 0.8, 1.2, 1.5, 2.0, 1.0]
    seas_rows = [
        (item, base_day + dt.timedelta(days=i), scale * mult[i % 7])
        for item, scale in (("a", 10.0), ("b", 100.0))
        for i in range(28)
    ]
    s_train = panel([r for r in seas_rows if r[1] < base_day + dt.timedelta(days=21)])
    s_actuals = panel([r for r in seas_rows if r[1] >= base_day + dt.timedelta(days=21)])
    profile_mae_s = score(
        GlobalWeekdayProfileForecaster().fit(s_train), s_train, s_actuals
    )
    drift_mae_s = score(
        SeasonalNaiveDriftForecaster().fit(s_train), s_train, s_actuals
    )
    assert profile_mae_s < drift_mae_s

    # --- ranking follows forecast MAE through the registry (I2+I4) ---
    mm = MetricManager(spark)
    mm.register_iteration("profile", 0, {FORECAST_SCORE: float(profile_mae)})
    mm.register_iteration("drift", 0, {FORECAST_SCORE: float(drift_mae)})
    assert mm.best_generator(FORECAST_SCORE) == "drift"


def test_scorer_pluggable_drift_factory_end_to_end(spark):
    """The non-batched scorer branch hosts any forecaster factory; the
    drift forecaster must flow through TSTR scoring end to end."""
    import datetime as dt

    from paqarin_spark.generator import GeneratorParameters
    from paqarin_spark.generators import BlockBootstrapGenerator
    from paqarin_spark.metrics.univariate import (
        FORECAST_SCORE,
        TRAIN_ON_REAL,
        SeasonalNaiveDriftForecaster,
        UnivariateForecastScorer,
    )
    from paqarin_spark.schema import TimeSeriesSchema

    schema = TimeSeriesSchema(
        item_id_columns=("item",),
        timestamp_column="ts",
        value_columns=("v",),
        frequency="D",
    )
    rows = [
        (item, dt.datetime(2021, 3, 1) + dt.timedelta(days=i), 10.0 + i + (i % 7))
        for item in ("a", "b")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "item string, ts timestamp, v double")
    gen = BlockBootstrapGenerator(
        GeneratorParameters(schema=schema, sequence_length=8, seed=3)
    ).fit(df)
    scorer = UnivariateForecastScorer(
        prediction_length=7,
        iterations=1,
        number_of_sequences=10,
        forecaster_factory=SeasonalNaiveDriftForecaster,
    )
    scorer.calculate(gen, "bootstrap", df)
    summary = {r["generator"]: r for r in scorer.summary_metrics}
    assert set(summary) == {"bootstrap", TRAIN_ON_REAL}
    assert summary["bootstrap"][f"avg_{FORECAST_SCORE}"] >= 0
    scorer.unpersist()
    gen.unpersist()


def test_drift_batched_scores_match_per_iteration_path(spark):
    """calculate_many's batched drift plan must register the same
    scores as the per-iteration fit->predict loop (a non-class factory
    callable falls through to the loop, same models, same seeds)."""
    import datetime as dt

    from paqarin_spark.generator import GeneratorParameters
    from paqarin_spark.generators import BlockBootstrapGenerator, GaussianPerStepGenerator
    from paqarin_spark.metrics.univariate import (
        FORECAST_SCORE,
        SeasonalNaiveDriftForecaster,
        UnivariateForecastScorer,
    )
    from paqarin_spark.schema import TimeSeriesSchema

    schema = TimeSeriesSchema(
        item_id_columns=("item",),
        timestamp_column="ts",
        value_columns=("v",),
        frequency="D",
    )
    rows = [
        (item, dt.datetime(2021, 3, 1) + dt.timedelta(days=i),
         5.0 + i * 0.5 + (i % 7) + ord(item[0]) % 3)
        for item in ("a", "b")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "item string, ts timestamp, v double")
    params = GeneratorParameters(schema=schema, sequence_length=8, seed=11)

    def run(factory):
        gens = {
            "bootstrap": BlockBootstrapGenerator(params).fit(df),
            "gaussian": GaussianPerStepGenerator(params).fit(df),
        }
        scorer = UnivariateForecastScorer(
            prediction_length=7,
            iterations=2,
            number_of_sequences=10,
            forecaster_factory=factory,
        )
        scorer.calculate_many(gens, df)
        out = {
            (name, it): scorer.metric_manager.get_iteration_values(
                name, FORECAST_SCORE
            )[it]
            for name in gens
            for it in range(2)
        }
        scorer.unpersist()
        for g in gens.values():
            g.unpersist()
        return out

    batched = run(SeasonalNaiveDriftForecaster)
    looped = run(lambda: SeasonalNaiveDriftForecaster())
    assert set(batched) == set(looped)
    for combo, score in batched.items():
        assert score == pytest.approx(looped[combo], rel=1e-9)


def test_gbt_panel_forecaster_learns_weekday_level_interaction(spark):
    """The GBT panel head must learn a weekday x level interaction
    that both linear stand-ins half-miss: items whose weekend values
    MULTIPLY at high levels but stay flat at low levels."""
    import datetime as dt

    from paqarin_spark.metrics.univariate import (
        PANEL_SCHEMA,
        GBTPanelForecaster,
        GlobalWeekdayProfileForecaster,
        panel_transform,
    )
    from paqarin_spark.schema import TimeSeriesSchema

    schema = TimeSeriesSchema(
        item_id_columns=("item",),
        timestamp_column="ts",
        value_columns=("v",),
        frequency="D",
    )
    rows = []
    for item, lvl in (("hi", 100.0), ("lo", 5.0)):
        for i in range(60):
            d = dt.datetime(2021, 3, 1) + dt.timedelta(days=i)
            wknd = d.weekday() >= 5
            # high-level item doubles on weekends; low-level stays flat
            v = lvl * (2.0 if (wknd and lvl > 50) else 1.0)
            rows.append((item, d, v))
    df = spark.createDataFrame(rows, "item string, ts timestamp, v double")
    panel = panel_transform(df, schema)
    train = panel.where(F.col("timestamp") < "2021-04-15")
    test_index = panel.where(F.col("timestamp") >= "2021-04-15").select(
        "item_id", "timestamp"
    )
    actual = panel.where(F.col("timestamp") >= "2021-04-15")

    def mae(model):
        pred = model.predict(train, test_index)
        return (
            pred.join(actual, on=["item_id", "timestamp"])
            .agg(F.avg(F.abs(F.col("target_pred") - F.col("target"))))
            .first()[0]
        )

    gbt_mae = mae(GBTPanelForecaster(max_iter=30, max_depth=4).fit(train))
    prof_mae = mae(GlobalWeekdayProfileForecaster().fit(train))
    # the multiplicative-profile model applies ONE global weekend
    # multiplier to both items -> systematic error on one of them;
    # trees split on (dow, level) and nail both
    assert gbt_mae < 0.7 * prof_mae


def test_gbt_panel_forecaster_in_scorer_factory(spark):
    """GBTPanelForecaster flows through the TSTR scorer factory
    boundary end to end (J4 seam, ensemble-tree pluggable)."""
    import datetime as dt

    from paqarin_spark.generator import GeneratorParameters
    from paqarin_spark.generators import BlockBootstrapGenerator
    from paqarin_spark.metrics.univariate import (
        FORECAST_SCORE,
        TRAIN_ON_REAL,
        GBTPanelForecaster,
        UnivariateForecastScorer,
    )
    from paqarin_spark.schema import TimeSeriesSchema

    schema = TimeSeriesSchema(
        item_id_columns=("item",),
        timestamp_column="ts",
        value_columns=("v",),
        frequency="D",
    )
    rows = [
        (item, dt.datetime(2021, 3, 1) + dt.timedelta(days=i), 10.0 + i % 7)
        for item in ("a", "b")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "item string, ts timestamp, v double")
    gen = BlockBootstrapGenerator(
        GeneratorParameters(schema=schema, sequence_length=8, seed=5)
    ).fit(df)
    scorer = UnivariateForecastScorer(
        prediction_length=7,
        iterations=1,
        number_of_sequences=10,
        forecaster_factory=lambda: GBTPanelForecaster(max_iter=5, max_depth=2),
    )
    scorer.calculate(gen, "bootstrap", df)
    summary = {r["generator"]: r for r in scorer.summary_metrics}
    assert set(summary) == {"bootstrap", TRAIN_ON_REAL}
    assert summary["bootstrap"][f"avg_{FORECAST_SCORE}"] >= 0
    scorer.unpersist()
    gen.unpersist()
