"""Univariate scorer data transformer (SURVEY.md §2 op F2): the
Spark-native ``AutoGluonDataTransformer.transform`` analogue.

Reference (`paqarin/metrics/univariate_metrics.py:53-119`, golden
`tests/test_univariate_metrics.py:33-87`): rename to panel columns
(B4), keep-first dedup on (item, timestamp) (E2), upsample to a
regular index (D2), drop items with no inferable frequency, fill
missing values with 0 (G7), add the weekend covariate (G6).

The "no inferable frequency" heuristic is re-specified as the
deterministic gap-regularity predicate of
:func:`paqarin_spark.operators.resample.regular_index_filter`
(SURVEY.md §7 'What's hard' — deliberate, pinned deviation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from paqarin_spark.functions import is_weekend
from paqarin_spark.operators.dedup import keep_first
from paqarin_spark.operators.resample import parse_timestamps
from paqarin_spark.schema import TimeSeriesSchema, freq_to_spark

ITEM_ID = "item_id"
TIMESTAMP = "timestamp"
TARGET = "target"
WEEKEND = "is_weekend"


def to_panel(df: DataFrame, schema: TimeSeriesSchema, value_column: str | None = None) -> DataFrame:
    """Op B4: rename role columns to the fixed panel names
    (item_id, timestamp, target)."""
    value = value_column or schema.values[0]
    if len(schema.ids) != 1:
        df = df.withColumn("_item", F.concat_ws("|", *schema.ids))
        id_col = "_item"
    else:
        id_col = schema.ids[0]
    return df.select(
        F.col(id_col).alias(ITEM_ID),
        F.col(schema.timestamp_column).alias(TIMESTAMP),
        F.col(value).cast("double").alias(TARGET),
    )


def panel_transform(
    df: DataFrame,
    schema: TimeSeriesSchema,
    fill_value: float = 0.0,
    add_covariates: bool = True,
) -> DataFrame:
    """Op F2 end-to-end: panel rename -> E2 keep-first dedup -> per-item
    calendar upsample (D2, spanning each ITEM's own [min, max], not the
    global range) -> drop irregular items -> fill -> weekend covariate.

    Returns one row per (item, tick) with a dense regular index per
    surviving item. Single shuffle on item; the per-item calendar is a
    sequence() over that item's bounds — no driver loop.
    """
    parsed = parse_timestamps(df, schema)
    panel = to_panel(parsed, schema)
    deduped = keep_first(panel, [ITEM_ID, TIMESTAMP], [TARGET])

    # Regularity filter BEFORE upsampling (reference drops items whose
    # raw index has no inferable frequency; contract = >=2 obs, all
    # consecutive gaps equal — regular_index_filter's predicate).
    # Stats and calendar bounds come from ONE window+agg pass so the
    # dedup subtree executes twice total (stats side + final join),
    # not three times as separate filter/bounds/join stages would.
    w = Window.partitionBy(ITEM_ID).orderBy(TIMESTAMP)
    ts_long = F.col(TIMESTAMP).cast("long")
    with_gap = deduped.withColumn("_gap", ts_long - F.lag(ts_long).over(w))
    unit, interval = freq_to_spark(schema.frequency)
    ok = (
        with_gap.groupBy(ITEM_ID)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.countDistinct("_gap").alias("_ngaps"),
            F.date_trunc(unit, F.min(TIMESTAMP)).alias("_mn"),
            F.date_trunc(unit, F.max(TIMESTAMP)).alias("_mx"),
        )
        .where((F.col("_n") >= 2) & (F.col("_ngaps") == 1))
    )
    grid = ok.select(
        ITEM_ID,
        F.explode(F.sequence(F.col("_mn"), F.col("_mx"), F.expr(interval))).alias(
            TIMESTAMP
        ),
    )
    # Dropped items simply have no grid rows — the left join is the
    # semi-join and the upsample at once.
    filled = grid.join(deduped, on=[ITEM_ID, TIMESTAMP], how="left").na.fill(
        fill_value, subset=[TARGET]
    )
    if add_covariates:
        filled = filled.withColumn(WEEKEND, is_weekend(F.col(TIMESTAMP)))
    return filled


PANEL_SCHEMA = TimeSeriesSchema(
    item_id_columns=(ITEM_ID,),
    timestamp_column=TIMESTAMP,
    value_columns=(TARGET,),
    frequency="D",
)

FORECAST_SCORE = "forecast_mae"
TRAIN_ON_REAL = "train_on_real"


def _recent_item_stats(panel, period: int, aggs) -> DataFrame:
    """The shared recent-history anchor every forecaster predicts
    from: keep each item's last ``period`` ticks (row_number over the
    descending time window) and aggregate them. One definition so
    recency semantics — e.g. tie handling on duplicate timestamps —
    change in exactly one place for every model and both scorer paths."""
    recent = Window.partitionBy(ITEM_ID).orderBy(F.col(TIMESTAMP).desc())
    return (
        panel.withColumn("_rn", F.row_number().over(recent))
        .where(F.col("_rn") <= period)
        .groupBy(ITEM_ID)
        .agg(*aggs)
    )


class GlobalWeekdayProfileForecaster:
    """Op J4 stand-in behind the forecaster factory boundary: learns a
    GLOBAL weekday multiplier profile from its training panel, then
    predicts per-item as (item base level from recent real history) ×
    (profile of the predicted tick's weekday).

    The reference defers to AutoGluon's TimeSeriesPredictor
    (`paqarin/metrics/univariate_metrics.py:361-419`); this model keeps
    the same train-on-synthetic/test-on-real information flow — the
    learned parameters come only from the panel passed to ``fit`` —
    while staying a pure DataFrame computation (7-row broadcast dim,
    no Python loop). Swap the factory for a real forecaster in
    production; every surrounding operator stays unchanged.
    """

    def __init__(self, period: int = 7):
        self.period = period
        self._profile: DataFrame | None = None

    def fit(self, panel: DataFrame) -> "GlobalWeekdayProfileForecaster":
        by_dow = panel.select(
            F.dayofweek(TIMESTAMP).alias("_dow"), F.col(TARGET)
        )
        global_mean = by_dow.agg(F.avg(TARGET).alias("_g"))
        profile = (
            by_dow.groupBy("_dow")
            .agg(F.avg(TARGET).alias("_m"))
            .crossJoin(F.broadcast(global_mean))
            .select(
                "_dow",
                F.when(F.col("_g") != 0, F.col("_m") / F.col("_g"))
                .otherwise(F.lit(1.0))
                .alias("_mult"),
            )
        )
        self._profile = profile
        return self

    def predict(self, history: DataFrame, index: DataFrame) -> DataFrame:
        """Forecast ``target_pred`` for every (item, timestamp) row of
        ``index``, given each item's real ``history`` panel."""
        if self._profile is None:
            raise RuntimeError("forecaster is not fitted")
        base = _recent_item_stats(
            history, self.period, [F.avg(TARGET).alias("_base")]
        )
        return (
            index.join(base, on=ITEM_ID, how="left")
            .withColumn("_dow", F.dayofweek(TIMESTAMP))
            .join(F.broadcast(self._profile), on="_dow", how="left")
            .select(
                ITEM_ID,
                TIMESTAMP,
                (
                    F.coalesce(F.col("_base"), F.lit(0.0))
                    * F.coalesce(F.col("_mult"), F.lit(1.0))
                ).alias("target_pred"),
            )
        )



class SeasonalNaiveDriftForecaster:
    """Second J4 pluggable behind the same factory boundary: ADDITIVE
    seasonal-naive with drift. From the fitted (synthetic) panel it
    learns (a) a global per-tick drift — the mean consecutive-tick
    delta — and (b) additive weekday offsets — the mean deviation of
    each tick from its item's own level. Prediction anchors on the
    item's recent real level (last ``period`` ticks), extrapolates the
    drift from that window's CENTER (the level of ``n`` trailing ticks
    of a trending series sits (n-1)/2 ticks behind the last one), and
    adds the predicted weekday's offset.

    Complements the multiplicative :class:`GlobalWeekdayProfileForecaster`:
    on trending panels the drift term wins, on stationary
    multiplicative-seasonal panels the profile model wins — so a TSTR
    ranking (ev2) discriminates generators by which structure their
    synthetic data preserves instead of collapsing to one family's
    blind spot. Pure DataFrame expressions; learned state is one
    scalar plus a ≤7-row broadcast dim. Daily frequency (the
    PANEL_SCHEMA contract). Reference J4 boundary:
    `paqarin/metrics/univariate_metrics.py:361-419`.
    """

    def __init__(self, period: int = 7):
        self.period = period
        self._drift: float | None = None
        self._offsets: DataFrame | None = None

    def fit(self, panel: DataFrame) -> "SeasonalNaiveDriftForecaster":
        w = Window.partitionBy(ITEM_ID).orderBy(TIMESTAMP)
        deltas = panel.withColumn("_prev", F.lag(TARGET).over(w)).where(
            F.col("_prev").isNotNull()
        )
        row = deltas.agg(
            F.avg(F.col(TARGET) - F.col("_prev")).alias("_d")
        ).collect()[0]
        self._drift = float(row["_d"]) if row["_d"] is not None else 0.0
        item_level = panel.groupBy(ITEM_ID).agg(F.avg(TARGET).alias("_lvl"))
        self._offsets = (
            panel.join(item_level, on=ITEM_ID)
            .groupBy(F.dayofweek(TIMESTAMP).alias("_dow"))
            .agg(F.avg(F.col(TARGET) - F.col("_lvl")).alias("_off"))
        )
        return self

    def predict(self, history: DataFrame, index: DataFrame) -> DataFrame:
        if self._drift is None or self._offsets is None:
            raise RuntimeError("forecaster is not fitted")
        anchor = _recent_item_stats(
            history,
            self.period,
            [
                F.avg(TARGET).alias("_lvl"),
                F.max(TIMESTAMP).alias("_last"),
                F.count(F.lit(1)).alias("_n"),
            ],
        )
        steps = (
            F.coalesce(F.datediff(F.col(TIMESTAMP), F.col("_last")), F.lit(0))
            .cast("double")
            + (F.coalesce(F.col("_n"), F.lit(1)) - 1).cast("double") / 2.0
        )
        return (
            index.join(anchor, on=ITEM_ID, how="left")
            .withColumn("_dow", F.dayofweek(TIMESTAMP))
            .join(F.broadcast(self._offsets), on="_dow", how="left")
            .select(
                ITEM_ID,
                TIMESTAMP,
                (
                    F.coalesce(F.col("_lvl"), F.lit(0.0))
                    + F.lit(self._drift) * steps
                    + F.coalesce(F.col("_off"), F.lit(0.0))
                ).alias("target_pred"),
            )
        )


class GBTPanelForecaster:
    """Third J4 pluggable, and the first LEARNED one in the univariate
    seam: MLlib gradient-boosted trees over per-tick calendar + level
    features — the ensemble-tree model class the reference reaches for
    via AutoGluon (`paqarin/metrics/univariate_metrics.py:361-419`),
    trained distributedly in-env (cluster-wide histogram aggregates,
    no single-node batch bound).

    Feature contract, aligned between fit and predict: each tick is
    (weekday, item trailing-``period`` mean level EXCLUDING the tick).
    fit derives both from the training panel with one lag window;
    predict anchors the level on the item's recent REAL history (the
    same base the profile/seasonal stand-ins use) so the TSTR
    information flow is identical — learned parameters come only from
    the fitted (synthetic) panel. Trees capture weekday×level
    interactions the multiplicative profile and additive drift models
    each only half-express."""

    def __init__(
        self,
        period: int = 7,
        max_iter: int = 20,
        max_depth: int = 4,
        seed: int = 0,
    ):
        self.period = period
        self.max_iter = int(max_iter)
        self.max_depth = int(max_depth)
        self.seed = int(seed)
        self._model = None

    @staticmethod
    def _vec(dow_col: F.Column, lvl_col: F.Column) -> F.Column:
        from pyspark.ml.functions import array_to_vector

        return array_to_vector(
            F.array(dow_col.cast("double"), lvl_col.cast("double"))
        )

    def fit(self, panel: DataFrame) -> "GBTPanelForecaster":
        from pyspark.ml.regression import GBTRegressor

        w = (
            Window.partitionBy(ITEM_ID)
            .orderBy(TIMESTAMP)
            .rowsBetween(-self.period, -1)
        )
        feats = (
            panel.withColumn("_lvl", F.avg(TARGET).over(w))
            .where(F.col("_lvl").isNotNull())
            .select(
                self._vec(
                    F.dayofweek(TIMESTAMP), F.col("_lvl")
                ).alias("_fv"),
                F.col(TARGET).cast("double").alias("_y"),
            )
        )
        if feats.limit(1).isEmpty():
            raise ValueError(
                "cannot fit on a panel with no tick having prior history"
            )
        self._model = GBTRegressor(
            featuresCol="_fv",
            labelCol="_y",
            predictionCol="target_pred",
            maxIter=self.max_iter,
            maxDepth=self.max_depth,
            seed=self.seed,
        ).fit(feats)
        return self

    def predict(self, history: DataFrame, index: DataFrame) -> DataFrame:
        if self._model is None:
            raise RuntimeError("forecaster is not fitted")
        base = _recent_item_stats(
            history, self.period, [F.avg(TARGET).alias("_base")]
        )
        staged = (
            index.join(base, on=ITEM_ID, how="left")
            .withColumn(
                "_fv",
                self._vec(
                    F.dayofweek(TIMESTAMP),
                    F.coalesce(F.col("_base"), F.lit(0.0)),
                ),
            )
        )
        return self._model.transform(staged).select(
            ITEM_ID, TIMESTAMP, "target_pred"
        )


class UnivariateForecastScorer:
    """The reference's univariate TSTR scorer re-orchestrated
    (`paqarin/metrics/univariate_metrics.py:130-277`): panel-transform
    the real series (F2), hold out the last ``prediction_length`` ticks
    per item (F4), train a forecaster on synthetic sequences (H2
    rounds, F7 date attach), predict the held-out index, and register
    the error metric per iteration (I2) — plus one train-on-real
    control row. ``reuse_files`` CSV caching becomes DataFrame persists
    released by :meth:`unpersist`.
    """

    def __init__(
        self,
        prediction_length: int = 7,
        iterations: int = 3,
        number_of_sequences: int = 50,
        generation_rounds: int = 1,
        forecaster_factory=GlobalWeekdayProfileForecaster,
    ):
        self.prediction_length = prediction_length
        self.iterations = iterations
        self.number_of_sequences = number_of_sequences
        self.generation_rounds = generation_rounds
        self.forecaster_factory = forecaster_factory
        self.metric_manager = None
        self._trained_on_real = False
        self._cache = None
        self._cache_key = None
        self._start = None  # cached min(train timestamp), one action

    def _real_frames(self, training_data: DataFrame, schema: TimeSeriesSchema):
        panel = panel_transform(training_data, schema)
        desc = Window.partitionBy(ITEM_ID).orderBy(F.col(TIMESTAMP).desc())
        # Persist the ranked PARENT: train/actuals are filters over it,
        # so one materialization of the panel pipeline serves both.
        ranked = panel.withColumn("_rn", F.row_number().over(desc)).persist()
        train = ranked.where(F.col("_rn") > self.prediction_length).drop("_rn")
        actuals = ranked.where(F.col("_rn") <= self.prediction_length).drop("_rn")
        return ranked, train, actuals

    def _score(self, model, train: DataFrame, actuals: DataFrame) -> float:
        from paqarin_spark.metrics.errors import mae

        preds = model.predict(train, actuals.select(ITEM_ID, TIMESTAMP))
        joined = actuals.join(preds, on=[ITEM_ID, TIMESTAMP], how="inner")
        row = joined.agg(
            mae(F.col(TARGET), F.col("target_pred")).alias("m")
        ).collect()[0]
        if row["m"] is None:
            raise ValueError(
                "univariate scoring set is empty — every item was dropped "
                "by the panel regularity filter (gap-fill the input with "
                "calendar_fill first) or the holdout has no rows"
            )
        return float(row["m"])

    def _prepare(self, training_data: DataFrame, schema: TimeSeriesSchema):
        """Real-frame cache + one-time train-on-real control row + the
        cached panel start timestamp (one action, shared by every
        generator scored against the same training data)."""
        from paqarin_spark.metrics.registry import MetricManager

        if self.metric_manager is None:
            self.metric_manager = MetricManager(training_data.sparkSession)
        cache_key = (id(training_data), id(schema), self.prediction_length)
        if self._cache_key != cache_key:
            self.unpersist()
            self._cache = self._real_frames(training_data, schema)
            self._cache_key = cache_key
            self._start = None
        _, train, actuals = self._cache

        if not self._trained_on_real:
            model = self.forecaster_factory().fit(train)
            score = self._score(model, train, actuals)
            for it in range(self.iterations):
                self.metric_manager.register_iteration(
                    TRAIN_ON_REAL, it, {FORECAST_SCORE: score}
                )
            self._trained_on_real = True

        if self._start is None:
            self._start = train.agg(F.min(TIMESTAMP).alias("_mn")).collect()[0][
                "_mn"
            ]
        return train, actuals

    def _synth_panel(self, generator, it: int, start) -> DataFrame:
        from paqarin_spark.generator import generate_rounds
        from paqarin_spark.operators.windows import attach_date_index

        schema = generator.parameters.schema
        synth = generate_rounds(
            generator,
            self.number_of_sequences,
            self.generation_rounds,
            base_seed=generator.parameters.seed + 101 * it,
        )
        dated = attach_date_index(
            synth, schema, start=start.strftime("%Y-%m-%d %H:%M:%S")
        )
        return to_panel(
            dated.withColumn("_item", F.col("sequence_id").cast("string")),
            TimeSeriesSchema(
                item_id_columns=("_item",),
                timestamp_column=schema.timestamp_column,
                value_columns=schema.value_columns,
                frequency=schema.frequency,
            ),
        )

    def calculate(self, generator, generator_name: str, training_data: DataFrame) -> None:
        self.calculate_many({generator_name: generator}, training_data)

    def calculate_many(
        self, generator_map: dict, training_data: DataFrame
    ) -> None:
        """Score every generator in ONE batched plan (default
        forecaster): the synth panels of all (generator, iteration)
        pairs union into a single frame tagged (_gen, _iter), profiles
        and MAEs aggregate grouped on that tag, and the whole scoring
        pass is one collect instead of one per generator — the job-count
        lever that matters when the per-job data is small."""
        if not generator_map:
            raise ValueError("generator_map is empty — nothing to score")
        first = next(iter(generator_map.values()))
        schema = first.parameters.schema
        for name, generator in generator_map.items():
            if generator.parameters.schema != schema:
                raise ValueError(
                    f"generator {name!r} declares a different schema than the "
                    "first generator — batched scoring shares one real "
                    "panel, so all generators must agree on data roles"
                )
        train, actuals = self._prepare(training_data, schema)

        batched = {
            GlobalWeekdayProfileForecaster: self._batched_scores,
            SeasonalNaiveDriftForecaster: self._batched_scores_drift,
        }.get(self.forecaster_factory)
        if batched is None:
            for name, generator in generator_map.items():
                for it in range(self.iterations):
                    model = self.forecaster_factory().fit(
                        self._synth_panel(generator, it, self._start)
                    )
                    score = self._score(model, train, actuals)
                    self.metric_manager.register_iteration(
                        name, it, {FORECAST_SCORE: score}
                    )
            return

        combos = [
            (name, it)
            for name in generator_map
            for it in range(self.iterations)
        ]
        allp = None
        for name, it in combos:
            tagged = (
                self._synth_panel(generator_map[name], it, self._start)
                .withColumn("_gen", F.lit(name))
                .withColumn("_iter", F.lit(it))
            )
            allp = tagged if allp is None else allp.unionByName(tagged)
        scores = batched(allp, combos, train, actuals)
        for (name, it), score in scores.items():
            self.metric_manager.register_iteration(
                name, it, {FORECAST_SCORE: score}
            )

    def _batched_scores(
        self,
        allp: DataFrame,
        combos: list[tuple[str, int]],
        train: DataFrame,
        actuals: DataFrame,
    ) -> dict[tuple[str, int], float]:
        """Every (generator, iteration) weekday-profile TSTR score in
        one plan: per-combo profiles from the tagged panel union,
        combo-independent per-item base levels from real history, one
        groupBy(_gen, _iter) MAE aggregation. Same math row for row as
        the per-iteration predict() path."""
        period = GlobalWeekdayProfileForecaster().period
        keys = ["_gen", "_iter"]

        global_mean = allp.groupBy(*keys).agg(F.avg(TARGET).alias("_g"))
        profile = (
            allp.groupBy(*keys, F.dayofweek(TIMESTAMP).alias("_dow"))
            .agg(F.avg(TARGET).alias("_m"))
            .join(global_mean, on=keys)
            .select(
                *keys,
                "_dow",
                F.when(F.col("_g") != 0, F.col("_m") / F.col("_g"))
                .otherwise(F.lit(1.0))
                .alias("_mult"),
            )
        )
        base = _recent_item_stats(
            train, period, [F.avg(TARGET).alias("_base")]
        )
        combo_dim = self.metric_manager.spark.createDataFrame(
            combos, "_gen string, _iter int"
        )
        # index × combos, then LEFT join the profile so a weekday
        # absent from one combo's panel falls back to mult=1.0 —
        # exactly the per-iteration predict() semantics.
        preds = (
            actuals.select(ITEM_ID, TIMESTAMP, TARGET)
            .withColumn("_dow", F.dayofweek(TIMESTAMP))
            .join(base, on=ITEM_ID, how="left")
            .crossJoin(F.broadcast(combo_dim))
            .join(F.broadcast(profile), on=[*keys, "_dow"], how="left")
            .select(
                *keys,
                (
                    F.coalesce(F.col("_base"), F.lit(0.0))
                    * F.coalesce(F.col("_mult"), F.lit(1.0))
                ).alias("target_pred"),
                TARGET,
            )
        )
        return self._collect_combo_maes(preds, combos, keys)

    def _batched_scores_drift(
        self,
        allp: DataFrame,
        combos: list[tuple[str, int]],
        train: DataFrame,
        actuals: DataFrame,
    ) -> dict[tuple[str, int], float]:
        """Drift-forecaster analogue of :meth:`_batched_scores`: every
        (generator, iteration) pair's drift scalar and weekday-offset
        dim aggregate from the tagged panel union grouped on the tag,
        the combo-independent anchor (level/last/count of each item's
        recent real history) computes once, and one
        groupBy(_gen, _iter) MAE collect scores everything. Math is
        row-for-row the per-iteration fit→predict path of
        :class:`SeasonalNaiveDriftForecaster`."""
        period = SeasonalNaiveDriftForecaster().period
        keys = ["_gen", "_iter"]

        w = Window.partitionBy(*keys, ITEM_ID).orderBy(TIMESTAMP)
        deltas = allp.withColumn("_prev", F.lag(TARGET).over(w)).where(
            F.col("_prev").isNotNull()
        )
        drift = deltas.groupBy(*keys).agg(
            F.avg(F.col(TARGET) - F.col("_prev")).alias("_drift")
        )
        item_level = allp.groupBy(*keys, ITEM_ID).agg(
            F.avg(TARGET).alias("_lvl_i")
        )
        offsets = (
            allp.join(item_level, on=[*keys, ITEM_ID])
            .groupBy(*keys, F.dayofweek(TIMESTAMP).alias("_dow"))
            .agg(F.avg(F.col(TARGET) - F.col("_lvl_i")).alias("_off"))
        )
        anchor = _recent_item_stats(
            train,
            period,
            [
                F.avg(TARGET).alias("_lvl"),
                F.max(TIMESTAMP).alias("_last"),
                F.count(F.lit(1)).alias("_n"),
            ],
        )
        combo_dim = self.metric_manager.spark.createDataFrame(
            combos, "_gen string, _iter int"
        )
        steps = (
            F.coalesce(F.datediff(F.col(TIMESTAMP), F.col("_last")), F.lit(0))
            .cast("double")
            + (F.coalesce(F.col("_n"), F.lit(1)) - 1).cast("double") / 2.0
        )
        preds = (
            actuals.select(ITEM_ID, TIMESTAMP, TARGET)
            .join(anchor, on=ITEM_ID, how="left")
            .withColumn("_dow", F.dayofweek(TIMESTAMP))
            .crossJoin(F.broadcast(combo_dim))
            .join(F.broadcast(offsets), on=[*keys, "_dow"], how="left")
            .join(F.broadcast(drift), on=keys, how="left")
            .select(
                *keys,
                (
                    F.coalesce(F.col("_lvl"), F.lit(0.0))
                    + F.coalesce(F.col("_drift"), F.lit(0.0)) * steps
                    + F.coalesce(F.col("_off"), F.lit(0.0))
                ).alias("target_pred"),
                TARGET,
            )
        )
        return self._collect_combo_maes(preds, combos, keys)

    def _collect_combo_maes(
        self,
        preds: DataFrame,
        combos: list[tuple[str, int]],
        keys: list[str],
    ) -> dict[tuple[str, int], float]:
        rows = preds.groupBy(*keys).agg(
            F.avg(F.abs(F.col("target_pred") - F.col(TARGET))).alias("m")
        ).collect()
        by_combo = {(r["_gen"], r["_iter"]): r["m"] for r in rows}
        if len(by_combo) != len(combos) or any(
            v is None for v in by_combo.values()
        ):
            raise ValueError(
                "univariate scoring set is empty — every item was dropped "
                "by the panel regularity filter (gap-fill the input with "
                "calendar_fill first) or the holdout has no rows"
            )
        return {combo: float(by_combo[combo]) for combo in combos}

    def unpersist(self) -> None:
        if self._cache is not None:
            self._cache[0].unpersist()
            self._cache = None
            self._cache_key = None

    @property
    def summary_metrics(self) -> list[dict]:
        if self.metric_manager is None:
            return []
        rows = self.metric_manager.summary(FORECAST_SCORE).collect()
        return [
            {
                "generator": r["generator"],
                f"avg_{FORECAST_SCORE}": r[f"avg_{FORECAST_SCORE}"],
                f"std_{FORECAST_SCORE}": r[f"std_{FORECAST_SCORE}"],
            }
            for r in rows
        ]

    @property
    def best_generator_name(self) -> str:
        if self.metric_manager is None:
            raise ValueError("no metrics registered")
        df = self.metric_manager.summary(FORECAST_SCORE).where(
            F.col("generator") != TRAIN_ON_REAL
        )
        row = (
            df.orderBy(
                F.col(f"avg_{FORECAST_SCORE}").asc(), F.col("generator").asc()
            )
            .limit(1)
            .collect()
        )
        if not row:
            raise ValueError("no metrics registered")
        return row[0]["generator"]
