"""Deep-provider adapter shim (SURVEY.md §2 ops J1/J2): parameter
translation pinned field-by-field against the reference adapters, and
the applyInPandas hosting driven end-to-end with a fake provider
runner (the reference mocks the provider the same way:
`tests/test_ydata_adapter.py:13-45`,
`tests/test_synthcity_adapter.py:109-221`)."""

from __future__ import annotations

import sys
import types

import pandas as pd
import pytest
from pyspark.sql import functions as F

from paqarin_spark.adapter import get_generator_adapter
from paqarin_spark.generators.deep import (
    DeepProviderGenerator,
    inverse_transform_samples,
    minmax_scale_frame,
    translate_sdv_par,
    translate_synthcity_timegan,
    translate_ydata_doppleganger,
    translate_ydata_timegan,
)
from paqarin_spark.generators.params import (
    DoppleGanGerParameters,
    ParParameters,
    TimeGanParameters,
)


def timegan_params() -> TimeGanParameters:
    return TimeGanParameters(
        item_id_column="item",
        timestamp_column="ts",
        numerical_columns=("value",),
        sequence_length=4,
        epochs=1,
        batch_size=2,
        learning_rate=0.1,
        latent_dimension=20,
        gamma=1.0,
    )


# --- translation contracts -------------------------------------------------


def test_synthcity_timegan_translation():
    """Field-by-field mirror of the reference's pinned assertions
    (`tests/test_synthcity_adapter.py:148-157`): both learning rates get
    learning_rate, both hidden-unit counts get latent_dimension."""
    kwargs = translate_synthcity_timegan(timegan_params().to_generator_parameters())
    assert kwargs["plugin"] == "timegan"
    assert kwargs["n_iter"] == 1
    assert kwargs["batch_size"] == 2
    assert kwargs["discriminator_lr"] == 0.1
    assert kwargs["generator_lr"] == 0.1
    assert kwargs["gamma_penalty"] == 1.0
    assert kwargs["generator_n_units_hidden"] == 20
    assert kwargs["discriminator_n_units_hidden"] == 20


def test_ydata_timegan_translation():
    """Mirror of `adapters/ydata_adapter.py:291-322`."""
    kwargs = translate_ydata_timegan(timegan_params().to_generator_parameters())
    assert kwargs["modelname"] == "timegan"
    assert kwargs["model_parameters"] == {
        "batch_size": 2,
        "lr": 0.1,
        "latent_dim": 20,
        "gamma": 1.0,
    }
    assert kwargs["train_parameters"] == {"epochs": 1, "sequence_length": 4}
    assert kwargs["num_cols"] == ["value"]


def test_ydata_timegan_translation_optional_fields():
    """The reference also forwards noise_dim/layers_dim to ModelParameters
    and number_sequences to TrainParameters
    (`adapters/ydata_adapter.py:296-308`)."""
    p = timegan_params()
    p.noise_dimension = 32
    p.layers_dimension = 128
    p.number_of_sequences = 6
    kwargs = translate_ydata_timegan(p.to_generator_parameters())
    assert kwargs["model_parameters"]["noise_dim"] == 32
    assert kwargs["model_parameters"]["layers_dim"] == 128
    assert kwargs["train_parameters"]["number_sequences"] == 6


def test_ydata_doppleganger_translation():
    """Mirror of `adapters/ydata_adapter.py:325-358`."""
    p = DoppleGanGerParameters(
        item_id_column="item",
        timestamp_column="ts",
        measurement_columns=("v1", "v2"),
        categorical_columns=("cat",),
        sequence_length=8,
        sample_length=2,
        epochs=3,
        batch_size=16,
        learning_rate=0.01,
        latent_dimension=5,
    )
    kwargs = translate_ydata_doppleganger(p.to_generator_parameters())
    assert kwargs["modelname"] == "doppelganger"
    assert kwargs["model_parameters"] == {
        "batch_size": 16,
        "lr": 0.01,
        "latent_dim": 5,
    }
    assert kwargs["train_parameters"] == {
        "epochs": 3,
        "sequence_length": 8,
        "sample_length": 2,
        "measurement_cols": ["v1", "v2"],
    }
    assert kwargs["cat_cols"] == ["cat"]


def test_ydata_doppleganger_translation_optional_fields():
    """The reference also forwards betas/gp_lambda/pac to ModelParameters
    and rounds to TrainParameters (`adapters/ydata_adapter.py:329-344`)."""
    p = DoppleGanGerParameters(
        item_id_column="item",
        timestamp_column="ts",
        measurement_columns=("v1",),
        sequence_length=8,
        sample_length=2,
        epochs=3,
        batch_size=16,
        learning_rate=0.01,
        latent_dimension=5,
        exponential_decay_rates=(0.2, 0.9),
        wgan_weight=10.0,
        packing_degree=2,
        steps_per_batch=4,
    )
    kwargs = translate_ydata_doppleganger(p.to_generator_parameters())
    assert kwargs["model_parameters"]["betas"] == (0.2, 0.9)
    assert kwargs["model_parameters"]["gp_lambda"] == 10.0
    assert kwargs["model_parameters"]["pac"] == 2
    assert kwargs["train_parameters"]["rounds"] == 4


def test_sdv_par_translation():
    """Mirror of `adapters/sdv_adapter.py:94-119`: context_columns are
    the item id columns, timestamp is the sequence index."""
    p = ParParameters(
        item_id_columns=("item",),
        timestamp_column="ts",
        numerical_columns=("value",),
        epochs=7,
        sample_size=2,
    )
    kwargs = translate_sdv_par(p.to_generator_parameters())
    assert kwargs["epochs"] == 7
    assert kwargs["verbose"] is True
    assert kwargs["context_columns"] == ["item"]
    assert kwargs["sequence_index"] == "ts"
    assert kwargs["sample_size"] == 2


# --- ydata scaling round trip (reference transformer semantics) ------------


def test_minmax_scale_and_inverse_roundtrip_ndarray_samples():
    """TimeGAN samples are ndarrays in scaled space; inverse_transform
    names the columns and descales (`adapters/ydata_adapter.py:241-254`).
    A constant column must survive (sklearn zero-range rule)."""
    import numpy as np

    pdf = pd.DataFrame({"a": [1.0, 3.0, 5.0], "b": [7.0, 7.0, 7.0]})
    scaled, mins, rng = minmax_scale_frame(pdf, ["a", "b"])
    assert scaled["a"].tolist() == [0.0, 0.5, 1.0]
    assert scaled["b"].tolist() == [0.0, 0.0, 0.0]

    raw = np.array([[[0.0, 0.0], [1.0, 0.0]], [[0.5, 0.0], [0.25, 0.0]]])
    frames = inverse_transform_samples(raw, ["a", "b"], mins, rng)
    assert len(frames) == 2
    assert list(frames[0].columns) == ["a", "b"]
    assert frames[0]["a"].tolist() == [1.0, 5.0]
    assert frames[0]["b"].tolist() == [7.0, 7.0]
    assert frames[1]["a"].tolist() == [3.0, 2.0]


def test_inverse_transform_descale_dataframe_samples():
    """DoppleGANger samples arrive as DataFrames; only the numeric
    columns descale (`adapters/ydata_adapter.py:75-91`)."""
    pdf = pd.DataFrame({"v": [0.0, 10.0], "cat": ["x", "y"]})
    _, mins, rng = minmax_scale_frame(pdf, ["v"])
    sample = pd.DataFrame({"v": [0.5, 1.0], "cat": ["x", "x"]})
    frames = inverse_transform_samples([sample], ["v"], mins, rng)
    assert frames[0]["v"].tolist() == [5.0, 10.0]
    assert frames[0]["cat"].tolist() == ["x", "x"]


# --- dispatch --------------------------------------------------------------


def test_dispatch_raises_import_error_when_library_missing():
    with pytest.raises(ImportError, match="ydata-synthetic"):
        get_generator_adapter(
            "ydata", "timegan", timegan_params().to_generator_parameters()
        )


def test_dispatch_returns_adapter_when_library_importable():
    fake = types.ModuleType("synthcity")
    sys.modules["synthcity"] = fake
    try:
        gen = get_generator_adapter(
            "synthcity", "timegan", timegan_params().to_generator_parameters()
        )
        assert isinstance(gen, DeepProviderGenerator)
        assert gen.provider == "synthcity"
        assert not gen.is_fitted
    finally:
        del sys.modules["synthcity"]


# --- applyInPandas hosting, end-to-end with a fake provider ----------------


def _make_echo_runner():
    """Fake provider runner built as a CLOSURE so cloudpickle ships it
    by value into the applyInPandas task (a module-level test function
    would pickle by reference and fail to import on the worker). It
    emits one sequence per request whose values encode what reached the
    executor — the translated kwargs, the row count it trained on, and
    the sample request — so collecting the result proves the contract
    crossed the Arrow boundary intact."""

    def echo_runner(pdf: pd.DataFrame, kwargs: dict, n: int, seed: int) -> list:
        return [
            pd.DataFrame(
                {
                    "value": [
                        float(kwargs["n_iter"]),
                        float(kwargs["generator_n_units_hidden"]),
                        float(len(pdf)),
                        float(n),
                        float(seed),
                    ]
                }
            )
            for _ in range(n)
        ]

    return echo_runner


def _training_df(spark):
    rows = [("a", f"2024-01-{d + 1:02d}", float(d)) for d in range(6)]
    rows += [("b", f"2024-01-{d + 1:02d}", float(10 * d)) for d in range(4)]
    return spark.createDataFrame(rows, "item string, ts string, value double")


def test_deep_generator_trains_and_samples_through_spark(spark):
    gen = DeepProviderGenerator(
        timegan_params().to_generator_parameters(),
        "synthcity",
        "timegan",
        runner=_make_echo_runner(),
    )
    gen.fit(_training_df(spark))
    out = gen.generate(2, seed=7).collect()
    assert len(out) == 2
    assert {r["sequence_id"] for r in out} == {0, 1}
    values = [rec["value"] for rec in out[0]["sequence"]]
    # n_iter=1, hidden=20, rows seen=10 (one global model), n=2, seed=7
    assert values == [1.0, 20.0, 10.0, 2.0, 7.0]


def test_deep_generator_cohort_mode_trains_one_model_per_group(spark):
    params = timegan_params().to_generator_parameters()
    params.provider_options["cohort_column"] = "item"
    gen = DeepProviderGenerator(params, "synthcity", "timegan", runner=_make_echo_runner())
    gen.fit(_training_df(spark))
    out = gen.generate(1).collect()
    rows_seen = {r["item"]: r["sequence"][2]["value"] for r in out}
    assert rows_seen == {"a": 6.0, "b": 4.0}  # per-cohort training rows


def test_deep_generator_requires_fit(spark):
    gen = DeepProviderGenerator(
        timegan_params().to_generator_parameters(),
        "synthcity",
        "timegan",
        runner=_make_echo_runner(),
    )
    with pytest.raises(RuntimeError, match="not fitted"):
        gen.generate(1)


def test_deep_generator_drops_undeclared_grouping_column_before_runner(spark):
    """A grouping column OUTSIDE the declared schema (synthetic _g, or
    an ad-hoc cohort key) is constant within the group and must not
    reach the provider — but a cohort that IS a declared column (e.g.
    an item id) must stay, because translated kwargs reference it
    (sdv context_columns, ydata cat_cols)."""

    def make_probe(grouping_column: str):
        def probe_runner(pdf: pd.DataFrame, kwargs: dict, n: int, seed: int) -> list:
            leaked = float(grouping_column in pdf.columns)
            return [
                pd.DataFrame({"value": [leaked, float(len(pdf.columns))]})
                for _ in range(n)
            ]

        return probe_runner

    # global mode: the synthetic _g key must not reach the runner, but
    # the data columns (item, ts, value) all do
    gen = DeepProviderGenerator(
        timegan_params().to_generator_parameters(),
        "synthcity",
        "timegan",
        runner=make_probe("_g"),
    )
    gen.fit(_training_df(spark))
    seq = gen.generate(1).collect()[0]["sequence"]
    assert seq[0]["value"] == 0.0  # _g not leaked
    assert seq[1]["value"] == 3.0  # item, ts, value

    # ad-hoc cohort key (not in the schema): dropped before the runner
    params = timegan_params().to_generator_parameters()
    params.provider_options["cohort_column"] = "grp"
    gen = DeepProviderGenerator(
        params, "synthcity", "timegan", runner=make_probe("grp")
    )
    gen.fit(_training_df(spark).withColumn("grp", F.col("item")))
    out = gen.generate(1).collect()
    for row in out:
        assert row["sequence"][0]["value"] == 0.0
        assert row["sequence"][1]["value"] == 3.0  # item, ts, value

    # declared cohort (an item id column): KEPT — providers whose
    # translated kwargs reference it must still see it
    params = timegan_params().to_generator_parameters()
    params.provider_options["cohort_column"] = "item"
    gen = DeepProviderGenerator(
        params, "synthcity", "timegan", runner=make_probe("item")
    )
    gen.fit(_training_df(spark))
    out = gen.generate(1).collect()
    for row in out:
        assert row["sequence"][0]["value"] == 1.0  # declared cohort present
        assert row["sequence"][1]["value"] == 3.0


def test_deep_generator_cohort_mode_keeps_integer_cohort_type(spark):
    params = timegan_params().to_generator_parameters()
    params.provider_options["cohort_column"] = "region_id"
    gen = DeepProviderGenerator(params, "synthcity", "timegan", runner=_make_echo_runner())
    rows = [(1, "2024-01-01", 1.0), (1, "2024-01-02", 2.0), (2, "2024-01-01", 5.0)]
    df = spark.createDataFrame(rows, "region_id long, ts string, value double")
    gen.fit(df)
    out = gen.generate(1).collect()
    assert {r["region_id"] for r in out} == {1, 2}
    assert all(isinstance(r["region_id"], int) for r in out)


def test_deep_generator_save_load_roundtrip(spark, tmp_path):
    import sys
    import types

    from paqarin_spark.adapter import load_generator

    gen = DeepProviderGenerator(
        timegan_params().to_generator_parameters(),
        "synthcity",
        "timegan",
        runner=_make_echo_runner(),
    )
    gen.fit(_training_df(spark))
    path = str(tmp_path / "deep_model")
    gen.save(path)
    fake = types.ModuleType("synthcity")
    sys.modules["synthcity"] = fake
    try:
        loaded = load_generator(spark, "synthcity", "timegan", path)
        assert isinstance(loaded, DeepProviderGenerator)
        assert not loaded.is_fitted  # train-per-run by the no-pickle rule
        assert loaded.parameters.sequence_length == 4
    finally:
        del sys.modules["synthcity"]
