"""GANWindowGenerator — the ADVERSARIALLY-TRAINED executing provider
(the TimeGAN generator/discriminator seam,
`paqarin/adapters/ydata_adapter.py:291-322`). These tests prove the
structural claims the class exists for: joint two-player training
whose discriminator loss descends without the game collapsing, mode
COVERAGE a regression head provably cannot produce (an MSE objective
with no noise↔sample correspondence collapses to the mean), plus the
standard provider lifecycle (fit → generate → save → load →
generate-equal, layout-independent fits) and the K1/K2 adapter/TSTR
integration."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from paqarin_spark.generator import GeneratorParameters
from paqarin_spark.schema import TimeSeriesSchema

SCHEMA = TimeSeriesSchema(
    item_id_columns=("item_id",),
    timestamp_column="ts",
    value_columns=("v",),
    frequency="D",
)


@pytest.fixture(scope="module")
def sine_panel(spark):
    rows = []
    for e in range(3):
        for d in range(120):
            rows.append(
                (
                    f"e{e}",
                    dt.datetime(2020, 1, 1) + dt.timedelta(days=d),
                    math.sin(2 * math.pi * (d + 13 * e) / 14.0),
                )
            )
    return spark.createDataFrame(rows, "item_id string, ts timestamp, v double")


def _params(seed=9):
    return GeneratorParameters(schema=SCHEMA, sequence_length=8, seed=seed)


def _bimodal(n=64, L=6):
    import numpy as np

    return np.array([[0.9] * L if i % 2 else [0.1] * L for i in range(n)])


def test_gan_covers_modes_an_mse_head_must_average():
    """THE adversarial claim: on a bimodal window population the GAN
    puts mass near BOTH modes, while the best an MSE-trained
    noise→window head can do — when the pairing carries no
    information, which is the honest unconditional-generation setting
    — is the mean. The MSE baseline rotates its pairing every epoch
    (deterministically), so it cannot memorize noise↔window
    correspondences; it converges to ≈0.5 everywhere."""
    import numpy as np

    from paqarin_spark.generators import nn

    real = _bimodal()
    g, _, _ = nn.train_gan(real, nz=3, epochs=1500, seed=5)
    z = nn.gan_noise(400, 3, 99, "probe")
    samp = nn.gan_sample(g, z)
    near_hi = float((np.abs(samp - 0.9) < 0.1).mean())
    near_lo = float((np.abs(samp - 0.1) < 0.1).mean())
    assert near_hi > 0.3, near_hi
    assert near_lo > 0.3, near_lo

    zt = nn.gan_noise(len(real), 3, 5, "mse")
    mse_params = None
    for ep in range(400):
        mse_params = nn.train_mlp(
            zt,
            np.roll(real, ep, axis=0),
            hidden=16,
            epochs=1,
            lr=0.1,
            seed=5,
            params=mse_params,
        )
    pred = nn.forward(mse_params, z)
    assert float((np.abs(pred - 0.5) < 0.25).mean()) > 0.95, (
        pred.min(),
        pred.max(),
    )
    assert float((np.abs(pred - 0.9) < 0.1).mean()) < 0.05
    assert float((np.abs(pred - 0.1) < 0.1).mean()) < 0.05


def test_gan_discriminator_loss_descends_without_collapse():
    """The two-player dynamic is real: D's loss descends from its
    init value (it learned to separate) but ends OFF zero (the
    smoothing/no-momentum choices keep the game alive — a D loss at 0
    is the collapse mode the first prototypes hit)."""
    from paqarin_spark.generators import nn

    _, _, losses = nn.train_gan(_bimodal(), nz=3, epochs=1500, seed=5)
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert losses[-1] > 0.4, losses[-1]


def test_gan_lifecycle_and_determinism(sine_panel, tmp_path):
    """fit → generate → save → load → generate-equal, and two fits
    from different layouts produce identical weights (the
    ARNet/GRUNet layout-independence contract)."""
    from paqarin_spark.generators import GANWindowGenerator

    gen = GANWindowGenerator(_params(), epochs=300).fit(sine_panel)
    out = gen.generate(4, seed=1).orderBy("sequence_id").collect()
    assert len(out) == 4
    assert all(len(r["sequence"]) == 8 for r in out)
    assert all(
        all(
            s["v"] == s["v"] and -1.5 <= s["v"] <= 1.5
            for s in r["sequence"]
        )
        for r in out
    )
    gen2 = GANWindowGenerator(_params(), epochs=300).fit(
        sine_panel.repartition(7)
    )
    assert gen.weights == gen2.weights
    path = str(tmp_path / "gan_model")
    gen.save(path)
    loaded = GANWindowGenerator.load(sine_panel.sparkSession, path)
    assert loaded.weights == gen.weights
    a = [
        tuple(round(s["v"], 9) for s in r["sequence"]) for r in out
    ]
    b = [
        tuple(round(s["v"], 9) for s in r["sequence"])
        for r in loaded.generate(4, seed=1).orderBy("sequence_id").collect()
    ]
    assert a == b


def test_gan_via_adapter_and_tstr_pipeline(sine_panel):
    """gen12's provider slots into the K1/K2 surface beside the
    regression-fit providers — the TSTR predictive scorer runs on its
    samples end-to-end."""
    from paqarin_spark.adapter import get_generator_adapter
    from paqarin_spark.evaluation import (
        EvaluationPipeline,
        MultivariatePredictiveScorer,
    )

    gens = {
        "gan": get_generator_adapter("paqarin_spark", "gan", _params()),
        "bootstrap": get_generator_adapter(
            "paqarin_spark", "bootstrap", _params()
        ),
    }
    scorer = MultivariatePredictiveScorer(
        sequence_length=8, iterations=1, number_of_sequences=20
    )
    pipe = EvaluationPipeline(gens, scorer).fit(sine_panel)
    by_gen = {
        r["generator"]: r["avg_predictive_score"]
        for r in pipe.training_results
    }
    assert set(by_gen) >= {"gan", "bootstrap"}
    assert all(v is not None and v == v for v in by_gen.values())
    pipe.unpersist()
