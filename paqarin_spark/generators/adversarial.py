"""GANWindowGenerator — the ADVERSARIALLY-TRAINED executing provider
(J1/J2): a generator/discriminator pair trained jointly in this
environment with pure numpy (generators/nn.py GAN core), zero
TF/torch.

This occupies the adversarial seam of the reference's deep providers —
TimeGAN's jointly-trained generator + discriminator
(`paqarin/adapters/ydata_adapter.py:291-322`) — the one training
OBJECTIVE none of the other executing providers has: every other
in-env generator fits by regression or closed form (ARNet/GRU minimize
MSE against teacher-forced targets; copula/bootstrap are closed-form),
while this one trains against a LEARNED adversary with no paired
targets at all, which is what lets it commit to modes instead of
averaging them (pinned by tests: on a bimodal window population the
GAN covers both modes while an MSE head trained on the same
noise→window task collapses to the mean).

Physical placement is the ARNet/GRUNet boundary exactly (neural.py
module doc): scaling/windowing/subsampling/rollout distributed;
training one Arrow batch over the md5-rank-bounded window sample; only
the weight state crosses the boundary (one JSON row). Determinism: md5
Glorot init, md5 noise keyed (seed, epoch, i, j), SORTED batch,
full-batch alternating steps, fixed epochs — weights are a pure
function of (data, seed), layout-independent. Sampling is
UNCONDITIONAL (z → window), so generate() needs no start pool — the
whole rollout is one embarrassingly parallel mapInPandas pass.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paqarin_spark.generator import (
    GeneratorParameters,
    TimeSeriesGenerator,
    _read_params,
    _write_params,
)
from paqarin_spark.operators.resample import parse_timestamps
from paqarin_spark.operators.scaling import MinMaxScaler, MinMaxState
from paqarin_spark.operators.windows import SEQUENCE, SEQUENCE_ID, sliding_windows


class GANWindowGenerator(TimeSeriesGenerator):
    provider = "paqarin_spark"
    method = "gan"

    def __init__(
        self,
        parameters: GeneratorParameters,
        noise_dim: int = 3,
        hidden_g: int = 16,
        hidden_d: int = 8,
        epochs: int = 1500,
        lr_g: float = 1.0,
        lr_d: float = 0.5,
        max_windows: int = 256,
    ):
        super().__init__(parameters)
        self.noise_dim = int(noise_dim)
        self.hidden_g = int(hidden_g)
        self.hidden_d = int(hidden_d)
        self.epochs = int(epochs)
        self.lr_g = float(lr_g)
        self.lr_d = float(lr_d)
        self.max_windows = int(max_windows)
        self.scaler = MinMaxScaler(list(parameters.schema.value_columns))
        self.weights: dict | None = None  # {"g": [...], "d": [...]}

    @property
    def is_fitted(self) -> bool:
        return self.weights is not None

    def fit(self, training_data: DataFrame) -> "GANWindowGenerator":
        schema = self.parameters.schema
        cols = list(schema.value_columns)
        if not cols:
            raise ValueError("schema has no value columns")
        L = self.parameters.sequence_length
        seed = self.parameters.seed
        nz, hg, hd = self.noise_dim, self.hidden_g, self.hidden_d
        epochs, lr_g, lr_d = self.epochs, self.lr_g, self.lr_d

        parsed = parse_timestamps(training_data, schema)
        if not self.scaler.is_fitted:
            self.scaler.fit(parsed)
        scaled = self.scaler.transform(parsed)
        windows = sliding_windows(scaled, schema, L).select(
            F.concat_ws(
                "|", *[F.col(c).cast("string") for c in schema.ids], SEQUENCE_ID
            ).alias("_window_key"),
            F.col(SEQUENCE),
        )
        ranked = windows.withColumn(
            "_r",
            F.md5(F.concat_ws("#", F.col("_window_key"), F.lit(f"gan{seed}"))),
        )
        sample = ranked.orderBy("_r").limit(self.max_windows)

        def train(pdf):
            import numpy as np
            import pandas as pd

            from paqarin_spark.generators import nn

            pdf = pdf.sort_values("_window_key")
            seqs = np.array(
                [
                    [[rec[c] for c in cols] for rec in seq]
                    for seq in pdf[SEQUENCE]
                ],
                dtype=np.float64,
            )
            flat = seqs.reshape(seqs.shape[0], -1)
            g, d, losses = nn.train_gan(
                flat,
                nz=nz,
                hidden_g=hg,
                hidden_d=hd,
                epochs=epochs,
                lr_g=lr_g,
                lr_d=lr_d,
                seed=seed,
            )
            state = {
                "g": nn.params_to_lists(g),
                "d": nn.params_to_lists(d),
                "d_loss_first": losses[0],
                "d_loss_last": losses[-1],
            }
            return pd.DataFrame({"weights": [json.dumps(state)]})

        row = (
            sample.withColumn("_g", F.lit(0))
            .groupBy("_g")
            .applyInPandas(train, schema="weights string")
            .collect()
        )
        if not row:
            raise ValueError(
                "cannot fit: no training windows (every entity is "
                f"shorter than sequence_length={L})"
            )
        self.weights = json.loads(row[0]["weights"])
        return self

    def generate(
        self, number_of_sequences: int, seed: int | None = None
    ) -> DataFrame:
        if self.weights is None:
            raise RuntimeError("generator is not fitted")
        seed = self.parameters.seed if seed is None else seed
        schema = self.parameters.schema
        cols = list(schema.value_columns)
        L = self.parameters.sequence_length
        nz = self.noise_dim
        g_json = json.dumps(self.weights["g"])
        ranges = {c: self.scaler.state.column_range[c] for c in cols}
        spark = SparkSession.getActiveSession()
        seeds = spark.range(number_of_sequences).select(
            F.col("id").alias(SEQUENCE_ID)
        )

        def rollout(batches):
            import numpy as np
            import pandas as pd

            from paqarin_spark.generators import nn

            g = nn.params_from_lists(json.loads(g_json))
            for pdf in batches:
                out_rows = []
                for sid in pdf[SEQUENCE_ID]:
                    z = np.array(
                        [
                            [
                                2.0
                                * nn._md5_unit(f"gan-gen#{seed}#{sid}#{j}")
                                - 1.0
                                for j in range(nz)
                            ]
                        ],
                        dtype=np.float64,
                    )
                    win = nn.gan_sample(g, z)[0].reshape(L, len(cols))
                    out_rows.append(
                        {
                            SEQUENCE_ID: int(sid),
                            SEQUENCE: [
                                {
                                    c: float(win[t, j])
                                    * (ranges[c][1] - ranges[c][0])
                                    + ranges[c][0]
                                    for j, c in enumerate(cols)
                                }
                                for t in range(L)
                            ],
                        }
                    )
                yield pd.DataFrame(out_rows, columns=[SEQUENCE_ID, SEQUENCE])

        struct = ", ".join(f"{c}: double" for c in cols)
        return seeds.mapInPandas(
            rollout,
            schema=f"{SEQUENCE_ID} long, {SEQUENCE} array<struct<{struct}>>",
        )

    def save(self, path: str) -> None:
        if self.weights is None:
            raise RuntimeError("generator is not fitted")
        spark = SparkSession.getActiveSession()
        _write_params(
            path,
            self.parameters,
            {
                "provider": self.provider,
                "method": self.method,
                "noise_dim": self.noise_dim,
                "hidden_g": self.hidden_g,
                "hidden_d": self.hidden_d,
                "epochs": self.epochs,
                "lr_g": self.lr_g,
                "lr_d": self.lr_d,
                "max_windows": self.max_windows,
                "weights": self.weights,
            },
            spark=spark,
        )
        self.scaler.state.save(os.path.join(path, "scaler.json"), spark=spark)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "GANWindowGenerator":
        params, extra = _read_params(path, spark=spark)
        gen = cls(
            params,
            noise_dim=int(extra.get("noise_dim", 3)),
            hidden_g=int(extra.get("hidden_g", 16)),
            hidden_d=int(extra.get("hidden_d", 8)),
            epochs=int(extra.get("epochs", 1500)),
            lr_g=float(extra.get("lr_g", 1.0)),
            lr_d=float(extra.get("lr_d", 0.5)),
            max_windows=int(extra.get("max_windows", 256)),
        )
        gen.weights = extra["weights"]
        gen.scaler.state = MinMaxState.load(
            os.path.join(path, "scaler.json"), spark=spark
        )
        return gen
