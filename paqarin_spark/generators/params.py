"""Deep-provider parameter objects: API-parity dataclasses for users
migrating from the reference.

The reference declares one parameter object per algorithm with the
hyperparameters its adapters translate to provider kwargs
(`paqarin/generators/timegan.py:42-70`,
`paqarin/generators/doppleganger.py:46-80`,
`paqarin/generators/par.py:27-41`; translation contracts pinned by
`tests/test_synthcity_adapter.py:148-157`, `tests/test_sdv_adapter.py:34-78`).
Here each converts to a :class:`GeneratorParameters` whose
``provider_options`` carry the translated hyperparameters, so a future
applyInPandas-hosted deep provider receives exactly the fields the
reference adapters pass today.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from paqarin_spark.generator import GeneratorParameters
from paqarin_spark.schema import TimeSeriesSchema


@dataclass
class TimeGanParameters:
    """TimeGAN hyperparameters (`paqarin/generators/timegan.py:42-70`)."""

    item_id_column: str
    timestamp_column: str
    numerical_columns: tuple[str, ...]
    sequence_length: int = 24
    epochs: int = 10
    batch_size: int = 32
    learning_rate: float = 5e-4
    latent_dimension: int = 24
    gamma: float = 1.0
    noise_dimension: int | None = None
    layers_dimension: int | None = None
    number_of_sequences: int | None = None
    frequency: str = "D"
    seed: int = 42

    def to_generator_parameters(self) -> GeneratorParameters:
        schema = TimeSeriesSchema(
            item_id_columns=(self.item_id_column,),
            timestamp_column=self.timestamp_column,
            value_columns=tuple(self.numerical_columns),
            frequency=self.frequency,
        )
        options = {
            "epochs": self.epochs,
            "batch_size": self.batch_size,
            "learning_rate": self.learning_rate,
            "latent_dimension": self.latent_dimension,
            "gamma": self.gamma,
        }
        # optional ModelParameters/TrainParameters fields the reference
        # forwards when set (`generators/timegan.py:41-68`)
        for key in ("noise_dimension", "layers_dimension", "number_of_sequences"):
            value = getattr(self, key)
            if value is not None:
                options[key] = value
        return GeneratorParameters(
            schema=schema,
            sequence_length=self.sequence_length,
            seed=self.seed,
            provider_options=options,
        )


@dataclass
class DoppleGanGerParameters:
    """DoppleGANger hyperparameters
    (`paqarin/generators/doppleganger.py:46-80`)."""

    item_id_column: str
    timestamp_column: str
    measurement_columns: tuple[str, ...]
    categorical_columns: tuple[str, ...] = ()
    sequence_length: int = 56
    sample_length: int = 8
    epochs: int = 100
    batch_size: int = 512
    learning_rate: float = 1e-3
    latent_dimension: int = 20
    exponential_decay_rates: tuple[float, float] | None = None
    wgan_weight: float | None = None
    packing_degree: int | None = None
    steps_per_batch: int | None = None
    frequency: str = "D"
    seed: int = 42

    def to_generator_parameters(self) -> GeneratorParameters:
        schema = TimeSeriesSchema(
            item_id_columns=(self.item_id_column,),
            timestamp_column=self.timestamp_column,
            value_columns=tuple(self.measurement_columns),
            attribute_columns=tuple(self.categorical_columns),
            frequency=self.frequency,
        )
        options = {
            "sample_length": self.sample_length,
            "epochs": self.epochs,
            "batch_size": self.batch_size,
            "learning_rate": self.learning_rate,
            "latent_dimension": self.latent_dimension,
        }
        # optional fields the reference forwards to ModelParameters
        # (betas/gp_lambda/pac) and TrainParameters (rounds)
        # (`generators/doppleganger.py:46-80`)
        for key in (
            "exponential_decay_rates",
            "wgan_weight",
            "packing_degree",
            "steps_per_batch",
        ):
            value = getattr(self, key)
            if value is not None:
                options[key] = value
        return GeneratorParameters(
            schema=schema,
            sequence_length=self.sequence_length,
            seed=self.seed,
            provider_options=options,
        )


@dataclass
class ParParameters:
    """(C)PAR hyperparameters (`paqarin/generators/par.py:27-41`);
    ``item_id_columns`` may be composite and a ``context`` frame keys
    conditional sampling (`paqarin/adapters/sdv_adapter.py:38-68`)."""

    item_id_columns: tuple[str, ...]
    timestamp_column: str
    numerical_columns: tuple[str, ...]
    context_columns: tuple[str, ...] = ()
    epochs: int = 128
    sample_size: int = 1
    sequence_length: int | None = None
    frequency: str = "D"
    seed: int = 42

    def to_generator_parameters(self) -> GeneratorParameters:
        schema = TimeSeriesSchema(
            item_id_columns=tuple(self.item_id_columns),
            timestamp_column=self.timestamp_column,
            value_columns=tuple(self.numerical_columns),
            attribute_columns=tuple(self.context_columns),
            frequency=self.frequency,
        )
        return GeneratorParameters(
            schema=schema,
            sequence_length=self.sequence_length or 8,
            seed=self.seed,
            provider_options={
                "epochs": self.epochs,
                "sample_size": self.sample_size,
                "context_columns": list(self.context_columns),
            },
        )
