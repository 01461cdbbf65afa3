"""End-to-end walkthrough mirroring the reference's flagship example
(`examples/dopplenganger_example.py` in alan-turing-institute/paqarin):
load a long-format multi-entity series, fit several generators, score
them with the predictive (train-on-synthetic, test-on-real) metric,
print the summary table, and sample from the winner.

Run:  python examples/evaluation_pipeline_example.py [sf_dir]
      (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from paqarin_spark.evaluation import (  # noqa: E402
    EvaluationPipeline,
    MultivariatePredictiveScorer,
)
from paqarin_spark.generator import GeneratorParameters  # noqa: E402
from paqarin_spark.generators import (  # noqa: E402
    BlockBootstrapGenerator,
    GANWindowGenerator,
    GaussianPerStepGenerator,
)
from paqarin_spark.schema import TimeSeriesSchema  # noqa: E402
from paqarin_spark.session import get_session  # noqa: E402
from paqarin_spark.sources import read_table  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("paqarin-example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. Long-format input: one row per (entity, timestamp) observation.
    events = read_table(spark, sf_dir, "events")
    schema = TimeSeriesSchema(
        item_id_columns=("user_id",),
        timestamp_column="ts",
        value_columns=("value",),
        frequency="D",
        order_columns=("event_id",),
    )
    params = GeneratorParameters(schema=schema, sequence_length=8, seed=17)

    # 2. Generators to compare (same GeneratorParameters role surface
    #    as the reference's TimeGAN/DoppleGANger/PAR parameter objects).
    generators = {
        "bootstrap": BlockBootstrapGenerator(params),
        "gaussian": GaussianPerStepGenerator(params),
        # the adversarially-trained provider (generator+discriminator
        # trained jointly, pure numpy — the TimeGAN seam), round 10
        "gan": GANWindowGenerator(params, epochs=400),
    }

    # 3. Fit + score: train a forecaster on each generator's synthetic
    #    sequences, test on real held-out windows, rank by MAE.
    scorer = MultivariatePredictiveScorer(
        sequence_length=8, iterations=2, number_of_sequences=50
    )
    pipeline = EvaluationPipeline(generators, scorer).fit(events)

    print("\nsummary metrics:")
    for row in pipeline.training_results:
        print("  ", row)
    best_name = scorer.best_generator_name
    print("best generator:", best_name)

    # 4. Sample from the winner.
    sample = pipeline.best_generator.generate(5)
    sample.select(
        "sequence_id", F.posexplode("sequence").alias("step", "obs")
    ).select("sequence_id", "step", F.round("obs.value", 4).alias("value")).show(
        16, truncate=False
    )
    pipeline.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
