"""Categorical sequence synthesis walkthrough: fit the first-order
Markov event-type generator on a real event log, sample synthetic
action sequences, persist + reload the model, and measure fidelity as
per-state total-variation distance between the real and re-estimated
transition matrices (the ev4 loop).

Run:  python examples/markov_generation_example.py [sf_dir]
      (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from paqarin_spark.adapter import get_generator_adapter, load_generator  # noqa: E402
from paqarin_spark.generator import GeneratorParameters  # noqa: E402
from paqarin_spark.schema import TimeSeriesSchema  # noqa: E402
from paqarin_spark.session import get_session  # noqa: E402
from paqarin_spark.sources import read_table  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("markov-example")
    spark.sparkContext.setLogLevel("ERROR")

    events = read_table(spark, sf_dir, "events")
    schema = TimeSeriesSchema(
        item_id_columns=("user_id",),
        timestamp_column="ts",
        value_columns=("value",),
        frequency="D",
    )
    params = GeneratorParameters(schema=schema, sequence_length=8, seed=11)

    # Dispatch through the K1 adapter grid, same as every provider.
    gen = get_generator_adapter("paqarin_spark", "markov", params).fit(events)
    print("fitted transition matrix (counts):")
    for prev in sorted(gen.transitions):
        print(f"  {prev:10s} -> {gen.transitions[prev]}")

    sample = gen.generate(5)
    print("\nsynthetic sequences (seed=11, reproducible anywhere):")
    for row in sample.orderBy("sequence_id", "step").collect():
        print(f"  seq {row['sequence_id']} step {row['step']}: {row['event_type']}")

    # Persist + reload: JSON state through the Hadoop FS branch, so
    # the same call works with hdfs:///s3a:// paths on a cluster.
    path = os.path.join(tempfile.mkdtemp(), "markov_model")
    gen.save(path)
    reloaded = load_generator(spark, "paqarin_spark", "markov", path)
    assert reloaded.transitions == gen.transitions
    print(f"\nmodel round-tripped through {path}")

    # Fidelity: re-estimate the transition matrix from a larger sample
    # and report per-state total-variation distance vs the real chain.
    big = reloaded.generate(200)
    from pyspark.sql import Window

    def probs(df, part, order):
        w = Window.partitionBy(part).orderBy(order)
        steps = df.select(
            F.lag("event_type").over(w).alias("prev"),
            F.col("event_type").alias("next"),
        ).where(F.col("prev").isNotNull())
        c = steps.groupBy("prev", "next").count()
        return c.select(
            "prev",
            "next",
            (F.col("count") / F.sum("count").over(Window.partitionBy("prev"))).alias("p"),
        )

    real = probs(events, "user_id", F.col("ts"))
    synth = probs(big, "sequence_id", F.col("step"))
    tvd = (
        real.withColumnRenamed("p", "pr")
        .join(synth.withColumnRenamed("p", "ps"), ["prev", "next"], "full_outer")
        .groupBy("prev")
        .agg(
            F.round(
                F.sum(
                    F.abs(
                        F.coalesce("pr", F.lit(0.0)) - F.coalesce("ps", F.lit(0.0))
                    )
                )
                / 2,
                4,
            ).alias("tvd")
        )
    )
    print("\nper-state total-variation distance (200 sampled sequences):")
    for row in tvd.orderBy("prev").collect():
        print(f"  {row['prev']:10s} tvd={row['tvd']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
