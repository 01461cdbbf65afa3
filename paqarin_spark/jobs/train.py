"""Training job CLI (SURVEY.md §2 op K4).

The reference dispatches training as a cloud job whose entry point
reads a metadata file, constructs the generator, fits it on CSVs
matched by a glob, and uploads the model directory
(`paqarin/utils/cloud_trainer.py:119-146`, `paqarin/evaluation.py:33-54`).

Spark-native shape: the same four inputs as a ``spark-submit`` job —
a JSON metadata file replaces the metadata pickle, Hadoop FS
connectors (s3a://, gs://) replace hand-rolled blob code, and the
training read is a distributed (glob) scan, not a driver-side
``.compute()`` collect.

Usage:
    spark-submit -m paqarin_spark.jobs.train \
        --metadata-file meta.json \
        --training-data 'data/training-*.csv' \
        --model-path /models/run1 \
        [--data-format csv|parquet]

metadata JSON: {"provider": ..., "method": ..., "schema": {...},
"sequence_length": N, "seed": N, "provider_options": {...}} — the same
fields GeneratorParameters persists.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from paqarin_spark.adapter import get_generator_adapter
from paqarin_spark.generator import GeneratorParameters
from paqarin_spark.schema import TimeSeriesSchema


def load_metadata(
    path: str, spark: SparkSession | None = None
) -> tuple[str, str, GeneratorParameters]:
    """JSON analogue of the reference's TrainingMetadata pickle
    (`paqarin/evaluation.py:33-54`). ``path`` may be any Hadoop-reachable
    URI (op A5, `utils/cloud_trainer.py:56-78`'s metadata download) when
    a session is provided; plain and ``file://`` paths read locally."""
    from paqarin_spark.sources import hadoop_read_text, local_path

    lpath = local_path(path)
    if lpath is None:
        if spark is None:
            raise ValueError(f"remote metadata path {path!r} requires a SparkSession")
        meta = json.loads(hadoop_read_text(spark, path))
    else:
        with open(lpath, encoding="utf-8") as fh:
            meta = json.load(fh)
    s = meta["schema"]
    schema = TimeSeriesSchema(
        item_id_columns=tuple(s["item_id_columns"]),
        timestamp_column=s["timestamp_column"],
        value_columns=tuple(s["value_columns"]),
        attribute_columns=tuple(s.get("attribute_columns", ())),
        frequency=s.get("frequency", "D"),
        date_format=s.get("date_format"),
        order_columns=tuple(s.get("order_columns", ())),
    )
    params = GeneratorParameters(
        schema=schema,
        sequence_length=meta.get("sequence_length", 8),
        seed=meta.get("seed", 42),
        provider_options=meta.get("provider_options", {}),
    )
    return meta["provider"], meta["method"], params


def run(
    spark: SparkSession,
    metadata_file: str,
    training_data: str,
    model_path: str,
    data_format: str = "csv",
) -> None:
    provider, method, params = load_metadata(metadata_file, spark)
    generator = get_generator_adapter(provider, method, params)
    if data_format == "parquet":
        df = spark.read.parquet(training_data)
    else:
        df = (
            spark.read.option("header", "true")
            .option("inferSchema", "true")
            .csv(training_data)  # glob-distributed scan (op A2)
        )
    generator.fit(df)
    # save() is URI-aware end to end: sidecar JSON goes through the
    # Hadoop FS API for remote schemes, bulk state through DataFrame
    # writers (connector-backed for any scheme).
    generator.save(model_path)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--metadata-file", required=True)
    parser.add_argument("--training-data", required=True)
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--data-format", default="csv", choices=["csv", "parquet"])
    args = parser.parse_args(argv)
    spark = SparkSession.builder.getOrCreate()
    run(
        spark,
        args.metadata_file,
        args.training_data,
        args.model_path,
        args.data_format,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
