"""Sources & sinks (SURVEY.md §2 ops A1-A5).

The reference reads CSVs eagerly with pandas/dask
(`examples/dopplenganger_example.py:44`,
`paqarin/utils/cloud_trainer.py:56-78`) and writes CSV artifacts
(`paqarin/metrics/univariate_metrics.py:198-207`). Spark subsumes all
of it: schema-on-read, native glob patterns, cloud FS connectors
(`gs://` / `s3a://`) with no custom blob code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nano_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark cannot
    read natively (PARQUET_TYPE_ILLEGAL). Footer-only check."""
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Op A1/A2 for the driver's testdata: parquet scan with native
    pushdown/pruning (check `.explain()` for PushedFilters/ReadSchema).

    Nanosecond-precision parquet timestamps (illegal for Spark's
    vectorized reader) are read as long nanos and truncated to
    microsecond timestamps — the same truncation DuckDB applies when it
    casts TIMESTAMP_NS to its microsecond TIMESTAMP, so oracle parity
    holds.
    """
    from pyspark.sql import functions as F

    path = f"{sf_dir}/{name}.parquet"
    nano_cols = _nano_timestamp_columns(path)
    if not nano_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def read_csv(
    spark: SparkSession, path: str, schema=None, header: bool = True
) -> DataFrame:
    """Op A1/A2: (glob) CSV scan — `path` may contain wildcards; Spark
    distributes the read, no driver-side ``.compute()`` collect."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Op A3 (sink). Parquet by default — columnar, splittable,
    predicate-pushdown-friendly; CSV only for interop artifacts."""
    df.write.mode(mode).parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """Op A1/A2 for JSON-lines corpora (the interchange format of
    large text/training-data pipelines). Globs distribute like CSV;
    pass an explicit schema in production — inference scans the data
    twice and cannot prune."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_columns: list[str],
    mode: str = "overwrite",
) -> None:
    """Op A3 at scale: hive-partitioned parquet layout
    (``path/col=value/...``). Readers touching a partition predicate
    scan only matching directories (partition pruning — verify with
    ``.explain()`` PartitionFilters), which is the difference between
    reading 100 TB and reading one day of it. Choose low-cardinality
    partition columns (date buckets, source); high-cardinality keys
    create a small-file explosion."""
    df.write.mode(mode).partitionBy(*partition_columns).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_columns: list[str],
    num_buckets: int,
    sort_columns: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Op A3's co-location variant: a bucketed parquet table
    (``bucketBy`` + ``saveAsTable``). Rows hash-cluster into
    ``num_buckets`` files per partition at WRITE time, so every later
    equi-join or aggregation keyed on ``bucket_columns`` between
    tables with matching bucketing reads pre-shuffled data — the plan
    is a SortMergeJoin with NO Exchange on either side (verified in
    tests/test_jobs.py). At 100 TB this converts the nightly fact ⋈
    fact join from a full-network shuffle into a per-bucket local
    merge; ``sort_columns`` additionally pre-sorts within buckets so
    even the Sort node drops when it matches the join key.

    Bucket pruning: equality predicates on the first bucket column
    skip non-matching bucket files at scan time
    (``spark.sql.sources.bucketing.enabled``, on by default).
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_columns)
    )
    if sort_columns:
        writer = writer.sortBy(*sort_columns)
    writer.saveAsTable(table_name)


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testdata table as a temp view so the engine's
    SQL surface (`spark.sql`) serves the same relations as the
    DataFrame API — and as the DuckDB oracle's pre-registered views.
    Returns the registered names."""
    import os

    out = []
    for name in TABLES:
        if os.path.exists(f"{sf_dir}/{name}.parquet"):
            read_table(spark, sf_dir, name).createOrReplaceTempView(name)
            out.append(name)
    return out
