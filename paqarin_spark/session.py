"""SparkSession construction with scale-oriented defaults.

Local tests run on local[N]; the same configs are what we'd set on a
1000-executor cluster (AQE for runtime re-planning / skew handling,
UTC session timezone for deterministic calendar arithmetic).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "paqarin-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE's size-based coalescing apply to CACHED plans too
        # (default false): otherwise every persist() materializes at
        # the raw spark.sql.shuffle.partitions count and each
        # downstream stage over the cache pays one task per tiny
        # partition. This is the same input-size-derived partitioning
        # policy the rest of the session runs on — a 100 TB cached
        # panel still gets many partitions from the advisory size,
        # a 45k-row one no longer gets cpus*4. Results are unaffected
        # (the only partition-sensitive operator, quantile_sketch's
        # per-partition bottom-k, is exact under any layout).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus) * 4),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local[N] runs all N executor threads inside the driver JVM;
        # size the heap for N concurrent task sort/agg buffers, not for
        # a thin driver (8g with 32 threads GC-thrashes on shuffle-heavy
        # plans).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # A long-lived session compiles thousands of whole-stage-codegen
        # classes; the JVM's default 240m code cache can fill mid-run,
        # silently disabling JIT and leaving hot generated loops running
        # interpreted (observed as intermittent 25-60x single-core
        # stalls). 512m still filled once the declared set passed ~80
        # queries (late-run streaming queries stalling 5-10x); reserve
        # enough that flushing never kicks in at this plan count.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()


def configure_for_determinism(spark: SparkSession) -> SparkSession:
    """Pin the session settings the oracle-parity contract requires.

    Timestamps are compared in UTC (SURVEY.md §2.2 determinism rules),
    so calendar ops (date_trunc / dayofweek / sequence) must run with a
    UTC session timezone regardless of who built the session.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
