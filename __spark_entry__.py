"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (calendar gap-fill over the
sf0.001 events table — the reference's ``normalise_sequences`` data
path, SURVEY.md op F1). ``queries()`` / ``oracle_sql()`` expose the
declared oracle query set (SURVEY.md §2.2) plus the north-star
LLM-pipeline queries; implementations live in
``paqarin_spark/plans/queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from paqarin_spark.plans.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q03_gap_fill"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query. Every query is
    value-hash-checked EXCEPT the three executing neural providers
    (gen6_arnet_sample, gen10_grunet_sample, gen12_gan_sample) —
    deliberately rows-only (gradient/BPTT/adversarial training is
    deterministic but not single-statement SQL; see their docstrings;
    the recurrent SAMPLE path is value-oracled separately by gen13).
    len(ORACLE_SQL) == len(QUERIES) - 3 by design."""
    return dict(ORACLE_SQL)
