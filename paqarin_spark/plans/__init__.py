"""Declared query plans (SURVEY.md §2.2 oracle query set + north-star
extension queries)."""

from paqarin_spark.plans.queries import ORACLE_SQL, QUERIES

__all__ = ["ORACLE_SQL", "QUERIES"]
