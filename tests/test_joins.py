"""Salted skew join: result parity with the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from paqarin_spark.operators import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key 'h' dominates the fact side
    facts = spark.createDataFrame(
        [("h", i) for i in range(200)] + [("a", 1), ("b", 2)],
        "k string, v int",
    )
    dim = spark.createDataFrame(
        [("h", "hot"), ("a", "cold"), ("c", "unmatched")], "k string, label string"
    )
    return facts, dim


def _canon(rows):
    return sorted(map(tuple, rows))


def test_salted_inner_matches_plain(skewed):
    facts, dim = skewed
    plain = facts.join(dim, on=["k"], how="inner").collect()
    salted = salted_join(facts, dim, on=["k"], how="inner", salt_buckets=4).collect()
    assert _canon(salted) == _canon(plain)


def test_salted_left_matches_plain(skewed):
    facts, dim = skewed
    plain = facts.join(dim, on=["k"], how="left").collect()
    salted = salted_join(facts, dim, on=["k"], how="left", salt_buckets=4).collect()
    assert _canon(salted) == _canon(plain)


def test_salted_join_rejects_right_joins(skewed):
    facts, dim = skewed
    with pytest.raises(ValueError):
        salted_join(facts, dim, on=["k"], how="right")
