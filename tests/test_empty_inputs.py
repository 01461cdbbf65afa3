"""Empty-relation robustness: every core operator must return an
empty result (correct schema), not crash, when its input has no rows —
at 100 TB, empty partitions and empty filtered subsets are routine."""

from __future__ import annotations

import pytest

from paqarin_spark.operators import (
    add_surrogate_key,
    asof_join,
    calendar_fill,
    duplicate_clusters,
    exact_duplicates,
    keep_first,
    sessionize,
    sliding_windows,
    tail_trim,
    time_bucket_sum,
)
from paqarin_spark.schema import TimeSeriesSchema

SCHEMA = TimeSeriesSchema(
    item_id_columns=("item",),
    timestamp_column="ts",
    value_columns=("v",),
    frequency="D",
    order_columns=(),
)


@pytest.fixture(scope="module")
def empty(spark):
    return spark.createDataFrame([], "item string, ts timestamp, v double")


def test_core_ops_on_empty_relations(spark, empty):
    assert time_bucket_sum(empty, SCHEMA).count() == 0
    assert calendar_fill(empty, SCHEMA).count() == 0
    assert keep_first(empty, ["item", "ts"], ["v"]).count() == 0
    assert tail_trim(empty, SCHEMA, prediction_length=3).count() == 0
    assert sliding_windows(empty, SCHEMA, sequence_length=4).count() == 0
    assert add_surrogate_key(empty, ["item"], ["ts"]).count() == 0
    assert sessionize(empty, "item", "ts", 3600).count() == 0


def test_text_ops_on_empty_relations(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_duplicates(docs, "text", "doc_id").count() == 0
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert duplicate_clusters(pairs).count() == 0


def test_asof_join_empty_sides(spark, empty):
    right = spark.createDataFrame([], "item string, rts timestamp, px double")
    out = asof_join(empty, right, on=["item"], left_ts="ts", right_ts="rts")
    assert out.count() == 0
    # empty right side: left rows survive with null payload
    import datetime as dt

    left = spark.createDataFrame(
        [("a", dt.datetime(2021, 3, 1), 1.0)], "item string, ts timestamp, v double"
    )
    rows = asof_join(left, right, on=["item"], left_ts="ts", right_ts="rts").collect()
    assert len(rows) == 1 and rows[0]["px"] is None


def test_round3_ops_on_empty_relations(spark):
    from paqarin_spark.operators import (
        contamination_check,
        containment_pairs,
        duplicate_spans,
        scalar_quantize_error,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    some = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    assert duplicate_spans(docs, "text", "doc_id").count() == 0
    assert containment_pairs(docs, "text", "doc_id").count() == 0
    # empty corpus against a real benchmark, and vice versa
    assert contamination_check(docs, some, "text", "doc_id", n=2).count() == 0
    out = contamination_check(some, docs, "text", "doc_id", n=2).collect()
    assert len(out) == 1 and out[0]["n_contaminated"] == 0

    vecs = spark.createDataFrame([], "vec_id long, v array<double>")
    assert scalar_quantize_error(vecs, "vec_id", "v").count() == 0


def test_markov_generator_empty_fit_raises_cleanly(spark):
    from paqarin_spark.generators import MarkovEventGenerator
    from paqarin_spark.generator import GeneratorParameters

    empty_ev = spark.createDataFrame(
        [], "user_id string, ts timestamp, event_type string, value double"
    )
    schema = TimeSeriesSchema(
        item_id_columns=("user_id",),
        timestamp_column="ts",
        value_columns=("value",),
        frequency="D",
    )
    p = GeneratorParameters(schema=schema, sequence_length=4, seed=1)
    gen = MarkovEventGenerator(p).fit(empty_ev)
    # fitting on nothing yields an empty chain; sampling from it must
    # fail loudly (no initial distribution), not emit garbage
    assert gen.initial == {} and gen.transitions == {}
    with pytest.raises(RuntimeError, match="empty relation"):
        gen.generate(3)
