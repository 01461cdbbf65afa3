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


def test_round4_operators_on_empty_inputs(spark):
    """Round-4 operator surface: empty batches/corpora/streams are
    routine at scale — every new operator must degrade to an empty
    (or zero-valued) result with the right schema, not crash."""
    from pyspark.sql import functions as F

    from paqarin_spark.operators import (
        count_min_counters,
        count_min_estimates,
        hll_estimate,
        ingest_novelty,
        weighted_sample,
    )

    empty_s = spark.createDataFrame([], "v string")
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )

    # sketches
    assert hll_estimate(empty_s, "v", p=10).first()["n_distinct_est"] == 0.0
    assert count_min_counters(empty_s, "v", depth=2, width=8).count() == 0
    cand = spark.createDataFrame([("x",)], "v string")
    est = count_min_estimates(empty_s, "v", cand, "v", depth=2, width=8)
    assert est.collect()[0]["cm_estimate"] == 0
    wdf = spark.createDataFrame([], "doc_id long, w double")
    assert weighted_sample(wdf, "doc_id", "w", k=5).count() == 0

    # ingest manifest: empty batch -> empty manifest; empty corpus ->
    # everything novel with containment 0
    assert ingest_novelty(empty_docs, docs, "text", "doc_id").count() == 0
    rows = ingest_novelty(docs, empty_docs, "text", "doc_id").collect()
    assert len(rows) == 1 and rows[0]["verdict"] == "novel"
    assert rows[0]["containment"] == 0.0


def test_kmeans_empty_input_raises_cleanly(spark):
    from paqarin_spark.operators import kmeans_lloyd

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    # init over an empty frame yields no centroids; the E-step then has
    # nothing to assign — an empty assignment, not a crash
    assign, cent = kmeans_lloyd(empty, "vec_id", "embedding", k=2, iterations=1)
    assert assign.count() == 0 and cent.count() == 0


def test_round5_surface_empty_inputs(spark, tmp_path):
    """Empty-input robustness for the round-5 operator batch: fuzzy
    pairs, quantile sketch + estimate + merge, and the sorted write
    path all handle zero rows without crashing."""
    import pyspark.sql.functions as F

    from paqarin_spark.operators import (
        quantile_estimate_from_sketch,
        quantile_sketch,
        quantile_sketch_merge,
    )
    from paqarin_spark.operators.dedup import fuzzy_pairs
    from paqarin_spark.sources import write_sorted

    empty_s = spark.createDataFrame([], "id long, s string")
    assert fuzzy_pairs(empty_s, "s", "id").count() == 0

    empty_v = spark.createDataFrame([], "event_id long, g string, v double")
    sk = quantile_sketch(empty_v, "v", ["event_id"], k=8, group_by=["g"])
    assert sk.count() == 0
    assert quantile_sketch_merge(sk, k=8, group_by=["g"]).count() == 0
    est = quantile_estimate_from_sketch(sk, [0.5], group_by=["g"])
    assert est.count() == 0  # no groups -> no estimate rows
    # ungrouped estimate over an empty sketch: one row, count 0
    sk_g = quantile_sketch(empty_v, "v", ["event_id"], k=8)
    row = quantile_estimate_from_sketch(sk_g, [0.5]).first()
    assert row["n_sample"] == 0

    p = str(tmp_path / "empty_sorted")
    write_sorted(empty_v.select("event_id", "v"), p, ["v"], num_files=2)
    assert spark.read.parquet(p).count() == 0


def test_power_iteration_on_cov_degenerate_inputs(spark):
    """ADVICE r12: the driver-side replay must match the replaced
    distributed plan on degenerate covariance tables — an EMPTY cov
    yields an empty result (the old joins produced nothing), and a
    NULL cov value is skipped like the old SUM skipped null products
    (not a TypeError on None * float)."""
    from paqarin_spark.operators import power_iteration_on_cov

    empty_cov = spark.createDataFrame([], "i int, j int, cov double")
    out = power_iteration_on_cov(empty_cov, width=4, iterations=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "i",
        "loading",
        "eigenvalue",
    ]

    # NULL covariance entries behave exactly as absent terms: the two
    # tables below must produce identical results.
    with_null = spark.createDataFrame(
        [(0, 0, 2.0), (0, 1, None), (1, 1, 1.0)],
        "i int, j int, cov double",
    )
    without = spark.createDataFrame(
        [(0, 0, 2.0), (1, 1, 1.0)], "i int, j int, cov double"
    )
    got = sorted(
        power_iteration_on_cov(with_null, 2, iterations=4).collect()
    )
    want = sorted(
        power_iteration_on_cov(without, 2, iterations=4).collect()
    )
    assert got == want
