"""Learned text classification (operators/classify.py): multinomial
Naive Bayes fit/predict/report invariants.

The tx45 oracle proves the fit→score→argmax pipeline replays in SQL;
these tests pin the parts the oracle gate cannot see: that the model
actually LEARNS a separable vocabulary (the synthetic corpus's labels
are text-independent, so the query reports prior-level accuracy by
design), smoothing of unseen tokens, zero-token documents, tie-break
determinism, and the report's NULL contract for never-predicted
classes."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from paqarin_spark.operators import (
    classification_report,
    naive_bayes_fit,
    naive_bayes_predict,
)


@pytest.fixture(scope="module")
def planted(spark):
    """Corpus where each class owns a disjoint content vocabulary
    plus shared filler — NB must classify held-out docs perfectly."""
    rows = [
        (1, "sv", "stream watermark state stream the of"),
        (2, "sv", "state stream watermark watermark a the"),
        (3, "sv", "watermark state state stream of a"),
        (4, "bt", "shuffle partition codegen shuffle the of"),
        (5, "bt", "codegen shuffle partition partition a the"),
        (6, "bt", "partition codegen codegen shuffle of a"),
    ]
    return spark.createDataFrame(rows, "doc_id long, label string, text string")


def test_learns_planted_vocabulary(spark, planted):
    model = naive_bayes_fit(planted, "text", "label")
    hold = spark.createDataFrame(
        [
            (10, "stream state the"),
            (11, "watermark stream of"),
            (12, "shuffle codegen a"),
            (13, "partition shuffle the"),
        ],
        "doc_id long, text string",
    )
    preds = {
        r["doc_id"]: r["predicted"]
        for r in naive_bayes_predict(model, hold, "text", "doc_id").collect()
    }
    assert preds == {10: "sv", 11: "sv", 12: "bt", 13: "bt"}


def test_fit_sufficient_statistics(spark, planted):
    model = naive_bayes_fit(planted, "text", "label")
    stats = {r["label"]: (r["n_docs"], r["n_tokens"]) for r in model.class_stats.collect()}
    # 3 docs x 6 tokens per class
    assert stats == {"sv": (3, 18), "bt": (3, 18)}
    totals = model.totals.collect()[0]
    assert totals["n_total_docs"] == 6
    # sv vocab: stream watermark state the of a; bt adds shuffle
    # partition codegen -> 9 distinct tokens overall
    assert totals["vocab_size"] == 9
    counts = {
        (r["label"], r["token"]): r["cnt"] for r in model.token_counts.collect()
    }
    assert counts[("sv", "stream")] == 4
    assert counts[("bt", "shuffle")] == 4
    assert ("sv", "shuffle") not in counts


def test_score_arithmetic_matches_closed_form(spark, planted):
    """One doc, hand-computed smoothed log-likelihoods."""
    model = naive_bayes_fit(planted, "text", "label")
    hold = spark.createDataFrame([(20, "stream shuffle")], "doc_id long, text string")
    out = naive_bayes_predict(model, hold, "text", "doc_id").collect()[0]
    v = 9

    def term(cnt, n_tokens):
        return round(math.log((cnt + 1) / (n_tokens + v)), 12)

    # class sv: stream cnt 4, shuffle cnt 0, prior ln(3/6)
    sv = term(4, 18) + term(0, 18) + round(math.log(3 / 6), 12)
    bt = term(0, 18) + term(4, 18) + round(math.log(3 / 6), 12)
    # symmetric doc -> exact tie -> label asc wins
    assert sv == bt
    assert out["predicted"] == "bt"
    assert out["score"] == pytest.approx(sv, abs=1e-9)


def test_zero_token_doc_gets_prior_argmax(spark):
    train = spark.createDataFrame(
        [(1, "a", "x x x"), (2, "a", "x y"), (3, "b", "y y")],
        "doc_id long, label string, text string",
    )
    model = naive_bayes_fit(train, "text", "label")
    hold = spark.createDataFrame([(9, "???!!!")], "doc_id long, text string")
    out = naive_bayes_predict(model, hold, "text", "doc_id").collect()
    # no alphanumeric tokens -> prior-only row survives; majority class a
    assert len(out) == 1 and out[0]["predicted"] == "a"


def test_report_counts_and_null_precision(spark, planted):
    model = naive_bayes_fit(planted, "text", "label")
    hold = spark.createDataFrame(
        [(30, "sv", "stream state"), (31, "bt", "watermark watermark")],
        "doc_id long, label string, text string",
    )
    preds = naive_bayes_predict(model, hold, "text", "doc_id")
    rep = {
        r["label"]: r
        for r in classification_report(
            preds,
            hold.select("doc_id", "label"),
            classes=model.class_stats.select("label"),
        ).collect()
    }
    # doc 31 is truly bt but reads sv vocabulary -> predicted sv
    assert rep["sv"]["n_true"] == 1 and rep["sv"]["n_pred"] == 2
    assert rep["sv"]["n_correct"] == 1
    assert rep["sv"]["precision"] == 0.5 and rep["sv"]["recall"] == 1.0
    # bt never predicted -> n_pred 0, precision NULL, recall 0
    assert rep["bt"]["n_pred"] == 0
    assert rep["bt"]["precision"] is None
    assert rep["bt"]["recall"] == 0.0


def test_never_broadcasts_token_counts(spark, planted):
    """The (vocab x classes) table must reach the score join without a
    broadcast hint — only the label-bounded class stats are hinted."""
    model = naive_bayes_fit(planted, "text", "label")
    hold = spark.createDataFrame([(40, "stream")], "doc_id long, text string")
    plan = (
        naive_bayes_predict(model, hold, "text", "doc_id")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the token_counts join side carries the cnt column; assert the
    # only ResolvedHint nodes wrap the class-stats/totals lineage
    import re

    hints = re.findall(r"ResolvedHint.*", plan)
    assert all("cnt" not in h for h in hints)


def test_model_save_load_roundtrip(spark, planted, tmp_path):
    """Op A4 for the classifier: the persisted sufficient statistics
    reload into a model that predicts identically."""
    from paqarin_spark.operators.classify import NaiveBayesModel

    model = naive_bayes_fit(planted, "text", "label")
    path = str(tmp_path / "nb_model")
    model.save(path)
    loaded = NaiveBayesModel.load(spark, path)
    hold = spark.createDataFrame(
        [(50, "stream state"), (51, "codegen partition")],
        "doc_id long, text string",
    )
    a = sorted(
        map(tuple, naive_bayes_predict(model, hold, "text", "doc_id").collect())
    )
    b = sorted(
        map(tuple, naive_bayes_predict(loaded, hold, "text", "doc_id").collect())
    )
    assert a == b and [r[1] for r in a] == ["sv", "bt"]
