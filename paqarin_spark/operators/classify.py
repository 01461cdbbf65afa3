"""Learned text classification — distributed multinomial Naive Bayes.

Every production pretraining corpus runs a LEARNED quality/language
filter beside its heuristic gates (the fastText classifiers of
CCNet/GPT-3; Joulin et al. 2016, "Bag of Tricks for Efficient Text
Classification"). This module supplies that seam with the classical
multinomial Naive Bayes + Laplace smoothing, chosen over a gradient
classifier because BOTH halves of the loop are exact relational
algebra, so the entire fit → score → report pipeline is SQL-replayable
and value-verifiable (the tx45 oracle replays it in CTEs):

- **fit** is ONE token-keyed groupBy (per-class token counts) plus a
  label-keyed doc count — every aggregate is partial-aggregatable
  (map-side combine), so the corpus is read once per input column and
  only (class × vocabulary) partials cross the wire. Class token
  totals and the vocabulary size derive from the already-reduced
  count table, never from a second corpus pass.
- **score** is an exploded-token join against the count table and an
  exact-decimal log-probability sum: each log term is stabilized at
  12dp (the tx34/em22 discipline) and summed as DECIMAL, so fold
  order cannot matter and the per-document arg-max is deterministic;
  ties break on the label.

100-TB posture: the per-class stats table is bounded by the label
alphabet (broadcast-safe under the §4 policy); the token-count table
is (vocabulary × classes)-sized and is NEVER broadcast — the score
join shuffles on the token key, which AQE handles (and skew-salts)
like any other keyed join. Scores never visit the driver.

Reference parity: the reference (alan-turing-institute/paqarin) has no
learned classifier — its surface is generator fidelity metrics. This
extends the repo's LLM-pipeline families (SURVEY.md §2, tx-family).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from paqarin_spark.operators.dedup import tokens

# One shared stabilization width for every log term (see module doc).
_LOG_DECIMALS = 12
_TERM_TYPE = "decimal(25,12)"


@dataclass(frozen=True)
class NaiveBayesModel:
    """A fitted multinomial NB model as three bounded DataFrames.

    ``token_counts``: (label, token, cnt) — class-conditional token
    occurrence counts, (vocabulary × classes)-sized.
    ``class_stats``: (label, n_docs, n_tokens) — one row per class.
    ``totals``: single row (n_total_docs, vocab_size).

    All three are plain DataFrames: the model IS its sufficient
    statistics — :meth:`save`/:meth:`load` persist them as parquet
    (the op-A4 model-persistence contract, like the scaler/neural
    states), and any newer corpus's counts can be unioned in and
    re-aggregated to update the model incrementally.
    """

    token_counts: DataFrame
    class_stats: DataFrame
    totals: DataFrame

    def save(self, path: str) -> None:
        import os

        self.token_counts.write.mode("overwrite").parquet(
            os.path.join(path, "token_counts.parquet")
        )
        self.class_stats.write.mode("overwrite").parquet(
            os.path.join(path, "class_stats.parquet")
        )
        self.totals.write.mode("overwrite").parquet(
            os.path.join(path, "totals.parquet")
        )

    @classmethod
    def load(cls, spark, path: str) -> "NaiveBayesModel":
        import os

        return cls(
            token_counts=spark.read.parquet(
                os.path.join(path, "token_counts.parquet")
            ),
            class_stats=spark.read.parquet(
                os.path.join(path, "class_stats.parquet")
            ),
            totals=spark.read.parquet(os.path.join(path, "totals.parquet")),
        )


def naive_bayes_fit(
    train: DataFrame,
    text_column: str = "text",
    label_column: str = "label",
) -> NaiveBayesModel:
    """Fit multinomial NB sufficient statistics from a labeled corpus.

    One exploded-token groupBy over the corpus (partial-aggregatable)
    plus a label-only doc count; class token totals and vocabulary
    size reduce from the count table, which never leaves the cluster.
    """
    toks = train.select(
        F.col(label_column).alias("label"),
        F.explode(tokens(F.col(text_column))).alias("token"),
    )
    token_counts = toks.groupBy("label", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    n_docs = train.groupBy(F.col(label_column).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    n_tokens = token_counts.groupBy("label").agg(
        F.sum("cnt").alias("n_tokens")
    )
    class_stats = (
        n_docs.join(n_tokens, "label", "left")
        .select(
            "label",
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        )
    )
    totals = class_stats.agg(
        F.sum("n_docs").cast("long").alias("n_total_docs")
    ).crossJoin(
        token_counts.select("token")
        .distinct()
        .agg(F.count(F.lit(1)).alias("vocab_size"))
    )
    return NaiveBayesModel(
        token_counts=token_counts, class_stats=class_stats, totals=totals
    )


def _score_frame(
    model: NaiveBayesModel,
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> DataFrame:
    """Per-(document, class) exact-decimal log scores — the shared
    internals of :func:`naive_bayes_predict` and the ev17 calibration
    audit (which needs the full score table to take margins in the
    exact domain). Returns (_id, label, _score decimal)."""
    classes = F.broadcast(
        model.class_stats.crossJoin(F.broadcast(model.totals))
    )
    occ = df.select(
        F.col(id_column).alias("_id"),
        F.explode(tokens(F.col(text_column))).alias("token"),
    )
    token_terms = (
        occ.crossJoin(classes)
        .join(model.token_counts, ["token", "label"], "left")
        .select(
            "_id",
            "label",
            F.round(
                F.log(
                    (F.coalesce("cnt", F.lit(0)) + F.lit(1))
                    / (F.col("n_tokens") + F.col("vocab_size"))
                ),
                _LOG_DECIMALS,
            )
            .cast(_TERM_TYPE)
            .alias("term"),
        )
    )
    prior_terms = (
        df.select(F.col(id_column).alias("_id"))
        .crossJoin(classes)
        .select(
            "_id",
            "label",
            F.round(
                F.log(F.col("n_docs") / F.col("n_total_docs")),
                _LOG_DECIMALS,
            )
            .cast(_TERM_TYPE)
            .alias("term"),
        )
    )
    return (
        token_terms.unionByName(prior_terms)
        .groupBy("_id", "label")
        .agg(F.sum("term").alias("_score"))
    )


def naive_bayes_predict(
    model: NaiveBayesModel,
    df: DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> DataFrame:
    """Score documents against a fitted model; returns one row per
    input document: (id_column, predicted label, score).

    score(d, c) = ln P(c) + Σ_occurrences ln((cnt(t,c)+1)/(N_c+V)),
    every term 12dp-stabilized and summed in exact decimal; arg-max
    ties break on the label, so the prediction is deterministic and
    replayable. Documents with zero tokens still score (prior-only
    rows are generated per document × class, which also keeps the
    smoothed unseen-token mass exact)."""
    scores = _score_frame(model, df, text_column, id_column)
    w = Window.partitionBy("_id").orderBy(
        F.col("_score").desc(), F.col("label").asc()
    )
    return (
        scores.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            F.col("_id").alias(id_column),
            F.col("label").alias("predicted"),
            F.col("_score").cast("double").alias("score"),
        )
    )


def classification_report(
    predictions: DataFrame,
    truth: DataFrame,
    id_column: str = "doc_id",
    label_column: str = "label",
    classes: DataFrame | None = None,
) -> DataFrame:
    """Per-class precision/recall of ``predictions`` (from
    :func:`naive_bayes_predict`) against ``truth`` (id → true label).

    Report rows cover ``classes`` (default: the distinct true labels),
    so a class the model never predicts still appears with n_pred=0
    and a NULL precision rather than silently vanishing. All counts
    are exact integers; the two ratios are the only floats."""
    truth = truth.select(
        F.col(id_column).alias("_id"),
        F.col(label_column).alias("_true"),
    )
    joined = predictions.select(
        F.col(id_column).alias("_id"), F.col("predicted")
    ).join(truth, "_id")
    if classes is None:
        classes = truth.select(F.col("_true").alias("label")).distinct()
    per_true = joined.groupBy(F.col("_true").alias("label")).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    per_pred = joined.groupBy(F.col("predicted").alias("label")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    correct = (
        joined.where(F.col("_true") == F.col("predicted"))
        .groupBy(F.col("_true").alias("label"))
        .agg(F.count(F.lit(1)).alias("n_correct"))
    )
    out = (
        classes.join(per_true, "label", "left")
        .join(per_pred, "label", "left")
        .join(correct, "label", "left")
        .select(
            "label",
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("n_correct", F.lit(0))
            .cast("long")
            .alias("n_correct"),
        )
    )
    return out.select(
        "label",
        "n_true",
        "n_pred",
        "n_correct",
        F.when(
            F.col("n_pred") > 0,
            F.round(F.col("n_correct") / F.col("n_pred"), 6),
        ).alias("precision"),
        F.when(
            F.col("n_true") > 0,
            F.round(F.col("n_correct") / F.col("n_true"), 6),
        ).alias("recall"),
    ).orderBy("label")


def compile_scoring_table(
    model: NaiveBayesModel, n_features: int
) -> dict:
    """Compile a fitted model into a BOUNDED python scoring table for
    stream-side classification (streaming.stream_classify_counts):
    keep only the top-``n_features`` tokens by total training count
    (ties broken token-ascending), densify their per-class
    12dp-stabilized log terms, and attach the class priors.

    The feature selection IS the scale contract: the full-vocabulary
    scoring path is the batch join (naive_bayes_predict, vocabulary
    never leaves the cluster); a streaming classifier instead ships a
    model whose size is bounded BY CONSTRUCTION (n_features × classes)
    so it can ride inside the worker closure. Non-selected tokens
    contribute nothing at scoring time (the standard
    feature-selection semantics); unseen-in-class selected tokens
    score with Laplace mass.

    Exactness contract: every term is the 12dp-stabilized log SHIPPED
    AS AN INTEGER count of 1e-12 units ("picanats"), so the stream
    fold sums exactly and arg-max ties compare exactly — the same
    lattice the oracle's DECIMAL(25,12) sums live on (a float
    accumulation would drift off it and could flip near-ties or miss
    true ties)."""
    import math

    if n_features < 1:
        raise ValueError("n_features must be >= 1")
    # one persisted pass over the count-table lineage serves all the
    # reads below (each collect would otherwise re-run the full corpus
    # tokenize+groupBy from scratch); driver traffic stays bounded
    tc = model.token_counts.persist()
    try:
        feats = [
            r["token"]
            for r in (
                tc.groupBy("token")
                .agg(F.sum("cnt").alias("_tot"))
                .orderBy(F.col("_tot").desc(), "token")
                .limit(n_features)
                .collect()
            )
        ]
        stats = {
            r["label"]: (r["n_docs"], r["n_tokens"])
            for r in model.class_stats.collect()
        }
        tot = model.totals.collect()[0]
        n_total, v = tot["n_total_docs"], tot["vocab_size"]
        counts = {
            (r["token"], r["label"]): r["cnt"]
            for r in tc.where(F.col("token").isin(feats)).collect()
        }
    finally:
        tc.unpersist()

    def pico(x: float) -> int:
        return int(round(math.log(x) * 1e12))

    labels = sorted(stats)
    return {
        "labels": labels,
        "prior": {c: pico(stats[c][0] / n_total) for c in labels},
        "terms": {
            t: {
                c: pico((counts.get((t, c), 0) + 1) / (stats[c][1] + v))
                for c in labels
            }
            for t in feats
        },
    }
