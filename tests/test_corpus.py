"""Corpus-preparation operators (operators/corpus.py): mixture
sampling, sequence packing, overlapping chunking, TF-IDF, BM25 —
the LLM-training-data surface beyond the reference inventory."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from paqarin_spark.operators import (
    bm25_topk,
    chunk_tokens,
    mixture_sample,
    pack_sequences,
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta", "web"),
        (1, "alpha alpha alpha", "web"),
        (2, "epsilon zeta", "books"),
        (3, "beta beta gamma", "web"),
        (4, "", "books"),
        (5, "unique words only here now", "code"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_mixture_sample_deterministic_and_rate_bound(spark, docs):
    kept1 = mixture_sample(docs, "doc_id", "source", {"books": 1.0}, 0.5)
    kept2 = mixture_sample(docs, "doc_id", "source", {"books": 1.0}, 0.5)
    a = sorted(r.doc_id for r in kept1.collect())
    b = sorted(r.doc_id for r in kept2.collect())
    assert a == b  # same draw on every run
    # rate 1.0 keeps every row of that source
    books = {r.doc_id for r in kept1.collect() if r.source == "books"}
    assert books == {2, 4}
    # rate 0.0 keeps none
    none = mixture_sample(docs, "doc_id", "source", {}, 0.0)
    assert none.count() == 0


def test_pack_sequences_offsets_are_a_prefix_sum(spark, docs):
    out = {
        r.doc_id: r
        for r in pack_sequences(docs, "doc_id", "text", budget=5, bucket_size=2)
        .collect()
    }
    # token counts: 4, 3, 2, 3, 0, 5 -> offsets 0, 4, 7, 9, 12, 12
    assert [out[i].start_offset for i in range(6)] == [0, 4, 7, 9, 12, 12]
    # doc 1 spans tokens [4,7) -> sequences 0..1 with budget 5
    assert (out[1].first_seq, out[1].last_seq, out[1].n_seqs) == (0, 1, 2)
    # empty doc: zero sequences, span pinned to its start offset
    assert (out[4].n_tokens, out[4].n_seqs) == (0, 0)
    assert out[4].first_seq == out[4].last_seq
    # total stream length = 17 tokens -> last doc ends in seq 3
    assert out[5].last_seq == 3


def test_pack_sequences_bucket_size_invariance(spark, docs):
    small = pack_sequences(docs, "doc_id", "text", budget=5, bucket_size=1)
    big = pack_sequences(docs, "doc_id", "text", budget=5, bucket_size=1000)
    assert sorted(map(tuple, small.collect())) == sorted(map(tuple, big.collect()))


def test_chunk_tokens_overlap_and_coverage(spark):
    df = spark.createDataFrame(
        [(7, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    rows = sorted(
        chunk_tokens(df, "doc_id", "text", chunk=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    # starts 0,3,6,9 -> sizes 4,4,4,1
    assert [r.start_token for r in rows] == [0, 3, 6, 9]
    assert [r.n_chunk_tokens for r in rows] == [4, 4, 4, 1]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    assert rows[3].chunk_text == "t9"
    # empty text emits nothing
    empty = spark.createDataFrame([(8, "")], "doc_id long, text string")
    assert chunk_tokens(empty, "doc_id", "text", 4, 3).count() == 0


def test_tfidf_scores_and_tie_break(spark, docs):
    out = tfidf_top_terms(docs, "doc_id", "text", k=2)
    rows = {(r.doc_id, r.rank): r for r in out.collect()}
    # doc 1: 'alpha' tf=3, df=2 among 6 docs
    r = rows[(1, 1)]
    assert r.term == "alpha" and r.tf == 3 and r.df == 2
    expect = 3 * (math.log(7.0 / 3.0) + 1.0)
    assert abs(r.score - expect) < 1e-6
    # doc 2: epsilon/zeta tie on (tf=1, df=1) -> term-asc order
    assert rows[(2, 1)].term == "epsilon"
    assert rows[(2, 2)].term == "zeta"
    # empty doc emits no terms
    assert (4, 1) not in rows


def test_bm25_prefers_matching_docs(spark, docs):
    out = bm25_topk(docs, "doc_id", "text", ["alpha"], k=3).collect()
    ids = [r.doc_id for r in out]
    # only docs containing 'alpha' are scored; higher tf ranks first
    assert set(ids) == {0, 1}
    assert ids[0] == 1  # tf=3 beats tf=1 despite shorter doc saturation
    assert all(r.score > 0 for r in out)


def test_bm25_formula_pinned(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a a b b"), (3, "c c")], "doc_id long, text string"
    )
    out = {r.doc_id: r.score for r in bm25_topk(df, "doc_id", "text", ["a"], k=3).collect()}
    n, avgdl = 3, (2 + 4 + 2) / 3.0
    idf = math.log(1.0 + (n - 2 + 0.5) / (2 + 0.5))

    def term(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert abs(out[1] - round(term(1, 2), 6)) < 1e-9
    assert abs(out[2] - round(term(2, 4), 6)) < 1e-9
    assert 3 not in out


def test_token_pair_lift_exact_counts(spark):
    """Hand-computed basket statistics: lift > 1 for positively
    associated tokens, < 1 for avoiding ones, and the df-cap drops
    stop-tokens before the pair join."""
    from paqarin_spark.operators import token_pair_lift

    docs = spark.createDataFrame(
        [
            (1, "apple banana stop"),
            (2, "apple banana stop"),
            (3, "apple cherry stop"),
            (4, "date stop"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["token_a"], r["token_b"]): r
        for r in token_pair_lift(
            docs, "text", "doc_id", min_pair_support=1
        ).collect()
    }
    ab = out[("apple", "banana")]
    # n_a=3, n_b=2, n_pair=2, N=4 -> lift = 2*4/(3*2) = 1.333333
    assert (ab["n_a"], ab["n_b"], ab["n_pair"]) == (3, 2, 2)
    assert ab["lift"] == 1.333333
    assert ab["confidence"] == round(2 / 3, 6)
    # stop co-occurs with everything: lift vs apple = 3*4/(3*4) = 1.0
    assert out[("apple", "stop")]["lift"] == 1.0
    # df-cap at 3 drops 'stop' pairs entirely
    capped = {
        (r["token_a"], r["token_b"])
        for r in token_pair_lift(
            docs, "text", "doc_id", min_pair_support=1,
            max_doc_frequency=3,
        ).collect()
    }
    assert all("stop" not in p for p in capped)
    assert ("apple", "banana") in capped
