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
        for r in pack_sequences(docs, "doc_id", "text", budget=5, num_buckets=3)
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


def test_pack_sequences_bucket_count_invariance(spark, docs):
    small = pack_sequences(docs, "doc_id", "text", budget=5, num_buckets=1)
    big = pack_sequences(docs, "doc_id", "text", budget=5, num_buckets=1000)
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


# ---------------------------------------------------------------- BPE


def test_bpe_train_classic_corpus(spark):
    """Sennrich's running example shape: 'low/lower/lowest/new/newer/
    newest' — the trainer must discover the 'low', 'est', 'new'
    sub-words through frequency-ordered merges."""
    from paqarin_spark.operators import bpe_train

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "newest newer new lowest")],
        "doc_id long, text string",
    )
    recs, words = bpe_train(docs, "text", rounds=6)
    assert [(r[1], r[2]) for r in recs] == [
        ("l", "o"), ("lo", "w"), ("e", "s"), ("e", "w"), ("es", "t"),
        ("n", "ew"),
    ]
    # counts: 'lo' appears in low(4) lower lowest(2) = 6 occurrences
    assert recs[0][3] == 6
    # n_symbols_after strictly decreases by pair_count each round
    prev = None
    for _, _, _, cnt, n_after in recs:
        if prev is not None:
            assert prev - n_after == cnt
        prev = n_after
    final = {r["word"]: r["syms"] for r in words.collect()}
    assert final["low"] == ["low"]
    assert final["lowest"] == ["low", "est"]
    assert final["newer"] == ["new", "e", "r"]


def test_bpe_encode_roundtrip(spark):
    """Concatenating a word's sub-words restores the tokenized text;
    unseen words at encode time degrade to finer splits, never crash."""
    from paqarin_spark.operators import bpe_encode, bpe_train
    from pyspark.sql import functions as F

    train = spark.createDataFrame(
        [(1, "low lower lowest low low newest newer new")],
        "doc_id long, text string",
    )
    recs, _ = bpe_train(train, "text", rounds=6)
    docs = spark.createDataFrame(
        [(7, "Lowest New LOWDOWN?!"), (8, "zzz low")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_encode(docs, recs, "text", "doc_id").collect()}
    assert "".join(out[7]) == "lowestnewlowdown"
    assert out[7][0] == "low"                    # trained sub-words apply
    assert out[8] == ["z", "z", "z", "low"]      # unseen word char-degrades


def test_bpe_merge_parity_runs(spark):
    """Greedy left-to-right non-overlap on equal-symbol runs: 'aaa' ->
    [aa, a], 'aaaa' -> [aa, aa] (the a==b case the parity rule in the
    oracle must reproduce)."""
    from paqarin_spark.operators.corpus import _apply_merge, _char_syms
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("aaa",), ("aaaa",), ("ababa",)], "word string"
    )
    out = {
        r["word"]: r["m"]
        for r in df.select(
            "word", _apply_merge(_char_syms(F.col("word")), "a", "a").alias("m")
        ).collect()
    }
    assert out["aaa"] == ["aa", "a"]
    assert out["aaaa"] == ["aa", "aa"]
    assert out["ababa"] == ["a", "b", "a", "b", "a"]
    out2 = {
        r["word"]: r["m"]
        for r in df.select(
            "word", _apply_merge(_char_syms(F.col("word")), "a", "b").alias("m")
        ).collect()
    }
    assert out2["ababa"] == ["ab", "ab", "a"]


def test_bpe_train_validates_and_stops_early(spark):
    from paqarin_spark.operators import bpe_train
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        bpe_train(docs, "text", rounds=0)
    # single-char words: no adjacent pairs ever -> zero merge records
    recs, _ = bpe_train(docs, "text", rounds=4)
    assert recs == []


# ------------------------------------------------- blocklist phrase hits


def test_blocklist_phrase_hits_counts_and_zero_rows(spark):
    """Non-distinct occurrence counts vs distinct doc reach; zero-hit
    phrases still appear; matching is exact word-bigram equality on
    the normalized alphabet (no substring fire: 'tablet hash' must not
    hit 'table hash'); punctuation normalizes away."""
    import pytest

    from paqarin_spark.operators import blocklist_phrase_hits

    rows = [
        (1, "Table hash, table hash and sort merge."),
        (2, "the tablet hash misses but table hash hits"),
        (3, "nothing relevant here"),
        (4, "sort   merge"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["phrase"]: (r["n_docs"], r["n_hits"])
        for r in blocklist_phrase_hits(
            docs, "text", "doc_id", ["table hash", "sort merge", "absent pair"]
        ).collect()
    }
    assert out["table hash"] == (2, 3)  # doc1 twice + doc2 once
    assert out["sort merge"] == (2, 2)
    assert out["absent pair"] == (0, 0)
    assert len(out) == 3
    # phrases normalize onto the corpus alphabet: 'Table, HASH!' is
    # the same gate as 'table hash'
    normed = {
        r["phrase"]: (r["n_docs"], r["n_hits"])
        for r in blocklist_phrase_hits(
            docs, "text", "doc_id", ["Table, HASH!"]
        ).collect()
    }
    assert normed == {"table hash": (2, 3)}
    with pytest.raises(ValueError, match="non-empty"):
        blocklist_phrase_hits(docs, "text", "doc_id", [])
    with pytest.raises(ValueError, match="n must be"):
        blocklist_phrase_hits(docs, "text", "doc_id", ["x"], n=0)
    # a dead entry (wrong token count for n) fails loudly, never
    # reports zero violations
    with pytest.raises(ValueError, match="could never match"):
        blocklist_phrase_hits(docs, "text", "doc_id", ["three word phrase"])


# ------------------------------------------------------ TextRank keywords


def test_textrank_keywords_ranks_hub_token_first(spark):
    """A planted hub word co-occurring with every other candidate
    outranks peripheral words; scores are a valid ranking (rk dense
    from 1, scores non-increasing); the df gate caps the graph; arg
    validation raises."""
    import pytest

    from paqarin_spark.operators import textrank_keywords

    # 'spark' sits next to every other content word; satellites only
    # ever neighbor 'spark'
    rows = [
        (1, "spark shuffle spark window spark codegen"),
        (2, "spark partition spark catalyst spark arrow"),
        (3, "spark shuffle spark window spark catalyst"),
        (4, "spark codegen spark partition spark arrow"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = textrank_keywords(
        docs, "text", "doc_id", vocab_size=16, window=1, top_k=10
    ).collect()
    assert out[0]["token"] == "spark" and out[0]["rk"] == 1
    assert [r["rk"] for r in out] == list(range(1, len(out) + 1))
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert out[0]["score"] > out[-1]["score"]

    capped = textrank_keywords(
        docs, "text", "doc_id", vocab_size=2, window=1, top_k=10
    ).collect()
    assert len(capped) <= 2  # graph bounded by the vocabulary gate

    with pytest.raises(ValueError, match="vocab_size"):
        textrank_keywords(docs, "text", "doc_id", vocab_size=1)


def test_word_ngrams_total_on_short_arrays(spark):
    """Arrays shorter than n yield an EMPTY gram list (never grams
    built from descending negative indexes), size n yields exactly
    one, larger sizes slide by one."""
    from paqarin_spark.operators.corpus import word_ngrams

    df = spark.createDataFrame(
        [(["a"],), (["a", "b"],), (["a", "b", "c"],), ([],)],
        "ts array<string>",
    )
    rows = df.select(word_ngrams(F.col("ts"), 2).alias("g")).collect()
    assert [r["g"] for r in rows] == [
        [], ["a b"], ["a b", "b c"], [],
    ]


def test_kn_bigram_doc_scores_matches_hand_model(spark):
    """Interpolated KN on a toy corpus: per-doc cross-entropy equals
    a hand-built reference model; P(.|w1) sums to 1 over the vocab
    (the property that makes KN a proper distribution); repetitive
    docs score lower entropy than novel-token docs; <2-token docs
    emit no row; discount validation raises."""
    import math
    from collections import Counter

    import pytest

    from paqarin_spark.operators import kn_bigram_doc_scores

    docs = [
        (0, "a b a b a b a b"),
        (1, "a b c d e f g h"),
        (2, "b a c a d a e a"),
        (3, "solo"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           kn_bigram_doc_scores(df, "doc_id", "text").collect()}

    # hand model
    bigrams = {}
    for i, t in docs:
        ws = t.split()
        bigrams[i] = list(zip(ws, ws[1:]))
    all_bi = [b for bs in bigrams.values() for b in bs]
    c2 = Counter(all_bi)
    c1 = Counter({w1: sum(c for (a, _), c in c2.items() if a == w1)
                  for w1 in {a for a, _ in c2}})
    n1p = Counter(a for a, _ in c2)
    cont = Counter(b for _, b in c2)
    T = len(c2)
    D = 0.75

    def p(w1, w2):
        return (max(c2[(w1, w2)] - D, 0.0) / c1[w1]
                + (D * n1p[w1] / c1[w1]) * (cont[w2] / T))

    vocab = {w for b in c2 for w in b}
    for w1 in n1p:
        assert sum(p(w1, w2) for w2 in vocab) == pytest.approx(1.0)

    for i in (0, 1, 2):
        want = sum(-math.log(p(a, b)) for a, b in bigrams[i]) / len(
            bigrams[i]
        )
        assert out[i]["cross_entropy"] == pytest.approx(want, abs=1e-8)
        assert out[i]["n_bigrams"] == len(bigrams[i])
    assert 3 not in out  # no bigrams, no row
    assert out[0]["cross_entropy"] < out[1]["cross_entropy"]

    with pytest.raises(ValueError, match="discount"):
        kn_bigram_doc_scores(df, "doc_id", "text", discount=1.5)


def test_dsir_weights_upweight_target_like_docs(spark):
    """Docs sharing the target subset's vocabulary get higher log
    weights than off-domain docs; zero-token docs are absent; the
    Gumbel resample is deterministic and size-k."""
    from paqarin_spark.operators import dsir_resample, dsir_weights

    rows = [
        (1, "alpha beta alpha beta gamma", True),
        (2, "alpha beta gamma alpha", True),
        (3, "alpha beta beta gamma alpha", False),   # target-like raw doc
        (4, "zebra quux xyzzy corge grault", False), # off-domain
        (5, "", False),                              # zero tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    w = {r["doc_id"]: r for r in
         dsir_weights(df, "doc_id", "text", "tgt").collect()}
    assert 5 not in w                       # no evidence, no row
    assert w[3]["log_weight"] > w[4]["log_weight"]
    assert w[3]["n_tokens"] == 5
    weighted = dsir_weights(df, "doc_id", "text", "tgt")
    p1 = sorted(r["doc_id"] for r in
                dsir_resample(weighted, "doc_id", "log_weight", 2, 7)
                .collect())
    p2 = sorted(r["doc_id"] for r in
                dsir_resample(weighted, "doc_id", "log_weight", 2, 7)
                .collect())
    assert p1 == p2 and len(p1) == 2
