"""Text-analysis functions (north-star surface): token counting,
quality scoring, language ID, fingerprinting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paqarin_spark.functions.text import (
    predict_language,
    text_stats,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog."),
        (2, "Der Hund ist nicht der einzige, und das ist gut zu wissen."),
        (3, "El perro es un animal que vive en la casa de los hombres."),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(spark):
    df = spark.createDataFrame([("Hello, world! 42 foo_bar",)], "t string")
    n = df.select(token_count(F.col("t")).alias("n")).collect()[0]["n"]
    # tokens: hello, world, 42, foo, bar
    assert n == 5


def test_text_stats_shapes_and_ranges(docs):
    out = {r["doc_id"]: r for r in text_stats(docs, "text", "doc_id").collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 9
    assert 0.0 <= r1["alpha_ratio"] <= 1.0
    assert 0.0 <= r1["stopword_ratio"] <= 1.0
    assert 0.0 <= r1["quality"] <= 1.0
    assert len(r1["fingerprint"]) == 32
    # identical token streams -> identical fingerprints
    assert out[4]["n_tokens"] == 0


def test_fingerprint_normalizes_punctuation(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello world"), (3, "goodbye world")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["fingerprint"] for r in text_stats(df, "text", "doc_id").collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_predict_language(docs):
    out = {
        r["doc_id"]: r["lang"]
        for r in docs.select("doc_id", predict_language(F.col("text")).alias("lang")).collect()
    }
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"


def test_rolling_hash_golden(spark):
    from paqarin_spark.functions.text import rolling_hash
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("ab",), ("A b!",), ("",)], "text string")
    out = [r[0] for r in df.select(rolling_hash(F.col("text"))).collect()]
    # h("ab") = (0*31+97)*31+98 = 3105; "A b!" normalizes to "a b"
    assert out[0] == 3105
    assert out[1] == (97 * 31 + 32) * 31 + 98
    assert out[2] == 0


def test_rolling_hash_whitespace_noise_invariant(spark):
    from paqarin_spark.functions.text import rolling_hash
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("hello, world",), ("  hello   WORLD!! ",)], "text string"
    )
    a, b = [r[0] for r in df.select(rolling_hash(F.col("text"))).collect()]
    assert a == b


def test_bpe_token_count(spark):
    from paqarin_spark.functions.text import bpe_token_count

    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            # "I've" -> I + 've ; " got 2 cats!" -> ' got' ' 2' ' cats' '!'
            (1, "I've got 2 cats!"),
            (2, ""),
            (3, "   "),  # one whitespace run
        ],
        "id int, text string",
    )
    got = {
        r["id"]: r["n"]
        for r in df.select("id", bpe_token_count(F.col("text")).alias("n")).collect()
    }
    assert got == {1: 6, 2: 0, 3: 1}


def test_clean_text(spark):
    from paqarin_spark.functions.text import clean_text
    from pyspark.sql import functions as F

    rows = [
        (1, "<p>Hello&nbsp;&amp; <b>World</b></p>\n\n  Bye"),
        (2, "no markup HERE"),
        (3, "&lt;tag&gt; is &quot;escaped&quot; &#39;quote&#39;"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean"]
        for r in df.select("doc_id", clean_text(F.col("text")).alias("clean")).collect()
    }
    assert got[1] == "hello & world bye"
    assert got[2] == "no markup here"
    assert got[3] == "<tag> is \"escaped\" 'quote'"


def test_clean_text_does_not_double_decode(spark):
    # '&amp;lt;' is an author DISPLAYING the literal string '&lt;' —
    # decoding '&amp;' last preserves it instead of resurrecting '<'.
    from paqarin_spark.functions.text import clean_text
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "literal &amp;lt; stays")], "i long, text string")
    got = df.select(clean_text(F.col("text")).alias("c")).collect()[0]["c"]
    assert got == "literal &lt; stays"


def test_redact_pii(spark):
    from paqarin_spark.functions.text import pii_counts, redact_pii
    from pyspark.sql import functions as F

    rows = [
        (1, "mail me at jo.doe+x@example.co.uk or call +44 20 7946 0958 now"),
        (2, "server at 192.168.1.250 responded"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            redact_pii(F.col("text")).alias("red"),
            *pii_counts(F.col("text")),
        ).collect()
    }
    assert out[1]["red"] == "mail me at <EMAIL> or call <PHONE> now"
    assert (out[1]["n_email"], out[1]["n_phone"]) == (1, 1)
    assert out[2]["red"] == "server at <IP> responded"
    assert out[2]["n_ipv4"] == 1
    assert out[3]["red"] == "nothing sensitive here"
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 0)


def test_pii_counts_reconcile_with_redaction(spark):
    # the digit run inside an email must NOT also count as a phone
    from paqarin_spark.functions.text import pii_counts, redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "contact jo1234567890@example.com today")], "i long, text string"
    )
    row = df.select(
        redact_pii(F.col("text")).alias("red"), *pii_counts(F.col("text"))
    ).collect()[0]
    assert row["red"] == "contact <EMAIL> today"
    assert (row["n_email"], row["n_phone"], row["n_ipv4"]) == (1, 0, 0)


def test_gopher_quality_flags_rules(spark):
    from paqarin_spark.functions.text import gopher_quality_flags

    rows = [
        # passes everything: 12 varied tokens incl. 2 stopwords
        (1, "the cat and dog ran over green hills near blue lakes today"),
        # too short
        (2, "tiny doc here"),
        # top-token domination + repetition ("spam spam ... spam")
        (3, " ".join(["spam"] * 15)),
        # no stopwords
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_quality_flags(df, "text", "doc_id").collect()}
    assert out[1].keep
    assert not out[2].ok_token_count and not out[2].keep
    assert not out[3].ok_top_token and not out[3].ok_repetition
    assert out[3].top_token_frac == 1.0 and out[3].repetition > 0.8
    assert not out[4].ok_stopwords and out[4].ok_token_count
