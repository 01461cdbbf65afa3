"""Text-analysis functions for the LLM-data-pipeline surface
(SURVEY.md §2 'Not present in the reference' / §7 step 6): token
counting, quality scoring, language ID, document fingerprinting.

Everything is built from JVM-side expressions (regexp/array functions)
so it runs inside whole-stage codegen — no Python in the hot path. The
token contract (lowercase alphanumeric runs) is shared with
operators/dedup.py and mirrored in the DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from paqarin_spark.operators.dedup import TOKEN_PATTERN, tokens

# Tiny deterministic stopword marker sets per language for the n-gram
# heuristic language ID. Chosen from high-frequency function words.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "los", "las", "que", "de", "es", "un"),
    "fr": ("le", "la", "les", "des", "et", "est", "une", "que"),
    "zh": ("de", "shi", "le", "bu", "wo", "zai", "you", "he"),
}

ENGLISH_STOPWORDS = LANG_MARKERS["en"] + ("a", "an", "for", "on", "with", "as", "at")


def token_count(text_col) -> Column:
    """Whitespace/alnum token count via one regexp pass."""
    return F.size(tokens(text_col))


def char_count(text_col) -> Column:
    return F.length(text_col)


def alpha_ratio(text_col) -> Column:
    """Fraction of characters that are ASCII letters (unrounded — round
    at output so composites stay exact)."""
    letters = F.length(F.regexp_replace(text_col, "[^A-Za-z]", ""))
    return letters / F.greatest(F.length(text_col), F.lit(1))


def punct_ratio(text_col) -> Column:
    """Fraction of characters in a fixed punctuation class."""
    punct = F.length(
        F.regexp_replace(F.regexp_replace(text_col, "[^.,;:!?'\"()-]", ""), " ", "")
    )
    return punct / F.greatest(F.length(text_col), F.lit(1))


def stopword_ratio(text_col, stopwords: tuple[str, ...] = ENGLISH_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords."""
    toks = tokens(text_col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_token_length(text_col) -> Column:
    toks = tokens(text_col)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text_col) -> Column:
    """Composite heuristic quality score in [0, 1]: rewards moderate
    length, high alpha ratio, sane stopword density. Deterministic and
    SQL-expressible (mirrored in the oracle)."""
    length_term = F.least(token_count(text_col) / F.lit(100.0), F.lit(1.0))
    return (length_term + alpha_ratio(text_col) + stopword_ratio(text_col)) / F.lit(3.0)


def predict_language(text_col, markers: dict[str, tuple[str, ...]] | None = None) -> Column:
    """N-gram-heuristic language ID: count marker-word hits per
    language, argmax with lexicographic tie-break on language code.

    Expressed as a greatest-of-structs trick so the whole prediction is
    one codegen'd expression: max(struct(hits, neg_ord, lang)).lang.
    """
    markers = markers or LANG_MARKERS
    toks = tokens(text_col)

    def marker_hits(words: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    # greatest() compares struct fields left-to-right: highest hits
    # wins; ties break toward the lexicographically smallest lang via
    # the inverted rank field.
    langs_sorted = sorted(markers)
    ranked = []
    for idx, lang in enumerate(langs_sorted):
        ranked.append(
            F.struct(
                marker_hits(markers[lang]).alias("hits"),
                F.lit(len(langs_sorted) - idx).alias("tie"),
                F.lit(lang).alias("lang"),
            )
        )
    return F.greatest(*ranked).getField("lang")


def fingerprint(text_col) -> Column:
    """Document fingerprint: md5 of the normalized token stream
    (rolling-hash analogue, stable under whitespace/punct noise)."""
    return F.md5(F.concat_ws(" ", tokens(text_col)))


# GPT-2-style pre-tokenizer pattern, restricted to constructs both
# Java regex (Spark) and RE2 (DuckDB) execute identically: ordered
# alternation, no lookarounds, ASCII classes. Contractions first, then
# space-prefixed letter/digit/punct runs, then whitespace runs.
BPE_TOKEN_PATTERN = (
    "'(?:s|t|re|ve|m|ll|d)"
    "| ?[A-Za-z]+"
    "| ?[0-9]+"
    "| ?[^A-Za-z0-9\\s]+"
    "|\\s+"
)


def bpe_token_count(text_col) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer
    regex (the unit an LLM tokenizer would split further into subwords
    — a closer proxy for training-token cost than whitespace words).
    One codegen'd regexp_count pass."""
    return F.regexp_count(text_col, F.lit(BPE_TOKEN_PATTERN)).cast("long")


ROLLING_HASH_BASE = 31
ROLLING_HASH_MOD = 1_000_000_007


def rolling_hash(text_col) -> Column:
    """Polynomial rolling-hash fingerprint over the normalized
    character stream: ``h = (h*31 + ascii(ch)) mod 1e9+7``, folded left
    to right over lowercased text with non-alphanumeric runs collapsed
    to single spaces.

    The per-character ``aggregate`` lambda is interpreted, so this is
    the demonstration/verification form; the production fingerprint for
    bulk dedup is :func:`fingerprint` (one codegen'd regexp + md5 pass).
    Accumulator stays < 2^63 (mod * base + 255), no overflow on either
    engine.
    """
    normalized = F.btrim(
        F.regexp_replace(F.lower(text_col), "[^a-z0-9]+", " ")
    )
    chars = F.filter(F.split(normalized, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * ROLLING_HASH_BASE + F.ascii(ch))
        % ROLLING_HASH_MOD,
    )


def text_stats(df: DataFrame, text_column: str, id_column: str) -> DataFrame:
    """One-pass per-document text statistics table.

    Staged projections keep the expensive ``tokens()`` regexp pass
    computed once per row: Catalyst's CollapseProject does not merge
    projections when a non-cheap producer expression is consumed more
    than once, so ``_toks`` is materialized a single time instead of
    being re-inlined into each of the ~6 consumer expressions.
    """
    t = F.col(text_column)
    # Every statistic is a single regexp pass over the row — no array
    # materialization, no higher-order-function lambdas (which are
    # interpreted per element), everything inside whole-stage codegen.
    # The token contract ([a-z0-9]+ runs over lowered text) is encoded
    # as lookaround word boundaries so counts match the array-based
    # ``tokens()`` exactly.
    lowered = F.lower(t)
    stop_pat = "(?<![a-z0-9])(" + "|".join(ENGLISH_STOPWORDS) + ")(?![a-z0-9])"
    comp = df.select(
        F.col(id_column),
        F.length(t).alias("_n_chars"),
        (F.regexp_count(t, F.lit("[A-Za-z]")) / F.greatest(F.length(t), F.lit(1))).alias(
            "_alpha"
        ),
        F.regexp_count(lowered, F.lit(TOKEN_PATTERN)).alias("_n_tokens"),
        F.length(F.regexp_replace(lowered, "[^a-z0-9]", "")).alias("_tok_chars"),
        F.regexp_count(lowered, F.lit(stop_pat)).alias("_stop_hits"),
        # md5 of the normalized token stream == md5(concat_ws(' ', tokens))
        F.md5(F.btrim(F.regexp_replace(lowered, "[^a-z0-9]+", " "))).alias(
            "fingerprint"
        ),
    )
    n_toks = F.greatest(F.col("_n_tokens"), F.lit(1))
    alpha = F.col("_alpha")
    stop = F.col("_stop_hits") / n_toks
    length_term = F.least(F.col("_n_tokens") / F.lit(100.0), F.lit(1.0))
    return comp.select(
        F.col(id_column),
        F.col("_n_chars").cast("long").alias("n_chars_computed"),
        F.col("_n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("_tok_chars") / n_toks, 6).alias("mean_token_len"),
        F.round(alpha, 6).alias("alpha_ratio"),
        F.round(stop, 6).alias("stopword_ratio"),
        F.round((length_term + alpha + stop) / F.lit(3.0), 6).alias("quality"),
        "fingerprint",
    )


def clean_text(text_col) -> Column:
    """Training-corpus text normalization, the standard pre-dedup
    cleaning pass: strip HTML/XML tags, decode the common entities,
    collapse all whitespace runs to single spaces, trim, and casefold.
    Pure codegen'd regexp passes — at 100 TB this runs at scan speed
    with no Python anywhere. Tag stripping is the pragmatic
    ``<[^>]*>`` contract (not an HTML parser): right for corpus
    cleaning, documented so nobody mistakes it for sanitization."""
    t = F.regexp_replace(text_col, "<[^>]*>", " ")
    # '&amp;' decodes LAST (standard unescape order): decoding it first
    # would double-decode doubly-escaped text ('&amp;lt;' -> '<'
    # instead of the literal '&lt;' the author displayed).
    for entity, repl in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(entity), F.lit(repl))
    return F.lower(F.btrim(F.regexp_replace(t, "\\s+", " ")))


# Deterministic, dialect-portable PII patterns (same regex text runs on
# Spark and DuckDB): pragmatic corpus-scrubbing contracts, not a
# compliance guarantee.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\+?[0-9][0-9()\\- ]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(text_col) -> Column:
    """Mask emails, IPv4 addresses, and phone-shaped digit runs with
    typed placeholder tokens — the standard scrub in front of training
    corpora. Pure codegen'd regexp passes applied in declared order
    (email first so its digits can't be half-eaten by the phone rule).
    """
    t = text_col
    for _, pattern, token in PII_PATTERNS:
        t = F.regexp_replace(t, pattern, token)
    return t


def pii_counts(text_col) -> list[Column]:
    """Per-kind REDACTION counts, aliased n_<kind>: each pattern is
    counted on the text with all EARLIER patterns already applied, so
    the numbers reconcile exactly with what :func:`redact_pii` masks
    (counting independently on the raw text would claim a phone
    redaction for the digit run inside an already-masked email)."""
    out = []
    t = text_col
    for kind, pattern, token in PII_PATTERNS:
        out.append(
            F.regexp_count(t, F.lit(pattern)).cast("long").alias(f"n_{kind}")
        )
        t = F.regexp_replace(t, pattern, token)
    return out


def gopher_quality_flags(
    df: DataFrame,
    text_column: str,
    id_column: str,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_top_token_frac: float = 0.20,
    min_stopwords: int = 2,
    max_repetition: float = 0.30,
) -> DataFrame:
    """Gopher-style multi-rule quality GATE (Rae et al. 2021 §A1.1,
    adapted to single-line corpora): per-document boolean verdicts for
    the classic repetition/shape filters plus the overall keep flag.
    Rules: token count in [min,max]; mean token length in [min,max];
    most-frequent-token share ≤ cap; ≥ ``min_stopwords`` stopword
    hits; duplicate-trigram fraction ≤ cap (the tx18 measure).

    Scale: one projection pass — the token array materializes once per
    row (staged projection, same CollapseProject contract as
    ``text_stats``) and every rule is array/regexp expressions, zero
    shuffle. The top-token share scans distinct×total tokens per row
    (bounded per-doc work at scan time — the cost profile a filter
    pass wants; no vocabulary shuffle).
    """
    from paqarin_spark.operators.dedup import shingles_from_tokens

    toks = df.select(
        F.col(id_column), tokens(F.col(text_column)).alias("_toks")
    )
    n = F.size("_toks")
    n1 = F.greatest(n, F.lit(1))
    mean_len = F.aggregate(
        F.transform("_toks", F.length), F.lit(0), lambda a, x: a + x
    ) / n1
    top_cnt = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct("_toks"),
                lambda t: F.size(F.filter(F.col("_toks"), lambda x: x == t)),
            )
        ),
        F.lit(0),
    )
    stop_hits = F.size(
        F.filter(F.col("_toks"), lambda t: t.isin(*ENGLISH_STOPWORDS))
    )
    tri_total = F.greatest(n - F.lit(2), F.lit(0))
    repetition = F.when(
        tri_total > 0,
        F.round(
            1 - F.size(shingles_from_tokens(F.col("_toks"), 3)) / tri_total, 6
        ),
    ).otherwise(F.lit(0.0))
    flagged = toks.select(
        F.col(id_column),
        n.cast("long").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(top_cnt / n1, 6).alias("top_token_frac"),
        stop_hits.cast("long").alias("stopword_hits"),
        repetition.alias("repetition"),
    )
    r_count = F.col("n_tokens").between(min_tokens, max_tokens)
    r_len = F.col("mean_token_len").between(min_mean_len, max_mean_len)
    r_top = F.col("top_token_frac") <= max_top_token_frac
    r_stop = F.col("stopword_hits") >= min_stopwords
    r_rep = F.col("repetition") <= max_repetition
    return flagged.select(
        "*",
        r_count.alias("ok_token_count"),
        r_len.alias("ok_mean_len"),
        r_top.alias("ok_top_token"),
        r_stop.alias("ok_stopwords"),
        r_rep.alias("ok_repetition"),
        (r_count & r_len & r_top & r_stop & r_rep).alias("keep"),
    )
