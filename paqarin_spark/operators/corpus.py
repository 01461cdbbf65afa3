"""Corpus-preparation operators for the LLM-training-data pipeline
surface (SURVEY.md §2 'Not present in the reference'): deterministic
mixture sampling, concat-and-chunk sequence packing, overlapping
token chunking, TF-IDF term ranking, and BM25 retrieval.

Everything here is pure DataFrame expressions (whole-stage codegen) —
no Python in the hot path — and every shuffle is keyed on a
high-cardinality column (token, doc bucket) so the plans survive a
1000-executor 100 TB corpus. Determinism contracts (md5-prefix
uniforms, composite-key tie-breaks) are shared with the DuckDB
oracles in plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from paqarin_spark.operators.dedup import normalized_text, tokens

from paqarin_spark.functions import uniform_hash as _uniform_hash  # noqa: E402


def mixture_sample(
    df: DataFrame,
    id_column: str,
    source_column: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: str = "mix",
) -> DataFrame:
    """Deterministic per-source Bernoulli sampling — the corpus
    MIXTURE-reweighting step of a pretraining pipeline (keep web text
    at 30%, books at 100%, ...). Each row draws uniform(0,1) from
    md5(seed # id) and survives iff draw < rate(source).

    Scale: a pure filter over the scan — no shuffle, no state, and the
    same row always gets the same verdict regardless of partitioning,
    retries, or cluster size (unlike ``df.sample`` whose output
    depends on partition layout).
    """
    rate = F.lit(float(default_rate))
    # Fold the dict into a CASE chain in sorted-key order so the plan
    # (and the oracle) is deterministic.
    expr = None
    for src in sorted(rates):
        cond = F.col(source_column) == F.lit(src)
        expr = (
            F.when(cond, F.lit(float(rates[src])))
            if expr is None
            else expr.when(cond, F.lit(float(rates[src])))
        )
    rate = rate if expr is None else expr.otherwise(rate)
    draw = _uniform_hash(F.lit(seed), F.col(id_column).cast("string"))
    return df.where(draw < rate)


def pack_sequences(
    df: DataFrame,
    id_column: str,
    text_column: str,
    budget: int,
    num_buckets: int = 1024,
) -> DataFrame:
    """Concat-and-chunk SEQUENCE PACKING (the GPT-style pretraining
    step): documents are laid out in ``id_column`` order as one token
    stream and split every ``budget`` tokens; a document spans the
    training sequences ``first_seq..last_seq`` its token offsets fall
    into. Output: one row per doc with
    (id, n_tokens, start_offset, first_seq, last_seq, n_seqs).

    Scale: the global prefix-sum is TWO-LEVEL — docs are equal-width
    bucketed on ``id_column`` against its broadcast [min,max] into a
    CONSTANT ``num_buckets`` buckets (a per-SF bucket *size* would
    leave the offsets table growing with the corpus — the round-12
    fix), the within-bucket cumsum is a window partitioned BY BUCKET
    (buckets scale out across tasks), and the per-bucket totals — at
    most ``num_buckets`` rows forever — take one tiny bounded window
    pass before being joined back on the bucket key. No
    single-partition window over anything that grows with the data —
    the classic prefix-sum-at-scale layout.
    """
    ext = df.agg(
        F.min(id_column).alias("_lo"), F.max(id_column).alias("_hi")
    )
    # integer `div` end to end: double division loses low bits of
    # 64-bit ids above 2^53 and could round an id into the wrong
    # bucket, corrupting the prefix sum's bucket-monotonic invariant.
    # width = ceil(span / num_buckets) keeps every bucket index in
    # [0, num_buckets) with equal-width integer ranges.
    b = int(num_buckets)
    df = df.crossJoin(F.broadcast(ext)).withColumn(
        "_w", F.expr(f"(_hi - _lo + {b}) div {b}")
    )
    bucket = F.expr(f"(`{id_column}` - _lo) div _w")
    # persist: both the in-bucket window and the bucket totals consume
    # this projection — without caching, the tokenize-and-count pass
    # over the full corpus executes twice. The cached rows are ~24
    # bytes each, negligible next to re-running the regexp.
    sized = df.select(
        F.col(id_column),
        bucket.alias("_bucket"),
        F.size(tokens(F.col(text_column))).alias("n_tokens"),
    ).persist()
    in_bucket = Window.partitionBy("_bucket").orderBy(id_column)
    local = sized.withColumn(
        "_local_end", F.sum("n_tokens").over(in_bucket)
    )
    totals = sized.groupBy("_bucket").agg(F.sum("n_tokens").alias("_bt"))
    bucket_order = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_bucket",
        F.coalesce(F.sum("_bt").over(bucket_order), F.lit(0)).alias("_base"),
    )
    packed = local.join(offsets, on="_bucket").select(
        F.col(id_column),
        "n_tokens",
        (F.col("_base") + F.col("_local_end") - F.col("n_tokens")).alias(
            "start_offset"
        ),
        (F.col("_base") + F.col("_local_end")).alias("_end"),
    )
    # integer `div` on bigints, matching the oracle's `//`: F.floor of a
    # double quotient can land in the wrong sequence past ~2^53
    # cumulative tokens, the same precision trap as the bucket key above
    first_seq = F.expr(f"start_offset div {int(budget)}")
    last_seq = F.expr(f"(_end - 1) div {int(budget)}")
    # Empty docs occupy no tokens: pin both span ends to the sequence
    # at their start offset so every row has defined span columns.
    empty = F.col("n_tokens") == 0
    return packed.select(
        F.col(id_column),
        "n_tokens",
        "start_offset",
        first_seq.alias("first_seq"),
        F.when(empty, first_seq).otherwise(last_seq).alias("last_seq"),
        F.when(empty, F.lit(0))
        .otherwise(last_seq - first_seq + 1)
        .cast("bigint")
        .alias("n_seqs"),
    )


def chunk_tokens(
    df: DataFrame,
    id_column: str,
    text_column: str,
    chunk: int,
    stride: int,
) -> DataFrame:
    """Overlapping token CHUNKING (the RAG/window-attention prep step):
    each document explodes into windows of ``chunk`` tokens taken
    every ``stride`` tokens (so consecutive chunks overlap by
    ``chunk - stride``). Chunks that would start at-or-past the end
    are not emitted; a non-empty doc always emits at least one chunk.
    Output: (id, chunk_id, start_token, n_chunk_tokens, chunk_text).

    Scale: generate-and-project only — the explode happens where the
    row already lives (no shuffle), and the token array is computed
    once per doc then sliced per chunk inside codegen.
    """
    toks = tokens(F.col(text_column))
    n = F.size(toks)
    starts = F.when(n <= 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(int(stride)))
    )
    base = df.select(
        F.col(id_column), toks.alias("_toks"), F.explode(starts).alias("start_token")
    )
    piece = F.slice(F.col("_toks"), F.col("start_token") + 1, int(chunk))
    return base.select(
        F.col(id_column),
        (F.col("start_token") / F.lit(int(stride)))
        .cast("bigint")
        .alias("chunk_id"),
        "start_token",
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_column: str,
    text_column: str,
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document — the classic keyword-extraction
    pass. tf = in-doc term count; idf = ln((N+1)/(df+1)) + 1 (the
    smoothed scikit-learn form, never negative); ties break on the
    lexicographically smaller term so the top-k set is deterministic.

    Scale: term stats shuffle on the TERM key (high cardinality, no
    hot rows after stopword-class terms spread across docs); the
    per-doc top-k is a doc-keyed window over ≤|vocab ∩ doc| rows.
    N is a scalar broadcast, not a cross join.
    """
    tf = (
        df.select(F.col(id_column), F.explode(tokens(F.col(text_column))).alias("term"))
        .groupBy(id_column, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "df",
            (
                F.log((F.col("_n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                + F.lit(1.0)
            ).alias("idf"),
        )
    )
    scored = tf.join(idf, on="term").select(
        F.col(id_column),
        "term",
        "tf",
        "df",
        (F.col("tf") * F.col("idf")).alias("score"),
    )
    rank_w = Window.partitionBy(id_column).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= int(k))
        .select(id_column, "rank", "term", "tf", "df", F.round("score", 6).alias("score"))
    )


def bm25_topk(
    df: DataFrame,
    id_column: str,
    text_column: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 retrieval of the top-k documents for a bag of query terms
    — full-corpus search scoring as a relational plan. Uses the
    standard Robertson idf ``ln(1 + (N - df + 0.5)/(df + 0.5))`` and
    per-term saturation ``tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))``.

    Scale: the corpus explodes only the QUERY terms' postings (filter
    before the shuffle — a scan + tiny agg, not a full inverted
    index); N/avgdl are scalar broadcasts; the final top-k is a
    global ``orderBy(...).limit(k)`` = TakeOrderedAndProject (per-
    partition heaps + driver merge of k·P rows, never a full sort).
    """
    terms = [t.lower() for t in query_terms]
    toks = tokens(F.col(text_column))
    docs = df.select(
        F.col(id_column),
        F.size(toks).alias("dl"),
        F.filter(toks, lambda t: t.isin(*terms)).alias("_hits"),
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("dl").alias("_avgdl")
    )
    postings = (
        docs.select(F.col(id_column), "dl", F.explode("_hits").alias("term"))
        .groupBy(id_column, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = (
        postings.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_column),
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("_avgdl")
                    )
                )
            ).alias("_term_score"),
        )
    )
    return (
        scored.groupBy(id_column)
        .agg(F.round(F.sum("_term_score"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_column))
        .limit(int(k))
    )


def token_pair_lift(
    df: DataFrame,
    text_column: str,
    id_column: str,
    min_pair_support: int = 2,
    max_doc_frequency: int | None = None,
) -> DataFrame:
    """Association mining over the corpus (Agrawal et al. 1993 support/
    confidence/lift, document = basket, token = item): for every token
    pair co-occurring in at least ``min_pair_support`` documents,
    support counts plus lift = P(a,b)/(P(a)·P(b)) and the a→b
    confidence — the co-occurrence statistics a curation pipeline uses
    for collocation detection and topic-leak audits.

    All ratios are exact-integer quotients evaluated once in double
    (products stay < 2^53 for any corpus this engine addresses) and
    rounded at 6dp — no float accumulation anywhere.

    Scale posture: the pair stage is a self-join keyed on DOC id, so
    fanout is (distinct tokens per doc)² — bounded by document length,
    the natural cap, never corpus size. ``max_doc_frequency`` drops
    stop-tokens (df-cap pattern) BEFORE the join; token totals are
    partial-aggregatable groupBys.

    Output: (token_a, token_b, n_a, n_b, n_pair, lift, confidence),
    token_a < token_b, confidence = P(b-doc | a-doc)."""
    toks = (
        df.select(
            F.col(id_column).alias("doc"),
            F.explode(
                F.array_distinct(
                    F.split(normalized_text(F.col(text_column)), " ")
                )
            ).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    tok_df = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    if max_doc_frequency is not None:
        keep = tok_df.where(F.col("n_tok") <= max_doc_frequency).select(
            "tok"
        )
        toks = toks.join(F.broadcast(keep), "tok", "left_semi")
    a = toks.select("doc", F.col("tok").alias("token_a"))
    b = toks.select("doc", F.col("tok").alias("token_b"))
    pairs = (
        a.join(b, on="doc")
        .where(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= min_pair_support)
    )
    # token totals join UNHINTED: the dictionary is vocabulary-sized
    # (broadcastable on most corpora, not guaranteed at web scale) —
    # AQE picks broadcast when it fits
    return (
        pairs.join(
            tok_df.select(
                F.col("tok").alias("token_a"), F.col("n_tok").alias("n_a")
            ),
            "token_a",
        )
        .join(
            tok_df.select(
                F.col("tok").alias("token_b"), F.col("n_tok").alias("n_b")
            ),
            "token_b",
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token_a",
            "token_b",
            "n_a",
            "n_b",
            "n_pair",
            F.round(
                (F.col("n_pair") * F.col("n_docs"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
            F.round(F.col("n_pair") / F.col("n_a"), 6).alias("confidence"),
        )
    )


def _char_syms(word_col) -> F.Column:
    """Initial BPE symbol array: one single-character symbol per
    character (expressed as transform(sequence(...)) so the DuckDB
    oracle mirrors it literally)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word_col)),
        lambda i: F.substring(word_col, i, F.lit(1)),
    )


def _apply_merge(syms_col, left: str, right: str) -> F.Column:
    """Apply ONE BPE merge (left, right) greedily left-to-right to a
    symbol array, as a pure JVM fold (whole-stage codegen; no Python).

    The fold is equivalent to the classic non-overlapping scan: a pair
    merges iff its left symbol was not consumed by the previous merge
    (for left != right candidates can never overlap; for left == right
    a run of k equal symbols merges at offsets 0, 2, 4, ... — the fold
    reproduces this because a freshly merged symbol's string
    (left||right) is strictly longer than `left` and so never
    re-matches within the round)."""
    merged = left + right
    return F.aggregate(
        syms_col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    corpus: DataFrame,
    text_column: str = "text",
    rounds: int = 8,
) -> tuple[list[tuple[int, str, str, int, int]], DataFrame]:
    """Distributed byte-pair-encoding TRAINING (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units") —
    the canonical tokenizer-build job of a training-data pipeline,
    upgrading tx9's "BPE-ish" pre-tokenizer to real merge learning.

    The scale trick (shared with every production BPE trainer): after
    ONE corpus pass reduces the text to the word-frequency table, all
    merge rounds iterate on that VOCABULARY-sized table — the corpus
    is never touched again. Each round is one adjacent-pair groupBy
    (weighted by word frequency, partial-aggregatable) + a
    deterministic argmax (count DESC, pair ASC), then one fold pass
    over the symbol arrays; the table is localCheckpoint-ed per round
    (the em14/q69 iterative discipline). Driver traffic is ONE row per
    round — the learned merge.

    Returns (merge_records, encoded_words): merge_records is
    [(round, merge_left, merge_right, pair_count, n_symbols_after)]
    — pair_count value-verifies each round's argmax and
    n_symbols_after checksums the full state evolution — and
    encoded_words is the final (word, freq, syms) table, the lookup
    half of :func:`bpe_encode`.

    Determinism: all counts are exact integers; ties in the argmax
    break on (merge_left, merge_right) ascending, so the merge table
    replays bit-exactly in SQL (the tx46 oracle unrolls the rounds as
    CTE blocks with a gaps-and-islands parity rule standing in for the
    greedy scan). Stops early if no adjacent pairs remain.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    words = (
        corpus.select(F.explode(tokens(F.col(text_column))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("word", "freq", _char_syms(F.col("word")).alias("syms"))
        .localCheckpoint()
    )
    records: list[tuple[int, str, str, int, int]] = []
    for r in range(1, rounds + 1):
        pairs = words.select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("l"),
                    F.slice(
                        F.col("syms"), 2, F.size("syms") - 1
                    ).alias("r"),
                )
            ).alias("p"),
        ).select(
            F.col("p.l").alias("merge_left"),
            F.col("p.r").alias("merge_right"),
            "freq",
        )
        best = (
            pairs.groupBy("merge_left", "merge_right")
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(
                F.col("pair_count").desc(), "merge_left", "merge_right"
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = (
            best[0]["merge_left"],
            best[0]["merge_right"],
            best[0]["pair_count"],
        )
        words = words.select(
            "word",
            "freq",
            _apply_merge(F.col("syms"), left, right).alias("syms"),
        ).localCheckpoint()
        n_after = words.agg(
            F.sum(F.size("syms") * F.col("freq")).alias("n")
        ).collect()[0]["n"]
        records.append((r, left, right, int(cnt), int(n_after)))
    return records, words


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, str, str, int, int]] | list[tuple[str, str]],
    text_column: str = "text",
    id_column: str = "doc_id",
) -> DataFrame:
    """Encode documents with a trained BPE merge table: tokenize,
    char-split each DISTINCT word once (the vocabulary-bounded dedup
    every fast encoder uses), apply the merges in training order, and
    join the sub-word sequences back to the token stream. Returns
    (id_column, bpe_tokens array<string>) with sub-words in document
    order — ONE row per input document (a document with no
    alphanumeric tokens encodes to an empty array, never a dropped
    row); concatenating the sub-words restores the tokenized text
    exactly."""
    pairs = [
        (m[1], m[2]) if len(m) >= 4 else (m[0], m[1]) for m in merges
    ]
    toks = df.select(
        F.col(id_column).alias("_id"),
        F.posexplode(tokens(F.col(text_column))).alias("_pos", "word"),
    )
    vocab = toks.select("word").distinct()
    syms = _char_syms(F.col("word"))
    for left, right in pairs:
        syms = _apply_merge(syms, left, right)
    vocab = vocab.select("word", syms.alias("_syms"))
    encoded = (
        toks.join(vocab, "word")
        .groupBy("_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_syms"))
                    ),
                    lambda s: s["_syms"],
                )
            ).alias("_enc")
        )
    )
    return (
        df.select(F.col(id_column).alias("_id"))
        .join(encoded, "_id", "left")
        .select(
            F.col("_id").alias(id_column),
            F.coalesce(
                "_enc", F.expr("CAST(array() AS array<string>)")
            ).alias("bpe_tokens"),
        )
    )


def word_ngrams(tokens_col, n: int) -> F.Column:
    """Non-distinct, space-joined word n-grams from a MATERIALIZED
    token-array column — the ONE gram projection the batch
    (:func:`blocklist_phrase_hits`) and streaming
    (``streaming.stream_phrase_hits``) blocklist gates share, so the
    tx49/st19 hash parity cannot drift through a one-sided edit.

    Total on short inputs: an array with fewer than ``n`` tokens
    yields an EMPTY gram list — without the guard, F.sequence(1,
    size-n+1) would run DESCENDING and element_at's negative indexes
    would silently build grams from the array's tail."""
    return F.when(
        F.size(tokens_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tokens_col, i + off) for off in range(n)]
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def normalize_blocklist(phrases: list[str], n: int) -> list[str]:
    """Canonicalize a phrase blocklist onto the corpus token alphabet
    (the Python mirror of :func:`normalized_text`) and REJECT entries
    that cannot match any document n-gram — a content-safety gate
    must fail loudly on a dead blocklist entry, never report it as
    zero violations."""
    import re

    if not phrases:
        raise ValueError("phrases must be non-empty")
    if n < 1:
        raise ValueError("n must be >= 1")
    out = set()
    for p in phrases:
        norm = re.sub(r"[^a-z0-9]+", " ", str(p).lower()).strip()
        if norm == "" or len(norm.split(" ")) != n:
            raise ValueError(
                f"blocklist phrase {p!r} does not normalize to exactly "
                f"{n} tokens ({norm!r}) — it could never match"
            )
        out.add(norm)
    return sorted(out)


def blocklist_phrase_hits(
    df: DataFrame,
    text_column: str,
    id_column: str,
    phrases: list[str],
    n: int = 2,
) -> DataFrame:
    """Phrase-blocklist content filtering — the bad-words/banned-phrase
    gate every production pretraining pipeline runs before training
    (C4 strips documents on a public blocklist; here the report shape:
    per-phrase document reach and total occurrence counts, INCLUDING
    zero-hit phrases, so the curation dashboard sees the whole list).

    Matching is exact word-n-gram equality on the shared
    :func:`normalized_text` token alphabet (not substring LIKE — a
    blocklist must not fire inside larger words), occurrences counted
    NON-distinct so repeated violations weigh more. Phrases pass
    through :func:`normalize_blocklist` first: an entry that cannot
    normalize to exactly ``n`` tokens raises instead of silently
    reporting zero.

    Scale posture: the blocklist is bounded by construction (a
    human-curated list) → broadcast; the corpus side is one tokenize +
    n-gram explode with the phrase-equality filter applied AT the join
    (no corpus-sized shuffle: Spark plans a broadcast hash join keyed
    on the gram). Output is |blocklist| rows.

    Returns (phrase, n_docs, n_hits), one row per blocklist phrase;
    the phrase column carries the NORMALIZED form.
    """
    blk_list = normalize_blocklist(phrases, n)
    spark = df.sparkSession
    blk = spark.createDataFrame([(p,) for p in blk_list], ["phrase"])
    toks = df.select(
        F.col(id_column).alias("_doc"),
        F.split(normalized_text(F.col(text_column)), " ").alias("_ts"),
    ).where(F.size("_ts") >= n)
    grams = toks.select(
        "_doc",
        F.explode(word_ngrams(F.col("_ts"), n)).alias("_gram"),
    )
    hits = (
        grams.join(F.broadcast(blk), grams._gram == blk.phrase)
        .groupBy("phrase")
        .agg(
            F.countDistinct("_doc").alias("n_docs"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )
    return (
        blk.join(hits, on="phrase", how="left")
        .select(
            "phrase",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
    )


def textrank_keywords(
    df: DataFrame,
    text_column: str,
    id_column: str,
    vocab_size: int = 128,
    window: int = 2,
    iterations: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    corpus-level keywords as the PageRank of the word co-occurrence
    graph — the unsupervised keyword/keyphrase primitive a curation
    pipeline uses for topic inventories and index terms. Composes the
    existing :func:`paqarin_spark.operators.graph.pagerank` (fixed
    rounds, dangling mass, the q69 replay discipline) over a graph
    built here.

    Construction: candidate vocabulary = top ``vocab_size`` tokens by
    document frequency (the paper's POS filter re-expressed as a
    frequency gate, which also BOUNDS the graph); undirected edges
    join candidate tokens co-occurring within ``window`` raw token
    positions, weighted by co-occurrence count; ranks run
    ``iterations`` rounds at damping 0.85; top ``top_k`` by
    (6dp-rounded score DESC, token ASC) — ranking on the ROUNDED score
    so the cut sits on the replay lattice, not on last-ulp float
    order.

    Scale posture: the position pair stage is an equality join on
    (doc, position) with fanout exactly ``window`` per token — never
    doc-length²; the vocabulary gate broadcasts (bounded by
    construction); pagerank then iterates on a ≤``vocab_size``-node
    graph. One corpus tokenize pass feeds both the gate and the pairs
    (cached projection).

    Returns (rk, token, score)."""
    from paqarin_spark.operators.graph import pagerank

    if vocab_size < 2 or window < 1 or top_k < 1:
        raise ValueError("vocab_size >= 2, window >= 1, top_k >= 1 required")
    pos = (
        df.select(
            F.col(id_column).alias("_doc"),
            F.posexplode(
                F.split(normalized_text(F.col(text_column)), " ")
            ).alias("_pos", "_tok"),
        )
        .where(F.col("_tok") != "")
        .persist()
    )
    vocab = (
        pos.select("_doc", "_tok")
        .distinct()
        .groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    # orderBy+limit plans TakeOrderedAndProject (per-partition partial
    # top-k, then one bounded merge) — a row_number window here would
    # single-partition-sort the whole corpus vocabulary
    gate = (
        vocab.orderBy(F.desc("_df"), F.asc("_tok"))
        .limit(vocab_size)
        .select("_tok")
    )
    cand = pos.join(F.broadcast(gate), on="_tok").select(
        "_doc", "_pos", "_tok"
    )
    left = cand.select(
        "_doc",
        F.col("_tok").alias("_ta"),
        F.explode(
            F.sequence(F.col("_pos") + 1, F.col("_pos") + window)
        ).alias("_p2"),
    )
    right = cand.select(
        "_doc", F.col("_pos").alias("_p2"), F.col("_tok").alias("_tb")
    )
    und = (
        left.join(right, on=["_doc", "_p2"])
        .where(F.col("_ta") != F.col("_tb"))
        .select(
            F.least("_ta", "_tb").alias("_u"),
            F.greatest("_ta", "_tb").alias("_v"),
        )
        .groupBy("_u", "_v")
        .agg(F.count(F.lit(1)).alias("_w"))
    )
    # localCheckpoint BEFORE the iteration, not just persist: pagerank
    # re-PLANS its loop state every round, and Catalyst planning over
    # this build's join/explode subtree costs ~10x the execution
    # (measured 45s -> 4s at sf0.001). Checkpointing truncates the
    # lineage to a scan; the graph is vocab-bounded so the
    # materialization is small.
    edges = und.unionByName(
        und.select(
            F.col("_v").alias("_u"), F.col("_u").alias("_v"), "_w"
        )
    ).localCheckpoint()
    pos.unpersist()
    ranks = pagerank(
        edges, src="_u", dst="_v", weight="_w",
        iterations=iterations, damping=0.85,
    )
    wr = Window.orderBy(F.desc("score"), F.asc("token"))
    return (
        ranks.select(
            F.col("node").alias("token"),
            F.round("rank", 6).alias("score"),
        )
        .select(
            F.row_number().over(wr).alias("rk"), "token", "score"
        )
        .where(F.col("rk") <= top_k)
        .orderBy("rk")
    )


def kn_bigram_doc_scores(
    df: DataFrame,
    id_column: str,
    text_column: str,
    discount: float = 0.75,
) -> DataFrame:
    """Per-document cross-entropy under an interpolated KNESER-NEY
    bigram language model trained on the corpus itself — the honest
    analogue of the KenLM perplexity gate CCNet-style pipelines run
    (Wenzek et al. 2020), upgrading tx34's add-k smoothing with the
    absolute-discount + continuation-probability backoff that made KN
    the standard n-gram smoother:

        P(w2|w1) = max(c(w1w2) − D, 0)/c(w1)
                   + (D · N1+(w1·)/c(w1)) · (N1+(·w2)/T)

    where N1+(w1·)/N1+(·w2) count distinct continuations/histories
    and T is the total distinct-bigram count. D defaults to 0.75
    (exact binary, so the discounted numerator is exact in doubles).

    Determinism: each bigram's −ln P evaluates the formula above with
    a FIXED operation order (both engines run identical IEEE double
    ops), is rounded 12dp and summed in decimal(38,12) — per-doc
    scores are partition-order-independent, unlike a raw double SUM.

    Scale shape: one token-keyed shuffle builds the bigram table; all
    model tables (c1, N1+ forward/backward) are vocabulary-sized
    partial aggregations derived from it; the score join is keyed on
    the bigram/token — the tx25/tx34 posture, fine at 100 TB with an
    unbounded vocabulary (no broadcasts of token tables).

    Output: (id, n_bigrams, cross_entropy[9dp]) — docs with fewer
    than 2 tokens have no bigrams and no row.
    """
    if not (0.0 < discount < 1.0):
        raise ValueError(f"discount must be in (0,1), got {discount}")
    toks = df.select(
        F.col(id_column),
        F.posexplode(tokens(F.col(text_column))).alias("pos", "token"),
    )
    w = Window.partitionBy(id_column).orderBy("pos")
    bi = toks.select(
        F.col(id_column),
        F.lag("token").over(w).alias("prev"),
        F.col("token").alias("cur"),
    ).where(F.col("prev").isNotNull())
    c2 = bi.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("_c2"))
    # context totals, forward continuations N1+(w1.), and backward
    # histories N1+(.w2) all derive from the unique-bigram table —
    # one groupBy each, vocabulary-sized results
    c1 = c2.groupBy("prev").agg(
        F.sum("_c2").alias("_c1"), F.count(F.lit(1)).alias("_n1p")
    )
    cont = c2.groupBy("cur").agg(F.count(F.lit(1)).alias("_cont"))
    t_types = c2.agg(F.count(F.lit(1)).cast("double").alias("_t"))
    d = float(discount)
    p = (
        F.greatest(F.col("_c2") - F.lit(d), F.lit(0.0)) / F.col("_c1")
        + (F.lit(d) * F.col("_n1p") / F.col("_c1"))
        * (F.col("_cont") / F.col("_t"))
    )
    term = F.round(-F.log(p), 12).cast("decimal(38,12)")
    scored = (
        bi.join(c2, ["prev", "cur"])
        .join(c1, "prev")
        .join(cont, "cur")
        .crossJoin(F.broadcast(t_types))
    )
    return (
        scored.groupBy(id_column)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(term).cast("double") / F.count(F.lit(1)), 9
            ).alias("cross_entropy"),
        )
    )


def dsir_weights(
    docs: DataFrame,
    id_column: str,
    text_column: str,
    target_column: str,
) -> DataFrame:
    """Data Selection via Importance Resampling weights (Xie et al.,
    NeurIPS 2023): per-document log importance weight

        log w(d) = Σ_tok c_d(tok) · [ln p_tgt(tok) − ln p_raw(tok)]

    under add-one-smoothed unigram LMs fit on the TARGET subset
    (``target_column`` true) and the full RAW corpus, both smoothed
    over the joint vocabulary — the cheap hashed-feature variant of
    the fastText-classifier gate: upweight documents that look like
    the target domain, then resample ∝ softmax(log w).

    The reference pipeline has no learned selection stage
    (paqarin/preprocessing.py is schema plumbing); this is north-star
    LLM-pipeline surface. Scale shape: one (doc, token) rollup, one
    vocabulary-keyed aggregation (partial-agg bounded by vocab), one
    token-keyed join back, one doc rollup — the tx25 two-pass plan
    with a 1-row totals broadcast. Documents with zero tokens carry
    no evidence and are absent from the output (stated, not hidden).

    Output: (id, n_tokens, log_weight[raw double]).
    """
    toks = docs.select(
        F.col(id_column).alias("_id"),
        F.col(target_column).cast("boolean").alias("_tgt"),
        F.explode(tokens(F.col(text_column))).alias("token"),
    )
    per_doc = toks.groupBy("_id", "_tgt", "token").agg(
        F.count(F.lit(1)).alias("_c")
    )
    vocab = per_doc.groupBy("token").agg(
        F.sum("_c").alias("_c_raw"),
        F.sum(F.when(F.col("_tgt"), F.col("_c")).otherwise(0)).alias(
            "_c_tgt"
        ),
    )
    totals = vocab.agg(
        F.sum("_c_raw").alias("_n_raw"),
        F.sum("_c_tgt").alias("_n_tgt"),
        F.count(F.lit(1)).alias("_v"),
    )
    # Each per-token term is rounded 12dp and summed in
    # decimal(38,12) (the kn_bigram discipline): a raw double SUM is
    # partial-aggregation-order-dependent across Spark partitions and
    # vs DuckDB's sequential SUM, and the value feeds both the
    # rounded output and the Gumbel-top-k cutoff downstream, where a
    # last-ulp flip would change the selection.
    llr = F.round(
        F.col("_c").cast("double")
        * (
            F.log(F.col("_c_tgt") + F.lit(1))
            - F.log(F.col("_n_tgt") + F.col("_v"))
            - F.log(F.col("_c_raw") + F.lit(1))
            + F.log(F.col("_n_raw") + F.col("_v"))
        ),
        12,
    ).cast("decimal(38,12)")
    return (
        per_doc.join(vocab, "token")
        .crossJoin(F.broadcast(totals))
        .groupBy("_id")
        .agg(
            F.sum("_c").cast("long").alias("n_tokens"),
            F.sum(llr).cast("double").alias("log_weight"),
        )
        .select(F.col("_id").alias(id_column), "n_tokens", "log_weight")
    )


def dsir_resample(
    weighted: DataFrame,
    id_column: str,
    log_weight_column: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Gumbel-top-k resampling from DSIR log weights: key =
    log w + Gumbel(0,1) drawn as −ln(−ln(u)) from the portable md5
    uniform — an exact without-replacement sample ∝ softmax(log w),
    deterministic under any layout (the tx35 exponential-clocks
    discipline, in Gumbel form because weights arrive in log space).
    The global sort sees only (id, key) pairs (TakeOrderedAndProject).
    """
    u = _uniform_hash(
        F.lit("dsir"),
        F.col(id_column).cast("string"),
        F.lit(str(seed)),
    )
    key = F.col(log_weight_column) - F.log(-F.log(u))
    return (
        weighted.select(
            F.col(id_column),
            key.alias("_key"),
        )
        .orderBy(F.desc("_key"), id_column)
        .limit(k)
        .select(id_column)
    )
