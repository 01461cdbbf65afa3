"""Dedup operators: keep-first (op E2 golden,
`/root/reference/tests/test_univariate_metrics.py:33-87` pins the
observable drop-later-duplicates behavior) and the LLM-pipeline
dedup family invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paqarin_spark.operators import (
    exact_duplicates,
    keep_first,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from paqarin_spark.operators.dedup import word_shingles


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup
        (4, "completely different text about spark engines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keep_first(spark):
    rows = [
        ("a", 1, 100.0),
        ("a", 1, 200.0),  # duplicate key, arrives later
        ("a", 2, 300.0),
    ]
    df = spark.createDataFrame(rows, "item string, ts long, v double")
    out = keep_first(df, ["item", "ts"], ["v"]).collect()
    got = sorted((r["item"], r["ts"], r["v"]) for r in out)
    assert got == [("a", 1, 100.0), ("a", 2, 300.0)]


def test_exact_duplicates(docs):
    out = exact_duplicates(docs, "text", "doc_id").collect()
    by_keep = {r["keep_id"]: r["dup_count"] for r in out}
    assert by_keep == {1: 2, 3: 1, 4: 1}


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "t string")
    out = df.select(word_shingles(F.col("t"), 2).alias("s")).collect()[0]["s"]
    assert sorted(out) == ["a b", "b c", "c d"]


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.3).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(1, 2)] == 1.0  # exact dup
    assert (1, 3) in got and 0.3 <= got[(1, 3)] < 1.0
    assert all(b != 4 and a != 4 for a, b in got)


def test_ngram_jaccard_df_cap_prunes_stop_shingles(spark):
    # 6 docs all share the viral shingle "the quick fox"; docs 1/2 also
    # share a rare shingle. With the cap below 6 the viral shingle is
    # pruned from the join, so only the rare-shingle pair survives and
    # its `common` count excludes the stop-shingle.
    rows = [(i, "the quick fox jumps over obstacle%d wall%d gate%d" % (i, i, i)) for i in range(3, 9)]
    rows += [(1, "the quick fox likes green tea"), (2, "the quick fox likes green tea")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.1).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", n=3, threshold=0.1, max_doc_frequency=5
        ).collect()
    }
    assert (1, 2) in capped
    # every cross-pair that only met via the viral shingle is gone
    assert capped < uncapped
    assert all(a in (1, 2) and b in (1, 2) for a, b in capped)


def test_minhash_identical_docs_identical_signatures(docs):
    sigs = {r["doc"]: (r["mh_0"], r["mh_1"]) for r in minhash_signatures(docs, "text", "doc_id", num_hashes=2).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_minhash_lsh_pairs_exact_dups_collide(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=4, band_size=2).collect()
    }
    assert (1, 2) in pairs
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_simhash_deterministic_and_near(docs):
    hashes = {r["doc"]: r["simhash"] for r in simhash(docs, "text", "doc_id").collect()}
    assert hashes[1] == hashes[2]  # identical text -> identical fingerprint

    def hamming(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    # near-dup pair closer than unrelated pair
    assert hamming(hashes[1], hashes[3]) < hamming(hashes[1], hashes[4])


def test_duplicate_clusters_components(spark):
    from paqarin_spark.operators import duplicate_clusters

    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    # separate pair {10, 11}, triangle {20, 21, 22}
    pairs = spark.createDataFrame(
        [
            (2, 1), (2, 3), (3, 4),
            (10, 11),
            (20, 21), (21, 22), (20, 22),
        ],
        "id_a long, id_b long",
    )
    got = {
        r["doc"]: r["cluster_rep"] for r in duplicate_clusters(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_duplicate_clusters_star_matches_label(spark):
    from paqarin_spark.operators import duplicate_clusters

    # Adversarial shape for label propagation: a 40-node chain
    # (diameter 39) with shuffled ids, plus a clique and a pair.
    # Star must produce the identical (doc, cluster_rep) map while
    # converging in O(log^2) rounds — max_iterations=8 would make
    # diameter-bound propagation fail, so passing proves the round
    # complexity, not just the output.
    ids = [(i * 17) % 40 + 100 for i in range(40)]  # permuted chain ids
    chain = [(ids[i], ids[i + 1]) for i in range(39)]
    extra = [(1, 2), (2, 3), (1, 3), (50, 51)]
    pairs = spark.createDataFrame(chain + extra, "id_a long, id_b long")
    label = {
        r["doc"]: r["cluster_rep"]
        for r in duplicate_clusters(pairs, max_iterations=60).collect()
    }
    star = {
        r["doc"]: r["cluster_rep"]
        for r in duplicate_clusters(
            pairs, max_iterations=8, algorithm="star"
        ).collect()
    }
    assert star == label
    assert set(star.values()) == {100, 1, 50}
    # Min-neighbor contraction: same map in O(log n) rounds — 8 rounds
    # on a 40-node chain again proves the round complexity.
    contract = {
        r["doc"]: r["cluster_rep"]
        for r in duplicate_clusters(
            pairs, max_iterations=8, algorithm="contract"
        ).collect()
    }
    assert contract == label


def test_duplicate_clusters_contract_self_pairs(spark):
    from paqarin_spark.operators import duplicate_clusters

    # self-pair-only docs come back as their own trivial clusters
    pairs = spark.createDataFrame(
        [(7, 7), (1, 2)], "id_a long, id_b long"
    )
    got = {
        r["doc"]: r["cluster_rep"]
        for r in duplicate_clusters(pairs, algorithm="contract").collect()
    }
    assert got == {7: 7, 1: 1, 2: 1}


def test_duplicate_clusters_rejects_unknown_algorithm(spark):
    import pytest

    from paqarin_spark.operators import duplicate_clusters

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="label|star"):
        duplicate_clusters(pairs, algorithm="bogus")


def test_simhash_pairs_validates_banding(spark):
    from paqarin_spark.operators import simhash_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError):
        simhash_pairs(docs, "text", "doc_id", max_hamming=4, n_bands=4)
    # identical docs: hamming 0, exactly one pair
    out = simhash_pairs(docs, "text", "doc_id").collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in out] == [(1, 2, 0)]


def test_contamination_check_flags_benchmark_overlap(spark):
    from paqarin_spark.operators import contamination_check

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark 3-gram "beta gamma delta"
            (1, "zero beta gamma delta nine eight"),
            # token overlap but no shared 3-gram
            (2, "alpha nine gamma eight epsilon seven"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in contamination_check(
            corpus, bench, "text", "doc_id", n=3
        ).collect()
    }
    assert out[1]["n_contaminated"] == 1  # exactly "beta gamma delta"
    assert out[1]["n_shingles"] == 4
    assert out[1]["contamination_ratio"] == 0.25
    assert out[2]["n_contaminated"] == 0
    assert out[2]["contamination_ratio"] == 0.0


def test_duplicate_spans_counts_multiplicity(spark):
    from paqarin_spark.operators import duplicate_spans

    df = spark.createDataFrame(
        [
            # "a b" appears TWICE in doc 1 (positions 0 and 2) and once
            # in doc 2 -> both doc-1 occurrences count as duplicated
            (1, "a b a b"),
            (2, "a b c"),
            (3, "x y z"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in duplicate_spans(df, "text", "doc_id", n=2).collect()
    }
    assert out[1]["n_spans"] == 3  # "a b", "b a", "a b"
    assert out[1]["n_dup_spans"] == 2
    assert out[2]["n_dup_spans"] == 1
    assert out[3]["n_dup_spans"] == 0
    assert out[3]["dup_span_ratio"] == 0.0


def test_containment_pairs_asymmetric(spark):
    from paqarin_spark.operators import containment_pairs

    # doc 2 is a snippet fully contained in doc 1; Jaccard would be
    # ~3/8 but containment(2 -> 1) is 1.0
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "c d e f g"),
            (3, "x y z w v u"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["id_small"], r["id_large"]): r["containment"]
        for r in containment_pairs(df, "text", "doc_id", n=3, threshold=0.9).collect()
    }
    assert out == {(2, 1): 1.0}  # only the contained direction passes


def test_duplicate_clusters_contract_monotone_chain(spark):
    from paqarin_spark.operators import duplicate_clusters

    # Monotone-ascending chain ids are the ADVERSARIAL case for
    # min-neighbor contraction (each round removes only ~1 node), so
    # max_iterations=5 on a 60-node chain forces the star fallback;
    # the composed mapping must still put every node in cluster 0.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], "id_a long, id_b long"
    )
    got = {
        r["doc"]: r["cluster_rep"]
        for r in duplicate_clusters(
            pairs, max_iterations=5, algorithm="contract"
        ).collect()
    }
    assert got == {i: 0 for i in range(60)}


def test_ingest_novelty_verdicts(spark):
    from paqarin_spark.operators import ingest_novelty

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
            (11, "one two three four nine ten eleven"),   # shares a prefix
            (12, "wholly unrelated words appear here now"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in ingest_novelty(
            batch, corpus, "text", "doc_id", n=3, near_threshold=0.4
        ).collect()
    }
    assert out[10]["verdict"] == "exact_dup"
    assert out[11]["verdict"] == "near_dup"  # 2 of 5 trigrams shared = 0.4
    assert out[11]["containment"] == pytest.approx(0.4)
    assert out[12]["verdict"] == "novel"
    assert out[12]["containment"] == 0.0


def test_duplicate_clusters_label_finishes_past_budget(spark):
    """A chain deeper than max_iterations must NOT return a partial
    labeling: the label path detects the missed fixpoint and finishes
    the contracted residual on the star algorithm (ADVICE r4)."""
    from paqarin_spark.operators import duplicate_clusters

    n = 40  # diameter 39 >> 3 rounds of min-label propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    got = {
        r["doc"]: r["cluster_rep"]
        for r in duplicate_clusters(pairs, max_iterations=3).collect()
    }
    assert got == {i: 0 for i in range(n + 1)}


def test_duplicate_clusters_star_raises_on_exhausted_budget(spark):
    """Star is the shape-independent finisher — if ITS budget runs out
    it must fail loudly, never return a partial star forest."""
    import pytest

    from paqarin_spark.operators import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        duplicate_clusters(pairs, max_iterations=1, algorithm="star").collect()


def test_fuzzy_pairs_blocking_is_exact_for_distance_one(spark):
    """Deletion-neighborhood blocking finds exactly the levenshtein<=1
    pairs: equal, substitution, and insert/delete cases all share a
    block; distance-2 strings do not pair."""
    from paqarin_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "kitten"), (2, "sitten"),  # substitution
            (3, "sittin"),                 # d2 from kitten, d1 from sitten
            (4, "kitten"),                 # duplicate (d0)
            (5, "itten"),                  # deletion
            (6, "xyz"), (7, ""),           # unrelated / empty
        ],
        "id long, s string",
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs(df, "s", "id").collect()
    )
    assert got == [
        (1, 2, 1), (1, 4, 0), (1, 5, 1),
        (2, 3, 1), (2, 4, 1), (2, 5, 1),
        (4, 5, 1),
    ]


def test_fuzzy_pairs_block_frequency_cap_and_validation(spark):
    import pytest

    from paqarin_spark.operators.dedup import fuzzy_pairs

    # 50 strings all one deletion from "aa...a": the hot block emits
    # O(df^2) candidates; the cap drops it (recall traded for bound)
    rows = [(i, "a" * 10) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, s string")
    capped = fuzzy_pairs(df, "s", "id", max_block_frequency=10).count()
    assert capped == 0
    uncapped = fuzzy_pairs(df, "s", "id").count()
    assert uncapped == 50 * 49 // 2
    with pytest.raises(ValueError, match="max_distance"):
        fuzzy_pairs(df, "s", "id", max_distance=3)


def test_dedup_lines_keep_first_global(spark):
    """Keep-first contract: the first global occurrence (doc id, then
    line position) of a normalized line survives; every later
    occurrence — in the SAME doc or a later one — is dropped. A tail
    shorter than words_per_line is not a line."""
    from paqarin_spark.operators import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "a b c d x y"),          # line 'a b' kept; 'c d' kept; 'x y' kept; tail none
            (2, "a b a b e f"),          # 'a b' dup (doc1 pos0); second 'a b' dup too; 'e f' kept
            (3, "E F g"),                # 'e f' (normalized) dup of doc2; tail 'g' ignored
        ],
        "doc_id int, text string",
    )
    rows = dedup_lines(docs, "text", "doc_id", words_per_line=2).collect()
    flags = {(r["doc_id"], r["line_pos"]): r["kept"] for r in rows}
    assert flags == {
        (1, 0): True,   # a b — first global
        (1, 1): True,   # c d
        (1, 2): True,   # x y
        (2, 0): False,  # a b repeat
        (2, 1): False,  # a b repeat (within-doc second occurrence)
        (2, 2): True,   # e f — first
        (3, 0): False,  # E F normalizes to e f — repeat
    }
    keys = {r["line_key"] for r in rows}
    assert "e f" in keys and "E F".lower() in keys

    with pytest.raises(ValueError):
        dedup_lines(docs, "text", "doc_id", words_per_line=0)


def test_fuzzy_pairs_duplicate_ids_collapse_to_min_dist(spark):
    """Ids carrying several distinct strings emit ONE row per
    (id_a, id_b) at the minimum qualifying distance — the documented
    one-row-per-pair contract holds even without unique ids."""
    from paqarin_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "abc"), (1, "abd"),   # id 1 twice, different strings
            (2, "abc"),               # d0 vs "abc", d1 vs "abd"
        ],
        "id long, s string",
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs(df, "s", "id").collect()
    )
    assert got == [(1, 2, 0)]


def test_duplicate_substring_spans_maximal_islands(spark):
    """Two docs share a 10-token passage -> with min_tokens=4 each doc
    reports ONE maximal span covering exactly the shared passage; a
    separate repeat inside one doc also counts (within-doc repeats
    duplicate, as in Lee et al.'s suffix array)."""
    from paqarin_spark.operators import duplicate_substring_spans

    shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} aa bb cc dd"),
            (2, f"xx yy zz qq {shared}"),
            # within-doc repeat of a 4-gram: "p1 p2 p3 p4" twice
            (3, "p1 p2 p3 p4 mm nn oo pp p1 p2 p3 p4"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in duplicate_substring_spans(
            docs, "text", "doc_id", min_tokens=4
        ).collect()
    )
    assert got == [
        (1, 0, 9, 10),    # shared passage at head
        (2, 4, 13, 10),   # shared passage at tail
        (3, 0, 3, 4),     # first within-doc repeat
        (3, 8, 11, 4),    # second within-doc repeat
    ]


def test_duplicate_substring_spans_merges_adjacent_runs(spark):
    """Anchors whose coverage touches merge into one island even when
    the duplicated content comes from DIFFERENT partner docs."""
    from paqarin_spark.operators import duplicate_substring_spans

    docs = spark.createDataFrame(
        [
            (1, "a1 a2 a3 a4 b1 b2 b3 b4"),  # a-run dup with 2, b-run with 3
            (2, "a1 a2 a3 a4"),
            (3, "b1 b2 b3 b4"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_substring_spans(
            docs, "text", "doc_id", min_tokens=4
        ).collect()
    )
    # doc 1: anchors at 0 (a-run) and 4 (b-run); gap 4 == n -> merge
    assert got == [(1, 0, 7), (2, 0, 3), (3, 0, 3)]


def test_strip_duplicate_substrings_keep_first(spark):
    """The globally-first occurrence (doc id, then position) keeps its
    text; later occurrences lose the covered tokens. Docs without
    duplicates (or shorter than n tokens) pass through untouched."""
    import hashlib

    from paqarin_spark.operators import strip_duplicate_substrings

    shared = "w1 w2 w3 w4 w5"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} tail1 tail2"),
            (2, f"head1 head2 {shared}"),
            (3, "solo1 solo2 solo3"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_md5"])
        for r in strip_duplicate_substrings(
            docs, "text", "doc_id", min_tokens=4
        ).collect()
    }

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert out[1] == (7, 0, h("w1 w2 w3 w4 w5 tail1 tail2"))
    assert out[2] == (7, 5, h("head1 head2"))
    assert out[3] == (3, 0, h("solo1 solo2 solo3"))


def test_strip_duplicate_substrings_full_removal_and_validation(spark):
    """A doc that is entirely a later copy hashes to md5('')."""
    import hashlib

    import pytest

    from paqarin_spark.operators import strip_duplicate_substrings

    docs = spark.createDataFrame(
        [(1, "c1 c2 c3 c4"), (2, "c1 c2 c3 c4")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_removed"], r["clean_md5"])
        for r in strip_duplicate_substrings(
            docs, "text", "doc_id", min_tokens=4
        ).collect()
    }
    assert out[1] == (0, hashlib.md5(b"c1 c2 c3 c4").hexdigest())
    assert out[2] == (4, hashlib.md5(b"").hexdigest())
    with pytest.raises(ValueError, match="min_tokens"):
        strip_duplicate_substrings(docs, "text", "doc_id", min_tokens=1)


def test_winnowing_guarantee_and_density(spark):
    """The Schleimer et al. guarantee: two documents sharing a token
    run of length >= w+k-1 (= 6 at k=3, w=4) share at least one
    fingerprint VALUE; unrelated documents share none; and the
    selected set is much denser than 1 but far sparser than the
    k-gram count (~2/(w+1))."""
    from paqarin_spark.operators import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 shared tokens
    rows = [
        (1, "intro text here " + shared + " closing remarks one"),
        (2, "totally different opening " + shared + " and more words"),
        (3, "nothing in common with either of the other documents"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnowing_fingerprints(df, "text", "doc_id", k=3, w=4)
    by_doc: dict = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2], "shared 6-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    # density upper bound is structural: docs have 12/12/9 tokens ->
    # 10/10/7 k-grams -> 7/7/4 full windows, so at most that many
    # distinct window minima can be selected per doc
    max_fps = {1: 7, 2: 7, 3: 4}
    for d, s in by_doc.items():
        assert 1 <= len(s) <= max_fps[d], (d, len(s))


def test_derived_band_bits_tracks_log2_of_corpus():
    from paqarin_spark.operators import derived_band_bits

    # floor at the legacy 15-bit layout for small corpora
    assert derived_band_bits(100) == 15
    assert derived_band_bits(16_000) == 15
    # past 2^14 docs the width must grow with log2(n) to keep random
    # band collisions (~n^2 / 2^width) sub-quadratic
    assert derived_band_bits(1_000_000) == 21
    assert derived_band_bits(1_000_000_000) == 31
    # one md5 word per band caps the width
    assert derived_band_bits(2**70) == 60
    # monotone non-decreasing in n
    widths = [derived_band_bits(2**k) for k in range(1, 64)]
    assert widths == sorted(widths)


def test_simhash_pairs_chunked_4x15_matches_legacy(spark):
    from paqarin_spark.operators import simhash_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "alpha beta gamma delta zeta"),
            (4, "completely different words entirely here"),
        ],
        "doc_id long, text string",
    )
    legacy = sorted(
        map(tuple, simhash_pairs(docs, "text", "doc_id").collect())
    )
    chunked = sorted(
        map(tuple, simhash_pairs(docs, "text", "doc_id", band_bits=15).collect())
    )
    # the 4x15 chunked layout draws every bit from md5 word 0 exactly
    # like the legacy single-long fingerprint — results are identical
    assert chunked == legacy
    assert legacy and legacy[0][:2] == (1, 2)


def test_simhash_candidate_count_reports_band_layout(spark):
    from paqarin_spark.operators import simhash_candidate_count

    docs = spark.createDataFrame(
        [(i, f"common tokens shared {i % 2}") for i in range(6)],
        "doc_id long, text string",
    )
    stats = simhash_candidate_count(docs, "text", "doc_id")
    assert stats["n_docs"] == 6
    assert stats["n_bands"] == 4
    assert stats["band_bits"] == 15
    # near-identical docs collide: candidates >= the 2x3-doc cliques
    assert stats["n_candidates"] >= 6
