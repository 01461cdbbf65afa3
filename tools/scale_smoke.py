"""Scale smoke: run the core operators on spark.range-generated data
orders of magnitude beyond the sf0.1 bench tables, asserting closed-form
row-count invariants and printing throughput. This is the local stand-in
for the 1000-executor question — does the plan shape survive a 100×
scale-up — not a replacement for the driver's testdata surface.

Usage: python tools/scale_smoke.py [n_events] [n_entities]
       (default 20,000,000 events across 100,000 entities)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from paqarin_spark.operators import (  # noqa: E402
    add_surrogate_key,
    asof_join,
    calendar_fill,
    duplicate_clusters,
    keep_first,
    range_point_join,
    sessionize,
    sliding_windows,
    tail_trim,
    time_bucket_sum,
)
from paqarin_spark.operators.dedup import ngram_jaccard_pairs  # noqa: E402
from paqarin_spark.operators.similarity import (  # noqa: E402
    cosine_dedup_pairs_bucketed,
)
from paqarin_spark.schema import TimeSeriesSchema  # noqa: E402
from paqarin_spark.session import get_session  # noqa: E402

SCHEMA = TimeSeriesSchema(
    item_id_columns=("entity",),
    timestamp_column="ts",
    value_columns=("value",),
    frequency="D",
    order_columns=("rid",),
)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    entities = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    days = 365
    spark = get_session("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    # Deterministic synthetic stream: entity = id % E, day = (id // E) % D
    # -> every entity has ceil-ish n/E rows over a dense daily calendar.
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("rid"),
            (F.col("id") % entities).alias("entity"),
            F.timestamp_seconds(
                F.lit(1_600_000_000) + ((F.col("id") / entities).cast("long") % days) * 86_400
            ).alias("ts"),
            (F.pmod(F.col("id") * 2_654_435_761, F.lit(1_000_000)) / 1000.0).alias(
                "value"
            ),
        )
    )
    rows_per_entity = n // entities  # exact when entities divides n

    checks = []

    def timed(name, df, expect=None):
        t0 = time.perf_counter()
        got = df.count()
        dt = time.perf_counter() - t0
        status = "ok" if (expect is None or got == expect) else f"EXPECTED {expect}"
        checks.append(status == "ok")
        print(f"{name:24} {dt:7.1f}s  rows={got:>12,}  [{status}]")

    assert n % entities == 0, "pick entities dividing n for exact invariants"

    timed("daily bucket sum", time_bucket_sum(ev, SCHEMA), entities * min(days, rows_per_entity))
    timed(
        "calendar gap fill",
        calendar_fill(ev, SCHEMA, fill_value=0.0),
        entities * min(days, rows_per_entity),
    )
    timed(
        "keep-first dedup",
        keep_first(ev, ["entity", "ts"], ["rid"]),
        entities * min(days, rows_per_entity),
    )
    timed("tail trim (p=7)", tail_trim(ev, SCHEMA, prediction_length=7), n - entities * 7)
    L = 8
    timed(
        "sliding windows L=8",
        sliding_windows(ev, SCHEMA, sequence_length=L),
        entities * (rows_per_entity - L + 1),
    )
    timed("surrogate keys", add_surrogate_key(ev, ["entity"], ["ts", "rid"]), n)

    # Two-level exact global rank (q57/tx34/ev27 + ev30's gap/cum
    # discipline): rank all n rows with NO global sort and verify
    # bijectivity in closed form — Σrank = n(n+1)/2 catches any
    # duplicated or skipped rank; the equal-width leading-key buckets
    # here are adversarially SKEWED (value has only 1e6 distinct
    # candidates over 20M rows).
    from paqarin_spark.operators.windows import distributed_rank

    t0 = time.perf_counter()
    rk = distributed_rank(
        ev.select("value", "rid"), ["value", "rid"], rank_column="rk"
    )
    got = rk.agg(
        F.sum("rk").alias("s"), F.count(F.lit(1)).alias("c")
    ).collect()[0]
    dt = time.perf_counter() - t0
    rank_sum = got["s"]
    n_ranked = got["c"]
    ok = rank_sum == n * (n + 1) // 2 and n_ranked == n
    checks.append(ok)
    print(
        f"{'distributed rank':24} {dt:7.1f}s  rows={n_ranked:>12,}  "
        f"[{'ok' if ok else f'EXPECTED sum {n * (n + 1) // 2}, got {rank_sum}'}]"
    )

    # As-of join: every left row survives (left-join contract), one
    # shuffle on the key regardless of history length.
    daily = time_bucket_sum(ev, SCHEMA, bucket_column="bucket").select(
        "entity", "bucket", F.col("value").alias("day_sum")
    )
    # Filter on the filled payload so column pruning cannot skip the
    # window-fill computation the count is meant to exercise; every
    # event's day exists in `daily`, so all matches are non-null.
    timed(
        "as-of join vs daily",
        asof_join(
            ev.select("rid", "entity", "ts"),
            daily,
            on=["entity"],
            left_ts="ts",
            right_ts="bucket",
        ).where(F.col("day_sum").isNotNull()),
        n,
    )

    # Sessionization: distinct days per entity = one session each at a
    # sub-day gap (events within a day share a timestamp).
    timed(
        "sessionize (1h gap)",
        sessionize(ev, "entity", "ts", gap_seconds=3600)
        .select("entity", "session_id")
        .distinct(),
        entities * min(days, rows_per_entity),
    )

    # Binned range join: one [day0, day1) interval per entity matches
    # exactly the day-0 events; interval replication is bounded by
    # ceil(interval/bin)+1 = 2.
    intervals = ev.where((F.col("rid") / entities).cast("long") % days == 0).select(
        "entity",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("stop"),
    ).distinct()
    timed(
        "binned range join",
        range_point_join(
            ev.select("rid", "entity", "ts"),
            intervals,
            on=["entity"],
            point="ts",
            range_start="start",
            range_end="stop",
            bin_width_seconds=86_400,
        ),
        entities * -(-rows_per_entity // days),  # ceil: day-0 rows per entity
    )

    # Star connected components on the adversarial shape for label
    # propagation: C disjoint chains of K/C nodes (diameter K/C-1,
    # where diameter-bound propagation would need K/C shuffle rounds;
    # star needs O(log^2)). Closed form: every node labeled, exactly C
    # components, reps = the chain minima {0..C-1}.
    K = min(max(n // 20, 10_000), 1_000_000)
    C = 100
    chain_pairs = spark.range(K - C).select(
        F.col("id").alias("id_a"), (F.col("id") + C).alias("id_b")
    )
    t0 = time.perf_counter()
    clusters = duplicate_clusters(chain_pairs, algorithm="star", max_iterations=40)
    got_rows = clusters.count()
    got_reps = clusters.select("cluster_rep").distinct().count()
    dt = time.perf_counter() - t0
    ok = got_rows == K and got_reps == C
    checks.append(ok)
    print(
        f"{'star CC (chains)':24} {dt:7.1f}s  rows={got_rows:>12,}  "
        f"[{'ok' if ok else f'EXPECTED {K} rows / {C} reps, got {got_reps} reps'}]"
    )

    # Hot-shingle Jaccard: 10k docs all sharing one viral trigram, each
    # with a private trigram pair shared with exactly one neighbor.
    # Uncapped, the viral shingle alone would emit ~50M join rows; the
    # df-cap prunes it so the self-join only meets on the private
    # shingles — expected pairs = the 5k neighbor pairs.
    D = 10_000
    docs = spark.range(D).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("viral shingle here unique"),
            (F.col("id") / 2).cast("long").cast("string"),
            F.lit(" pairtoken"),
            (F.col("id") / 2).cast("long").cast("string"),
            F.lit(" tail"),
        ).alias("text"),
    )
    t0 = time.perf_counter()
    got_pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.3, max_doc_frequency=100
    ).count()
    dt = time.perf_counter() - t0
    ok = got_pairs == D // 2
    checks.append(ok)
    print(
        f"{'jaccard df-cap (viral)':24} {dt:7.1f}s  rows={got_pairs:>12,}  "
        f"[{'ok' if ok else f'EXPECTED {D // 2}'}]"
    )

    # Embedding near-dup at 2M vectors through the LSH-bucketed scale
    # path: ids 2k/2k+1 share one identical 16-dim vector (cos = 1.0,
    # and identical vectors share every LSH bucket bit, so recall on
    # them is exact); distinct base vectors are hash-generated centered
    # components whose cross cosines concentrate near 0 — none can
    # reach the 0.999999 threshold. Expected pairs = exactly V/2, the
    # driver never sees a vector.
    V = max(2_000_000, n // 10)
    dim16 = 16
    vecs = spark.range(V).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    F.pmod(
                        F.xxhash64((F.col("id") / 2).cast("long"), F.lit(j)),
                        F.lit(1000),
                    )
                    / 1000.0
                    - 0.5
                )
                for j in range(dim16)
            ]
        ).alias("embedding"),
    )
    t0 = time.perf_counter()
    got_dups = cosine_dedup_pairs_bucketed(
        vecs, "vec_id", "embedding", threshold=0.999999, num_planes=12, dim=dim16
    ).count()
    dt = time.perf_counter() - t0
    ok = got_dups == V // 2
    checks.append(ok)
    print(
        f"{'bucketed embed dedup':24} {dt:7.1f}s  rows={got_dups:>12,}  "
        f"[{'ok' if ok else f'EXPECTED {V // 2}'}]"
    )

    # Multi-probe IVF at the same vector scale: identical twin vectors
    # always share a home cell (identical sims to every centroid), so
    # every vector's top-1 neighbor has cos_sim 1.0 regardless of the
    # quantization. num_cells sized so a cell's candidate matmul stays
    # ~500x1000 — the per-cell work shape that holds at any corpus size.
    from paqarin_spark.operators.similarity import ivf_topk

    t0 = time.perf_counter()
    got_twins = (
        ivf_topk(
            vecs, "vec_id", "embedding", k=1, num_cells=4096, nprobe=2
        )
        .where(F.col("cos_sim") >= 0.999999)
        .count()
    )
    dt = time.perf_counter() - t0
    ok = got_twins == V
    checks.append(ok)
    print(
        f"{'multiprobe ivf top1':24} {dt:7.1f}s  rows={got_twins:>12,}  "
        f"[{'ok' if ok else f'EXPECTED {V}'}]"
    )

    # Span-dedup + contamination at corpus scale: M synthetic docs of
    # 16 tokens each from per-doc disjoint alphabets, with doc pairs
    # (10k, 10k+1) sharing identical text. Every span either recurs in
    # exactly its twin (ratio 1.0) or nowhere (ratio 0.0) — closed
    # form at any M, and the shingle-keyed exchanges see M*14 span
    # rows with no hot keys (worst-case df = 2).
    from paqarin_spark.operators import contamination_check, duplicate_spans

    M = max(n // 10, 100_000)
    base = F.col("doc_id") - F.when(F.col("doc_id") % 10 == 1, 1).otherwise(0)
    text = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("t"), base.cast("string"), F.lit(f"x{j}"))
            for j in range(16)
        ],
    )
    docs = spark.range(M).select(F.col("id").alias("doc_id"), text.alias("text"))
    t0 = time.perf_counter()
    full_dup = (
        duplicate_spans(docs, "text", "doc_id", n=3)
        .where(F.col("dup_span_ratio") == 1.0)
        .count()
    )
    dt = time.perf_counter() - t0
    ok = full_dup == M // 5  # ids with id%10 in {0,1}
    checks.append(ok)
    print(
        f"{'duplicate spans M=' + str(M):24} {dt:7.1f}s  rows={full_dup:>12,}  "
        f"[{'ok' if ok else f'EXPECTED {M // 5}'}]"
    )

    # Benchmark = every 1000th doc; the only contaminated corpus docs
    # are their twins (id % 1000 == 1), at ratio 1.0. The benchmark
    # shingle set (~M/1000 * 14 rows) broadcasts; the corpus is never
    # shuffled before its own per-doc rollup.
    bench = docs.where(F.col("doc_id") % 1000 == 0)
    corpus = docs.where(F.col("doc_id") % 1000 != 0)
    t0 = time.perf_counter()
    contaminated = (
        contamination_check(corpus, bench, "text", "doc_id", n=3)
        .where(F.col("contamination_ratio") == 1.0)
        .count()
    )
    dt = time.perf_counter() - t0
    expect_cont = M // 1000  # ids == 1 mod 1000
    ok = contaminated == expect_cont
    checks.append(ok)
    print(
        f"{'contamination probe':24} {dt:7.1f}s  rows={contaminated:>12,}  "
        f"[{'ok' if ok else f'EXPECTED {expect_cont}'}]"
    )

    # Sequence packing over the same 2M 16-token docs, budget 512:
    # 16 divides 512, so the stream packs into exactly 16·M/512
    # sequences of 32 docs each with ZERO straddling docs — the
    # closed-form alignment property (any straddler would mean the
    # prefix sum drifted). The two-level prefix sum (1024-doc buckets
    # -> ~M/1024 broadcast offsets) is what makes this shape safe at
    # corpus scale.
    from paqarin_spark.operators import chunk_tokens, pack_sequences

    assert M % 32 == 0, "pick n so n//10 is a multiple of 32"
    t0 = time.perf_counter()
    packed = pack_sequences(docs, "doc_id", "text", budget=512)
    agg = packed.agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("last_seq") + 1).alias("n_seqs"),
        F.sum((F.col("n_seqs") != 1).cast("long")).alias("n_straddle"),
    ).first()
    dt = time.perf_counter() - t0
    ok = (
        agg["n"] == M
        and agg["n_seqs"] == 16 * M // 512
        and agg["n_straddle"] == 0
    )
    checks.append(ok)
    print(
        f"{'sequence packing':24} {dt:7.1f}s  rows={agg['n']:>12,}  "
        f"[{'ok' if ok else f'EXPECTED {M}/{16 * M // 512}/0, got {dict(agg.asDict())}'}]"
    )

    # Overlapping chunking (8-token windows every 4): 16-token docs
    # emit starts 0/4/8/12 -> 4 chunks, the last truncated to 4 tokens
    # -> 4M chunks of which exactly 3M are full. Explode-only, no
    # shuffle — scan-speed at any corpus size.
    t0 = time.perf_counter()
    ch = chunk_tokens(docs, "doc_id", "text", chunk=8, stride=4)
    cagg = ch.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("n_chunk_tokens") == 8).cast("long")).alias("full"),
    ).first()
    dt = time.perf_counter() - t0
    ok = cagg["n"] == 4 * M and cagg["full"] == 3 * M
    checks.append(ok)
    print(
        f"{'overlap chunking':24} {dt:7.1f}s  rows={cagg['n']:>12,}  "
        f"[{'ok' if ok else f'EXPECTED {4 * M}/{3 * M}'}]"
    )

    # PageRank on a directed M-node cycle: the uniform distribution is
    # the exact fixed point (each node has out-degree 1 feeding the
    # next), so after any number of iterations every rank must equal
    # 1/M to float precision — a closed-form correctness check of the
    # whole iterate/broadcast/dangling machinery at graph scale.
    from paqarin_spark.operators import pagerank

    cyc = spark.range(M).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % M).alias("dst")
    )
    t0 = time.perf_counter()
    pr = pagerank(cyc, iterations=3)
    n_uniform = pr.where(
        F.abs(F.col("rank") - 1.0 / M) < 1e-15
    ).count()
    dt = time.perf_counter() - t0
    ok = n_uniform == M
    checks.append(ok)
    print(
        f"{'pagerank cycle':24} {dt:7.1f}s  rows={n_uniform:>12,}  "
        f"[{'ok' if ok else f'EXPECTED {M}'}]"
    )

    # HyperLogLog at stream scale: estimate over n rows spanning
    # exactly `entities` distinct keys must land within the sketch's
    # error envelope (1.04/sqrt(2^12) ~ 1.6% standard error; assert
    # 5%), and the register table is bounded at 2^12 rows no matter n.
    from paqarin_spark.operators import hll_estimate, hll_registers

    t0 = time.perf_counter()
    est = hll_estimate(ev, "entity", p=12).first()["n_distinct_est"]
    n_regs = hll_registers(ev, "entity", p=12).count()
    dt = time.perf_counter() - t0
    ok = abs(est - entities) / entities < 0.05 and n_regs <= 4096
    checks.append(ok)
    print(
        f"{'hll distinct sketch':24} {dt:7.1f}s  est={est:>12,.0f}  "
        f"[{'ok' if ok else f'EXPECTED {entities} +/-5%, {n_regs} regs'}]"
    )

    # Count-min at stream scale: counter table bounded at depth*width
    # rows after ONE groupBy; per-row mass equals the stream length;
    # estimates for a known-frequency candidate set never
    # underestimate. entity = id % E -> every entity appears exactly
    # n/E times.
    from paqarin_spark.operators import count_min_estimates

    cands = spark.range(50).select(F.col("id").alias("entity"))
    t0 = time.perf_counter()
    cm = count_min_estimates(
        ev, "entity", cands, "entity", depth=4, width=8192
    )
    under = cm.where(F.col("cm_estimate") < rows_per_entity).count()
    dt = time.perf_counter() - t0
    ok = under == 0
    checks.append(ok)
    print(
        f"{'count-min estimates':24} {dt:7.1f}s  under={under:>12,}  "
        f"[{'ok' if ok else 'UNDERESTIMATED'}]"
    )

    # K-means at vector scale: the V-vector corpus from the embed-dedup
    # check has vectors in hash-generated positions; Lloyd's must
    # assign every vector, keep k*d centroids, and give identical
    # twin vectors (2k/2k+1 share a vector) identical clusters —
    # the assignment is a pure function of the vector, layout-free.
    from paqarin_spark.operators import kmeans_lloyd

    km_in = vecs.limit(200_000)
    t0 = time.perf_counter()
    assign, cent = kmeans_lloyd(
        km_in, "vec_id", "embedding", k=8, iterations=2, assignment="blas"
    )
    n_assigned = assign.count()
    twin_mismatch = (
        assign.select((F.col("vec_id") / 2).cast("long").alias("pair"), "cluster")
        .groupBy("pair")
        .agg(F.count_distinct("cluster").alias("nc"))
        .where(F.col("nc") > 1)
        .count()
    )
    dt = time.perf_counter() - t0
    ok = n_assigned == 200_000 and twin_mismatch == 0
    checks.append(ok)
    print(
        f"{'kmeans lloyd k=8':24} {dt:7.1f}s  rows={n_assigned:>12,}  "
        f"[{'ok' if ok else f'{twin_mismatch} twin pairs split'}]"
    )

    # Deep-iteration PageRank mass conservation: 12 rounds on a
    # WEIGHTED chain where every 10th node is a dangling sink. Total
    # rank mass is exactly 1 per round in exact arithmetic (teleport +
    # damped inflow + dangling redistribution partition the mass), so
    # any leak in the dangling broadcast or the localCheckpoint loop
    # compounds over 12 rounds and shows up here. Tolerance 1e-9, not
    # 1e-12: summing ~M doubles of magnitude 1/M carries O(n·eps)
    # float noise (~2e-10 at 1M nodes) that is summation error, not
    # mass leak — a real leak is O(dangling mass) ≈ 0.1/round.
    Mg = min(M, 1_000_000)
    wedges = (
        spark.range(Mg)
        .where(F.col("id") % 10 != 9)
        .select(
            F.col("id").alias("src"),
            ((F.col("id") + 1) % Mg).alias("dst"),
            ((F.col("id") % 5) + 1).cast("double").alias("w"),
        )
    )
    t0 = time.perf_counter()
    total = (
        pagerank(wedges, weight="w", iterations=12)
        .agg(F.sum("rank").alias("s"))
        .first()["s"]
    )
    dt = time.perf_counter() - t0
    ok = abs(total - 1.0) < 1e-9
    checks.append(ok)
    print(
        f"{'pagerank 12-round mass':24} {dt:7.1f}s  sum={total:.15f}  "
        f"[{'ok' if ok else 'EXPECTED 1 +/- 1e-9'}]"
    )

    # Ingest-novelty manifest with the corpus as the 100-TB side: the
    # span-dedup corpus (M docs, disjoint per-doc alphabets) is probed
    # by a 3000-doc batch — 1000 exact copies of corpus docs, 1000
    # near-dups (14 of 16 tokens kept -> 12 of 14 trigram shingles
    # fully inside corpus tokens, containment 12/14 ≥ 0.5), 1000 novel (fresh alphabet). The batch probes BROADCAST;
    # the corpus shuffles nowhere. Verdict counts are closed-form.
    from paqarin_spark.operators.dedup import ingest_novelty

    nb = 1000
    bid = F.col("id")
    ref = (bid % nb) * 10  # corpus doc 10*(id%nb): base == itself
    corpus_tok = [
        F.concat(F.lit("t"), ref.cast("string"), F.lit(f"x{j}"))
        for j in range(16)
    ]
    novel_tok = [
        F.concat(F.lit("nv"), bid.cast("string"), F.lit(f"x{j}"))
        for j in range(16)
    ]
    near_tok = corpus_tok[:14] + novel_tok[:2]
    batch = spark.range(3 * nb).select(
        bid.alias("doc_id"),
        F.when(bid < nb, F.concat_ws(" ", *corpus_tok))
        .when(bid < 2 * nb, F.concat_ws(" ", *near_tok))
        .otherwise(F.concat_ws(" ", *novel_tok))
        .alias("text"),
    )
    t0 = time.perf_counter()
    verdicts = {
        r["verdict"]: r["n"]
        for r in ingest_novelty(batch, docs, "text", "doc_id", n=3)
        .groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    dt = time.perf_counter() - t0
    ok = verdicts == {"exact_dup": nb, "near_dup": nb, "novel": nb}
    checks.append(ok)
    print(
        f"{'ingest novelty 3k/' + str(M):24} {dt:7.1f}s  "
        f"got={verdicts}  [{'ok' if ok else f'EXPECTED {nb} each'}]"
    )

    # Quality-aware near-dup resolution (tx37's composition) at 200k
    # docs: MinHash-LSH pairs -> contraction components -> per-cluster
    # argmax. Twins (10k, 10k+1) share identical text, so every
    # cluster has exactly 2 members and the argmax tie-break keeps the
    # smaller (even) id — the kept set is closed-form, which is a
    # stronger check than run-to-run stability.
    from paqarin_spark.operators.dedup import minhash_lsh_pairs

    M37 = 200_000
    docs37 = spark.range(M37).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("t"),
                    (
                        F.col("id")
                        - F.when(F.col("id") % 10 == 1, 1).otherwise(0)
                    ).cast("string"),
                    F.lit(f"x{j}"),
                )
                for j in range(16)
            ],
        ).alias("text"),
    )
    t0 = time.perf_counter()
    pairs37 = minhash_lsh_pairs(
        docs37, "text", "doc_id", num_hashes=4, band_size=2, shingle_n=3
    )
    clusters37 = duplicate_clusters(pairs37, algorithm="contract")
    kept_bad = (
        clusters37.groupBy("cluster_rep")
        .agg(F.count(F.lit(1)).alias("nm"), F.min("doc").alias("kept"))
        .where(
            (F.col("nm") != 2)
            | (F.col("kept") % 10 != 0)
            | (F.col("kept") != F.col("cluster_rep"))
        )
        .count()
    )
    n_clusters = clusters37.select("cluster_rep").distinct().count()
    dt = time.perf_counter() - t0
    ok = kept_bad == 0 and n_clusters == M37 // 10
    checks.append(ok)
    print(
        f"{'quality dedup 200k':24} {dt:7.1f}s  clusters={n_clusters:>9,}  "
        f"[{'ok' if ok else f'{kept_bad} bad, EXPECTED {M37 // 10}'}]"
    )

    # Cross-table retrieval (em15's shape) against the 2M-vector
    # corpus: 1000 probe vectors, each the exact vector of corpus twin
    # pair (2q, 2q+1) under a DISJOINT id space — every probe's top-1
    # must be an exact hit (cos 1.0). Q-blocks × C-blocks BLAS fanout;
    # global rank sees ≤ B·k candidates per query, nothing through the
    # driver.
    from paqarin_spark.operators.similarity import cosine_topk

    nq = 1000
    probes = spark.range(nq).select(
        (F.col("id") + 1_000_000_000).alias("vec_id"),
        F.array(
            *[
                (
                    F.pmod(
                        F.xxhash64(F.col("id").cast("long"), F.lit(j)),
                        F.lit(1000),
                    )
                    / 1000.0
                    - 0.5
                )
                for j in range(dim16)
            ]
        ).alias("embedding"),
    )
    t0 = time.perf_counter()
    hits = (
        cosine_topk(vecs, "vec_id", "embedding", k=1, queries=probes)
        .where(F.col("cos_sim") >= 0.999999)
        .count()
    )
    dt = time.perf_counter() - t0
    ok = hits == nq
    checks.append(ok)
    print(
        f"{'cross-table top1 2M':24} {dt:7.1f}s  hits={hits:>12,}  "
        f"[{'ok' if ok else f'EXPECTED {nq}'}]"
    )

    # Quantile sketch at stream scale: bottom-k per event-type-sized
    # group over all n rows. Size is exactly groups × k; the two-stage
    # top-k must be LAYOUT-INDEPENDENT (the exactness argument: a row
    # dropped in any chunk is beaten by k rows of its own chunk), so
    # the sample at 8 partitions equals the sample at the default
    # layout row for row.
    from paqarin_spark.operators import quantile_sketch

    qev = ev.select(
        "rid", (F.col("entity") % 5).cast("string").alias("etype"), "value"
    )
    t0 = time.perf_counter()
    qs = quantile_sketch(qev, "value", ["rid"], k=256, group_by=["etype"])
    n_rows = qs.count()
    qs8 = quantile_sketch(
        qev.repartition(8), "value", ["rid"], k=256, group_by=["etype"]
    )
    diff = qs.select("etype", "_rk", "value").exceptAll(
        qs8.select("etype", "_rk", "value")
    ).count()
    dt = time.perf_counter() - t0
    ok = n_rows == 5 * 256 and diff == 0
    checks.append(ok)
    print(
        f"{'quantile sketch 20M':24} {dt:7.1f}s  rows={n_rows:>12,}  "
        f"[{'ok' if ok else f'EXPECTED {5 * 256}, diff={diff}'}]"
    )

    # Triangle counting at 1M planted triangles (3M vertices + a
    # 100k-leaf hub): disjoint 3-cliques give an EXACT closed-form
    # count; the hub vertex is adjacent to one corner of each of the
    # first 100k triangles, so unordered it would contribute C(100k,2)
    # wedges — degree-ordered orientation sends every leaf edge INTO
    # the hub and the wedge join never materializes them. No new
    # triangle is closed (hub neighbors are pairwise non-adjacent).
    from paqarin_spark.operators import triangles

    T = 1_000_000
    tri_base = spark.range(T)
    tri_edges = (
        tri_base.select((3 * F.col("id")).alias("src"), (3 * F.col("id") + 1).alias("dst"))
        .unionByName(
            tri_base.select((3 * F.col("id")).alias("src"), (3 * F.col("id") + 2).alias("dst"))
        )
        .unionByName(
            tri_base.select((3 * F.col("id") + 1).alias("src"), (3 * F.col("id") + 2).alias("dst"))
        )
        .unionByName(
            spark.range(100_000).select(
                F.lit(3_000_000_000).alias("src"), (3 * F.col("id")).alias("dst")
            )
        )
    )
    timed("triangles 1M planted", triangles(tri_edges), T)

    # Product quantization at the 2M-vector corpus: codebooks train on
    # a 512-vector md5-rank sample, then EVERY vector encodes against
    # the broadcast codebook — codes are exactly 2 rows (subspaces)
    # per vector and every code falls in [0, k). The encode pass is
    # the broadcast-join/no-vector-shuffle shape that has to hold at
    # billion-vector scale.
    from paqarin_spark.operators import pq_train_encode

    t0 = time.perf_counter()
    codes2m, _books2m = pq_train_encode(
        vecs, "vec_id", "embedding", subspaces=2, k=4, iterations=1,
        train_limit=512,
    )
    # one aggregation pass: count + code-range violations together
    # (separate .count() actions would re-run the whole train+encode)
    stats = codes2m.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            ((F.col("code") < 0) | (F.col("code") >= 4)).cast("long")
        ).alias("bad"),
    ).first()
    n_codes, bad_codes = int(stats["n"]), int(stats["bad"] or 0)
    dt = time.perf_counter() - t0
    n_vecs_total = vecs.count()
    ok = n_codes == 2 * n_vecs_total and bad_codes == 0
    checks.append(ok)
    print(
        f"{'pq encode 2M':24} {dt:7.1f}s  rows={n_codes:>12,}  "
        f"[{'ok' if ok else f'EXPECTED {2 * n_vecs_total}, bad={bad_codes}'}]"
    )

    # Cohort retention at the full 20M-event stream: every entity is
    # active on days 0..rows_per_entity-1 (dense), so there is ONE
    # cohort with a closed-form offset range and every (cohort,
    # offset) cell holds exactly `entities` users — the single
    # user-keyed exchange + rollup shape of q82 at 200x the bench
    # row count.
    from pyspark.sql import Window as _W

    t0 = time.perf_counter()
    _w = _W.partitionBy("entity")
    act = ev.select(
        "entity",
        F.min(F.to_date("ts")).over(_w).alias("_cd"),
        F.to_date("ts").alias("_d"),
    ).select(
        "entity", "_cd",
        F.floor(F.datediff("_d", "_cd") / 7).cast("int").alias("off"),
    )
    coh = act.groupBy("_cd", "off").agg(
        F.countDistinct("entity").alias("au")
    )
    probe = coh.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("au").alias("lo"),
        F.max("au").alias("hi"),
    ).first()
    rows_c, uniform = int(probe["n"]), probe
    dt = time.perf_counter() - t0
    expect_offsets = (min(days, rows_per_entity) - 1) // 7 + 1
    ok = (
        rows_c == expect_offsets
        and uniform["lo"] == entities
        and uniform["hi"] == entities
    )
    checks.append(ok)
    print(
        f"{'cohort rollup 20M':24} {dt:7.1f}s  rows={rows_c:>12,}  "
        f"[{'ok' if ok else f'EXPECTED {expect_offsets} x {entities}'}]"
    )

    # Sign signatures at 500k: ids 2k and 2k+1 share a vector by
    # construction, so their 32-bit signatures must be IDENTICAL for
    # every pair — one broadcast-plane groupBy over the exploded dims,
    # the encode-once-then-8-bytes-forever shape of binary hashing.
    from paqarin_spark.operators import semdedup_pairs, sign_signatures

    t0 = time.perf_counter()
    sig_in = vecs.limit(500_000)
    sigs = sign_signatures(sig_in, "vec_id", "embedding", num_planes=16)
    sp = (
        sigs.groupBy(F.floor(F.col("vec_id") / 2).alias("p"))
        .agg(F.count_distinct("sig").alias("nd"))
        .agg(
            F.count(F.lit(1)).alias("pairs"),
            F.sum((F.col("nd") > 1).cast("long")).alias("split"),
        )
        .first()
    )
    dt = time.perf_counter() - t0
    n_pairs, n_split = int(sp["pairs"]), int(sp["split"] or 0)
    ok = n_pairs == 250_000 and n_split == 0
    checks.append(ok)
    print(
        f"{'sign signatures 500k':24} {dt:7.1f}s  rows={n_pairs:>12,}  "
        f"[{'ok' if ok else f'split pairs={n_split}'}]"
    )

    # SemDeDup at 200k: every (2k, 2k+1) pair is an exact duplicate,
    # identical vectors always land in the same k-means cluster, and
    # no other pair reaches the 0.999999 threshold (established by the
    # bucketed-dedup invariant at 2M) — so the cluster-blocked pair
    # count has a closed form. The quadratic stays inside clusters.
    t0 = time.perf_counter()
    sd_in = vecs.limit(200_000)
    # k=64 holds cluster width ~3k: the SemDeDup contract is that k
    # GROWS with the corpus so the within-cluster quadratic stays
    # constant per cluster (k=16 at 200k measured 103s; k=64 is ~16x
    # less pairwise work).
    n_sd_pairs = semdedup_pairs(
        sd_in, "vec_id", "embedding", k=64, threshold=0.999999,
        iterations=1, assignment="blas",
    ).count()
    dt = time.perf_counter() - t0
    ok = n_sd_pairs == 100_000
    checks.append(ok)
    print(
        f"{'semdedup pairs 200k':24} {dt:7.1f}s  rows={n_sd_pairs:>12,}  "
        f"[{'ok' if ok else 'EXPECTED 100,000'}]"
    )


    # BFS hops over a 20M-edge layered graph: 5 edges per node map
    # layer k onto layer k+1 via i -> (i*c + r) % M with gcd(c, M)=1,
    # so each residue image is a bijection and EVERY next-layer node
    # sits at exactly hop k+1 — per-hop counts have a closed form and
    # the frontier never revisits (edges only point forward).
    from paqarin_spark.operators import bfs_hops, kcore_peel

    M = 1_000_000
    c_mul = 999_983  # prime, coprime with 10^6
    t0 = time.perf_counter()
    e = spark.range(20 * M).select(
        (F.col("id") % F.lit(5)).alias("_r"),
        (F.floor(F.col("id") / 5) % M).alias("_i"),
        F.floor(F.col("id") / (5 * M)).alias("_l"),
    )
    ledges = e.select(
        (F.col("_l") * M + F.col("_i")).alias("src"),
        (
            (F.col("_l") + 1) * M
            + F.pmod(F.col("_i") * c_mul + F.col("_r"), F.lit(M))
        ).alias("dst"),
    )
    seeds = spark.range(M).select(F.col("id").alias("node"))
    hops = (
        bfs_hops(ledges, seeds, max_hops=4)
        .groupBy("hop")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    dt = time.perf_counter() - t0
    got_hops = {r["hop"]: r["n"] for r in hops}
    ok = all(got_hops.get(h) == M for h in (1, 2, 3, 4))
    checks.append(ok)
    print(
        f"{'bfs hops 20M edges':24} {dt:7.1f}s  rows={sum(got_hops.values()):>12,}  "
        f"[{'ok' if ok else f'per-hop counts {got_hops}'}]"
    )

    # k-core peel over a 10M-edge planted graph: a degree-4 circulant
    # core (neighbors ±1, ±2 on a 1M ring) with a 3-node pendant chain
    # on every core node. At k=2 the chains peel EXACTLY one node per
    # round from the tip inward; the core never drops below degree 4.
    t0 = time.perf_counter()
    ring = spark.range(4 * M).select(
        (F.col("id") % M).alias("_i"),
        F.floor(F.col("id") / M).alias("_d"),
    )
    core_edges = ring.select(
        F.col("_i").alias("src"),
        F.pmod(
            F.col("_i")
            + F.when(F.col("_d") == 0, 1)
            .when(F.col("_d") == 1, -1)
            .when(F.col("_d") == 2, 2)
            .otherwise(-2),
            F.lit(M),
        ).alias("dst"),
    )
    ch = spark.range(3 * M).select(
        (F.col("id") % M).alias("_i"), F.floor(F.col("id") / M).alias("_lvl")
    )
    chain_up = ch.select(
        (F.col("_lvl") * M + F.col("_i")).alias("src"),
        ((F.col("_lvl") + 1) * M + F.col("_i")).alias("dst"),
    )
    chain_down = chain_up.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    gedges = core_edges.unionByName(chain_up).unionByName(chain_down)
    peel = (
        kcore_peel(gedges, k=2, rounds=3)
        .groupBy("peel_round")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    dt = time.perf_counter() - t0
    got_peel = {r["peel_round"]: r["n"] for r in peel}
    ok = (
        got_peel.get(1) == M
        and got_peel.get(2) == M
        and got_peel.get(3) == M
        and got_peel.get(None) == M
    )
    checks.append(ok)
    print(
        f"{'kcore peel 10M edges':24} {dt:7.1f}s  rows={sum(got_peel.values()):>12,}  "
        f"[{'ok' if ok else f'per-round counts {got_peel}'}]"
    )

    # Stream-stream LEFT-OUTER interval join at 1.5M events: every
    # even key's 'a' gets a 'b' partner 60s later (inside the 1h lag),
    # odd keys never do; a far-future sentinel pushes the final
    # watermark past every window, so under the fixed cutoff the
    # match/no-match split is exact: K/2 attributed, K/2 abandoned.
    import shutil
    import tempfile

    from paqarin_spark.streaming import stream_interval_join

    K = 1_000_000
    tmp = tempfile.mkdtemp(prefix="smoke_st_")
    try:
        base = 1_600_000_000
        left = spark.range(K).select(
            F.col("id").alias("event_id"),
            F.col("id").alias("user_id"),
            F.lit("a").alias("event_type"),
            F.timestamp_seconds(F.lit(base) + F.col("id") % 86_400).alias("ts"),
        )
        right = spark.range(K // 2).select(
            (F.col("id") + K).alias("event_id"),
            (F.col("id") * 2).alias("user_id"),
            F.lit("b").alias("event_type"),
            F.timestamp_seconds(
                F.lit(base) + (F.col("id") * 2) % 86_400 + 60
            ).alias("ts"),
        )
        # one far-future sentinel PER SIDE: the global watermark is the
        # MIN over both filtered sides' watermarks, so advancing only
        # the left side would never evict (or emit) unmatched state
        sentinel = spark.range(2).select(
            (F.lit(9_999_999) + F.col("id")).alias("event_id"),
            (F.lit(K + 7) + F.col("id") * 13).alias("user_id"),
            F.when(F.col("id") == 0, F.lit("a")).otherwise(F.lit("b")).alias(
                "event_type"
            ),
            F.timestamp_seconds(
                F.lit(base + 90 * 86_400) + F.col("id") * 7_200
            ).alias("ts"),
        )
        left.unionByName(right).unionByName(sentinel).repartition(
            8
        ).write.mode("overwrite").parquet(f"{tmp}/in")
        t0 = time.perf_counter()
        stream = spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts timestamp"
        ).parquet(f"{tmp}/in")
        joined = stream_interval_join(
            stream,
            timestamp_column="ts",
            key_column="user_id",
            left_filter=F.col("event_type") == "a",
            right_filter=F.col("event_type") == "b",
            max_lag="1 hour",
            watermark="1 day",
            how="left_outer",
        )
        q = (
            joined.writeStream.format("memory")
            .queryName("smoke_st_join")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        res = (
            spark.table("smoke_st_join")
            .where(
                F.col("left_ts")
                < F.timestamp_seconds(F.lit(base + 2 * 86_400))
            )
            .agg(
                F.count("right_id").alias("n_matched"),
                F.count(
                    F.when(F.col("right_id").isNull(), F.lit(1))
                ).alias("n_abandoned"),
            )
            .first()
        )
        dt = time.perf_counter() - t0
        ok = res["n_matched"] == K // 2 and res["n_abandoned"] == K // 2
        checks.append(ok)
        print(
            f"{'stream left join 1.5M':24} {dt:7.1f}s  rows={res['n_matched'] + res['n_abandoned']:>12,}  "
            f"[{'ok' if ok else f'matched={res[0]}'}]"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # ExactSubstr spans over a 10M-token corpus: 100k docs of 100
    # tokens, all unique except a 20-token passage shared by each
    # (2k, 2k+1) pair at positions 40..59 — every doc reports exactly
    # ONE maximal span [40, 59]; boundary-straddling anchors contain
    # unique tokens and cannot extend it.
    from paqarin_spark.operators import duplicate_substring_spans

    t0 = time.perf_counter()
    D = 100_000
    docs = spark.range(D).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(99)),
                lambda i: F.when(
                    (i >= 40) & (i < 60),
                    F.concat(
                        F.lit("s"),
                        (F.col("id") / 2).cast("long").cast("string"),
                        F.lit("x"),
                        i.cast("string"),
                    ),
                ).otherwise(
                    F.concat(
                        F.lit("d"),
                        F.col("id").cast("string"),
                        F.lit("x"),
                        i.cast("string"),
                    )
                ),
            ),
            " ",
        ).alias("text"),
    )
    spans = duplicate_substring_spans(docs, "text", "doc_id", min_tokens=8)
    agg = spans.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (
                (F.col("span_start") == 40)
                & (F.col("span_end") == 59)
                & (F.col("span_len") == 20)
            ).cast("long")
        ).alias("exact"),
    ).first()
    dt = time.perf_counter() - t0
    ok = agg["n"] == D and agg["exact"] == D
    checks.append(ok)
    print(
        f"{'substring spans 10M tok':24} {dt:7.1f}s  rows={agg['n']:>12,}  "
        f"[{'ok' if ok else f'exact={agg[1]}'}]"
    )


    # Covariance + power iteration at 200k x 8: dims 0/1 planted as
    # v1 = 2*v0 with v0 in {0,1} (exact var 0.25), other dims constant
    # -> the d x d table has closed-form entries (0.25 / 0.5 / 1.0 /
    # 0), the matrix is rank-1, and the leading eigenpair is exact:
    # eigenvalue 1.25, eigenvector (1,2)/sqrt(5) ~ (0.447214, 0.894427).
    from paqarin_spark.operators import (
        covariance_matrix,
        power_iteration_on_cov,
    )

    t0 = time.perf_counter()
    cvecs = spark.range(200_000).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.when(i == 0, (F.col("id") % 2).cast("double"))
            .when(i == 1, (F.col("id") % 2 * 2).cast("double"))
            .otherwise(F.lit(3.0)),
        ).alias("v")
    )
    cov_tbl = covariance_matrix(cvecs, "v").localCheckpoint()
    got_cov = {
        (r["i"], r["j"]): r["cov"] for r in cov_tbl.collect()
    }
    eig = {
        r["i"]: (r["loading"], r["eigenvalue"])
        for r in power_iteration_on_cov(cov_tbl, 8, iterations=6).collect()
    }
    dt = time.perf_counter() - t0
    ok = (
        got_cov[(0, 0)] == 0.25
        and got_cov[(0, 1)] == 0.5
        and got_cov[(1, 1)] == 1.0
        and got_cov[(2, 2)] == 0.0
        and got_cov[(0, 7)] == 0.0
        and abs(eig[0][0] - 0.447214) <= 2e-6
        and abs(eig[1][0] - 0.894427) <= 2e-6
        and abs(eig[0][1] - 1.25) <= 2e-6
        and all(abs(eig[i][0]) <= 1e-6 for i in range(2, 8))
    )
    checks.append(ok)
    print(
        f"{'covariance+eig 200k':24} {dt:7.1f}s  rows={len(got_cov):>12,}  "
        f"[{'ok' if ok else f'cov={got_cov[(0,0)]},{got_cov[(0,1)]} eig={eig[0]}'}]"
    )


    # ExactSubstr REMOVAL at 10M tokens: same planted corpus as the
    # spans invariant — keep-first means every EVEN doc (first
    # occurrence of its pair's shared passage) keeps all 100 tokens
    # and every ODD doc loses exactly the 20 shared ones.
    from paqarin_spark.operators import strip_duplicate_substrings

    t0 = time.perf_counter()
    strip_agg = (
        strip_duplicate_substrings(docs, "text", "doc_id", min_tokens=8)
        .groupBy("n_removed")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    dt = time.perf_counter() - t0
    got_strip = {r["n_removed"]: r["n"] for r in strip_agg}
    ok = got_strip == {0: D // 2, 20: D // 2}
    checks.append(ok)
    print(
        f"{'substring strip 10M tok':24} {dt:7.1f}s  rows={sum(got_strip.values()):>12,}  "
        f"[{'ok' if ok else f'dist={got_strip}'}]"
    )

    # LOO-kNN label accuracy at the 2M-vector tier (the em24 family):
    # 16 planted one-hot clusters with per-vector wiggle; 2,000 query
    # vectors ride the em1 blocked kernel against the FULL 2M corpus.
    # Closed form: every query's 1-NN lands in its own cluster ->
    # accuracy exactly 1.0 on all 16 labels.
    from paqarin_spark.operators import cosine_topk

    n_vec, n_q, n_clu, vdim = 2_000_000, 2_000, 16, 32
    vec_expr = F.transform(
        F.sequence(F.lit(0), F.lit(vdim - 1)),
        lambda j: (
            F.when(j == (F.col("id") % n_clu).cast("int"), F.lit(1.0))
            .when(
                j == ((F.col("id") % n_clu).cast("int") + n_clu),
                (F.pmod(F.col("id"), F.lit(997)) + F.lit(1.0)) / 100000.0,
            )
            .otherwise(F.lit(0.0))
        ),
    )
    corpus_vecs = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % n_clu).alias("label"),
        vec_expr.alias("embedding"),
    )
    query_vecs = spark.range(n_q).select(
        (F.col("id") + n_vec).alias("vec_id"),
        (F.col("id") % n_clu).alias("label"),
        vec_expr.alias("embedding"),
    )
    t0 = time.perf_counter()
    nn1 = cosine_topk(
        corpus_vecs, "vec_id", "embedding", k=1, queries=query_vecs
    )
    hits = (
        nn1.join(
            query_vecs.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("_ql"),
            ),
            "query_id",
        )
        .join(
            corpus_vecs.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("_nl"),
            ),
            "neighbor_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("_ql") == F.col("_nl")).cast("long")).alias("ok"),
        )
        .collect()[0]
    )
    dt = time.perf_counter() - t0
    ok = hits["n"] == n_q and hits["ok"] == n_q
    checks.append(ok)
    print(
        f"{'LOO-kNN 2M vectors':24} {dt:7.1f}s  rows={hits['n']:>12,}  "
        f"[{'ok' if ok else 'correct=%s/%s' % (hits['ok'], hits['n'])}]"
    )

    # Token-level Markov text walk at 10M tokens (gen9's machinery):
    # a DETERMINISTIC cyclic vocabulary (tok_i always followed by
    # tok_{(i+1) mod V}) fitted over 100k docs x 100 tokens. Closed
    # form: every generated transition follows the cycle exactly.
    from paqarin_spark.generator import GeneratorParameters
    from paqarin_spark.generators import MarkovEventGenerator

    vocab_n, docs_n, doc_len = 40, 100_000, 100
    t0 = time.perf_counter()
    mtoks = spark.range(docs_n * doc_len).select(
        (F.col("id") / doc_len).cast("long").alias("doc_id"),
        F.pmod(F.col("id"), F.lit(doc_len)).alias("pos"),
        F.concat(
            F.lit("t"),
            F.pmod(
                (F.col("id") / doc_len).cast("long")
                + F.pmod(F.col("id"), F.lit(doc_len)),
                F.lit(vocab_n),
            ),
        ).alias("tok"),
    )
    mschema = TimeSeriesSchema(
        item_id_columns=("doc_id",),
        timestamp_column="pos",
        value_columns=("pos",),
        frequency="D",
        order_columns=("pos",),
    )
    mgen = MarkovEventGenerator(
        GeneratorParameters(schema=mschema, sequence_length=8, seed=13),
        category_column="tok",
    ).fit(mtoks)
    walks = mgen.generate(50, seed=13).orderBy("sequence_id", "step").collect()
    dt = time.perf_counter() - t0
    by_seq: dict[int, list[str]] = {}
    for r in walks:
        by_seq.setdefault(r["sequence_id"], []).append(r["tok"])
    ok = len(walks) == 50 * 8 and all(
        int(seq[i + 1][1:]) == (int(seq[i][1:]) + 1) % vocab_n
        for seq in by_seq.values()
        for i in range(len(seq) - 1)
    )
    checks.append(ok)
    print(
        f"{'markov text 10M tok':24} {dt:7.1f}s  rows={len(walks):>12,}  "
        f"[{'ok' if ok else 'cycle violated'}]"
    )

    # Degree assortativity on a PLANTED bipartite regular graph at 20M
    # edges (q93's operator): every edge joins a degree-20 customer to
    # a degree-10 supplier, so the endpoint-degree correlation is -1
    # EXACTLY (two-point degree distribution; Newman 2002).
    from paqarin_spark.operators import degree_assortativity

    n_cust, fanout, n_supp = 1_000_000, 20, 2_000_000
    t0 = time.perf_counter()
    # edge i: customer i//20 -> supplier (i mod 20M) mod 2M; for each
    # customer the 20 suppliers are consecutive residues (all
    # distinct), and each supplier receives exactly the 10 preimages
    # {s, s+2M, ..., s+18M} — a SIMPLE 20/10-biregular bipartite graph
    bip = spark.range(n_cust * fanout).select(
        F.concat(F.lit("c"), (F.col("id") / fanout).cast("long")).alias("a"),
        F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(n_supp))).alias("b"),
    )
    arow = degree_assortativity(bip, "a", "b").collect()[0]
    dt = time.perf_counter() - t0
    ok = (
        arow["n_edges"] == 2 * n_cust * fanout
        and arow["assortativity"] == -1.0
    )
    checks.append(ok)
    print(
        f"{'assortativity 20M edges':24} {dt:7.1f}s  rows={arow['n_edges']:>12,}  "
        f"[{'ok' if ok else 'r=%s' % arow['assortativity']}]"
    )

    # NN-descent on a PLANTED 1-D manifold at 20k vectors (em25's
    # operator): points on a circle, where cosine decays monotonically
    # with ring distance, so the TRUE k=6 neighbors are exactly the
    # indices within ring distance 3 (closed form) — the smooth
    # structure NN-descent's neighbor-of-neighbor walk descends.
    # Invariant: after the fixed rounds, >= 90% of final edges are
    # true ring neighbors (md5-deterministic: measures exactly 0.9268
    # at these parameters).
    from paqarin_spark.operators import nn_descent

    nv = 20_000
    t0 = time.perf_counter()
    theta = F.col("vec_id") * (2.0 * 3.141592653589793 / nv)
    ring = spark.range(nv).select(
        F.col("id").alias("vec_id")
    ).select(
        "vec_id",
        F.array(F.cos(theta), F.sin(theta)).alias("embedding"),
    )
    g = nn_descent(ring, "vec_id", "embedding", k=6, rounds=8)
    ring_dist = F.least(
        F.abs(F.col("node") - F.col("nbr")),
        nv - F.abs(F.col("node") - F.col("nbr")),
    )
    stat = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((ring_dist <= 3).cast("long")).alias("near"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    frac = stat["near"] / stat["n"]
    ok = stat["n"] == nv * 6 and frac >= 0.9
    checks.append(ok)
    print(
        f"{'nn-descent 20k ring':24} {dt:7.1f}s  rows={stat['n']:>12,}  "
        f"[{'ok' if ok else 'ring_frac=%.3f' % frac}]"
    )

    # PCA top-2 with deflation on a PLANTED diagonal spectrum at 500k
    # vectors (em28's operator): 8 independent md5-uniform dims scaled
    # by (j+1), so the population covariance is ~diag((j+1)^2/12) and
    # the top-2 principal axes are EXACTLY dims 7 and 6.
    from paqarin_spark.functions import uniform_hash
    from paqarin_spark.operators import pca_top2

    npc = 500_000
    t0 = time.perf_counter()
    vecs = spark.range(npc).select(
        F.array(
            *[
                (
                    (uniform_hash(F.lit("pca"), F.col("id"), F.lit(j)) - 0.5)
                    * float(j + 1)
                )
                for j in range(8)
            ]
        ).alias("v")
    )
    comps = pca_top2(vecs, "v", iterations=8).collect()
    dt = time.perf_counter() - t0
    axes = {}
    lams = {}
    for c in (1, 2):
        lds = sorted(
            ((abs(r["loading"]), r["i"]) for r in comps if r["component"] == c),
            reverse=True,
        )
        axes[c] = lds[0][1]
        lams[c] = [r["eigenvalue"] for r in comps if r["component"] == c][0]
    ok = (
        axes[1] == 7
        and axes[2] == 6
        and abs(lams[1] - 64.0 / 12.0) < 0.05 * (64.0 / 12.0)
        and abs(lams[2] - 49.0 / 12.0) < 0.05 * (49.0 / 12.0)
    )
    checks.append(ok)
    print(
        f"{'pca top2 500k':24} {dt:7.1f}s  rows={len(comps):>12,}  "
        f"[{'ok' if ok else 'axes=%s lams=%s' % (axes, lams)}]"
    )

    # Tar shard round-trip at 200k documents / 64 shards (mm15's
    # operators): member count and total payload bytes are closed-form
    # (doc i carries (i % 50) + 1 bytes), proving the ustar writer and
    # checksummed reader agree at shard sizes the sf tables never hit.
    from paqarin_spark.multimodal import tar_members_table, tar_shards_from_docs

    nd = 200_000
    t0 = time.perf_counter()
    tdocs = spark.range(nd).select(
        F.col("id").alias("doc_id"),
        F.repeat(F.lit("w"), (F.col("id") % 50 + 1).cast("int")).alias("text"),
    )
    mem = tar_members_table(tar_shards_from_docs(tdocs, "doc_id", "text", 64))
    stat = mem.agg(
        F.count(F.lit(1)).alias("n"), F.sum("size").alias("b")
    ).collect()[0]
    dt = time.perf_counter() - t0
    want_bytes = (nd // 50) * sum(range(1, 51))
    ok = stat["n"] == nd and stat["b"] == want_bytes
    checks.append(ok)
    print(
        f"{'tar shards 200k docs':24} {dt:7.1f}s  rows={stat['n']:>12,}  "
        f"[{'ok' if ok else 'bytes=%s want=%s' % (stat['b'], want_bytes)}]"
    )

    # TextRank on a PLANTED hub-and-spokes corpus at 500k docs (tx48's
    # operator): 'hub' neighbors every satellite, satellites only ever
    # neighbor 'hub' — the hub must take rank 1.
    from paqarin_spark.operators import textrank_keywords

    ntx = 500_000
    t0 = time.perf_counter()
    tr_docs = spark.range(ntx).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("hub sat"), F.pmod(F.col("id"), F.lit(50)),
            F.lit(" hub sat"), F.pmod(F.col("id") + 1, F.lit(50)),
        ).alias("text"),
    )
    kw = textrank_keywords(
        tr_docs, "text", "doc_id", vocab_size=64, window=1, top_k=5
    ).collect()
    dt = time.perf_counter() - t0
    ok = kw[0]["token"] == "hub" and kw[0]["rk"] == 1 and len(kw) == 5
    checks.append(ok)
    print(
        f"{'textrank 500k docs':24} {dt:7.1f}s  rows={len(kw):>12,}  "
        f"[{'ok' if ok else 'top=%s' % kw[0]['token']}]"
    )

    # Z-score outliers at 2M vectors (em29's operator): one planted
    # +1000 spike on dim 0 of vec 0 — it must take rank 1 by orders of
    # magnitude; stats stay d-bounded partial aggregates.
    from paqarin_spark.operators import zscore_outliers

    nz = 2_000_000
    t0 = time.perf_counter()
    zvecs = spark.range(nz).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    F.pmod(
                        F.col("id") * 2_654_435_761 + j * 1_000_003,
                        F.lit(1_000_000),
                    )
                    / 1_000_000.0
                    + F.when(
                        (F.col("id") == 0) & (F.lit(j) == 0), F.lit(1000.0)
                    ).otherwise(F.lit(0.0))
                )
                for j in range(8)
            ]
        ).alias("v"),
    )
    zout = zscore_outliers(zvecs, "vec_id", "v", top_k=5).collect()
    dt = time.perf_counter() - t0
    ok = (
        zout[0]["vec_id"] == 0
        and zout[0]["rk"] == 1
        and zout[0]["score"] > 100 * zout[1]["score"]
    )
    checks.append(ok)
    print(
        f"{'zscore outliers 2M':24} {dt:7.1f}s  rows={len(zout):>12,}  "
        f"[{'ok' if ok else 'top=%s' % zout[0]['vec_id']}]"
    )

    # Label propagation at 1M nodes / 2M edges (q105's operator):
    # 200k planted 5-cliques — after ONE round every member of a
    # clique holds its minimum node id (4 distinct neighbor labels +
    # self all count 1, min wins), so 4 rounds must yield exactly one
    # label per clique, anchored at the clique base.
    from paqarin_spark.operators import label_propagation

    n_cliq, kq = 200_000, 5
    t0 = time.perf_counter()
    base = spark.range(n_cliq).select(F.col("id").alias("cl"))
    pairs_ij = [(i, j) for i in range(kq) for j in range(i + 1, kq)]
    cedges = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cl") * kq + i).alias("src"),
                        (F.col("cl") * kq + j).alias("dst"),
                    )
                    for i, j in pairs_ij
                ]
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    lab = label_propagation(cedges, rounds=4)
    bad = lab.where(
        F.col("label") != (F.col("node") - F.pmod("node", kq))
    ).count()
    n_lab = lab.count()
    dt = time.perf_counter() - t0
    ok = bad == 0 and n_lab == n_cliq * kq
    checks.append(ok)
    print(
        f"{'lpa 200k cliques':24} {dt:7.1f}s  rows={n_lab:>12,}  "
        f"[{'ok' if ok else 'bad=%d' % bad}]"
    )

    # Adamic-Adar on a planted bipartite graph (q106's operator):
    # 5M customers, each linked to suppliers (c%S, c%S+1) — every
    # contributor has degree exactly 2, so each ring pair must score
    # exactly (N/S)/ln(2) with n_common == N/S, and no other pair
    # may appear.
    import math as _math

    from paqarin_spark.operators import adamic_adar

    n_cust, n_supp = 5_000_000, 1_000
    t0 = time.perf_counter()
    bedges = (
        spark.range(n_cust)
        .select(
            F.col("id").alias("c"),
            F.pmod("id", n_supp).alias("s1"),
            (F.pmod("id", n_supp) + 1).alias("s2"),
        )
        .select(
            "c", F.explode(F.array(F.col("s1"), F.col("s2"))).alias("s")
        )
    )
    aa = adamic_adar(bedges, "c", "s", max_degree=8)
    per_pair = n_cust // n_supp
    expect = per_pair / _math.log(2.0)
    # one aggregation pass: total pairs + violations together (the
    # wedge join must not execute twice)
    row = aa.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            (
                (F.col("n_common") != per_pair)
                | (F.abs(F.col("aa_score") - F.lit(expect)) > 1e-6 * expect)
            ).cast("int")
        ).alias("bad"),
    ).collect()[0]
    bad_aa, n_pairs_aa = int(row["bad"] or 0), row["n_pairs"]
    dt = time.perf_counter() - t0
    ok = bad_aa == 0 and n_pairs_aa == n_supp
    checks.append(ok)
    print(
        f"{'adamic-adar 10M edges':24} {dt:7.1f}s  rows={n_pairs_aa:>12,}  "
        f"[{'ok' if ok else 'bad=%d pairs=%d' % (bad_aa, n_pairs_aa)}]"
    )

    # Rank-sum test at 20M rows over 100 groups (ev24's operator):
    # flag-1 values are planted strictly above flag-0 within every
    # group and all values are distinct, so U == n1*n0 exactly and z
    # equals the no-ties closed form in every group.
    from paqarin_spark.metrics.ranking import rank_sum_test

    n_rs, n_grp = 20_000_000, 100
    t0 = time.perf_counter()
    rs = spark.range(n_rs).select(
        F.pmod("id", n_grp).alias("grp"),
        (F.col("id") >= n_rs // 4).cast("int").alias("f"),
        # distinct per group; flag-1 ids sit strictly above flag-0
        F.col("id").cast("double").alias("v"),
    )
    out = rank_sum_test(rs, "grp", "f", "v").collect()
    dt = time.perf_counter() - t0
    ok = len(out) == n_grp
    for r in out:
        n1, n0 = r["n_flag"], r["n_rest"]
        u_exp = float(n1) * n0
        var = n1 * n0 * (n1 + n0 + 1) / 12.0
        z_exp = (u_exp - n1 * n0 / 2.0) / _math.sqrt(var)
        ok = ok and abs(r["u"] - u_exp) < 1e-6 and abs(
            r["z"] - z_exp
        ) < 1e-6
    checks.append(ok)
    print(
        f"{'rank-sum 20M rows':24} {dt:7.1f}s  rows={len(out):>12,}  "
        f"[{'ok' if ok else 'MISMATCH'}]"
    )

    # Audio DFT featurize across 200k real WAV assets (mm17's
    # operator): decode + 3-bin DFT per asset through the Arrow pass;
    # row count is exactly assets×3 and a spot asset's bin-1
    # magnitude matches a local numpy recompute.
    import numpy as _np

    from paqarin_spark.multimodal import wav_assets_from_ids, wav_dft_features

    n_wav = 200_000
    t0 = time.perf_counter()
    ids = spark.range(n_wav).select(F.col("id").alias("asset_id"))
    feats = wav_dft_features(
        wav_assets_from_ids(ids, "asset_id"), bins=(1, 2, 3)
    ).persist()
    n_feat = feats.count()
    spot = (
        feats.where((F.col("asset_id") == 12345) & (F.col("bin") == 1))
        .collect()[0]["magnitude"]
    )
    aid = 12345
    nn, step = aid % 100 + 1, aid % 7 + 1
    xs = _np.array(
        [((i * step * 37 + aid) % 4001) - 2000 for i in range(nn)],
        dtype=_np.float64,
    )
    idx = _np.arange(nn, dtype=_np.float64)
    ang = (2.0 * _math.pi * 1.0) * idx / float(nn)
    re = float((xs * _np.cos(ang)).sum())
    im = float((xs * _np.sin(ang)).sum())
    ref = _math.sqrt(re * re + im * im) / float(nn)
    feats.unpersist()
    dt = time.perf_counter() - t0
    ok = n_feat == n_wav * 3 and abs(spot - ref) < 1e-5
    checks.append(ok)
    print(
        f"{'wav dft 200k assets':24} {dt:7.1f}s  rows={n_feat:>12,}  "
        f"[{'ok' if ok else 'spot=%s ref=%s' % (spot, ref)}]"
    )

    # Trailing-7-day DAU via HLL register-window merges (q110's
    # pattern) at 10.2M user-days across 60 days: day d's active set
    # is the PLANTED residue class {u : u % 60 == d} of size A —
    # disjoint across days, so every full window's exact trailing DAU
    # is closed-form 7·A, the register
    # fan-out is calendar-bounded (54 windows × 2^p rows — all
    # registers occupied at 1.19M users/window), and the HLL estimate
    # must land within the p=10 error envelope on every window.
    from paqarin_spark.operators import (
        hll_estimate_from_registers,
        hll_registers,
    )

    a_day, n_days, p_hll = 170_000, 60, 10
    t0 = time.perf_counter()
    dated = spark.range(a_day * n_days).select(
        (F.col("id") % n_days).cast("int").alias("_di"),
        F.col("id").alias("user_id"),
    )
    regs = hll_registers(dated, "user_id", p=p_hll, group_by=["_di"])
    fanned = (
        regs.select(
            "idx",
            "r",
            F.explode(
                F.sequence(F.col("_di"), F.col("_di") + F.lit(6))
            ).alias("_tgt"),
        )
        .where((F.col("_tgt") >= 6) & (F.col("_tgt") <= n_days - 1))
        .groupBy("_tgt", "idx")
        .agg(F.max("r").alias("r"))
        .persist()
    )
    n_fanned = fanned.count()
    est = hll_estimate_from_registers(
        fanned, p=p_hll, group_by=["_tgt"], out_column="_est"
    )
    exact_dau = 7 * a_day
    row = est.agg(
        F.count(F.lit(1)).alias("n_win"),
        F.max(
            F.abs(F.col("_est") - F.lit(float(exact_dau)))
            / F.lit(float(exact_dau))
        ).alias("max_rel_err"),
    ).collect()[0]
    fanned.unpersist()
    dt = time.perf_counter() - t0
    n_win = n_days - 6
    ok = (
        n_fanned == n_win * (1 << p_hll)  # every register occupied
        and row["n_win"] == n_win
        and row["max_rel_err"] < 0.15  # ~4.6 sigma at p=10
    )
    checks.append(ok)
    print(
        f"{'trailing dau 10M udays':24} {dt:7.1f}s  rows={n_fanned:>12,}  "
        f"[{'ok' if ok else 'win=%s err=%s' % (row['n_win'], row['max_rel_err'])}]"
    )

    print("all invariants hold" if all(checks) else "INVARIANT FAILURES")
    return 0 if all(checks) else 1


if __name__ == "__main__":
    raise SystemExit(main())
