"""Sketch operators (operators/sketch.py): HyperLogLog, count-min,
weighted sampling. The oracle queries (q73/tx33/tx35) pin cross-engine
value parity; these tests pin the SKETCH GUARANTEES — estimation
error, overestimate-only, mergeability, and sampling bias — which the
hash-match alone can't certify."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paqarin_spark.operators import (
    count_min_counters,
    count_min_estimates,
    hll_estimate,
    hll_registers,
    weighted_sample,
)


def test_hll_estimate_within_error_bound(spark):
    # 10,000 distinct values at p=12 (m=4096): standard error is
    # 1.04/sqrt(m) ~ 1.6%; assert a generous 5% envelope.
    df = spark.range(10_000).select(F.col("id").alias("v"))
    est = hll_estimate(df, "v", p=12).first()["n_distinct_est"]
    assert est == pytest.approx(10_000, rel=0.05)


def test_hll_ignores_duplicates(spark):
    # 100k rows over 1,000 distinct values must sketch ~1,000, not 100k.
    df = spark.range(100_000).select((F.col("id") % 1000).alias("v"))
    est = hll_estimate(df, "v", p=12).first()["n_distinct_est"]
    assert est == pytest.approx(1000, rel=0.05)


def test_hll_registers_merge_across_shards(spark):
    # The union of two shards' register tables, re-aggregated with
    # MAX, must equal the registers of the union — the mergeability
    # property that makes the sketch shard-parallel.
    a = spark.range(0, 6000).select(F.col("id").alias("v"))
    b = spark.range(4000, 10_000).select(F.col("id").alias("v"))
    whole = hll_registers(a.unionByName(b), "v", p=10)
    merged = (
        hll_registers(a, "v", p=10)
        .unionByName(hll_registers(b, "v", p=10))
        .groupBy("idx")
        .agg(F.max("r").alias("r"))
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0


def test_count_min_never_underestimates(spark):
    df = spark.range(20_000).select(
        (F.pmod(F.col("id") * 7919, F.lit(300))).cast("string").alias("v")
    )
    true = df.groupBy("v").agg(F.count(F.lit(1)).alias("n_true"))
    est = count_min_estimates(df, "v", true, "v", depth=4, width=64)
    joined = true.join(est, "v")
    assert joined.where(F.col("cm_estimate") < F.col("n_true")).count() == 0
    # width 64 << 300 keys forces collisions: at least one strict
    # overestimate proves the estimates come from shared buckets,
    # not a hidden exact count.
    assert joined.where(F.col("cm_estimate") > F.col("n_true")).count() > 0


def test_count_min_counter_table_is_bounded(spark):
    df = spark.range(50_000).select(F.col("id").cast("string").alias("v"))
    counters = count_min_counters(df, "v", depth=4, width=32)
    assert counters.count() <= 4 * 32
    # total mass per row equals the stream length
    per_row = counters.groupBy("row").agg(F.sum("counter").alias("s"))
    assert all(r["s"] == 50_000 for r in per_row.collect())


def test_count_min_exact_when_no_collisions(spark):
    # 8 keys into width 4096: collisions are overwhelmingly unlikely,
    # so every estimate must be exact.
    df = spark.range(1000).select((F.col("id") % 8).cast("string").alias("v"))
    true = df.groupBy("v").agg(F.count(F.lit(1)).alias("n_true"))
    est = count_min_estimates(df, "v", true, "v", depth=4, width=4096)
    bad = true.join(est, "v").where(F.col("cm_estimate") != F.col("n_true"))
    assert bad.count() == 0


def test_count_min_estimate_zero_for_absent_candidate(spark):
    # A candidate never seen in the stream must estimate 0 (or a small
    # collision count) — NOT vanish from the output: with a wide
    # sketch its buckets are untouched, which an inner join would drop.
    df = spark.range(100).select(F.col("id").cast("string").alias("v"))
    cand = spark.createDataFrame([("never-seen-token",)], "v string")
    est = count_min_estimates(df, "v", cand, "v", depth=4, width=65536)
    rows = est.collect()
    assert len(rows) == 1
    assert rows[0]["cm_estimate"] == 0


def test_hll_estimate_empty_input_is_zero(spark):
    df = spark.range(0).select(F.col("id").alias("v"))
    est = hll_estimate(df, "v", p=10).first()["n_distinct_est"]
    assert est == 0.0


def test_weighted_sample_excludes_nonpositive_weights(spark):
    # Zero/negative weights have probability 0 — they must never be
    # sampled (naively, -ln(u)/0 = NULL would sort FIRST and win).
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 50, F.lit(0.0))
        .when(F.col("id") < 60, F.lit(-1.0))
        .otherwise(F.lit(1.0))
        .alias("w"),
    )
    picked = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", k=30, seed=1).collect()}
    assert all(d >= 60 for d in picked)
    assert len(picked) == 30


def test_mp4_sample_table_rejects_poisoned_fixed_size_stsz():
    # A crafted stsz claiming 4 billion fixed-size samples must fail
    # the bound check BEFORE materializing the sizes list.
    import struct

    from paqarin_spark.multimodal import (
        _mp4_box,
        encode_mp4_with_samples,
        parse_mp4_sample_table,
    )

    content = encode_mp4_with_samples([b"\x01" * 4, b"\x02" * 4])
    # splice a same-length poisoned stsz (fixed_size=1, n=0xFFFFFFFF,
    # zero-padded payload so the box framing stays intact and the
    # parser reaches the fixed-size branch with the huge count)
    real_stsz = _mp4_box(
        b"stsz", struct.pack(">BxxxII", 0, 0, 2) + struct.pack(">2I", 4, 4)
    )
    poisoned_stsz = _mp4_box(
        b"stsz", struct.pack(">BxxxII", 0, 1, 0xFFFFFFFF) + b"\x00" * 8
    )
    assert len(poisoned_stsz) == len(real_stsz)
    assert real_stsz in content
    poisoned = content.replace(real_stsz, poisoned_stsz)
    import time

    t0 = time.perf_counter()
    assert parse_mp4_sample_table(poisoned) is None
    assert time.perf_counter() - t0 < 1.0  # no giant allocation


def test_weighted_sample_is_deterministic_and_biased(spark):
    # 100 heavy ids (weight 100) vs 900 light ids (weight 1): a 50-draw
    # weighted sample must lean overwhelmingly heavy (expected ~46).
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, F.lit(100.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    s1 = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", k=50, seed=3).collect()}
    s2 = {
        r["doc_id"]
        for r in weighted_sample(
            df.repartition(16), "doc_id", "w", k=50, seed=3
        ).collect()
    }
    assert s1 == s2  # layout-independent
    heavy = sum(1 for d in s1 if d < 100)
    assert heavy >= 30
    s3 = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", k=50, seed=4).collect()}
    assert s3 != s1  # seed actually matters


def test_quantile_sketch_bounded_and_mergeable(spark):
    """Bottom-k md5-rank sampling: per-group size bounded at k, and
    merging two shard sketches (union + re-top-k) equals the sketch of
    the union — the shard-safety property of the whole family."""
    import pyspark.sql.functions as F

    from paqarin_spark.operators import quantile_sketch

    df = spark.range(5000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("g"),
        (F.pmod(F.hash("id"), F.lit(1000)) / 10.0).alias("v"),
    )
    sk = quantile_sketch(df, "v", ["event_id"], k=64, group_by=["g"])
    sizes = sk.groupBy("g").count().collect()
    assert all(r["count"] == 64 for r in sizes)
    # shard merge: sketch(shard1) ∪ sketch(shard2) re-top-k == sketch(all)
    s1 = quantile_sketch(
        df.where(F.col("event_id") < 2500), "v", ["event_id"], k=64,
        group_by=["g"],
    )
    s2 = quantile_sketch(
        df.where(F.col("event_id") >= 2500), "v", ["event_id"], k=64,
        group_by=["g"],
    )
    # TRUE merge: re-top-k over the stored keys of the shard samples
    # must equal the sketch of the full data, row for row
    from paqarin_spark.operators import quantile_sketch_merge

    merged = quantile_sketch_merge(s1.unionByName(s2), k=64, group_by=["g"])
    a = sorted((r["g"], r["_rk"], r["value"]) for r in merged.collect())
    b = sorted((r["g"], r["_rk"], r["value"]) for r in sk.collect())
    assert a == b


def test_quantile_sketch_exact_when_small(spark):
    """n <= k: the sample IS the data, so estimates are the exact
    type-1 quantiles."""
    import pyspark.sql.functions as F

    from paqarin_spark.operators import (
        quantile_estimate_from_sketch,
        quantile_sketch,
    )

    df = spark.range(100).select(
        F.col("id").alias("event_id"), (F.col("id") + 1.0).alias("v")
    )
    sk = quantile_sketch(df, "v", ["event_id"], k=256)
    est = quantile_estimate_from_sketch(sk, [0.5, 0.99]).first()
    assert est["n_sample"] == 100
    assert est["p5"] == 50.0   # ceil(0.5*100) = 50th of 1..100
    assert est["p99"] == 99.0  # ceil(0.99*100) = 99


def test_quantile_sketch_layout_independent(spark):
    import pyspark.sql.functions as F

    from paqarin_spark.operators import quantile_sketch

    df = spark.range(3000).select(
        F.col("id").alias("event_id"),
        (F.pmod(F.hash("id"), F.lit(500)) * 1.0).alias("v"),
    )
    a = sorted(
        (r["_rk"], r["value"])
        for r in quantile_sketch(df.coalesce(1), "v", ["event_id"], k=32).collect()
    )
    b = sorted(
        (r["_rk"], r["value"])
        for r in quantile_sketch(
            df.repartition(32), "v", ["event_id"], k=32
        ).collect()
    )
    assert a == b


def test_bloom_no_false_negatives_and_bounded_bits(spark):
    """Every member must hit (no false negatives — the Bloom
    contract); the bit table never exceeds m rows; shard merge is
    plain union+distinct."""
    import pyspark.sql.functions as F

    from paqarin_spark.operators import bloom_bits, bloom_probe

    members = spark.range(200).select(F.col("id").alias("k"))
    bits = bloom_bits(members, "k", m=512, hashes=3)
    assert bits.count() <= 512
    probe = spark.range(1000).select(F.col("id").alias("k"))
    out = bloom_probe(probe, "k", bits, m=512, hashes=3)
    assert out.count() == 1000  # row multiplicity preserved
    hits = {r["k"] for r in out.where(F.col("bloom_hit") == 1).collect()}
    assert set(range(200)) <= hits  # no false negatives
    # false positives exist at this load factor but stay a minority
    assert len(hits) < 1000
    # shard merge: union of shard bit tables == bits of the union
    b1 = bloom_bits(members.where("k < 100"), "k", m=512, hashes=3)
    b2 = bloom_bits(members.where("k >= 100"), "k", m=512, hashes=3)
    merged = b1.unionByName(b2).distinct()
    assert merged.exceptAll(bits).count() == 0
    assert bits.exceptAll(merged).count() == 0
