"""Probabilistic sketches for corpus-scale profiling (north-star
extensions, sketch family): HyperLogLog distinct counting, count-min
frequency estimation, and weighted sampling without replacement.

All three draw their randomness from the portable md5 construction
(functions.uniform_hash's contract), so — unlike library sketches
seeded per-JVM — every register, counter, and sample key is a pure
function of the DATA, reproducible on any cluster layout and
replayable in the DuckDB oracle. That is also the property that makes
sketches mergeable across shards: two workers hashing the same value
always touch the same register/bucket.

Scale posture: each sketch is one groupBy whose result is BOUNDED by
construction (2^p HLL registers, depth×width counters, top-k sample
keys) regardless of input rows — the classic
reduce-a-petabyte-to-a-page shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash60(col: F.Column) -> F.Column:
    """60-bit non-negative integer hash (md5 prefix) — the same bits
    uniform_hash scales to (0,1); kept integral here because HLL
    needs exact bit arithmetic (register index + leading-zero rank)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _cm_bucket(row: F.Column, value: F.Column, width: int) -> F.Column:
    """Count-min bucket for (hash row, value) — the ONE definition both
    the counter build and the probe side must share: the sketch's core
    invariant is that they hash identically."""
    return F.pmod(_hash60(F.concat_ws("#", row.cast("string"), value)), F.lit(width))


def hll_registers(
    df: DataFrame,
    column: str,
    p: int = 12,
    group_by: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog register table: idx = top ``p`` hash bits, register
    value = max over values of rho (1 + leading zeros of the remaining
    ``60-p`` bits). One groupBy; output bounded by groups × 2^p rows.
    Registers are mergeable with MAX — union two shards' register
    tables and re-aggregate to sketch the union."""
    groups = list(group_by or [])
    tail_bits = 60 - p
    mod = 1 << tail_bits
    h = _hash60(F.col(column).cast("string"))
    idx = F.expr(f"_h div {mod}")
    tail = F.pmod(F.col("_h"), F.lit(mod))
    # rho via bin(): length(bin(t)) = floor(log2 t)+1 exactly (integer
    # string arithmetic — no float log edge cases at powers of two);
    # an all-zero tail ranks tail_bits+1 by convention.
    rho = F.when(tail == 0, F.lit(tail_bits + 1)).otherwise(
        F.lit(tail_bits) - F.length(F.bin(tail)) + 1
    )
    return (
        df.select(*groups, h.alias("_h"))
        .select(*groups, idx.alias("idx"), rho.alias("rho"))
        .groupBy(*groups, "idx")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(
    df: DataFrame,
    column: str,
    p: int = 12,
    group_by: list[str] | None = None,
    out_column: str = "n_distinct_est",
) -> DataFrame:
    """HyperLogLog cardinality estimate (Flajolet et al. 2007) per
    group: harmonic-mean raw estimate with the small-range
    linear-counting correction. Every arithmetic step mirrors the SQL
    oracle expression for expression (alpha as the published formula,
    unseen registers contributing 2^0 to the harmonic sum)."""
    groups = list(group_by or [])
    regs = hll_registers(df, column, p=p, group_by=groups)
    return hll_estimate_from_registers(
        regs, p=p, group_by=groups, out_column=out_column
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    p: int = 12,
    group_by: list[str] | None = None,
    out_column: str = "n_distinct_est",
) -> DataFrame:
    """The register-table → estimate step, separated so register
    tables produced ELSEWHERE — a streaming complete-mode aggregation
    (st9), shards merged with MAX, a persisted sketch — finish through
    the identical arithmetic. ``regs`` must have the hll_registers
    shape: (group cols..., idx, r)."""
    groups = list(group_by or [])
    m = 1 << p
    # coalesce: an EMPTY ungrouped input still emits one global-agg
    # row (_nobs=0, _sobs=NULL); with 0 the math below falls into the
    # linear-counting branch and correctly reports cardinality 0
    # instead of NULL-poisoning the caller.
    per_group = regs.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("_nobs"),
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("r"))), F.lit(0.0)
        ).alias("_sobs"),
    )
    # alpha_m for m >= 128 (p >= 7); small-m variants are out of scope
    # for corpus-scale sketches.
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    v = F.lit(m) - F.col("_nobs")  # zero registers
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) / (
        F.col("_sobs") + v.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return per_group.select(*groups, est.alias(out_column))


def count_min_counters(
    items: DataFrame,
    column: str,
    depth: int = 4,
    width: int = 512,
    weight_column: str | None = None,
) -> DataFrame:
    """Count-min counter table: every item increments one bucket per
    hash row, bucket = md5(row#value) mod width. Output is AT MOST
    depth×width rows after one groupBy (only touched buckets appear —
    untouched buckets are implicitly 0) — the petabyte-to-a-page
    reduction; counters merge across shards by summing."""
    w = F.col(weight_column) if weight_column else F.lit(1)
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    return (
        items.select(F.col(column).cast("string").alias("_v"), w.alias("_w"), rows)
        .select(
            "row",
            _cm_bucket(F.col("row"), F.col("_v"), width).alias("bucket"),
            "_w",
        )
        .groupBy("row", "bucket")
        .agg(F.sum("_w").alias("counter"))
    )


def count_min_estimates(
    items: DataFrame,
    column: str,
    candidates: DataFrame,
    candidate_column: str,
    depth: int = 4,
    width: int = 512,
    weight_column: str | None = None,
) -> DataFrame:
    """Count-min frequency estimates for a candidate set: estimate =
    MIN over the depth rows of the candidate's bucket counter — an
    overestimate by construction (collisions only add). The counter
    table (depth×width rows) broadcasts to the candidate probe: the
    full corpus is touched exactly once, candidates never shuffle it."""
    counters = count_min_counters(
        items, column, depth=depth, width=width, weight_column=weight_column
    )
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    probes = candidates.select(
        F.col(candidate_column).alias("_cand"),
        F.col(candidate_column).cast("string").alias("_v"),
        rows,
    ).select(
        "_cand", "row", _cm_bucket(F.col("row"), F.col("_v"), width).alias("bucket")
    )
    # LEFT join + coalesce(0): a candidate hashing to an untouched
    # bucket has count-min estimate 0 on that row — an inner join
    # would drop the candidate (or inflate its MIN from the surviving
    # rows), breaking the estimate for items absent from the stream.
    return (
        probes.join(F.broadcast(counters), on=["row", "bucket"], how="left")
        .groupBy("_cand")
        .agg(
            F.min(F.coalesce(F.col("counter"), F.lit(0))).alias("cm_estimate")
        )
        .select(F.col("_cand").alias(candidate_column), "cm_estimate")
    )


def bloom_bits(
    df: DataFrame,
    column: str,
    m: int = 4096,
    hashes: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Portable BLOOM FILTER build — the fifth sketch shape, and the
    membership-pruning one: the set-bit positions of a Bloom filter
    over ``column``, as a DataFrame of ≤ m rows (column ``bit``).
    Bit positions come from the md5 construction
    (``md5('bloom#seed#h#' || value) % m`` for h in 0..hashes-1), so
    the filter is a pure function of the data — reproducible on any
    layout, mergeable across shards by plain UNION/DISTINCT (the
    bitwise-OR of bitsets in row form), and replayable in SQL.

    Scale posture: one distinct over ≤ m·hashes generated rows —
    output BOUNDED at m rows regardless of input; broadcast it to
    probe (``bloom_probe``) and a 100-TB fact scan prefilters against
    a build side that never exceeds the filter size. This is the
    semi-join pushdown shape Spark's runtime bloom join applies,
    made explicit, portable, and oracle-checkable."""
    hs = F.explode(F.array(*[F.lit(h) for h in range(hashes)])).alias("_h")
    return (
        df.select(F.col(column).cast("string").alias("_v"), hs)
        .select(
            F.pmod(
                _hash60(
                    F.concat_ws(
                        "#",
                        F.lit("bloom"),
                        F.lit(str(seed)),
                        F.col("_h").cast("string"),
                        F.col("_v"),
                    )
                ),
                F.lit(m),
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    df: DataFrame,
    column: str,
    bits: DataFrame,
    m: int = 4096,
    hashes: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Probe a :func:`bloom_bits` filter: appends ``bloom_hit``
    (1 when ALL ``hashes`` bit positions of ``column``'s value are
    set — no false negatives ever; false positives at the standard
    ``(1 - e^(-hashes·n/m))^hashes`` rate). Physical shape: the bit
    set is BOUNDED at m positions by construction, so it collects once
    (the k×d-centroids bounded-collect class — ≤ m longs, never row
    data) and the probe compiles to ``hashes`` InSet membership tests
    in one whole-stage-codegen projection: zero joins, zero shuffles,
    the fact scan stays a pure map — exactly what a 100-TB prefilter
    must be. Row multiplicity and the probe's column set are
    preserved; duplicate bit rows from a bare shard union() are
    deduplicated by the collect, so the no-false-negative contract
    holds for any bits input."""
    vals = sorted(
        int(r["bit"]) for r in bits.select("bit").distinct().collect()
    )
    if not vals:
        return df.withColumn("bloom_hit", F.lit(0))
    hit = F.lit(True)
    for h in range(hashes):
        pos = F.pmod(
            _hash60(
                F.concat_ws(
                    "#",
                    F.lit("bloom"),
                    F.lit(str(seed)),
                    F.lit(str(h)),
                    F.col(column).cast("string"),
                )
            ),
            F.lit(m),
        )
        hit = hit & pos.isin(vals)
    return df.withColumn("bloom_hit", hit.cast("int"))


def quantile_sketch(
    df: DataFrame,
    value_column: str,
    rank_columns: list[str],
    k: int = 256,
    group_by: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Mergeable QUANTILE sketch — the fourth petabyte-to-a-page shape
    beside HLL/count-min/weighted-sample: a bottom-k uniform sample
    per group. Each row's sort key is the portable md5 uniform of its
    ``rank_columns`` identity (value-independent → a uniform random
    permutation), and the k smallest keys per group are kept — a
    uniform sample WITHOUT replacement whose size is BOUNDED at k rows
    per group no matter how many rows the group holds. Merging shards
    is union + re-top-k (associative, order-free), the same property
    that makes the other sketches shard-safe.

    Output: (group..., _rk, value) with ``_rk`` the 1-based sample
    rank by (md5 key, identity) — feed it to
    :func:`quantile_estimate_from_sketch`, which every shard-merged or
    persisted sketch finishes through identically. Deterministic by
    construction, so estimates replay exactly in SQL — the sketch's
    ERROR is statistical (a k-sample's quantile error ~ O(1/sqrt(k))),
    but its VALUE is bit-reproducible."""
    from paqarin_spark.functions import uniform_hash
    from pyspark.sql import Window

    groups = list(group_by or [])
    ident = [F.col(c).cast("string") for c in rank_columns]
    u = uniform_hash(F.lit("qsketch"), F.lit(str(seed)), *ident)
    # ONE tie-break contract everywhere: the 53-bit _u double first,
    # then the STRING concat of the identity. Batch rank, the grouped
    # two-stage chunks, quantile_sketch_merge's re-top-k, and
    # streaming.stream_quantile_sketch's state all sort on exactly
    # this pair — a typed-vs-string divergence would let an _u
    # collision straddling the rank-k boundary make merge(shards)
    # disagree with sketch(full data). Oracle replays order by
    # (u, CAST(id AS VARCHAR)).
    tie = F.concat_ws("#", *ident)
    base = df.select(
        *groups,
        F.col(value_column).cast("double").alias("_v"),
        u.alias("_u"),
        tie.alias("_tie"),
    )
    if not groups:
        # global sketch: TakeOrderedAndProject (top-k, never a
        # single-partition window over the full data), then number
        # the ≤ k survivors
        base = base.orderBy("_u", "_tie").limit(k)
    else:
        # two-stage bounded top-k — the 100-TB posture: a bare
        # row_number window would SORT every group's full row set in
        # one task. Stage 1 takes each (group, input-partition)'s
        # bottom-k (chunk sorts bounded by partition sizing; exact —
        # any row dropped here is beaten by k rows in its own chunk,
        # so it can't be in the group's global bottom-k). Stage 2's
        # window then ranks ≤ partitions×k survivors per group. For
        # extreme partition counts, stack another level with
        # :func:`quantile_sketch_merge` — same algebra.
        st = F.struct(F.col("_u"), F.col("_tie"), F.col("_v"))
        base = (
            base.withColumn("_pid", F.spark_partition_id())
            .groupBy(*groups, "_pid")
            .agg(F.slice(F.sort_array(F.collect_list(st)), 1, k).alias("_top"))
            .select(*groups, F.explode("_top").alias("_s"))
            .select(
                *groups,
                F.col("_s._u").alias("_u"),
                F.col("_s._tie").alias("_tie"),
                F.col("_s._v").alias("_v"),
            )
        )
    w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy(
        F.col("_u"), F.col("_tie")
    )
    return (
        base.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(
            *groups,
            "_rk",
            F.col("_v").alias("value"),
            # retained sort key (+ identity tie-break) so shard
            # sketches MERGE by re-top-k on the stored key — see
            # quantile_sketch_merge
            F.col("_u").alias("_key"),
            F.col("_tie").alias("_tie"),
        )
    )


def quantile_sketch_merge(
    sketches: DataFrame,
    k: int,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Merge shard quantile sketches: union the shard samples (the
    caller unions the frames) and keep the k smallest stored keys per
    group. Because every shard kept ITS k smallest of the same global
    md5 permutation, the union's bottom-k equals the bottom-k of the
    full data — the merge is exact, associative, order-free AND
    idempotent (the HLL-MAX / count-min-SUM property in sample form):
    duplicate sample rows from overlapping or re-delivered shards
    collapse on the (key, tie) identity before ranking, so re-merging
    an already-included shard cannot evict a genuine row."""
    from pyspark.sql import Window

    groups = list(group_by or [])
    w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy(
        "_key", "_tie"
    )
    return (
        sketches.dropDuplicates([*groups, "_key", "_tie"])
        .withColumn("_mrk", F.row_number().over(w))
        .where(F.col("_mrk") <= k)
        .select(
            *groups, F.col("_mrk").alias("_rk"), "value", "_key", "_tie"
        )
    )


def quantile_estimate_from_sketch(
    sketch: DataFrame,
    probabilities: list[float],
    group_by: list[str] | None = None,
) -> DataFrame:
    """Finish a :func:`quantile_sketch` into per-group quantile
    estimates: type-1 (inverted-ECDF) quantiles of the SAMPLE —
    q(p) = v_(ceil(p·m)) over the m sorted sample values. Pure
    expressions (one sort_array over ≤ k values per group); the same
    arithmetic replays in SQL, so estimates hash-match the oracle."""
    groups = list(group_by or [])
    vals = F.sort_array(F.collect_list("value"))
    # count NON-NULL values: collect_list drops NULLs, so a count(*)
    # _m would shift every quantile index on a sample with NULL values
    aggs = [vals.alias("_vs"), F.count("value").alias("_m")]
    out = (
        sketch.groupBy(*[F.col(g) for g in groups]).agg(*aggs)
        if groups
        else sketch.groupBy().agg(*aggs)
    )
    sel = [*groups, F.col("_m").cast("long").alias("n_sample")]
    for p in probabilities:
        idx = F.greatest(
            F.ceil(F.lit(float(p)) * F.col("_m")).cast("int"), F.lit(1)
        )
        # try_element_at: an EMPTY ungrouped sketch aggregates to one
        # row with m=0 — estimates are NULL, not an index error
        sel.append(
            F.round(F.try_element_at(F.col("_vs"), idx), 6).alias(
                f"p{str(p).replace('0.', '').replace('.', '_')}"
            )
        )
    return out.select(*sel)


def weighted_sample(
    df: DataFrame,
    id_column: str,
    weight_column: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis via
    the exponential-clocks form): key = -ln(u)/w with u a portable
    md5 uniform keyed on (id, seed); the k smallest keys are the
    sample, distributed P(i first) = w_i/Σw. Deterministic under any
    layout; the global sort runs over (id, key) pairs only
    (TakeOrderedAndProject), never the payload.

    Rows with weight <= 0 are EXCLUDED (P ∝ w assigns them zero
    probability; arithmetically, -ln(u)/0 is NULL in non-ANSI Spark
    and NULLS sort FIRST ascending, which would guarantee zero-weight
    rows into every sample — the exact inverse of the contract)."""
    from paqarin_spark.functions import uniform_hash

    u = uniform_hash(
        F.lit("wsample"), F.col(id_column).cast("string"), F.lit(str(seed))
    )
    key = -F.log(u) / F.col(weight_column).cast("double")
    return (
        df.where(F.col(weight_column) > 0)
        .select(F.col(id_column), key.alias("_key"))
        .orderBy("_key")
        .limit(k)
        .select(id_column)
    )
