"""Rank-statistic evaluation metrics: exact ROC-AUC and Spearman rank
correlation, computed group-wise as pure relational plans.

Reference seam: the reference's evaluation layer reports regression
errors only (`paqarin/metrics/univariate_metrics.py:434-476`); every
production data pipeline that trains a quality/language classifier
(the tx45/ev17 family here) also reports threshold-free ranking
quality — AUC is the canonical one, and Spearman is the standard
monotone-association check between two quality signals.

Both metrics are EXACT, not sampled:

- Midranks (average ranks under ties) are half-integers, so we carry
  ``2·midrank`` as an integer: ``2·RANK() + tie_count − 1``.
- The Mann-Whitney identity gives AUC from the positive-class midrank
  sum alone; Spearman is Pearson on CENTERED midranks, where
  ``Σdx = Σdy = 0`` by construction so the naive ``n·Σxy − Σx·Σy``
  blowup (and its decimal overflow at extreme n, the q93 lesson)
  never appears.
- Every sum runs in ``decimal(38,0)``: per-row terms are ≤ 2n (AUC)
  or ≤ n² (Spearman products), so group sums stay within 38 digits to
  n ≈ 1e12 rows per group — bigint sums would overflow at ~2e9.

Scale shape: one window pass partitioned by the group key (ranks
distribute across groups; within-group volume is the usual window
skew bound, the q101 class), then one group-keyed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _midrank2(group_cols: list[str], order_col: str) -> F.Column:
    """2× the midrank of ``order_col`` within the group: for a tie
    group starting at RANK() r with c members, every member's midrank
    is r + (c−1)/2, so 2·midrank = 2r + c − 1 (always an integer)."""
    w_rank = Window.partitionBy(*group_cols).orderBy(order_col)
    w_tie = Window.partitionBy(*group_cols, order_col)
    return (
        F.lit(2) * F.rank().over(w_rank)
        + F.count(F.lit(1)).over(w_tie)
        - F.lit(1)
    ).cast("long")


def roc_auc(
    df: DataFrame,
    group_column: str,
    label_column: str,
    score_column: str,
) -> DataFrame:
    """Exact ROC-AUC per group via the Mann-Whitney rank-sum identity
    with midrank tie handling (equivalent to the trapezoidal area
    under the full-resolution ROC curve):

        AUC = (Σ_{y=1} midrank − P(P+1)/2) / (P·N)

    Carried as integers: ``2·Σmidrank − P·(P+1)·... `` — concretely
    ``auc = (S2 − P(P+1)) / (2PN)`` where S2 = Σ_{y=1} 2·midrank.
    Groups with no positives or no negatives return NULL (AUC is
    undefined there, not 0.5 — a silent 0.5 would hide a broken
    label). Rows with NULL/NaN score or NULL label are dropped (they
    have no rank).

    Output: (group, n_pos, n_neg, auc[6dp]).
    """
    base = df.select(
        F.col(group_column).alias("grp"),
        F.col(label_column).cast("int").alias("_y"),
        F.col(score_column).cast("double").alias("_s"),
    ).where(
        F.col("_y").isNotNull()
        & F.col("_s").isNotNull()
        & ~F.isnan("_s")
    )
    ranked = base.select(
        "grp", "_y", _midrank2(["grp"], "_s").alias("_mr2")
    )
    agg = ranked.groupBy("grp").agg(
        F.sum("_y").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("_y")).cast("long").alias("n_neg"),
        F.sum(
            F.when(F.col("_y") == 1, F.col("_mr2")).otherwise(0)
            .cast(_DEC)
        ).alias("_s2"),
    )
    # accumulation is exact decimal; the final scalar identity runs in
    # DOUBLE (decimal division scale rules differ across engines —
    # identical IEEE ops replay bit-exactly instead)
    p = F.col("n_pos").cast("double")
    n = F.col("n_neg").cast("double")
    auc = (F.col("_s2").cast("double") - p * (p + F.lit(1.0))) / (
        F.lit(2.0) * p * n
    )
    return agg.select(
        F.col("grp").alias(group_column),
        "n_pos",
        "n_neg",
        F.round(
            F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc),
            6,
        ).alias("auc"),
    )


def kendall_tau(
    df: DataFrame,
    group_column: str,
    order_column: str,
    x_column: str,
    y_column: str,
) -> DataFrame:
    """Exact Kendall tau-b per group via the all-pairs sign census:

        tau_b = (C − D) / sqrt((n0 − Tx)·(n0 − Ty))

    where over the n0 = n(n−1)/2 unordered pairs C/D count strictly
    concordant/discordant sign products and Tx/Ty count pairs tied in
    x (resp. y) regardless of the other variable. Every count is an
    exact integer carried in decimal(38,0); only the final
    sqrt/divide runs in double (6dp).

    DELIBERATELY O(n²) pairs per group — this is the rollup-series
    statistic (tau on a daily/bucket series whose length is fixed by
    the CALENDAR, not the data volume; a year is 365 rows → 66k pairs
    per group forever). For raw-row-scale association use
    :func:`spearman_rho`, which is one window pass. ``order_column``
    must be unique within a group (it is the pair identity that keeps
    each unordered pair counted exactly once).

    Output: (group, n, tau[6dp]). Groups with fewer than two usable
    rows have no pairs and return (group, n, NULL) — kept, not
    dropped, so callers can join the output back to the group list
    (the spearman_rho/rank_sum_test degenerate-group contract).
    Comparisons run on the columns' EXACT native types (bigint,
    decimal) — pass doubles through a NaN filter first if the data
    can carry NaN (NaN compares false on every branch and would
    silently count as a double tie).
    """
    cen = kendall_census(df, group_column, order_column, x_column, y_column)
    n0 = F.col("_n0").cast(_DEC)
    denom = (n0 - F.col("_tx")).cast("double") * (
        n0 - F.col("_ty")
    ).cast("double")
    tau = (F.col("_c") - F.col("_d")).cast("double") / F.sqrt(denom)
    return cen.select(
        F.col("grp").alias(group_column),
        "n",
        F.round(F.when(denom > 0, tau), 6).alias("tau"),
    )


def kendall_census(
    df: DataFrame,
    group_column: str,
    order_column: str,
    x_column: str,
    y_column: str,
) -> DataFrame:
    """The shared all-pairs sign census behind :func:`kendall_tau`
    and gen11's copula fit: per group, exact decimal(38,0) pair
    counts (_c concordant, _d discordant, _tx/_ty ties, _n0 pairs)
    plus the usable row count n. Groups with no pairs keep a row
    with zeroed censuses (left join) so degenerate groups stay
    visible instead of vanishing from the output.

    Rows with a NULL order value are filtered OUT (a NULL ``_i``
    would pass a NULL-x/y-only filter, count toward n, yet never
    form a pair — ``_i < _ib`` is NULL — silently biasing the
    census). ``order_column`` must also be UNIQUE within a group:
    duplicate order values drop their pair the same silent way
    (neither ``<`` direction holds), which this function cannot
    detect cheaply — callers own that invariant (every in-repo
    caller orders by a calendar day or row_number)."""
    base = df.select(
        F.col(group_column).alias("grp"),
        F.col(order_column).alias("_i"),
        F.col(x_column).alias("_x"),
        F.col(y_column).alias("_y"),
    ).where(
        F.col("_i").isNotNull()
        & F.col("_x").isNotNull()
        & F.col("_y").isNotNull()
    )
    a = base.select("grp", "_i", "_x", "_y")
    b = base.select(
        F.col("grp").alias("grp_b"),
        F.col("_i").alias("_ib"),
        F.col("_x").alias("_xb"),
        F.col("_y").alias("_yb"),
    )
    pairs = a.join(
        b, (F.col("grp") == F.col("grp_b")) & (F.col("_i") < F.col("_ib"))
    )
    one = F.lit(1).cast(_DEC)
    zero = F.lit(0).cast(_DEC)
    dx = F.when(F.col("_x") < F.col("_xb"), -1).when(
        F.col("_x") > F.col("_xb"), 1
    ).otherwise(0)
    dy = F.when(F.col("_y") < F.col("_yb"), -1).when(
        F.col("_y") > F.col("_yb"), 1
    ).otherwise(0)
    cen = pairs.groupBy("grp").agg(
        F.sum(F.when(dx * dy == 1, one).otherwise(zero)).alias("_c"),
        F.sum(F.when(dx * dy == -1, one).otherwise(zero)).alias("_d"),
        F.sum(F.when(dx == 0, one).otherwise(zero)).alias("_tx"),
        F.sum(F.when(dy == 0, one).otherwise(zero)).alias("_ty"),
        F.count(F.lit(1)).alias("_n0"),
    )
    counts = base.groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
    return counts.join(cen, "grp", "left").select(
        "grp",
        "n",
        F.coalesce("_c", F.lit(0).cast(_DEC)).alias("_c"),
        F.coalesce("_d", F.lit(0).cast(_DEC)).alias("_d"),
        F.coalesce("_tx", F.lit(0).cast(_DEC)).alias("_tx"),
        F.coalesce("_ty", F.lit(0).cast(_DEC)).alias("_ty"),
        F.coalesce("_n0", F.lit(0).cast("long")).alias("_n0"),
    )


def rank_sum_test(
    df: DataFrame,
    group_column: str,
    flag_column: str,
    value_column: str,
) -> DataFrame:
    """Wilcoxon–Mann–Whitney rank-sum test per group (two-sample,
    flag=1 vs flag=0 within the group), tie-corrected normal
    approximation:

        U  = S1 − n1(n1+1)/2        (S1 = Σ midranks of flag-1 rows)
        z  = (U − n1·n0/2) / sqrt(n1·n0/12 · ((n+1) − ΣT/(n(n−1))))

    with ΣT = Σ_ties (t³ − t) over value-tie groups. Midranks ride
    the shared doubled-midrank window (:func:`_midrank2`); every sum
    runs in decimal(38,0) (t³ ≤ n³ stays inside 38 digits to n≈1e12)
    and only the final z runs in double. Groups where either sample
    is empty, or where all values tie (σ = 0), return NULL z — a
    silent 0 would read as "no effect" where the test is undefined.

    The distribution-free two-sample drift check beside ev6's KS
    statistic: KS gives the max CDF gap, the rank-sum z gives a
    calibrated stochastic-dominance score. Output:
    (group, n_flag, n_rest, u[=U of flag-1], z[6dp]).
    """
    base = df.select(
        F.col(group_column).alias("grp"),
        F.col(flag_column).cast("int").alias("_f"),
        F.col(value_column).cast("double").alias("_v"),
    ).where(
        F.col("_f").isNotNull()
        & F.col("_v").isNotNull()
        & ~F.isnan("_v")
    )
    ranked = base.select(
        "grp", "_f", "_v", _midrank2(["grp"], "_v").alias("_mr2")
    )
    # value-tie census: one row per (grp, value) with its tie size
    ties = (
        base.groupBy("grp", "_v")
        .agg(F.count(F.lit(1)).cast(_DEC).alias("_t"))
        .groupBy("grp")
        .agg(
            F.sum(
                F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")
            ).alias("_tsum")
        )
    )
    agg = ranked.groupBy("grp").agg(
        F.sum("_f").cast("long").alias("n_flag"),
        (F.count(F.lit(1)) - F.sum("_f")).cast("long").alias("n_rest"),
        F.sum(
            F.when(F.col("_f") == 1, F.col("_mr2")).otherwise(0).cast(_DEC)
        ).alias("_s2"),
    )
    n1 = F.col("n_flag").cast("double")
    n0 = F.col("n_rest").cast("double")
    n = n1 + n0
    u = (F.col("_s2").cast("double") - n1 * (n1 + F.lit(1.0))) / F.lit(2.0)
    mu = n1 * n0 / F.lit(2.0)
    var = (
        n1
        * n0
        / F.lit(12.0)
        * (
            (n + F.lit(1.0))
            - F.col("_tsum").cast("double") / (n * (n - F.lit(1.0)))
        )
    )
    z = (u - mu) / F.sqrt(var)
    return (
        agg.join(ties, "grp")
        .select(
            F.col("grp").alias(group_column),
            "n_flag",
            "n_rest",
            F.round(
                F.when((F.col("n_flag") > 0) & (F.col("n_rest") > 0), u), 6
            ).alias("u"),
            F.round(
                F.when(
                    (F.col("n_flag") > 0) & (F.col("n_rest") > 0) & (var > 0),
                    z,
                ),
                6,
            ).alias("z"),
        )
    )


def spearman_rho(
    df: DataFrame,
    group_column: str,
    x_column: str,
    y_column: str,
) -> DataFrame:
    """Exact Spearman rank correlation per group: Pearson on midranks
    (the tie-correct definition), computed on CENTERED doubled
    midranks ``d = 2·midrank − (n+1)`` so Σd = 0 identically and

        ρ = Σ dx·dy / sqrt(Σ dx² · Σ dy²)

    needs no ``n·Σxy − Σx·Σy`` cross terms — products stay ≤ n² per
    row and sums ≤ n³, inside decimal(38,0) to n ≈ 1e12. The single
    sqrt/divide runs in double at the very end (round 6dp). Groups
    where either variable is constant (zero rank variance) return
    NULL. Rows with a NULL/NaN in either variable are dropped.

    Output: (group, n, rho[6dp]).
    """
    base = df.select(
        F.col(group_column).alias("grp"),
        F.col(x_column).cast("double").alias("_x"),
        F.col(y_column).cast("double").alias("_y"),
    ).where(
        F.col("_x").isNotNull()
        & ~F.isnan("_x")
        & F.col("_y").isNotNull()
        & ~F.isnan("_y")
    )
    w_g = Window.partitionBy("grp")
    centered = base.select(
        "grp",
        (
            _midrank2(["grp"], "_x")
            - (F.count(F.lit(1)).over(w_g) + F.lit(1))
        ).alias("_dx"),
        (
            _midrank2(["grp"], "_y")
            - (F.count(F.lit(1)).over(w_g) + F.lit(1))
        ).alias("_dy"),
    )
    # cast BEFORE multiplying: dx·dy reaches n², past int64 at
    # n ≈ 3e9 rows per group — the product itself must run in decimal
    dx = F.col("_dx").cast(_DEC)
    dy = F.col("_dy").cast(_DEC)
    agg = centered.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx * dy).alias("_sxy"),
        F.sum(dx * dx).alias("_sxx"),
        F.sum(dy * dy).alias("_syy"),
    )
    rho = F.col("_sxy").cast("double") / F.sqrt(
        F.col("_sxx").cast("double") * F.col("_syy").cast("double")
    )
    return agg.select(
        F.col("grp").alias(group_column),
        "n",
        F.round(
            F.when(
                (F.col("_sxx") > 0) & (F.col("_syy") > 0), rho
            ),
            6,
        ).alias("rho"),
    )


def cramer_von_mises(
    df: DataFrame,
    group_column: str,
    flag_column: str,
    value_column: str,
    order_column: str,
) -> DataFrame:
    """Two-sample Cramér–von Mises statistic per group (flag=1 vs
    flag=0 within the group), Anderson's rank form:

        U = n·Σ_i (r_i − i)²  +  m·Σ_j (s_j − j)²
        T = U / (n·m·(n+m))  −  (4nm − 1) / (6(n+m))

    where r_i (s_j) are the COMBINED-sample ranks of the flag-1
    (flag-0) values and i (j) their within-sample ranks. T weighs the
    INTEGRATED squared gap between the two empirical CDFs — the omnibus
    distribution-equality test beside the KS sup-gap (ev6) and the
    rank-sum location test (ev24): KS sees the largest deviation, CvM
    accumulates all of them.

    Ranks are ROW_NUMBERs under the deterministic total order
    (value, order_column) — the operational tie convention (classical
    CvM assumes continuous data; tie-broken ranks make the statistic
    well-defined and identically replayable on both engines, the
    ev23 discipline). Every squared gap is an exact integer summed in
    decimal(38,0) ((r−i)² ≤ N², so sums stay inside 38 digits to
    N≈1e12); only the final two-term T expression runs in double.
    Groups where either sample is empty return NULL t (the
    rank_sum_test degenerate contract). NULL values or order keys are
    filtered (the kendall_census contract).
    """
    base = df.select(
        F.col(group_column).alias("grp"),
        F.col(flag_column).cast("int").alias("_f"),
        F.col(value_column).alias("_v"),
        F.col(order_column).alias("_k"),
    ).where(
        F.col("_f").isNotNull()
        & F.col("_v").isNotNull()
        & F.col("_k").isNotNull()
    )
    w_all = Window.partitionBy("grp").orderBy("_v", "_k")
    w_own = Window.partitionBy("grp", "_f").orderBy("_v", "_k")
    gap = (
        F.row_number().over(w_all) - F.row_number().over(w_own)
    ).cast("long")
    # cast to decimal BEFORE squaring: a long*long multiply silently
    # wraps once a group exceeds ~3.04e9 rows (gap^2 > 2^63).
    # decimal(19,0) factors make the product land exactly in
    # decimal(38,0) on BOTH engines (DuckDB rejects multiplies whose
    # result precision exceeds 38), keeping the statistic exact to
    # N~1e12
    gap_d = gap.cast("decimal(19,0)")
    d2 = (gap_d * gap_d).cast(_DEC)
    one = F.lit(1).cast(_DEC)
    zero = F.lit(0).cast(_DEC)
    cen = base.select("grp", "_f", d2.alias("_d2")).groupBy("grp").agg(
        F.sum(F.when(F.col("_f") == 1, one).otherwise(zero)).alias("_n1"),
        F.sum(F.when(F.col("_f") == 0, one).otherwise(zero)).alias("_n0"),
        F.sum(
            F.when(F.col("_f") == 1, F.col("_d2")).otherwise(zero)
        ).alias("_u1"),
        F.sum(
            F.when(F.col("_f") == 0, F.col("_d2")).otherwise(zero)
        ).alias("_u0"),
    )
    n1d = F.col("_n1").cast("double")
    n0d = F.col("_n0").cast("double")
    # the U combination runs in DOUBLE on identically-cast factors
    # (n·u1 in decimal would need precision 2·38, which DuckDB's
    # decimal multiply rejects); determinism needs only the SUMS
    # exact — the final scalar ops replay as identical IEEE doubles
    u = n1d * F.col("_u1").cast("double") + n0d * F.col("_u0").cast(
        "double"
    )
    t = u / (n1d * n0d * (n1d + n0d)) - (
        4.0 * n1d * n0d - 1.0
    ) / (6.0 * (n1d + n0d))
    return cen.select(
        F.col("grp").alias(group_column),
        F.col("_n1").cast("long").alias("n_flag"),
        F.col("_n0").cast("long").alias("n_rest"),
        F.round(
            F.when((F.col("_n1") > 0) & (F.col("_n0") > 0), t), 6
        ).alias("t_cvm"),
    )
