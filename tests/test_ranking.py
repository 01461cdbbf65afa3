"""Exact rank-statistic metrics: ROC-AUC and Spearman (metrics.ranking)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

from paqarin_spark.metrics.ranking import (
    kendall_tau,
    rank_sum_test,
    roc_auc,
    spearman_rho,
)


def _auc_numpy(y, s):
    """Brute-force pairwise AUC with 0.5 tie credit."""
    y, s = np.asarray(y), np.asarray(s)
    pos, neg = s[y == 1], s[y == 0]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def _spearman_numpy(x, y):
    """Midrank Spearman via Pearson on average ranks."""
    def midranks(v):
        v = np.asarray(v, dtype=float)
        order = np.argsort(v, kind="stable")
        r = np.empty(len(v))
        i = 0
        sv = v[order]
        while i < len(v):
            j = i
            while j + 1 < len(v) and sv[j + 1] == sv[i]:
                j += 1
            r[order[i:j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return r
    rx, ry = midranks(x), midranks(y)
    rx, ry = rx - rx.mean(), ry - ry.mean()
    return float((rx * ry).sum() / np.sqrt((rx**2).sum() * (ry**2).sum()))


def test_roc_auc_closed_forms_and_ties(spark):
    """Perfect separation → 1, inverted → 0, heavy ties → the exact
    pairwise 0.5-credit value; a single-class group is NULL (not a
    silent 0.5); NaN scores are dropped."""
    rows = []
    # group A: perfect separation
    rows += [("A", 1, 10.0 + i) for i in range(5)]
    rows += [("A", 0, float(i)) for i in range(5)]
    # group B: inverted
    rows += [("B", 1, float(i)) for i in range(4)]
    rows += [("B", 0, 10.0 + i) for i in range(4)]
    # group C: ties across classes
    c_y = [1, 1, 0, 0, 1, 0, 0, 1]
    c_s = [2.0, 2.0, 2.0, 1.0, 3.0, 3.0, 0.0, 1.0]
    rows += [("C", y, s) for y, s in zip(c_y, c_s)]
    # group D: positives only → undefined
    rows += [("D", 1, 1.0), ("D", 1, 2.0)]
    # NaN score must be dropped, not ranked
    rows += [("A", 1, float("nan"))]
    df = spark.createDataFrame(rows, "grp string, label int, score double")
    got = {
        r["grp"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in roc_auc(df, "grp", "label", "score").collect()
    }
    assert got["A"] == (5, 5, 1.0)
    assert got["B"] == (4, 4, 0.0)
    assert got["C"][2] == pytest.approx(_auc_numpy(c_y, c_s), abs=5e-7)
    assert got["D"] == (2, 0, None)


def test_roc_auc_matches_pairwise_on_random_data(spark):
    """Rank-sum identity == brute-force pairwise count on md5-free
    deterministic pseudo-random data with duplicated scores."""
    rng = np.random.RandomState(7)
    y = (rng.rand(300) < 0.4).astype(int)
    s = np.round(rng.rand(300) * 20, 1)  # coarse grid → many ties
    df = spark.createDataFrame(
        [("g", int(a), float(b)) for a, b in zip(y, s)],
        "grp string, label int, score double",
    )
    row = roc_auc(df, "grp", "label", "score").collect()[0]
    assert row["auc"] == pytest.approx(_auc_numpy(y, s), abs=5e-7)


def test_spearman_closed_forms(spark):
    """Monotone → 1, anti-monotone → -1, constant variable → NULL, and
    a tied sample matches the midrank-Pearson reference."""
    rows = []
    rows += [("up", float(i), float(i * i)) for i in range(10)]
    rows += [("down", float(i), float(-3 * i + 2)) for i in range(10)]
    rows += [("flat", 1.0, float(i)) for i in range(6)]
    tx = [1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 4.0, 5.0]
    ty = [2.0, 1.0, 3.0, 3.0, 5.0, 4.0, 4.0, 6.0]
    rows += [("tied", a, b) for a, b in zip(tx, ty)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    got = {r["grp"]: (r["n"], r["rho"]) for r in
           spearman_rho(df, "grp", "x", "y").collect()}
    assert got["up"] == (10, 1.0)
    assert got["down"] == (10, -1.0)
    assert got["flat"] == (6, None)
    assert got["tied"][1] == pytest.approx(
        _spearman_numpy(tx, ty), abs=5e-7
    )


def _tau_b_numpy(x, y):
    """Brute-force tau-b from the pair census."""
    x, y = np.asarray(x), np.asarray(y)
    c = d = tx = ty = 0
    n = len(x)
    for i in range(n):
        for j in range(i + 1, n):
            dx = np.sign(x[j] - x[i])
            dy = np.sign(y[j] - y[i])
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    n0 = n * (n - 1) // 2
    return (c - d) / np.sqrt((n0 - tx) * (n0 - ty))


def test_kendall_tau_closed_forms(spark):
    """Monotone → 1, anti-monotone → −1, ties match the brute-force
    pair census, all-tied x → NULL (zero denominator)."""
    rows = []
    rows += [("up", i, float(i), float(2 * i)) for i in range(8)]
    rows += [("down", i, float(i), float(-i)) for i in range(8)]
    tx_ = [1.0, 2.0, 2.0, 3.0, 3.0, 4.0]
    ty_ = [1.0, 3.0, 2.0, 2.0, 5.0, 4.0]
    rows += [("tied", i, a, b) for i, (a, b) in enumerate(zip(tx_, ty_))]
    rows += [("flat", i, 7.0, float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "grp string, i int, x double, y double")
    got = {r["grp"]: (r["n"], r["tau"]) for r in
           kendall_tau(df, "grp", "i", "x", "y").collect()}
    assert got["up"] == (8, 1.0)
    assert got["down"] == (8, -1.0)
    assert got["tied"][1] == pytest.approx(_tau_b_numpy(tx_, ty_), abs=5e-7)
    assert got["flat"] == (5, None)


def _mw_z_numpy(a, b):
    """Tie-corrected normal z for sample a (flag=1) vs b."""
    import itertools
    pooled = np.concatenate([a, b])
    order = np.argsort(pooled, kind="stable")
    ranks = np.empty(len(pooled))
    sv = pooled[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2 + 1
        i = j + 1
    n1, n0 = len(a), len(b)
    n = n1 + n0
    s1 = ranks[:n1].sum()
    u = s1 - n1 * (n1 + 1) / 2
    mu = n1 * n0 / 2
    tsum = sum(
        t ** 3 - t
        for _, g in itertools.groupby(sorted(pooled))
        for t in [len(list(g))]
    )
    var = n1 * n0 / 12 * ((n + 1) - tsum / (n * (n - 1)))
    return u, (u - mu) / np.sqrt(var)


def test_rank_sum_test_matches_reference(spark):
    """U and z match the tie-corrected reference computation; a
    shifted sample yields a clearly positive z; one-sample and
    all-tied groups return NULL z."""
    rng = np.random.RandomState(3)
    a = np.round(rng.rand(40) * 5 + 2, 1)   # shifted up, coarse ties
    b = np.round(rng.rand(60) * 5, 1)
    rows = [("g", 1, float(v)) for v in a]
    rows += [("g", 0, float(v)) for v in b]
    rows += [("solo", 1, 1.0), ("solo", 1, 2.0)]
    rows += [("const", 1, 5.0), ("const", 0, 5.0), ("const", 0, 5.0)]
    df = spark.createDataFrame(rows, "grp string, f int, v double")
    got = {r["grp"]: r for r in
           rank_sum_test(df, "grp", "f", "v").collect()}
    u_ref, z_ref = _mw_z_numpy(a, b)
    assert got["g"]["n_flag"] == 40 and got["g"]["n_rest"] == 60
    assert got["g"]["u"] == pytest.approx(u_ref, abs=5e-7)
    assert got["g"]["z"] == pytest.approx(z_ref, abs=5e-7)
    assert got["g"]["z"] > 2.0
    assert got["solo"]["z"] is None
    assert got["const"]["z"] is None


def test_cramer_von_mises_closed_forms(spark):
    """Hand-derivable CvM cases: identical samples give the known
    minimum T = -(1/(6(n+m))) - ... actually for perfectly
    interleaved equal samples T is near its lower bound, while fully
    SEPARATED samples give the maximum rank displacement — pinned
    against a direct numpy evaluation of Anderson's rank form."""
    from paqarin_spark.metrics.ranking import cramer_von_mises

    # separated: flag-1 values all above flag-0 -> maximal T
    rows = [("g", 0, float(v), v) for v in range(1, 6)] + [
        ("g", 1, float(v), v) for v in range(6, 11)
    ]
    df = spark.createDataFrame(rows, "grp string, f int, v double, k long")
    out = cramer_von_mises(df, "grp", "f", "v", "k").collect()[0]
    n = m = 5
    # flag-1 combined ranks 6..10, own ranks 1..5 -> gaps all 5
    # flag-0 combined ranks 1..5, own ranks 1..5 -> gaps all 0
    u = n * (5 * 5 * 5) + m * 0
    t = u / (n * m * (n + m)) - (4 * n * m - 1) / (6 * (n + m))
    assert out["n_flag"] == 5 and out["n_rest"] == 5
    assert abs(out["t_cvm"] - round(t, 6)) < 1e-9

    # perfectly interleaved equal-shape samples -> small T
    rows2 = [("g", i % 2, float(i), i) for i in range(10)]
    df2 = spark.createDataFrame(rows2, "grp string, f int, v double, k long")
    out2 = cramer_von_mises(df2, "grp", "f", "v", "k").collect()[0]
    # hand-computed: gaps 0..4 / 1..5 -> U = 425, T = 1.7 - 1.65
    assert abs(out2["t_cvm"] - 0.05) < 1e-9
    assert out2["t_cvm"] < out["t_cvm"]  # interleaved << separated

    # degenerate: single-class group -> NULL t, row kept
    rows3 = [("h", 1, float(i), i) for i in range(4)]
    df3 = spark.createDataFrame(rows3, "grp string, f int, v double, k long")
    out3 = cramer_von_mises(df3, "grp", "f", "v", "k").collect()[0]
    assert out3["t_cvm"] is None and out3["n_rest"] == 0
