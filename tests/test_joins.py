"""Salted skew join: result parity with the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from paqarin_spark.operators import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key 'h' dominates the fact side
    facts = spark.createDataFrame(
        [("h", i) for i in range(200)] + [("a", 1), ("b", 2)],
        "k string, v int",
    )
    dim = spark.createDataFrame(
        [("h", "hot"), ("a", "cold"), ("c", "unmatched")], "k string, label string"
    )
    return facts, dim


def _canon(rows):
    return sorted(map(tuple, rows))


def test_salted_inner_matches_plain(skewed):
    facts, dim = skewed
    plain = facts.join(dim, on=["k"], how="inner").collect()
    salted = salted_join(facts, dim, on=["k"], how="inner", salt_buckets=4).collect()
    assert _canon(salted) == _canon(plain)


def test_salted_left_matches_plain(skewed):
    facts, dim = skewed
    plain = facts.join(dim, on=["k"], how="left").collect()
    salted = salted_join(facts, dim, on=["k"], how="left", salt_buckets=4).collect()
    assert _canon(salted) == _canon(plain)


def test_salted_join_rejects_right_joins(skewed):
    facts, dim = skewed
    with pytest.raises(ValueError):
        salted_join(facts, dim, on=["k"], how="right")


def test_salt_is_layout_independent(skewed):
    # The content-hash salt must not change with partition layout:
    # identical rows get identical salts no matter how the input is
    # repartitioned (a rand-derived salt fails this under AQE
    # coalescing / task retries).
    facts, dim = skewed
    baseline = _canon(
        salted_join(facts, dim, on=["k"], how="left", salt_buckets=4).collect()
    )
    for nparts in (1, 3, 7):
        shuffled = facts.repartition(nparts)
        got = _canon(
            salted_join(shuffled, dim, on=["k"], how="left", salt_buckets=4).collect()
        )
        assert got == baseline


def test_salt_spreads_hot_key(skewed, spark):
    # All 200 rows of hot key 'h' differ in v, so the row-content hash
    # must scatter them across more than one bucket.
    facts, _ = skewed
    from paqarin_spark.operators.joins import _SALT

    salted = facts.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in facts.columns], F.lit(42)), F.lit(4)
        ).cast("int"),
    )
    n_buckets = (
        salted.filter(F.col("k") == "h").select(_SALT).distinct().count()
    )
    assert n_buckets > 1


# ---------------------------------------------------------------------------
# as-of join


@pytest.fixture(scope="module")
def asof_frames(spark):
    from tests.conftest import ts

    left = spark.createDataFrame(
        [
            ("a", ts("2020-01-05 00:00:00"), 1),
            ("a", ts("2020-01-10 00:00:00"), 2),
            ("a", ts("2020-01-02 00:00:00"), 3),  # before any right row
            ("b", ts("2020-01-05 00:00:00"), 4),  # key with no right rows
        ],
        "k string, ts timestamp, ev int",
    )
    right = spark.createDataFrame(
        [
            ("a", ts("2020-01-03 00:00:00"), 30.0),
            ("a", ts("2020-01-05 00:00:00"), 50.0),  # equal-ts: inclusive match
            ("a", ts("2020-01-08 00:00:00"), 80.0),
        ],
        "k string, rts timestamp, px double",
    )
    return left, right


def test_asof_backward(asof_frames):
    from paqarin_spark.operators import asof_join

    left, right = asof_frames
    out = {
        r["ev"]: (r["px"], r["matched_ts"])
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts"
        ).collect()
    }
    assert out[1][0] == 50.0  # equal ts matches (inclusive)
    assert out[2][0] == 80.0  # latest earlier row wins
    assert out[3] == (None, None)  # nothing at-or-before
    assert out[4] == (None, None)  # unmatched key preserved (left join)


def test_asof_forward_and_tolerance(asof_frames):
    from paqarin_spark.operators import asof_join

    left, right = asof_frames
    fwd = {
        r["ev"]: r["px"]
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts", direction="forward"
        ).collect()
    }
    assert fwd[3] == 30.0  # earliest later row
    assert fwd[1] == 50.0  # inclusive
    assert fwd[2] is None  # nothing at-or-after

    tol = {
        r["ev"]: r["px"]
        for r in asof_join(
            left,
            right,
            on=["k"],
            left_ts="ts",
            right_ts="rts",
            tolerance="1 days",
        ).collect()
    }
    assert tol[1] == 50.0  # 0-day gap within tolerance
    assert tol[2] is None  # 2-day gap nulled out


def test_asof_rejects_colliding_payload(asof_frames, spark):
    from paqarin_spark.operators import asof_join

    left, right = asof_frames
    with pytest.raises(ValueError):
        asof_join(
            left,
            right.withColumnRenamed("px", "ev"),
            on=["k"],
            left_ts="ts",
            right_ts="rts",
        )


# ---------------------------------------------------------------------------
# binned range join


def test_range_point_join_binned_matches_unbinned(spark):
    from tests.conftest import ts

    from paqarin_spark.operators import range_point_join

    points = spark.createDataFrame(
        [
            (1, ts("2020-01-01 00:30:00")),
            (2, ts("2020-01-01 11:59:59")),
            (3, ts("2020-01-01 12:00:00")),  # == range_end: excluded
            (4, ts("2020-01-02 06:00:00")),
        ],
        "pid int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (ts("2020-01-01 00:00:00"), ts("2020-01-01 12:00:00"), "w1"),
            (ts("2020-01-02 00:00:00"), ts("2020-01-03 00:00:00"), "w2"),
        ],
        "start timestamp, stop timestamp, label string",
    )
    plain = range_point_join(
        points, intervals, on=[], point="ts", range_start="start", range_end="stop"
    )
    binned = range_point_join(
        points,
        intervals,
        on=[],
        point="ts",
        range_start="start",
        range_end="stop",
        bin_width_seconds=3600,
    )
    expect = {(1, "w1"), (2, "w1"), (4, "w2")}
    assert {(r["pid"], r["label"]) for r in plain.collect()} == expect
    assert {(r["pid"], r["label"]) for r in binned.collect()} == expect


def test_range_point_join_left_keeps_unmatched(spark):
    from tests.conftest import ts

    from paqarin_spark.operators import range_point_join

    points = spark.createDataFrame(
        [
            (1, ts("2020-01-01 00:30:00")),
            (2, ts("2020-01-01 12:00:00")),  # == range_end: unmatched
            (2, ts("2020-01-01 12:00:00")),  # duplicate row: kept twice
            (3, ts("2020-01-05 00:00:00")),  # no interval at all
        ],
        "pid int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(ts("2020-01-01 00:00:00"), ts("2020-01-01 12:00:00"), "w1")],
        "start timestamp, stop timestamp, label string",
    )
    expect = [(1, "w1"), (2, None), (2, None), (3, None)]
    for bin_w in (None, 3600):
        out = range_point_join(
            points,
            intervals,
            on=[],
            point="ts",
            range_start="start",
            range_end="stop",
            bin_width_seconds=bin_w,
            how="left",
        )
        got = sorted(
            (r["pid"], r["label"]) for r in out.collect()
        )
        assert got == expect, f"bin_width_seconds={bin_w}"


# ---------------------------------------------------------------------------
# sessionization


def test_sessionize_gap_boundaries(spark):
    from tests.conftest import ts

    from paqarin_spark.operators import session_stats, sessionize

    ev = spark.createDataFrame(
        [
            ("u1", ts("2020-01-01 00:00:00"), 1.0),
            ("u1", ts("2020-01-01 00:30:00"), 2.0),  # 30 min: same session
            ("u1", ts("2020-01-01 02:00:00"), 3.0),  # 90 min > 1h: new session
            ("u1", ts("2020-01-01 03:00:00"), 4.0),  # exactly 1h: NOT new
            ("u2", ts("2020-01-01 00:00:00"), 9.0),
        ],
        "u string, ts timestamp, v double",
    )
    got = {
        (r["u"], str(r["ts"])): r["session_id"]
        for r in sessionize(ev, "u", "ts", gap_seconds=3600).collect()
    }
    assert got[("u1", "2020-01-01 00:00:00")] == 0
    assert got[("u1", "2020-01-01 00:30:00")] == 0
    assert got[("u1", "2020-01-01 02:00:00")] == 1
    assert got[("u1", "2020-01-01 03:00:00")] == 1  # boundary is strict >
    assert got[("u2", "2020-01-01 00:00:00")] == 0

    stats = {
        (r["u"], r["session_id"]): (r["n_events"], r["value_sum"])
        for r in session_stats(ev, "u", "ts", 3600, value_column="v").collect()
    }
    assert stats[("u1", 0)] == (2, 3.0)
    assert stats[("u1", 1)] == (2, 7.0)
    assert stats[("u2", 0)] == (1, 9.0)


def test_salted_join_handles_map_columns(spark):
    # map-typed payloads are unhashable for xxhash64; the salt must
    # skip them rather than fail analysis
    facts = spark.createDataFrame(
        [("h", {"k": "v"}, i) for i in range(20)] + [("a", {"x": "y"}, 1)],
        "k string, props map<string,string>, v int",
    )
    dim = spark.createDataFrame([("h", "hot"), ("a", "cold")], "k string, label string")
    plain = facts.join(dim, on=["k"], how="inner")
    salted = salted_join(facts, dim, on=["k"], how="inner", salt_buckets=4)
    assert sorted((r["k"], r["v"], r["label"]) for r in salted.collect()) == sorted(
        (r["k"], r["v"], r["label"]) for r in plain.collect()
    )


def test_pagerank_matches_reference_and_handles_dangling(spark):
    import numpy as np

    from paqarin_spark.operators import pagerank

    # a->b, a->d(w3), b->c, c->a; d dangling
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "d", 3.0), ("b", "c", 2.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    got = {
        r.node: r.rank
        for r in pagerank(edges, "src", "dst", "w", iterations=3).collect()
    }
    nodes = ["a", "b", "c", "d"]
    frac = {("a", "b"): 0.25, ("a", "d"): 0.75, ("b", "c"): 1.0, ("c", "a"): 1.0}
    pr = {v: 0.25 for v in nodes}
    for _ in range(3):
        dm = pr["d"]
        new = {}
        for v in nodes:
            infl = sum(pr[s] * f for (s, d), f in frac.items() if d == v)
            new[v] = (1.0 - 0.85) / 4 + 0.85 * (infl + dm / 4)
        pr = new
    for v in nodes:
        assert abs(got[v] - pr[v]) < 1e-12, v
    # rank mass is conserved (sums to 1)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # unweighted: weight=None treats edges equally
    uw = {
        r.node: r.rank
        for r in pagerank(edges, "src", "dst", iterations=1).collect()
    }
    assert uw["b"] == uw["d"]  # equal split from a


def test_triangles_k4_exact_enumeration(spark):
    from paqarin_spark.operators import triangles

    # K4 on {1,2,3,4} has exactly C(4,3)=4 triangles; every vertex has
    # equal degree so orientation falls back to the id tie-break and
    # each output triple must be strictly increasing.
    edges = spark.createDataFrame(
        [(u, v) for u in range(1, 5) for v in range(u + 1, 5)],
        "src int, dst int",
    )
    got = sorted(tuple(r) for r in triangles(edges).collect())
    assert got == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]


def test_triangles_hub_star_has_none_and_input_noise_ignored(spark):
    from paqarin_spark.operators import triangles

    # A star (hub 0 to 10 leaves) holds C(10,2) wedges at the hub but
    # no triangle; duplicated, reversed, and self-loop edges must not
    # manufacture one, and one genuine triangle among the leaves must
    # be counted exactly once despite appearing in both directions.
    star = [(0, i) for i in range(1, 11)]
    noise = [(i, 0) for i in range(1, 11)] + [(5, 5), (0, 0)]
    # triangle on vertices DISJOINT from the star so the hub closes
    # no wedge; both directions + a duplicate exercise canonicalization
    tri = [(21, 22), (22, 21), (22, 23), (21, 23)]
    edges = spark.createDataFrame(star + noise + tri, "src int, dst int")
    got = [tuple(r) for r in triangles(edges).collect()]
    # exactly the {21,22,23} triangle, whatever the degree-rank order
    assert len(got) == 1 and sorted(got[0]) == [21, 22, 23]


def test_triangles_degree_orientation_bounds_wedges(spark):
    from paqarin_spark.operators import triangles

    # Lollipop: hub h adjacent to 30 leaves plus one triangle edge
    # pair through (a, b). Degree-ordering sends every leaf edge INTO
    # the hub, so the only wedges enumerate at the low-degree corner;
    # the count must still be exact.
    edges = (
        [("h", f"leaf{i}") for i in range(30)]
        + [("h", "a"), ("h", "b"), ("a", "b")]
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    got = [tuple(r) for r in triangles(df).collect()]
    assert len(got) == 1 and sorted(got[0]) == ["a", "b", "h"]


def test_bfs_hops_chain_distances_and_early_exit(spark):
    """Chain 0-1-2-3-4-5 seeded at 0: hop = index, truncated at
    max_hops; a disconnected node is absent; undirected input (both
    edge directions) never revisits earlier hops."""
    from pyspark.sql import functions as F

    from paqarin_spark.operators import bfs_hops

    chain = [(i, i + 1) for i in range(5)]
    e = spark.createDataFrame(chain, "src string, dst string")
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = spark.createDataFrame([("0",)], "node string")
    got = {
        r["node"]: r["hop"]
        for r in bfs_hops(und, seeds, max_hops=3).collect()
    }
    assert got == {"0": 0, "1": 1, "2": 2, "3": 3}  # 4,5 beyond bound

    # early exit: isolated seed reaches nothing, only hop 0 remains
    lone = spark.createDataFrame([("z",)], "node string")
    out = bfs_hops(und, lone, max_hops=4).collect()
    assert [(r["node"], r["hop"]) for r in out] == [("z", 0)]


def _und(spark, pairs):
    e = spark.createDataFrame(pairs, "src string, dst string")
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def test_kcore_peel_cascade_and_survivors(spark):
    """Classic cascade: a triangle (2-core) with a pendant chain.
    Round 1 peels the chain tip (deg 1), round 2 peels the next chain
    node whose degree DROPPED to 1, round 3 peels the attachment
    node; the triangle survives as the 2-core."""
    from paqarin_spark.operators import kcore_peel

    # triangle a-b-c, chain c-d-e-f
    edges = _und(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"), ("e", "f")],
    )
    out = {
        r["node"]: r["peel_round"]
        for r in kcore_peel(edges, k=2, rounds=3).collect()
    }
    assert out == {
        "f": 1,          # deg 1
        "e": 2,          # deg fell to 1 after f left
        "d": 3,          # deg fell to 1 after e left
        "a": None, "b": None, "c": None,  # the 2-core
    }


def test_kcore_peel_zero_degree_nodes_count_as_peeled(spark):
    """A node whose last edge vanished with an earlier peel is absent
    from the next degree table — it must be peeled (degree 0), not
    silently dropped."""
    from paqarin_spark.operators import kcore_peel

    # star: hub h with leaves x/y/z; k=2 peels all leaves round 1,
    # hub's degree falls to 0 -> peeled round 2.
    edges = _und(spark, [("h", "x"), ("h", "y"), ("h", "z")])
    out = {
        r["node"]: r["peel_round"]
        for r in kcore_peel(edges, k=2, rounds=3).collect()
    }
    assert out == {"x": 1, "y": 1, "z": 1, "h": 2}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        kcore_peel(edges, k=0)


def test_kcore_peel_validates_rounds(spark):
    import pytest

    from paqarin_spark.operators import kcore_peel

    edges = _und(spark, [("a", "b")])
    with pytest.raises(ValueError, match="rounds"):
        kcore_peel(edges, k=2, rounds=0)


def test_label_propagation_separates_planted_communities(spark):
    """Two disjoint cliques bridged by nothing resolve to two
    communities anchored at their minimum labels; rounds<1 raises."""
    import pytest
    from paqarin_spark.operators import label_propagation

    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),             # triangle 1
        ("x", "y"), ("y", "z"), ("x", "z"), ("z", "zz") # cluster 2
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["label"]
           for r in label_propagation(df, rounds=4).collect()}
    assert {got["a"], got["b"], got["c"]} == {"a"}
    assert {got["x"], got["y"], got["z"], got["zz"]} == {"x"}
    assert got["x"] != got["a"]
    with pytest.raises(ValueError, match="rounds"):
        label_propagation(df, rounds=0)


def test_adamic_adar_weights_rare_neighbors_higher(spark):
    """Two dst nodes sharing a degree-2 contributor outscore a pair
    sharing only a degree-4 hub; hub above max_degree drops out."""
    import math
    from paqarin_spark.operators import adamic_adar

    edges = [
        # rare contributor c1 (deg 2) links s1-s2
        ("c1", "s1"), ("c1", "s2"),
        # hub c2 (deg 4) links everything
        ("c2", "s1"), ("c2", "s2"), ("c2", "s3"), ("c2", "s4"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["node_a"], r["node_b"]): (r["n_common"], r["aa_score"])
           for r in adamic_adar(df, max_degree=64).collect()}
    s12 = got[("s1", "s2")]
    s34 = got[("s3", "s4")]
    assert s12[0] == 2 and s34[0] == 1
    expected = 1 / math.log(2) + 1 / math.log(4)
    assert abs(s12[1] - expected) < 1e-9
    assert s12[1] > s34[1]
    # cap at 3 removes the hub entirely: only the rare pair remains
    capped = {(r["node_a"], r["node_b"]) for r in
              adamic_adar(df, max_degree=3).collect()}
    assert capped == {("s1", "s2")}
