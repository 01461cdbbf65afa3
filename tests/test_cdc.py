"""Warehouse-maintenance operators (operators/cdc.py): SCD2 interval
construction and latest-wins CDC merge."""

from __future__ import annotations

from paqarin_spark.operators import apply_cdc, scd2_intervals


def test_scd2_collapses_runs_and_marks_current(spark):
    rows = [
        ("u1", 1, "low"),
        ("u1", 2, "low"),
        ("u1", 3, "high"),
        ("u1", 5, "high"),  # gap in periods stays one run
        ("u1", 6, "low"),
        ("u2", 1, "mid"),
    ]
    df = spark.createDataFrame(rows, "k string, t long, v string")
    out = sorted(
        scd2_intervals(df, ["k"], "t", "v").collect(),
        key=lambda r: (r.k, r.valid_from),
    )
    got = [(r.k, r.valid_from, r.valid_to, r.v) for r in out]
    assert got == [
        ("u1", 1, 3, "low"),
        ("u1", 3, 6, "high"),
        ("u1", 6, None, "low"),
        ("u2", 1, None, "mid"),
    ]


def test_scd2_null_state_is_a_state(spark):
    rows = [("k", 1, None), ("k", 2, None), ("k", 3, "x")]
    df = spark.createDataFrame(rows, "k string, t long, v string")
    got = sorted(
        (r.valid_from, r.valid_to, r.v)
        for r in scd2_intervals(df, ["k"], "t", "v").collect()
    )
    assert got == [(1, 3, None), (3, None, "x")]


def test_apply_cdc_latest_wins_and_deletes(spark):
    rows = [
        ("a", 1, 1, "upsert", 10.0),
        ("a", 2, 2, "upsert", 20.0),  # winner
        ("b", 1, 1, "upsert", 5.0),
        ("b", 2, 2, "delete", 0.0),   # b vanishes
        ("c", 1, 1, "delete", 0.0),
        ("c", 1, 2, "upsert", 7.0),   # same version, higher tiebreak wins
    ]
    df = spark.createDataFrame(rows, "k string, v long, tb long, op string, x double")
    out = {r.k: r for r in apply_cdc(df, ["k"], ["v", "tb"], "op").collect()}
    assert set(out) == {"a", "c"}
    assert out["a"].x == 20.0
    assert out["c"].x == 7.0
