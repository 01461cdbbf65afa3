"""Port of the min-max scaling golden tests
(`/root/reference/tests/test_doppleganger.py:36-57`,
`/root/reference/tests/test_timegan.py:25-57`): transform maps to
[0, 1]; scale∘inverse ≡ id (SURVEY.md §5 property #3)."""

from __future__ import annotations

import math

import pytest

from paqarin_spark.operators import MinMaxScaler, MinMaxState


@pytest.fixture(scope="module")
def numeric_df(spark):
    rows = [(float(v), float(v) * 10) for v in range(1, 6)]
    return spark.createDataFrame(rows, "a double, b double")


def test_fit_transform_range(numeric_df):
    scaler = MinMaxScaler(["a", "b"]).fit(numeric_df)
    out = scaler.transform(numeric_df).collect()
    for r in out:
        assert 0.0 <= r["a"] <= 1.0
        assert 0.0 <= r["b"] <= 1.0
    assert scaler.state.column_range == {"a": (1.0, 5.0), "b": (10.0, 50.0)}
    scaled_a = sorted(r["a"] for r in out)
    assert scaled_a == [0.0, 0.25, 0.5, 0.75, 1.0]


def test_roundtrip_identity(numeric_df):
    scaler = MinMaxScaler(["a", "b"]).fit(numeric_df)
    back = scaler.inverse_transform(scaler.transform(numeric_df)).collect()
    orig = sorted((r["a"], r["b"]) for r in numeric_df.collect())
    got = sorted((r["a"], r["b"]) for r in back)
    for (oa, ob), (ga, gb) in zip(orig, got):
        assert math.isclose(oa, ga, rel_tol=1e-12)
        assert math.isclose(ob, gb, rel_tol=1e-12)


def test_constant_column_scales_to_zero(spark):
    df = spark.createDataFrame([(7.0,), (7.0,)], "c double")
    out = MinMaxScaler(["c"]).fit(df).transform(df).collect()
    assert all(r["c"] == 0.0 for r in out)


def test_unfitted_raises(numeric_df):
    with pytest.raises(RuntimeError):
        MinMaxScaler(["a"]).transform(numeric_df)


def test_state_save_load_roundtrip(tmp_path, numeric_df):
    scaler = MinMaxScaler(["a"]).fit(numeric_df)
    p = str(tmp_path / "state.json")
    scaler.state.save(p)
    loaded = MinMaxState.load(p)
    assert loaded.column_range == scaler.state.column_range
