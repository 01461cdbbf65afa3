"""Port of the reference surrogate-key golden test
(`/root/reference/tests/test_data_utils.py:8-31`): distinct entity
tuples get dense ids 0..n-1 in first-appearance order."""

from __future__ import annotations

from paqarin_spark.operators import add_surrogate_key, entity_dim


def test_add_surrogate_key_first_appearance(spark):
    rows = [
        (0, "a", 0),
        (1, "a", 1),
        (2, "a", 0),
        (3, "b", 1),
        (4, "b", 0),
        (5, "b", 1),
    ]
    df = spark.createDataFrame(rows, "rid long, item_id_1 string, item_id_2 long")

    out = add_surrogate_key(df, ["item_id_1", "item_id_2"], ["rid"])
    got = {
        r["rid"]: r["surrogate_item_id"]
        for r in out.select("rid", "surrogate_item_id").collect()
    }
    # Reference golden: (a,0)->0, (a,1)->1, (b,1)->2, (b,0)->3.
    assert got == {0: 0, 1: 1, 2: 0, 3: 2, 4: 3, 5: 2}


def test_surrogate_key_is_dense_and_total(spark):
    rows = [(i, f"e{i % 7}") for i in range(50)]
    df = spark.createDataFrame(rows, "rid long, item string")
    out = add_surrogate_key(df, ["item"], ["rid"])
    keys = sorted(
        r["surrogate_item_id"]
        for r in out.select("surrogate_item_id").distinct().collect()
    )
    assert keys == list(range(7))
    assert out.count() == 50


def test_entity_dim(spark):
    df = spark.createDataFrame([("a",), ("b",), ("a",)], "item string")
    assert entity_dim(df, ["item"]).count() == 2
