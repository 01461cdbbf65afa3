"""Port of the reference `normalise_sequences` golden test
(`/root/reference/tests/test_doppleganger.py:150-200`) plus gap-fill /
regular-index invariants (SURVEY.md §5 adopted strategy #3)."""

from __future__ import annotations

import pytest

from paqarin_spark.operators import (
    calendar_fill,
    global_calendar,
    normalise_sequences,
    regular_index_filter,
    time_bucket_sum,
)
from paqarin_spark.schema import TimeSeriesSchema

SCHEMA = TimeSeriesSchema(
    item_id_columns=("item_id",),
    timestamp_column="timestamp",
    value_columns=("numeric_column",),
    frequency="1D",
    date_format="%Y-%m-%d %H:%M:%S.%f",
)


@pytest.fixture(scope="module")
def raw(spark):
    rows = [
        ("item_1", 10.0, "2018-10-26 12:00:00.000000"),
        ("item_1", 20.0, "2018-10-26 13:00:00.000000"),
        ("item_2", 30.0, "2018-10-27 12:00:00.000000"),
        ("item_2", 40.0, "2018-10-27 13:00:00.000000"),
    ]
    return spark.createDataFrame(
        rows, "item_id string, numeric_column double, timestamp string"
    )


def test_normalise_sequences_golden(raw):
    filled, n_entities, seq_len = normalise_sequences(raw, SCHEMA)
    # Reference golden: 2 samples, 2 buckets.
    assert n_entities == 2
    assert seq_len == 2
    got = {
        (r["item_id"], str(r["bucket"])[:10]): r["numeric_column"]
        for r in filled.collect()
    }
    assert got == {
        ("item_1", "2018-10-26"): 30.0,
        ("item_1", "2018-10-27"): 0.0,
        ("item_2", "2018-10-26"): 0.0,
        ("item_2", "2018-10-27"): 70.0,
    }


def test_time_bucket_sum_drops_sparse_buckets(raw):
    from paqarin_spark.operators.resample import parse_timestamps

    agg = time_bucket_sum(parse_timestamps(raw, SCHEMA), SCHEMA)
    # Only 2 (entity, day) pairs exist before gap fill.
    assert agg.count() == 2


def test_calendar_fill_is_dense_per_entity(raw, spark):
    from paqarin_spark.operators.resample import parse_timestamps

    parsed = parse_timestamps(raw, SCHEMA)
    filled = calendar_fill(parsed, SCHEMA, fill_value=0.0)
    n_buckets = global_calendar(parsed, SCHEMA).count()
    per_entity = filled.groupBy("item_id").count().collect()
    assert all(r["count"] == n_buckets for r in per_entity)


def test_calendar_fill_none_keeps_nulls(raw):
    from paqarin_spark.operators.resample import parse_timestamps

    parsed = parse_timestamps(raw, SCHEMA)
    upsampled = calendar_fill(parsed, SCHEMA, fill_value=None)
    nulls = upsampled.where(upsampled.numeric_column.isNull()).count()
    assert nulls == 2  # item_1@27th and item_2@26th stay null (op D2)


def test_regular_index_filter_keeps_regular_entities(spark):
    import datetime as dt

    def ts(s):
        return dt.datetime.fromisoformat(s)

    rows = [
        # regular daily entity
        ("reg", ts("2020-01-01"), 1.0),
        ("reg", ts("2020-01-02"), 1.0),
        ("reg", ts("2020-01-03"), 1.0),
        # irregular gaps
        ("irr", ts("2020-01-01"), 1.0),
        ("irr", ts("2020-01-02"), 1.0),
        ("irr", ts("2020-01-05"), 1.0),
        # single observation — no inferable frequency
        ("one", ts("2020-01-01"), 1.0),
    ]
    df = spark.createDataFrame(rows, "item_id string, timestamp timestamp, numeric_column double")
    schema = TimeSeriesSchema(("item_id",), "timestamp", ("numeric_column",), frequency="D")
    kept = {r["item_id"] for r in regular_index_filter(df, schema).collect()}
    assert kept == {"reg"}


def test_wrong_date_format_raises(spark):
    """G1 error contract (reference tests/test_synthcity_adapter.py:
    135-145): a mismatched explicit format is an error, not a silent
    coercion — ANSI to_timestamp raises at execution."""
    import pytest

    from paqarin_spark.operators.resample import parse_timestamps
    from paqarin_spark.schema import TimeSeriesSchema

    schema = TimeSeriesSchema(
        item_id_columns=("item",),
        timestamp_column="ts",
        value_columns=("v",),
        frequency="D",
        date_format="%d/%m/%Y",
    )
    df = spark.createDataFrame(
        [("a", "2021-03-01", 1.0)], "item string, ts string, v double"
    )
    with pytest.raises(Exception) as err:
        parse_timestamps(df, schema).collect()
    assert "2021-03-01" in str(err.value) or "CANNOT_PARSE" in str(err.value).upper()

    ok = spark.createDataFrame(
        [("a", "01/03/2021", 1.0)], "item string, ts string, v double"
    )
    row = parse_timestamps(ok, schema).collect()[0]
    assert str(row["ts"]).startswith("2021-03-01")
