"""Generator providers + adapter dispatch (ops J1/J2/K1/K3).

Ports the reference contract tests: invalid provider raises ValueError
(`/root/reference/tests/test_timegan.py:154-159`), save/load roundtrip
(`/root/reference/tests/test_ydata_adapter.py`), generate returns
sequences of the configured length."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from paqarin_spark.adapter import get_generator_adapter, load_generator
from paqarin_spark.generator import GeneratorParameters
from paqarin_spark.schema import TimeSeriesSchema

SCHEMA = TimeSeriesSchema(
    item_id_columns=("item_id",),
    timestamp_column="ts",
    value_columns=("v",),
    frequency="D",
)


@pytest.fixture(scope="module")
def training(spark):
    rows = []
    for item in ("a", "b"):
        for i in range(12):
            rows.append((item, dt.datetime(2020, 1, 1) + dt.timedelta(days=i), float(i % 5 + (1 if item == "b" else 0))))
    return spark.createDataFrame(rows, "item_id string, ts timestamp, v double")


def params(L=4):
    return GeneratorParameters(schema=SCHEMA, sequence_length=L, seed=7)


def test_invalid_provider_raises():
    with pytest.raises(ValueError):
        get_generator_adapter("nope", "bootstrap", params())
    with pytest.raises(ValueError):
        get_generator_adapter("paqarin_spark", "nope", params())


def test_deep_provider_requires_library():
    with pytest.raises(ImportError, match="sdv"):
        get_generator_adapter("sdv", "par", params())


def test_bootstrap_fit_generate(training):
    gen = get_generator_adapter("paqarin_spark", "bootstrap", params())
    assert not gen.is_fitted
    gen.fit(training)
    assert gen.is_fitted
    out = gen.generate(5)
    rows = out.collect()
    assert len(rows) == 5
    assert all(len(r["sequence"]) == 4 for r in rows)
    assert sorted(r["sequence_id"] for r in rows) == list(range(5))
    # values are back in data units (inverse-scaled): within [min,max]
    vals = [s["v"] for r in rows for s in r["sequence"]]
    assert all(0.0 <= v <= 5.0 for v in vals)


def test_bootstrap_generate_deterministic(training):
    gen = get_generator_adapter("paqarin_spark", "bootstrap", params())
    gen.fit(training)
    a = [(r["sequence_id"], tuple(s["v"] for s in r["sequence"])) for r in gen.generate(3, seed=1).collect()]
    b = [(r["sequence_id"], tuple(s["v"] for s in r["sequence"])) for r in gen.generate(3, seed=1).collect()]
    c = [(r["sequence_id"], tuple(s["v"] for s in r["sequence"])) for r in gen.generate(3, seed=2).collect()]
    assert a == b
    assert a != c


def test_bootstrap_save_load_roundtrip(training, tmp_path, spark):
    gen = get_generator_adapter("paqarin_spark", "bootstrap", params())
    gen.fit(training)
    path = str(tmp_path / "gen")
    gen.save(path)
    loaded = load_generator(spark, "paqarin_spark", "bootstrap", path)
    assert loaded.is_fitted
    a = [tuple(s["v"] for s in r["sequence"]) for r in gen.generate(3, seed=5).collect()]
    b = [tuple(s["v"] for s in r["sequence"]) for r in loaded.generate(3, seed=5).collect()]
    assert a == b


def test_gaussian_fit_generate(training):
    gen = get_generator_adapter("paqarin_spark", "gaussian", params())
    gen.fit(training)
    out = gen.generate(4, seed=11)
    rows = out.collect()
    assert len(rows) == 4
    assert all(len(r["sequence"]) == 4 for r in rows)


def test_synthcity_loader_views(spark):
    import datetime as dt

    from paqarin_spark.generators.views import (
        add_prefixes,
        par_context,
        strip_prefixes,
        synthcity_loader_views,
    )
    from paqarin_spark.schema import TimeSeriesSchema

    schema = TimeSeriesSchema(
        item_id_columns=("item",),
        timestamp_column="ts",
        value_columns=("v",),
        attribute_columns=("kind",),
    )
    rows = [
        ("a", dt.datetime(2020, 1, 2), 2.0, "x"),
        ("a", dt.datetime(2020, 1, 1), 1.0, "x"),
        ("b", dt.datetime(2020, 1, 1), 9.0, "y"),
    ]
    df = spark.createDataFrame(rows, "item string, ts timestamp, v double, kind string")
    views = synthcity_loader_views(df, schema)

    temporal = {r["item"]: [x["v"] for x in r["observations"]] for r in views.temporal.collect()}
    assert temporal == {"a": [1.0, 2.0], "b": [9.0]}  # event-time ordered
    times = {r["item"]: list(r["times"]) for r in views.observation_times.collect()}
    assert times["a"] == ["2020-01-01", "2020-01-02"]
    static = {r["item"]: r["kind"] for r in views.static.collect()}
    assert static == {"a": "x", "b": "y"}
    assert all(r["outcome"] == 0 for r in views.outcome.collect())

    ctx = par_context(df, schema).collect()
    assert sorted((r["item"], r["kind"]) for r in ctx) == [("a", "x"), ("b", "y")]

    prefixed = add_prefixes(df, schema)
    assert "seq_temporal_v" in prefixed.columns
    assert "seq_static_kind" in prefixed.columns
    assert strip_prefixes(prefixed).columns == df.columns


def test_conditional_bootstrap_contract(spark):
    import datetime as dt

    import pytest

    from paqarin_spark.generator import GeneratorParameters
    from paqarin_spark.generators import ConditionalBootstrapGenerator
    from paqarin_spark.schema import TimeSeriesSchema

    schema = TimeSeriesSchema(
        item_id_columns=("item",),
        timestamp_column="ts",
        value_columns=("v",),
        attribute_columns=("kind",),
        frequency="D",
        order_columns=(),
    )
    rows = [
        (item, kind, dt.datetime(2021, 3, 1) + dt.timedelta(days=i),
         float(i + ord(item[0])))
        for item, kind in (("a", "red"), ("b", "red"), ("c", "blue"))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "item string, kind string, ts timestamp, v double")
    params = GeneratorParameters(schema=schema, sequence_length=4, seed=11)
    gen = ConditionalBootstrapGenerator(params).fit(df)

    # context is REQUIRED (reference: tests/test_par.py:43-44)
    with pytest.raises(ValueError):
        gen.generate(5)

    ctx = spark.createDataFrame(
        [("red",), ("red",), ("blue",)], "kind string"
    )
    out = gen.generate(context=ctx).collect()
    # one sequence per context row, attributes honored
    assert len(out) == 3
    kinds = sorted(r["kind"] for r in out)
    assert kinds == ["blue", "red", "red"]
    for r in out:
        assert len(r["sequence"]) == 4

    # unseen attribute values yield no sequences (no crash)
    ghost = spark.createDataFrame([("green",)], "kind string")
    assert gen.generate(context=ghost).count() == 0

    # deterministic under repeated calls with the same seed
    again = gen.generate(context=ctx).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))
    gen.unpersist()


def test_conditional_bootstrap_needs_attributes():
    import pytest

    from paqarin_spark.generator import GeneratorParameters
    from paqarin_spark.generators import ConditionalBootstrapGenerator
    from paqarin_spark.schema import TimeSeriesSchema

    schema = TimeSeriesSchema(
        item_id_columns=("item",),
        timestamp_column="ts",
        value_columns=("v",),
        frequency="D",
    )
    with pytest.raises(ValueError):
        ConditionalBootstrapGenerator(
            GeneratorParameters(schema=schema, sequence_length=4, seed=1)
        )


def test_conditional_bootstrap_save_load_roundtrip(spark, tmp_path):
    import datetime as dt

    from paqarin_spark.adapter import load_generator
    from paqarin_spark.generator import GeneratorParameters
    from paqarin_spark.generators import ConditionalBootstrapGenerator
    from paqarin_spark.schema import TimeSeriesSchema

    schema = TimeSeriesSchema(
        item_id_columns=("item",),
        timestamp_column="ts",
        value_columns=("v",),
        attribute_columns=("kind",),
        frequency="D",
        order_columns=(),
    )
    rows = [
        (item, kind, dt.datetime(2021, 3, 1) + dt.timedelta(days=i), float(i))
        for item, kind in (("a", "red"), ("c", "blue"))
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "item string, kind string, ts timestamp, v double")
    gen = ConditionalBootstrapGenerator(
        GeneratorParameters(schema=schema, sequence_length=4, seed=5)
    ).fit(df)
    ctx = spark.createDataFrame([("red",), ("blue",)], "kind string")
    before = sorted(map(str, gen.generate(context=ctx).collect()))

    path = str(tmp_path / "cond_gen")
    gen.save(path)
    gen.unpersist()
    loaded = load_generator(spark, "paqarin_spark", "conditional_bootstrap", path)
    after = sorted(map(str, loaded.generate(context=ctx).collect()))
    assert before == after


def test_markov_generator_deterministic_and_learns_transitions(spark):
    import datetime as dt

    from paqarin_spark.generators import MarkovEventGenerator
    from paqarin_spark.generator import GeneratorParameters
    from paqarin_spark.schema import TimeSeriesSchema

    # u1/u2: a -> b -> a -> b ...; u3: c only (absorbing)
    rows = []
    for uid in ("u1", "u2"):
        for i in range(6):
            rows.append(
                (uid, dt.datetime(2020, 1, 1) + dt.timedelta(hours=i),
                 "a" if i % 2 == 0 else "b", 1.0)
            )
    rows.append(("u3", dt.datetime(2020, 1, 1), "c", 1.0))
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string, value double"
    )
    schema = TimeSeriesSchema(
        item_id_columns=("user_id",),
        timestamp_column="ts",
        value_columns=("value",),
        frequency="D",
    )
    p = GeneratorParameters(schema=schema, sequence_length=5, seed=3)
    gen = MarkovEventGenerator(p).fit(df)
    # fitted state: initial = {a: 2, c: 1}; a->b and b->a are certain;
    # c has no outgoing mass -> absorbing self-loop fallback
    assert gen.initial == {"a": 2, "c": 1}
    assert gen.transitions["a"] == {"b": 6}
    assert gen.transitions["b"] == {"a": 4}
    assert gen.transitions["c"] == {"c": 1}

    out = gen.generate(20).collect()
    assert len(out) == 20 * 5
    seqs = {}
    for r in out:
        seqs.setdefault(r["sequence_id"], []).append((r["step"], r["event_type"]))
    for sid, steps in seqs.items():
        cats = [c for _, c in sorted(steps)]
        if cats[0] == "c":
            assert cats == ["c"] * 5  # absorbing self-loop
        else:
            # deterministic alternation a<->b
            for prev, nxt in zip(cats, cats[1:]):
                assert {prev, nxt} == {"a", "b"} and prev != nxt

    # same seed -> identical sample; different seed -> different draw ids
    again = gen.generate(20).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_markov_generator_adapter_and_persistence(spark, tmp_path):
    import datetime as dt

    from paqarin_spark.adapter import get_generator_adapter, load_generator
    from paqarin_spark.generator import GeneratorParameters
    from paqarin_spark.schema import TimeSeriesSchema

    rows = [
        ("u1", dt.datetime(2020, 1, 1, h), "x" if h % 2 else "y", 1.0)
        for h in range(4)
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string, value double"
    )
    schema = TimeSeriesSchema(
        item_id_columns=("user_id",),
        timestamp_column="ts",
        value_columns=("value",),
        frequency="D",
    )
    p = GeneratorParameters(schema=schema, sequence_length=3, seed=5)
    gen = get_generator_adapter("paqarin_spark", "markov", p).fit(df)
    path = str(tmp_path / "markov_model")
    gen.save(path)
    loaded = load_generator(spark, "paqarin_spark", "markov", path)
    assert loaded.initial == gen.initial
    assert loaded.transitions == gen.transitions
    a = sorted(map(tuple, gen.generate(7).collect()))
    b = sorted(map(tuple, loaded.generate(7).collect()))
    assert a == b


def test_markov_generator_terminal_category_absorbs(spark):
    import datetime as dt

    from paqarin_spark.generators import MarkovEventGenerator
    from paqarin_spark.generator import GeneratorParameters
    from paqarin_spark.schema import TimeSeriesSchema

    # every sequence is a -> b -> c: c is observed ONLY as a non-first
    # final event, so it must still get an absorbing self-loop
    rows = []
    for uid in ("u1", "u2", "u3"):
        for i, t in enumerate("abc"):
            rows.append(
                (uid, dt.datetime(2020, 1, 1) + dt.timedelta(hours=i), t, 1.0)
            )
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string, value double"
    )
    schema = TimeSeriesSchema(
        item_id_columns=("user_id",),
        timestamp_column="ts",
        value_columns=("value",),
        frequency="D",
    )
    p = GeneratorParameters(schema=schema, sequence_length=6, seed=2)
    gen = MarkovEventGenerator(p).fit(df)
    assert gen.transitions["c"] == {"c": 1}
    seqs = {}
    for r in gen.generate(10).collect():
        seqs.setdefault(r["sequence_id"], []).append((r["step"], r["event_type"]))
    for steps in seqs.values():
        cats = [c for _, c in sorted(steps)]
        assert cats[:3] == ["a", "b", "c"] and cats[3:] == ["c", "c", "c"]


def test_markov_generator_length_one(spark):
    import datetime as dt

    from paqarin_spark.generators import MarkovEventGenerator
    from paqarin_spark.generator import GeneratorParameters
    from paqarin_spark.schema import TimeSeriesSchema

    df = spark.createDataFrame(
        [("u1", dt.datetime(2020, 1, 1), "x", 1.0),
         ("u1", dt.datetime(2020, 1, 2), "y", 1.0)],
        "user_id string, ts timestamp, event_type string, value double",
    )
    schema = TimeSeriesSchema(
        item_id_columns=("user_id",),
        timestamp_column="ts",
        value_columns=("value",),
        frequency="D",
    )
    p = GeneratorParameters(schema=schema, sequence_length=1, seed=4)
    out = MarkovEventGenerator(p).fit(df).generate(5).collect()
    # exactly one step per sequence — F.sequence(1, 0) would have
    # produced a descending [1, 0] and 3 rows each
    assert len(out) == 5
    assert {r["step"] for r in out} == {0}


def test_markov_over_tokens_generates_vocabulary_words(spark):
    """The categorical Markov machinery instantiated on token
    sequences (the gen9 shape): fitted on tiny two-word docs, every
    generated token is vocabulary and transitions follow the chain."""
    from paqarin_spark.generator import GeneratorParameters
    from paqarin_spark.generators import MarkovEventGenerator
    from paqarin_spark.schema import TimeSeriesSchema

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha beta"), (2, "beta gamma beta gamma")],
        "doc_id long, text string",
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
    )
    schema = TimeSeriesSchema(
        item_id_columns=("doc_id",),
        timestamp_column="pos",
        value_columns=("pos",),
        frequency="D",
        order_columns=("pos",),
    )
    gen = MarkovEventGenerator(
        GeneratorParameters(schema=schema, sequence_length=4, seed=3),
        category_column="tok",
    ).fit(toks)
    out = gen.generate(10, seed=3).collect()
    assert len(out) == 40
    vocab = {"alpha", "beta", "gamma"}
    chain = {"alpha": {"beta"}, "beta": {"alpha", "gamma"},
             "gamma": {"beta"}}
    seqs: dict[int, list[str]] = {}
    for r in out:
        seqs.setdefault(r["sequence_id"], []).append((r["step"], r["tok"]))
    for sid, steps in seqs.items():
        words = [t for _, t in sorted(steps)]
        assert set(words) <= vocab
        for a, b in zip(words, words[1:]):
            assert b in chain[a], (sid, words)
