"""Property-style invariants (SURVEY.md §5 adopted strategy, item 3):
cheap hypothesis checks of algebraic contracts the golden tests can't
cover exhaustively — scale∘inverse ≡ id, gap-fill density, window
counts, split partitioning, hash model equivalence.

Example counts are kept small: every example runs Spark jobs, so the
value is breadth of generated shapes, not thousands of draws.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from paqarin_spark.operators import (
    calendar_fill,
    keep_first,
    positional_split,
    sliding_windows,
)
from paqarin_spark.operators.scaling import MinMaxScaler
from paqarin_spark.schema import TimeSeriesSchema

SCHEMA = TimeSeriesSchema(
    item_id_columns=("item",),
    timestamp_column="ts",
    value_columns=("value",),
    frequency="D",
)

PROP_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def _series_df(spark, per_entity_days: dict[str, list[tuple[int, float]]]):
    base = dt.datetime(2021, 3, 1)
    rows = [
        (item, base + dt.timedelta(days=off), val)
        for item, obs in per_entity_days.items()
        for off, val in obs
    ]
    return spark.createDataFrame(rows, "item string, ts timestamp, value double")


@PROP_SETTINGS
@given(values=st.lists(finite_floats, min_size=2, max_size=30))
def test_scale_inverse_roundtrip_is_identity(spark, values):
    df = spark.createDataFrame([(float(v),) for v in values], "value double")
    scaler = MinMaxScaler(["value"]).fit(df)
    back = [
        r["value"]
        for r in scaler.inverse_transform(scaler.transform(df)).collect()
    ]
    lo, hi = min(values), max(values)
    if lo != hi:
        scaled = [r["value"] for r in scaler.transform(df).collect()]
        assert all(0.0 <= s <= 1.0 for s in scaled)
        tol = max(1.0, abs(hi - lo)) * 1e-9
        assert sorted(back) == pytest.approx(sorted(values), abs=tol)
    else:
        # Degenerate constant column: transform pins to 0, inverse
        # reconstructs the constant.
        assert back == pytest.approx([lo] * len(values))


@PROP_SETTINGS
@given(
    data=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.dictionaries(
            st.integers(min_value=0, max_value=14), finite_floats,
            min_size=1, max_size=8,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_calendar_fill_is_dense_per_entity(spark, data):
    per_entity = {k: list(v.items()) for k, v in data.items()}
    df = _series_df(spark, per_entity)
    out = calendar_fill(df, SCHEMA, fill_value=0.0).collect()
    all_days = {off for obs in per_entity.values() for off, _ in obs}
    n_days = max(all_days) - min(all_days) + 1
    per_item: dict[str, int] = {}
    for r in out:
        per_item[r["item"]] = per_item.get(r["item"], 0) + 1
        assert r["value"] is not None
    assert per_item == {k: n_days for k in per_entity}


@PROP_SETTINGS
@given(
    n=st.integers(min_value=0, max_value=12),
    length=st.integers(min_value=1, max_value=6),
)
def test_sliding_window_count_and_length(spark, n, length):
    per_entity = {"x": [(i, float(i)) for i in range(n)]}
    df = _series_df(spark, per_entity)
    out = sliding_windows(df, SCHEMA, sequence_length=length).collect()
    assert len(out) == max(0, n - length + 1)
    assert all(len(r["sequence"]) == length for r in out)
    # windows are stride-1 and oldest-first: window i starts at value i
    starts = sorted(r["sequence"][0]["value"] for r in out)
    assert starts == [float(i) for i in range(len(out))]


@PROP_SETTINGS
@given(n=st.integers(min_value=1, max_value=40))
def test_positional_split_partitions_every_row(spark, n):
    per_entity = {"x": [(i, float(i)) for i in range(n)]}
    df = _series_df(spark, per_entity)
    win = sliding_windows(df, SCHEMA, sequence_length=1).withColumn(
        "ordinal", F.col("sequence_id") + 1
    )
    out = positional_split(win, "ordinal").collect()
    sizes = {s: 0 for s in ("train", "valid", "test")}
    for r in out:
        sizes[r["split"]] += 1
    assert sum(sizes.values()) == n
    # reference contract (multivariate_metrics.py:39-82): 75% train,
    # half the remainder valid, rest test, all by position.
    n_train = int(n * 0.75)
    n_valid = int((n - n_train) / 2)
    assert [sizes["train"], sizes["valid"], sizes["test"]] == [
        n_train,
        n_valid,
        n - n_train - n_valid,
    ]


@PROP_SETTINGS
@given(
    keys=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 3)),
        min_size=1,
        max_size=12,
    )
)
def test_keep_first_unique_and_idempotent(spark, keys):
    base = dt.datetime(2021, 3, 1)
    rows = [
        (item, base + dt.timedelta(days=off), float(i))
        for i, (item, off) in enumerate(keys)
    ]
    df = spark.createDataFrame(rows, "item string, ts timestamp, value double")
    once = keep_first(df, ["item", "ts"], ["value"])
    got = once.groupBy("item", "ts").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] == 1 for r in got)
    assert once.count() == len({(i, o) for i, o in keys})
    twice = keep_first(once, ["item", "ts"], ["value"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@PROP_SETTINGS
@given(text=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60))
def test_rolling_hash_matches_python_model(spark, text):
    import re

    from paqarin_spark.functions.text import (
        ROLLING_HASH_BASE,
        ROLLING_HASH_MOD,
        rolling_hash,
    )

    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(rolling_hash(F.col("text")).alias("h")).collect()[0]["h"]
    norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    expected = 0
    for ch in norm:
        expected = (expected * ROLLING_HASH_BASE + ord(ch)) % ROLLING_HASH_MOD
    assert got == expected


# ---------------------------------------------------------------------------
# as-of join ≡ brute-force reference; sessionize partition laws


@st.composite
def _asof_case(draw):
    left = draw(
        st.lists(
            st.tuples(st.sampled_from("ab"), st.integers(0, 40)),
            min_size=1,
            max_size=15,
        )
    )
    right = draw(
        st.lists(
            st.tuples(st.sampled_from("ab"), st.integers(0, 40), finite_floats),
            min_size=0,
            max_size=10,
            unique_by=lambda r: (r[0], r[1]),  # operator contract
        )
    )
    direction = draw(st.sampled_from(["backward", "forward"]))
    return left, right, direction


@PROP_SETTINGS
@given(case=_asof_case())
def test_asof_join_matches_bruteforce(spark, case):
    from paqarin_spark.operators import asof_join

    left_rows, right_rows, direction = case
    base = dt.datetime(2021, 3, 1)

    def ts(off):
        return base + dt.timedelta(hours=off)

    left = spark.createDataFrame(
        [(k, ts(o), i) for i, (k, o) in enumerate(left_rows)],
        "k string, ts timestamp, rid long",
    )
    right = spark.createDataFrame(
        [(k, ts(o), v) for k, o, v in right_rows],
        "k string, rts timestamp, px double",
    )
    got = {
        r["rid"]: (r["px"], r["matched_ts"])
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            direction=direction,
        ).collect()
    }
    assert set(got) == set(range(len(left_rows)))
    for i, (k, o) in enumerate(left_rows):
        if direction == "backward":
            cands = [(ro, rv) for rk, ro, rv in right_rows if rk == k and ro <= o]
            best = max(cands) if cands else None
        else:
            cands = [(ro, rv) for rk, ro, rv in right_rows if rk == k and ro >= o]
            best = min(cands) if cands else None
        if best is None:
            assert got[i] == (None, None)
        else:
            assert got[i] == (best[1], ts(best[0]))


@PROP_SETTINGS
@given(
    offsets=st.lists(st.integers(0, 200), min_size=1, max_size=25),
    gap_hours=st.integers(1, 48),
)
def test_sessionize_partition_laws(spark, offsets, gap_hours):
    from paqarin_spark.operators import sessionize

    base = dt.datetime(2021, 3, 1)
    rows = [
        ("u", base + dt.timedelta(hours=o), float(i))
        for i, o in enumerate(offsets)
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp, v double")
    out = sorted(
        (r["ts"], r["session_id"])
        for r in sessionize(df, "u", "ts", gap_seconds=gap_hours * 3600).collect()
    )
    # session ids are a non-decreasing 0-based sequence in time order,
    # stepping exactly at gaps > threshold
    assert out[0][1] == 0
    for (t0, s0), (t1, s1) in zip(out, out[1:]):
        gap = (t1 - t0).total_seconds()
        assert s1 - s0 == (1 if gap > gap_hours * 3600 else 0)


@PROP_SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_star_equals_label(spark, edges):
    """Both duplicate_clusters algorithms are exact connected
    components, so on ANY pair list they must produce the identical
    (doc, cluster_rep) map — and it must equal a driver-side
    union-find ground truth."""
    from paqarin_spark.operators import duplicate_clusters

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    label = {
        r["doc"]: r["cluster_rep"]
        for r in duplicate_clusters(pairs, max_iterations=40).collect()
    }
    star = {
        r["doc"]: r["cluster_rep"]
        for r in duplicate_clusters(
            pairs, max_iterations=40, algorithm="star"
        ).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    truth = {n: find(n) for n in nodes}
    assert label == truth
    assert star == truth


# --- multimodal codecs: encode/parse roundtrips ---------------------------


@PROP_SETTINGS
@given(
    width=st.integers(min_value=1, max_value=200),
    height=st.integers(min_value=1, max_value=200),
)
def test_bmp_roundtrip_property(width, height):
    from paqarin_spark.multimodal import bmp_row_size, encode_bmp, parse_bmp

    payload = encode_bmp(width, height)
    assert parse_bmp(payload) == {"width": width, "height": height}
    assert len(payload) == 54 + bmp_row_size(width) * height


@PROP_SETTINGS
@given(
    rate=st.integers(min_value=1, max_value=192_000),
    n=st.integers(min_value=0, max_value=10_000),
    channels=st.integers(min_value=1, max_value=2),
)
def test_wav_roundtrip_property(rate, n, channels):
    from paqarin_spark.multimodal import encode_wav, parse_wav

    payload = encode_wav(rate, n, channels=channels)
    assert parse_wav(payload) == {"sample_rate": rate, "n_samples": n}


@PROP_SETTINGS
@given(junk=st.binary(min_size=0, max_size=200))
def test_codec_parsers_never_raise_on_junk(junk):
    from paqarin_spark.multimodal import parse_bmp, parse_wav

    for parser in (parse_bmp, parse_wav):
        out = parser(junk)
        assert out is None or isinstance(out, dict)


@PROP_SETTINGS
@given(
    n_q=st.integers(min_value=1, max_value=8),
    n_m=st.integers(min_value=1, max_value=12),
    k=st.integers(min_value=1, max_value=6),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_topk_rows_matches_per_row_lexsort(n_q, n_m, k, seed):
    """The vectorized composite-key selection must agree with the
    obvious per-row lexsort by (sim desc, id asc) with self-exclusion,
    including heavy ties (sims drawn from a tiny 6dp grid)."""
    import numpy as np

    from paqarin_spark.operators.similarity import _topk_rows

    rng = np.random.default_rng(seed)
    m_ids = rng.choice(np.arange(100), size=n_m, replace=False)
    q_ids = rng.choice(np.arange(100), size=n_q, replace=False)
    # few distinct rounded values -> many exact ties
    sims = np.round(rng.choice([0.1, 0.2, 0.3], size=(n_q, n_m)), 6)

    got_q, got_n, got_s = _topk_rows(q_ids, m_ids, sims, k)
    got = list(zip(got_q.tolist(), got_n.tolist(), got_s.tolist()))

    expect = []
    for i, qid in enumerate(q_ids):
        mask = m_ids != qid
        cand_ids = m_ids[mask]
        cand_sims = sims[i][mask]
        order = np.lexsort((cand_ids, -cand_sims))[:k]
        expect.extend(
            (qid, cand_ids[j], cand_sims[j]) for j in order
        )
    assert got == [(int(a), int(b), float(c)) for a, b, c in expect]


@PROP_SETTINGS
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_png_roundtrip_property(w, h, seed):
    """encode_png -> parse_png is the identity on pixels for any
    dimensions and content (filters cycle per row, so every filter
    type participates once h >= 5)."""
    import random

    from paqarin_spark.multimodal import encode_png, parse_png

    rng = random.Random(seed)
    pix = {(x, y): (rng.randrange(256), rng.randrange(256), rng.randrange(256))
           for x in range(w) for y in range(h)}
    payload = encode_png(w, h, pixel_fn=lambda x, y: pix[(x, y)])
    png = parse_png(payload)
    assert png is not None and (png["width"], png["height"]) == (w, h)
    expect = bytes(b for y in range(h) for x in range(w) for b in pix[(x, y)])
    assert png["pixels"] == expect


@PROP_SETTINGS
@given(junk=st.binary(min_size=0, max_size=300))
def test_png_parser_never_raises_on_junk(junk):
    from paqarin_spark.multimodal import PNG_SIGNATURE, parse_png

    for payload in (junk, PNG_SIGNATURE + junk):
        out = parse_png(payload)
        assert out is None or isinstance(out, dict)


@PROP_SETTINGS
@given(
    mcs=st.integers(min_value=2, max_value=8),
    data=st.binary(min_size=0, max_size=6000),
)
def test_lzw_roundtrip_property(mcs, data):
    """GIF-flavor LZW decode(encode(x)) == x for arbitrary symbol
    streams at every min-code-size — hypothesis drives width growth,
    dictionary resets, runs (KwKwK) and empty input."""
    from paqarin_spark.multimodal import _lzw_decode, _lzw_encode

    symbols = bytes(b % (1 << mcs) for b in data)
    assert _lzw_decode(_lzw_encode(symbols, mcs), mcs) == symbols


@PROP_SETTINGS
@given(
    width=st.integers(min_value=1, max_value=24),
    height=st.integers(min_value=1, max_value=18),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_gif_roundtrip_property(width, height, seed):
    """encode_gif -> parse_gif recovers the exact raster for arbitrary
    4-color index patterns and dimensions."""
    from paqarin_spark.multimodal import GIF_PALETTE, encode_gif, parse_gif

    idx = bytes(
        (x * 31 + y * 17 + seed) % 4
        for y in range(height)
        for x in range(width)
    )
    g = parse_gif(encode_gif(width, height, list(GIF_PALETTE), idx))
    assert (g["width"], g["height"]) == (width, height)
    assert g["indices"] == idx
