"""First-order Markov categorical sequence generator — synthetic
EVENT-TYPE streams learned from real event logs.

The numeric generators (bootstrap/gaussian/conditional) cover the
reference's value-series surface (`paqarin/generator.py:65-98`
fit→generate contract); this one covers the categorical half a
training-data pipeline needs: synthesizing plausible action sequences
(funnel simulation, load testing, privacy-preserving event-log
release). No reference counterpart — north-star extension.

Design for scale and determinism:

- ``fit`` estimates the initial distribution (first event per entity)
  and the first-order transition matrix with exactly the q66 plan
  (per-entity lag windows, one (prev, next)-keyed shuffle). The
  fitted state is bounded by the category vocabulary (|types| +
  |types|^2 rows), so collecting it to the driver is the same
  bounded-state move as MinMaxScaler — never row data.
- ``generate`` runs the sampling walk as PURE JVM expressions: the
  per-step uniform draw is ``conv(md5(seq#step#seed)) / 2^60`` (the
  same portable hash the q67 KMV sketch pins against DuckDB), and the
  CDF inversion is an array filter over ONE constant
  map<state, cdf-array> literal folded over steps with
  ``F.aggregate`` — one codegen'd projection over ``spark.range(n)``,
  no Python, no shuffle, trivially parallel in n. (The map literal is
  built as a single JVM-parsed ``F.expr`` string: the earlier
  nested-CASE form cost a Py4J round-trip per expression node —
  seconds of driver time on a token-level vocabulary — for identical
  picks.) Because every draw
  is a pure function of (sequence_id, step, seed), the output is
  reproducible on any cluster layout AND expressible in portable SQL
  — gen5's DuckDB oracle replays the identical walk with a recursive
  CTE, making this the one generator whose samples are value-checked,
  not just row-counted.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from paqarin_spark.generator import (
    GeneratorParameters,
    TimeSeriesGenerator,
    _read_params,
    _write_params,
)
from paqarin_spark.sources import hadoop_read_text, hadoop_write_text

# Single-source md5-prefix uniform shared across the determinism
# surface (re-exported here for existing importers).
from paqarin_spark.functions import TWO_POW_60, uniform_hash  # noqa: F401,E402


def _cdf(counts: dict[str, int]) -> list[tuple[str, float]]:
    """(category, cumulative probability) in sorted-category order.
    Cumulative INT count divided by total once per entry — the exact
    double DuckDB's ``SUM(c) OVER (ORDER BY ..) / total`` produces, so
    oracle comparisons are bit-identical."""
    total = sum(counts.values())
    out, run = [], 0
    for cat in sorted(counts):
        run += counts[cat]
        out.append((cat, run / total))
    return out


def _pick(cdf: list[tuple[str, float]], u: Column) -> Column:
    """CDF inversion as a nested CASE: first category whose cumulative
    probability reaches ``u``. The last branch is the unconditional
    fallback so float edge cases (u == 1.0) stay total."""
    expr = F.lit(cdf[-1][0])
    for cat, cum in reversed(cdf[:-1]):
        expr = F.when(u <= F.lit(cum), F.lit(cat)).otherwise(expr)
    return expr


def _sql_str(s: str) -> str:
    """Single-quoted SQL string literal (quote/backslash doubled)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _cdf_arr_sql(cdf: list[tuple[str, float]]) -> str:
    """The CDF as a constant array<struct<c,s>> SQL literal (sorted-
    category order preserved).  ``repr(cum)`` is the shortest decimal
    that round-trips to the exact double, and the ``D`` suffix makes
    the parser read it as DOUBLE (a bare decimal literal would become
    DECIMAL and change the <= comparisons), so the thresholds are
    bit-identical to the F.lit form."""
    return (
        "array("
        + ",".join(
            f"named_struct('c',{cum!r}D,'s',{_sql_str(cat)})"
            for cat, cum in cdf
        )
        + ")"
    )


def _cdf_arr(cdf: list[tuple[str, float]]) -> Column:
    """``_cdf_arr_sql`` parsed JVM-side in ONE call.  Building the
    same constant out of nested ``F.lit``/``F.struct`` costs a Py4J
    round-trip per node — on a fitted token vocabulary (~1k transition
    entries) that is several SECONDS of driver chatter before any plan
    exists; one ``F.expr`` string is milliseconds."""
    return F.expr(_cdf_arr_sql(cdf))


def _pick_arr(arr: Column, u: Column) -> Column:
    """CDF inversion over a constant struct array: the FIRST entry (in
    the array's sorted-category order) whose cumulative reaches ``u``,
    with the last entry as the unconditional float-edge fallback —
    pick-for-pick identical to the nested-CASE ``_pick`` (same
    thresholds, same <= comparisons, same order), but expression DEPTH
    is O(1) instead of O(|states|).  A vocabulary-sized chain of
    ``WHEN ... OTHERWISE (WHEN ...)`` nodes is quadratic in the
    analyzer (each When wraps the whole remaining chain) and is copied
    into every unrolled walk step; the array/map literal form keeps
    the fitted CDFs as DATA, which constant-folding collapses to a
    single Literal per step."""
    hit = F.element_at(F.filter(arr, lambda e: u <= e["c"]), 1)["s"]
    return F.coalesce(hit, F.element_at(arr, -1)["s"])


class MarkovEventGenerator(TimeSeriesGenerator):
    provider = "paqarin_spark"
    method = "markov"

    def __init__(
        self, parameters: GeneratorParameters, category_column: str = "event_type"
    ):
        super().__init__(parameters)
        self.category_column = category_column
        self.initial: dict[str, int] | None = None
        self.transitions: dict[str, dict[str, int]] | None = None

    @property
    def is_fitted(self) -> bool:
        return self.initial is not None

    def fit(self, training_data: DataFrame) -> "MarkovEventGenerator":
        from pyspark.sql import Window

        schema = self.parameters.schema
        cat = self.category_column
        # Deterministic per-entity order: timestamp, then category as
        # the tie-break (same contract as the q66 oracle).
        w = Window.partitionBy(*schema.ids).orderBy(
            F.col(schema.timestamp_column), F.col(cat)
        )
        ordered = training_data.select(
            F.col(cat).alias("_cat"),
            F.row_number().over(w).alias("_rn"),
            F.lag(cat).over(w).alias("_prev"),
        )
        # ONE grouped pass + ONE collect: the per-entity window (a
        # full shuffle-and-sort of the training data) is the expensive
        # part, so both distributions come out of the same scan —
        # (_first, _prev, _cat) rows are initial counts where _first,
        # transition counts where _prev is set.
        rows = (
            ordered.groupBy(
                (F.col("_rn") == 1).alias("_first"), "_prev", "_cat"
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        self.initial = {}
        self.transitions = {}
        observed: set[str] = set()
        for r in rows:
            observed.add(r["_cat"])
            if r["_first"]:
                self.initial[r["_cat"]] = (
                    self.initial.get(r["_cat"], 0) + r["c"]
                )
            if r["_prev"] is not None:
                observed.add(r["_prev"])
                nexts = self.transitions.setdefault(r["_prev"], {})
                nexts[r["_cat"]] = nexts.get(r["_cat"], 0) + r["c"]
        # Absorbing fallback over EVERY observed category, not just the
        # initial ones: a category that only ever appears as a
        # non-first FINAL event is still reachable mid-walk, and
        # without outgoing mass the sampler would fall through to an
        # arbitrary CDF (and diverge from the oracle). Self-loop keeps
        # the chain total.
        for cat_name in observed:
            self.transitions.setdefault(cat_name, {cat_name: 1})
        return self

    def generate(
        self, number_of_sequences: int, seed: int | None = None
    ) -> DataFrame:
        if self.initial is None or self.transitions is None:
            raise RuntimeError("generator is not fitted")
        if not self.initial:
            raise RuntimeError(
                "generator was fitted on an empty relation — no initial "
                "distribution to sample from"
            )
        seed = self.parameters.seed if seed is None else seed
        length = self.parameters.sequence_length
        spark = SparkSession.getActiveSession()
        base = spark.range(number_of_sequences).select(
            F.col("id").alias("sequence_id")
        )
        sid = F.col("sequence_id").cast("string")
        first = _pick_arr(
            _cdf_arr(_cdf(self.initial)),
            uniform_hash(sid, F.lit(0), F.lit(str(seed))),
        )
        trans_cdfs = {
            prev: _cdf(nexts) for prev, nexts in self.transitions.items()
        }
        # One constant map<state, cdf-array> shared by every step —
        # fit() guarantees an entry for every observed category, so the
        # element_at lookup always hits.  (The previous form compiled a
        # nested CASE over every fitted state per step; on a token-
        # level vocabulary that is a depth-|V| expression the analyzer
        # re-walks quadratically — gen9's 30 walks spent ~6 s in plan
        # compilation, zero in execution.)
        states = sorted(trans_cdfs)
        trans_map = F.expr(
            "map("
            + ",".join(
                f"{_sql_str(p)},{_cdf_arr_sql(trans_cdfs[p])}"
                for p in states
            )
            + ")"
        )

        def step(acc, i):
            u = uniform_hash(sid, i, F.lit(str(seed)))
            nxt = _pick_arr(F.element_at(trans_map, acc["cur"]), u)
            return F.struct(
                nxt.alias("cur"),
                F.concat(acc["seq"], F.array(nxt)).alias("seq"),
            )

        init_struct = F.struct(first.alias("cur"), F.array(first).alias("seq"))
        if length <= 1:
            # F.sequence(1, 0) would produce the DESCENDING [1, 0] and
            # append two spurious steps; a 1-step walk is just the
            # initial draw.
            walk = init_struct["seq"]
        else:
            walk = F.aggregate(
                F.sequence(F.lit(1), F.lit(length - 1)),
                init_struct,
                step,
                lambda acc: acc["seq"],
            )
        return base.select(
            "sequence_id", F.posexplode(walk).alias("step", self.category_column)
        )

    def save(self, path: str) -> None:
        if self.initial is None:
            raise RuntimeError("generator is not fitted")
        spark = SparkSession.getActiveSession()
        _write_params(
            path,
            self.parameters,
            {"provider": self.provider, "method": self.method},
            spark=spark,
        )
        hadoop_write_text(
            spark,
            os.path.join(path, "markov.json"),
            json.dumps(
                {
                    "category_column": self.category_column,
                    "initial": self.initial,
                    "transitions": self.transitions,
                }
            ),
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "MarkovEventGenerator":
        params, _ = _read_params(path, spark=spark)
        state = json.loads(
            hadoop_read_text(spark, os.path.join(path, "markov.json"))
        )
        gen = cls(params, category_column=state["category_column"])
        gen.initial = state["initial"]
        gen.transitions = state["transitions"]
        return gen
