"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing is per-query wall time of the full action (plan + execute +
collect to driver), after one warm-up action to amortize JVM/session
startup out of the numbers. Each query runs twice and the faster run
is reported: steady-state throughput is the quantity of interest, and
a single-JVM local session occasionally hits a multi-second JIT
recompilation stall that would otherwise land on whichever query was
unlucky enough to be running.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from paqarin_spark.session import get_session  # noqa: E402
from paqarin_spark.sources import TABLES, read_table  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    only = set(sys.argv[1:])

    spark = get_session("paqarin-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    # Warm-up, untimed: fully decode EVERY input table (per-column
    # count forces page reads, filling the OS page cache and JIT'ing
    # the parquet/codegen path for each table's physical types).
    # BENCH_r03 ran ~2x high on map-heavy documents/assets/embeddings
    # queries while trivial ones were stable — cold-cache noise that an
    # events-only warm-up can't amortize.
    for t in TABLES:
        df = read_table(spark, sf_dir, t)
        df.select([F.count(df[c]) for c in df.columns]).collect()
    # Warm the Python-worker/Arrow lane once so the first Pandas-UDF
    # query isn't charged for interpreter fork + Arrow JIT. The
    # closure imports the in-repo codec stack so reused workers
    # (spark.python.worker.reuse) already hold numpy + jpeg/multimodal
    # when the first mm query runs — without this the registry-first
    # query absorbs ~7s of 32x module-import cost that belongs to
    # session startup, not to that query.
    def _warm(it):
        import numpy  # noqa: F401
        from paqarin_spark import jpeg, multimodal  # noqa: F401

        return it

    spark.range(64).repartition(32).mapInPandas(
        _warm, schema="id bigint"
    ).count()

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        best = None
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                n = len(fn(spark, sf_dir).collect())
                elapsed = time.perf_counter() - t0
                if best is None or elapsed < best:
                    best = elapsed
        except Exception as exc:  # noqa: BLE001 — report, keep benching
            print(f"# {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0
            continue
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s rows={n}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # The driver keeps only the LAST 2000 characters of stdout and
    # json-parses the final line (round-1 BENCH had "parsed": null
    # because the full-name 95-query line was ~3.8k chars and lost its
    # head). Emit the final line with each query's unique short prefix
    # ("q01_surrogate_key" -> "q01") so all ~95 timings fit in one
    # parseable <2000-char line; the full-name table goes to
    # bench_results.json alongside the short->full mapping.
    # Prefix collisions disambiguate with a deterministic ~N suffix
    # (registry order) — NEVER fall back to full names, which is the
    # ~3.8k-char line that overflowed the tail in round 1.
    short: dict[str, float] = {}
    short_to_full: dict[str, str] = {}
    for name, t in timings.items():
        key = name.split("_", 1)[0]
        if key in short_to_full:
            i = 2
            while f"{key}~{i}" in short_to_full:
                i += 1
            key = f"{key}~{i}"
        # 2dp in the stdout line (3dp stays in bench_results.json):
        # at 137 queries the 3dp line brushes the 1900-char budget.
        short[key] = round(t, 2)
        short_to_full[key] = name
    payload = {
        "metric": "declared_query_set_total",
        "value": total,
        "unit": "sec",
        "queries": short,
        "sf": sf_val,
    }
    if only:
        # Scoped runs (bench.py q81 ...) are an iteration tool; the
        # committed artifact must stay the FULL declared-set table —
        # a partial overwrite silently destroys the round-over-round
        # comparison and the short->full mapping.
        print(json.dumps(payload))
        return 0
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_results.json"),
        "w",
    ) as fh:
        json.dump(
            {
                "metric": "declared_query_set_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "short_to_full": short_to_full,
                "sf": sf_val,
            },
            fh,
            indent=1,
        )
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) >= 1800:
        # Registry growth pushes the 2dp line toward the driver's
        # 2000-char stdout tail: degrade per-query precision to 1dp
        # (full 3dp stays in bench_results.json) before the line can
        # lose its head and parse as null like round 1 did.
        payload["queries"] = {k: round(t, 1) for k, t in short.items()}
        line = json.dumps(payload, separators=(",", ":"))
    if len(line) >= 1900:
        # Final degrade: drop stable sub-0.5s queries from the LINE
        # (their 3dp timings stay in bench_results.json) — they are
        # the ones with nothing to say about scale posture, and the
        # omitted count keeps the line self-describing.
        fast = {k for k, t in short.items() if 0 <= t < 0.5}
        payload["queries"] = {
            k: round(t, 1) for k, t in short.items() if k not in fast
        }
        payload["omitted_fast"] = len(fast)
        line = json.dumps(payload, separators=(",", ":"))
    if len(line) >= 1900:
        # Last lever: keep only the 60 slowest queries in the line —
        # they carry the scale story; everything else lives in
        # bench_results.json. `omitted` keeps the line self-describing.
        slowest = dict(
            sorted(short.items(), key=lambda kv: -kv[1])[:60]
        )
        payload["queries"] = {k: round(t, 1) for k, t in slowest.items()}
        payload.pop("omitted_fast", None)
        payload["omitted"] = len(short) - len(slowest)
        line = json.dumps(payload, separators=(",", ":"))
    if len(line) >= 1900:  # must fit the driver's 2000-char stdout tail
        print(f"# bench line {len(line)} chars > 1900", file=sys.stderr)
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
