"""Physical-plan audit over the declared query set: mechanically check
every plan for the scale anti-patterns the engine promises to avoid.

Red flags (fail):
  - BatchEvalPython       row-at-a-time Python UDF in the plan
  - CartesianProduct      unkeyed all-pairs join
Amber flags (report, don't fail — legitimate in bounded contexts):
  - Exchange SinglePartition   global sort/window funnel; fine for
    top-k limits and tiny dims, a bug on large relations
  - BroadcastNestedLoopJoin    non-equi join with a broadcast build
    side that materializes through the driver; fine for tiny dims
    (calendars, centroid tables), a scale-killer when the build side
    grows with the data (this is how the block-matrix crossJoin bug
    was found)

Streaming queries (st*) execute to completion INSIDE their callable,
so the frame they return is a memory-sink scan — batch-auditing it
would silently grade the wrong plan. The default pass SKIPs them
visibly; `--streaming` runs them under a StreamingQueryListener and
audits what actually matters for a stream: that a stateful operator
is present and its state row count is bounded (reported, so growth
across rounds is reviewable).

Usage:
  python tools/plan_audit.py [sf_dir] [query ...]       batch plans
  python tools/plan_audit.py --streaming [sf_dir] [st_query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from paqarin_spark.session import get_session  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

RED = ("BatchEvalPython", "CartesianProduct")
AMBER = ("Exchange SinglePartition", "BroadcastNestedLoopJoin")

# Tables whose row counts scale with SF — a forced broadcast whose
# build side scans one of these unbounded is a driver-OOM at 100 TB
# even when it is fast locally (the q80/q83/q87/q88/gen4 class found
# in round 10). region/nation are fixed-cardinality and exempt.
SF_SCALING_TABLES = (
    "customer", "orders", "lineitem", "part", "supplier",
    "events", "documents", "embeddings",
)
# Operators that bound a subtree's cardinality independent of SF: a
# global (keyless) aggregate is 1 row; explicit limits are k rows.
_BOUNDING = ("keys=[]", "TakeOrderedAndProject", "GlobalLimit", "CollectLimit")


def _tree_depth(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-"))


def _unbounded_sf_scans(lines: list[str], i: int) -> list[str]:
    """SF-scaling tables scanned in the subtree rooted at lines[i] that
    are NOT beneath a cardinality-bounding operator. Bounding is
    attributed per-branch: a bounding node exempts only the scans in
    ITS OWN subtree (deeper lines until depth returns to the bounding
    node's level), never sibling branches — a limit on one input of a
    join says nothing about the other input."""
    depth = _tree_depth(lines[i])
    scanned: set[str] = set()
    skip_depth: int | None = None
    for s in lines[i + 1:]:
        if not s.strip():
            continue
        d = _tree_depth(s)
        if d <= depth:
            break
        if skip_depth is not None:
            if d > skip_depth:
                continue
            skip_depth = None
        if any(b in s for b in _BOUNDING):
            skip_depth = d
            continue
        if "FileScan" in s:
            for t in SF_SCALING_TABLES:
                if f"{t}.parquet" in s or f"/{t}]" in s:
                    scanned.add(t)
    return sorted(scanned)


def sf_broadcast_ambers(plan: str) -> list[str]:
    """Lineage check: flag every BroadcastExchange whose build subtree
    scans an SF-scaling table with no cardinality bound (keyless
    aggregate / limit) on the path between the exchange and the scan.
    The caller builds this plan with autoBroadcastJoinThreshold=-1, so
    a BroadcastExchange can only come from an explicit F.broadcast hint
    (or a non-equi BNLJ fallback, already ambered separately) — never
    from the tiny-SF statistics that make everything broadcastable at
    sf0.001. AQE-chosen broadcasts are decided at runtime against real
    sizes and are by construction safe. This makes SURVEY §4's
    no-SF-broadcast contract mechanical: a hint can no longer hide
    behind its variable name. Bounding is per-branch (not
    whole-subtree): a limit on a sibling branch of the build side does
    not exempt an unbounded scan next to it."""
    lines = plan.splitlines()
    flags: list[str] = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        scanned = _unbounded_sf_scans(lines, i)
        if scanned:
            flags.append(f"BroadcastExchange-scans-SF({','.join(scanned)})")
    return flags


def single_partition_ambers(plan: str) -> list[str]:
    """Lineage check for the other scale funnel: flag every `Exchange
    SinglePartition` whose subtree scans an SF-scaling table with no
    cardinality bound between the exchange and the scan. A keyless
    partial aggregate or a TakeOrdered/limit beneath the exchange means
    the single partition receives a bounded row count (the normal
    scalar-agg / top-k shape); an UNBOUNDED input means one task sorts
    or windows the whole relation — the q109-round-11 failure class
    (global row_number window over every distinct user), now a finding
    by construction. Legitimate-but-unprovable bounds (group-key
    domains like event_type's 5 values) are adjudicated per-query in
    ADJUDICATED_SINGLE_PARTITION with a written reason."""
    lines = plan.splitlines()
    flags: list[str] = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        scanned = _unbounded_sf_scans(lines, i)
        if scanned:
            flags.append(f"SinglePartition-over-SF({','.join(scanned)})")
    return flags


# SF-broadcast ambers reviewed and accepted, with why the build side
# is bounded even though its lineage scans an SF-scaling table. A
# flagged query NOT in this map is a new finding — triage it (fix the
# hint, or adjudicate it here with a reason a reviewer can check).
ADJUDICATED_SF_BROADCAST: dict[str, str] = {
    "gen2_gaussian_sample": "per-step stats keyed by step (seq_len=8 domain)",
    "q43_mad_by_type": "medians keyed by event_type (5-value domain)",
    "q96_mad_robust_stats": "medians keyed by event_type (5-value domain)",
    "ev12_chi2_drift": "per-period column totals (fixed period domain)",
    "gen11_fgm_copula_sample": (
        "per-day marginal rank tables (calendar-bounded) + 1-row scalars"
    ),
    "em7_nearest_centroid": "kxd centroid table",
    "tx33_count_min_tokens": "wxd count-min counter table",
    "tx31_bm25_search": "df table filtered to the bounded query bag",
    "em30_rrf_fusion": "df table filtered to the bounded query bag",
    "tx22_contamination": (
        "benchmark probe shingles (benchmark suite bounded by construction)"
    ),
    "tx36_ingest_novelty": (
        "daily ingest batch probes (batch is the bounded side by design)"
    ),
    "ev30_wasserstein_split": (
        "per-type totals + [min,max] keyed by event_type "
        "(bounded category domain, the ev12 class)"
    ),
    "ev20_memorization_audit": (
        "generated-gram semi-join filter: 30 fixed walks x <=5 word "
        "4-grams each, bounded by the generator contract at any SF"
    ),
}


# SinglePartition-over-SF ambers reviewed and accepted, with why the
# row count reaching the single partition is bounded even though the
# lineage scans an SF-scaling table without a mechanical bound. A
# flagged query NOT in this map is a FAILURE — the q109 class (one
# task sorting an SF-scaling relation) can no longer hide in prose.
ADJUDICATED_SINGLE_PARTITION: dict[str, str] = {
    # constant-bucket two-level prefix sums: the only single-partition
    # window runs over a bucket-offset table whose row count is a
    # compile-time constant (1024 / num_buckets), never data-sized —
    # the audit can't see the constant through a keyed aggregate, so
    # the bound is recorded here
    "q01_surrogate_key": (
        "constant-1024-bucket offset rollup of the two-level "
        "first-appearance numbering (keys.add_surrogate_key)"
    ),
    "tx28_sequence_pack": (
        "constant-bucket offset table of pack_sequences' two-level "
        "prefix sum (<= num_buckets rows forever)"
    ),
    "ev6_ks_fidelity": (
        "constant-1024-bucket ECDF offset rollup (_union_ecdf_ks); "
        "the cumulative window itself is partitioned by bucket"
    ),
    "ev15_synth_ks": (
        "constant-1024-bucket ECDF offset rollup (_union_ecdf_ks)"
    ),
    "ev16_generator_rank": (
        "constant-1024-bucket ECDF offset rollup per generator "
        "(_union_ecdf_ks) + 2-row leaderboard sort"
    ),
    # documented exact-result contracts (each docstring names its
    # 100-TB percentile-binned alternative)
    "q57_order_deciles": (
        "constant-1024-bucket offset rollup of distributed_ntile "
        "(exact NTILE from two-level ranks; no global sort)"
    ),
    "tx34_perplexity_buckets": (
        "constant-1024-bucket offset rollup of distributed_ntile "
        "(q57 class)"
    ),
    "ev27_psi_drift": (
        "constant-1024-bucket offset rollup of distributed_rank "
        "(exact decile edges from two-level ranks; no global sort)"
    ),
    # domain-bounded windows: the exchanged row count is bounded by a
    # calendar / top-k construction, not by SF
    "q104_theil_sen_trend": (
        "median window over day-pair slopes; days grow with the "
        "calendar, not SF (a year is ~66k pairs forever)"
    ),
    "em30_rrf_fusion": (
        "rank windows over two top-k lanes (<= 2*k=40 rows by "
        "construction)"
    ),
    "gen11_fgm_copula_sample": (
        "per-day marginal rank tables (calendar-bounded; same bound "
        "as its adjudicated broadcast) + 1-row scalars"
    ),
}


def _is_streaming(name: str) -> bool:
    return name.startswith("st") and name[2:3].isdigit()


def audit_batch(spark, sf_dir: str, only: set[str]) -> list[str]:
    failures: list[str] = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        if _is_streaming(name):
            print(f"SKIP {name}: streaming — audit with --streaming")
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            # second planning pass with size-based broadcast disabled:
            # any BroadcastExchange left is an explicit hint (see
            # sf_broadcast_ambers) — planning only, nothing executes
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                hinted = (
                    fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
                )
            finally:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: plan build failed: {exc}")
            continue
        reds = [m for m in RED if m in plan]
        sf_flags = sf_broadcast_ambers(hinted)
        if sf_flags and name in ADJUDICATED_SF_BROADCAST:
            why = ADJUDICATED_SF_BROADCAST[name]
            sf_flags = [f"{f}[adjudicated: {why}]" for f in sf_flags]
        sp_flags = single_partition_ambers(plan)
        if sp_flags and name in ADJUDICATED_SINGLE_PARTITION:
            why = ADJUDICATED_SINGLE_PARTITION[name]
            sp_flags = [f"{f}[adjudicated: {why}]" for f in sp_flags]
        elif sp_flags:
            reds = reds + [f"unadjudicated:{f}" for f in sp_flags]
        ambers = [m for m in AMBER if m in plan] + sf_flags + sp_flags
        status = "FAIL" if reds else "ok"
        notes = ", ".join(reds + [f"amber:{a}" for a in ambers]) or "clean"
        print(f"{status:4} {name}: {notes}")
        if reds:
            failures.append(f"{name}: {reds}")
    return failures


def audit_streaming(spark, sf_dir: str, only: set[str]) -> list[str]:
    """Run each streaming query under a progress listener and report
    its stateful operators + peak state rows. Fails a query whose run
    produced NO stateful operator (the memory-sink-scan trap this
    audit exists to prevent) — stateless pass-through streams must be
    explicitly adjudicated, not silently skipped."""
    from pyspark.sql.streaming import StreamingQueryListener

    class Collector(StreamingQueryListener):
        def __init__(self) -> None:
            self.ops: dict[str, dict[str, int]] = {}

        def onQueryStarted(self, event) -> None:  # noqa: N802
            pass

        def onQueryProgress(self, event) -> None:  # noqa: N802
            p = event.progress
            for so in p.stateOperators:
                d = self.ops.setdefault(so.operatorName, {})
                d["numRowsTotal"] = max(
                    d.get("numRowsTotal", 0), so.numRowsTotal
                )

        def onQueryIdle(self, event) -> None:  # noqa: N802
            pass

        def onQueryTerminated(self, event) -> None:  # noqa: N802
            pass

    failures: list[str] = []
    for name, fn in entrymod.queries().items():
        if not _is_streaming(name) or (only and name not in only):
            continue
        collector = Collector()
        spark.streams.addListener(collector)
        try:
            fn(spark, sf_dir).collect()
            # listener events are delivered async; drain briefly
            deadline = time.time() + 10
            while not collector.ops and time.time() < deadline:
                time.sleep(0.2)
            # terminated-events may still be in flight after the query
            # finished; let the bus drain BEFORE unregistering so the
            # JVM never calls back into a removed Python listener
            time.sleep(0.5)
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: streaming run failed: {exc}")
            # same drain-before-unregister as the success path — the
            # failed query's terminated events may still be in flight
            time.sleep(0.5)
            spark.streams.removeListener(collector)
            continue
        spark.streams.removeListener(collector)
        if not collector.ops:
            if name in STATELESS_STREAMS:
                # declared-stateless streams (file-sink commit-protocol
                # proofs) carry no state store BY DESIGN — the audit
                # asserts the declaration, not the absence
                print(f"ok   {name}: stateless by declaration (no state store)")
            else:
                failures.append(f"{name}: no stateful operator observed")
                print(f"FAIL {name}: no stateful operator observed")
        else:
            desc = ", ".join(
                f"{op}[rows<={d['numRowsTotal']}]"
                for op, d in sorted(collector.ops.items())
            )
            print(f"ok   {name}: {desc}")
    return failures


# Streams that hold NO state store by design: st20 proves the parquet
# file-sink exactly-once commit protocol through a stateless
# projection — requiring a stateful operator there would grade the
# wrong contract. Every other st* query must show bounded state.
STATELESS_STREAMS = {"st20_stream_file_sink"}


def main() -> int:
    args = sys.argv[1:]
    streaming_mode = "--streaming" in args
    args = [a for a in args if a != "--streaming"]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    spark = get_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    if streaming_mode:
        failures = audit_streaming(spark, sf_dir, only)
    else:
        failures = audit_batch(spark, sf_dir, only)

    if failures:
        print(f"\n{len(failures)} plan failures")
        for f in failures:
            print(f"  {f}")
        rc = 1
    else:
        print("\nall plans clean of red flags")
        rc = 0
    # stop the session explicitly (after all listeners are removed and
    # the bus has drained) so the StreamingQueryListenerBus is torn
    # down while the Py4J callback server is still up — otherwise the
    # exit log shows a cosmetic Py4JException after the verdict
    if streaming_mode:
        time.sleep(1.0)
    try:
        spark.stop()
    except Exception:  # noqa: BLE001
        pass
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
