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

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from paqarin_spark.session import get_session  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

RED = ("BatchEvalPython", "CartesianProduct")
AMBER = ("Exchange SinglePartition", "BroadcastNestedLoopJoin")

# Streaming queries run to completion inside the callable; their
# returned frame is a memory-sink scan, so the interesting plan has
# already executed. Audit the batch plans.
SKIP = {
    "st1_stream_daily_sum",
    "st2_stream_window_sums",
    "st3_stream_sessions",
    "st4_stream_minmax",
    "st5_stream_dedup",
    "st6_stream_daily_users",
    "st7_stream_enrich",
    "st8_stream_interval_join",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    failures: list[str] = []
    for name, fn in entrymod.queries().items():
        if name in SKIP or (only and name not in only):
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: plan build failed: {exc}")
            continue
        reds = [m for m in RED if m in plan]
        ambers = [m for m in AMBER if m in plan]
        status = "FAIL" if reds else "ok"
        notes = ", ".join(reds + [f"amber:{a}" for a in ambers]) or "clean"
        print(f"{status:4} {name}: {notes}")
        if reds:
            failures.append(f"{name}: {reds}")

    if failures:
        print(f"\n{len(failures)} plan failures")
        for f in failures:
            print(f"  {f}")
        return 1
    print("\nall plans clean of red flags")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
