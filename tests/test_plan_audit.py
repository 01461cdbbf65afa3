"""The lineage-based broadcast check is a CONTRACT (SURVEY §4 cites it
as the mechanical enforcement of the no-SF-broadcast policy), so its
parsing logic gets pinned directly on synthetic plan trees — no Spark
session needed."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from plan_audit import sf_broadcast_ambers  # noqa: E402


PLAN_HINTED_SUPPLIER = """
*(5) Project [l_orderkey#1L]
+- *(5) BroadcastHashJoin [l_suppkey#3L], [s_suppkey#10L], LeftSemi
   :- *(5) ColumnarToRow
   :  +- FileScan parquet [l_suppkey#3L] Location: [file:/data/lineitem.parquet]
   +- BroadcastExchange HashedRelationBroadcastMode
      +- *(3) Filter (s_nationkey#12L < 5)
         +- *(3) ColumnarToRow
            +- FileScan parquet [s_suppkey#10L] Location: [file:/data/supplier.parquet]
"""

PLAN_SCALAR_AGG = """
*(4) Project [c_acctbal#2]
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- *(4) ColumnarToRow
   :  +- FileScan parquet [c_acctbal#2] Location: [file:/data/customer.parquet]
   +- BroadcastExchange IdentityBroadcastMode
      +- *(3) HashAggregate(keys=[], functions=[avg(c_acctbal#5)])
         +- Exchange SinglePartition
            +- *(2) HashAggregate(keys=[], functions=[partial_avg(c_acctbal#5)])
               +- FileScan parquet [c_acctbal#5] Location: [file:/data/customer.parquet]
"""

PLAN_BOUNDED_DIM = """
*(2) BroadcastHashJoin [c_nationkey#4L], [n_nationkey#9L], Inner
:- FileScan parquet [c_nationkey#4L] Location: [file:/data/customer.parquet]
+- BroadcastExchange HashedRelationBroadcastMode
   +- FileScan parquet [n_nationkey#9L] Location: [file:/data/nation.parquet]
"""

PLAN_LIMITED = """
*(2) BroadcastHashJoin [doc_id#1L], [doc_id#7L], Inner
:- FileScan parquet [doc_id#1L] Location: [file:/data/documents.parquet]
+- BroadcastExchange HashedRelationBroadcastMode
   +- TakeOrderedAndProject(limit=32, orderBy=[cnt#9L DESC])
      +- FileScan parquet [doc_id#7L] Location: [file:/data/documents.parquet]
"""


def test_flags_hinted_sf_table_broadcast():
    flags = sf_broadcast_ambers(PLAN_HINTED_SUPPLIER)
    assert flags == ["BroadcastExchange-scans-SF(supplier)"]


def test_keyless_aggregate_bounds_the_subtree():
    assert sf_broadcast_ambers(PLAN_SCALAR_AGG) == []


def test_fixed_cardinality_dim_is_exempt():
    assert sf_broadcast_ambers(PLAN_BOUNDED_DIM) == []


def test_limit_bounds_the_subtree():
    assert sf_broadcast_ambers(PLAN_LIMITED) == []


def test_subtree_ends_at_sibling_depth():
    # the probe-side lineitem scan sits OUTSIDE the exchange subtree —
    # only the build side may be attributed to the broadcast
    flags = sf_broadcast_ambers(PLAN_HINTED_SUPPLIER)
    assert all("lineitem" not in f for f in flags)


from plan_audit import single_partition_ambers  # noqa: E402


PLAN_SIBLING_LIMIT = """
*(3) BroadcastHashJoin [doc_id#1L], [doc_id#7L], Inner
:- FileScan parquet [doc_id#1L] Location: [file:/data/documents.parquet]
+- BroadcastExchange HashedRelationBroadcastMode
   +- *(2) SortMergeJoin [doc_id#7L], [doc_id#9L], Inner
      :- TakeOrderedAndProject(limit=32, orderBy=[cnt#9L DESC])
      :  +- FileScan parquet [doc_id#7L] Location: [file:/data/documents.parquet]
      +- *(2) Filter isnotnull(doc_id#9L)
         +- FileScan parquet [doc_id#9L] Location: [file:/data/lineitem.parquet]
"""

PLAN_GLOBAL_WINDOW = """
*(4) Project [user_id#1L, _rn#20]
+- Window [row_number() windowspecdefinition(_u#5 ASC NULLS FIRST)]
   +- *(3) Sort [_u#5 ASC NULLS FIRST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=64]
         +- *(2) HashAggregate(keys=[user_id#1L], functions=[max(_a#2)])
            +- Exchange hashpartitioning(user_id#1L, 32)
               +- *(1) HashAggregate(keys=[user_id#1L], functions=[partial_max(_a#2)])
                  +- FileScan parquet [user_id#1L] Location: [file:/data/events.parquet]
"""

PLAN_BOUNDED_WINDOW = """
*(4) Project [user_id#1L, _rn#20]
+- Window [row_number() windowspecdefinition(_u#5 ASC NULLS FIRST)]
   +- *(3) Sort [_u#5 ASC NULLS FIRST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=64]
         +- TakeOrderedAndProject(limit=64, orderBy=[_u#5 ASC NULLS FIRST])
            +- FileScan parquet [user_id#1L] Location: [file:/data/events.parquet]
"""

PLAN_SCALAR_FUNNEL = """
*(3) HashAggregate(keys=[], functions=[sum(rev#9)])
+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=12]
   +- *(2) HashAggregate(keys=[], functions=[partial_sum(rev#9)])
      +- FileScan parquet [rev#9] Location: [file:/data/lineitem.parquet]
"""


def test_sibling_limit_does_not_exempt_unbounded_branch():
    # the limit bounds ONE join input; the lineitem scan beside it is
    # still unbounded — the whole-subtree exemption was a false
    # negative (round-11 ADVICE)
    flags = sf_broadcast_ambers(PLAN_SIBLING_LIMIT)
    assert flags == ["BroadcastExchange-scans-SF(lineitem)"]


def test_single_partition_over_unbounded_rollup_is_flagged():
    # the q109-round-11 shape: global row_number window fed by a
    # SinglePartition exchange over every distinct user — the keyed
    # aggregate does NOT bound cardinality
    flags = single_partition_ambers(PLAN_GLOBAL_WINDOW)
    assert flags == ["SinglePartition-over-SF(events)"]


def test_single_partition_after_take_ordered_is_clean():
    # the q16/q109-fixed shape: orderBy+limit first, window over the
    # k survivors only
    assert single_partition_ambers(PLAN_BOUNDED_WINDOW) == []


def test_single_partition_scalar_aggregate_is_clean():
    # keyless partial aggregate beneath the exchange = 1 row per
    # upstream partition reaches the single task
    assert single_partition_ambers(PLAN_SCALAR_FUNNEL) == []
