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
