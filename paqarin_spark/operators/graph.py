"""Iterative graph analytics over edge lists (north-star extension):
weighted PageRank as the canonical fixed-point join-iterate pattern.

The same loop shape as operators/dedup.py's connected components —
per-iteration: one join keyed on the source node, one aggregation
keyed on the destination — so every round is two well-keyed shuffles
and the rank table never leaves the cluster. Dangling mass (nodes
with no out-edges) is redistributed uniformly IN-PLAN via a 1-row
broadcast, not a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank with a FIXED iteration count (deterministic —
    no convergence threshold, so the oracle can unroll the exact same
    number of rounds in SQL CTEs). ``weight=None`` treats every edge
    as 1. Output: (node, rank) over all nodes appearing as src or dst.

    Per iteration: contributions flow along pre-normalized edge
    fractions (edge weight / source out-weight, computed ONCE before
    the loop), inflows aggregate on the destination key, and the
    dangling mass folds in through a single-row broadcast — the plan
    a 1000-executor rank computation wants: two keyed exchanges per
    round, rank state partitioned by node, nothing through the
    driver.
    """
    w = F.col(weight) if weight else F.lit(1.0)
    # Loop invariants persist once: without this, every iteration's
    # lineage re-executes the caller's whole edge-construction ETL
    # (for q69 a 5-table join) several times per round — the classic
    # iterative-algorithm mistake. Persist (not checkpoint) so large
    # edge lists spill to disk instead of failing.
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), w.alias("_w")
    ).persist()
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .persist()
    )
    n_row = nodes.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    out_w = e.groupBy("_s").agg(F.sum("_w").alias("_ow"))
    # Cast to double AT the division (weights may arrive as exact
    # decimals — summing them in their native type keeps _ow order-
    # independent; dividing as doubles keeps the fraction's float
    # value engine-reproducible).
    frac = (
        e.join(out_w, on="_s")
        .select(
            "_s",
            "_d",
            (F.col("_w").cast("double") / F.col("_ow").cast("double")).alias(
                "_frac"
            ),
        )
        .persist()
    )
    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    has_out = out_w.select(F.col("_s").alias("node")).persist()
    for _ in range(int(iterations)):
        inflow = (
            frac.join(ranks, frac._s == ranks.node)
            .groupBy("_d")
            .agg(F.sum(F.col("rank") * F.col("_frac")).alias("_in"))
        )
        dangling = (
            ranks.join(has_out, on="node", how="left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        # localCheckpoint the evolving state every round: `ranks` is
        # referenced TWICE per iteration (inflow + dangling), so an
        # unpersisted lineage would double each round — ~2^iterations
        # plan duplication long before deep runs finish. Checkpointing
        # keeps every round planning against a flat scan (same
        # discipline as the dedup label/contract loops).
        new_ranks = (
            nodes.join(inflow, nodes.node == inflow._d, "left")
            .crossJoin(F.broadcast(dangling))
            .crossJoin(F.broadcast(n_row))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("_n")
                    + damping
                    * (
                        F.coalesce(F.col("_in"), F.lit(0.0))
                        + F.col("_dm") / F.col("_n")
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        ranks = new_ranks
    # The final state is checkpointed, so the loop invariants can drop.
    for frame in (frac, has_out, nodes, e):
        frame.unpersist()
    return ranks
