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

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _copartitioned_invariant(df: DataFrame, *keys: str) -> DataFrame:
    """Persist a loop-invariant table hash-partitioned (and sorted)
    on its per-round join/aggregation key.

    Iterative operators join the evolving state table against the
    same edge-sized invariant every round; with a plain ``persist``
    the planner re-exchanges the INVARIANT on each round's sort-merge
    join because the cached relation carries no useful partitioning.
    Caching it already hash-partitioned+sorted on the probe key makes
    every round reuse that one exchange — only the (much smaller)
    state side shuffles per round (optimization guide §2.4: two
    operations keyed the same way share one exchange). Measured on
    q85's BFS at sf0.1: hops 19.9 s → 7.9 s, identical results.

    The partition count is ``defaultParallelism`` (total cores, on
    local[N] and a cluster alike): enough that every core owns a
    partition of the invariant, and — because the cached layout is
    scanned once per round — deliberately NOT the session's 4×-cores
    shuffle fanout, whose per-round task-launch overhead on a cached
    tiny table swamps the saved exchange (measured on q111: a
    128-partition cached edge table scanned 8× ran 2× slower at
    sf0.1 than the un-partitioned baseline; at 32 it wins)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *keys).sortWithinPartitions(*keys).persist()


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


def triangles(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact triangle enumeration over an undirected edge list via
    degree-ordered orientation — the MapReduce "node-iterator++" /
    compact-forward algorithm (Suri & Vassilvitskii, WWW'11): orient
    every edge from its lower-(degree, id) endpoint to the higher one,
    enumerate wedges at each triangle's LOWEST-rank vertex by
    self-joining the oriented out-edge list on the source, and close
    each wedge with one equi-probe back into the oriented edges.

    Output: one row per triangle, columns (x, y, z) with
    rank(x) < rank(y) < rank(z) — each triangle exactly once.

    Scale posture: degree-ordering bounds every oriented out-degree by
    O(sqrt(m)), so the wedge join's intermediate is O(m^1.5) worst
    case instead of the unordered sum of squared degrees (a single hub
    of degree d contributes C(d,2) wedges unordered but ~0 once its
    edges all point INTO it). Three keyed shuffles total — degree agg,
    wedge self-join on the low vertex, closing probe on (y, z) — and
    the oriented edge list is locally checkpointed once so the three
    probes scan a materialized table instead of re-running the
    caller's edge ETL three times. Beyond-reference north-star op
    (graph family #3 beside pagerank / connected components);
    SURVEY.md §2 'Not present in the reference'.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionByName(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du, dv = deg.alias("du"), deg.alias("dv")
    ranked = (
        e.join(du, F.col("u") == F.col("du.n"))
        .join(dv, F.col("v") == F.col("dv.n"))
        .select(
            "u", "v",
            F.col("du.d").alias("_dU"), F.col("dv.d").alias("_dV"),
        )
    )
    u_first = (F.col("_dU") < F.col("_dV")) | (
        (F.col("_dU") == F.col("_dV")) & (F.col("u") < F.col("v"))
    )
    # Eager local checkpoint: `o` feeds all three probe sides below,
    # and the wedge join would otherwise replay the caller's full edge
    # construction (often a multi-table self-join) three times.
    o = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("_dV")).otherwise(F.col("_dU")).alias("db"),
    ).localCheckpoint()
    e.unpersist()
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    rank_lt = (F.col("e1.db") < F.col("e2.db")) | (
        (F.col("e1.db") == F.col("e2.db")) & (F.col("e1.b") < F.col("e2.b"))
    )
    return (
        e1.join(e2, (F.col("e1.a") == F.col("e2.a")) & rank_lt)
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.b")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_hops: int = 4,
) -> DataFrame:
    """Bounded-round breadth-first search: minimum hop distance from a
    seed set over a directed edge list (pass both directions for an
    undirected graph). The classic iterative frontier expansion —
    round h joins the hop-(h-1) frontier against the edge list, anti-
    joins everything already visited, and labels survivors hop h.

    Scale posture: each round is ONE equi-join keyed on the source
    endpoint plus one anti-join on the visited set — the same keyed-
    shuffle-per-round discipline as :func:`pagerank`; frontier and
    visited tables localCheckpoint every round so lineage stays flat
    and no round re-runs the caller's edge ETL. The hop bound is the
    contract (fixed unroll, SQL-replayable); an empty frontier exits
    early since every later hop is empty by induction.

    Returns (node, hop) with hop = min edges from any seed, 0 for the
    seeds themselves, hop <= max_hops; unreached nodes are absent.
    """
    # The edge list is the LOOP INVARIANT: persist it once or every
    # round re-runs the caller's edge ETL (the q69 pagerank lesson —
    # measured 2.4x there). Safe to release at exit because every
    # per-hop layer is eagerly localCheckpoint-ed and no longer
    # references it.
    edges_p = _copartitioned_invariant(
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst")),
        "_src",
    )
    # Visited state is the LIST of per-hop checkpointed layers, not a
    # re-checkpointed running union: materializing the union every
    # round re-serializes the whole visited set per hop (O(V * hops)
    # checkpoint bytes); a lazy union of already-checkpointed layers
    # scans the same rows at join time with flat lineage (each leaf is
    # a checkpoint) and runs ONE materialization job per hop, not two.
    layers = [
        seeds.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint()
    ]
    frontier = layers[0].select("node")
    for h in range(1, int(max_hops) + 1):
        visited_nodes = reduce(
            DataFrame.unionByName, [d.select("node") for d in layers]
        )
        nxt = (
            frontier.join(edges_p, frontier.node == edges_p._src)
            .select(F.col("_dst").alias("node"))
            .distinct()
            .join(visited_nodes, on="node", how="left_anti")
            .withColumn("hop", F.lit(h))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        layers.append(nxt)
        frontier = nxt.select("node")
    edges_p.unpersist()
    return reduce(DataFrame.unionByName, layers)


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded-round k-core peeling over a directed edge list (pass
    both directions for an undirected graph): each round computes
    degrees over the surviving subgraph and removes every node with
    degree < ``k`` — including nodes whose LAST edge disappeared with
    an earlier peel (they vanish from the degree table, which is the
    same as degree 0). Graph family #5 beside pagerank, connected
    components, triangles, and BFS; the standard dense-subgraph /
    influence-zone primitive (Seidman 1983, "Network structure and
    minimum degree").

    The round bound is the CONTRACT (fixed unroll, SQL-replayable in
    stacked CTEs, exactly like :func:`bfs_hops`' hop bound) — after
    ``rounds`` rounds the peeling may not have reached the true
    k-core fixpoint on adversarial chains; the caller picks a bound
    that saturates its graph shape. Each round is one degree groupBy
    keyed on the edge source plus two semi-joins restricting the edge
    list; edge list persists as the loop invariant and each round's
    survivor set localCheckpoints (the pagerank loop discipline).

    Returns (node, peel_round) with peel_round = the 1-based round
    the node was removed, or NULL for nodes still in the subgraph
    after the final round.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    # Every edge generation is cached hash-partitioned on _src: the
    # per-round degree aggregate AND the _src semi-join then reuse the
    # cached layout instead of re-exchanging the (edge-sized) table —
    # only the _dst semi-join and the (node-sized) survivor shuffles
    # remain per round. Generations chain through the cache (shallow
    # lineage: each leaf is the previous generation's scan); all are
    # released at exit, safe because every emitted layer is an eager
    # localCheckpoint.
    cur_edges = _copartitioned_invariant(
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst")),
        "_src",
    )
    generations = [cur_edges]
    cur_nodes = cur_edges.select(F.col("_src").alias("node")).distinct()
    peeled = None
    for r in range(1, int(rounds) + 1):
        surv = (
            cur_edges.groupBy("_src")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .where(F.col("_deg") >= k)
            .select(F.col("_src").alias("node"))
            .localCheckpoint()
        )
        gone = (
            cur_nodes.join(surv, on="node", how="left_anti")
            .withColumn("peel_round", F.lit(r))
            .localCheckpoint()
        )
        if not gone.isEmpty():
            cur_edges = _copartitioned_invariant(
                cur_edges.join(
                    surv, F.col("_src") == F.col("node"), "left_semi"
                ).join(surv, F.col("_dst") == F.col("node"), "left_semi"),
                "_src",
            )
            generations.append(cur_edges)
            # Keep at most two generations cached: generation r's
            # lineage reads generation r-1's cached scan, but r-2 is
            # unreachable once r-1 was materialized by this round's
            # surv aggregate — holding every generation would grow
            # cache memory as rounds × surviving-edge-table size.
            if len(generations) > 2:
                generations[-3].unpersist()
        peeled = gone if peeled is None else peeled.unionByName(gone)
        cur_nodes = surv
    for g in generations[-2:]:
        g.unpersist()
    return peeled.unionByName(
        cur_nodes.withColumn("peel_round", F.lit(None).cast("int"))
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002, "Assortative
    mixing in networks"): the Pearson correlation of endpoint degrees
    over all edges of the undirected view of ``edges`` (each input
    edge contributes both directions). Returns one row
    (n_edges, assortativity) where n_edges counts the directed view.

    Determinism/overflow contract (shared with q93's oracle): the five
    sums run in exact decimal-domain arithmetic — bigint sums of
    degree² per edge overflow 2^63 well before 100-TB edge counts —
    and floats appear only in the final sqrt/divide. Scale shape: one
    degree groupBy, two keyed joins to label edge endpoints, one
    global aggregate; no windows, no collects."""
    und = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst")
    ).unionByName(
        edges.select(F.col(dst).alias("_src"), F.col(src).alias("_dst"))
    )
    deg = und.groupBy("_src").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("_src").alias("node"), "deg"
    )
    lab = (
        und.join(deg.withColumnRenamed("deg", "dx"), und._src == deg.node)
        .drop("node")
        .join(
            deg.withColumnRenamed("deg", "dy").withColumnRenamed(
                "node", "node2"
            ),
            F.col("_dst") == F.col("node2"),
        )
    )
    dxd = F.col("dx").cast("decimal(18,0)")
    dyd = F.col("dy").cast("decimal(18,0)")
    agg = lab.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(dxd).alias("sx"),
        F.sum(dyd).alias("sy"),
        F.sum(dxd * dyd).alias("sxy"),
        F.sum(dxd * dxd).alias("sxx"),
        F.sum(dyd * dyd).alias("syy"),
    )
    md = F.col("m").cast("decimal(18,0)")
    return agg.select(
        F.col("m").alias("n_edges"),
        F.round(
            (md * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (
                F.sqrt(
                    (md * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                        "double"
                    )
                )
                * F.sqrt(
                    (md * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                        "double"
                    )
                )
            ),
            6,
        ).alias("assortativity"),
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) with a SELF-VOTE, over an undirected edge list:
    every node starts labeled with its own id; each round it adopts
    the most frequent label among its neighbors plus itself, ties
    broken by MINIMUM label. The self-vote damps the two-coloring
    oscillation plain synchronous LPA exhibits on bipartite graphs;
    the fixed round count and total tie order make the fixpoint
    deterministic and SQL-unrollable (the pagerank/em22 discipline —
    no convergence test, so the oracle replays the exact rounds).

    Output: (node, label) — nodes sharing a label share a community.

    Scale shape per round: one neighbor join keyed on the node, one
    (node, label) count, one per-node argmax window — all partitioned
    by node id; label state is localCheckpoint-ed each round so round
    k plans against a flat scan, not k joins of lineage. Beyond-
    reference north-star op (graph family #6).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    from pyspark.sql import Window

    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    und = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    w = Window.partitionBy("node").orderBy(F.desc("_cnt"), F.asc("label"))
    for _ in range(int(rounds)):
        cand = (
            und.join(labels, und.b == labels.node)
            .select(F.col("a").alias("node"), "label")
            .unionByName(labels.select("node", "label"))
        )
        labels = (
            cand.groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    und.unpersist()
    return labels


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int = 64,
) -> DataFrame:
    """Adamic–Adar link-prediction scores over a bipartite edge list:
    for every pair of DST-side nodes, AA = Σ 1/ln(deg(c)) over their
    common SRC-side neighbors c — the classic "who should trade next"
    signal, where rare shared neighbors count more than hubs.

    Contributors with degree > ``max_degree`` are EXCLUDED (stated
    contract, not a silent cap): a hub's wedge fanout is C(deg, 2) —
    quadratic — while its information content 1/ln(deg) vanishes, so
    the cap is what makes the wedge join linear in |edges|·max_degree
    at any scale (the same hub discipline as the LSH band-bucket df
    cap). Degree-1 contributors generate no pairs by construction.

    Output: (node_a, node_b, n_common, aa_score) with node_a < node_b.
    """
    if max_degree < 2:
        raise ValueError(f"max_degree must be >= 2, got {max_degree}")
    e = edges.select(
        F.col(src).alias("_c"), F.col(dst).alias("_s")
    ).distinct()
    deg = e.groupBy("_c").agg(F.count(F.lit(1)).alias("_d"))
    contrib = (
        e.join(deg, "_c")
        .where((F.col("_d") >= 2) & (F.col("_d") <= max_degree))
        .localCheckpoint()
    )
    e1 = contrib.select("_c", F.col("_s").alias("node_a"), "_d")
    e2 = contrib.select(F.col("_c").alias("_c2"), F.col("_s").alias("node_b"))
    wedges = e1.join(
        e2,
        (F.col("_c") == F.col("_c2")) & (F.col("node_a") < F.col("node_b")),
    )
    # each 1/ln(deg) term is cast to decimal(30,12) before summing so
    # the per-pair total is order-independent (the em31 discipline) —
    # a raw double sum varies with partial-aggregation order and can
    # flip a 6dp-rounded top-k boundary between runs/engines
    term = (F.lit(1.0) / F.log(F.col("_d").cast("double"))).cast(
        "decimal(30,12)"
    )
    return wedges.groupBy("node_a", "node_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum(term).cast("double").alias("aa_score"),
    )
