"""Iterative graph analytics as chained declarative plans.

The reference runs iterative algorithms as operation CHAINS — each
iteration one MapReduce pass over the cluster, the controller re-submits
until convergence (controller_agent/controllers, vanilla+map_reduce
composition). The Spark-first expression is the same shape without the
controller: each iteration is a join + aggregate on the edge list, and
Catalyst/AQE plan every pass; nothing iterates driver-side except the
loop counter (the model decision, not data).

``pagerank`` — fixed-iteration damped PageRank over a weighted edge
list. Per iteration: contributions = ranks ⋈ edges (equi-join on src,
both sides partitioned by src), then a sum-by-dst aggregate. Two
shuffles per iteration at any scale, dominated by the edge list — the
canonical distributed PageRank plan. Dangling mass (nodes without
out-edges) redistributes uniformly, so total rank stays 1."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Damped PageRank with ``iterations`` synchronous passes over
    ``edges`` (columns src, dst; parallel edges act as weight). Returns
    (node, rank). Deterministic: fixed iteration count, uniform init.

    The static inputs — edge list, node set, out-degrees — are persisted
    before the loop: without that, every iteration's lazy plan re-derives
    them from source (the round-6 audit measured 6 fact scans for 3
    iterations). Caching the invariant edge list is the canonical
    distributed-PageRank move (it is exactly what GraphX/Pregel do); at
    100 TB the memory-and-disk columnar cache of (src, dst) is the price
    of ONE materialization versus one corpus read per iteration per
    consumer."""
    edges = edges.persist()
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n"))
    # out-degree (parallel edges counted) per source
    outdeg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    ).persist()
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(iterations):
        with_deg = ranks.join(outdeg, "node", "left")
        # mass sent along edges by nodes that have out-edges
        contrib = (
            with_deg.filter(F.col("deg").isNotNull())
            .join(edges, F.col("node") == F.col(src_col))
            .groupBy(F.col(dst_col).alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("recv"))
        )
        # dangling mass redistributes uniformly
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n")
                    + damping
                    * (F.coalesce(F.col("recv"), F.lit(0.0)) + F.col("dm") / F.col("n"))
                ).alias("rank"),
            )
        )
    return ranks
