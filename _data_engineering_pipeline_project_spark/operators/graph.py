"""Graph operators over edge-list DataFrames.

Connected components (min-label propagation with pointer jumping) lives
in dedup.py next to its near-dup use case; this module holds the
rank-propagation family. Everything is expressed as joins + groupBy so
Catalyst/AQE pick the physical strategy: at web scale the edge table is
the 100 TB fact and the rank vector is the small-but-not-broadcastable
side — both iterate as shuffle hash joins co-partitioned on the node
key, which is exactly the Pregel communication pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    damping: float = 0.85,
    iterations: int = 3,
) -> DataFrame:
    """Weighted PageRank, a FIXED number of synchronous iterations.

    ``edges``: (src, dst, w). ``nodes``: (node,) — the vertex universe
    (isolated vertices keep the teleport mass). Returns (node, pagerank),
    unrounded; callers round for cross-engine compare.

    Fixed iteration count (not convergence-tested) keeps the plan static
    and lets an oracle unroll the same iterations as SQL CTEs — the
    convention the Lloyd-refined IVF query established for iterative
    algorithms. Dangling nodes follow the common simplification of
    leaking their mass (ranks then sum to < 1); document, don't
    redistribute — redistribution adds a full extra aggregate per
    iteration for cosmetic effect.

    Scale shape per iteration: ONE shuffle join (edges ⋈ ranks on src —
    both sides hash-partitioned on the node key, and AQE reuses the
    exchange for the per-src out-weight computed once up front) and ONE
    groupBy(dst) whose map-side combine collapses each partition's
    contributions before the exchange. The node census is a 1-row
    broadcast, never a driver collect."""
    outw = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    e = edges.join(outw, "src").select(
        "src", "dst", (F.col("w") * F.lit(1.0) / F.col("wout")).alias("p")
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    teleport = F.lit(1.0 - damping) / F.col("n")
    for _ in range(iterations):
        inflow = (
            e.join(ranks, e["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("p")).alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (
                    teleport
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("pagerank"))


def hits(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 2,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg), a fixed number of
    synchronous iterations with MAX-normalization.

    ``edges``: (src, dst, w); ``nodes``: (node,). Each iteration:
    hub(u) = Σ_out w·auth(v), auth(v) = Σ_in w·hub(u), each vector then
    divided by its max. Max-normalization replaces the usual L2 norm
    because max of identical doubles is exact while a sum of squares is
    accumulation-order-dependent — the same determinism trade the
    PageRank oracle convention makes (per-node sums still differ in the
    last ulp between engines; callers round before compare).

    Scale shape per half-iteration: one co-partitioned join of the edge
    table with the |nodes|-sized score vector and one combined groupBy —
    the Pregel pattern again; the max is a 1-row broadcast."""
    auth = nodes.select("node", F.lit(1.0).alias("a"))
    hub = nodes.select("node", F.lit(1.0).alias("h"))
    for _ in range(iterations):
        hub_raw = (
            edges.join(auth, edges["dst"] == auth["node"])
            .groupBy("src")
            .agg(F.sum(F.col("w") * F.col("a")).alias("hs"))
        )
        hub = (
            nodes.join(hub_raw, nodes["node"] == hub_raw["src"], "left")
            .select("node", F.coalesce(F.col("hs"), F.lit(0.0)).alias("hs"))
        )
        hmax = hub.agg(F.max("hs").alias("m"))
        hub = hub.crossJoin(F.broadcast(hmax)).select(
            "node",
            F.when(F.col("m") > 0, F.col("hs") / F.col("m"))
            .otherwise(F.lit(0.0))
            .alias("h"),
        )
        auth_raw = (
            edges.join(hub, edges["src"] == hub["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("h")).alias("as_"))
        )
        auth = (
            nodes.join(auth_raw, nodes["node"] == auth_raw["dst"], "left")
            .select("node", F.coalesce(F.col("as_"), F.lit(0.0)).alias("as_"))
        )
        amax = auth.agg(F.max("as_").alias("m"))
        auth = auth.crossJoin(F.broadcast(amax)).select(
            "node",
            F.when(F.col("m") > 0, F.col("as_") / F.col("m"))
            .otherwise(F.lit(0.0))
            .alias("a"),
        )
    return hub.join(auth, "node").select(
        "node", F.col("h").alias("hub"), F.col("a").alias("authority")
    )
