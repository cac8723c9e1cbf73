"""Link-graph analytics: PageRank over an edge DataFrame.

The reference has no graph operators (SURVEY.md §2.6); this joins
connected_components (operators/neardup.py, the dedup-cluster step) as
the second iterative graph primitive -- authority scoring for document
graphs (hyperlinks, citations, user-item interactions), the classic
quality prior for crawl-corpus curation (e.g. the OPIC/harmonic-rank
features in CommonCrawl-derived training sets).

Power iteration, all DataFrame ops: each round is one equi-join of the
rank vector against the edge list (shuffle on src) plus one hash agg on
dst -- O(|E|) per round, no adjacency matrix, no driver-side graph.
Dangling mass (rank parked on nodes with no out-edges) is redistributed
uniformly each round via a one-row broadcast scalar, the standard
Page-Brin correction that keeps the rank vector a probability
distribution (sums to 1 every round -- tested).

Lineage management follows connected_components' hybrid (see its
docstring for the full rationale): persist each round, unpersist the
superseded frame deterministically, localCheckpoint every few rounds to
bound plan depth. The single driver-side materialization is the node
count (one long -- bounded, like the documented scalar collects
elsewhere in the engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHECKPOINT_EVERY = 3


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 15,
) -> DataFrame:
    """PageRank over the directed graph ``edges``: (node, rank) for
    every node appearing as a source or destination, ranks summing to 1.
    Duplicate edges collapse (unweighted graph); NULL endpoints drop;
    self-loops count like any edge. Fixed ``iters`` rounds of power
    iteration -- no per-round convergence collect, so the driver loop
    stays lazy between checkpoints; 10-20 rounds is the standard
    operating range (residual decays as damping^iters)."""
    if not 0 < damping < 1:
        raise ValueError("damping must be in (0, 1)")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .filter(F.col("_s").isNotNull() & F.col("_d").isNotNull())
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
        .persist()
    )
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg")).persist()
    n = nodes.count()  # bounded driver scalar (one long)
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    d = float(damping)
    base = (1.0 - d) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    persisted_prev: DataFrame | None = None
    try:
        for i in range(iters):
            contribs = (
                e.join(
                    ranks.select(
                        F.col("node").alias("_s"), "rank"
                    ),
                    "_s",
                )
                .join(deg, "_s")
                .groupBy("_d")
                .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_c"))
            )
            dangling = (
                ranks.join(deg, ranks.node == deg._s, "left_anti")
                .agg(
                    F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
                )
            )
            nxt = (
                nodes.join(
                    contribs.select(F.col("_d").alias("node"), "_c"),
                    "node",
                    "left",
                )
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.lit(d)
                        * (
                            F.coalesce(F.col("_c"), F.lit(0.0))
                            + F.col("_dang") / F.lit(float(n))
                        )
                    ).alias("rank"),
                )
            )
            if (i + 1) % _CHECKPOINT_EVERY == 0 or i == iters - 1:
                nxt = nxt.localCheckpoint()
                if persisted_prev is not None:
                    persisted_prev.unpersist()
                    persisted_prev = None
            else:
                nxt = nxt.persist()
                if persisted_prev is not None:
                    persisted_prev.unpersist()
                persisted_prev = nxt
            ranks = nxt
        return ranks
    finally:
        e.unpersist()
        nodes.unpersist()
        deg.unpersist()
