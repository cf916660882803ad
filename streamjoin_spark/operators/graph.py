"""Graph operators over edge-list DataFrames.

Beyond the reference surface: iterative graph analytics for training-data
pipelines (link-graph quality signals, citation/co-occurrence ranking).
Complements ``operators/dedup.py::connected_components`` (min-label
propagation for duplicate clusters).

Scale posture: every iteration is two key-partitioned shuffles bounded by
|E| (contribution join on src, re-aggregation on dst) — no driver-side
state beyond the loop counter, no collect. Edges and degrees are computed
once and persisted across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]

# ranks are carried between iterations in integer "micro-rank" units
# (FLOOR(x·10¹²)) so the per-destination summation is exact long arithmetic
# — bit-reproducible across engines and partition orders, unlike a double
# SUM whose last-ulp value depends on reduction order.
_UNIT = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    symmetrize: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list: ``rank'(v) =
    (1-d)/N + d·Σ_{u→v} rank(u)/outdeg(u)``. Dangling mass is dropped (the
    standard simplified variant); ``symmetrize=True`` first adds every
    reverse edge (undirected ranking).

    A *fixed* iteration count (not convergence-probed) keeps the operator a
    pure deterministic function of its input, so a SQL oracle can unroll
    the same ``iters`` rounds and hash-match. Contributions are floored to
    micro-rank units and summed as exact integers — see ``_UNIT``.

    Output: ``(node, rank)`` with rank floor-canonicalized to 8 dp.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if symmetrize:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.dropDuplicates(["src", "dst"]).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .dropDuplicates(["node"])
        .persist()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("__deg"))
    # degree is attached to the edge list ONCE — iterations then pay a single
    # join against the current ranks instead of re-deriving degrees each round
    ed = e.join(deg, "src").persist()
    n1 = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    base = F.lit(1.0 - damping) / F.col("__n")

    ranks = nodes.join(F.broadcast(n1)).select(
        "node", "__n", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(iters):
        contribs = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("rank") / F.col("__deg") * _UNIT).alias("__u"),
            )
        )
        sums = contribs.groupBy("node").agg(F.sum("__u").alias("__s"))
        ranks = (
            nodes.join(F.broadcast(n1))
            .join(sums, "node", "left")
            .select(
                "node",
                "__n",
                (
                    base
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__s"), F.lit(0)).cast("double")
                        / F.lit(float(_UNIT))
                    )
                ).alias("rank"),
            )
        )
    out = ranks.select(
        "node", (F.floor(F.col("rank") * 100000000) / F.lit(100000000.0)).alias("rank")
    )
    return out
