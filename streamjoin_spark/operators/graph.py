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

# rounds taken by the most recent k_core call — scaling telemetry (the
# dedup.LAST_CC_ROUNDS pattern); peeling rounds are structure-bound, so
# this is how SCALING.md verifies a bigger corpus didn't add rounds
LAST_KCORE_ROUNDS: dict[str, int] = {}

__all__ = ["pagerank", "cooccurrence_edges", "triangles", "k_core"]

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


def cooccurrence_edges(
    df: DataFrame,
    context_col: str,
    item_col: str,
    min_support: int = 1,
) -> DataFrame:
    """Undirected co-occurrence edge list: an edge (p1 < p2) for every item
    pair appearing in the same context (order, document, session, …) in at
    least ``min_support`` distinct contexts. Output: ``p1, p2, support``.

    Scale posture: the per-context self-join is bounded by the square of the
    per-context item count (TPC-H orders: <= 7 lineitems -> <= 21 pairs), so
    the blowup factor is a small constant, not corpus-quadratic; the
    pair-count groupBy is map-side combinable and the support filter prunes
    the long random-co-occurrence tail before anything downstream joins on
    the edges.
    """
    # one hash(__ctx) exchange serves the whole pipeline (guide §2.4; r12):
    # hash(ctx) satisfies the (ctx, item) clustering the dedup needs, and
    # both legs of the per-context self-join are the same subtree on the
    # same key — the dedup costs no second exchange and the join reads the
    # one layout (ReusedExchange), where distinct-then-join paid three.
    pairs = (
        df.select(F.col(context_col).alias("__ctx"), F.col(item_col).alias("p1"))
        .repartition(F.col("__ctx"))
        .dropDuplicates(["__ctx", "p1"])
    )
    other = pairs.select(F.col("__ctx"), F.col("p1").alias("p2"))
    return (
        pairs.join(other, "__ctx")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )


def triangles(edges: DataFrame, p1: str = "p1", p2: str = "p2") -> DataFrame:
    """Enumerate triangles in an undirected edge list whose endpoints are
    stored ordered (``p1 < p2``). Output one row (a, b, c) with a < b < c
    per triangle — each triangle exactly once, by the standard oriented
    wedge-closure join: wedge (a<b, b<c) closed by edge (a, c).

    Scale posture: two shuffled equi-joins on single node keys. Ordering
    edges low->high is the classic degeneracy trick that caps wedge counts
    (a high-degree hub only extends wedges toward higher ids); for skewed
    graphs, orient by (degree, id) before calling and the bound tightens to
    O(E^1.5) candidate wedges — the edge list here should already be
    support-thresholded (``cooccurrence_edges``), which removes the hubs
    that make triangle counting quadratic on raw co-occurrence graphs.
    """
    # the edge list feeds all three wedge legs: persist it so the (often
    # join/agg-shaped) upstream pipeline is computed once, not re-derived
    # per leg — only the exchange was reused before, the final aggregate
    # and everything above it ran 3× (guide §5 caching; r12, 2.01 → 1.55 s
    # at sf0.1). persist (not eager checkpoint): lazy, populated during
    # the one consumer action, lineage kept. Persist a PROJECTED copy, not
    # the caller's frame: the wedge legs read only (p1, p2), extra caller
    # columns would bloat the cache, and persisting the caller's object
    # would side-effect it (ADVICE r12). The cache lives until the session
    # evicts it (LRU) — callers needing deterministic release should
    # unpersist the returned frame's child themselves.
    edges = edges.select(p1, p2).persist()
    e1 = edges.select(F.col(p1).alias("a"), F.col(p2).alias("b"))
    e2 = edges.select(F.col(p1).alias("b"), F.col(p2).alias("c"))
    e3 = edges.select(F.col(p1).alias("a"), F.col(p2).alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


def k_core(
    edges: DataFrame,
    k: int,
    p1: str = "p1",
    p2: str = "p2",
    max_rounds: int = 50,
) -> DataFrame:
    """``k``-core decomposition by iterative peeling: repeatedly drop nodes
    of degree < k (and their incident edges) until the graph is stable; the
    survivors are the k-core. Output: ``node, core_degree`` (the node's
    degree WITHIN the core).

    Peeling is monotone — once a node is out it can never re-enter, and an
    extra round at the fixpoint is a no-op — so any engine that runs *at
    least* the convergence round count computes the identical core (the
    DuckDB oracle unrolls a fixed superset of rounds for exactly this
    reason).

    Scale posture (100 TB): each round is one degree groupBy (map-side
    combinable) plus two semi-filters of the edge list on the survivor
    set — |E|-bounded shuffles, no pairwise blowups; round count is small
    in practice (web-ish graphs peel in a handful of rounds, pathological
    paths in O(diameter) — ``max_rounds`` is the guard). The edge frame is
    ``localCheckpoint``-ed per round (CLAUDE.md iterative-operator
    invariant: truncate lineage, or analysis time compounds).
    """
    und = edges.select(F.col(p1).alias("a"), F.col(p2).alias("b"))
    und = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # NO initial eager checkpoint of the (largest) undirected frame: the
    # per-round checkpoints below already truncate lineage from round 2 on,
    # and graphs that are ALREADY a k-core converge in round 1 — measured
    # at the 100× scale sweep: the co-purchase graph peels zero nodes, and
    # materializing its ~2×|pairs| union to local disk was the entire cost
    # (185 s → the one degree groupBy). Round 1 streams the union instead.
    for rounds in range(1, max_rounds + 1):
        LAST_KCORE_ROUNDS["rounds"] = rounds  # scaling telemetry (cc pattern)
        # the node-sized degree frame is checkpointed so the convergence
        # probe, the two semi-filters and the final return all read ONE
        # materialization instead of re-running the |E| groupBy 2-4×
        deg = (
            und.groupBy("a")
            .agg(F.count(F.lit(1)).alias("core_degree"))
            .localCheckpoint(eager=True)
        )
        doomed = deg.where(F.col("core_degree") < k).select("a")
        if doomed.isEmpty():
            return deg.select(F.col("a").alias("node"), "core_degree")
        keep = deg.where(F.col("core_degree") >= k).select("a")
        # semi-filters commute; ordering the "a"-keyed one LAST leaves the
        # checkpointed frame hash(a)-partitioned, which is exactly what the
        # next round's degree groupBy("a") and first semi-join need — one
        # |E| exchange per round saved from round 2 on (guide §2.4; r12)
        und = (
            und.join(keep.select(F.col("a").alias("b")), "b", "left_semi")
            .join(keep, "a", "left_semi")
            .localCheckpoint(eager=True)
        )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("core_degree"))
    return deg.where(F.col("core_degree") >= k).select(
        F.col("a").alias("node"), "core_degree"
    )


def label_propagation(
    edges: DataFrame,
    p1: str = "p1",
    p2: str = "p2",
    rounds: int = 4,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007), the near-linear-time communities pass: every node starts as
    its own label; each round it adopts the label most frequent among its
    neighbors (ties → smallest label — the determinism the classic
    random-tie-break variant lacks, and the property that makes an exact
    cross-engine oracle possible). A FIXED ``rounds`` count rather than a
    convergence probe: LPA oscillates on bipartite-ish structures, so
    fixed-round semantics are both the standard remedy and reproducible.

    Distinct from connected components: labels follow local majority, so
    dense cliques keep their own community even when a thin bridge joins
    them into one component.

    Scale posture (100 TB): per round one |E|-bounded join + a
    (node, label) map-side-combined count + a per-node top-1 as a MIN
    aggregation over ``struct(-count, label)`` — the lexicographic struct
    order IS the (count desc, label asc) ranking, so the majority pick is
    one partial-aggregable groupBy instead of a ranking window (the window
    needed an extra node-keyed exchange plus a per-group sort; the
    aggregate's map-side combine also shrinks the shuffle to one row per
    (node, candidate-label) partial — r12 optimization, identical output
    by the struct-order law). Unlike the convergence-probed loops (CC,
    k-core) there is NO per-round action here: a fixed small round count
    has nothing to probe, each round's labels feed the next exactly once,
    and the |E| frame is the only reused input (checkpointed once) — so
    the rounds compose into ONE lazy DAG and the per-round eager
    localCheckpoint jobs are deleted (r12, 2.76 → 2.00 s at sf0.1; same
    design as ``pagerank``). Long runs still truncate lineage every 4th
    round (iterative-operator invariant). Output: ``node, community``.
    """
    und = edges.select(F.col(p1).alias("a"), F.col(p2).alias("b"))
    und = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # checkpoint the edge frame ALREADY hash-partitioned on the per-round
    # join key: every round's und.b == labels.node join then reads the
    # stored layout instead of re-shuffling |E| per round (guide §2.4;
    # r12 — LogicalRDD keeps the partitioning through localCheckpoint).
    # No explicit partition count: AQE sizes the exchange from the data.
    und = und.repartition(F.col("b")).localCheckpoint(eager=True)
    labels = None
    for r in range(rounds):
        if r == 0:
            # round-1 shortcut (r13): the initial labeling is the identity
            # (label(b) == b), so joining the edge frame against it is
            # algebraically a rename — the first round's neighbor-label
            # counts are just groupBy(a, b). Deletes the round-1 |E|⋈|V|
            # join AND the identity-labels distinct; exact for ANY edge
            # multiset (duplicate edges keep their multiplicities).
            counts = und.groupBy(
                F.col("a"), F.col("b").alias("label")
            ).agg(F.count(F.lit(1)).alias("__c"))
        else:
            counts = (
                und.join(labels, und["b"] == labels["node"])
                .groupBy(F.col("a"), F.col("label"))
                .agg(F.count(F.lit(1)).alias("__c"))
            )
        # min(struct(-count, label)) ≡ first row of ORDER BY count DESC,
        # label ASC: struct comparison is field-lexicographic and the count
        # is always numeric (negation is total), while the label stays in
        # its own type's order — exact for longs AND strings alike
        labels = (
            counts.groupBy(F.col("a").alias("node"))
            .agg(
                F.min(
                    F.struct(
                        (-F.col("__c")).alias("__nc"), F.col("label")
                    )
                ).alias("__m")
            )
            .select("node", F.col("__m.label").alias("label"))
        )
        # fixed small round counts stay one lazy DAG; only long runs pay
        # periodic lineage truncation (plan growth is linear in rounds)
        if (r + 1) % 4 == 0 and r + 1 < rounds:
            labels = labels.localCheckpoint(eager=True)
    return labels.select("node", F.col("label").alias("community"))
