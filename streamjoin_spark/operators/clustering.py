"""Distributed k-means clustering over embedding columns (Lloyd rounds).

Beyond the reference surface (SURVEY.md §2 lists no vector ops): semantic
clustering is the backbone of SemDeDup-style training-data curation
(Abbas et al. 2023) — cluster the corpus by embedding, then dedup / balance
/ sample within clusters. The reference engine has no analog; this is the
missing piece between the ANN operators (similarity.py) and the sampling
operators (skew.py).

Determinism contract (oracle-checkable, no RNG):
- Seeds are the embeddings of the ``k`` smallest ids — reproducible
  everywhere, no sampling.
- Assignment ranks by the *rounded* (6 dp) squared L2 distance with the
  centroid id as tiebreak; the distance itself is a strict left fold
  (``F.aggregate``) so the summation order is pinned.
- Centroid recompute canonicalizes each component: per-row components are
  rounded to 6 dp, summed as DECIMAL (exact), divided by the member count
  and FLOOR-truncated at 6 dp — the per-CLAUDE.md float invariant for
  division-derived values, bit-identical across Spark and DuckDB.

Scale posture (100 TB): centroids are always a k-row table — broadcast
into the assignment cross-join, so assignment is a map-only stage over the
corpus (no corpus shuffle). Recompute is one shuffle of (cluster, dim)
partial sums — map-side combine applies, the reduce side is k·dim rows.
Each Lloyd round localCheckpoints the k-row centroid frame (CLAUDE.md
iterative-operator invariant: plan growth, not data volume, is the risk).
The corpus itself is never re-shuffled across rounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "seed_centroids", "assign_clusters", "recompute_centroids", "kmeans",
    "semdedup",
]


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def sq_dist(a: Column, b: Column) -> Column:
    """Σ (aᵢ-bᵢ)² as a strict left fold — deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def seed_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic seeds: the embeddings of the ``k`` smallest ids,
    numbered 0..k-1 in id order. Output: ``cluster_id``, ``__cv``.

    k-bounded: the id sort is a distributed top-k (TakeOrderedAndProject),
    never a global sort of the corpus; the numbering window then runs over
    the k surviving rows only.
    """
    seeds = (
        df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__cv"))
        .orderBy(F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.asc(id_col))
    return seeds.select(
        (F.row_number().over(w) - 1).cast("int").alias("cluster_id"), "__cv"
    )


def assign_clusters(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k-row centroid table,
    score every (row, centroid) pair map-side, keep the argmin (rounded
    distance, centroid id tiebreak). Output: all input columns +
    ``cluster_id`` + ``dist`` (rounded 6 dp squared L2).
    """
    # cast the row's vector ONCE, not per (row, centroid) pair: the k-way
    # crossJoin re-evaluated the interpreted array cast k times per row
    # (r12 hoist; identical doubles, identical dist bits — the join
    # boundary keeps __vd an attribute, so no projection re-inlining).
    # Both scratch arrays are dropped BEFORE the argmin window, so its
    # exchange moves (row, cluster_id, dist) instead of also carrying the
    # centroid vector per candidate row as the old post-window drop did.
    scored = (
        df.withColumn("__vd", _as_double(F.col(vec_col)))
        .crossJoin(F.broadcast(centroids))
        .withColumn("dist", F.round(sq_dist(F.col("__vd"), F.col("__cv")), 6))
        .drop("__cv", "__vd")
    )
    w = Window.partitionBy(id_col).orderBy(F.asc("dist"), F.asc("cluster_id"))
    return (
        scored.withColumn("__arn", F.row_number().over(w))
        .where(F.col("__arn") == 1)
        .drop("__arn")
    )


def recompute_centroids(
    assigned: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-cluster component-wise canonical mean. One shuffle of
    (cluster_id, dim) partial DECIMAL sums; reduce output is k·dim rows.

    ``pos`` is 1-based to line up with DuckDB's generate_series twin.
    """
    comps = assigned.select(
        "cluster_id", F.posexplode(_as_double(F.col(vec_col)))
    ).select(
        "cluster_id", (F.col("pos") + 1).alias("pos"), F.col("col").alias("__x")
    )
    per_dim = comps.groupBy("cluster_id", "pos").agg(
        (
            F.floor(
                F.sum(F.round(F.col("__x"), 6).cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1))
                * F.lit(1e6)
            )
            / F.lit(1e6)
        ).alias("__m")
    )
    return per_dim.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "__m"))), lambda s: s["__m"]
        ).alias("__cv")
    )


def kmeans(
    df: DataFrame,
    k: int,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``iters`` Lloyd rounds from deterministic seeds, then a final
    assignment against the last centroids. Returns the assigned frame
    (input columns + ``cluster_id`` + ``dist``).

    Each round: map-only assignment (broadcast centroids) + one
    (cluster, dim)-key shuffle to recompute. The k-row centroid frame is
    eagerly localCheckpointed per round so the logical plan stays flat
    across rounds (the corpus plan is referenced, never grown).
    """
    cents = seed_centroids(df, k, id_col, vec_col).localCheckpoint(eager=True)
    for _ in range(iters):
        assigned = assign_clusters(df, cents, id_col, vec_col)
        cents = recompute_centroids(assigned, vec_col).localCheckpoint(eager=True)
    return assign_clusters(df, cents, id_col, vec_col)


def semdedup(
    df: DataFrame,
    k: int = 8,
    tau: float = 0.9,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023, arXiv:2303.09540):
    k-means clusters bound the candidate space, then WITHIN each cluster a
    vector is pruned when some lower-id cluster-mate has cosine similarity
    ≥ ``tau`` — the deterministic min-id-keeper rule (same convention as
    ``exact_dedup``; the paper's keep-farthest-from-centroid variant is a
    one-line ordering swap). Output: ``(id_col, cluster_id, kept)``.

    Determinism: cosine = FLOOR(dot/(‖a‖·‖b‖)·10⁶)/10⁶ — division-derived,
    so floor-canonicalized per the float invariant; dot and norms are
    strict left folds (``F.aggregate``), sqrt is IEEE correctly-rounded in
    both engines.

    Scale posture (100 TB): the pairwise compare NEVER crosses clusters —
    that is SemDeDup's whole design; grow ``k`` with the corpus to keep
    per-cluster membership (and thus the per-cluster quadratic) bounded.
    Norms are computed once per vector, map-only. The pair join is an
    equi-join on ``cluster_id``; skewed cluster sizes skew its shuffle —
    AQE skew-join handles moderate imbalance, and a degenerate mega-cluster
    is a data-quality signal (near-constant embeddings), not a plan
    problem. The prune join is a semi-join on lower-id survivors.
    """
    assigned = kmeans(df, k, iters, id_col, vec_col).select(
        F.col(id_col), "cluster_id"
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("__e"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    v = (
        df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__e"))
        .withColumn("__n", norm)
        .join(assigned, id_col)
    )
    a = v.select(
        F.col(id_col).alias("__ida"), F.col("__e").alias("__ea"),
        F.col("__n").alias("__na"), "cluster_id",
    )
    b = v.select(
        F.col(id_col).alias("__idb"), F.col("__e").alias("__eb"),
        F.col("__n").alias("__nb"), "cluster_id",
    )
    dot = F.aggregate(
        F.zip_with(F.col("__ea"), F.col("__eb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.floor(dot / (F.col("__na") * F.col("__nb")) * F.lit(1e6)) / F.lit(1e6)
    pruned = (
        a.join(b, ["cluster_id"])
        .where(F.col("__ida") < F.col("__idb"))
        .where(cos >= F.lit(tau))
        .select(F.col("__idb").alias(id_col))
        .dropDuplicates([id_col])
    )
    return (
        v.join(pruned.withColumn("__dup", F.lit(True)), id_col, "left")
        .select(
            F.col(id_col),
            "cluster_id",
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("kept"),
        )
    )
