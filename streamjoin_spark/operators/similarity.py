"""Similarity search over embedding columns (``array<float>``).

Beyond the reference surface (SURVEY.md §2 lists no vector ops) — these are
the ANN building blocks a training-data pipeline needs. Two tiers:

- ``cosine_topk`` — exact brute-force top-k: the correctness baseline and
  the right answer when the query set is small (queries are broadcast; the
  corpus is scanned once, never shuffled).
- ``lsh_bucket_topk`` — random-hyperplane LSH: corpus and queries are
  bucketed by the sign pattern of dot products with fixed hyperplanes, and
  only same-bucket pairs are scored. At 100 TB the bucket id becomes the
  shuffle/partition key, turning an O(N·Q) scan into per-bucket work;
  recall is tuned by ``n_planes`` (fewer planes → bigger buckets → higher
  recall, more compute).

All math is built-in Column expressions (zip_with/aggregate/transform) —
JVM-side, no Python in the hot path. Hyperplanes are deterministic
md5-seeded constants so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a strict left fold — the summation order is deterministic,
    so cross-engine float drift stays at rounding level."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def _cos_pre(qv: Column, cv: Column, qn: Column, cn: Column) -> Column:
    """``cosine`` with the casts and norm folds HOISTED to once per row
    (r12, guide §1.2 per-task work): the pair scorers below evaluate
    |Q|·|C| similarity expressions, and the higher-order-function folds
    are CodegenFallback — interpreted — so re-folding both norms and
    re-casting both arrays per PAIR tripled the per-pair work. Callers
    pre-cast each side's array once per row and carry its norm as a real
    column; this is ``dot/(norm_a·norm_b)`` over the identical doubles in
    the identical order, hence bit-identical similarity values
    (oracle-pinned on every consumer)."""
    return dot(qv, cv) / (qn * cn)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k nearest neighbors by cosine for each query vector.

    Queries are broadcast (the small side by assumption); ranking uses the
    *rounded* similarity with the neighbor id as tiebreak, so results are
    stable across engines and runs. Output: query_id, neighbor_id, cosine_sim.
    """
    qid = query_id_col or id_col
    # side-neutral expression (ADVICE r12): corpus and queries share
    # vec_col today, but binding one name to both sides invites a silent
    # bug if a separate query vector column is ever introduced
    v = _as_double(F.col(vec_col))
    q = F.broadcast(
        queries.select(
            F.col(qid).alias("query_id"), v.alias("__qv"), norm(v).alias("__qn")
        )
    )
    # scoring cost is |Q|·|C| cosines and must not inherit the corpus file
    # layout (a single small file would serialize it behind the broadcast
    # join) — one O(|C|) round-robin shuffle buys a fully parallel scan
    par = corpus.sparkSession.sparkContext.defaultParallelism
    c = corpus.repartition(par).select(
        F.col(id_col).alias("neighbor_id"),
        v.alias("__cv"),
        norm(v).alias("__cn"),
    )
    sim = F.round(
        _cos_pre(F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn")), 6
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def hyperplanes(dim: int, n_planes: int = 8) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim, seeded by md5
    of (plane, component) — reproducible everywhere, no RNG state."""
    planes = []
    for p in range(n_planes):
        row = []
        for j in range(dim):
            h = int(hashlib.md5(f"{p}_{j}".encode()).hexdigest()[:15], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def bucket_id(vec: Column, planes: Sequence[Sequence[float]]) -> Column:
    """LSH bucket = concatenated sign bits of ⟨v, plane_p⟩."""
    v = _as_double(vec)
    bits = [
        F.when(dot(v, F.array(*[F.lit(x) for x in plane])) >= 0, "1").otherwise("0")
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only same-bucket pairs. Output schema matches
    ``cosine_topk`` so the two tiers are drop-in interchangeable."""
    planes = hyperplanes(dim, n_planes)
    v = _as_double(F.col(vec_col))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        v.alias("__qv"),
        norm(v).alias("__qn"),
        bucket_id(F.col(vec_col), planes).alias("__bucket"),
    )
    # distribute bucket hashing + same-bucket scoring across the cluster
    # regardless of the corpus file layout (see cosine_topk)
    corpus = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        v.alias("__cv"),
        norm(v).alias("__cn"),
        bucket_id(F.col(vec_col), planes).alias("__bucket"),
    )
    sim = F.round(
        _cos_pre(F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn")), 6
    )
    scored = (
        F.broadcast(q)
        .join(c, "__bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def centroid_sample(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-size deterministic centroid sample: the ``n_centroids`` rows
    with the lowest ``md5(id)`` — a pseudo-random spread over the corpus
    that compiles to ONE k-bounded ``TakeOrderedAndProject`` (per-partition
    top-K + driver merge of K rows), never a full sort and never a frame
    that grows with the corpus. K is an explicit knob (FAISS's ``nlist``),
    so at 100× the data the broadcast centroid set and the O(N·K)
    assignment pass stay exactly the same size — the fix for the r4
    VERDICT's O(N) ``id % step`` law. md5-on-string ordering is identical
    in DuckDB (lowercase-hex lexicographic), so oracles reproduce the same
    sample; ties (none in practice) break on id."""
    return (
        corpus.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(int(n_centroids))
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("__cvec"))
    )


def refined_centroids(
    corpus: DataFrame,
    n_centroids: int,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """K-means-refined IVF coarse quantizer: seed with the fixed-K
    ``centroid_sample`` (md5-ordered, k-bounded), then run ``refine_iters``
    Lloyd rounds of the deterministic distributed k-means
    (operators/clustering.py — squared-L2 assignment with the canonical
    FLOOR-mean recompute, the standard "train the coarse quantizer with
    k-means on L2" step FAISS performs even for IP/cosine indexes).
    Output: ``(cent_id, __cvec)`` with dense 0..K-1 ids (empty clusters
    drop, as in any Lloyd implementation).

    Scale: each round is one map-only broadcast assignment over the corpus
    + one (cluster, dim)-key shuffle whose reduce side is K·dim rows; the
    K-row centroid frame localCheckpoints per round (iterative-operator
    invariant). Bit-deterministic end to end, so a DuckDB oracle
    reproduces the same refined centroids."""
    from .clustering import assign_clusters, recompute_centroids

    seeds = centroid_sample(corpus, n_centroids, id_col, vec_col)
    w = Window.orderBy(F.asc("cent_id"))
    cents = seeds.select(
        (F.row_number().over(w) - 1).cast("int").alias("cluster_id"),
        _as_double(F.col("__cvec")).alias("__cv"),
    ).localCheckpoint(eager=True)
    body = corpus.select(F.col(id_col), F.col(vec_col))
    for _ in range(refine_iters):
        assigned = assign_clusters(body, cents, id_col, vec_col)
        cents = recompute_centroids(assigned, vec_col).localCheckpoint(
            eager=True
        )
    return cents.select(
        F.col("cluster_id").alias("cent_id"), F.col("__cv").alias("__cvec")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 64,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> DataFrame:
    """IVF-flat approximate top-k: the inverted-file ANN tier.

    Centroids are a fixed-size deterministic sample (``centroid_sample``:
    the ``n_centroids`` lowest-md5(id) rows — k-bounded at any corpus
    size, no iterative training, reproducible everywhere). Build: every
    vector joins the broadcast centroid set and keeps its nearest (one
    O(N·K) scoring pass at fixed K, parallel over the corpus — the IVF
    index build). Query: each query scores the same centroid set, probes
    its ``nprobe`` nearest lists, and scans only vectors assigned there —
    candidate volume ~``nprobe/K`` of the corpus vs. the brute-force full
    scan.

    At 100 TB the assignment becomes the partition key: inverted lists are
    co-located by ``cent_id``, queries broadcast to the lists they probe,
    and the final top-k is a per-query window over candidates. Ties are
    broken on (rounded sim, id) so results are deterministic and
    oracle-checkable. Output schema matches ``cosine_topk``.

    ``refine_iters > 0`` k-means-refines the sampled centroids first
    (``refined_centroids`` — L2 Lloyd rounds, the FAISS coarse-quantizer
    training step): better-balanced inverted lists at the cost of
    ``refine_iters`` extra corpus passes at index-build time; probing is
    unchanged.
    """
    par = corpus.sparkSession.sparkContext.defaultParallelism
    if refine_iters > 0:
        cents0 = refined_centroids(corpus, n_centroids, refine_iters, id_col, vec_col)
    else:
        cents0 = centroid_sample(corpus, n_centroids, id_col, vec_col)
    # casts + norms hoisted once per row on every side (_cos_pre): the
    # centroid set carries its norms into the broadcast, each vector its
    # own — the K·N assignment pairs then pay one dot fold each
    cvec = _as_double(F.col("__cvec"))
    cents = F.broadcast(
        cents0.select("cent_id", cvec.alias("__cvec"), norm(cvec).alias("__cnn"))
    )
    sim_c = F.round(
        _cos_pre(F.col("__v"), F.col("__cvec"), F.col("__vn"), F.col("__cnn")), 6
    )
    w_assign = Window.partitionBy("__id").orderBy(F.desc("__sim"), F.asc("cent_id"))
    vv = _as_double(F.col(vec_col))

    def nearest(df: DataFrame, n: int) -> DataFrame:
        scored = (
            df.crossJoin(cents)
            .select("__id", "__v", "__vn", "cent_id", sim_c.alias("__sim"))
            .withColumn("__rn", F.row_number().over(w_assign))
            .where(F.col("__rn") <= n)
        )
        return scored.select("__id", "__v", "__vn", "cent_id")

    inv = nearest(
        corpus.repartition(par).select(
            F.col(id_col).alias("__id"), vv.alias("__v"), norm(vv).alias("__vn")
        ),
        1,
    ).select(
        F.col("__id").alias("neighbor_id"),
        F.col("__v").alias("__cv"),
        F.col("__vn").alias("__cn"),
        "cent_id",
    )
    probes = nearest(
        queries.select(
            F.col(id_col).alias("__id"), vv.alias("__v"), norm(vv).alias("__vn")
        ),
        nprobe,
    ).select(
        F.col("__id").alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__vn").alias("__qn"),
        "cent_id",
    )

    sim = F.round(
        _cos_pre(F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn")), 6
    )
    scored = (
        F.broadcast(probes)
        .join(inv, "cent_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def _sqdist(a: Column, b: Column) -> Column:
    """Σ (aᵢ-bᵢ)² as a strict left fold (cross-engine deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _arr(vals: Sequence[float]) -> Column:
    # one ArrayType literal, not a CreateArray of scalars — m·ksub of these
    # appear in the fused quantize expression and the compact form keeps the
    # serialized plan ~10× smaller
    return F.lit([float(v) for v in vals])


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 64,
    nprobe: int = 2,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    code_step: int = 31,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate top-k — the memory-bounded 100 TB ANN tier.

    Product quantization on top of the IVF layout: the vector space is
    split into ``m`` subspaces of ``dim/m`` dims; each subspace gets a
    ``ksub``-entry codebook taken from a deterministic corpus sample
    (rows with ``id % code_step == 0``, lowest ids — the "train on a
    sample" step; production PQ k-means-refines these, the transport is
    identical). Every corpus vector is *encoded once at index-build time*:
    per subspace, the nearest codeword by squared L2 (ties to the lowest
    code) replaces the true subvector, so the inverted lists store
    ``m``-byte codes instead of ``dim`` floats — the 32×-compression that
    makes a 100 TB corpus fit an ANN index. Scoring is asymmetric (ADC):
    the full-precision query against the reconstructed corpus vector.

    Scale posture: codebooks are ``m·ksub·dim/m`` floats — a bounded
    driver collect (ksub rows) shipped to every task as literals (the
    FAISS codebook broadcast); encoding and reconstruction are map-only
    codegen expressions over the corpus scan — no shuffle beyond the IVF
    assignment already present in ``ivf_topk``; the candidate join stays
    keyed on ``cent_id`` with the (small) probe side broadcast.

    Deterministic end-to-end: sample choice, argmin tiebreak, and the
    FLOOR-canonicalized similarity are exact cross-engine, so the DuckDB
    oracle reproduces the *same* quantization. Output schema matches
    ``cosine_topk`` (``pq_sim`` in place of ``cosine_sim``).
    """
    dsub = dim // m
    sample = (
        corpus.where(F.pmod(F.col(id_col), F.lit(code_step)) == 0)
        .orderBy(id_col)
        .limit(ksub)
        .select(_as_double(F.col(vec_col)).alias("__v"))
        .collect()
    )
    if not sample:
        raise ValueError(
            "ivf_pq_topk: no codebook sample rows — no corpus id is a "
            f"multiple of code_step={code_step}; lower code_step"
        )
    # books[mi][kk] = the kk-th codeword of subspace mi (list of dsub floats)
    books = [
        [list(row["__v"][mi * dsub : (mi + 1) * dsub]) for row in sample]
        for mi in range(m)
    ]

    def quantize(v: Column) -> Column:
        """Nearest-codeword reconstruction, subspace by subspace: the
        encode(+decode) pair fused into one map-only expression. The whole
        codebook of a subspace is ONE array<array<double>> literal and the
        distance fold is written once (transform over it), so the plan stays
        small; ``array_position`` on the min picks the FIRST (lowest-code)
        codeword achieving it — the oracle's ORDER BY dist, code tiebreak."""
        parts = []
        for mi in range(m):
            book = F.lit([list(cw) for cw in books[mi]])
            sub = F.slice(v, mi * dsub + 1, dsub)
            dists = F.transform(book, lambda cw: _sqdist(sub, cw))
            code = F.array_position(dists, F.array_min(dists)).cast("int")
            parts.append(F.element_at(book, code))
        return F.flatten(F.array(*parts))

    par = corpus.sparkSession.sparkContext.defaultParallelism
    # casts + norms hoisted once per row (_cos_pre). The RECONSTRUCTED
    # corpus vector's norm stays a per-pair fold on the __cv attribute:
    # hoisting it next to quantize() in one projection would inline the
    # (interpreted, codebook-sized) quantize tree twice per row —
    # interpreted projections do no common-subexpression elimination.
    cvec = _as_double(F.col("__cvec"))
    cents = F.broadcast(
        centroid_sample(corpus, n_centroids, id_col, vec_col).select(
            "cent_id", cvec.alias("__cvec"), norm(cvec).alias("__cnn")
        )
    )
    sim_c = F.round(
        _cos_pre(F.col("__v"), F.col("__cvec"), F.col("__vn"), F.col("__cnn")), 6
    )
    w_assign = Window.partitionBy("__id").orderBy(F.desc("__sim"), F.asc("cent_id"))
    vv = _as_double(F.col(vec_col))

    def nearest(df: DataFrame, n: int) -> DataFrame:
        scored = (
            df.crossJoin(cents)
            .select("__id", "__v", "__vn", "cent_id", sim_c.alias("__sim"))
            .withColumn("__rn", F.row_number().over(w_assign))
            .where(F.col("__rn") <= n)
        )
        return scored.select("__id", "__v", "__vn", "cent_id")

    inv = nearest(
        corpus.repartition(par).select(
            F.col(id_col).alias("__id"), vv.alias("__v"), norm(vv).alias("__vn")
        ),
        1,
    ).select(
        F.col("__id").alias("neighbor_id"),
        quantize(F.col("__v")).alias("__cv"),
        "cent_id",
    )
    probes = nearest(
        queries.select(
            F.col(id_col).alias("__id"), vv.alias("__v"), norm(vv).alias("__vn")
        ),
        nprobe,
    ).select(
        F.col("__id").alias("query_id"),
        F.col("__v").alias("__qv"),
        F.col("__vn").alias("__qn"),
        "cent_id",
    )

    # division-derived → FLOOR-canonicalized (repo invariant), not ROUND;
    # query norm hoisted (__qn), reconstructed-side norm folded per pair
    # in the original operand order (norm(a)·norm(b))
    sim = (
        F.floor(
            dot(F.col("__qv"), F.col("__cv"))
            / (F.col("__qn") * norm(F.col("__cv")))
            * 1e6
        )
        / 1e6
    )
    scored = (
        F.broadcast(probes)
        .join(inv, "cent_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("pq_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("pq_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold, a<b).

    ``exact=True`` scores all pairs (oracle tier); default buckets by LSH
    first so only same-bucket pairs are scored (scale tier).

    Threshold calibration at scale (measured, SCALING.md note 2): random
    unrelated unit vectors in dimension d have cos ~ N(0, 1/d) — a
    threshold inside that tail (e.g. 0.35 at d=64, ~2.8σ) admits
    O(n²·p_tail) random collisions however good the blocking, so output
    grows quadratically while wall time stays linear (LSH bounds the
    scored pairs). For corpus dedup pick threshold ≳ 5/√d or add a
    downstream verify stage.

    ``n_planes`` calibration at scale (measured, SCALING.md 100× sweep):
    bucket count is FIXED at 2^n_planes and within-bucket scoring
    parallelism is bounded by distinct buckets — at 500k vectors with 6
    planes (64 buckets) one shuffle partition serialized ~10M cosine
    evaluations into a single straggler task. Scale planes with the
    corpus: n_planes ≈ log2(n / target_bucket_size) (e.g. 12 at 500k for
    ~50-vector buckets); more planes trade recall for candidate volume,
    so pair it with band-OR multi-probe or a brute-force verify of the
    survivors when recall matters."""
    # pair scoring is O(n²/buckets); rebalance the probe side up front so it
    # never runs serial behind a broadcast join of the (small) build side
    par = df.sparkSession.sparkContext.defaultParallelism
    v = _as_double(F.col(vec_col))
    a = df.repartition(par).select(
        F.col(id_col).alias("doc_a"), v.alias("__va"), norm(v).alias("__na")
    )
    b = df.select(
        F.col(id_col).alias("doc_b"), v.alias("__vb"), norm(v).alias("__nb")
    )
    if exact:
        # the cross product is broadcast-nested-loop over the (rebalanced)
        # stream side
        pairs = a.crossJoin(F.broadcast(b))
    else:
        planes = hyperplanes(dim, n_planes)
        a = a.withColumn("__bucket", bucket_id(F.col("__va"), planes))
        b = b.withColumn("__bucket", bucket_id(F.col("__vb"), planes))
        pairs = a.join(b, "__bucket")
    sim = F.round(
        _cos_pre(F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")), 6
    )
    return (
        pairs.where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", sim.alias("cosine_sim"))
        .where(F.col("cosine_sim") >= threshold)
    )


def ann_recall(
    exact: DataFrame,
    approx: DataFrame,
    k: int,
) -> DataFrame:
    """Recall@k of an approximate ANN tier against the exact tier — the
    evaluation harness that turns "tune n_planes / nprobe" from guesswork
    into a measured trade. Both inputs are top-k frames in the shared
    output schema (``query_id, neighbor_id, …``); recall per query =
    |approx ∩ exact| / k, using the EXACT tier's k as the denominator so a
    bucket with fewer than k candidates is penalized, not excused.

    Scale: both inputs are already k-bounded per query, so everything here
    is k·|Q|-sized — one equi-join on (query_id, neighbor_id), one count
    per query. Output: ``(query_id, n_hits, recall)`` (recall
    FLOOR-canonicalized; division-derived).
    """
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    hits = e.join(a, ["query_id", "neighbor_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    base = e.select("query_id").distinct()
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (
                F.floor(
                    F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k)) * 1e6
                )
                / 1e6
            ).alias("recall"),
        )
    )
