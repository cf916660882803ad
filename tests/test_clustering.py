"""k-means clustering operator: Lloyd-round semantics on a dataset with
planted, well-separated clusters; determinism across runs."""

from streamjoin_spark.operators.clustering import (
    assign_clusters,
    kmeans,
    recompute_centroids,
    seed_centroids,
)


def _planted(spark):
    # two tight blobs around (0,0,..) and (10,10,..); ids interleaved so the
    # 2 lowest ids (the seeds) land one in each blob
    rows = []
    for i in range(20):
        base = 0.0 if i % 2 == 0 else 10.0
        rows.append((i, [base + (i % 5) * 0.01] * 4))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_separates_planted_blobs(spark):
    df = _planted(spark)
    out = kmeans(df, k=2, iters=2).select("vec_id", "cluster_id").collect()
    by_parity = {r.vec_id % 2 for r in out}  # sanity: both blobs present
    assert by_parity == {0, 1}
    clusters = {r.vec_id: r.cluster_id for r in out}
    # all even ids together, all odd ids together, different clusters
    evens = {clusters[i] for i in range(0, 20, 2)}
    odds = {clusters[i] for i in range(1, 20, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds


def test_kmeans_deterministic(spark):
    df = _planted(spark)
    a = sorted(map(tuple, kmeans(df, 2, 1).select("vec_id", "cluster_id", "dist").collect()))
    b = sorted(map(tuple, kmeans(df, 2, 1).select("vec_id", "cluster_id", "dist").collect()))
    assert a == b


def test_recompute_is_canonical_mean(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    seeds = seed_centroids(df, 1)
    assigned = assign_clusters(df, seeds)
    cents = recompute_centroids(assigned).collect()
    assert len(cents) == 1
    assert cents[0]["__cv"] == [2.0, 3.0]
