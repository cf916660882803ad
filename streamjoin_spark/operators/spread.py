"""Input-skew guard for expensive per-row fan-out stages (guide §2.5).

A scan with fewer splits than the cluster has task slots — one small
parquet file, a single row group (parquet cannot split below a row
group, so ``spark.sql.files.minPartitionNum`` cannot help), one giant
gzip — starves every map stage between the read and the first
exchange: shingle construction, per-shingle hashing, Bloom probes and
similar per-row-heavy expressions all run on one core while the rest
of the cluster idles. ``spread_scan`` repartitions such inputs up to
``defaultParallelism`` BEFORE the heavy stage.

100 TB posture: the repartition only fires when the input has fewer
than half the cluster's parallelism in splits — at real scale a scan
arrives in thousands of splits and this is a no-op (zero added
exchanges). When it does fire, the shuffle moves at most the projected
input once (callers project to the needed columns first, guide §2.3)
to unlock N-way parallelism of a stage whose per-row cost dwarfs the
byte move. Hash-partitioning on ``key_cols`` (vs round-robin) keeps
the move sort-free and lets a downstream per-key groupBy/join reuse
the layout instead of re-exchanging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["spread_scan"]


def spread_scan(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` ahead of an expensive
    fan-out stage, iff the plan would otherwise run in fewer than half
    that many tasks. Hash-partitions on ``key_cols`` when given (keep a
    downstream groupBy/join on the same key exchange-free), round-robin
    otherwise. Pure layout change — never alters row content.

    Cost note (ADVICE r12): the accurate split probe below
    (``df.rdd.getNumPartitions()``) forces a full physical-plan compile
    plus an RDD conversion on the driver, per call. To avoid paying that
    at real scale — where the guard is a documented no-op — a cheap
    analysis-only ``inputFiles()`` listing runs first: split packing puts
    at most ~32 files in one split (``files.openCostInBytes`` charges 4 MB
    per file against a 128 MB split), so ≥ 16·par files guarantees
    > par/2 splits and the guard can never fire — return without
    planning. Fewer files (every local/test shape, and any input actually
    at risk) fall through to the accurate probe. Caveat kept from r12: on
    non-scan-rooted inputs the RDD count reflects ``shuffle.partitions``,
    not file splits, so the guard degrades to a no-op there — callers
    apply it directly on scans."""
    try:
        sc = df.sparkSession.sparkContext
        par = sc.defaultParallelism
    except Exception:
        return df
    try:
        # analysis-only: walks the logical plan's file indexes, no
        # physical planning. Empty for non-file sources → fall through.
        if len(df.inputFiles()) >= 16 * par:
            return df
    except Exception:
        pass
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n * 2 > par:
        return df
    if key_cols:
        return df.repartition(par, *[F.col(c) for c in key_cols])
    return df.repartition(par)
