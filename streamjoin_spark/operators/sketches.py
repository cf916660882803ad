"""Distinct-count sketches (KMV / k-minimum-values).

Beyond the reference surface: cardinality estimation for corpus statistics
at scales where exact ``COUNT(DISTINCT)`` is a full shuffle of every
distinct value. The KMV estimator (Bar-Yossef et al. 2002; the same
bottom-k physics as Apache DataSketches' theta sketch) keeps only the k
smallest hash values per group: with U(k) the k-th smallest of n distinct
uniform hashes scaled to (0, 1], E[U(k)] ~ k/(n+1), so ``(k-1)/U(k)`` is an
(almost) unbiased estimate of n.

Determinism contract: hashing uses ``functions.hash64`` (md5-based, 60-bit,
DuckDB-twin ``('0x'||substr(md5(x),1,15))::BIGINT``) so the hash values —
and therefore the estimate — are bit-identical across engines; the division
is between doubles that are identical on both sides (long→double cast is
round-to-nearest-even in both). No RNG, no engine-specific hash.

Scale posture: one shuffle to distinct the (group, hash) pairs (map-side
partial dedup applies), one group-partitioned ranking window bounded by the
distinct count. The k-min set is mergeable (union two sets, keep the k
smallest), which is what makes the sketch the right tool for 100 TB:
per-partition bottom-k partials union associatively, unlike exact distinct
counting. Small groups (< k distinct values) return their exact count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hash64

__all__ = ["kmv_distinct"]

# functions.hash64 yields 15 hex digits = 60 bits, uniform on [0, 2**60).
_HASH_SPACE = float(2**60)


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate of ``value_col`` via a k-minimum-
    values sketch. Output: group columns + ``est_distinct`` (long) +
    ``exact_distinct`` (long, the group's true distinct count — cheap to
    carry here and useful for accuracy audits; drop at true scale).

    Estimate = floor((k-1) * 2^60 / kth_min_hash) when the group has >= k
    distinct hashes, else the exact distinct count.
    """
    group_cols = list(group_cols)
    hashes = df.select(
        *group_cols, hash64(F.col(value_col).cast("string")).alias("__hv")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.asc("__hv"))
    ranked = hashes.withColumn("__rn", F.row_number().over(w))
    per_group = (
        ranked.groupBy(*group_cols)
        .agg(
            F.max(F.when(F.col("__rn") == k, F.col("__hv"))).alias("__kth"),
            F.count(F.lit(1)).alias("exact_distinct"),
        )
    )
    est = F.when(
        F.col("__kth").isNotNull(),
        F.floor(
            F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("__kth").cast("double")
        ),
    ).otherwise(F.col("exact_distinct"))
    return per_group.select(
        *group_cols,
        est.cast("long").alias("est_distinct"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )
