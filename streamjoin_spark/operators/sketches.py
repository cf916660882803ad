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

__all__ = [
    "kmv_distinct",
    "cms_counters",
    "cms_topk",
    "bloom_positions",
    "bloom_prune",
]

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


def cms_counters(
    df: DataFrame,
    value_col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Count-min-sketch counter table for a value stream: ``(seed, bucket,
    n)`` with one counter row per (hash row, bucket). depth × width longs
    total — the whole sketch broadcasts.

    Mergeable by counter addition (sum matching (seed, bucket) cells), which
    is the 100 TB story: per-partition partial counters combine map-side in
    the groupBy, and day-over-day sketches union by the same addition —
    no re-scan of history to maintain running heavy-hitter estimates.
    """
    # seed participates through the md5 payload prefix (one hash family),
    # mirroring the DuckDB twin md5(seed || value); the seed fan-out is an
    # explode of a literal array — a projection, not a join
    exploded = df.select(
        F.col(value_col).cast("string").alias("__v"),
        F.explode(F.array(*[F.lit(f"cms{i}") for i in range(depth)])).alias("seed"),
    )
    return (
        exploded.withColumn(
            "bucket", hash64(F.concat(F.col("seed"), F.col("__v"))) % F.lit(width)
        )
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_topk(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Heavy hitters by count-min estimate: for each distinct value, the
    estimate is min over seeds of its counter cell (never an underestimate —
    CMS collisions only inflate). Output top-k by (est_n desc, value), with
    the exact count carried for accuracy audits (drop at true scale: the
    exact groupBy is precisely the full shuffle CMS exists to avoid).

    Deterministic across engines: md5-parity hashing, integer counters, full
    tiebreak ordering. The counter table broadcasts (depth × width rows);
    the probe is one groupBy over distinct values and a distributed top-k.

    The counters are built from the deduped (value, count) pairs — counter
    cell = sum of counts of values hashing into it, identical to counting
    the raw stream — so the md5 family runs once per distinct value per
    seed, not once per input row per seed (at 100 TB the distinct-token
    table is orders of magnitude smaller than the token stream).
    """
    exact = (
        df.select(F.col(value_col).cast("string").alias("value"))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    counters = (
        exact.select(
            "value",
            "exact_n",
            F.explode(
                F.array(*[F.lit(f"cms{i}") for i in range(depth)])
            ).alias("seed"),
        )
        .withColumn(
            "bucket", hash64(F.concat(F.col("seed"), F.col("value"))) % F.lit(width)
        )
        .groupBy("seed", "bucket")
        .agg(F.sum("exact_n").alias("n"))
    )
    probe = exact.select(
        "value",
        "exact_n",
        F.explode(F.array(*[F.lit(f"cms{i}") for i in range(depth)])).alias("seed"),
    ).withColumn(
        "bucket", hash64(F.concat(F.col("seed"), F.col("value"))) % F.lit(width)
    )
    est = (
        probe.join(F.broadcast(counters), ["seed", "bucket"])
        .groupBy("value", "exact_n")
        .agg(F.min("n").alias("est_n"))
    )
    return est.select("value", "est_n", "exact_n").orderBy(
        F.desc("est_n"), F.asc("value")
    ).limit(k)


def bloom_positions(
    df: DataFrame, key_col: str, m: int = 8192, k: int = 3
) -> DataFrame:
    """The set bit positions of a Bloom filter over ``key_col`` — the
    DataFrame analog of the bitset (``position`` long, distinct). k hash
    functions via seeded md5-parity hashing, so membership checks are
    bit-reproducible across engines."""
    return (
        df.select(F.col(key_col).cast("string").alias("__k"))
        .distinct()
        .select(
            "__k",
            F.explode(
                F.array(*[F.lit(f"bloom{i}") for i in range(k)])
            ).alias("__seed"),
        )
        .select(
            (hash64(F.concat(F.col("__seed"), F.col("__k"))) % F.lit(m)).alias(
                "position"
            )
        )
        .distinct()
    )


def bloom_prune(
    probe: DataFrame,
    positions: DataFrame,
    key_col: str,
    m: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Runtime-filter analog: keep probe rows whose key passes the Bloom
    membership test (all k positions set). Survivors are a superset of the
    true matches — false positives at the classic (1-e^{-kn/m})^k rate — so
    follow with the exact join; the sketch's job is to drop the bulk of
    non-matching rows *before* the shuffle.

    Scale posture: ``positions`` is at most m rows (a few hundred KB even at
    m=2^20) and is broadcast once; the prune is k broadcast semi-joins on
    the probe side — no shuffle of the probe, which is the entire point.
    (Spark's native ``spark.sql.optimizer.runtime.bloomFilter.enabled``
    injects the same filter as a JVM bitset; this operator is the
    declarative, engine-checkable form with deterministic hashing. An
    embedded-bitset variant — array-literal words + ``bit_get`` in a pure
    Filter — was measured ~1.7x SLOWER than the broadcast semi-joins at
    sf0.1: the md5 probe hashing dominates either way and the 3 hash-lookup
    semi-joins beat interpreted array/bit expression eval, so the join form
    is the shipped one.)

    Sizing: m must give ~2+ bits per distinct build key per hash or the
    filter saturates and prunes nothing (classic FP rate
    ``(1-e^{-kn/m})^k``). Callers own m; at true scale derive it from an
    upstream count/sketch of the build side.
    """
    out = probe
    for i in range(k):
        pos_i = hash64(
            F.concat(F.lit(f"bloom{i}"), F.col(key_col).cast("string"))
        ) % F.lit(m)
        out = out.join(
            F.broadcast(positions),
            pos_i == positions["position"],
            "left_semi",
        )
    return out
