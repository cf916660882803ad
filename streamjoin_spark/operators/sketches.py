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
    "kmv_set",
    "kmv_set_ops",
    "hll_registers",
    "hll_row",
    "merge_hll",
    "hll_estimate",
    "hll_distinct",
    "cms_counters",
    "cms_topk",
    "bloom_positions",
    "bloom_prune",
    "quantile_sketch",
    "merge_quantile_sketches",
    "quantiles_from_sketch",
    "approx_quantiles",
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
    distinct hashes, else the exact distinct count. The divisor is clamped
    to >= 1: hash64 can yield 0 (p ≈ 2^-60), which would otherwise give
    +inf and an undefined long cast. ``exact_distinct`` counts distinct
    *hashes*, not distinct values — under a (astronomically rare, 60-bit)
    hash collision two values collapse to one; fine for accuracy audits.
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
            F.lit(float(k - 1)) * F.lit(_HASH_SPACE)
            / F.greatest(F.col("__kth"), F.lit(1)).cast("double")
        ),
    ).otherwise(F.col("exact_distinct"))
    return per_group.select(
        *group_cols,
        est.cast("long").alias("est_distinct"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    b: int = 9,
) -> DataFrame:
    """HyperLogLog register table per group: ``(group cols, bucket, rho)``
    with m = 2^b registers (Flajolet et al. 2007; the register layout of
    Spark's own approx_count_distinct and Apache DataSketches HLL).

    bucket = the low ``b`` bits of the 60-bit md5 hash; rho = position of
    the leading 1-bit in the remaining (60-b)-bit word, computed as
    ``(60-b) - bitlength(w) + 1`` via ``bin()`` string length — pure
    integer/string ops, bit-identical across engines (no log2 floats).

    Mergeable by MAX per (group, bucket): per-partition partials combine
    map-side in the groupBy, and independent sketches union with the same
    MAX — the property that makes HLL the 100 TB running-cardinality tool.
    One shuffle of at most m rows per group.
    """
    group_cols = list(group_cols)
    bucket, rho = hll_row(value_col, b)
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_row(value_col: str, b: int = 9) -> tuple[Column, Column]:
    """Per-row ``(bucket, rho)`` column pair — the map-side half of the
    sketch, exposed so a *streaming* source transform can attach them and
    an incremental ``groupBy(..., 'bucket').agg(max('rho'))`` maintains the
    registers through the CDC runtime (inserts fold in via MAX; deletes
    trigger the runtime's dirty-group recompute)."""
    m = 1 << b
    hv = hash64(F.col(value_col).cast("string"))
    # w = the high (60-b) bits of hv. shiftright is exact integer division
    # by 2^b for the always-positive 60-bit hash (a double round-trip would
    # lose bits), and deriving w from the same hv Column keeps both halves
    # of the sketch resolving value_col identically — no raw SQL-string
    # interpolation of the column name.
    w = F.shiftright(hv, b)
    # rho = leading-zero count of the (60-b)-bit word + 1
    #     = (60-b) - bitlength(w) + 1, with bitlength(0) := 0.
    # bin(0) is '0' (length 1), so the w = 0 case is special-cased.
    rho = F.when(w == 0, F.lit(60 - b + 1)).otherwise(
        F.lit(60 - b) - F.length(F.bin(w)) + F.lit(1)
    )
    return (hv % m), rho.cast("int")


def merge_hll(a: DataFrame, b_: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Union two register tables: MAX rho per (group, bucket) — the HLL
    merge law (associative, commutative, idempotent)."""
    group_cols = list(group_cols)
    return (
        a.unionByName(b_)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: Sequence[str], b: int = 9
) -> DataFrame:
    """Cardinality estimate from a register table. Output: group cols +
    ``est_distinct`` (long).

    Determinism contract: Σ 2^(-rho) is computed as an exact BIGINT sum of
    2^(52-rho) terms (rho ≤ 52 for b ≥ 9 with a 60-bit hash) — no float
    summation order anywhere; the final α·m²/S division is between doubles
    identical on both engines. Small-range (V>0, est ≤ 2.5m) falls back to
    linear counting m·ln(m/V); ln may differ by 1 ulp across engines, so
    oracle queries should target the raw branch or tolerate ±1 on the
    floor (documented, not observed on the shipped query).
    """
    group_cols = list(group_cols)
    m = 1 << b
    scale = 1 << 52  # 2^52: max rho for b>=9, keeps terms exact BIGINTs
    per_group = registers.groupBy(*group_cols).agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 52 - rho)")).alias("__s"),
        F.count(F.lit(1)).alias("__present"),
    )
    v = F.lit(m) - F.col("__present")  # empty registers
    s_total = F.col("__s") + v.cast("long") * F.lit(scale)
    # α·m²·2^52 folded to ONE Python double (multiplications by powers of
    # two are exact, so this equals α's mantissa exponent-shifted); its
    # shortest repr round-trips identically through both engines' parsers,
    # leaving a single double division at runtime — no cross-engine
    # arithmetic-order questions
    num = hll_alpha_numerator(b)
    est_raw = F.lit(num) / s_total.cast("double")
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(est_raw)
    return per_group.select(
        *group_cols, F.floor(est).cast("long").alias("est_distinct")
    )


def hll_alpha_numerator(b: int) -> float:
    """α_m · m² · 2^52 as one double — shared by the Spark path and the
    DuckDB oracle twin so both sides embed the identical literal."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * float(m) * float(m) * float(1 << 52)


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    b: int = 9,
) -> DataFrame:
    """Per-group HLL distinct-count estimate + the exact count for accuracy
    audits (drop the exact column at true scale — it is the expensive one).
    Standard error ≈ 1.04/√m (≈4.6 % at b=9)."""
    group_cols = list(group_cols)
    est = hll_estimate(hll_registers(df, group_cols, value_col, b), group_cols, b)
    exact = df.groupBy(*group_cols).agg(
        F.countDistinct(F.col(value_col)).alias("exact_distinct")
    )
    return est.join(exact, group_cols)


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

    r12: the probe side is spread_scan-guarded; r13: the membership
    checks are broadcast left joins + not-null filters (the optimizer
    rewrites them to broadcast INNER joins — row-preserving because
    ``positions`` is distinct), NOT left-semi joins. Semi joins are
    pushed below the spread repartition by ``PushDownLeftSemiAntiJoin``,
    which put the k md5 probe hashes back into the (possibly one-task)
    scan stage — exactly what the spread guard exists to prevent; inner
    joins stay above the exchange, so the probe hashing parallelizes
    (guide §2.5). Requires ``positions`` distinct on ``position`` (which
    ``bloom_positions`` guarantees) — a duplicate position would
    duplicate probe rows where the semi form did not.
    """
    from .spread import spread_scan

    probe = spread_scan(probe, key_col)
    out = probe
    for i in range(k):
        pos_i = hash64(
            F.concat(F.lit(f"bloom{i}"), F.col(key_col).cast("string"))
        ) % F.lit(m)
        hit = f"__bloom_hit{i}"
        out = (
            out.join(
                F.broadcast(positions.select(F.col("position").alias(hit))),
                pos_i == F.col(hit),
                "left",
            )
            .where(F.col(hit).isNotNull())
            .drop(hit)
        )
    return out


# ----------------------------------------------------------------------
# Mergeable approx-quantile sketch (fixed-grid histogram)
# ----------------------------------------------------------------------

def quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    n_bins: int = 512,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Mergeable per-group quantile sketch: an equi-width histogram over
    ``[lo, hi]`` with ``n_bins`` buckets. Output: group cols + ``bin``
    (long), ``cnt`` (long), ``lo``, ``hi`` (double) — partials MERGE by
    summing ``cnt`` per (group, bin) (see ``merge_quantile_sketches``),
    which is the property exact percentiles lack and the reason a 100 TB
    profiling pass wants a sketch (same role as KLL/t-digest in
    DataSketches; fixed-grid is chosen over KLL for an exact cross-engine
    oracle: every operation is deterministic IEEE arithmetic, identical
    in Spark and DuckDB — no RNG, no data-order dependence).

    Rank error ≤ the heaviest bin's mass; value error ≤ (hi-lo)/n_bins.
    Bounds default to the input's min/max per group (one extra map-side
    combinable agg pass + a group-key join); pass explicit ``lo``/``hi``
    to make sketches from DIFFERENT runs mergeable (bounds must match).

    Scale posture: two hash aggregations on the group key (bounds +
    bin counts), both map-side partial; NO global sort and no per-value
    shuffle beyond the count agg; sketch size ≤ n_bins rows per group.
    """
    group_cols = list(group_cols)
    x = F.col(value_col)
    src = df.where(x.isNotNull())
    if lo is not None and hi is not None:
        bounded = src.withColumn("__lo", F.lit(float(lo))).withColumn(
            "__hi", F.lit(float(hi))
        )
    else:
        bounds = src.groupBy(*group_cols).agg(
            F.min(x).cast("double").alias("__lo"),
            F.max(x).cast("double").alias("__hi"),
        )
        bounded = (
            src.join(bounds, group_cols) if group_cols
            else src.crossJoin(F.broadcast(bounds))
        )
    width = F.col("__hi") - F.col("__lo")
    # bin = clamp(floor((x - lo) / (hi - lo) * n_bins), 0, n_bins-1);
    # degenerate group (hi == lo) → everything in bin 0. All-IEEE, exact
    # cross-engine: write the oracle with the SAME parenthesization.
    b = F.when(width > 0.0, F.least(
        F.floor(
            (x.cast("double") - F.col("__lo")) / width * F.lit(float(n_bins))
        ).cast("long"),
        F.lit(n_bins - 1).cast("long"),
    )).otherwise(F.lit(0).cast("long"))
    return (
        bounded.withColumn("bin", b)
        .groupBy(*group_cols, "bin")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.first("__lo").alias("lo"),
            F.first("__hi").alias("hi"),
            F.first(F.lit(n_bins).cast("long")).alias("n_bins"),
        )
    )


def merge_quantile_sketches(
    a: DataFrame, b: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Union two sketches built with the SAME bounds/binning: counts add
    per (group, bin) — the associative merge that lets per-partition /
    per-day partials roll up without touching raw data."""
    group_cols = list(group_cols)
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bin")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
            F.first("n_bins").alias("n_bins"),
        )
    )


def quantiles_from_sketch(
    sketch: DataFrame,
    qs: Sequence[float],
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Estimate quantiles from a histogram sketch: for each q, the upper
    edge of the bin holding the ceil(q·N)-th value (1-indexed). Output:
    group cols + ``q`` + ``value``.

    The cumulative window orders ≤ n_bins rows per group — bounded state,
    not a data-scale sort. Edge arithmetic ``lo + (bin+1)·(hi-lo)/n_bins``
    is reproduced verbatim in the oracle, so the doubles are bit-identical
    cross-engine (division-derived floats are never rounded, per the
    repo's float invariant).
    """
    group_cols = list(group_cols)
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("bin")
    wall = Window.partitionBy(*[F.col(c) for c in group_cols])
    cum = (
        sketch.withColumn("__cum", F.sum("cnt").over(w))
        .withColumn("__total", F.sum("cnt").over(wall))
    )
    qdf = cum.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    )
    edge = F.when(
        F.col("hi") > F.col("lo"),
        F.col("lo")
        + (F.col("bin") + 1).cast("double")
        * (F.col("hi") - F.col("lo"))
        / F.col("n_bins").cast("double"),
    ).otherwise(F.col("lo"))
    return (
        qdf.where(F.col("__cum") >= F.ceil(F.col("q") * F.col("__total")))
        .withColumn("__edge", edge)
        .groupBy(*group_cols, "q")
        .agg(F.min("__edge").alias("value"))
    )


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float],
    group_cols: Sequence[str] = (),
    n_bins: int = 512,
) -> DataFrame:
    """One-shot convenience: sketch + estimate. Same distributed shape
    (two group-key aggs, one n_bins-bounded window), no global sort —
    compare __spark_entry__'s exact ``percentiles`` query, whose per-key
    ordered window is a per-group sort of the DATA."""
    return quantiles_from_sketch(
        quantile_sketch(df, value_col, group_cols, n_bins=n_bins),
        qs,
        group_cols,
    )


def kmv_set(df, value_col: str, k: int = 256) -> DataFrame:
    """Bottom-k hash sketch of one value set: the k smallest 60-bit md5
    hashes of the distinct values (theta-sketch physics). The sort is a
    distributed top-k (TakeOrdered) — k rows ever reach one place."""
    return (
        df.select(hash64(F.col(value_col).cast("string")).alias("hv"))
        .distinct()
        .orderBy(F.asc("hv"))
        .limit(k)
    )


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    value_col_a: str,
    value_col_b: str | None = None,
    k: int = 256,
) -> DataFrame:
    """Set-algebra estimates from two bottom-k sketches (the theta-sketch
    union/intersection trick, Dasgupta et al. 2016): the union sketch is
    the k smallest of the merged hash sets; ρ = how many of those appear
    in BOTH inputs estimates Jaccard as ρ/k, and intersection as
    Jaccard·|∪|. One row out: ``est_union``, ``est_intersect``,
    ``jaccard_est`` + ``exact_union``/``exact_intersect`` for the audit
    (drop the exacts at true scale — they are the expensive ones).

    Determinism: identical md5 hash sets on both engines ⇒ identical
    sketches ⇒ identical estimates; the two divisions are
    FLOOR-canonicalized. Sub-k sets degrade to exact answers (the union
    sketch then holds every hash).

    Scale: each sketch is a distributed top-k; all downstream frames are
    ≤ k rows (driver-free 1-row crossJoins)."""
    vb = value_col_b or value_col_a
    sa, sb = kmv_set(a, value_col_a, k), kmv_set(b, vb, k)
    un = (
        sa.unionByName(sb).dropDuplicates(["hv"]).orderBy(F.asc("hv")).limit(k)
    )
    stats = un.agg(
        F.count(F.lit(1)).alias("k_eff"), F.max("hv").alias("kth")
    )
    rho = (
        un.join(sa, "hv", "left_semi")
        .join(sb, "hv", "left_semi")
        .agg(F.count(F.lit(1)).alias("rho"))
    )
    ua = a.select(F.col(value_col_a).alias("v")).distinct()
    ub = b.select(F.col(vb).alias("v")).distinct()
    exact_u = ua.unionByName(ub).distinct().agg(
        F.count(F.lit(1)).alias("exact_union")
    )
    exact_i = ua.join(ub, "v", "left_semi").agg(
        F.count(F.lit(1)).alias("exact_intersect")
    )
    est_union = F.when(
        F.col("k_eff") >= k,
        F.floor(
            F.lit(float(k - 1)) * F.lit(_HASH_SPACE)
            / F.greatest(F.col("kth"), F.lit(1)).cast("double")
        ),
    ).otherwise(F.col("k_eff")).cast("long")
    one = (
        stats.crossJoin(rho)
        .crossJoin(exact_u)
        .crossJoin(exact_i)
        .withColumn("est_union", est_union)
    )
    return one.select(
        F.col("est_union"),
        F.floor(
            F.col("rho").cast("double") / F.col("k_eff") * F.col("est_union")
        )
        .cast("long")
        .alias("est_intersect"),
        (
            F.floor(
                F.col("rho").cast("double") / F.col("k_eff") * F.lit(1e6)
            )
            / F.lit(1e6)
        ).alias("jaccard_est"),
        "exact_union",
        "exact_intersect",
    )
