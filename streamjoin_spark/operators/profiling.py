"""Dataset profiling operators — the ANALYZE TABLE / data-quality pass of
a pipeline: per-column statistics and value histograms.

Beyond the reference surface. Everything is a single aggregation pass in
built-in Column expressions (map-side combined, no Python), so profiling a
100 TB table costs one scan; the unpivot to long form happens on the 1-row
aggregate, not on data.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "histogram", "pearson_corr", "group_outliers"]


def profile_columns(
    df: DataFrame, cols: list[str], round_dp: int = 2
) -> DataFrame:
    """Per-column stats for numeric columns, one scan: ``(col_name, n_rows,
    n_nulls, n_distinct, min_val, max_val, mean_val)`` — long form, one row
    per profiled column.

    Exactness: n_distinct is exact (COUNT DISTINCT — swap for
    ``approx_count_distinct`` when a ±2% HLL answer is acceptable at very
    high cardinalities); the mean is an exact DECIMAL sum of per-row-rounded
    values divided once, floor-canonicalized (cross-engine determinism, see
    CLAUDE.md invariants).

    Scale: one aggregation over the table (multiple DISTINCT aggregates
    lower to one Expand + two-level partial aggregation); the per-column
    union runs on the single output row.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        x = F.col(c).cast("double")
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"__nulls_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.round(F.min(x), round_dp).alias(f"__min_{c}"),
            F.round(F.max(x), round_dp).alias(f"__max_{c}"),
            F.sum(F.round(x, 4).cast("decimal(28,4)"))
            .cast("double").alias(f"__sum_{c}"),
        ]
    row = df.agg(*aggs)
    parts = [
        row.select(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_val"),
            F.col(f"__max_{c}").alias("max_val"),
            (
                F.floor(
                    F.col(f"__sum_{c}")
                    / (F.col("__n") - F.col(f"__nulls_{c}"))
                    * 10000
                )
                / F.lit(10000.0)
            ).alias("mean_val"),
        )
        for c in cols
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
) -> DataFrame:
    """Equal-width histogram: ``(bucket, bucket_lo, n)`` with out-of-range
    values clamped into the edge buckets. Bucket assignment is pure double
    arithmetic (identical on any engine); one map-side-combined groupBy on
    a key with at most ``n_buckets`` values.
    """
    width = (hi - lo) / n_buckets
    x = F.col(col).cast("double")
    b = F.least(
        F.greatest(F.floor((x - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_buckets - 1),
    )
    return (
        df.where(x.isNotNull())
        .groupBy(b.cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("bucket_lo"),
            "n",
        )
    )


def pearson_corr(
    df: DataFrame,
    pairs: Sequence[tuple[str, str]],
    round_dp: int = 4,
) -> DataFrame:
    """Pearson correlation for the given column pairs in ONE scan: every
    needed Σx, Σx², Σxy folds into a single 1-row HashAggregate (map-side
    partials — no shuffle beyond the final combine), then the r formula
    runs driver-free on that row. Output: ``col_x``, ``col_y``, ``n``,
    ``r`` (6 dp floor).

    Cross-engine determinism: inputs are per-row ROUNDed to ``round_dp``
    and summed as DECIMAL(19,6) (exact, order-free; 19-digit operands force DuckDB's int128 path and the 38-digit product stays inside both engines' decimal cap); the sums cast to identical
    doubles on both engines, and the r arithmetic is plain IEEE ops plus
    sqrt — which IEEE 754 requires to be correctly rounded (unlike ln/exp),
    so r is bit-identical without any canonicalization tricks; the final
    FLOOR is belt-and-braces for the division. NULL rows are excluded
    per-pair (SQL corr semantics).
    """
    cols = sorted({c for p in pairs for c in p})
    aggs = []
    for x, y in pairs:
        k = f"{x}__{y}"
        xv = F.round(F.col(x).cast("double"), round_dp).cast("decimal(19,6)")
        yv = F.round(F.col(y).cast("double"), round_dp).cast("decimal(19,6)")
        both = F.col(x).isNotNull() & F.col(y).isNotNull()
        xg = F.when(both, xv)
        yg = F.when(both, yv)
        aggs += [
            F.count(F.when(both, 1)).alias(f"__n_{k}"),
            F.sum(xg).alias(f"__sx_{k}"),
            F.sum(yg).alias(f"__sy_{k}"),
            F.sum(xg * yg).alias(f"__sxy_{k}"),
            F.sum(xg * xg).alias(f"__sxx_{k}"),
            F.sum(yg * yg).alias(f"__syy_{k}"),
        ]
    wide = df.agg(*aggs)
    # tall shape via an exploded struct array off the ONE aggregate row — a
    # per-pair union would replay the aggregate (and its scan) per pair
    structs = []
    for x, y in pairs:
        k = f"{x}__{y}"
        n = F.col(f"__n_{k}").cast("double")
        sx = F.col(f"__sx_{k}").cast("double")
        sy = F.col(f"__sy_{k}").cast("double")
        sxy = F.col(f"__sxy_{k}").cast("double")
        sxx = F.col(f"__sxx_{k}").cast("double")
        syy = F.col(f"__syy_{k}").cast("double")
        denom = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        r = F.when(
            denom > 0,
            F.floor((n * sxy - sx * sy) / denom * F.lit(1e6)) / F.lit(1e6),
        )
        structs.append(
            F.struct(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                F.col(f"__n_{k}").alias("n"),
                r.alias("r"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("__p")).select(
        "__p.col_x", "__p.col_y", "__p.n", "__p.r"
    )


def group_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    z_threshold: float = 3.0,
    round_dp: int = 4,
) -> DataFrame:
    """Per-group z-score outliers: rows whose value sits more than
    ``z_threshold`` population standard deviations from their group mean —
    the workhorse numeric-cleaning gate. Output: all input columns +
    ``z`` (4 dp floor).

    Scale: ONE pass for the per-group (n, Σx, Σx²) moments (map-side
    combinable), the tiny moment table joined back (AQE broadcasts it when
    small), scoring map-only. Determinism: moments are per-row-ROUNDed
    DECIMAL sums (exact) cast to identical doubles; z is computed with one
    fixed expression shape and IEEE sqrt, so the filter and the emitted z
    are bit-stable cross-engine.
    """
    group_cols = list(group_cols)
    xv = F.round(F.col(value_col).cast("double"), round_dp).cast("decimal(19,6)")
    stats = df.groupBy(*group_cols).agg(
        F.count(F.when(F.col(value_col).isNotNull(), 1)).alias("__n"),
        F.sum(xv).alias("__sx"),
        F.sum(xv * xv).alias("__sxx"),
    )
    joined = df.join(stats, group_cols)
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    mean = sx / n
    var = sxx / n - mean * mean
    x = F.round(F.col(value_col).cast("double"), round_dp)
    z = (x - mean) / F.sqrt(var)
    return (
        joined.where(
            (F.col("__n") > 1) & (var > 0) & (F.abs(z) >= F.lit(z_threshold))
        )
        .withColumn("z", F.floor(z * F.lit(1e4)) / F.lit(1e4))
        .drop("__n", "__sx", "__sxx")
    )


def robust_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: float = 5.0,
    resolution: float = 0.01,
) -> DataFrame:
    """Per-group MEDIAN/MAD outliers — the skew-robust companion to
    ``group_outliers``: a value is flagged when its distance from the group
    median exceeds ``k`` × MAD (median absolute deviation). Unlike
    mean/stddev, neither statistic is dragged by the outliers themselves —
    the estimator of choice for heavy-tailed telemetry.

    Medians are computed at histogram resolution WITHOUT a per-group sort
    (the same distributed-quantile pattern as ``text.perplexity_bands``):
    values bin at ``resolution`` granularity, one tiny (group, bin) count
    aggregate cumulates over bins (a window over bins, not rows), the
    median bin falls out of a conditional min; the MAD repeats the trick
    on the |bin − median| histogram derived from the same counts. All
    post-binning arithmetic is integer-exact, so results are bit-stable
    cross-engine; median/MAD are reported at bin granularity
    (``bin · resolution``) — the standard trade of distributed quantiles.

    Scale posture (100 TB): one (group, bin) shuffle (map-side combined);
    both cumulative windows run over the bin histogram (bounded by value
    range / resolution, not row count); the per-group (median, MAD) table
    broadcasts back for map-only flagging. Output: all input columns +
    ``med``, ``mad``, ``is_outlier``.
    """
    from pyspark.sql import Window

    group_cols = list(group_cols)
    scale = 1.0 / resolution
    b = df.where(F.col(value_col).isNotNull()).withColumn(
        "__bin", F.floor(F.col(value_col).cast("double") * scale).cast("long")
    )
    hist = b.groupBy(*group_cols, "__bin").agg(F.count(F.lit(1)).alias("__c"))
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(F.asc("__bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*group_cols)
    cum = hist.withColumn("__cum", F.sum("__c").over(wcum)).withColumn(
        "__n", F.sum("__c").over(wall)
    )
    # median bin: SMALLEST bin whose ascending cumulative reaches ceil(n/2)
    med = cum.groupBy(*group_cols).agg(
        F.min(
            F.when(
                F.col("__cum") >= F.floor((F.col("__n") + 1) / 2),
                F.col("__bin"),
            )
        ).alias("__med")
    )
    # MAD: same trick on the |bin - med| histogram (derived, no new scan)
    dev = (
        hist.join(med, group_cols)
        .withColumn("__d", F.abs(F.col("__bin") - F.col("__med")))
        .groupBy(*group_cols, "__med", "__d")
        .agg(F.sum("__c").alias("__c"))
    )
    wdev = (
        Window.partitionBy(*group_cols)
        .orderBy(F.asc("__d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mad = (
        dev.withColumn("__cum", F.sum("__c").over(wdev))
        .withColumn("__n", F.sum("__c").over(wall))
        .groupBy(*group_cols, "__med")
        .agg(
            F.min(
                F.when(
                    F.col("__cum") >= F.floor((F.col("__n") + 1) / 2),
                    F.col("__d"),
                )
            ).alias("__mad")
        )
    )
    out = b.join(F.broadcast(mad), group_cols)
    flag = F.abs(F.col("__bin") - F.col("__med")) > F.lit(float(k)) * F.col("__mad")
    return (
        out.select(
            *df.columns,
            (F.col("__med") / F.lit(scale)).alias("med"),
            (F.col("__mad") / F.lit(scale)).alias("mad"),
            flag.alias("is_outlier"),
        )
    )
