"""Dataset profiling operators — the ANALYZE TABLE / data-quality pass of
a pipeline: per-column statistics and value histograms.

Beyond the reference surface. Everything is a single aggregation pass in
built-in Column expressions (map-side combined, no Python), so profiling a
100 TB table costs one scan; the unpivot to long form happens on the 1-row
aggregate, not on data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "histogram"]


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
