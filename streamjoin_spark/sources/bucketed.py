"""Bucketed tables for shuffle-free co-located joins.

The reference never co-locates its two sides — every microbatch join
broadcasts the delta (elzyme/joins.py:310-316), which is the right call for
delta-sized frames but not for the *batch twins* of fact-to-fact joins. At
100 TB, two fact tables repeatedly joined on the same key should be written
bucketed on that key: both scans then report the same hash partitioning and
Catalyst elides the exchange entirely (SortMergeJoin with no shuffle on
either side).

Spark constraint: bucketing metadata lives in the session catalog, so these
write via ``saveAsTable`` (parquet + catalog entry), not plain paths.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int = 32,
    sort_by: Sequence[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed catalog table.

    ``n_buckets`` should divide evenly into the cluster's parallelism and
    keep each bucket file in the hundreds of MB at target scale (100 TB /
    32 buckets is far too coarse — size it per deployment; the join only
    avoids its shuffle when BOTH sides share bucket count and keys).
    """
    w = (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(n_buckets, *bucket_by)
    )
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def cobucketed_join_ready(
    spark: SparkSession, left_table: str, right_table: str
) -> bool:
    """True when both catalog tables are bucketed compatibly (same bucket
    count — the precondition for an exchange-free join). Inspect with
    ``DESCRIBE TABLE EXTENDED``; a production deployment would also compare
    bucket columns."""

    def bucket_info(t: str) -> str | None:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect()
        for r in rows:
            if r.col_name == "Num Buckets":
                return r.data_type
        return None

    lb, rb = bucket_info(left_table), bucket_info(right_table)
    return lb is not None and lb == rb
