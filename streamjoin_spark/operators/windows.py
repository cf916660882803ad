"""Ordered window analytics: rolling and cumulative aggregates.

The reference uses windows internally only (ranking for dedup/merge
resolution, elzyme/joins.py:388-395, 556-561 — our J6/W1 parity lives in
``operators.dedup.latest_per_key``). This module adds the *user-facing*
ordered analytics a training-data / event pipeline needs: per-key rolling
aggregates (moving averages, sliding sums) and cumulative running totals.

Scale posture (100 TB): one shuffle on the partition keys, then a single
sort per partition — Spark's WindowExec streams frames without
materializing per-row copies for SUM/AVG/MIN/MAX/COUNT (running-frame
accumulation). Keys must be provided: an empty ``partition_by`` would pull
every row into one task, so we refuse it rather than silently serialize.
All expressions are built-in Column ops (whole-stage codegen).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _ordered_window(partition_by: Sequence[str], order_by: Sequence[str]):
    if not partition_by:
        raise ValueError(
            "partition_by is required: a global ordered window moves every "
            "row to a single task (WindowExec warning) — repartition by a "
            "key or bucket the order column instead"
        )
    if not order_by:
        raise ValueError("order_by is required for deterministic frames")
    return Window.partitionBy(*partition_by).orderBy(
        *[F.asc(c) for c in order_by]
    )


def rolling_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    aggs: Mapping[str, tuple[str, Column]],
    preceding: int = 2,
    following: int = 0,
) -> DataFrame:
    """Sliding-frame aggregates over the ``preceding``..``following`` row
    frame around each row (ROWS frame: deterministic given a total
    per-partition order — include a unique tiebreaker in ``order_by``).

    ``aggs`` maps output column name → (fn_name, input Column), fn_name in
    {sum, avg, min, max, count}.
    """
    w = _ordered_window(partition_by, order_by).rowsBetween(
        -preceding, following
    )
    out = df
    for name, (fn, col) in aggs.items():
        out = out.withColumn(name, getattr(F, fn)(col).over(w))
    return out


def cumulative_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    aggs: Mapping[str, tuple[str, Column]],
) -> DataFrame:
    """Running totals from the partition start to the current row."""
    w = _ordered_window(partition_by, order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = df
    for name, (fn, col) in aggs.items():
        out = out.withColumn(name, getattr(F, fn)(col).over(w))
    return out


def lag_lead_features(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    lags: Sequence[int] = (1,),
    leads: Sequence[int] = (1,),
) -> DataFrame:
    """Per-key lag/lead feature engineering — the standard temporal
    feature-prep pass before model training: for every row, the previous /
    next values of ``value_col`` within its key at the given offsets, plus
    the delta vs lag 1 (``{col}_delta``). NULL where the offset runs off
    the partition edge (no default fill — imputation is a modeling choice).

    ``order_by`` must be a deterministic total order within each partition
    (e.g. ts then a unique id) or results are run-dependent. Deltas are
    SUBTRACTION-derived, not division: exact on identical doubles, no
    canonicalization needed.

    Scale: one partitioned window over ``partition_by`` — a single
    key-shuffle, frames bounded by max(lags, leads). Mandatory partition
    keys, as everywhere in this module (an unpartitioned ordered window is
    a single-task global sort).
    """
    if not partition_by:
        raise ValueError("partition_by is required (global sort otherwise)")
    w = _ordered_window(partition_by, order_by)
    out = df
    for n in lags:
        out = out.withColumn(
            f"{value_col}_lag{n}", F.lag(value_col, n).over(w)
        )
    for n in leads:
        out = out.withColumn(
            f"{value_col}_lead{n}", F.lead(value_col, n).over(w)
        )
    if 1 in lags:
        out = out.withColumn(
            f"{value_col}_delta",
            F.col(value_col) - F.col(f"{value_col}_lag1"),
        )
    return out
