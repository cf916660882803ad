"""Data-layout operators: Z-order clustering keys (OPTIMIZE ZORDER analog).

Multi-dimensional clustering for scan pruning: rows close in Z-order are
close in every interleaved dimension, so range-partitioned files carry
tight min/max stats on ALL the clustered columns at once — point/range
predicates on any of them prune files, not just the lead sort key.

Everything is integer/double Column arithmetic (codegen, deterministic
across engines); the normalization min/max pass is one aggregation whose
1-row result broadcasts back.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "with_zorder_key", "repartition_by_zorder",
           "hilbert_level_exprs", "with_hilbert_key",
           "zone_map", "prune_zones"]


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` of each (already 0..2^bits-1 normalized)
    integer column into one Z-value: bit *i* of column *j* lands at
    position ``i·n_cols + j``. Pure shift/mask expression tree — 2·bits·n
    JVM ops inside whole-stage codegen, no UDF."""
    n = len(cols)
    parts = []
    for j, c in enumerate(cols):
        for i in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)),
                    i * n + j,
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "z_key",
) -> DataFrame:
    """Attach a Z-order key over ``cols``: each column is min/max-normalized
    to ``[0, 2^bits)`` (one aggregation pass, 1-row broadcast back), then
    bit-interleaved. Constant columns map to bucket 0.

    Scale: one scan for the min/max, one map-only pass for the key; the
    typical follow-up is ``repartitionByRange(out_col)`` + write, giving
    every file tight min/max zones on all clustered columns.
    """
    top = (1 << bits) - 1
    stats = df.agg(
        *[
            m
            for c in cols
            for m in (
                F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
            )
        ]
    )
    bucketed = []
    for c in cols:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        x = F.col(c).cast("double")
        b = F.when(hi == lo, F.lit(0)).otherwise(
            F.least(
                F.floor((x - lo) / (hi - lo) * F.lit(float(top + 1))),
                F.lit(top),
            )
        )
        bucketed.append(b.cast("long").alias(f"__b_{c}"))
    keyed = df.join(F.broadcast(stats)).select(df["*"], *bucketed)
    z = zorder_key([F.col(f"__b_{c}") for c in cols], bits=bits)
    return keyed.select(df["*"], z.alias(out_col))


def repartition_by_zorder(
    df: DataFrame, cols: list[str], n_partitions: int, bits: int = 16
) -> DataFrame:
    """Range-partition by the Z-key (each output file = one contiguous
    Z-range = a tight hyper-rectangle in the clustered dimensions), key
    column dropped after partitioning."""
    keyed = with_zorder_key(df, cols, bits=bits)
    return keyed.repartitionByRange(n_partitions, F.col("z_key")).drop("z_key")


def zone_map(
    df: DataFrame,
    zone_col: str,
    stat_cols: list[str],
) -> DataFrame:
    """Per-zone min/max/count statistics — the file-footer zone map the
    Z-order layout exists to sharpen (Delta/Iceberg/parquet keep exactly
    these per file; computing them per Z-range shows what the scan planner
    would see after ``repartition_by_zorder`` + write). One map-side
    combinable aggregation on the zone id; output is n_zones rows.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(zone_col).agg(*aggs)


def prune_zones(zmap: DataFrame, col: str, lo, hi) -> DataFrame:
    """Annotate a zone map with the data-skipping verdict for
    ``col BETWEEN lo AND hi``: a zone whose [min, max] envelope misses the
    predicate range is skipped without reading a row — min/max pruning,
    the mechanism behind `PushedFilters` actually saving I/O at 100 TB.
    Adds ``scan`` (boolean). Driver-free: the verdict is a Column
    expression over the (tiny) zone-map frame."""
    mn, mx = F.col(f"min_{col}"), F.col(f"max_{col}")
    return zmap.withColumn(
        "scan", ~((mx < F.lit(lo)) | (mn > F.lit(hi)))
    )


def hilbert_level_exprs(
    lvl: int, bits: int, hx: str = "hx", hy: str = "hy", hd: str = "hd"
) -> tuple[str, str, str]:
    """One Hilbert-curve iteration (classic xy2d, top bit ``lvl``) as THREE
    portable SQL strings — the same text is fed to Spark's ``F.expr`` and
    embedded in the DuckDB oracle CTE chain, so the two engines cannot
    drift. Pure integer ops: ``&`` bit-test, CASE quadrant code
    ((3·rx) XOR ry spelled as a CASE — ``^`` is POWER in DuckDB), and the
    reflect-then-swap rotation folded into two CASEs."""
    s = 1 << lvl
    n = 1 << bits
    rx = f"(CASE WHEN ({hx} & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN ({hy} & {s}) > 0 THEN 1 ELSE 0 END)"
    quad = (
        f"(CASE WHEN {rx} = 1 AND {ry} = 1 THEN 2"
        f" WHEN {rx} = 1 THEN 3 WHEN {ry} = 1 THEN 1 ELSE 0 END)"
    )
    hx_new = (
        f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
        f" THEN {n - 1} - {hy} ELSE {hy} END) ELSE {hx} END)"
    )
    hy_new = (
        f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
        f" THEN {n - 1} - {hx} ELSE {hx} END) ELSE {hy} END)"
    )
    hd_new = f"({hd} + {s * s} * {quad})"
    return hx_new, hy_new, hd_new


def with_hilbert_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out_col: str = "h_key",
) -> DataFrame:
    """Attach a 2-D Hilbert-curve clustering key: min/max-normalize both
    columns to ``[0, 2^bits)`` (one stats pass, 1-row broadcast back),
    then run ``bits`` unrolled xy2d iterations. The Hilbert curve's
    locality beats Z-order's (no Z-shape jumps: every curve step is a
    unit grid step), which is why Databricks liquid clustering moved to
    it — tighter file hyper-rectangles for the same sort.

    Scale: stats scan + ONE map-only projection chain (each level is a
    separate projection referencing the previous level's values more than
    once, so Catalyst keeps them chained instead of inlining an
    exponential expression); ``repartitionByRange(out_col)`` + write is
    the intended follow-up, same as Z-order.
    """
    if len(cols) != 2:
        raise ValueError("with_hilbert_key is the 2-D variant: pass 2 cols")
    top = (1 << bits) - 1
    stats = df.agg(
        *[
            m
            for c in cols
            for m in (
                F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
            )
        ]
    )
    bucketed = []
    for c in cols:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        x = F.col(c).cast("double")
        b = F.when(hi == lo, F.lit(0)).otherwise(
            F.least(
                F.floor((x - lo) / (hi - lo) * F.lit(float(top + 1))),
                F.lit(top),
            )
        )
        bucketed.append(b.cast("long"))
    cur = (
        df.join(F.broadcast(stats))
        .select(
            df["*"],
            bucketed[0].alias("__hx"),
            bucketed[1].alias("__hy"),
            F.lit(0).cast("long").alias("__hd"),
        )
    )
    for lvl in reversed(range(bits)):
        ex, ey, ed = hilbert_level_exprs(lvl, bits, "__hx", "__hy", "__hd")
        cur = cur.withColumns(
            {"__hx": F.expr(ex), "__hy": F.expr(ey), "__hd": F.expr(ed)}
        )
    return cur.drop("__hx", "__hy").withColumnRenamed("__hd", out_col)
