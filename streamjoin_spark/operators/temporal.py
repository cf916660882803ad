"""Temporal joins: as-of join and banded range join.

Beyond the reference surface (SURVEY.md §2 — the reference's only join
shapes are equi/theta inner/left/right, elzyme/joins.py:322-326); these are
the time-series join primitives Spark itself lacks as built-ins, expressed
as compositions of DataFrame ops (no UDFs, no mapPartitions).

Scale posture (100 TB / 1000 executors):

- ``asof_join`` uses the union-of-sides + ordered-window algorithm: ONE
  shuffle on the equality keys, then a linear per-partition scan carrying
  the latest right-side row forward. No range predicate ever reaches a
  join, so Catalyst can't fall back to broadcast-nested-loop / O(n·m)
  per-key behavior. Skew is bounded by per-key row counts (same bound as
  any window function); neither side is broadcast or replicated.
- ``range_join`` bands the numeric axis into fixed-width buckets: the left
  interval explodes to the few buckets it spans, the right point maps to
  exactly one, and the join runs on (keys, bucket) — a plain shuffled
  equi-join with the exact predicate applied after. Each matching pair
  meets in exactly one bucket (the point's), so no dedup is needed.
  Bucket width should be chosen ≈ the typical interval length so the
  explode factor stays at 1-2.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    how: str = "left",
    tolerance: float | None = None,
    right_order: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.right_ts <= left.left_ts`` and equal ``on`` keys (backward
    as-of, inclusive — DuckDB/pandas ``ASOF JOIN`` semantics).

    ``tolerance`` (seconds) nulls out matches older than the window.
    ``right_order`` breaks ties between right rows sharing (keys, ts) —
    the highest value wins; without it such ties are resolved arbitrarily.
    ``how`` is 'left' (unmatched left rows kept, right columns null) or
    'inner'. Right payload columns that clash with a left column name get
    ``suffix`` appended.

    Algorithm: tag both sides, union by name, and over a window partitioned
    by the keys and ordered by (ts, side right-before-left, tiebreak) carry
    ``last(right_struct, ignorenulls=True)`` forward; right rows at the
    same timestamp as a left row sort first, implementing the inclusive
    bound. The whole right payload travels as ONE struct so a legitimately
    NULL field in the matched row is not papered over by an older non-null
    value.
    """
    on = list(on)
    right_ts = right_ts or left_ts
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")

    payload = [c for c in right.columns if c not in on]
    if right_ts not in payload:
        raise ValueError(f"right_ts column {right_ts!r} must be a right payload column")
    out_names = {c: (c + suffix if c in left.columns else c) for c in payload}

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in payload) + ">"
        ).alias("__r"),
    )
    rhs = right.select(
        *[F.col(c) for c in on],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload]).alias("__r"),
    )

    order = [F.asc("__ts"), F.asc("__side")]
    if right_order:
        order.append(F.asc_nulls_first(F.when(F.col("__side") == 0, F.col("__r")[right_order])))
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    matched = (
        lhs.unionByName(rhs)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    if tolerance is not None:
        in_tol = (
            F.col("__ts").cast("double") - F.col("__m")[right_ts].cast("double")
        ) <= F.lit(float(tolerance))
        matched = matched.withColumn("__m", F.when(in_tol, F.col("__m")))
    if how == "inner":
        matched = matched.where(F.col("__m").isNotNull())

    return matched.select(
        *[F.col(c) for c in left.columns],
        *[F.col("__m")[c].alias(out_names[c]) for c in payload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    lower: str,
    upper: str,
    point: str,
    bucket_width: float,
    include_lower: bool = True,
    include_upper: bool = True,
) -> DataFrame:
    """Interval-point range join: left rows carry a numeric interval
    [``lower``, ``upper``], right rows a numeric ``point``; output pairs
    with equal ``keys`` and the point inside the interval (bound
    inclusivity per flags). Timestamps should be pre-cast to double epoch
    seconds by the caller.

    Banding turns the range predicate into an equi-join: left explodes to
    the bucket span of its interval (rows with upper < lower are dropped —
    also keeps ANSI-mode ``sequence()`` safe), right maps to one bucket,
    and the exact predicate filters after the (keys, bucket) equi-join.
    Output columns = left columns + right columns (keys coalesced);
    non-key column names must not clash — pre-project the inputs.
    """
    keys = list(keys)
    clash = {c for c in left.columns if c not in keys} & {
        c for c in right.columns if c not in keys
    }
    if clash:
        raise ValueError(f"non-key column name clash {sorted(clash)} — pre-rename")
    w = float(bucket_width)
    lb = F.floor(F.col(lower) / w).cast("long")
    ub = F.floor(F.col(upper) / w).cast("long")
    lhs = (
        left.where(F.col(upper) >= F.col(lower))
        .withColumn("__bucket", F.explode(F.sequence(lb, ub)))
        # partition the probe side on the join key up front: distributes the
        # candidate filtering even when the build side is broadcast, and the
        # exchange is reusable if the planner picks a shuffled join instead.
        # The explicit count pins the parallelism — AQE would otherwise
        # coalesce a byte-small exchange to one task and serialize the
        # per-candidate predicate work.
        .repartition(
            left.sparkSession.sparkContext.defaultParallelism, *keys, "__bucket"
        )
    )
    rhs = right.withColumn("__bucket", F.floor(F.col(point) / w).cast("long"))
    lo_ok = F.col(point) >= F.col(lower) if include_lower else F.col(point) > F.col(lower)
    hi_ok = F.col(point) <= F.col(upper) if include_upper else F.col(point) < F.col(upper)
    return lhs.join(rhs, keys + ["__bucket"]).where(lo_ok & hi_ok).drop("__bucket")


def gap_fill(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    step,
    agg_cols: Sequence[str],
    fill: str = "ffill",
) -> DataFrame:
    """Densify a per-key regular time series and fill the gaps: for every
    key, emit one row per ``step`` between that key's min and max
    ``time_col``; rows absent from the input get NULL measures, then
    ``fill='ffill'`` carries the last observed value forward (Pandas
    ``ffill`` / InfluxDB ``fill(previous)`` analog; ``fill='none'`` keeps
    the NULLs). ``step`` is a Column interval (e.g. ``F.expr("INTERVAL 1
    HOUR")``) for timestamp axes or a numeric literal for numeric axes.
    Adds ``is_gap`` (true for generated rows).

    Scale posture: the spine is built per-key from that key's own bounds
    (`groupBy` min/max — map-side combinable) and exploded key-locally, so
    spine size is Σ_key span/step — never global-range × keys. The fill is
    an ordered per-key window: ONE shuffle on the keys shared by the
    spine-join and the window. ANSI-safe: min <= max by construction, so
    ``sequence()`` cannot get a negative range.

    ``is_gap`` comes from a join-presence marker, not from a measure
    column: a genuine input row whose first measure is NULL is a real
    observation (is_gap=false), while a generated spine row has no match
    (marker NULL ⇒ is_gap=true). ffill still fills genuine NULL measures
    — Pandas ffill semantics — but never mislabels them as gaps.
    """
    keys = list(keys)
    agg_cols = list(agg_cols)
    bounds = df.groupBy(*keys).agg(
        F.min(time_col).alias("__lo"), F.max(time_col).alias("__hi")
    )
    spine = bounds.select(
        *keys,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step)).alias(time_col),
    )
    marked = df.withColumn("__present", F.lit(True))
    joined = (
        spine.join(marked, keys + [time_col], "left")
        .withColumn("is_gap", F.col("__present").isNull())
        .drop("__present")
    )
    if fill == "ffill":
        w = (
            Window.partitionBy(*keys)
            .orderBy(time_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in agg_cols:
            joined = joined.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return joined


def merge_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    order_col: str,
) -> DataFrame:
    """Union overlapping/touching intervals per key — the overlap-based
    sibling of gap-based sessionization (coverage spans, availability
    windows, span dedup). An interval joins the running group when its
    start is <= the max end seen so far; otherwise it opens a new group.

    Output: key cols + ``interval_start``, ``interval_end``, ``n_spans``.

    Scale posture: one key-partitioned ordered window (running max-end via
    ROWS UNBOUNDED PRECEDING — no self-join, no explode) + one groupBy on
    the same key partitioning; ``order_col`` breaks start/end ties so the
    grouping is deterministic under any partitioning. Never a global sort.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(
        F.asc(start_col), F.asc(end_col), F.asc(order_col)
    )
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(prev_max_end >= F.col(start_col), F.lit(0)).otherwise(F.lit(1))
    grp = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        df.select(*keys, start_col, end_col, order_col)
        .withColumn("__grp", grp)
        .groupBy(*keys, "__grp")
        .agg(
            F.min(start_col).alias("interval_start"),
            F.max(end_col).alias("interval_end"),
            F.count(F.lit(1)).alias("n_spans"),
        )
        .drop("__grp")
    )


def ewma(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.3,
    window: int = 8,
) -> DataFrame:
    """Trailing exponentially-weighted moving average per key: for each row,
    EWMA over the last ``window`` observations ordered by ``order_cols``,
    weight ``alpha·(1-alpha)^d`` at distance ``d`` from the current row,
    normalized over the weights actually present (so early partial windows
    are unbiased) — the standard smoothing/anomaly-baseline primitive for
    event streams.

    Cross-engine determinism: the weights are PRECOMPUTED IN PYTHON and
    injected as the same double literals into both the Spark expression and
    any SQL twin — ``pow()`` is not correctly-rounded and may drift a ulp
    between libm implementations, literals cannot. The weighted sum is a
    strict left fold from 0.0 (DuckDB twin: ``list_reduce``, whose
    first-element seeding is exact-equal because 0.0 + x == x); the final
    normalization is division-derived → FLOOR-canonicalized at 6 dp.

    Scale posture (100 TB): one shuffle on ``key_cols`` for the window; the
    trailing frame materializes at most ``window`` values per row
    (bounded state per task, no per-key explosion); everything after the
    window is map-only codegen over small arrays. Output: key cols, order
    cols, value, ``ewma``.
    """
    from pyspark.sql import Window

    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    weights = [alpha * (1.0 - alpha) ** d for d in range(window)]
    warr = F.array(*[F.lit(w) for w in weights])
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(-(window - 1), 0)
    )
    # trailing list is oldest→newest; element at 0-based index i of a
    # list of size s sits at distance s-1-i from the current row
    vals = F.collect_list(F.col(value_col).cast("double")).over(w)
    base = df.select(*key_cols, *order_cols, value_col, vals.alias("__vals"))
    s = F.size("__vals")
    terms = F.transform(
        F.col("__vals"),
        lambda x, i: x * F.element_at(warr, s - i),
    )
    wsum = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    norm = F.aggregate(
        F.slice(warr, 1, s), F.lit(0.0), lambda acc, x: acc + x
    )
    return base.select(
        *key_cols,
        *order_cols,
        value_col,
        (F.floor(wsum / norm * F.lit(1e6)) / F.lit(1e6)).alias("ewma"),
    )


def hopping_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: "Sequence[str]" = ("event_type",),
    value_col: str = "value",
    size_s: int = 3600,
    slide_s: int = 900,
) -> DataFrame:
    """Hopping (sliding) window rollup — the overlapping-window companion
    to the tumbling rollup: each event lands in every ``size_s``-second
    window whose epoch-aligned start lies within ``size_s`` of it, windows
    starting every ``slide_s`` seconds (Spark's ``F.window(size, slide)``
    semantics, materialized explicitly so the fan-out and the oracle are
    exact).

    Emits ``window_start`` as epoch SECONDS (BIGINT) — integer window
    arithmetic is bit-exact cross-engine, where timestamp-typed window
    bounds invite tz-semantics drift. Fan-out per row is
    ``ceil(size/slide)`` (here 4), filtered so partial trailing windows
    drop nothing: a window qualifies iff ``start + size > ts``.

    Scale posture (100 TB): the explode is map-only off the scan with a
    constant fan-out; the single shuffle is the (window, group) aggregate,
    map-side combined. Sums follow the float invariant (per-row-rounded
    DECIMAL). ANSI note: ``sequence(0, n-1)`` has constant positive
    bounds — no guard needed.
    """
    if size_s <= 0 or slide_s <= 0 or size_s < slide_s:
        raise ValueError("need size_s >= slide_s > 0")
    import math

    nwin = math.ceil(size_s / slide_s)
    epoch = F.unix_timestamp(F.col(ts_col))
    base = (F.floor(epoch / slide_s) * slide_s).cast("long")
    starts = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(nwin - 1)),
            lambda k: base - k.cast("long") * slide_s,
        ),
        lambda s: s + size_s > epoch,
    )
    return (
        df.select(
            *group_cols,
            F.col(value_col),
            F.explode(starts).alias("window_start"),
        )
        .groupBy("window_start", *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col(value_col), 4).cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
