"""Native Structured Streaming stateful operators.

The engine's core incremental path is storage-backed IVM (incremental.py) —
watermark-free, like the reference. This module is the *other* half of the
Spark streaming surface: operators whose state lives in Spark's state store,
for pipelines that want classic Structured Streaming semantics instead of a
changelog substrate.

- ``streaming_sessionize``: custom stateful sessionization via
  ``applyInPandasWithState`` — per-key session state (gap-based), updated
  session aggregates emitted every microbatch, state recovered from the
  checkpoint across restarts.
- ``windowed_rollup_stream``: event-time tumbling-window aggregation with a
  watermark (late data beyond the watermark dropped — the standard Spark
  trade; the IVM path handles unbounded lateness instead).

Scale posture: both operators shuffle once on the grouping key; state is
per-key and bounded (a handful of scalars per user / per open window).
Arrival order is assumed to respect event time per key within the stream
(true for changelog commits, which are ts-ordered); for fully out-of-order
data use the batch twin (operators: sessionize via windows) or the IVM path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = (
    "user_id long, session_seq integer, n_events long, "
    "session_value double, session_start double, last_ts double"
)
SESSION_STATE = (
    "last_ts double, session_seq integer, n_events long, "
    "session_value double, session_start double"
)


def _session_fn(gap_s: float):
    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            last_ts, seq, n, val, start = state.get
        else:
            last_ts, seq, n, val, start = None, 0, 0, 0.0, None
        batch = pd.concat(list(pdfs)).sort_values("ts")
        touched: dict[int, tuple] = {}
        for ts, v in zip(batch["ts"], batch["value"]):
            ts = float(ts)
            if last_ts is None or ts - last_ts > gap_s:
                seq += 1
                n, val, start = 0, 0.0, ts
            n += 1
            val += float(v)
            last_ts = ts
            touched[seq] = (n, val, start, ts)
        state.update((last_ts, seq, n, val, start))
        yield pd.DataFrame(
            [
                {
                    "user_id": user,
                    "session_seq": s,
                    "n_events": c,
                    "session_value": sv,
                    "session_start": st,
                    "last_ts": lt,
                }
                for s, (c, sv, st, lt) in touched.items()
            ]
        )

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_s: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization over a streaming DataFrame. Emits the
    *updated* per-session aggregates each microbatch ('update' semantics —
    sink latest-per-(user, session_seq) to reconcile). ``ts`` is handled as
    epoch seconds inside the state function (state-store schemas are
    simplest with scalars)."""
    src = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("double").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_s),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(
    events: DataFrame,
    keys: tuple[str, ...],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """In-flight exactly-once-per-key dedup over a stream: keeps the first
    arrival per key, dropping re-deliveries that arrive within the
    watermark horizon (``dropDuplicatesWithinWatermark`` — state per key is
    evicted once the watermark passes, so memory is bounded by key-rate ×
    horizon rather than stream history). The standard guard in front of an
    at-least-once ingestion feed.

    Re-deliveries later than the watermark pass through (documented Spark
    trade); the changelog substrate's keyed MERGE is the unbounded-history
    alternative (ChangeTable.merge dedups by primary key forever).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_s: int = 0,
    upper_s: int = 3600,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join — the attribution-style
    native Structured Streaming operator (click → purchase within a time
    window): matches ``left.on == right.on`` with ``right_ts`` in
    ``[left_ts + lower_s, left_ts + upper_s]`` seconds.

    Both inputs get the same watermark; with the time-range condition Spark
    bounds each side's join state to the watermark + interval horizon
    (state-store cleanup — without the range condition a stream-stream join
    buffers forever). ``how``: inner or leftOuter (outer rows emit once the
    watermark passes the interval's upper bound).

    Scale: one shuffle per side on ``on``; per-key state bounded by the
    event-rate × horizon. This is the classic Spark trade — rows later than
    the watermark are dropped; the storage-backed IVM path
    (streaming/incremental.py) is the unbounded-lateness alternative.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.`{on}`") == F.col(f"r.`{on}`"))
        & (
            F.col(f"r.`{right_ts}`")
            >= F.col(f"l.`{left_ts}`") + F.expr(f"INTERVAL {int(lower_s)} SECONDS")
        )
        & (
            F.col(f"r.`{right_ts}`")
            <= F.col(f"l.`{left_ts}`") + F.expr(f"INTERVAL {int(upper_s)} SECONDS")
        )
    )
    return l.join(r, cond, how)


def windowed_rollup_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Event-time tumbling-window rollup with a watermark — the Structured
    Streaming twin of the batch ``events_hourly_rollup`` query. Late rows
    beyond the watermark are dropped (documented Spark semantics); the IVM
    path is the no-data-loss alternative."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), *group_cols,
            "n_events", "sum_value",
        )
    )


def session_window_rollup_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Gap-based session aggregation via the *built-in* merging session
    window (``F.session_window``) — the declarative, JVM-side twin of
    ``streaming_sessionize``. Spark's state store merges overlapping
    windows as late-but-in-watermark rows arrive, so unlike the
    ``applyInPandasWithState`` sessionizer this one tolerates out-of-order
    arrival within the watermark horizon, at the cost of emitting only
    *closed* sessions (append semantics) rather than per-microbatch
    updates.

    Works identically on batch frames (session_window is a plain groupBy
    there) — the convergence tests exploit that.

    Scale: one shuffle on (key, session_window); state per open session
    only, expired by the watermark. No Python in the pipeline.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), *key_cols
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("session_value"),
        )
        .select(
            *key_cols,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events", "session_value",
        )
    )
