"""Ordered-funnel conversion analysis over an event stream.

Beyond the reference surface: the classic product-analytics funnel ("did
the user do A, then B strictly after A, then C strictly after B?"), the
kind of query a training-data pipeline's telemetry side runs constantly.
Semantics match the standard strict-order funnel: a user converts to step
i+1 at the EARLIEST event of that type after their step-i conversion time.

Scale posture (100 TB): each step is one user-key equi-join against the
previous step's (user, ts) frame followed by a partial-aggregated MIN —
every shuffle in the chain is on the same user key, so the exchange is
reused across steps rather than re-planned; no window over the raw event
stream, no collect. The final conversion-rate division joins the k-row
step-count frame with a 1-row broadcast base — the event stream is touched
once per step, filtered by event type at the scan (predicate pushdown).

Conversion rates are division-derived → FLOOR-canonicalized at 6 dp per
the repo float invariant.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel"]


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strict-order funnel over ``steps``. Output (one row per step):
    ``step_idx`` (1-based int), ``step``, ``users`` (long), ``conv_rate``
    (share of step-1 users, FLOOR-canonicalized)."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    stages: list[DataFrame] = []
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(ts_col).alias("__t"))
    )
    stages.append(cur)
    for s in steps[1:]:
        prev = cur.select("__u", F.col("__t").alias("__pt"))
        cur = (
            events.where(F.col(type_col) == s)
            .select(F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts"))
            .join(prev, "__u")
            .where(F.col("__ts") > F.col("__pt"))
            .groupBy("__u")
            .agg(F.min("__ts").alias("__t"))
        )
        stages.append(cur)
    tall = None
    for i, (name, st) in enumerate(zip(steps, stages), 1):
        c = st.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(i).alias("step_idx"), F.lit(name).alias("step"), "users"
        )
        tall = c if tall is None else tall.unionByName(c)
    base = stages[0].agg(F.count(F.lit(1)).alias("__base"))
    return (
        tall.crossJoin(F.broadcast(base))
        .select(
            "step_idx",
            "step",
            "users",
            (
                F.floor(
                    F.col("users").cast("double") / F.col("__base") * F.lit(1e6)
                )
                / F.lit(1e6)
            ).alias("conv_rate"),
        )
        .orderBy("step_idx")
    )
