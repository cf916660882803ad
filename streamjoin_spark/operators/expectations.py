"""Data-quality expectations: declarative row constraints with report /
enforce / quarantine actions.

The Delta Live Tables expectations analog (EXPECT ... ON VIOLATION DROP /
FAIL) for this engine's ecosystem — the reference (LeoneGarage/StreamJoin)
targets Databricks pipelines where DLT expectations are the standard
quality gate; here they work on any DataFrame and compose with `Stream`
transforms (a rule set is just a Column predicate per rule).

Scale posture (100 TB): `check` is ONE pass over the data — every rule
becomes a conditional-count aggregate in a single HashAggregate (no
per-rule scans, no shuffle beyond the 1-row final combine); `enforce` and
`quarantine` are map-only filters; `fk_check` is the one join-shaped rule
(left-anti against the parent key set — broadcastable when the parent is a
dimension). Violation rates are division-derived → FLOOR-canonicalized.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check", "enforce", "quarantine", "fk_check"]


def _as_col(rule) -> Column:
    return F.expr(rule) if isinstance(rule, str) else rule


def check(df: DataFrame, rules: Mapping[str, "str | Column"]) -> DataFrame:
    """Violation report, one row per rule: ``rule``, ``n_rows``,
    ``n_violations``, ``violation_rate`` (6 dp floor). A NULL rule result
    counts as a violation (ANSI three-valued logic made strict)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    names = list(rules)
    for name in names:
        passed = F.coalesce(_as_col(rules[name]).cast("boolean"), F.lit(False))
        aggs.append(
            F.sum(F.when(~passed, 1).otherwise(0)).alias(f"__v_{name}")
        )
    wide = df.agg(*aggs)
    # tall shape via an exploded struct array off the ONE aggregate row — a
    # per-rule union would replay the whole aggregate (and its scan) once
    # per rule in the physical plan
    kv = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(f"__v_{name}").alias("n_violations"),
                )
                for name in names
            ]
        )
    ).alias("__kv")
    return wide.select("n_rows", kv).select(
        F.col("__kv.rule").alias("rule"),
        "n_rows",
        F.col("__kv.n_violations").alias("n_violations"),
        (
            F.floor(
                F.col("__kv.n_violations").cast("double")
                / F.col("n_rows")
                * F.lit(1e6)
            )
            / F.lit(1e6)
        ).alias("violation_rate"),
    )


def enforce(
    df: DataFrame, rules: Mapping[str, "str | Column"], mode: str = "drop"
) -> DataFrame:
    """Apply rules to the rows. ``drop``: keep only rows passing every
    rule (map-only filter). ``mark``: keep all rows, adding a
    ``_violations`` array column naming the failed rules (empty = clean)."""
    if mode == "drop":
        cond = F.lit(True)
        for name in rules:
            cond = cond & F.coalesce(_as_col(rules[name]).cast("boolean"), F.lit(False))
        return df.where(cond)
    if mode == "mark":
        marks = F.array_compact(
            F.array(
                *[
                    F.when(
                        ~F.coalesce(
                            _as_col(rules[name]).cast("boolean"), F.lit(False)
                        ),
                        F.lit(name),
                    )
                    for name in rules
                ]
            )
        )
        return df.withColumn("_violations", marks)
    raise ValueError(f"unknown mode {mode!r} (use 'drop' or 'mark')")


def quarantine(
    df: DataFrame, rules: Mapping[str, "str | Column"]
) -> tuple[DataFrame, DataFrame]:
    """Split into (good, bad): good rows pass every rule; bad rows carry
    the ``_violations`` array. Both sides are map-only filters over the
    same marked plan — at scale write `bad` to a quarantine path and feed
    `good` onward (the DLT quarantine-table pattern)."""
    marked = enforce(df, rules, mode="mark")
    good = marked.where(F.size("_violations") == 0).drop("_violations")
    bad = marked.where(F.size("_violations") > 0)
    return good, bad


def fk_check(
    child: DataFrame,
    parent: DataFrame,
    keys: Sequence[str] | Mapping[str, str],
    broadcast_parent: bool = True,
) -> DataFrame:
    """Referential-integrity rule: child rows whose key tuple is absent
    from the parent (NULL keys excluded — SQL FK semantics). Returns the
    orphan rows. ``keys``: child cols, or {child_col: parent_col}.

    The parent side is projected to its key columns and deduplicated
    before the anti-join; broadcast it when the parent is dimension-sized
    (the default), else let it shuffle (set broadcast_parent=False).
    """
    if isinstance(keys, Mapping):
        pairs = list(keys.items())
    else:
        pairs = [(k, k) for k in keys]
    pkeys = parent.select(
        *[F.col(p).alias(c) for c, p in pairs]
    ).dropDuplicates([c for c, _ in pairs])
    if broadcast_parent:
        pkeys = F.broadcast(pkeys)
    non_null = child
    for c, _ in pairs:
        non_null = non_null.where(F.col(c).isNotNull())
    return non_null.join(pkeys, [c for c, _ in pairs], "left_anti")
