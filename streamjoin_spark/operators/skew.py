"""Skew mitigation: salted joins and two-phase (salted) aggregation.

Beyond the reference surface (its joins always broadcast the ≤1 GB
microbatch, elzyme/joins.py:310-314, so key skew never reaches a shuffle);
batch pipelines at 100 TB don't get that luxury. When a handful of hot keys
dominate a shuffled equi-join or aggregation, the tasks owning those keys
run for hours while the rest of the cluster idles. These operators spread
hot keys across ``n_salts`` sub-partitions; results are exactly the plain
join/aggregation results (salt choice never affects the output), so they
hash-check against unsalted SQL oracles.

When to reach for them (in preference order): (1) broadcast the small side
if it fits — no shuffle at all; (2) AQE skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``) which handles *detected* skew at
runtime; (3) these operators, when the skew is known ahead of time, the
build side is too big to broadcast, or the skew lives in an aggregation
(AQE's skew handling does not split aggregation partitions).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join resilient to hot keys on the probe side.

    Each probe row gets a deterministic pseudo-random salt (xxhash of the
    whole row, so a hot key's rows spread uniformly), the build side is
    replicated ``n_salts`` times, and the join runs on ``on + [salt]`` —
    turning one task per hot key into ``n_salts`` tasks. Cost: the build
    side shuffles ``n_salts``× (use only when it can't broadcast). Supports
    the probe-preserving join types; 'right'/'full' would need the salt on
    the other side — flip the arguments instead.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join preserves the probe side; how={how!r} is not — "
            "swap probe/build"
        )
    on = list(on)
    overlap = [c for c in probe.columns if c in build.columns and c not in on]
    if overlap:
        raise ValueError(f"non-key column name clash {overlap} — pre-rename")
    p = probe.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    )
    b = build.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return p.join(b, on + [SALT], how).drop(SALT)


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output name → (kind, input expression) with kind one of
    ``sum | count | min | max | avg``. Phase 1 aggregates on
    (group_cols, salt) — hot groups split into ``n_salts`` partial states
    computed in parallel; phase 2 combines partials per group (sum of sums,
    sum of counts, min of mins, …; avg = Σsum/Σcount so it recombines
    exactly). Output equals the plain ``groupBy().agg()`` result.

    Note Spark's hash aggregate already does map-side partial aggregation;
    the salted form matters when phase-2 cardinality per group is what
    skews — e.g. high-cardinality COUNT DISTINCT-style pipelines or
    low-memory final tasks. It is also the template for writing any
    algebraic aggregate as partial/combine.
    """
    group_cols = list(group_cols)
    kinds = {"sum", "count", "min", "max", "avg"}
    for name, (kind, _) in aggs.items():
        if kind not in kinds:
            raise ValueError(f"unsupported agg kind {kind!r} for {name!r}")

    salted = df.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )

    partials: list[Column] = []
    finals: list[Column] = []
    for name, (kind, expr) in aggs.items():
        if kind == "sum":
            partials.append(F.sum(expr).alias(f"__p_{name}"))
            finals.append(F.sum(f"__p_{name}").alias(name))
        elif kind == "count":
            partials.append(F.count(expr).alias(f"__p_{name}"))
            finals.append(F.sum(f"__p_{name}").alias(name))
        elif kind == "min":
            partials.append(F.min(expr).alias(f"__p_{name}"))
            finals.append(F.min(f"__p_{name}").alias(name))
        elif kind == "max":
            partials.append(F.max(expr).alias(f"__p_{name}"))
            finals.append(F.max(f"__p_{name}").alias(name))
        else:  # avg — recombine exactly from (sum, count)
            partials.append(F.sum(expr).alias(f"__ps_{name}"))
            partials.append(F.count(expr).alias(f"__pc_{name}"))
            finals.append(
                (F.sum(f"__ps_{name}") / F.sum(f"__pc_{name}")).alias(name)
            )

    phase1 = salted.groupBy(*group_cols, SALT).agg(*partials)
    return phase1.groupBy(*group_cols).agg(*finals)


def sample_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    n: int,
    id_cols: Sequence[str],
    seed: str = "sample",
) -> DataFrame:
    """Stratified sampling: exactly ``min(n, |stratum|)`` rows per stratum,
    chosen by a deterministic, engine-portable hash order (functions.hash64
    of the row ids) — stable across runs, engines, partitionings and
    physical row order, unlike ``DataFrame.sampleBy``. The workhorse for
    balanced training subsets and per-source eval slices.

    Scale: one shuffle on the strata columns; ``row_number`` streams within
    each stratum partition. A pathologically hot stratum serializes into
    one task's sort — pre-filter it by a hash-range bound first (keep rows
    with hash < k·n/|stratum| estimate) before the exact window.

    Oracle twin: ``ROW_NUMBER() OVER (PARTITION BY strata ORDER BY
    ('0x'||substr(md5(seed||id),1,15))::BIGINT, id) <= n``.
    """
    from pyspark.sql import Window

    from ..functions import hash64

    key = F.concat_ws("|", *[F.col(c).cast("string") for c in id_cols])
    h = hash64(key, seed=seed)
    w = Window.partitionBy(*group_cols).orderBy(
        h.asc(), *[F.asc(c) for c in id_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, int],
    seed: str = "",
) -> DataFrame:
    """Assign each row to a named split (train/val/test…) by a deterministic,
    engine-portable hash of its id — the standard reproducible holdout for
    training-data pipelines. ``weights`` are integer percentages summing to
    100; assignment = bucket of ``md5-hash64(seed‖id) mod 100`` (portable
    twin: functions.hash64). Stable across runs, engines, partitionings and
    cluster sizes — unlike ``DataFrame.randomSplit``, which is
    partition-dependent.
    """
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100, got {weights}")
    from ..functions import hash64

    bucket = F.pmod(hash64(F.col(id_col).cast("string"), seed=seed), F.lit(100))
    names = list(weights)
    if len(names) == 1:
        expr: Column = F.lit(names[0])
    else:
        expr = None
        edge = 0
        for name in names[:-1]:
            edge += weights[name]
            cond = bucket < edge
            expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def weighted_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    n: int,
    weight_col: str,
    id_cols: Sequence[str],
    seed: str = "wsample",
) -> DataFrame:
    """Weighted sampling without replacement, exactly ``min(n, |stratum|)``
    rows per group — the Efraimidis-Spirakis exponential-sort reservoir
    (A-ES, IPL 2006): each row draws a deterministic hash-uniform
    u ∈ (0, 1] and ranks by ``ln(u)/w`` descending, which is the monotone
    transform of the classic ``u^(1/w)`` key; the per-group top-n is a
    true weight-proportional sample without replacement. THE primitive for
    quality-weighted training mixtures (sample documents ∝ quality score,
    tokens ∝ source mixture weight) — reproducible across runs, engines
    and partitionings, unlike rand()-based sampling.

    Rows with NULL or non-positive weight are excluded (zero-weight rows
    cannot be sampled; A-ES requires w > 0).

    Scale: one shuffle on the group columns; ranking streams within each
    stratum task — identical physics to sample_per_group. No global sort.

    Determinism note: ``ln`` is the one libm call in the engine's oracle
    surface. Cross-engine last-ulp differences in ln can only flip the
    sample when two rank keys differ by < 1 ulp relative — with 60-bit
    distinct hash inputs the expected min key gap is astronomically larger
    (~2^-40 relative at millions of rows vs 2^-52 ulp), so the selection
    is stable in practice; the float key itself is never emitted.
    """
    from pyspark.sql import Window

    from ..functions import hash64

    key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in id_cols])
    u = (hash64(key_str, seed=seed) + F.lit(1)).cast("double") / F.lit(
        float(1 << 60)
    )
    rank_key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(*group_cols).orderBy(
        rank_key.desc(), *[F.asc(c) for c in id_cols]
    )
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= n)
    )


def mixture_quotas(weights: dict[str, float], total: int) -> dict[str, int]:
    """Largest-remainder apportionment of ``total`` rows over ``weights``
    (normalized): quotas sum to exactly ``total``; ties on fractional part
    break by group name. Pure driver-side arithmetic on the (small)
    weights dict — deterministic, no data dependence."""
    wsum = float(sum(weights.values()))
    raw = {g: total * w / wsum for g, w in weights.items()}
    quotas = {g: int(raw[g]) for g in weights}
    rest = total - sum(quotas.values())
    for g in sorted(raw, key=lambda g: (-(raw[g] - int(raw[g])), g))[:rest]:
        quotas[g] += 1
    return quotas


def mixture_sample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    total: int,
    id_cols: Sequence[str],
    seed: str = "mixture",
) -> DataFrame:
    """Target-mixture sampling: draw exactly ``total`` rows distributed
    over ``group_col`` values per the ``weights`` shares (largest-remainder
    quotas), each group's rows chosen by the deterministic hash order of
    ``sample_per_group``. THE data-mixing primitive (DoReMi/Pile-style
    source mixtures): 'train on 60 % web, 25 % books, 15 % code' becomes
    one call. Groups not in ``weights`` are dropped; a group smaller than
    its quota yields its whole population (the shortfall is reported by
    the caller comparing counts, not silently re-distributed — mixture
    arithmetic should be visible, not magic).

    Scale: one shuffle on ``group_col``; ranking streams within each
    group task; the quota lookup is a literal CASE chain (ANSI-safe — no
    ``element_at`` on a map, which throws on missing keys in Spark 4).
    """
    from pyspark.sql import Window

    from ..functions import hash64

    quotas = mixture_quotas(weights, total)
    quota = F.lit(0)
    for g, n in quotas.items():
        quota = F.when(F.col(group_col) == g, F.lit(n)).otherwise(quota)
    key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in id_cols])
    w = Window.partitionBy(group_col).orderBy(
        hash64(key_str, seed=seed).asc(), *[F.asc(c) for c in id_cols]
    )
    return (
        df.where(F.col(group_col).isin(*quotas.keys()))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= quota)
        .drop("__rn")
    )


def mixture_temperature(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled source mixing weights: sampling probability
    ∝ share^α with α = 1/2 — the multilingual/multi-source rebalancing of
    mT5 / GPT-3 (upweight small sources, damp the head) at the one exponent
    where the math is bit-exact cross-engine: share^0.5 = sqrt(share), and
    IEEE sqrt is correctly rounded while pow() is not (repo invariant — we
    refuse exponents that would make the oracle a ulp-lottery).

    Exactness chain: share = n/total is one double division (identical both
    engines); sqrt is correctly rounded; the weight is floored into INTEGER
    micro-units (``floor(sqrt(share)·10⁶)``), the normalizer is an exact
    integer SUM, and only the final probability divides doubles again —
    FLOOR-canonicalized.

    Scale posture (100 TB): one map-side-combined count per group, then all
    arithmetic happens on the k-row group frame (k = #sources); the two
    1-row total frames broadcast. The corpus is scanned once and never
    re-shuffled. Output: ``(group_col, n_docs, share, p_temp)``.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").cast("double").alias("__tot"))
    shared = counts.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        (F.col("n_docs") / F.col("__tot")).alias("__share"),
    )
    micro = shared.select(
        group_col,
        "n_docs",
        "__share",
        F.floor(F.sqrt(F.col("__share")) * 1e6).cast("long").alias("__w6"),
    )
    norm = micro.agg(F.sum("__w6").alias("__norm"))
    return micro.crossJoin(F.broadcast(norm)).select(
        group_col,
        "n_docs",
        (F.floor(F.col("__share") * 1e6) / 1e6).alias("share"),
        (F.floor(F.col("__w6") / F.col("__norm") * 1e6) / 1e6).alias("p_temp"),
    )
