"""Join pipeline builder.

Capability parity with the reference join chain (elzyme/joins.py):

- ``.onKeys(*keys)`` — AND-folded key equality, duplicate key column of the
  non-preserved side dropped (reference: elzyme/joins.py:183-201).
- ``.on(expr)`` — arbitrary theta condition built from stream-scoped column
  refs (reference Expression AST: elzyme/joins.py:203-269; ours lowers
  directly to ``pyspark.sql.Column``).
- ``.select`` / ``.drop`` / ``.to`` / ``.union`` — projection layer
  (reference Selector: elzyme/joins.py:62-143, 929-934, 861-865).
- chaining ``.join(...)`` / ``.groupBy(...)`` — multi-stage pipelines; key
  metadata (nullable on the outer side) composes across stages (reference:
  elzyme/joins.py:603-617, 804-859).

Execution modes:

- **batch** (``toDF``): the whole pipeline lowers to one declarative
  DataFrame plan — Catalyst handles pushdown / join strategy / AQE. This is
  the oracle-verified twin.
- **incremental** (``writeTo``): each stage becomes a Structured Streaming
  query doing the three-leg delta join against version-pinned snapshots,
  merging into a ChangeTable (see streamjoin_spark/streaming/incremental.py).

Only inner/left/right joins are user-facing, matching the reference
(elzyme/joins.py:322-326 raises otherwise).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

import inspect

from ..columns import Binding, ColumnRef, Expr, StarRef
from ..streams import METADATA_COLUMNS, PruneColumn, Stream


def _map_arity(fn) -> int:
    """Positional-parameter count of a user transform; unintrospectable
    callables count as 1 (plain ``df -> df``)."""
    try:
        return len([
            p for p in inspect.signature(fn).parameters.values()
            if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        ])
    except (TypeError, ValueError):
        return 1

SUPPORTED_JOINS = ("inner", "left", "right")


class KeyInfo:
    """A merge key with nullability — keys from the non-preserved side of an
    outer join can be null in the result (reference tracks this as
    nonNull/nullable PK sets composed across stages, elzyme/joins.py:603-617)."""

    def __init__(self, name: str, nullable: bool = False):
        self.name = name
        self.nullable = nullable

    def __repr__(self) -> str:
        return f"KeyInfo({self.name!r}{', nullable' if self.nullable else ''})"


def compose_keys(
    left_keys: Sequence[KeyInfo], right_keys: Sequence[KeyInfo], how: str,
    dropped: set[str] | None = None,
) -> list[KeyInfo]:
    """Merge-key composition across a join (reference: elzyme/joins.py:603-617,
    804-810): both sides' keys survive; the non-preserved outer side's keys
    become nullable; keys deduplicated by name (onKeys drops one copy)."""
    dropped = dropped or set()
    out: list[KeyInfo] = []
    seen: set[str] = set()
    for k in left_keys:
        nullable = k.nullable or how == "right"
        if k.name not in seen:
            out.append(KeyInfo(k.name, nullable))
            seen.add(k.name)
    for k in right_keys:
        nullable = k.nullable or how == "left"
        if k.name in dropped:
            continue
        if k.name not in seen:
            out.append(KeyInfo(k.name, nullable))
            seen.add(k.name)
    return out


def _lineage(stream) -> list:
    """A stream plus every stream nested inside it through staged stages —
    so chained pipelines can select with refs to *inner* streams
    (``big.join(o).join(c).select(big["k"], o["d"], ...)``), matching the
    reference where upstream ColumnSelectors stay valid across staging
    (elzyme/joins.py:838-858). A ref resolves to the side whose staged
    output carries the column under the same name."""
    out = [stream]
    parent = getattr(stream, "parent", None)
    if parent is not None:
        for s in (
            getattr(parent, "left", None),
            getattr(parent, "right", None),
            getattr(parent, "source", None),
        ):
            if s is not None:
                out.extend(_lineage(s))
    return out


class JoinBuilder:
    """Fluent join-pipeline builder over two Streams (reference
    ``StreamToStreamJoin`` → ``StreamToStreamJoinWithCondition`` chain,
    elzyme/joins.py:145-201)."""

    def __init__(self, left: Stream, right: Stream, how: str = "inner"):
        if how not in SUPPORTED_JOINS:
            raise ValueError(
                f"unsupported join type {how!r}; supported: {SUPPORTED_JOINS} "
                "(parity with reference elzyme/joins.py:322-326)"
            )
        self.left = left
        self.right = right
        self.how = how
        self._on_keys: tuple[str, ...] = ()
        self._condition: Expr | None = None
        self._selects: list[Any] | None = None
        self._drops: list[ColumnRef] = []
        self._maps: list[Callable] = []
        self._unions: list = []
        self._broadcast_side: str | None = None
        self._partition_by: tuple[str, ...] = ()

    # ------------------------------------------------------------------
    # condition
    # ------------------------------------------------------------------
    def onKeys(self, *keys: str) -> "JoinBuilder":
        self._on_keys = tuple(keys)
        return self

    def on(self, condition: Expr) -> "JoinBuilder":
        self._condition = condition
        return self

    # ------------------------------------------------------------------
    # projection layer
    # ------------------------------------------------------------------
    def select(self, *cols: Any) -> "JoinBuilder":
        self._selects = list(cols)
        return self

    def drop(self, ref: ColumnRef) -> "JoinBuilder":
        """Side-aware drop (reference: elzyme/joins.py:929-934)."""
        self._drops.append(ref)
        return self

    def to(self, func: Callable) -> "JoinBuilder":
        """Arbitrary transform over the join output (reference ``.to()``,
        elzyme/joins.py:507-525). A 1-arg callable receives the joined
        frame; a 3-arg callable receives ``(joined, left, right)`` — the
        side frames as bound for this execution (snapshots in batch mode,
        the pinned slice/snapshot pair per microbatch incrementally),
        matching the reference's transformFunc arity dispatch."""
        self._maps.append(func)
        return self

    def partitionBy(self, *cols) -> "JoinBuilder":
        """Partition this stage's materialized target (reference per-stage
        ``.partitionBy(prune(...))``, elzyme/joins.py:676-682, which injects
        partition conjuncts into every stage's MERGE). Here the stage's
        ChangeTable hash-buckets on these columns instead of the primary
        keys, so intermediate staging rewrites touch only the buckets of
        affected partition values. Accepts strings, column refs, or
        ``prune(...)`` markers."""
        names = []
        for c in cols:
            if isinstance(c, PruneColumn):
                names.append(c.ref.name)
            elif isinstance(c, ColumnRef):
                names.append(c.name)
            else:
                names.append(c)
        self._partition_by = tuple(names)
        return self

    def union(self, other) -> "JoinBuilder":
        """Union another pipeline onto the join output (reference:
        elzyme/joins.py:861-865, which unions live streams via a ``.to``
        transform). Accepts a Stream, another builder (auto-staged), or a
        plain DataFrame (batch-only).

        Incremental semantics: each Stream operand is an extra root feed
        maintaining its own key-space of the target — its primary keys must
        be named like the join's composed keys, and key values must be
        disjoint from the other legs' (the same contract the reference's
        keyed MERGE imposes on a unioned pipeline)."""
        if isinstance(other, (JoinBuilder,)) or hasattr(other, "stage"):
            other = other.stage()
        self._unions.append(other)
        return self

    def broadcast(self, side: str = "right") -> "JoinBuilder":
        """Force a broadcast of one side in the batch plan — the explicit
        analog of the reference's always-broadcast-the-microbatch strategy
        (elzyme/joins.py:310-316). Use when the optimizer's size estimate is
        wrong (e.g. a selective filter Catalyst can't see through); at 100 TB
        a wrongly-shuffled dimension join is the single most expensive
        planner miss."""
        if side not in ("left", "right"):
            raise ValueError("side must be 'left' or 'right'")
        self._broadcast_side = side
        return self

    def explain(self, mode: str = "formatted") -> None:
        """Explain the batch twin's physical plan (review that filters reach
        the scan and the intended join strategy was chosen before running at
        scale)."""
        self.toDF().explain(mode)

    # ------------------------------------------------------------------
    # plan construction (shared by batch twin and incremental legs)
    # ------------------------------------------------------------------
    def _join_condition(self, binding: Binding, lq: str, rq: str) -> Column:
        if self._condition is not None:
            return self._condition.column(binding)
        if not self._on_keys:
            raise ValueError("join needs .onKeys(...) or .on(...)")
        cond = None
        for k in self._on_keys:
            c = F.col(f"{lq}.`{k}`") == F.col(f"{rq}.`{k}`")
            cond = c if cond is None else (cond & c)
        return cond

    def _preserved_side(self) -> str:
        return "right" if self.how == "right" else "left"

    def _dropped_key_names(self) -> set[str]:
        # onKeys keeps the preserved side's key column only (reference
        # auto-drops the duplicate, elzyme/joins.py:183-201).
        return set(self._on_keys)

    def _output_columns(
        self,
        binding: Binding,
        lq: str,
        rq: str,
        lcols: list[str],
        rcols: list[str],
    ) -> list[Column]:
        """Resolve the projection: explicit selects, or both-side '*' with
        duplicate-key dedup (reference Selector.select, elzyme/joins.py:62-143)."""
        preserved = self._preserved_side()
        drop_left: set[str] = set()
        drop_right: set[str] = set()
        if self._on_keys:
            if preserved == "left":
                drop_right |= self._dropped_key_names()
            else:
                drop_left |= self._dropped_key_names()
        left_streams = {id(s) for s in _lineage(self.left)}
        right_streams = {id(s) for s in _lineage(self.right)}

        def side_of(ref: ColumnRef) -> str:
            if id(ref.stream) in left_streams:
                return lq
            if id(ref.stream) in right_streams:
                return rq
            raise ValueError(f"ref {ref!r} does not belong to either side")

        for ref in self._drops:
            if side_of(ref) == lq:
                drop_left.add(ref.name)
            else:
                drop_right.add(ref.name)

        selects = self._selects
        if selects is None:
            selects = [StarRef(self.left), StarRef(self.right)]

        cols: list[Column] = []
        names_emitted: set[str] = set()

        def emit(qualifier: str, name: str, out_name: str | None = None):
            out = out_name or name
            if out in names_emitted:
                return
            names_emitted.add(out)
            cols.append(F.col(f"{qualifier}.`{name}`").alias(out))

        def star(stream, qualifier: str, dropped: set[str], names: list[str]):
            for name in names:
                if name not in METADATA_COLUMNS and name not in dropped:
                    emit(qualifier, name)

        for item in selects:
            if isinstance(item, StarRef):
                if id(item.stream) in left_streams:
                    star(self.left, lq, drop_left, lcols)
                else:
                    star(self.right, rq, drop_right, rcols)
            elif isinstance(item, ColumnRef):
                emit(side_of(item), item.name, item.output_name)
            elif isinstance(item, Expr):
                out_name = item.output_name
                col = item.column(binding)
                if out_name and out_name in names_emitted:
                    continue
                if out_name:
                    names_emitted.add(out_name)
                cols.append(col)
            elif isinstance(item, str):
                if item == "*":
                    star(self.left, lq, drop_left, lcols)
                    star(self.right, rq, drop_right, rcols)
                else:
                    # bare string resolves against whichever side has it,
                    # preferring the preserved side (reference resolves mixed
                    # string selects the same way, elzyme/joins.py:72-101).
                    order = (
                        [(lq, lcols), (rq, rcols)]
                        if preserved == "left"
                        else [(rq, rcols), (lq, lcols)]
                    )
                    for q, names in order:
                        if item in names:
                            emit(q, item)
                            break
                    else:
                        raise ValueError(f"column {item!r} not found on either side")
            elif isinstance(item, Column):
                cols.append(item)
            else:
                raise TypeError(f"unsupported select item: {item!r}")
        return cols

    _ALIAS_COUNTER = 0

    def _execute(
        self, ldf: DataFrame, rdf: DataFrame, apply_unions: bool = True
    ) -> DataFrame:
        """Join two bound DataFrames with alias-qualified resolution (safe for
        self-joins: both sides may share one logical plan). The incremental
        join stage passes ``apply_unions=False``: union legs are maintained
        by their own stages, not re-appended to every recomputed slice."""
        JoinBuilder._ALIAS_COUNTER += 1
        lq = f"sjl{JoinBuilder._ALIAS_COUNTER}"
        rq = f"sjr{JoinBuilder._ALIAS_COUNTER}"
        lcols, rcols = ldf.columns, rdf.columns
        ldf_a, rdf_a = ldf.alias(lq), rdf.alias(rq)
        # bind the full lineage of each side so refs to inner (pre-staging)
        # streams resolve to the staged output's qualifier; the immediate
        # sides are bound last and win on overlap
        binding = Binding.of(
            *[(s, lq) for s in _lineage(self.left)[1:]],
            *[(s, rq) for s in _lineage(self.right)[1:]],
            (self.left, lq),
            (self.right, rq),
        )
        cond = self._join_condition(binding, lq, rq)
        if self._broadcast_side == "left":
            ldf_a = F.broadcast(ldf_a)
        elif self._broadcast_side == "right":
            rdf_a = F.broadcast(rdf_a)
        joined = ldf_a.join(rdf_a, cond, self.how)
        out_cols = self._output_columns(binding, lq, rq, lcols, rcols)
        out = joined.select(*out_cols)
        for fn in self._maps:
            out = fn(out, ldf, rdf) if _map_arity(fn) >= 3 else fn(out)
        if apply_unions:
            for u in self._unions:
                u_df = u if isinstance(u, DataFrame) else u.static()
                out = out.unionByName(u_df)
        return out

    # ------------------------------------------------------------------
    # batch twin
    # ------------------------------------------------------------------
    def toDF(self) -> DataFrame:
        """Execute the whole pipeline as one declarative batch plan."""
        return self._execute(self.left.static(), self.right.static())

    # ------------------------------------------------------------------
    # key metadata for chaining / merge
    # ------------------------------------------------------------------
    def composed_keys(self) -> list[KeyInfo]:
        lkeys = [KeyInfo(k) for k in self.left.primary_keys]
        rkeys = [KeyInfo(k) for k in self.right.primary_keys]
        return compose_keys(lkeys, rkeys, self.how, self._dropped_key_names())

    def sequence_columns(self) -> tuple[str, ...]:
        # Sequence columns survive if they are still present in the output;
        # preserved side wins (reference carries surviving sequence columns
        # into the staged stream, elzyme/joins.py:838-858).
        preserved = self.left if self._preserved_side() == "left" else self.right
        return preserved.sequence_columns

    # ------------------------------------------------------------------
    # chaining (reference staging pattern, elzyme/joins.py:812-859)
    # ------------------------------------------------------------------
    def stage(
        self, name: str | None = None, stagingPath: str | None = None
    ) -> "StagedStream":
        """Expose this stage as a Stream for chaining. In batch mode the
        'staging table' is just the lazily-composed DataFrame — Catalyst
        fuses the stages into one plan (no materialization barrier). The
        incremental path materializes the stage as a real ChangeTable and
        re-streams its change feed (reference staging tables,
        elzyme/joins.py:812-859). ``stagingPath`` pins where that table
        lives (reference's explicit stagingPath, elzyme/joins.py:867-873);
        default is under the final target's ``__stages/`` dir."""
        return StagedStream(self, name, staging_path=stagingPath)

    def join(
        self, right: Stream, how: str = "inner", stagingPath: str | None = None
    ) -> "JoinBuilder":
        return JoinBuilder(self.stage(stagingPath=stagingPath), right, how)

    def groupBy(self, *cols: str, stagingPath: str | None = None):
        from .aggs import GroupBy

        return GroupBy(self.stage(stagingPath=stagingPath), cols)

    # ------------------------------------------------------------------
    # incremental sink (Structured Streaming path)
    # ------------------------------------------------------------------
    def writeToPath(
        self,
        path: str,
        partition_by: Sequence[str] = (),
        generated_columns: dict[str, str] | None = None,
    ):
        """Incremental MERGE sink. ``generated_columns`` maps name → SQL
        expression computed on every write (reference generated_columns_ddl,
        elzyme/joins.py:875-879); combine with ``partition_by`` naming a
        generated column for the reference's derive-then-prune pattern."""
        from ..streaming.incremental import IncrementalJoinWriter

        return IncrementalJoinWriter(
            self, path, partition_by=tuple(partition_by),
            generated_columns=generated_columns,
        )

    def writeToTable(
        self,
        table_name: str,
        partition_by: Sequence[str] = (),
        generated_columns: dict[str, str] | None = None,
    ):
        """MERGE sink addressed by table name (reference ``writeToTable``,
        elzyme/joins.py:878-879): resolves through the session registry (or
        the warehouse dir for a new name) and registers the result, so a
        later ``Stream.fromTable(spark, table_name)`` streams its change
        feed."""
        from ..changelog import register_table, resolve_table_path
        from ..streaming.incremental import IncrementalJoinWriter

        path = resolve_table_path(self.left.spark, table_name)
        register_table(table_name, path)
        return IncrementalJoinWriter(
            self, path, partition_by=tuple(partition_by),
            generated_columns=generated_columns,
        )

    def foreachBatch(self, func: Callable[[DataFrame, int], None]):
        """User-supplied sink over each joined, deduped microbatch
        (reference: elzyme/joins.py:536-554). Contract (r11): the
        frames handed to the sink — the slice, and for 3-parameter
        sinks the affected-key scope — are valid ONLY within the
        callback, exactly like Structured Streaming's own foreachBatch
        batch frame: their backing scope checkpoints are released when
        the callback returns, so a sink that defers evaluation (stores
        the frame, hands it to another thread) must materialize first
        (``df.collect()`` / write) inside the call."""
        from ..streaming.incremental import IncrementalJoinWriter

        return IncrementalJoinWriter(self, None, foreach_batch=func)


class StagedStream(Stream):
    """A pipeline stage exposed as a Stream for chaining.

    Batch mode: ``static()`` lazily composes the parent pipeline's DataFrame
    (Catalyst fuses the whole chain into one plan). Incremental mode: the
    incremental writer materializes the parent into a staging ChangeTable
    and rebinds this stream to its change feed (reference:
    elzyme/joins.py:812-859 — staging Delta table + CDF re-stream)."""

    def __init__(self, parent, name: str | None = None, staging_path: str | None = None):
        # parent: JoinBuilder or GroupByWithAggs
        left = getattr(parent, "left", None) or getattr(parent, "source")
        spark = left.spark
        super().__init__(spark, name or f"staged_{left.name}", lambda v: parent.toDF())
        self.parent = parent
        self.staging_path = staging_path
        if hasattr(parent, "composed_keys"):
            self.primaryKeys(*[k.name for k in parent.composed_keys()])
            self.sequenceBy(*parent.sequence_columns())
        else:  # aggregation stage: group keys become the PKs (elzyme/aggs.py:33-42)
            self.primaryKeys(*parent.group_cols)
