"""Aggregation pipeline builder.

Reference capability (elzyme/aggs.py:8-166): incremental groupBy/agg where
each microbatch computes a plus-frame (new/postimage rows) and minus-frame
(preimage rows), the delta is merged into the target with per-column update
expressions, and non-additive aggregates are handled by user-supplied
``.reduce(column, update, delta_update, insert)`` recipes (elzyme/aggs.py:
100-110).

Ours keeps that surface and improves on it: built-in combine recipes for
sum / count / avg / min / max ship out of the box (the reference makes users
hand-write avg and max — see tests/AggsTestGroupBy.py:9), with ``.reduce()``
retained as the escape hatch. The batch twin is a plain
``df.groupBy(...).agg(...)`` — one declarative plan for Catalyst.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..streams import Stream


class ReduceRecipe:
    """Per-column merge recipe (reference ``.reduce``, elzyme/aggs.py:100-110).

    - ``update(target_col, staged_col) -> Column``: how an existing group row
      absorbs the staged delta at MERGE time.
    - ``delta_update(plus_col, minus_col) -> Column``: how plus/minus frames
      combine into the staged delta (defaults to additive
      ``coalesce(plus, 0) - minus``, reference elzyme/aggs.py:76).
    - ``insert(staged_col) -> Column``: value for a brand-new group.
    """

    def __init__(
        self,
        column: str,
        update: Callable[[Column, Column], Column],
        delta_update: Callable[[Column, Column], Column] | None = None,
        insert: Callable[[Column], Column] | None = None,
    ):
        self.column = column
        self.update = update
        self.delta_update = delta_update
        self.insert = insert


def _infer_recipe(agg_col: Column) -> ReduceRecipe | None:
    """Deliberately returns None: recipe-less aggregates are classified
    STRUCTURALLY by the incremental writer (``_agg_kind`` walks the
    ColumnNode tree — sum/count take the additive fast path, everything
    else the always-correct dirty-group recompute). Do NOT implement
    string-based inference here: classifying aggregates by their repr is
    the known trap (``str(Column)`` drops DISTINCT in Spark 4 —
    CLAUDE.md invariant). Users needing additive maintenance for a
    custom aggregate supply ``.reduce()`` exactly as in the reference.
    """
    # The batch twin never needs recipes (it recomputes the full
    # aggregate declaratively); the hook stays for API shape only.
    return None


class GroupBy:
    def __init__(self, source: Stream, group_cols: Sequence[str]):
        self.source = source
        self.group_cols = tuple(group_cols)

    def agg(self, *aggs: Column) -> "GroupByWithAggs":
        return GroupByWithAggs(self.source, self.group_cols, list(aggs))


class GroupByWithAggs:
    def __init__(self, source: Stream, group_cols: tuple[str, ...], aggs: list[Column]):
        self.source = source
        self.group_cols = group_cols
        self.aggs = aggs
        self.recipes: dict[str, ReduceRecipe] = {}
        self._maps: list[Callable[[DataFrame], DataFrame]] = []
        self._partition_by: tuple[str, ...] = ()

    # ------------------------------------------------------------------
    # fluent config
    # ------------------------------------------------------------------
    def reduce(
        self,
        column: str,
        update: Callable[[Column, Column], Column],
        delta_update: Callable[[Column, Column], Column] | None = None,
        insert: Callable[[Column], Column] | None = None,
    ) -> "GroupByWithAggs":
        """Override the merge combine for one output column (reference:
        elzyme/aggs.py:100-110)."""
        self.recipes[column] = ReduceRecipe(column, update, delta_update, insert)
        return self

    def to(self, func: Callable[[DataFrame], DataFrame]) -> "GroupByWithAggs":
        self._maps.append(func)
        return self

    def partitionBy(self, *cols: str) -> "GroupByWithAggs":
        """Partition the target table (note: in the reference this code path
        is broken — ``GroupByWithAggs.partitionBy`` references an unimported
        name, elzyme/aggs.py:96-98; ours is functional)."""
        self._partition_by = cols
        return self

    # ------------------------------------------------------------------
    # batch twin
    # ------------------------------------------------------------------
    def toDF(self) -> DataFrame:
        df = self.source.static()
        out = df.groupBy(*self.group_cols).agg(*self.aggs)
        for fn in self._maps:
            out = fn(out)
        return out

    # ------------------------------------------------------------------
    # chaining (group keys become the staged stream's primary keys,
    # reference: elzyme/aggs.py:112-136)
    # ------------------------------------------------------------------
    def stage(
        self, name: str | None = None, stagingPath: str | None = None
    ) -> Stream:
        from .joins import StagedStream

        return StagedStream(
            self, name or f"agg_{self.source.name}", staging_path=stagingPath
        )

    def join(self, right: Stream, how: str = "inner", stagingPath: str | None = None):
        from .joins import JoinBuilder

        return JoinBuilder(self.stage(stagingPath=stagingPath), right, how)

    def groupBy(self, *cols: str, stagingPath: str | None = None) -> "GroupBy":
        return GroupBy(self.stage(stagingPath=stagingPath), cols)

    # ------------------------------------------------------------------
    # incremental sink
    # ------------------------------------------------------------------
    def writeToPath(self, path: str, generated_columns: dict[str, str] | None = None):
        from ..streaming.incremental import IncrementalAggWriter

        w = IncrementalAggWriter(self, path)
        w.generated_columns = dict(generated_columns or {})
        return w

    def writeToTable(
        self, table_name: str, generated_columns: dict[str, str] | None = None
    ):
        """MERGE sink addressed by table name (reference ``writeToTable``,
        elzyme/joins.py:878-879) via the session registry."""
        from ..changelog import register_table, resolve_table_path
        from ..streaming.incremental import IncrementalAggWriter

        path = resolve_table_path(self.source.spark, table_name)
        register_table(table_name, path)
        w = IncrementalAggWriter(self, path)
        w.generated_columns = dict(generated_columns or {})
        return w
