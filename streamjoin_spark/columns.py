"""Stream-scoped column references and a deferred expression layer.

The reference implements a hand-rolled ``ColumnSelector`` (reference:
elzyme/streams.py:11-65) plus an ``Expression`` AST with its own node types
(reference: elzyme/joins.py:203-269) that is later lowered to Spark
``Column`` objects. We keep the *capability* — columns that remember which
stream they came from, so ``left['id'] == right['id']`` is unambiguous —
but implement it as a thin deferred wrapper that composes real
``pyspark.sql.Column`` expressions at bind time. No custom AST walk: the
operator overloads build a closure ``binding -> Column`` and Catalyst sees
ordinary Column trees, so every optimization (pushdown, constant folding)
applies untouched.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Binding:
    """Resolution context mapping a Stream (by identity) to a DataFrame or to
    a string alias qualifier.

    Batch execution binds every stream to its aliased snapshot; joins bind
    each side to a *qualifier string* (``F.col("alias.`name`")``) so that
    self-joins — both sides sharing one logical plan — resolve without
    ambiguous-attribute errors. Incremental execution binds one side to the
    microbatch delta and the other to a version-pinned snapshot.
    """

    def __init__(self, mapping: dict[int, Any], default: Any | None = None):
        self._mapping = mapping
        self._default = default

    @staticmethod
    def of(*pairs: tuple[Any, Any]) -> "Binding":
        return Binding({id(stream): df for stream, df in pairs})

    @staticmethod
    def _to_col(target: Any, name: str) -> Column:
        if isinstance(target, str):  # alias qualifier
            return F.col(f"{target}.`{name}`")
        return target[name]

    def resolve(self, stream: Any, name: str) -> Column:
        target = self._mapping.get(id(stream), self._default)
        if target is None:
            raise KeyError(
                f"no DataFrame bound for stream {getattr(stream, 'name', stream)!r} "
                f"while resolving column {name!r}"
            )
        return self._to_col(target, name)

    def df_for(self, stream: Any) -> Any | None:
        return self._mapping.get(id(stream), self._default)


def _lift(value: Any) -> "Expr":
    """Coerce literals / Columns / Exprs into an Expr."""
    if isinstance(value, Expr):
        return value
    if isinstance(value, Column):
        return Expr(lambda b, c=value: c)
    return Expr(lambda b, v=value: F.lit(v))


def _binop(
    op: Callable[[Column, Column], Column], tag: str | None = None
) -> Callable[["Expr", Any], "Expr"]:
    def method(self: "Expr", other: Any) -> "Expr":
        rhs = _lift(other)
        e = Expr(lambda b: op(self.column(b), rhs.column(b)))
        if tag is not None:
            # structural breadcrumb (op tag + operands) for the few ops
            # whose shape downstream pruning can exploit — the closure
            # stays the single source of truth for SEMANTICS; the tag
            # only ever REMOVES work (see equi_column_pairs)
            e._node = (tag, self, rhs)
        return e

    return method


def _rbinop(op: Callable[[Column, Column], Column]) -> Callable[["Expr", Any], "Expr"]:
    def method(self: "Expr", other: Any) -> "Expr":
        lhs = _lift(other)
        return Expr(lambda b: op(lhs.column(b), self.column(b)))

    return method


class Expr:
    """A deferred ``pyspark.sql.Column`` — a closure from Binding to Column.

    Mirrors the operator surface of the reference AST (``== != < <= > >= & |``
    plus literals, reference: elzyme/joins.py:203-269) and adds arithmetic,
    ``~``, null tests, ``isin``, ``cast`` and function application, all of
    which lower directly to Column methods.
    """

    def __init__(self, fn: Callable[[Binding], Column], output_name: str | None = None):
        self._fn = fn
        self._output_name = output_name
        self._node: tuple | None = None  # optional (tag, lhs, rhs) breadcrumb

    # -- resolution ----------------------------------------------------
    def column(self, binding: Binding) -> Column:
        col = self._fn(binding)
        if self._output_name:
            col = col.alias(self._output_name)
        return col

    # -- comparison / boolean ops -------------------------------------
    __eq__ = _binop(lambda a, b: a == b, tag="eq")  # type: ignore[assignment]
    __ne__ = _binop(lambda a, b: a != b)  # type: ignore[assignment]
    __lt__ = _binop(lambda a, b: a < b)
    __le__ = _binop(lambda a, b: a <= b)
    __gt__ = _binop(lambda a, b: a > b)
    __ge__ = _binop(lambda a, b: a >= b)
    __and__ = _binop(lambda a, b: a & b, tag="and")
    __or__ = _binop(lambda a, b: a | b)
    __add__ = _binop(lambda a, b: a + b)
    __sub__ = _binop(lambda a, b: a - b)
    __mul__ = _binop(lambda a, b: a * b)
    __truediv__ = _binop(lambda a, b: a / b)
    __radd__ = _rbinop(lambda a, b: a + b)
    __rsub__ = _rbinop(lambda a, b: a - b)
    __rmul__ = _rbinop(lambda a, b: a * b)
    __rtruediv__ = _rbinop(lambda a, b: a / b)

    def __invert__(self) -> "Expr":
        return Expr(lambda b: ~self.column(b))

    def __hash__(self):  # __eq__ is overloaded; keep Exprs hashable by identity
        return id(self)

    # -- column helpers ------------------------------------------------
    def eqNullSafe(self, other: Any) -> "Expr":
        rhs = _lift(other)
        e = Expr(lambda b: self.column(b).eqNullSafe(rhs.column(b)))
        # null-safe equality is equi for PRUNING purposes: scope bounds
        # track has_null, and a null-carrying scope never excludes dirs
        # with nulls (_entry_excluded)
        e._node = ("eq", self, rhs)
        return e

    def isNull(self) -> "Expr":
        return Expr(lambda b: self.column(b).isNull())

    def isNotNull(self) -> "Expr":
        return Expr(lambda b: self.column(b).isNotNull())

    def isin(self, *values: Any) -> "Expr":
        return Expr(lambda b: self.column(b).isin(*values))

    def cast(self, dtype: Any) -> "Expr":
        return Expr(lambda b: self.column(b).cast(dtype))

    def alias(self, name: str) -> "Expr":
        return Expr(self._fn, output_name=name)

    def to(self, func: Callable[[Column], Column]) -> "Expr":
        """Apply an arbitrary Column->Column transform (reference
        ``ColumnSelector.to``, elzyme/streams.py:38-43)."""
        return Expr(lambda b: func(self._fn(b)), output_name=self._output_name)

    @property
    def output_name(self) -> str | None:
        return self._output_name


class ColumnRef(Expr):
    """A column of a specific Stream — the stream-scoped reference that makes
    same-named columns on both join sides unambiguous (reference:
    elzyme/streams.py:11-65)."""

    def __init__(self, stream: Any, name: str, output_name: str | None = None):
        super().__init__(lambda b: b.resolve(stream, name), output_name)
        self.stream = stream
        self.name = name

    def alias(self, name: str) -> "ColumnRef":
        return ColumnRef(self.stream, self.name, output_name=name)

    def to(self, func: Callable[[Column], Column]) -> Expr:
        return Expr(
            lambda b: func(b.resolve(self.stream, self.name)),
            output_name=self._output_name or self.name,
        )

    def __hash__(self):
        return hash((id(self.stream), self.name, self._output_name))

    def __repr__(self) -> str:
        src = getattr(self.stream, "name", None) or f"stream@{id(self.stream):x}"
        out = f" as {self._output_name}" if self._output_name else ""
        return f"ColumnRef({src}[{self.name!r}]{out})"


class StarRef:
    """``stream['*']`` — expand to all (non-metadata) columns of one side."""

    def __init__(self, stream: Any):
        self.stream = stream

    def __repr__(self) -> str:
        src = getattr(self.stream, "name", None) or f"stream@{id(self.stream):x}"
        return f"StarRef({src})"


def lit(value: Any) -> Expr:
    """Literal as a deferred expression (reference AST wraps literals via
    ``F.lit``, elzyme/joins.py:216-223)."""
    return _lift(value)


def equi_column_pairs(expr: Expr) -> list[tuple[ColumnRef, ColumnRef]]:
    """ColumnRef == ColumnRef pairs PROVABLE from an expression's binop
    breadcrumbs: equality nodes reachable through a conjunction (AND)
    spine. Sound for pruning by construction: under AND, restricting by
    any SUBSET of conjuncts over-approximates the match set (an opaque
    conjunct just contributes nothing), while an OR — or any untagged
    root — yields no pairs at all (rows may match through the other
    branch, so pruning by one branch would be unsound). Used by the IVM
    join stage to prune snapshot reads by the opposite side's delta key
    values; a theta-only condition simply returns [] and costs nothing."""
    node = getattr(expr, "_node", None)
    if node is None:
        return []
    tag, a, b = node
    if tag == "and":
        return equi_column_pairs(a) + equi_column_pairs(b)
    if tag == "eq" and isinstance(a, ColumnRef) and isinstance(b, ColumnRef):
        return [(a, b)]
    return []
