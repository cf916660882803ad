"""``Stream`` — the engine's source abstraction.

Reference model (elzyme/streams.py:96-240): a Stream couples
(1) a change-feed reader (Delta CDF readStream, deletes filtered),
(2) a versioned static snapshot reader,
(3) primary keys and optional sequence columns.

This engine keeps the same model but is storage-agnostic:

- backed by a :class:`~streamjoin_spark.changelog.ChangeTable` (our
  versioned-parquet changelog, the open-source stand-in for Delta CDF), it
  exposes a *real* change stream via the Structured Streaming file source
  plus version-pinned snapshots — the full incremental path;
- backed by a plain DataFrame / parquet path, it is a static source whose
  pipelines execute in batch mode — the twin used for oracle-verified
  correctness (every streaming operator has a batch twin, SURVEY.md §7).

Keys and sequence columns are metadata carried on the Stream, exactly as in
the reference (``primaryKeys`` required for MERGE targets, ``sequenceBy``
optional ordering — reference: elzyme/streams.py:215-227).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from .columns import ColumnRef, StarRef

if TYPE_CHECKING:
    from .changelog import ChangeTable

# Change-feed metadata columns (same names as Delta CDF so the model is
# drop-in compatible; reference hides them from user selects,
# elzyme/streams.py:108,197-198).
CHANGE_TYPE = "_change_type"
COMMIT_VERSION = "_commit_version"
METADATA_COLUMNS = [CHANGE_TYPE, COMMIT_VERSION]

INSERT = "insert"
UPDATE_PRE = "update_preimage"
UPDATE_POST = "update_postimage"
DELETE = "delete"

# Logical-plan nodes a ``.to`` transform may interpose WITHOUT breaking
# file-pruning soundness: each output row is a row-local function of
# exactly one input row and pruning the input only removes rows (never
# changes surviving ones). Anything else — Aggregate, Window, Join,
# Generate, Deduplicate, Limit — can change the CONTENT of rows that
# survive a pruned read (a window rank computed over fewer rows, a dedup
# electing a different representative), so the walk refuses and the read
# falls back to the full snapshot.
_ROW_LOCAL_NODES = {
    "Project",
    "Filter",
    "SubqueryAlias",
    "Sort",
    "Repartition",
    "RepartitionByExpression",
}


def _jseq(seq) -> list:
    return [seq.apply(i) for i in range(seq.size())]


def _map_cols_to_base(out_df: DataFrame, base_df: DataFrame, key_cols) :
    """{post-transform key col → base column} when PROVABLE from the
    analyzed plan, else None (= read everything, the sound fallback).

    Soundness argument (r10 VERDICT task 1 — transform-aware scoped
    reads): footer-stats pruning of the BASE table by a post-transform
    column is sound iff (a) every output value of that column IS some
    base row's value of one specific base column — established by
    resolving the output attribute's exprId through Alias/
    AttributeReference chains down to the base plan's own output (a
    rename that swaps two column names maps each to its true origin;
    any computed expression refuses) — and (b) every plan node between
    the output and the base subtree is row-local (see
    ``_ROW_LOCAL_NODES``), so dropping base rows that provably carry no
    scoped key value cannot alter the surviving rows. Catalyst exprIds
    are globally unique per attribute instance, so an id resolving into
    ``base_df``'s output cannot belong to a different relation the
    transform smuggled in. Driver-only plan walk, no Spark job."""
    try:
        jbase = base_df._jdf.queryExecution().analyzed()
        base_ids = {
            a.exprId().id(): a.name() for a in _jseq(jbase.output())
        }
        node = out_df._jdf.queryExecution().analyzed()
        out_ids: dict[str, int | None] = {}
        for a in _jseq(node.output()):
            name = a.name()
            # duplicate output names: ambiguous reference, refuse
            out_ids[name] = None if name in out_ids else a.exprId().id()
        targets: dict[str, int] = {}
        for k in key_cols:
            eid = out_ids.get(k)
            if eid is None:
                return None
            targets[k] = eid
        # Walk down until BOTH (a) the node computes the same row
        # multiset as the base frame — sameResult, Spark's canonicalized
        # comparison; true only when everything above the base subtree
        # is alias-trivia, itself row-local by construction — and (b)
        # every target id resolved to a base OUTPUT id. (a) alone fires
        # early on rename projects (canonicalization ignores names)
        # before the alias chain is consumed; (b) alone would accept a
        # pass-through key under a non-row-local sibling (a window
        # column computed over the unpruned row set).
        while not (
            node.sameResult(jbase)
            and all(eid in base_ids for eid in targets.values())
        ):
            nn = str(node.nodeName())
            if nn not in _ROW_LOCAL_NODES:
                return None
            if nn == "Project":
                plist = {
                    ne.exprId().id(): ne
                    for ne in _jseq(node.projectList())
                }
                for k, eid in targets.items():
                    ne = plist.get(eid)
                    if ne is None:
                        return None
                    cls = str(ne.getClass().getSimpleName())
                    if cls == "Alias":
                        child = ne.child()
                        if (
                            str(child.getClass().getSimpleName())
                            != "AttributeReference"
                        ):
                            return None
                        targets[k] = child.exprId().id()
                    elif cls != "AttributeReference":
                        return None
            children = node.children()
            if children.size() != 1:
                return None
            node = children.apply(0)
        mapping = {}
        for k, eid in targets.items():
            base_name = base_ids.get(eid)
            if base_name is None:
                return None
            mapping[k] = base_name
        if len(set(mapping.values())) != len(mapping):
            return None  # two keys collapsing onto one base column
        return mapping
    except Exception:  # noqa: BLE001 — pruning is best-effort, never fail a read
        return None


class Stream:
    def __init__(
        self,
        spark: SparkSession,
        name: str,
        static_fn: Callable[[int | None], DataFrame],
        stream_fn: Callable[[], DataFrame] | None = None,
        change_table: "ChangeTable | None" = None,
        transforms: tuple[Callable[[DataFrame], DataFrame], ...] = (),
    ):
        self.spark = spark
        self.name = name
        self._static_fn = static_fn
        self._stream_fn = stream_fn
        self.change_table = change_table
        self._transforms = transforms
        self._primary_keys: tuple[str, ...] = ()
        self._sequence_by: tuple[str, ...] = ()
        self._partition_by: tuple[str, ...] = ()
        self._ignore_deletes: bool = False
        # first change-feed version an incremental consumer starts at
        # (reference ``startingVersion``, elzyme/streams.py:126-144); None =
        # from the beginning. Seeds the consumer's initial watermark on its
        # FIRST start only — an existing checkpoint always wins.
        self._starting_version: int | None = None
        # addressing metadata (reference accessors elzyme/streams.py:149-193)
        self._path: str | None = None
        self._table_name: str | None = None

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------
    @staticmethod
    def fromDataFrame(df: DataFrame, name: str = "df") -> "Stream":
        """Static source from an in-memory DataFrame (batch twin)."""
        return Stream(df.sparkSession, name, lambda version, d=df: d)

    @staticmethod
    def fromPath(
        spark: SparkSession,
        path: str,
        fmt: str = "parquet",
        name: str | None = None,
        startingVersion: int | None = None,
    ) -> "Stream":
        """Source from a file path (reference ``Stream.fromPath``,
        elzyme/streams.py:126-134). A path holding a ChangeTable (the
        engine's Delta-CDF analog — anything created or written by this
        engine) resolves to the full incremental stream, honoring
        ``startingVersion`` exactly as the reference's CDF reader does:
        the consumer's first trigger starts at that commit, skipping the
        earlier history (no backfill of untouched keys — Delta CDF
        semantics). Any other path is a static source (parquet/orc/json/
        csv) whose pipelines run in batch mode."""
        from .changelog import ChangeTable

        name = name or path.rstrip("/").split("/")[-1].split(".")[0]
        if ChangeTable.exists(path.rstrip("/")):
            return Stream.fromChangeTable(
                ChangeTable(spark, path.rstrip("/")), name,
                startingVersion=startingVersion,
            )
        from .sources.delta import has_delta, is_delta_path

        if is_delta_path(path.rstrip("/")):
            # an existing Delta table root (the reference's native source):
            # route through the CDF interop adapter when the runtime is
            # present, fail with guidance instead of misreading the parquet
            # parts as a static table when it is not
            if not has_delta():
                raise ImportError(
                    f"{path!r} is a Delta table (_delta_log present) but "
                    "delta-spark is not installed; pip install delta-spark "
                    "or read a native ChangeTable path instead"
                )
            return Stream.fromDelta(
                spark, path.rstrip("/"), name=name,
                startingVersion=startingVersion,
            )
        if startingVersion is not None:
            raise ValueError(
                f"startingVersion requires a versioned (ChangeTable) path; "
                f"{path!r} is a static {fmt} source"
            )
        return Stream(
            spark, name, lambda version: spark.read.format(fmt).load(path)
        ).setPath(path)

    @staticmethod
    def fromTable(
        spark: SparkSession,
        table: str,
        name: str | None = None,
        startingVersion: int | None = None,
    ) -> "Stream":
        """Source by table name (reference ``Stream.fromTable``,
        elzyme/streams.py:136-144, which streams Delta CDF by catalog name).
        A name registered as a ChangeTable (anything created or written by
        this engine) resolves to the full incremental stream — change feed +
        versioned snapshots; an unregistered name falls back to a static
        catalog read (batch twin)."""
        from .changelog import ChangeTable, lookup_table

        path = lookup_table(table)
        if path is not None and ChangeTable.exists(path):
            s = Stream.fromChangeTable(
                ChangeTable(spark, path), name or table.split(".")[-1],
                startingVersion=startingVersion,
            )
            s._table_name = table
            return s
        if startingVersion is not None:
            raise ValueError(
                f"startingVersion requires a ChangeTable-backed name; "
                f"{table!r} resolves to a static catalog table"
            )
        s = Stream(
            spark, name or table.split(".")[-1],
            lambda version: spark.read.table(table),
        )
        s._table_name = table
        return s

    @staticmethod
    def fromDelta(
        spark: SparkSession,
        source: str,
        table: bool = False,
        name: str | None = None,
        startingVersion: int | None = None,
    ) -> "Stream":
        """Incremental source over a REAL Delta Lake table with CDF enabled
        — the migration bridge for reference users (the reference reads
        Delta CDF natively, elzyme/streams.py:126-144). ``source`` is a
        table path by default, a catalog name with ``table=True``. The
        Delta table rides the same ChangeTable duck surface
        (sources/delta.DeltaSourceTable), so it can feed any incremental
        pipeline: snapshots pin with ``versionAsOf``, the change feed is
        the normalized CDF batch read, and the microbatch governor's byte
        budget comes from commit operationMetrics. Deltas PROPAGATE by
        default here (Delta CDF carries them; the reference filters them —
        chain ``.ignoreDeletes()`` for strict reference behavior). Targets
        stay native: a Delta source never becomes a write target.
        Requires delta-spark (raises ImportError with guidance otherwise).
        """
        from .sources.delta import DeltaSourceTable

        adapter = (
            DeltaSourceTable(spark, table=source, name=name)
            if table
            else DeltaSourceTable(spark, path=source, name=name)
        )
        s = Stream.fromChangeTable(adapter, adapter.name, startingVersion)
        if table:
            s._table_name = source
        else:
            s._path = source
        return s

    @staticmethod
    def fromChangeTable(
        ct: "ChangeTable",
        name: str | None = None,
        startingVersion: int | None = None,
    ) -> "Stream":
        """Incremental source over our changelog substrate — change feed via
        the Structured Streaming file source, snapshots pinned by version
        (reference CDF source: elzyme/streams.py:126-144).
        ``startingVersion`` pins where a consumer's FIRST start begins in
        the change history (Delta CDF ``startingVersion`` semantics): both
        the native readStream and the IVM runtime's initial watermark skip
        commits below it; an existing checkpoint/progress file wins over it
        on restart."""
        if startingVersion is None:
            stream_fn = ct.read_change_stream
        else:
            from pyspark.sql import functions as F

            def stream_fn(*a, _sv=startingVersion, **kw):
                return ct.read_change_stream(*a, **kw).where(
                    F.col(COMMIT_VERSION) >= F.lit(_sv)
                )

        s = Stream(
            ct.spark,
            name or ct.name,
            static_fn=lambda version: ct.snapshot(version),
            stream_fn=stream_fn,
            change_table=ct,
        )
        s._starting_version = startingVersion
        return s

    # ------------------------------------------------------------------
    # metadata builders (fluent, reference elzyme/streams.py:215-233)
    # ------------------------------------------------------------------
    def primaryKeys(self, *keys: str) -> "Stream":
        self._primary_keys = tuple(keys)
        return self

    def setName(self, name: str) -> "Stream":
        """Rename the stream (reference ``setName``, elzyme/streams.py:178)."""
        self.name = name
        return self

    def setPath(self, path: str) -> "Stream":
        """Reference accessor spelling (elzyme/streams.py:187)."""
        self._path = path
        return self

    def path(self) -> str | None:
        """Backing path, when path-addressed (reference elzyme/streams.py:191;
        ChangeTable-backed streams report the substrate path)."""
        if self._path is None and self.change_table is not None:
            return self.change_table.path
        return self._path

    def isTable(self) -> bool:
        """Whether this source is addressed by a catalog/registry table name
        (reference elzyme/streams.py:149)."""
        return self._table_name is not None

    def _name_parts(self) -> tuple[str, str, str]:
        parts = (self._table_name or "").split(".")
        catalog, schema, table = "", "", parts[-1] if parts else ""
        if len(parts) == 3:
            catalog, schema = parts[0], parts[1]
        elif len(parts) == 2:
            schema = parts[0]
        return catalog, schema, table

    def getCatalog(self) -> str | None:
        """Catalog component of a 3-level table name (reference
        elzyme/streams.py:163 — Databricks namespace; here the registry name
        is parsed, no metastore round-trip)."""
        return self._name_parts()[0] if self.isTable() else None

    def getSchema(self) -> str | None:
        """Schema (database) component of the table name (reference
        elzyme/streams.py:168 — NAMESPACE schema, not the StructType)."""
        return self._name_parts()[1] if self.isTable() else None

    def getTableName(self) -> str | None:
        """Bare table component of the table name (reference
        elzyme/streams.py:173)."""
        return self._name_parts()[2] if self.isTable() else None

    def getPrimaryKeys(self) -> tuple[str, ...]:
        """Reference accessor spelling (elzyme/streams.py:219)."""
        return self._primary_keys

    def getSequenceColumns(self) -> tuple[str, ...]:
        """Reference accessor spelling (elzyme/streams.py:226)."""
        return self._sequence_by

    def containsColumn(self, column_name: str) -> bool:
        """Reference accessor (elzyme/streams.py:194)."""
        return column_name in self.columns()

    def sequenceBy(self, *cols: str) -> "Stream":
        self._sequence_by = tuple(cols)
        return self

    def ignoreDeletes(self, flag: bool = True) -> "Stream":
        """Strict reference-compat mode: drop ``delete`` change images from
        this source's feed before the incremental runtime sees them — the
        reference's CDF readers silently skip deletes
        (``ignoreDeletes``/filtered change types, elzyme/streams.py:132,142),
        so a deleted upstream row never retracts downstream state there.
        This engine PROPAGATES deletes by default (strictly better — SCD2
        and cascade-correct views depend on it); flip this on per source
        only when migrating a reference pipeline that depends on the old
        keep-stale-rows behavior. Note: if a later change touches the same
        key, the affected-slice recompute reads the snapshot (where the row
        is gone) and the stale downstream row is reconciled away then —
        deletes are deferred, not resurrected."""
        self._ignore_deletes = bool(flag)
        return self

    def partitionBy(self, *cols: str) -> "Stream":
        self._partition_by = tuple(cols)
        return self

    def to(self, func: Callable[[DataFrame], DataFrame]) -> "Stream":
        """Rewrite both the static and streaming reader with an arbitrary
        DataFrame transform (rename, withColumn, filter — reference
        ``Stream.to``, elzyme/streams.py:235-240)."""
        clone = Stream(
            self.spark,
            self.name,
            self._static_fn,
            self._stream_fn,
            self.change_table,
            self._transforms + (func,),
        )
        clone._primary_keys = self._primary_keys
        clone._sequence_by = self._sequence_by
        clone._partition_by = self._partition_by
        clone._ignore_deletes = self._ignore_deletes
        clone._starting_version = self._starting_version
        clone._path = self._path
        clone._table_name = self._table_name
        return clone

    def expect(self, rules: dict, mode: str = "drop") -> "Stream":
        """DLT-expectations gate on the stream source: rows failing any
        rule are dropped (``mode="drop"``) or tagged with a
        ``_violations`` array (``mode="mark"``) before every downstream
        stage — applied identically to the batch twin and each
        incremental slice, so both executions see the same gated rows.
        Map-only (operators/expectations.py enforce); for fail-the-write
        semantics use ChangeTable CHECK constraints, and for diverting
        bad rows use FileIngest's quarantine gate."""
        from .operators.expectations import enforce

        return self.to(lambda df: enforce(df, rules, mode=mode))

    # ------------------------------------------------------------------
    # accessors
    # ------------------------------------------------------------------
    @property
    def primary_keys(self) -> tuple[str, ...]:
        return self._primary_keys

    @property
    def sequence_columns(self) -> tuple[str, ...]:
        return self._sequence_by

    @property
    def partition_columns(self) -> tuple[str, ...]:
        return self._partition_by

    def _apply_transforms(self, df: DataFrame) -> DataFrame:
        for fn in self._transforms:
            df = fn(df)
        return df

    def static(self, version: int | None = None) -> DataFrame:
        """Static snapshot, optionally pinned at a commit version (reference
        ``Stream.static`` / ``readAtVersion``, elzyme/streams.py:118-124,
        203-208)."""
        return self._apply_transforms(self._static_fn(version))

    def static_pruned(
        self,
        version: int | None,
        scope_keys: DataFrame,
        key_cols: Sequence[str],
        small: bool = True,
    ) -> DataFrame:
        """Version-pinned snapshot, file-pruned to a SUPERSET of the rows
        whose ``key_cols`` tuple appears in ``scope_keys`` (reader-side
        data skipping via the substrate's manifest footer stats —
        ChangeTable.snapshot_pruned). Callers must still apply their
        exact filter; the IVM runtime layers its broadcast/bloom/shuffle
        semi-join ladder on top.

        Sources with ``.to`` transforms — the reference's idiomatic
        shape renames every stream at declaration
        (reference tests/SetupInputStream.py:170-202) — prune through a
        PROVEN column mapping (r11): the analyzed plan resolves each
        post-transform key column back to its base column when the
        transform chain is row-local rename/projection/filter
        (``_map_cols_to_base``); the scope values are then identical to
        base values and the base read prunes as if unrenamed. Opaque
        transforms (computed keys, windows, aggregates, joins) and
        substrates without scoped reads (static parquet/DataFrame
        sources, Delta adapter) keep the sound full-read fallback."""
        ct = self.change_table
        if ct is None or not hasattr(ct, "snapshot_pruned"):
            return self.static(version)
        key_cols = list(key_cols)
        if not self._transforms:
            return self._apply_transforms(
                ct.snapshot_pruned(
                    scope_keys, key_cols, version=version, small=small
                )
            )
        mapping = self._transform_key_mapping(key_cols, version)
        if mapping is None:
            return self.static(version)
        from pyspark.sql import functions as F  # noqa: PLC0415 - cycle-free

        base_cols = [mapping[k] for k in key_cols]
        base_scope = scope_keys.select(
            *[F.col(f"`{k}`").alias(mapping[k]) for k in key_cols]
        )
        return self._apply_transforms(
            ct.snapshot_pruned(
                base_scope, base_cols, version=version, small=small
            )
        )

    def _transform_key_mapping(
        self, key_cols: Sequence[str], version: int | None
    ) -> dict | None:
        """Cached post-transform→base column mapping for this stream's
        ``.to`` chain (the chain is frozen per clone, and snapshots read
        under the table's CURRENT schema at every version, so the
        mapping is version-independent). None = not provable."""
        cache = self.__dict__.setdefault("_key_map_cache", {})
        ck = tuple(key_cols)
        if ck not in cache:
            base = self._static_fn(version)
            cache[ck] = _map_cols_to_base(
                self._apply_transforms(base), base, key_cols
            )
        return cache[ck]

    def stream(self) -> DataFrame:
        """The change-feed readStream (deletes ride along as ``_change_type =
        'delete'`` rows — unlike the reference, which silently drops deletes
        at the source (elzyme/streams.py:132,142), we propagate them and let
        the sink decide; see SURVEY.md §4 'known semantic edge cases')."""
        if self._stream_fn is None:
            raise ValueError(f"stream {self.name!r} is static-only (no change feed)")
        return self._apply_transforms(self._stream_fn())

    def latest_version(self) -> int:
        """Current committed version (reference ``getLatestVersion``,
        elzyme/streams.py:210-213)."""
        if self.change_table is None:
            return 0
        return self.change_table.version()

    def columns(self) -> list[str]:
        """User-visible columns — change-feed metadata hidden (reference
        ``excludedColumns``, elzyme/streams.py:108,197-198)."""
        return [c for c in self.static().columns if c not in METADATA_COLUMNS]

    # ------------------------------------------------------------------
    # column references
    # ------------------------------------------------------------------
    def __getitem__(self, name: str):
        if name == "*":
            return StarRef(self)
        return ColumnRef(self, name)

    # ------------------------------------------------------------------
    # pipeline entry points
    # ------------------------------------------------------------------
    def join(self, right: "Stream", how: str = "inner"):
        """Start a join pipeline (reference ``Stream.join``,
        elzyme/streams.py:229-230). Supported: inner/left/right, as in the
        reference (elzyme/joins.py:322-326)."""
        from .operators.joins import JoinBuilder

        return JoinBuilder(self, right, how)

    def groupBy(self, *cols: str):
        """Start an aggregation pipeline (reference ``Stream.groupBy``,
        elzyme/streams.py:232-233)."""
        from .operators.aggs import GroupBy

        return GroupBy(self, cols)

    def writeToPath(
        self,
        path: str,
        partition_by: "Sequence[str]" = (),
        generated_columns: dict[str, str] | None = None,
    ):
        """Maintained projection — materialize this stream's (transformed)
        rows as a keyed ChangeTable kept converged under CDC: the classic
        incremental materialized view, and the missing rung below
        join/groupBy pipelines (a ``.to()``-enriched table with no second
        input). Requires ``primaryKeys()``; row-local transforms only (the
        source-transform contract). Returns the ordinary incremental
        writer (``.run()`` / ``.start()`` / ``.toDF()``)."""
        from .streaming.incremental import IncrementalViewWriter

        return IncrementalViewWriter(
            self, path, partition_by=tuple(partition_by),
            generated_columns=generated_columns,
        )

    def writeToTable(
        self,
        table_name: str,
        partition_by: "Sequence[str]" = (),
        generated_columns: dict[str, str] | None = None,
    ):
        """Name-addressed ``writeToPath`` (resolves through the session
        registry, registers the result for ``Stream.fromTable``)."""
        from .changelog import register_table, resolve_table_path
        from .streaming.incremental import IncrementalViewWriter

        path = resolve_table_path(self.spark, table_name)
        register_table(table_name, path)
        return IncrementalViewWriter(
            self, path, partition_by=tuple(partition_by),
            generated_columns=generated_columns,
        )

    def __repr__(self) -> str:
        return f"Stream({self.name!r}, pk={self._primary_keys}, seq={self._sequence_by})"


class PruneColumn:
    """API-parity marker for the reference's dynamic merge pruning
    (``prune``, elzyme/streams.py:86-94; IN-list injection
    elzyme/joins.py:619-632). The reference needs it because a Delta MERGE
    scans the whole target unless the condition names partition values. In
    this engine the equivalent bound holds structurally: ``replace_keys`` /
    ``merge`` consult the manifest and rewrite only the hash-parts that
    contain affected keys (changelog.py ``_collect_parts``), so accepting a
    PruneColumn changes nothing — the scan it would prune never happens.
    Use ``Stream.partitionBy`` to align parts with a domain column (the
    reference's join-aligned partitioning, elzyme/joins.py:676-682)."""

    def __init__(self, ref: ColumnRef):
        self.ref = ref


def prune(ref: ColumnRef) -> PruneColumn:
    return PruneColumn(ref)
