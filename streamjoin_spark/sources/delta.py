"""Delta Lake CDF interop — point a ``Stream`` at a *real* Delta table.

The reference runs exclusively on Delta tables with Change Data Feed
enabled (``Stream.fromPath``/``fromTable``, elzyme/streams.py:126-144:
``readStream.format('delta').option('readChangeFeed', 'true')`` with
deletes filtered and ``_commit_timestamp`` dropped; snapshots via
``option('versionAsOf', v)``, elzyme/streams.py:118-124). This engine's
native substrate is its own versioned-parquet :class:`ChangeTable`, so a
migrating reference user with *existing* Delta tables needs a bridge —
this module is it.

Two layers, separable on purpose:

- :func:`normalize_cdf` — the pure, Spark-only translation from Delta's
  CDF output shape onto the engine's change-feed contract. Delta and this
  engine share the ``_change_type`` vocabulary (``insert`` /
  ``update_preimage`` / ``update_postimage`` / ``delete``) and the
  ``_commit_version`` column by design (streams.py METADATA_COLUMNS mirrors
  Delta CDF), so translation is: drop ``_commit_timestamp``, cast
  ``_commit_version`` to long, optionally apply the reference-compat
  delete filter and a ``startingVersion`` lower bound. Testable without
  delta-spark installed.
- :class:`DeltaSourceTable` — a READ-ONLY adapter exposing a Delta table
  through the ChangeTable duck surface the IVM runtime consumes
  (``version() / snapshot(v) / read_change_feed(v) / read_change_stream()
  / change_bytes(v) / name / path``), so a Delta table can be the *input*
  of any incremental pipeline (joins, aggs, corpus pipelines). Targets
  stay on the native substrate: this engine's crash-safe commit protocol
  needs its own manifest layout, so ``merge``/``append`` raise with a
  pointer instead of corrupting a Delta log it doesn't own.

delta-spark is not installed in this environment, so everything JVM-side
is behind :func:`require_delta` (the same import-guard pattern as the
Pillow-gated media decode, operators/multimodal.py): construction raises a
clear error with install guidance when the runtime is absent, the
translation layer and duck-surface wiring are exercised by unit tests, and
a skip-marked live test covers the real-runtime path.

Scale posture: snapshots and change feeds are Delta scans — partition
pruning and file skipping are Delta's job and arrive intact; the governor's
byte currency comes from commit ``operationMetrics`` (driver-side history
probe, no Spark job), so backlog chunking works on Delta inputs exactly as
on native ones.
"""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streams import COMMIT_VERSION, DELETE, METADATA_COLUMNS

COMMIT_TIMESTAMP = "_commit_timestamp"

# scoped Delta reads collect at most this many distinct key tuples and
# push per-column IN filters into the scan (Delta's own data skipping
# then prunes files by its log stats); larger scopes read the full
# snapshot — the plan-size-bounded analog of the native substrate's
# _SCOPE_VALUES_MAX value-list pruning
SNAPSHOT_PRUNE_VALUES_MAX = 8192


def scope_filter(scope_keys: DataFrame, key_cols, cap: int | None = None):
    """Per-column membership Column over a BOUNDED key scope, or None
    when the scope is too big / NaN-carrying / uncollectable — the
    pushdown-shaped rendition of reader-side data skipping for
    substrates that do their own file skipping (Delta). Per-column IN
    (the Cartesian superset of the tuple set) keeps the result a sound
    SUPERSET of the scoped rows; null keys ride an isNull disjunct
    (join-key eqNullSafe semantics); any NaN refuses (NaN membership
    semantics differ across engines). Pure Spark — unit-testable
    without delta-spark."""
    cap = SNAPSHOT_PRUNE_VALUES_MAX if cap is None else cap
    key_cols = list(key_cols)
    try:
        rows = (
            scope_keys.select(*key_cols)
            .dropDuplicates(key_cols)
            .limit(cap + 1)
            .collect()
        )
    except Exception:  # noqa: BLE001 — pruning is best-effort
        return None
    if len(rows) > cap:
        return None
    if not rows:
        # an EMPTY scope is provably matchless — a zero-file filter, not
        # a full-snapshot fallback (r11 review finding: an all-cancelled
        # churn slice otherwise paid a whole-table scan for nothing)
        return F.lit(False)
    cond = None
    try:
        for i, c in enumerate(key_cols):
            vals = {r[i] for r in rows}
            has_null = None in vals
            vals = {v for v in vals if v is not None}
            if any(isinstance(v, float) and v != v for v in vals):
                return None
            e = F.col(f"`{c}`").isin(*vals) if vals else F.lit(False)
            if has_null:
                e = e | F.col(f"`{c}`").isNull()
            cond = e if cond is None else (cond & e)
    except Exception:  # noqa: BLE001 — unhashable/unliteralizable keys:
        return None  # sound full-snapshot fallback, not a failed read
    return cond


def has_delta() -> bool:
    """Whether the delta-spark python package is importable (the JVM side
    travels with it via ``configure_spark_with_delta_pip``)."""
    return importlib.util.find_spec("delta") is not None


def require_delta() -> None:
    if not has_delta():
        raise ImportError(
            "Delta Lake interop needs the delta-spark package "
            "(pip install delta-spark) and a session built with "
            "delta.sql.DeltaSparkSessionExtension; see "
            "https://docs.delta.io/latest/quick-start.html"
        )


def is_delta_path(path: str) -> bool:
    """A directory with a ``_delta_log`` is a Delta table root."""
    return os.path.isdir(os.path.join(path, "_delta_log"))


def normalize_cdf(
    df: DataFrame,
    ignore_deletes: bool = False,
    starting_version: int | None = None,
) -> DataFrame:
    """Delta CDF output → the engine's change-feed contract.

    Shared vocabulary makes this a projection, not a rewrite: keep every
    user column plus ``_change_type`` / ``_commit_version`` (cast long —
    Delta emits long already; the cast pins the contract), drop
    ``_commit_timestamp`` (the reference does the same,
    elzyme/streams.py:133,143 — the engine stamps commit wall-clocks in
    its own manifests, never in the feed). ``ignore_deletes=True`` applies
    the reference's delete filter at the same place the reference does;
    the engine default PROPAGATES deletes (Stream.ignoreDeletes is the
    strict-compat opt-out). ``starting_version`` lower-bounds the feed for
    batch CDF reads that could not push it into the reader option.
    Map-only: one filter + projection, no shuffle.
    """
    cols = [c for c in df.columns if c not in (COMMIT_TIMESTAMP, *METADATA_COLUMNS)]
    out = df.select(
        *cols,
        F.col("_change_type"),
        F.col(COMMIT_VERSION).cast("long").alias(COMMIT_VERSION),
    )
    if starting_version is not None:
        out = out.where(F.col(COMMIT_VERSION) >= F.lit(int(starting_version)))
    if ignore_deletes:
        out = out.where(F.col("_change_type") != DELETE)
    return out


class DeltaSourceTable:
    """Read-only ChangeTable-duck adapter over a Delta table with CDF on.

    Address by ``path`` (a ``_delta_log`` directory root) or by catalog
    ``table`` name — exactly the reference's two constructors
    (elzyme/streams.py:126-144). Every method is the Delta rendition of
    the native changelog call the IVM runtime makes:

    - ``version()`` — latest commit from ``DESCRIBE HISTORY`` (bounded
      1-row aggregate).
    - ``snapshot(v)`` — ``versionAsOf`` read (reference ``readAtVersion``,
      elzyme/streams.py:118-124).
    - ``read_change_feed(v_from)`` — batch CDF read from ``v_from``,
      normalized, capped at the head observed NOW so a concurrent writer
      cannot leak a half-read commit into a pinned slice (the same
      invariant the native substrate enforces in
      changelog.read_change_feed).
    - ``read_change_stream()`` — streaming CDF read, normalized.
    - ``change_bytes(v)`` — governor byte currency from the commit's
      ``operationMetrics`` (best effort: sum of byte-valued metrics;
      0 when the operation reports none, which only makes chunking more
      eager, never unsafe).

    ``seed_watermark = -1``: unlike the native substrate (whose commit 0
    is an empty CREATE), a Delta table carries its initial data in
    version 0 (CTAS / first write with the CDF table property), so an IVM
    consumer's first watermark must sit BELOW 0 for the first slice to
    cover ``[0, head]``. Caveat the adapter cannot paper over: if CDF was
    enabled at some later version k, Delta's CDF reader itself raises on
    ``startingVersion < k`` — loud, not silent; such tables must be
    migrated by bulk-loading a snapshot and pinning
    ``startingVersion >= k`` on the stream.
    """

    # first-watermark floor for IVM consumers (see class docstring)
    seed_watermark = -1

    def __init__(
        self,
        spark: SparkSession,
        path: str | None = None,
        table: str | None = None,
        name: str | None = None,
    ):
        require_delta()
        if (path is None) == (table is None):
            raise ValueError("pass exactly one of path= or table=")
        self.spark = spark
        self.path = path
        self.table = table
        self.name = name or (
            table.split(".")[-1] if table else path.rstrip("/").split("/")[-1]
        )

    # -- readers -----------------------------------------------------
    def _reader(self, stream: bool = False):
        r = (self.spark.readStream if stream else self.spark.read).format("delta")
        return r

    def _load(self, reader):
        return reader.table(self.table) if self.table else reader.load(self.path)

    def _history(self) -> DataFrame:
        ref = self.table or f"delta.`{self.path}`"
        return self.spark.sql(f"DESCRIBE HISTORY {ref}")

    # -- ChangeTable duck surface -------------------------------------
    def version(self) -> int:
        row = self._history().agg(F.max("version").alias("v")).collect()[0]
        return int(row["v"] or 0)

    def snapshot(self, version: int | None = None) -> DataFrame:
        r = self._reader()
        if version is not None:
            r = r.option("versionAsOf", int(version))
        return self._load(r)

    def snapshot_pruned(
        self,
        scope_keys: DataFrame,
        key_cols,
        version: int | None = None,
        small: bool = True,
    ) -> DataFrame:
        """Scoped version-pinned read (r11): the Delta rendition of the
        native substrate's reader-side data skipping. A bounded scope
        (``small``, ≤ SNAPSHOT_PRUNE_VALUES_MAX tuples) becomes
        per-column IN filters pushed into the Delta scan — Delta's
        transaction-log per-file stats then skip files exactly as the
        native manifest stats do; bigger/unbounded scopes read the full
        snapshot (sound fallback). Returns a SUPERSET of the scoped
        rows (per-column membership is the Cartesian superset of the
        tuple set); callers keep their exact semi filter, same contract
        as ChangeTable.snapshot_pruned. Soundness needs ONE evaluation
        of ``scope_keys`` between this collect and the caller's filter —
        the IVM runtime localCheckpoints its scopes (r10)."""
        snap = self.snapshot(version)
        if not small:
            return snap
        cond = scope_filter(scope_keys, key_cols)
        return snap if cond is None else snap.where(cond)

    def read_change_feed(self, starting_version: int = 1) -> DataFrame:
        head = self.version()
        df = self._load(
            self._reader()
            .option("readChangeFeed", "true")
            .option("startingVersion", int(starting_version))
        )
        return normalize_cdf(df).where(F.col(COMMIT_VERSION) <= F.lit(head))

    def read_change_range(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Pinned-range CDF read via Delta's native startingVersion /
        endingVersion options — Delta prunes the commit log to the range
        server-side, the same O(range) contract as
        changelog.ChangeTable.read_change_range — including the empty
        backlog range (v_from > v_to, e.g. an idle join leg), which the
        native read answers with an empty frame but Delta's reader rejects
        as end-before-start: serve it from the always-valid [0, 0] commit
        filtered to nothing."""
        head = self.version()
        v_to = head if v_to is None else min(int(v_to), head)
        v_from = int(v_from)
        if v_to < v_from:
            df = self._load(
                self._reader()
                .option("readChangeFeed", "true")
                .option("startingVersion", 0)
                .option("endingVersion", 0)
            )
            return normalize_cdf(df).where(F.lit(False))
        df = self._load(
            self._reader()
            .option("readChangeFeed", "true")
            .option("startingVersion", v_from)
            .option("endingVersion", int(v_to))
        )
        return normalize_cdf(df)

    def read_change_stream(
        self, max_files_per_trigger: int | None = None
    ) -> DataFrame:
        r = self._reader(stream=True).option("readChangeFeed", "true")
        if max_files_per_trigger is not None:
            r = r.option("maxFilesPerTrigger", int(max_files_per_trigger))
        return normalize_cdf(self._load(r))

    def change_bytes(self, version: int) -> int:
        rows = (
            self._history()
            .where(F.col("version") == int(version))
            .select("operationMetrics")
            .collect()
        )
        if not rows or rows[0]["operationMetrics"] is None:
            return 0
        total = 0
        for k, v in rows[0]["operationMetrics"].items():
            if "bytes" in k.lower():
                try:
                    total += int(v)
                except (TypeError, ValueError):
                    pass
        return total

    def snapshot_as_of(self, ts) -> DataFrame:
        """TIMESTAMP AS OF read (the native ChangeTable exposes the same
        call off its commit wall-clock stamps; Delta resolves it from the
        transaction log). ``ts`` is a timestamp string or datetime,
        passed to Delta's ``timestampAsOf`` reader option."""
        return self._load(self._reader().option("timestampAsOf", ts))

    def describe_history(self) -> DataFrame:
        """DESCRIBE HISTORY passthrough — same surface as
        ``ChangeTable.describe_history()`` (version, timestamp, operation,
        operationMetrics), straight from the Delta log."""
        return self._history()

    # -- writes are out of scope for the adapter ----------------------
    def _read_only(self, op: str):
        raise NotImplementedError(
            f"DeltaSourceTable is a read-only CDF source; {op} targets use "
            "the native ChangeTable substrate (ChangeTable.create + "
            ".writeToPath) — the engine's crash-safe commit protocol owns "
            "its own manifest layout and will not write into a Delta log"
        )

    def merge(self, *a, **kw):
        self._read_only("merge")

    def append(self, *a, **kw):
        self._read_only("append")

    def delete_where(self, *a, **kw):
        self._read_only("delete")


# ---------------------------------------------------------------------------
# Delta as a SINK: land an incremental pipeline in a real Delta table
# ---------------------------------------------------------------------------

SINK_FLAG = "__sj_new"


def sink_source(
    new_slice: DataFrame,
    affected_keys: DataFrame,
    scope_keys,
    row_keys,
    target_df: DataFrame,
) -> DataFrame:
    """Build the MERGE source for a delete-propagating external sink — the
    external-table rendition of ``ChangeTable.replace_keys``' scope-diff.

    A foreachBatch slice carries the *current correct rows* for the
    affected scope (keyed by ``scope_keys``, the preserved side's primary
    keys); rows that vanished — a deleted upstream key, or one row of a
    still-present key dropping out — are simply absent, so a MERGE fed
    only the slice can never delete them. The source is the full-outer
    diff of the slice against the sink's CURRENT rows within the scope:

    - slice-only row (``__sj_new`` set, no old match)  → insert
    - both sides                                        → update
    - old-only row (``__sj_new`` null)                 → delete

    ``row_keys`` is the sink row identity (must be unique per row and
    present in the slice's columns — e.g. the order key of a
    customers⋈orders pipeline, whose scope key is the customer id).
    Pure Spark, testable without delta-spark. Scale: one semi-join of the
    sink against the governor-bounded scope + one scope-sized full-outer
    diff — the same physics replace_keys pays on the native substrate;
    the sink is never scanned beyond the scope filter.
    """
    scope_keys, row_keys = list(scope_keys), list(row_keys)
    scope = affected_keys.select(*scope_keys).dropDuplicates(scope_keys)
    # NULL-SAFE joins throughout: outer-join targets legitimately carry
    # NULL key parts (the replace_keys contract), and the MERGE condition
    # downstream is null-safe (<=>) — a plain equality here would emit a
    # vanish row AND a survivor row for the same NULL-keyed target row,
    # and Delta MERGE aborts on multiple source matches.
    def ns_cond(a, b, cols):
        cond = None
        for k in cols:
            c = F.col(f"{a}.`{k}`").eqNullSafe(F.col(f"{b}.`{k}`"))
            cond = c if cond is None else (cond & c)
        return cond

    old = (
        target_df.alias("t")
        .join(scope.alias("k"), ns_cond("t", "k", scope_keys), "left_semi")
        .select(*row_keys)
        .withColumn("__sj_old", F.lit(True))
    )
    new = new_slice.withColumn(SINK_FLAG, F.lit(True))
    joined = new.alias("n").join(
        old.alias("o"), ns_cond("n", "o", row_keys), "full_outer"
    )
    other = [c for c in new_slice.columns if c not in row_keys]
    return joined.select(
        *[
            F.coalesce(F.col(f"n.`{k}`"), F.col(f"o.`{k}`")).alias(k)
            for k in row_keys
        ],
        *[F.col(f"n.`{c}`").alias(c) for c in other],
        F.col(f"n.`{SINK_FLAG}`").alias(SINK_FLAG),
    )


def delta_sink(
    spark: SparkSession,
    target: str,
    scope_keys,
    row_keys=None,
    table: bool = False,
):
    """foreachBatch sink that lands a pipeline in a Delta table — ONE
    atomic MERGE per governed microbatch, deletes included.

    Returns a 3-parameter sink ``(new_slice, affected_keys, batch_id)``
    (the extended foreachBatch contract — _ForeachStage passes the
    affected-key scope to 3-parameter sinks): within the affected scope,
    vanished rows delete, surviving rows update, new rows insert, all in
    one Delta transaction, so a crash between microbatches redelivers at
    most one idempotent MERGE (the reference's checkpointed-foreachBatch
    guarantee, elzyme/joins.py:536-554, extended with the delete
    propagation its delete-dropping CDF cannot express).

    ``scope_keys`` = the affected-key columns (the preserved side's
    primary keys); ``row_keys`` = the sink's unique row identity (default:
    the scope keys, correct for maintained views and grouped aggregates
    where they coincide).

    Scale: the MERGE ON condition is row-key equality — Delta's file
    pruning applies; the source is scope-sized (governor-bounded), never
    snapshot-sized.
    """
    require_delta()
    from delta.tables import DeltaTable  # noqa: PLC0415

    scope_keys = list(scope_keys)
    row_keys = list(row_keys) if row_keys is not None else scope_keys

    def sink(new_slice: DataFrame, affected_keys: DataFrame, _batch_id: int):
        dt = (
            DeltaTable.forName(spark, target)
            if table
            else DeltaTable.forPath(spark, target)
        )
        src = sink_source(
            new_slice, affected_keys, scope_keys, row_keys, dt.toDF()
        )
        data_cols = [c for c in src.columns if c != SINK_FLAG]
        set_map = {c: f"s.`{c}`" for c in data_cols}
        cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in row_keys)
        (
            dt.alias("t")
            .merge(src.alias("s"), cond)
            .whenMatchedDelete(condition=f"s.`{SINK_FLAG}` IS NULL")
            .whenMatchedUpdate(set=set_map)
            .whenNotMatchedInsert(
                condition=f"s.`{SINK_FLAG}` IS NOT NULL", values=set_map
            )
            .execute()
        )

    return sink
