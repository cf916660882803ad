"""ChangeTable — a versioned parquet changelog (the open-source CDF substrate).

The reference keeps all state in Delta tables and connects pipeline stages
through the Delta **Change Data Feed** (reference: elzyme/streams.py:126-144
reads CDF; elzyme/joins.py:563-570 MERGEs results back). This environment has
no Delta, so the engine ships its own minimal, Spark-first equivalent with
the *same data model* — rows annotated with ``_change_type`` (``insert`` /
``update_preimage`` / ``update_postimage`` / ``delete``) and
``_commit_version`` — so that swapping in Delta/Iceberg on a real cluster is
a constructor change, not a redesign.

Layout::

    <path>/
      _changelog_meta.json      # version, keys, sequence, schema
      changes/                  # append-only: one parquet file-set per commit
      snapshots/v=N/            # full table state per committed version

Design notes for 100 TB:

- ``changes/`` is append-only and consumed by the Structured Streaming
  **file source**, giving real microbatch semantics (new commit ⇒ new files
  ⇒ new microbatch) with no custom receiver.
- ``snapshots/`` is copy-on-write like Delta; at production scale the
  rewrite is bounded by partition pruning (``partition_by``) — merges only
  rewrite partitions present in the batch, the direct analog of the
  reference's merge-pruning conjuncts (elzyme/joins.py:676-682).
- MERGE is emulated with the classic anti-join + union + window plan; all
  legs are declarative DataFrame ops, the staged batch is broadcast when
  small, and the shuffle key is the primary key — identical physics to a
  Delta MERGE minus file-skipping.
- Single-writer per table (matches the reference's one-query-per-stage
  topology, elzyme/joins.py:812-859). Commits are ordered; the metadata file
  is written last and atomically (write-temp + rename).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .streams import CHANGE_TYPE, COMMIT_VERSION, DELETE, INSERT, UPDATE_POST, UPDATE_PRE

META_FILE = "_changelog_meta.json"


class ChangeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self._meta = self._read_meta()

    # ------------------------------------------------------------------
    # metadata
    # ------------------------------------------------------------------
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, META_FILE)

    def _read_meta(self) -> dict:
        with open(self._meta_path) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)
        self._meta = meta

    @property
    def name(self) -> str:
        return self._meta["name"]

    @property
    def primary_keys(self) -> tuple[str, ...]:
        return tuple(self._meta["primary_keys"])

    @property
    def sequence_by(self) -> tuple[str, ...]:
        return tuple(self._meta["sequence_by"])

    @property
    def partition_by(self) -> tuple[str, ...]:
        return tuple(self._meta.get("partition_by", ()))

    def version(self) -> int:
        # re-read: another process (a chained upstream query) may have
        # committed since we cached (reference getLatestVersion probes the
        # table history the same way, elzyme/streams.py:210-213)
        self._meta = self._read_meta()
        return self._meta["version"]

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self._meta["schema"])

    def change_schema(self) -> T.StructType:
        fields = list(self.schema().fields)
        fields.append(T.StructField(CHANGE_TYPE, T.StringType(), False))
        fields.append(T.StructField(COMMIT_VERSION, T.LongType(), False))
        return T.StructType(fields)

    # ------------------------------------------------------------------
    # creation / existence
    # ------------------------------------------------------------------
    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(os.path.join(path, META_FILE))

    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        schema: T.StructType | DataFrame,
        primary_keys: Sequence[str],
        sequence_by: Sequence[str] = (),
        partition_by: Sequence[str] = (),
        name: str | None = None,
        overwrite: bool = False,
    ) -> "ChangeTable":
        """Create an empty change table (reference CREATE TABLE with CDF
        enabled, elzyme/joins.py:642-654)."""
        if isinstance(schema, DataFrame):
            schema = schema.schema
        if not primary_keys:
            raise ValueError("primary keys are required for a mergeable table "
                             "(parity with reference README.md:60)")
        path = path.rstrip("/")
        if ChangeTable.exists(path):
            if not overwrite:
                return ChangeTable(spark, path)
            shutil.rmtree(path)
        os.makedirs(os.path.join(path, "changes"), exist_ok=True)
        os.makedirs(os.path.join(path, "snapshots"), exist_ok=True)
        # v0 snapshot: empty
        empty = spark.createDataFrame([], schema)
        empty.write.mode("overwrite").parquet(os.path.join(path, "snapshots", "v=0"))
        meta = {
            "name": name or os.path.basename(path),
            "version": 0,
            "primary_keys": list(primary_keys),
            "sequence_by": list(sequence_by),
            "partition_by": list(partition_by),
            "schema": schema.jsonValue(),
        }
        fd, tmp = tempfile.mkstemp(dir=path, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, META_FILE))
        return ChangeTable(spark, path)

    # ------------------------------------------------------------------
    # readers
    # ------------------------------------------------------------------
    def snapshot(self, version: int | None = None) -> DataFrame:
        """Version-pinned static read (reference ``versionAsOf`` reads,
        elzyme/streams.py:118-124)."""
        v = self.version() if version is None else version
        return self.spark.read.schema(self.schema()).parquet(
            os.path.join(self.path, "snapshots", f"v={v}")
        )

    def read_change_feed(self, starting_version: int = 1) -> DataFrame:
        """Batch read of the change feed from a version onward."""
        df = self.spark.read.schema(self.change_schema()).parquet(
            os.path.join(self.path, "changes")
        )
        return df.where(F.col(COMMIT_VERSION) >= starting_version)

    def read_change_stream(self, max_files_per_trigger: int | None = None) -> DataFrame:
        """The change feed as a Structured Streaming source. Every commit's
        files become (part of) a microbatch — the open-source equivalent of
        the reference's CDF readStream with its 1 GB/trigger cap
        (elzyme/streams.py:126-134)."""
        reader = self.spark.readStream.schema(self.change_schema())
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger or 16)
        return reader.parquet(os.path.join(self.path, "changes"))

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------
    def _pk_cond(self, a: str, b: str):
        cond = None
        for k in self.primary_keys:
            c = F.col(f"{a}.`{k}`").eqNullSafe(F.col(f"{b}.`{k}`"))
            cond = c if cond is None else (cond & c)
        return cond

    def _seq_col(self, qualifier: str | None = None):
        cols = [
            F.col(f"{qualifier}.`{c}`" if qualifier else f"`{c}`")
            for c in (self.sequence_by or (COMMIT_VERSION,))
            ]
        return F.struct(*cols)

    def _dedup_batch(self, df: DataFrame) -> DataFrame:
        """Latest change per PK within a batch (reference window dedup,
        elzyme/joins.py:388-395)."""
        order = [F.desc(c) for c in (self.sequence_by or ())]
        if COMMIT_VERSION in df.columns:
            order.append(F.desc(COMMIT_VERSION))
        if not order:
            return df.dropDuplicates(list(self.primary_keys))
        w = Window.partitionBy(*self.primary_keys).orderBy(*order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    def _data_cols(self) -> list[str]:
        return [f.name for f in self.schema().fields]

    def _write_commit(
        self, new_snapshot: DataFrame, changes: DataFrame, new_version: int
    ) -> None:
        snap_dir = os.path.join(self.path, "snapshots", f"v={new_version}")
        # materialize snapshot before changes so readers pinned at
        # new_version always find it
        writer = new_snapshot.select(*self._data_cols()).write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(snap_dir)
        change_cols = self._data_cols() + [CHANGE_TYPE, COMMIT_VERSION]
        (
            changes.select(*change_cols)
            .write.mode("append")
            .parquet(os.path.join(self.path, "changes"))
        )
        meta = dict(self._meta)
        meta["version"] = new_version
        self._write_meta(meta)

    # ------------------------------------------------------------------
    # writers
    # ------------------------------------------------------------------
    def append(self, df: DataFrame) -> int:
        """Insert-only commit (no key collision handling) — the fast path for
        immutable event streams."""
        v = self.version() + 1
        cur = self.snapshot(v - 1)
        batch = df.select(*self._data_cols())
        changes = batch.withColumn(CHANGE_TYPE, F.lit(INSERT)).withColumn(
            COMMIT_VERSION, F.lit(v).cast("long")
        )
        self._write_commit(cur.unionByName(batch), changes, v)
        return v

    def merge(self, batch: DataFrame) -> int:
        """Upsert by primary key with sequence-ordered late/duplicate
        protection — the engine's Delta-MERGE twin (reference MERGE machinery:
        elzyme/joins.py:563-570, 656-754; sequence condition ``u.seq <=
        staged.seq`` at joins.py:704-706).

        Emulation plan (all declarative): dedup batch per PK → left-join
        against the current snapshot to classify insert vs update and drop
        stale rows → new snapshot = (current anti-join applied-keys) ∪
        applied rows → changes = inserts ∪ preimages ∪ postimages.
        """
        v = self.version() + 1
        cur = self.snapshot(v - 1)
        staged = self._dedup_batch(batch).select(*self._data_cols())

        S, C = "staged", "cur"
        sdf, cdf = staged.alias(S), cur.alias(C)
        pk_cond = self._pk_cond(S, C)
        joined = sdf.join(cdf, pk_cond, "left")

        matched = F.col(f"{C}.`{self.primary_keys[0]}`").isNotNull()
        if self.sequence_by:
            fresh = ~matched | (self._seq_col(C) <= self._seq_col(S))
        else:
            fresh = F.lit(True)

        applied = joined.where(fresh).select(
            *[F.col(f"{S}.`{c}`").alias(c) for c in self._data_cols()],
            matched.alias("__matched"),
        ).persist()

        inserts = applied.where(~F.col("__matched")).drop("__matched")
        postimages = applied.where(F.col("__matched")).drop("__matched")

        # preimages: current rows for keys being updated
        upd_keys = postimages.select(*self.primary_keys).alias("k")
        preimages = cur.alias(C).join(
            upd_keys, self._pk_cond(C, "k"), "left_semi"
        ).select(*self._data_cols())

        applied_keys = applied.select(*self.primary_keys).alias("k")
        survivors = cur.alias(C).join(
            applied_keys, self._pk_cond(C, "k"), "left_anti"
        ).select(*self._data_cols())
        new_snapshot = survivors.unionByName(applied.drop("__matched"))

        tag = lambda df, t: (
            df.withColumn(CHANGE_TYPE, F.lit(t)).withColumn(
                COMMIT_VERSION, F.lit(v).cast("long")
            )
        )
        changes = (
            tag(inserts, INSERT)
            .unionByName(tag(preimages, UPDATE_PRE))
            .unionByName(tag(postimages, UPDATE_POST))
        )
        self._write_commit(new_snapshot, changes, v)
        applied.unpersist()
        return v

    def replace_keys(
        self, scope_keys: DataFrame, key_cols: Sequence[str], new_rows: DataFrame
    ) -> int:
        """Replace every row whose ``key_cols`` tuple appears in ``scope_keys``
        with the rows of ``new_rows``, emitting a minimal change feed
        (insert / update pre+post / delete) computed by diffing old vs new
        within the scope.

        This is the engine's upsert primitive for incremental view
        maintenance by *affected-slice recomputation*: the caller recomputes
        the correct result for a small, delta-derived key scope and this
        method reconciles the target — handling superseded outer-join null
        rows, FK moves, and deletes uniformly, where the reference needs the
        combinatorial outer-merge resolution (elzyme/joins.py:584-744).

        Scale: ``scope_keys`` is delta-derived and broadcast; the snapshot
        side never shuffles. The snapshot rewrite is the same copy-on-write
        cost as a Delta MERGE.
        """
        v = self.version() + 1
        cur = self.snapshot(v - 1)
        key_cols = list(key_cols)
        scope = F.broadcast(scope_keys.select(*key_cols).dropDuplicates(key_cols))

        def scope_cond(a: str, b: str):
            cond = None
            for k in key_cols:
                c = F.col(f"{a}.`{k}`").eqNullSafe(F.col(f"{b}.`{k}`"))
                cond = c if cond is None else (cond & c)
            return cond

        C, K, N, O = "cur", "scope", "new", "old"
        survivors = cur.alias(C).join(
            scope.alias(K), scope_cond(C, K), "left_anti"
        ).select(*self._data_cols())
        old_scope = cur.alias(C).join(
            scope.alias(K), scope_cond(C, K), "left_semi"
        ).select(*self._data_cols()).persist()
        new_rows = new_rows.select(*self._data_cols()).persist()

        new_snapshot = survivors.unionByName(new_rows)

        pk_cond = self._pk_cond(N, O)
        inserts = new_rows.alias(N).join(
            old_scope.alias(O), pk_cond, "left_anti"
        ).select(*self._data_cols())
        deletes = old_scope.alias(O).join(
            new_rows.alias(N), self._pk_cond(O, N), "left_anti"
        ).select(*self._data_cols())
        data_struct = lambda q: F.struct(*[F.col(f"{q}.`{c}`") for c in self._data_cols()])
        changed_pairs = (
            new_rows.alias(N)
            .join(old_scope.alias(O), pk_cond, "inner")
            .where(~data_struct(N).eqNullSafe(data_struct(O)))
            .persist()
        )
        pre = changed_pairs.select(*[F.col(f"{O}.`{c}`").alias(c) for c in self._data_cols()])
        post = changed_pairs.select(*[F.col(f"{N}.`{c}`").alias(c) for c in self._data_cols()])

        tag = lambda df, t: (
            df.withColumn(CHANGE_TYPE, F.lit(t)).withColumn(
                COMMIT_VERSION, F.lit(v).cast("long")
            )
        )
        changes = (
            tag(inserts, INSERT)
            .unionByName(tag(pre, UPDATE_PRE))
            .unionByName(tag(post, UPDATE_POST))
            .unionByName(tag(deletes, DELETE))
        ).persist()
        try:
            # no-op batches must not commit: an empty commit would produce new
            # change files, re-trigger downstream stages, and loop forever.
            if changes.isEmpty():
                return v - 1
            self._write_commit(new_snapshot, changes, v)
            return v
        finally:
            old_scope.unpersist()
            new_rows.unpersist()
            changed_pairs.unpersist()
            changes.unpersist()

    def delete_where(self, condition) -> int:
        """Delete rows matching a condition, emitting ``delete`` change rows.
        The reference silently drops deletes at the source (elzyme/
        streams.py:132,142); we make delete propagation explicit and let
        downstream consumers opt in."""
        v = self.version() + 1
        cur = self.snapshot(v - 1)
        doomed = cur.where(condition)
        remaining = cur.where(~condition | condition.isNull())
        changes = doomed.withColumn(CHANGE_TYPE, F.lit(DELETE)).withColumn(
            COMMIT_VERSION, F.lit(v).cast("long")
        )
        self._write_commit(remaining, changes, v)
        return v
