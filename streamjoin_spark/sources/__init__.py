"""File ingestion into ChangeTables — the Auto Loader analog.

The reference's tests feed silver Delta tables from JSON files via
Databricks Auto Loader (`cloudFiles`, reference tests/SetupInputStream.py:
81-121) with small per-trigger byte caps to force many microbatches. The
open-source equivalent here: discover-new-files ingestion with persisted
file-list state, landing batches into a ChangeTable (append for insert-only
feeds, merge for CDC upserts).

Scale notes: discovery is a listing + set-difference (at production scale
swap the local glob for a cloud inventory/notification feed — the state
contract stays the same); each batch is one ChangeTable commit, so
downstream incremental pipelines see real microbatch boundaries. The
``max_files_per_batch`` knob is the ``maxBytesPerTrigger`` analog, keeping
each commit small enough that delta legs broadcast downstream.
"""

from __future__ import annotations

import glob as globlib
import json
import os
from typing import Sequence

from pyspark.sql import SparkSession

from ..changelog import ChangeTable


class FileIngest:
    """Incremental file ingestion with persisted progress.

    >>> ing = FileIngest(spark, "/data/in/*.json", ct, fmt="json", mode="merge")
    >>> ing.run()        # ingest everything new, possibly many batches
    """

    def __init__(
        self,
        spark: SparkSession,
        pattern: str,
        target: ChangeTable,
        fmt: str = "json",
        mode: str = "merge",
        max_files_per_batch: int = 64,
        reader_options: dict | None = None,
        auto_compact_threshold: int | None = 64,
        rules: dict | None = None,
        quarantine_target: "ChangeTable | None" = None,
    ):
        if mode not in ("merge", "append"):
            raise ValueError("mode must be 'merge' or 'append'")
        self.spark = spark
        self.pattern = pattern
        self.target = target
        self.fmt = fmt
        self.mode = mode
        self.max_files_per_batch = max_files_per_batch
        self.reader_options = reader_options or {}
        # append-mode batches each add one dir per touched part; the
        # auto-OPTIMIZE policy keeps file counts bounded over long-running
        # ingestion (None disables). Compaction emits no change rows, so
        # downstream incremental consumers are unaffected.
        self.auto_compact_threshold = auto_compact_threshold
        # DLT-expectations gate at the bronze edge: rows failing any rule
        # are diverted to `quarantine_target` (schema = target schema +
        # `_violations` string) — or silently dropped when no quarantine
        # table is given. Map-only; see operators/expectations.py.
        # Crash semantics: the quarantine commit precedes the ingest-state
        # update, so a crash in between replays the batch. A quarantine
        # table keyed on the single column `_qid` (content hash, computed
        # here) absorbs replays via merge() — exactly-once per distinct bad
        # row. Any other quarantine table is at-least-once by contract —
        # replays append duplicates.
        self.rules = rules
        self.quarantine_target = quarantine_target
        self._state_path = os.path.join(target.path, "_ingest_state.json")

    # -- progress ------------------------------------------------------
    def _seen(self) -> set[str]:
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return set(json.load(f)["files"])
        return set()

    def _save_seen(self, seen: set[str]) -> None:
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"files": sorted(seen)}, f)
        os.replace(tmp, self._state_path)

    def discover(self) -> list[str]:
        """New files since the last run, stable-ordered (lexicographic, the
        arrival-order proxy the reference gets from Auto Loader)."""
        return sorted(set(globlib.glob(self.pattern)) - self._seen())

    # -- ingestion -----------------------------------------------------
    def run_once(self) -> int:
        """Ingest one batch of new files; returns the number ingested."""
        new = self.discover()[: self.max_files_per_batch]
        if not new:
            return 0
        reader = self.spark.read.format(self.fmt).schema(self.target.schema())
        for k, v in self.reader_options.items():
            reader = reader.option(k, v)
        df = reader.load(new)
        if self.rules:
            from pyspark.sql import functions as F

            from ..operators.expectations import quarantine as _quarantine

            df, bad = _quarantine(df, self.rules)
            if self.quarantine_target is not None and not bad.isEmpty():
                bad = bad.withColumn(
                    "_violations", F.concat_ws(",", "_violations")
                )
                # Crash idempotence: the quarantine commit and the bronze
                # merge land before the ingest-state update, so a crash in
                # between replays the same files. A quarantine table keyed
                # on the single column `_qid` opts into content-addressed
                # exactly-once: the key is a hash of the full row payload +
                # violations, so replays merge to no-ops while DISTINCT bad
                # rows never collide (quarantined rows routinely have NULL
                # business keys — the very violation — so keying on the
                # bronze PK would collapse them nondeterministically).
                # Any other quarantine table is at-least-once by contract.
                if self.quarantine_target.primary_keys == ("_qid",):
                    payload = [
                        F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                        for c in sorted(bad.columns)
                    ]
                    bad = bad.withColumn(
                        "_qid", F.md5(F.concat_ws("\x1f", *payload))
                    )
                    self.quarantine_target.merge(bad)
                else:
                    self.quarantine_target.append(bad)
        if self.mode == "merge":
            self.target.merge(df)
        else:
            self.target.append(df)
        seen = self._seen()
        seen.update(new)
        self._save_seen(seen)
        if self.auto_compact_threshold is not None:
            self.target.maybe_compact(self.auto_compact_threshold)
        return len(new)

    def run(self) -> int:
        """Drain all new files (availableNow semantics); returns total.
        Fragmentation is checked per batch (``auto_compact_threshold``),
        so even one giant drain stays file-count bounded."""
        total = 0
        while True:
            n = self.run_once()
            if n == 0:
                return total
            total += n


def ingest_files(
    spark: SparkSession,
    pattern: str,
    target: ChangeTable,
    fmt: str = "json",
    mode: str = "merge",
    **kwargs,
) -> int:
    """One-shot convenience wrapper around :class:`FileIngest`."""
    return FileIngest(spark, pattern, target, fmt=fmt, mode=mode, **kwargs).run()
