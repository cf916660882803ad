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
      _changelog_meta.json      # version, keys, sequence, schema, n_buckets
      manifests/v{N}.json       # snapshot N = {part_id: [data dirs]}
      data/c{N}/__part={p}/     # immutable parquet file-sets, one per commit
      changes/c{N}/             # change feed, one dir per commit

Copy-on-write physics (the 100 TB story):

- Rows are hash-assigned to ``n_buckets`` parts on the partition columns
  (``partition_by`` if set, else the primary keys). A snapshot version is a
  *manifest*: part id → list of immutable data dirs, exactly Delta's
  file-level metadata in miniature. Each dir entry carries per-column
  min/max/has-null stats on the key columns, harvested from the parquet
  FOOTERS at commit time (driver-side metadata reads, zero Spark jobs) —
  the Delta-log per-file stats analog.
- **Appends are O(batch)**: the new file-set is added to each touched
  part's dir list; nothing is read or rewritten.
- **Merges/replaces are O(scope-intersecting files)** — sub-part
  copy-on-write (r9): within each affected part, only dirs whose key-stat
  ranges intersect the batch's key bounds are read and consolidated;
  stat-disjoint dirs carry forward in the manifest untouched, so a churn
  commit's write amplification scales with the DELTA, not the bucket
  size. This is the same bounded rewrite as a file-pruned Delta MERGE
  (reference pruning: elzyme/joins.py:619-632, 676-682); parts are the
  coarse tier, footer stats the fine tier.
- ``changes/`` is append-only and consumed by the Structured Streaming
  file source, giving real microbatch semantics (new commit ⇒ new files ⇒
  new microbatch) with no custom receiver.
- Old versions stay readable (version-pinned snapshot reads) because data
  dirs are immutable; ``compact()`` is the OPTIMIZE analog.
- Single-writer per table (matches the reference's one-query-per-stage
  topology, elzyme/joins.py:812-859). Commits are ordered; the metadata
  file is written last and atomically (write-temp + rename).
- **Crash-safe**: every pre-meta artifact of commit ``v`` (data/c{v},
  changes/c{v}, manifests/v{v}.json) is written idempotently (overwrite),
  so a crash between any two steps leaves only orphans that the retried
  commit regenerates in place — never a second copy. Readers additionally
  cap the change feed at the committed version, so an un-bumped commit's
  change rows are invisible even before the retry.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .streams import CHANGE_TYPE, COMMIT_VERSION, DELETE, INSERT, UPDATE_POST, UPDATE_PRE

META_FILE = "_changelog_meta.json"
PART = "__part"

# manifest dir-entry stats: only JSON-round-trippable scalar types whose
# Python ordering matches Spark's column ordering participate (UTF-8 byte
# order == code-point order for strings; bool is an int subclass).
# Timestamps/decimals/binary simply carry no stats — sound, never wrong.
_STATS_TYPES = (int, float, str)

# scopes at or under this many keys are collected driver-side so pruning
# tests each VALUE against a dir's [min, max] (bisect per entry) instead
# of the scope's single global interval — a churn slice touching keys
# {5, 19000} must not un-prune every dir in between. Bounded collect:
# 64k scalar keys is single-digit MBs, well under what the caller's
# broadcast hint already asserts fits the driver (the IVM governor
# broadcasts far bigger scopes).
_SCOPE_VALUES_MAX = 65_536

# compacted writes sort each part by the stats columns and split files at
# this row count, so a CONSOLIDATED part becomes several files with tight
# DISJOINT key ranges — the granularity future churn commits prune and
# carry forward at (Delta's optimized-write + per-file-stats pairing).
# 128k rows ≈ 10-130 MB per file at typical row widths; _ENTRY_FILES_MAX
# merges the manifest entry when a pathological width would explode it.
SPLIT_ROWS_PER_FILE = 128_000

# per-file manifest entries only up to this many files per dir —
# manifest-size guard for pathological widths (sorted splits land far
# below it; see _entries_for for the unsorted-write path)
_ENTRY_FILES_MAX = 1024

# footer-read cap for UNSORTED dirs (one merged-stats entry): unsorted
# task-parallel files have overlapping ranges that barely prune, so the
# commit path won't pay more than this many serial metadata reads for them
_STATS_FILES_MAX_UNSORTED = 64

# scoped READS skip their bounds-probe jobs when the snapshot's total
# known on-disk size (per-entry byte counts recorded at commit time, the
# Delta add-file `size` analog) is at or under this — pruning a scan this
# small cannot pay for the 1-2 driver probe jobs (measured r10: ~0.3-1 s
# of pure overhead per gate-scale IVM slice). Entries written before
# sizes landed read as "unknown" and keep probing (the safe direction at
# scale); tests pin pruning behavior by setting this to 0.
PRUNE_MIN_READ_BYTES = 64 << 20

# read_where inlines the scope as a LITERAL membership filter up to this
# many key tuples (the optimizer converts big IN lists to an InSet hash
# probe) — the returned plan then carries no checkpoint dependency and
# composes freely; bigger scopes keep the semi-join against the
# checkpointed scope frame, whose blocks are finalizer-released with the
# result object (r11 review finding: a finalizer-only design broke
# chained temporaries like read_where(...).where(x).collect()).
READ_WHERE_INLINE_MAX = 8192


def _path_bytes(abs_path: str) -> int | None:
    """On-disk parquet bytes under a path (file or dir) — the per-entry
    `size` a manifest entry carries (Delta add-file size analog), used by
    scoped reads to decide whether a bounds probe can pay for itself.
    Driver-side listing only; None on failure (reads as "unknown" =
    probe, the safe direction at scale)."""
    try:
        if os.path.isfile(abs_path):
            return os.path.getsize(abs_path)
        total = 0
        for root, _dirs, files in os.walk(abs_path):
            for fn in files:
                if fn.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, fn))
        return total
    except OSError:
        return None


def _free_checkpoint(df) -> None:
    """Release a localCheckpoint'ed DataFrame's storage blocks NOW instead
    of waiting for GC (py4j holds JVM references long after Python drops
    its side, and the ContextCleaner only runs on JVM GC — at 1000× the
    accumulated eager checkpoints of per-slice key scopes measurably
    pressured the shared single-JVM heap until a borderline broadcast
    build OOM'd; reproduced r10). The frame must never be evaluated again
    after this call — a freed checkpoint fails loudly
    (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND), never silently recomputes.
    Best-effort: a non-checkpointed plan has no rdd() accessor and is
    left to the normal cache machinery."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — cleanup is best-effort
        pass


def _entry_dir(e) -> str:
    """A manifest dir entry is either a plain rel-path string (pre-r9
    layout, or a dir whose files carry no usable stats) or a dict
    ``{"d": rel_path, "s": {col: [min, max, has_null]}}``."""
    return e["d"] if isinstance(e, dict) else e


def _entry_excluded(e, bounds: dict | None) -> bool:
    """True iff the entry's footer stats PROVE no key tuple within
    ``bounds`` ({col: (min, max, has_null)}) can have a row in this dir.
    Sound, never complete: missing stats, missing columns, or
    cross-engine-incomparable types all read as "may contain". Per
    column: a non-null scope value can only match inside the dir's
    [min, max] (nulls never equal non-nulls under eqNullSafe); a null
    scope value only matches if the dir has nulls. Any single column
    proving disjointness excludes the dir."""
    stats = e.get("s") if isinstance(e, dict) else None
    if not stats or not bounds:
        return False
    for c, sb in bounds.items():
        ds = stats.get(c)
        if ds is None:
            continue
        s_lo, s_hi, s_null = sb[0], sb[1], sb[2]
        s_vals = sb[3] if len(sb) > 3 else None
        d_lo, d_hi, d_null = ds
        try:
            nonnull_overlap = (
                s_lo is not None
                and d_lo is not None
                and not (s_lo > d_hi or s_hi < d_lo)
            )
            if nonnull_overlap and s_vals is not None:
                # small scope: exact value-vs-range test (bisect on the
                # sorted value list) — scattered keys whose global
                # interval spans the dir can still miss it
                import bisect  # noqa: PLC0415 - stdlib, hot driver loop

                i = bisect.bisect_left(s_vals, d_lo)
                nonnull_overlap = i < len(s_vals) and s_vals[i] <= d_hi
        except TypeError:  # cross-type comparison — assume overlap
            nonnull_overlap = True
        null_overlap = bool(s_null) and (d_null is None or bool(d_null))
        if not (nonnull_overlap or null_overlap):
            return True
    return False


_CMP_NODES = {
    "LessThan",
    "LessThanOrEqual",
    "GreaterThan",
    "GreaterThanOrEqual",
    "EqualTo",
    "EqualNullSafe",
}

# literal JVM types whose .value() py4j-converts to a Python scalar
# comparable against JSON manifest stats (int/float/str — _STATS_TYPES;
# UTF8String needs the str() bridge). Timestamps/dates/decimals carry
# internal representations AND never have manifest stats (pyarrow footer
# values fail the _STATS_TYPES gate), so they read "may match".
def _jlit_value(node):
    """Python value of a resolved catalyst Literal, or a sentinel when
    not extractable. Returns (ok, value)."""
    try:
        dt = str(node.dataType().simpleString())
        v = node.value()
        if v is None:
            return True, None
        if dt == "string":
            return True, str(v)
        if dt in ("int", "bigint", "smallint", "tinyint", "double", "float"):
            if isinstance(v, (int, float)):
                return True, v
        if dt == "boolean" and isinstance(v, bool):
            return True, v
        return False, None
    except Exception:  # noqa: BLE001 — pruning is best-effort
        return False, None


_INT_RANK = {"tinyint": 1, "smallint": 2, "int": 3, "bigint": 4}
_INT_BOUND = {
    "tinyint": 127,
    "smallint": 32767,
    "int": 2147483647,
    "bigint": 2**63 - 1,
}


def _exact_widening(src: str, dst: str) -> bool:
    """Whether ``cast(x AS dst)`` is VALUE-PRESERVING for every x of type
    ``src`` — the only casts the stats evaluator may see through
    (r11 review finding: the first cut accepted any numeric→numeric
    cast, so ``cast(double_col AS int) = 5`` pruned files holding 5.7,
    and ``cast(bigint AS double)`` lost precision past 2^53 — both
    silently dropping matching rows). Int-family widening within the
    family; ≤32-bit ints → double (53-bit mantissa holds them exactly);
    float → double. NOT bigint→double, NOT anything→float, NOT any
    narrowing, NOT numeric↔string."""
    if src == dst:
        return True
    if src in _INT_RANK and dst in _INT_RANK:
        return _INT_RANK[src] <= _INT_RANK[dst]
    if src in ("tinyint", "smallint", "int") and dst == "double":
        return True
    return src == "float" and dst == "double"


def _jlit_node(node):
    """The Literal under ``node``, unwrapping one type-promotion Cast —
    analysis wraps comparison literals to match the column type
    (``id < 400`` resolves to ``id#L < cast(400 as bigint)``). The fold
    uses the PRE-cast Python value, so it is sound only when the cast
    preserves that specific value: null → anything (stays null),
    int → int family it FITS in, int → double below 2^53,
    float → double. Everything else returns None (no pruning)."""
    cls = str(node.getClass().getSimpleName())
    if cls == "Literal":
        return node
    if cls != "Cast":
        return None
    child = node.child()
    if str(child.getClass().getSimpleName()) != "Literal":
        return None
    dst = str(node.dataType().simpleString())
    ok, v = _jlit_value(child)
    if not ok:
        return None
    if v is None:
        return child  # cast of NULL stays NULL — value intact
    if isinstance(v, bool):
        return None  # bool↔numeric casts change the comparison domain
    if dst in _INT_BOUND:
        if isinstance(v, int) and -_INT_BOUND[dst] - 1 <= v <= _INT_BOUND[dst]:
            return child
        return None
    if dst == "double":
        if isinstance(v, float):
            return child
        if isinstance(v, int) and abs(v) <= 2**53:
            return child
    return None


def _jattr_ref(node):
    """(column_name, bounds_cast) for a resolved AttributeReference,
    possibly under ONE numeric Cast the evaluator can reason through —
    or None. ``bounds_cast`` maps a raw footer stat into the CAST's
    output domain so interval tests run where the comparison runs:

    - exact widening (``_exact_widening``): identity — raw stats compare
      directly;
    - int-family → double (including bigint, lossy past 2^53): apply
      Python ``float`` to the bounds. Sound because the cast is MONOTONE
      non-decreasing and Python's float(int) is the same
      IEEE-nearest conversion Spark's toDouble performs: any x∈[lo,hi]
      has cast(x)∈[float(lo), float(hi)], so an interval test on the
      cast bounds over-approximates (r11 review follow-up — the
      exact-widening-only cut silently lost pruning on the common
      ``bigint_col < 250.5`` shape);
    - anything else (→float's 32-bit rounding, float→int truncation
      whose ANSI overflow could ERROR on rows a pruned file hides,
      string casts): refuse."""
    cls = str(node.getClass().getSimpleName())
    if cls == "AttributeReference":
        return str(node.name()), None
    if cls != "Cast":
        return None
    inner = node.child()
    if str(inner.getClass().getSimpleName()) != "AttributeReference":
        return None
    src = str(inner.dataType().simpleString())
    dst = str(node.dataType().simpleString())
    if _exact_widening(src, dst):
        return str(inner.name()), None
    if src in _INT_RANK and dst == "double":
        return str(inner.name()), float
    return None


def _jattr_name(node) -> str | None:
    ref = _jattr_ref(node)
    return ref[0] if ref is not None else None


def _expr_may_match(node, stats: dict) -> bool:
    """True unless the entry's footer stats PROVE no row can satisfy the
    resolved condition — the condition-scan twin of ``_entry_excluded``
    (r10 VERDICT task 2: scoped delete_where). Sound by construction:
    every unrecognized node, missing stat, incomparable type, or NaN
    reads "may match"; only AND/OR composition and simple comparisons /
    null tests / IN lists against stats columns can exclude. ``stats``
    maps col → (min, max, has_null) from the manifest entry."""
    try:
        cls = str(node.getClass().getSimpleName())
        if cls == "And":
            return _expr_may_match(node.left(), stats) and _expr_may_match(
                node.right(), stats
            )
        if cls == "Or":
            return _expr_may_match(node.left(), stats) or _expr_may_match(
                node.right(), stats
            )
        if cls == "Not":
            child = node.child()
            if str(child.getClass().getSimpleName()) == "IsNull":
                # NOT(c IS NULL): non-nulls always "may exist" when stats
                # were recorded (an all-null column drops out of the
                # footer fold, leaving no stats → True above anyway)
                return True
            return True
        if cls == "IsNull":
            col = _jattr_name(node.child())
            ds = stats.get(col) if col else None
            return True if ds is None else bool(ds[2])
        if cls == "IsNotNull":
            # recorded stats imply non-null values exist — cannot exclude
            return True
        if cls == "In":
            ref = _jattr_ref(node.value())
            ds = stats.get(ref[0]) if ref is not None else None
            if ds is None:
                return True
            lst = node.list()
            lo, hi = ds[0], ds[1]
            if ref[1] is not None:
                try:
                    lo, hi = ref[1](lo), ref[1](hi)
                except Exception:  # noqa: BLE001
                    return True
            if (isinstance(lo, float) and lo != lo) or (
                isinstance(hi, float) and hi != hi
            ):
                return True  # NaN STATS: unorderable bounds read may-match
            for i in range(lst.size()):
                item = _jlit_node(lst.apply(i))
                if item is None:
                    return True
                ok, v = _jlit_value(item)
                if not ok:
                    return True
                if v is None:
                    continue  # IN (NULL, ...) never matches on null
                if isinstance(v, float) and v != v:
                    return True  # NaN: unorderable
                try:
                    if lo <= v <= hi:
                        return True
                except TypeError:
                    return True
            return False
        if cls in _CMP_NODES:
            left, right = node.left(), node.right()
            lref, rref = _jattr_ref(left), _jattr_ref(right)
            llit, rlit = _jlit_node(left), _jlit_node(right)
            if lref is not None and rlit is not None:
                ref, lit, flip = lref, rlit, False
            elif rref is not None and llit is not None:
                ref, lit, flip = rref, llit, True
            else:
                return True
            ds = stats.get(ref[0])
            if ds is None:
                return True
            ok, v = _jlit_value(lit)
            if not ok:
                return True
            lo, hi, has_null = ds[0], ds[1], bool(ds[2])
            if ref[1] is not None:
                # interval test in the CAST's output domain (monotone)
                try:
                    lo, hi = ref[1](lo), ref[1](hi)
                except Exception:  # noqa: BLE001
                    return True
            if (isinstance(lo, float) and lo != lo) or (
                isinstance(hi, float) and hi != hi
            ):
                return True  # NaN STATS: unorderable bounds read may-match
            if v is None:
                # col OP NULL is never TRUE — except null-safe equality,
                # which matches exactly the nulls
                return has_null if cls == "EqualNullSafe" else False
            if isinstance(v, float) and v != v:
                return True  # NaN: unorderable, read as overlap
            op = cls
            if flip:  # literal OP col ≡ col FLIPPED(OP) literal
                op = {
                    "LessThan": "GreaterThan",
                    "LessThanOrEqual": "GreaterThanOrEqual",
                    "GreaterThan": "LessThan",
                    "GreaterThanOrEqual": "LessThanOrEqual",
                }.get(op, op)
            try:
                if op in ("EqualTo", "EqualNullSafe"):
                    return lo <= v <= hi
                if op == "LessThan":
                    return lo < v
                if op == "LessThanOrEqual":
                    return lo <= v
                if op == "GreaterThan":
                    return hi > v
                if op == "GreaterThanOrEqual":
                    return hi >= v
            except TypeError:
                return True
            return True
        return True
    except Exception:  # noqa: BLE001 — pruning is best-effort
        return True


def _dir_stats(
    abs_path: str, cols: Sequence[str], max_files: int | None = None
) -> dict | None:
    """Per-path (min, max, has_null) for each stats column, folded from
    the parquet FOOTERS — driver-side metadata reads only, no Spark job,
    no data pages (the Delta transaction-log per-file stats analog, built
    the way Delta builds them: from the writer's own footer statistics).
    ``abs_path`` may be a directory (stats merged across its files) or a
    single parquet file. Truncated binary stats are still sound bounds
    (parquet rounds min down / max up). A column missing usable stats in
    ANY row group drops out; returns None when nothing usable remains.
    ``max_files`` caps the driver-side footer reads — a dir with more
    parquet files returns None (no stats) instead of paying thousands of
    serial metadata reads on the commit path (r9 review finding: the
    unsorted task-parallel bulk layout can emit hundreds of files whose
    overlapping ranges would barely prune anyway)."""
    import pyarrow.parquet as pq  # noqa: PLC0415 - driver-only probe

    want = set(cols)
    acc: dict[str, list] = {}
    dead: set[str] = set()
    found = False
    seen_files = 0
    if os.path.isfile(abs_path):
        walk = [(os.path.dirname(abs_path), (), [os.path.basename(abs_path)])]
    else:
        walk = os.walk(abs_path)
    for root, _dirs, files in walk:
        for fn in sorted(files):
            if not fn.endswith(".parquet"):
                continue
            seen_files += 1
            if max_files is not None and seen_files > max_files:
                return None
            found = True
            # the WHOLE per-file fold is best-effort, not just the footer
            # read: statistics accessors themselves can raise (e.g. a
            # truncated binary min/max failing UTF-8 decode inside
            # pyarrow) and must degrade to stats-less entries instead of
            # failing the commit (r9 ADVICE)
            try:
                md = pq.read_metadata(os.path.join(root, fn))
                for rg in range(md.num_row_groups):
                    rgm = md.row_group(rg)
                    for j in range(rgm.num_columns):
                        colmeta = rgm.column(j)
                        name = colmeta.path_in_schema
                        if name not in want or name in dead:
                            continue
                        st = colmeta.statistics
                        if st is None or not st.has_min_max:
                            dead.add(name)
                            acc.pop(name, None)
                            continue
                        mn, mx = st.min, st.max
                        if not (
                            isinstance(mn, _STATS_TYPES)
                            and isinstance(mx, _STATS_TYPES)
                        ):
                            dead.add(name)
                            acc.pop(name, None)
                            continue
                        # None null_count = unknown → conservative True
                        hn = st.null_count is None or st.null_count > 0
                        cur = acc.get(name)
                        if cur is None:
                            acc[name] = [mn, mx, hn]
                            continue
                        try:
                            if mn < cur[0]:
                                cur[0] = mn
                            if mx > cur[1]:
                                cur[1] = mx
                        except TypeError:
                            dead.add(name)
                            acc.pop(name, None)
                            continue
                        cur[2] = cur[2] or hn
            except Exception:  # noqa: BLE001 — stats are best-effort
                return None
    if not found or not acc:
        return None
    return acc

# Small commits are repartitioned to one task (→ one sorted file-run) per
# part before the partitioned write: without it every write task emits a
# file per part it touches (32 tasks × 8 parts = 256 tiny files for a
# kB-sized slice), and every LATER snapshot/affected-part read pays that
# file count in listing + task scheduling — measured r8: the rewritten-
# content write was the single biggest job of an IVM churn slice (2.4 s
# of a 7 s slice) and snapshot scans of a 37k-row table ran 30-62 tasks.
# The gate is PER WRITE TASK since r9 (floored at the r8 total): the
# compacted write runs min(n_buckets, 32) tasks, so what must stay
# bounded is bytes sorted per task, not total bytes — a 600 MB rewrite
# through 8 bucket-tasks is 75 MB/task and well worth the sorted, split,
# stat-tight layout (without it, tables past 256 MB never got sorted
# files and sub-part pruning could not engage exactly where the rewrite
# bytes hurt most). Commits over the limit keep the task-parallel
# unsorted write — compacting a multi-GB bulk load through n_buckets
# single tasks would serialize it.
COMPACT_WRITE_MAX_BYTES = 256 << 20
COMPACT_WRITE_MAX_BYTES_PER_TASK = 128 << 20


def _compact_limit(n_buckets: int) -> int:
    return max(
        COMPACT_WRITE_MAX_BYTES,
        COMPACT_WRITE_MAX_BYTES_PER_TASK * min(int(n_buckets), 32),
    )


class ConcurrentWriteError(RuntimeError):
    """Raised at the publish point when another writer moved the table
    head between a commit's start and its version bump (the Delta
    ConcurrentModificationException analog, detected optimistically)."""

# Session-scoped name → path registry (reference ``Stream.fromTable`` /
# ``writeToTable`` address tables by catalog name, elzyme/streams.py:136-144,
# elzyme/joins.py:878-879; with no metastore in this environment the registry
# plays the catalog's role — swap for a real catalog lookup on a cluster).
_TABLE_REGISTRY: dict[str, str] = {}


def register_table(name: str, path: str) -> None:
    _TABLE_REGISTRY[name] = path.rstrip("/")


def lookup_table(name: str) -> str | None:
    return _TABLE_REGISTRY.get(name)


def resolve_table_path(spark: SparkSession, name: str) -> str:
    """Registry hit → that path; else a deterministic location under the
    session's warehouse dir (the CREATE-TABLE analog)."""
    hit = lookup_table(name)
    if hit is not None:
        return hit
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "file:./spark-warehouse"
    ).removeprefix("file:")
    return os.path.join(warehouse, name.replace(".", "/"))


class ChangeTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        backend=None,
        claim_wait_s: float | None = None,
        claim_stale_s: float | None = None,
    ):
        """``claim_wait_s`` bounds how long a writer waits on another
        IN-FLIGHT writer's commit claim before raising
        ConcurrentWriteError (default 30 s). Sizing rule (measured,
        SCALING.md r10: max claim wait at 4 concurrent writers was
        28.6 s — grazing the default): with N concurrent writers a
        claim can queue behind N−1 full commits, so set it to at least
        ``N × your longest single commit``. ``claim_stale_s`` is when a
        DEAD writer's claim becomes stealable (default 900 s) — keep it
        above the longest single Spark action of any commit. Writers
        built through the incremental runtime can set both per pipeline
        via the ``claimWaitSeconds`` / ``claimStaleSeconds`` options."""
        from .backends import POSIX

        self.spark = spark
        self.path = path.rstrip("/")
        # storage-atomicity contract for the PROTOCOL files (meta, claims):
        # put-if-absent + atomic replace + monotonic reads — see
        # backends.py for the POSIX/S3 mapping; the data plane (parquet)
        # is version-addressed and needs no atomicity at all
        self.backend = backend if backend is not None else POSIX
        self._meta = self._read_meta()
        # OCC identity: commits claim their version slot under this token
        # (see _next_version) — per (instance, thread), so an in-process
        # crash-retry reclaims its own slot instantly while every OTHER
        # writer (foreign instance OR a sibling thread sharing this
        # instance) waits; a per-instance-only token would let two threads
        # of one ChangeTable both "own" the same slot and clobber each
        # other's version-addressed writes
        self._writer_token_base = uuid.uuid4().hex
        # wait-on-in-flight-writer / dead-claim-stealable bounds — see the
        # constructor docstring for the N × longest-commit sizing rule
        self._claim_wait_s = 30.0 if claim_wait_s is None else float(claim_wait_s)
        self._claim_stale_s = (
            900.0 if claim_stale_s is None else float(claim_stale_s)
        )
        register_table(self.name, self.path)

    # ------------------------------------------------------------------
    # metadata
    # ------------------------------------------------------------------
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, META_FILE)

    def _read_meta(self) -> dict:
        raw = self.backend.read(self._meta_path)
        if raw is None:
            raise FileNotFoundError(self._meta_path)
        return json.loads(raw)

    def _write_meta(self, meta: dict) -> None:
        # the publish point: all-or-nothing overwrite through the backend
        # (POSIX temp+rename; object stores a plain atomic PUT)
        self.backend.replace(self._meta_path, json.dumps(meta))
        self._meta = meta

    def _update_meta(self, mutate, nowait: bool = False) -> dict:
        """Claim-serialized metadata-only update — the safe
        read-modify-write for the meta file, which doubles as the commit
        publish point. A bare ``_read_meta → mutate → _write_meta`` races
        a concurrent commit: the publish between the read and the blind
        replace gets its version bump clobbered and the table head
        silently regresses (r10 ADVICE, found on _purge_metrics'
        amortization stamp). Holding the head+1 claim closes the window:
        every commit must claim that slot before publishing, so the meta
        file cannot change while we hold it. ``mutate(meta)`` edits the
        FRESH dict in place; the claim is released without bumping the
        version (the slot was never used for a commit). Returns the
        written meta.

        Re-entrancy: when THIS writer (instance + thread — the token
        scope) already holds the head+1 claim, we are inside our own
        in-flight commit body (e.g. a legacy ``n_buckets_since`` backfill
        triggered by a scoped read mid-commit). The RMW is already
        serialized by that claim, and claiming-then-releasing here would
        free the slot the outer commit still owns — so write directly and
        leave the claim alone.

        ``nowait`` (r11 review finding 4 — for updates triggered from
        READ paths): a single put-if-absent claim attempt, never the
        bounded wait and NEVER the stale-claim steal — a reader must not
        stall 30 s behind a writer, and stealing a slow-but-live
        writer's claim from a read path would abort its legitimate
        commit. On a busy slot it raises ConcurrentWriteError for the
        caller to swallow (the update is best-effort by construction
        there)."""
        raw = self.backend.read(self._claim_path(self.version() + 1))
        if raw is not None:
            try:
                held = json.loads(raw).get("token") == self._writer_token
            except ValueError:
                held = False
            if held:
                meta = dict(self._read_meta())
                mutate(meta)
                self._write_meta(meta)
                return meta
        if nowait:
            v = self.version() + 1
            payload = json.dumps({"token": self._writer_token, "ts": time.time()})
            if not self.backend.put_if_absent(self._claim_path(v), payload):
                raise ConcurrentWriteError(
                    f"commit slot v{v} of {self.name!r} is busy; nowait "
                    "metadata update skipped"
                )
        else:
            v = self._next_version()
        try:
            meta = dict(self._read_meta())
            mutate(meta)
            self._write_meta(meta)
            return meta
        finally:
            self._release_claim(v)

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

    @property
    def generated_columns(self) -> dict[str, str]:
        return dict(self._meta.get("generated_columns", {}))

    @property
    def constraints(self) -> dict[str, str]:
        return dict(self._meta.get("constraints", {}))

    @property
    def n_buckets(self) -> int:
        return int(self._meta.get("n_buckets", 32))

    @property
    def n_buckets_since(self) -> int:
        """First version whose manifest parts are hashed under the CURRENT
        ``n_buckets`` (bumped by online re-bucketing). Scoped reads of
        versions at or past this may restrict to the scope keys' hash
        parts; older pinned manifests were hashed under a different count,
        so part restriction is skipped there (file-stats pruning still
        applies).

        A MISSING key means the table predates the stamp (r10): it may
        have been rebucketed by pre-stamp code, so defaulting to 0 would
        part-restrict a version pinned BEFORE that old rebucket under the
        new hash — silently missing rows (r10 ADVICE). Legacy tables
        infer the floor once from the commit-op history (t{v}.json tags:
        the latest REBUCKET, or the first version whose tag is no longer
        verifiable) and backfill the stamp best-effort."""
        v = self._meta.get("n_buckets_since")
        if v is not None:
            return int(v)
        cached = self.__dict__.get("_nbs_inferred")
        if cached is None:
            cached = self._infer_n_buckets_since()
            self.__dict__["_nbs_inferred"] = cached
            # backfill so later instances skip the scan; best-effort AND
            # nowait (r11 review finding 4): this runs on READ paths, so
            # it must neither stall behind an in-flight writer's claim
            # nor steal a slow live writer's stale claim (which would
            # abort that writer's legitimate commit). A busy slot or a
            # read-only FS keeps the in-memory value — still correct.
            try:
                self._update_meta(
                    lambda meta: meta.setdefault("n_buckets_since", cached),
                    nowait=True,
                )
            except Exception:  # noqa: BLE001 — backfill is best-effort
                pass
        return cached

    def _infer_n_buckets_since(self) -> int:
        """Conservative rebucket floor for tables stamped before
        ``n_buckets_since`` existed: walk commit-op tags from the head
        down — the first REBUCKET tag is the floor; a missing/unreadable
        tag file (vacuumed history) means nothing below it is provable,
        so that version itself is the floor (its manifest, if readable,
        was written under whatever count was then current — and a
        rebucket AT it would still make ≥ it safe). O(head) tiny JSON
        reads, once per table (backfilled into meta)."""
        head = int(self._meta.get("version", 0))
        for v in range(head, 0, -1):
            tp = os.path.join(self.path, "manifests", f"t{v}.json")
            try:
                with open(tp) as f:
                    op = str(json.load(f).get("op", ""))
            except (OSError, ValueError):
                return v
            if "REBUCKET" in op:
                return v
        return 0

    def version(self) -> int:
        # re-read: another process (a chained upstream query) may have
        # committed since we cached (reference getLatestVersion probes the
        # table history the same way, elzyme/streams.py:210-213)
        self._meta = self._read_meta()
        return self._meta["version"]

    def applied_through(self, stage_key: str) -> list[int] | None:
        """Input versions this target has already consumed for the given
        IVM stage (recorded atomically with the commit by
        ``replace_keys(applied_marker=...)``); None before the stage's
        first marked commit. Fresh read — the restart-healing path that
        needs this runs before any other metadata access."""
        self._meta = self._read_meta()
        rec = self._meta.get("applied_through", {}).get(stage_key)
        return [int(x) for x in rec] if rec is not None else None

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
        n_buckets: int = 32,
        generated_columns: dict[str, str] | None = None,
        constraints: dict[str, str] | None = None,
        backend=None,
    ) -> "ChangeTable":
        """Create an empty change table (reference CREATE TABLE with CDF
        enabled, elzyme/joins.py:642-654). ``n_buckets`` sizes the
        copy-on-write granularity: at production scale set it so one bucket
        ≈ a few GB (e.g. 8192 buckets for a 10 TB table).

        ``generated_columns`` maps column name → SQL expression computed on
        every write from the row's other columns — the GENERATED ALWAYS AS
        analog (reference M4, used with ``partition_by`` naming a generated
        column for the reference's derive-then-prune pattern,
        elzyme/joins.py:642-654, 676-682). Types are inferred from the
        expression; writers never supply these columns.

        ``constraints`` maps constraint name → SQL boolean expression that
        every ``append``/``merge`` batch must satisfy on every row — the
        Delta CHECK-constraint analog (DLT ON VIOLATION FAIL). A violating
        batch raises before anything is written (one extra conditional-
        count job per write, only when constraints are configured; use
        FileIngest's quarantine gate instead when bad rows should divert,
        not fail)."""
        if isinstance(schema, DataFrame):
            schema = schema.schema
        generated_columns = dict(generated_columns or {})
        if generated_columns:
            overlap = [c for c in generated_columns if c in {f.name for f in schema.fields}]
            if overlap:
                raise ValueError(
                    f"generated column(s) {overlap} already in the schema — "
                    "pass only the base columns"
                )
            probe = spark.createDataFrame([], schema)
            for col_name, expr in generated_columns.items():
                probe = probe.withColumn(col_name, F.expr(expr))
            schema = probe.schema
        if not primary_keys:
            raise ValueError("primary keys are required for a mergeable table "
                             "(parity with reference README.md:60)")
        field_names = {f.name for f in schema.fields}
        missing = [k for k in primary_keys if k not in field_names]
        if missing:
            raise ValueError(
                f"primary key column(s) {missing} not in table schema "
                f"{sorted(field_names)} — keep them in the projection"
            )
        bad_parts = [c for c in partition_by if c not in field_names]
        if bad_parts:
            raise ValueError(
                f"partition column(s) {bad_parts} not in table schema "
                f"{sorted(field_names)} — keep them in the projection"
            )
        path = path.rstrip("/")
        if ChangeTable.exists(path):
            if not overwrite:
                return ChangeTable(spark, path, backend=backend)
            shutil.rmtree(path)
        os.makedirs(os.path.join(path, "changes"), exist_ok=True)
        os.makedirs(os.path.join(path, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        with open(os.path.join(path, "manifests", "v0.json"), "w") as f:
            json.dump({}, f)
        with open(os.path.join(path, "manifests", "t0.json"), "w") as f:
            json.dump({"commit_ts": time.time(), "op": "CREATE"}, f)
        meta = {
            "name": name or os.path.basename(path),
            "version": 0,
            "primary_keys": list(primary_keys),
            "sequence_by": list(sequence_by),
            "partition_by": list(partition_by),
            "n_buckets": n_buckets,
            # explicit from birth: a missing key means "pre-r10 table,
            # rebucket history unknown" and costs an inference scan (see
            # n_buckets_since) — new tables are provably current-hash
            # from v0
            "n_buckets_since": 0,
            "generated_columns": generated_columns,
            "constraints": dict(constraints or {}),
            "schema": schema.jsonValue(),
        }
        # the initial meta write is the table's PUBLISH (readers gate on
        # meta existing) — it goes through the backend's atomic replace
        # like every later meta bump, never a raw write (r8 audit)
        from .backends import POSIX

        (backend if backend is not None else POSIX).replace(
            os.path.join(path, META_FILE), json.dumps(meta)
        )
        return ChangeTable(spark, path, backend=backend)

    # ------------------------------------------------------------------
    # manifest / partition helpers
    # ------------------------------------------------------------------
    def _manifest_path(self, v: int) -> str:
        return os.path.join(self.path, "manifests", f"v{v}.json")

    def _manifest(self, v: int) -> dict[str, list]:
        """part id → list of dir entries (plain rel-path strings or
        stats-carrying dicts — see ``_entry_dir``)."""
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    @property
    def stats_extra_cols(self) -> tuple[str, ...]:
        """Extra stats columns beyond pk+partition — recorded by
        ``compact(zorder_by=...)`` (and settable via
        ``set_stats_columns``) so post-ZORDER tables can prune scoped
        rewrites AND scoped reads on the clustered dimensions."""
        return tuple(self._meta.get("stats_cols_extra", ()))

    def set_stats_columns(self, *cols: str) -> None:
        """Declare extra manifest-stats columns (beyond pk + partition).
        Future commits harvest footer min/max for them; pruning on any
        subset of scope columns stays sound (missing stats read as "may
        contain"), so existing entries need no rewrite. Claim-serialized
        metadata-only update (``_update_meta``) — a bare RMW of the meta
        file would clobber a concurrent commit's version bump."""
        known = set(self._data_cols())
        bad = [c for c in cols if c not in known]
        if bad:
            raise ValueError(f"unknown stats column(s) {bad}")

        def mutate(meta: dict) -> None:
            meta["stats_cols_extra"] = list(
                dict.fromkeys([*meta.get("stats_cols_extra", ()), *cols])
            )

        self._update_meta(mutate)

    def _stats_cols(self) -> list[str]:
        """Columns whose per-dir min/max land in the manifest: the primary
        keys (what merge/replace scopes probe on), the partition columns
        (what part assignment hashes on), plus any declared extras
        (z-order dimensions — see ``stats_extra_cols``)."""
        cols = list(self.primary_keys)
        for c in (*self.partition_by, *self.stats_extra_cols):
            if c not in cols:
                cols.append(c)
        return cols

    def _stats_entry(
        self, rel: str, max_files: int | None = None,
        stats_cols: Sequence[str] | None = None,
    ):
        """Manifest entry for a freshly written path (dir or file): rel
        path + footer stats when any stats column yielded usable bounds
        + the entry's on-disk byte size (the Delta add-file size analog —
        lets scoped reads skip probe jobs on snapshots too small for
        pruning to pay, see PRUNE_MIN_READ_BYTES); a plain string only
        when neither is known (keeps the legacy shape)."""
        abs_path = os.path.join(self.path, rel)
        s = _dir_stats(
            abs_path,
            self._stats_cols() if stats_cols is None else list(stats_cols),
            max_files=max_files,
        )
        b = _path_bytes(abs_path)
        if s is None and b is None:
            return rel
        e: dict = {"d": rel}
        if s:
            e["s"] = s
        if b is not None:
            e["b"] = b
        return e

    def _entries_for(
        self, rel_dir: str, sorted_write: bool = True,
        stats_cols: Sequence[str] | None = None,
    ) -> list:
        """Manifest entries for a freshly written part dir — PER FILE when
        a SORTED write left several parquet files (the sub-part COW
        granularity: compacted rewrites sort by the stats columns and
        split at ``SPLIT_ROWS_PER_FILE``, so each file carries a tight,
        disjoint key range and future commits rewrite only
        scope-intersecting FILES); one merged-stats dir entry for
        single-file dirs and for UNSORTED task-parallel writes, whose
        per-file ranges overlap and would barely prune — those also cap
        their footer reads (``_STATS_FILES_MAX_UNSORTED``) so a
        many-hundred-file bulk commit never pays thousands of serial
        driver-side metadata reads (r9 review finding). This is Delta's
        add-file granularity: the manifest tracks files within a part,
        min/max stats from the footers."""
        abs_dir = os.path.join(self.path, rel_dir)
        try:
            files = sorted(
                f for f in os.listdir(abs_dir) if f.endswith(".parquet")
            )
        except OSError:
            files = []
        if sorted_write and 1 < len(files) <= _ENTRY_FILES_MAX:
            return [
                self._stats_entry(os.path.join(rel_dir, f), stats_cols=stats_cols)
                for f in files
            ]
        return [
            self._stats_entry(
                rel_dir,
                # footer-read cap in BOTH fallback arms: a sorted dir past
                # _ENTRY_FILES_MAX would otherwise pay an unbounded serial
                # metadata read for one merged entry (r9 ADVICE) — exactly
                # the cost the unsorted cap exists to prevent
                max_files=_ENTRY_FILES_MAX if sorted_write
                else _STATS_FILES_MAX_UNSORTED,
                stats_cols=stats_cols,
            )
        ]

    @staticmethod
    def _prunable(manifest: dict) -> bool:
        """Sub-part pruning can only save work when some part has MORE
        than one dir (there must be something to carry forward) — the
        gate that keeps fully-compacted tables (the IVM steady state,
        one consolidated dir per part) paying ZERO extra actions for the
        stats machinery."""
        return any(len(es) > 1 for es in manifest.values())

    def _scope_bounds(
        self, frame: DataFrame, key_cols, small: bool = True,
        with_parts: bool = False,
    ) -> dict | None:
        """Per-column (min, max, has_null[, value list]) of a write's key
        scope — ONE tiny all-to-one aggregate (partial-agg reduce,
        O(scope) scan), the probe side of sub-part pruning. ``small``
        (the caller's broadcast-size hint) additionally folds a
        size-capped ``collect_set`` into the SAME action: when the
        distinct key count fits ``_SCOPE_VALUES_MAX`` the COMPLETE value
        list rides along (slicing to MAX+1 detects overflow — an
        incomplete list would be unsound and is discarded); scattered
        keys then prune by exact membership instead of one global
        interval. Only columns that are also stats columns participate;
        pruning on a SUBSET of the scope's key columns stays sound (a
        dir that cannot match on one column cannot match the tuple).
        Returns None (= prune nothing) when no column qualifies or the
        probe fails.

        ``with_parts`` (scoped READS): additionally ride the value
        collect with the scope's PART ids (the partition-column hash —
        caller guarantees the partition columns are among ``frame``'s
        columns), returning ``(bounds, parts)`` instead — rows for a key
        tuple can only live in that tuple's hash part, so a small scope
        restricts the read to its owning parts on top of file-stats
        pruning. Parts are None when the value collect was skipped or
        overflowed (unbounded scopes never pay a driver-side set)."""
        stats_cols = set(self._stats_cols())
        cols = [c for c in key_cols if c in stats_cols]
        if not cols:
            return (None, None) if with_parts else None
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, c in enumerate(cols):
            col = F.col(f"`{c}`")
            aggs.append(F.min(col).alias(f"lo{i}"))
            aggs.append(F.max(col).alias(f"hi{i}"))
            aggs.append(F.max(col.isNull().cast("int")).alias(f"nl{i}"))
        try:
            row = frame.agg(*aggs).collect()[0]
        except Exception:  # noqa: BLE001 — pruning is best-effort
            return (None, None) if with_parts else None
        # value lists only when the scope is PROVEN small: the second
        # collect is cheap by definition then, and big scopes never pay
        # set-accumulation anywhere — a collect_set folded into the first
        # agg would build the FULL set executor-side before any cap
        # applies (measured at 1000×: it was the churn-median regression,
        # millions of keys accumulated per slice). The collect itself is
        # limit-capped at MAX+1 regardless of what the count said: the
        # frame re-evaluates between the two actions, and an incomplete
        # value list would be UNSOUND (files holding uncollected keys
        # would be excluded) — cap overflow discards the list, never
        # truncates it.
        vals_rows = None
        if small and 0 < row["__n"] <= _SCOPE_VALUES_MAX:
            sel = [F.col(f"`{c}`") for c in cols]
            if with_parts:
                sel.append(self._part_expr().alias("__pt"))
            try:
                vals_rows = (
                    frame.select(*sel)
                    .limit(_SCOPE_VALUES_MAX + 1)
                    .collect()
                )
                if len(vals_rows) > _SCOPE_VALUES_MAX:
                    vals_rows = None
            except Exception:  # noqa: BLE001
                vals_rows = None
        parts = (
            sorted({r["__pt"] for r in vals_rows})
            if with_parts and vals_rows is not None
            else None
        )
        out = {}
        for i, c in enumerate(cols):
            lo, hi = row[f"lo{i}"], row[f"hi{i}"]
            if lo is not None and not isinstance(lo, _STATS_TYPES):
                continue  # type never comparable against JSON stats
            vals = None
            if vals_rows is not None and lo is not None:
                # lo passed the type gate, so every value is comparable —
                # except NaN, which Python cannot order (sorted() places
                # it arbitrarily and bisect then excludes files that DO
                # hold scoped keys — reproduced r9 review finding) and
                # which Spark treats as equal to NaN in join keys: a
                # NaN-carrying scope must never exclude by values (the
                # interval path stays safe on its own — Spark's max
                # returns NaN, and NaN comparisons read as overlap)
                vs = {r[i] for r in vals_rows if r[i] is not None}
                if not any(isinstance(x, float) and x != x for x in vs):
                    vals = tuple(sorted(vs))
            out[c] = (lo, hi, bool(row[f"nl{i}"]), vals or None)
        if with_parts:
            return (out or None, parts)
        return out or None

    def _read_pruned(
        self,
        manifest: dict,
        bounds: dict | None,
        part_ids: Sequence[int] | None = None,
    ) -> DataFrame:
        """Read the manifest's dirs (optionally restricted to given
        parts), skipping every dir whose footer stats prove it disjoint
        from ``bounds`` — the file-pruning tier under the part-pruning
        tier. ``bounds=None`` disables pruning (plain part read)."""
        want = None if part_ids is None else {str(p) for p in part_ids}
        dirs = [
            _entry_dir(e)
            for p, es in manifest.items()
            if want is None or p in want
            for e in es
            if not _entry_excluded(e, bounds)
        ]
        return self._read_dirs(dirs)

    def _carry_forward(
        self, manifest: dict, bounds: dict | None, part_ids: Sequence[int]
    ) -> dict[str, list]:
        """The manifest entries a rewrite commit KEEPS per affected part:
        exactly the dirs ``_read_pruned`` skipped, so read set ∪ carry
        set = the part's full dir list under the same bounds."""
        if not bounds:
            return {}
        return {
            str(p): [
                e
                for e in manifest.get(str(p), ())
                if _entry_excluded(e, bounds)
            ]
            for p in part_ids
        }

    def _part_expr(self, n_buckets: int | None = None):
        cols = self.partition_by or self.primary_keys
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in cols]),
            F.lit(n_buckets or self.n_buckets),
        )

    def _with_part(self, df: DataFrame, n_buckets: int | None = None) -> DataFrame:
        return df.withColumn(PART, self._part_expr(n_buckets))

    def _collect_parts(self, df: DataFrame) -> list[int]:
        """Distinct part ids of a frame — bounded by n_buckets, so the
        collect is a driver-safe tiny aggregate."""
        rows = self._with_part(df).select(PART).distinct().collect()
        return sorted(r[0] for r in rows)

    @staticmethod
    def _est_bytes(df: DataFrame) -> int | None:
        """Catalyst plan-size estimate (driver-only, no action). For
        parquet-scan-rooted plans this is the file-size sum — reliable for
        the merge/delete rewrite gates; join-heavy plans can overestimate
        wildly, which only declines compaction (safe direction)."""
        try:
            return int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:  # noqa: BLE001 — estimate is best-effort
            return None

    @classmethod
    def _est_bytes_if_scan(cls, df: DataFrame) -> int | None:
        """Plan-size estimate ONLY for scan-rooted plans (no join /
        aggregate / cached-relation node in the optimized plan) — the one
        shape where Catalyst's estimate is the on-disk byte sum. Join- and
        agg-heavy plans (every IVM slice) overestimate by orders of
        magnitude, so they return None = "unknown": gates must treat None
        as pass, never as decline (r8 ADVICE — an externally precomputed
        multi-GB scan-rooted frame under a small key scope must not ride
        the small-scope hint into a serialized compacted write, while an
        overestimating IVM slice must keep its compaction).

        Classification walks the plan TREE and matches node class names
        (``nodeName``), never the rendered string — a column or file path
        merely CONTAINING 'Join'/'Aggregate' must not silently drop the
        veto (r9 ADVICE)."""
        try:
            plan = df._jdf.queryExecution().optimizedPlan()
            stack = [plan]
            while stack:
                node = stack.pop()
                name = str(node.nodeName())
                if (
                    "Join" in name
                    or "Aggregate" in name
                    or "InMemoryRelation" in name
                ):
                    return None
                children = node.children()
                for i in range(children.size()):
                    stack.append(children.apply(i))
            return int(plan.stats().sizeInBytes())
        except Exception:  # noqa: BLE001 — estimate is best-effort
            return None

    def _read_dirs(self, dirs: list[str]) -> DataFrame:
        if not dirs:
            return self.spark.createDataFrame([], self.schema())
        paths = [os.path.join(self.path, d) for d in dirs]
        return self.spark.read.schema(self.schema()).parquet(*paths)

    def _read_parts(self, manifest: dict, part_ids: Sequence[int]) -> DataFrame:
        """Pruned read: only the data dirs of the given parts."""
        return self._read_pruned(manifest, None, part_ids)

    # ------------------------------------------------------------------
    # readers
    # ------------------------------------------------------------------
    def snapshot(self, version: int | None = None) -> DataFrame:
        """Version-pinned static read (reference ``versionAsOf`` reads,
        elzyme/streams.py:118-124)."""
        v = self.version() if version is None else version
        manifest = self._manifest(v)
        return self._read_dirs(
            [_entry_dir(e) for es in manifest.values() for e in es]
        )

    def snapshot_pruned(
        self,
        scope_keys: DataFrame,
        key_cols: Sequence[str],
        version: int | None = None,
        small: bool = True,
    ) -> DataFrame:
        """File-pruned version-pinned read: every file/dir whose footer
        stats prove it DISJOINT from ``scope_keys``' bounds on
        ``key_cols`` is skipped at the manifest level — reader-side data
        skipping, the read twin of the r9 rewrite pruning (Delta serves
        the same from its transaction-log per-file stats). Returns a
        SUPERSET of the scoped rows (pruning is sound, never complete):
        callers must still apply their exact filter — ``read_where`` is
        the exact public wrapper; the IVM runtime applies its
        broadcast/bloom/shuffle semi-join ladder on top.

        Cost: one tiny bounds aggregate over ``scope_keys`` (plus a
        ≤64k-capped value collect when ``small``), skipped entirely —
        zero extra actions — when every part is a single consolidated
        dir (nothing to prune) or no key column carries stats. At 100 TB
        this is what turns a Δ-of-64k-keys probe against a 600 MB/bucket
        table into ~one split file per bucket instead of the bucket.

        On top of the file tier, a ``small`` scope whose key columns
        cover the partition columns also restricts the read to the
        scope's OWNING hash parts (rows for a key tuple can only live in
        that tuple's part) — the part ids ride the same value collect,
        so the fully-compacted steady state (one dir per part, nothing
        to file-prune) still skips every part the scope doesn't hash
        into. Part restriction is skipped for versions pinned before an
        online re-bucketing (``n_buckets_since``), whose manifests were
        hashed under a different count.

        Soundness requires the probe and the downstream consumers to see
        ONE evaluation of ``scope_keys`` — nondeterministic frames must
        be materialized first (the IVM runtime localCheckpoints its
        affected-key scopes; see replace_keys for the write-side twin).
        """
        v = self.version() if version is None else version
        manifest = self._manifest(v)
        key_cols = list(key_cols)
        pb = self.partition_by or self.primary_keys
        want_parts = bool(
            small
            and pb
            and v >= self.n_buckets_since
            and all(c in key_cols for c in pb)
        )
        if not (want_parts or self._prunable(manifest)):
            return self._read_pruned(manifest, None)
        # probe-for-profit gate: when every entry carries its size and the
        # whole snapshot is tiny, the 1-2 bounds-probe jobs cost more than
        # the scan they would skip — read it all (unknown sizes probe)
        known = 0
        for es in manifest.values():
            for e in es:
                b = e.get("b") if isinstance(e, dict) else None
                if b is None:
                    known = None
                    break
                known += b
            if known is None:
                break
        if known is not None and known <= PRUNE_MIN_READ_BYTES:
            return self._read_pruned(manifest, None)
        res = self._scope_bounds(
            scope_keys.select(*key_cols), key_cols, small=small,
            with_parts=want_parts,
        )
        bounds, parts = res if want_parts else (res, None)
        if not self._prunable(manifest):
            bounds = None  # single-dir parts: nothing to file-prune
        return self._read_pruned(manifest, bounds, parts)

    def read_where(
        self,
        scope_keys: DataFrame,
        key_cols: Sequence[str],
        version: int | None = None,
        small: bool = True,
    ) -> DataFrame:
        """Exact scoped read: the snapshot rows whose ``key_cols`` tuple
        appears in ``scope_keys`` (null-safe equality, Spark join-key
        semantics) — ``snapshot_pruned`` for the file skipping plus the
        exact membership filter. ``small`` hints that the key set fits a
        broadcast (the default CDC-scope case); pass False for
        table-sized scopes, which shuffle instead. The scope frame is
        localCheckpointed so the pruning probe and the exact filter read
        one materialization even for nondeterministic inputs.

        Checkpoint lifetime (r10 VERDICT watch-item 1 + r11 review):
        small scopes (≤ ``READ_WHERE_INLINE_MAX`` tuples) are collected
        ONCE and inlined as a literal membership filter — the returned
        plan carries NO checkpoint dependency, so it composes freely
        (``read_where(...).where(x).collect()``, derived frames, caching)
        and the scope blocks are freed before returning. Struct-literal
        IN is exact under Spark semantics: field-wise null-safe and
        NaN == NaN, same as the join-key equality it replaces. Scopes
        over the inline cap keep the broadcast/shuffle semi-join against
        the checkpointed frame; those blocks are freed automatically
        when the RETURNED object is garbage-collected (weakref
        finalizer) — derive from the result while the parent is alive;
        a freed derived frame fails loudly
        (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND), never silently. Early
        release for the big-scope path: ``out._sj_free_scope()``."""
        import weakref  # noqa: PLC0415 - stdlib, cold path

        key_cols = list(key_cols)
        keys = (
            scope_keys.select(*key_cols)
            .dropDuplicates(key_cols)
            .localCheckpoint(eager=True)
        )
        snap = self.snapshot_pruned(keys, key_cols, version=version, small=small)
        inline = self._tuple_membership(keys, key_cols) if small else None
        if inline is not None:
            out = snap.where(inline)
            _free_checkpoint(keys)  # probe + collect done; plan is literal
            return out
        K, D = "k", "d"
        cond = None
        for c in key_cols:
            e = F.col(f"{D}.`{c}`").eqNullSafe(F.col(f"{K}.`{c}`"))
            cond = e if cond is None else (cond & e)
        probe = F.broadcast(keys.alias(K)) if small else keys.alias(K)
        out = (
            snap.alias(D)
            .join(probe, cond, "left_semi")
            .select([F.col(f"{D}.`{c}`").alias(c) for c in snap.columns])
        )
        # tie the scope blocks' lifetime to the result object; the
        # finalizer holds only the checkpointed frame (not `out`, which
        # would make the cycle uncollectable) and is idempotent/safe at
        # interpreter shutdown (_free_checkpoint swallows)
        out._sj_free_scope = weakref.finalize(out, _free_checkpoint, keys)
        return out

    def _tuple_membership(self, keys: DataFrame, key_cols):
        """EXACT tuple-membership Column over a bounded key frame, or
        None when the scope exceeds ``READ_WHERE_INLINE_MAX`` (an
        unbounded literal IN would bloat the plan) or the collect fails.
        Single column → plain IN (+ isNull for null keys); multiple
        columns → struct-literal IN, which Spark compares field-wise
        null-safe (verified) — both match the eqNullSafe join-key
        semantics exactly, including NaN == NaN."""
        try:
            rows = keys.limit(READ_WHERE_INLINE_MAX + 1).collect()
        except Exception:  # noqa: BLE001 — fall back to the semi-join
            return None
        if len(rows) > READ_WHERE_INLINE_MAX:
            return None
        if not rows:
            return F.lit(False)
        try:
            fields = {f.name: f.dataType for f in keys.schema.fields}
            if len(key_cols) == 1:
                c = key_cols[0]
                vals = {r[0] for r in rows}
                has_null = None in vals
                vals.discard(None)
                e = (
                    F.col(f"`{c}`").isin(*vals) if vals else F.lit(False)
                )
                return (e | F.col(f"`{c}`").isNull()) if has_null else e
            lits = [
                F.struct(
                    *[
                        F.lit(r[i]).cast(fields[c]).alias(c)
                        for i, c in enumerate(key_cols)
                    ]
                )
                for r in rows
            ]
            return F.struct(*[F.col(f"`{c}`") for c in key_cols]).isin(*lits)
        except Exception:  # noqa: BLE001 — unliteralizable key types
            return None

    def _resolved_condition(self, condition):
        """The catalyst expression of ``condition`` resolved against this
        table's schema (a schema-only empty frame — no data read, no
        job), or None when unresolvable. This is what the stats
        evaluator (``_expr_may_match``) walks: resolution normalizes
        both Column and SQL-string shapes into one tree with concrete
        attribute/literal types."""
        try:
            empty = self.spark.createDataFrame([], self.schema())
            plan = empty.where(condition)._jdf.queryExecution().analyzed()
            if str(plan.nodeName()) != "Filter":
                return None
            return plan.condition()
        except Exception:  # noqa: BLE001 — pruning is best-effort
            return None

    def _read_cond_pruned(
        self, manifest: dict, condition
    ) -> DataFrame:
        """Manifest read skipping every entry whose footer stats prove NO
        row can satisfy ``condition`` (r10 VERDICT task 2) — the
        condition-scan twin of the key-scope pruning in ``_read_pruned``.
        Returns a SUPERSET of the matching rows; callers apply the exact
        filter. Range-shaped conditions on stats columns (retention
        horizons, partition-value deletes, pk ranges) prune hard; opaque
        predicates read everything. Driver-only: no probe job at all —
        the 'scope' is the condition itself."""
        jexpr = self._resolved_condition(condition)
        dirs = []
        for es in manifest.values():
            for e in es:
                stats = e.get("s") if isinstance(e, dict) else None
                if (
                    jexpr is not None
                    and stats
                    and not _expr_may_match(jexpr, stats)
                ):
                    continue
                dirs.append(_entry_dir(e))
        return self._read_dirs(dirs)

    def scan_where(self, condition, version: int | None = None) -> DataFrame:
        """Exact condition scan with manifest-stats file skipping: the
        snapshot rows matching ``condition`` (Column or SQL string),
        reading only the files whose footer stats admit a match — the
        predicate twin of :meth:`read_where` (Delta serves the same scan
        from its per-file stats). Conditions that constrain stats
        columns (pk / partition / zorder-declared) by ranges, equalities
        or IN lists prune; anything else degrades to a full
        scan + filter with zero extra cost (the pruning decision is a
        driver-side walk of the manifest, no probe jobs)."""
        if isinstance(condition, str):
            condition = F.expr(condition)
        v = self.version() if version is None else version
        return self._read_cond_pruned(self._manifest(v), condition).where(
            condition
        )

    def change_floor(self) -> int:
        """Oldest version whose change range is still readable — bumped by
        ``vacuum`` (the CDF-retention watermark). Needed because an
        insert-only commit's change files double as live data (the
        single-write layout) and may be KEPT past change retention while
        the manifest references them; the floor keeps the feed truncated
        to the retained window regardless."""
        return int(self._read_meta().get("change_floor", 0))

    def read_change_feed(self, starting_version: int = 1) -> DataFrame:
        """Batch read of the change feed from a version onward, capped at the
        currently committed version: change files of a crashed (un-bumped)
        commit carry a higher version stamp and must stay invisible until
        the retried commit publishes them. The lower bound is clamped to
        the vacuum retention floor (requesting an older range returns only
        the retained part — Delta raises here; clamping is kinder to
        restarting consumers whose watermark vacuum has already honored)."""
        df = (
            self.spark.read.schema(self.change_schema())
            .option("recursiveFileLookup", "true")
            .parquet(os.path.join(self.path, "changes"))
        )
        return df.where(
            (F.col(COMMIT_VERSION) >= max(starting_version, self.change_floor()))
            & (F.col(COMMIT_VERSION) <= F.lit(self.version()))
        )

    def read_change_range(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Pinned-range read of the change feed: lists and opens ONLY the
        commit dirs in ``[v_from, v_to]`` — O(range) planning instead of
        the whole-directory scan of :meth:`read_change_feed`, which is
        O(total commits ever) per call. On a long-lived table with
        thousands of commits this is what keeps each IVM microbatch's
        planning cost proportional to its backlog, not the table's age.
        Unlike the full-feed read (whose "from the beginning" idiom clamps
        to the retention floor), a PINNED range that starts below the
        floor RAISES — this is the IVM consumer path, and silently
        skipping a vacuumed range would let a stale-watermark consumer
        apply a partial delta and diverge forever (Delta's CDF read
        errors the same way). The version filter stays as a cheap guard
        (files kept past vacuum retention inside a live single-write dir
        carry sub-floor versions)."""
        head = self.version()
        v_to = head if v_to is None else min(int(v_to), head)
        v_from = max(int(v_from), 1)
        floor = self.change_floor()
        if v_from < floor and v_from <= v_to:
            raise ValueError(
                f"change range [{v_from}, {v_to}] of {self.name!r} starts "
                f"below the vacuum retention floor v{floor}: the older "
                "commits were vacuumed, so applying the remainder would "
                "silently diverge. Re-seed the consumer (startingVersion "
                f">= {floor}, or rebuild from a snapshot)."
            )
        dirs = [
            d
            for v in range(v_from, v_to + 1)
            if os.path.isdir(d := os.path.join(self.path, "changes", f"c{v}"))
        ]
        if not dirs:
            return self.spark.createDataFrame([], self.change_schema())
        df = (
            self.spark.read.schema(self.change_schema())
            .option("recursiveFileLookup", "true")
            .parquet(*dirs)
        )
        return df.where(
            (F.col(COMMIT_VERSION) >= v_from) & (F.col(COMMIT_VERSION) <= v_to)
        )

    def change_bytes(self, version: int) -> int:
        """Driver-side size probe of one commit's change files — the byte
        input of the IVM microbatch governor (the reference caps every CDF
        microbatch at 1 GB via ``maxBytesPerTrigger``, elzyme/streams.py:
        128,138; this is the same on-disk-bytes currency). Pure directory
        walk, no Spark job — O(files in one commit)."""
        d = os.path.join(self.path, "changes", f"c{version}")
        if not os.path.isdir(d):
            return 0
        total = 0
        for root, _dirs, files in os.walk(d):
            for fn in files:
                if fn.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, fn))
        return total

    def change_rows(self, version: int) -> int:
        """Driver-side ROW count of one commit's change files — parquet
        footer metadata only (pyarrow), no Spark job; the rows-out metric
        of the IVM observability surface. Same walk as change_bytes."""
        import pyarrow.parquet as pq  # noqa: PLC0415 - driver-only probe

        d = os.path.join(self.path, "changes", f"c{version}")
        if not os.path.isdir(d):
            return 0
        total = 0
        for root, _dirs, files in os.walk(d):
            for fn in files:
                if fn.endswith(".parquet"):
                    total += pq.read_metadata(os.path.join(root, fn)).num_rows
        return total

    def read_change_stream(self, max_files_per_trigger: int | None = None) -> DataFrame:
        """The change feed as a Structured Streaming source. Every commit's
        files become (part of) a microbatch — the open-source equivalent of
        the reference's CDF readStream with its 1 GB/trigger cap
        (elzyme/streams.py:126-134). Downstream stages re-read pinned change
        ranges via ``read_change_feed`` (the stream is only a trigger), so
        the committed-version cap there also shields streaming consumers
        from crashed-commit orphans."""
        reader = self.spark.readStream.schema(self.change_schema())
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger or 16)
        reader = reader.option("recursiveFileLookup", "true")
        return reader.parquet(os.path.join(self.path, "changes"))

    def commit_timestamp(self, v: int) -> float | None:
        """Wall-clock of commit ``v`` (None for tables written before
        timestamps landed)."""
        p = os.path.join(self.path, "manifests", f"t{v}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return float(json.load(f)["commit_ts"])

    def describe_history(self) -> DataFrame:
        """Commit log as a DataFrame (the Delta ``DESCRIBE HISTORY``
        analog): one row per surviving version with its wall-clock
        timestamp, operation tag (APPEND / MERGE / REPLACE / DELETE /
        OPTIMIZE [ZORDER] / RESTORE / CREATE — stamped at commit time) and
        on-disk change bytes. O(versions) metadata reads on the driver —
        the same bound as ``snapshot_as_of`` — no data scanned; versions
        dropped by ``vacuum`` are absent."""
        rows = []
        for v in range(self.version() + 1):
            p = os.path.join(self.path, "manifests", f"t{v}.json")
            if not os.path.exists(p):
                continue
            with open(p) as f:
                meta = json.load(f)
            rows.append(
                (
                    v,
                    float(meta["commit_ts"]),
                    meta.get("op", "WRITE"),
                    self.change_bytes(v) if v > 0 else 0,
                )
            )
        return self.spark.createDataFrame(
            rows,
            "version long, commit_ts double, operation string, "
            "change_bytes long",
        )

    def snapshot_as_of(self, ts: float) -> DataFrame:
        """TIMESTAMP AS OF read (Delta analog): the snapshot at the latest
        commit whose wall-clock is ≤ ``ts``. Raises if ``ts`` predates the
        table. O(versions) metadata reads, no data scanned beyond the
        resolved snapshot."""
        best = None
        for v in range(self.version() + 1):
            cts = self.commit_timestamp(v)
            if cts is not None and cts <= ts:
                best = v
        if best is None:
            raise ValueError(
                f"no commit of {self.name!r} at or before timestamp {ts}"
            )
        return self.snapshot(best)

    def history(self) -> DataFrame:
        """SCD Type-2 history derived from the change feed: one row per
        version a primary key has ever held, with ``valid_from`` /
        ``valid_to`` commit versions and ``is_current``. A key's interval is
        closed by the next insert/update/delete touching it (deletes close
        the previous interval without emitting a row of their own; a later
        re-insert opens a fresh one), so gaps in a key's timeline are
        exactly its deleted spans.

        The classic warehouse SCD2 build is a MERGE maintaining open/closed
        rows; with a change feed it reduces to one per-key ordered window —
        ONE shuffle on the primary keys, no join. The reference has no
        analog (its CDF drops deletes, elzyme/streams.py:132,142); this is
        the payoff of the substrate's delete-carrying feed.
        """
        feed = self.read_change_feed()
        touched = feed.where(F.col(CHANGE_TYPE) != UPDATE_PRE)
        w = Window.partitionBy(
            *[F.col(f"`{k}`") for k in self.primary_keys]
        ).orderBy(F.col(COMMIT_VERSION))
        nxt = F.lead(COMMIT_VERSION).over(w)
        return (
            touched.withColumn("valid_to", nxt)
            .where(F.col(CHANGE_TYPE) != DELETE)
            .withColumn("is_current", F.col("valid_to").isNull())
            .withColumnRenamed(COMMIT_VERSION, "valid_from")
            .drop(CHANGE_TYPE)
        )

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

    # ------------------------------------------------------------------
    # schema evolution (the Delta mergeSchema analog)
    # ------------------------------------------------------------------
    def _evolve_schema(self, batch: DataFrame) -> None:
        """Widen the table schema with the batch's new columns: additions
        append as nullable; every existing data/change file reads back with
        nulls for them (schema-on-read, like Delta mergeSchema). Type
        changes and narrowing are rejected. The meta write is atomic and
        version-neutral — a crash after it leaves a harmlessly wider
        schema."""
        existing = {f.name: f.dataType for f in self.schema().fields}
        added = []
        for f in batch.schema.fields:
            if f.name in existing:
                if f.dataType != existing[f.name]:
                    raise ValueError(
                        f"column {f.name!r} type change "
                        f"{existing[f.name].simpleString()} → "
                        f"{f.dataType.simpleString()} is not supported"
                    )
            else:
                added.append(f)
        if not added:
            return
        schema = self.schema()
        for f in added:
            schema = schema.add(f.name, f.dataType, True)
        # fresh read, like _publish/vacuum: never regress concurrent
        # metadata (version head, change_floor) from a stale cache
        meta = dict(self._read_meta())
        meta["schema"] = schema.jsonValue()
        self._write_meta(meta)

    def _align(self, df: DataFrame) -> DataFrame:
        """Project a batch onto the table schema: missing columns fill with
        typed nulls, extra columns drop (callers evolve first if they want
        them kept)."""
        have = set(df.columns)
        return df.select(*[
            F.col(f.name) if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in self.schema().fields
        ])

    def _base_cols(self) -> list[str]:
        """Writer-supplied columns: the schema minus generated columns."""
        gen = self.generated_columns
        return [c for c in self._data_cols() if c not in gen]

    def _apply_generated(self, df: DataFrame) -> DataFrame:
        """(Re)compute generated columns from the row's base columns —
        GENERATED ALWAYS AS semantics: writers never supply these, and any
        supplied value is overwritten by the expression."""
        for col_name, expr in self.generated_columns.items():
            df = df.withColumn(col_name, F.expr(expr))
        return df

    # ------------------------------------------------------------------
    # commit machinery
    # ------------------------------------------------------------------
    def _write_commit(
        self,
        new_version: int,
        changes: DataFrame,
        rewritten: DataFrame | None = None,
        rewritten_parts: Sequence[int] = (),
        appended: DataFrame | None = None,
        cluster_by: Sequence[str] = (),
        op: str = "WRITE",
        content_in_changes: bool = False,
        meta_updates: dict | None = None,
        compact: bool | None = None,
        carry_forward: dict[str, list] | None = None,
        part_n_buckets: int | None = None,
        stats_cols: Sequence[str] | None = None,
    ) -> None:
        """Commit protocol — every step before the meta bump is idempotent
        (pure overwrite of version-addressed paths), so a crash anywhere
        leaves a state the retried commit (same ``v``: progress is saved
        only by the bump) regenerates exactly; no step can duplicate rows:

        1. overwrite ``data/c{v}`` with the consolidated content of
           ``rewritten_parts`` (or the pure-append batch), partitioned by
           part id;
        2. overwrite ``changes/c{v}`` with this commit's change rows;
        3. overwrite manifest v: rewritten parts point only at the new dir,
           appended parts gain the new dir, all others carry forward;
        4. atomically bump the version in the metadata file — the publish
           point; readers never see a partial commit, and readers cap the
           change feed at the committed version so steps 1-3's artifacts
           stay invisible until here.

        ``content_in_changes`` is the single-write path for INSERT-ONLY
        commits (append, bulk-load merge): the change rows ARE the new
        content, so steps 1 and 2 collapse into one partitioned write of
        the change frame under ``changes/c{v}`` and the manifest points
        into it (snapshot reads project the two change columns away via
        the explicit read schema). Delta Lake does the same — insert-only
        commits write no separate ``_change_data`` files; their CDF is
        served from the data files. At 100 TB ingest this halves the
        write amplification of every append and initial load. ``vacuum``
        keeps manifest-referenced change part-dirs alive past change
        retention and records a ``change_floor`` so the feed still
        truncates to the retained window.

        ``compact``: repartition the written frames to one file per part
        (data) / a handful of files (flat changes) — see
        ``COMPACT_WRITE_MAX_BYTES``. ``None`` auto-gates on the content's
        plan-size estimate; callers with a better signal (replace_keys'
        small-scope hint) pass it explicitly.

        ``carry_forward``: sub-part copy-on-write — per rewritten part,
        the manifest entries to KEEP alongside the new consolidated dir
        (the stat-disjoint dirs the writer's pruned read skipped; the
        writer guarantees read set ∪ carry set covers the part). Absent
        → the part's old dirs are fully superseded (pre-r9 semantics).
        Every fresh dir entry picks up footer stats via ``_stats_entry``.
        """
        v = new_version
        self._assert_claim(v)  # abort pre-write if the slot was stolen
        commit_rel = os.path.join("data", f"c{v}")
        commit_abs = os.path.join(self.path, commit_rel)
        if rewritten is not None and appended is not None:
            raise ValueError("a commit is either a rewrite or an append")
        if content_in_changes and (rewritten is not None or appended is not None):
            raise ValueError("content_in_changes commits carry only changes")
        if compact is None:
            # auto gate on the content's plan-size estimate (see
            # COMPACT_WRITE_MAX_BYTES); unknown estimate → no compaction
            content_for_est = rewritten if rewritten is not None else appended
            if content_in_changes or content_for_est is None:
                content_for_est = changes
            est = self._est_bytes(content_for_est)
            compact = est is not None and est <= _compact_limit(
                part_n_buckets or self.n_buckets
            )
        change_cols = self._data_cols() + [CHANGE_TYPE, COMMIT_VERSION]
        if content_in_changes:
            changes_rel = os.path.join("changes", f"c{v}")
            changes_abs = os.path.join(self.path, changes_rel)
            frame = self._with_part(changes.select(*change_cols))
            if compact:
                # sort by the stats columns inside each part so split
                # files carry tight disjoint key ranges (sub-part COW)
                frame = frame.repartition(
                    min(self.n_buckets, 32), F.col(PART)
                ).sortWithinPartitions(PART, *self._stats_cols())
            (
                frame
                .write.mode("overwrite")
                .option("maxRecordsPerFile", SPLIT_ROWS_PER_FILE)
                .partitionBy(PART)
                .parquet(changes_abs)
            )
            manifest = dict(self._manifest(v - 1))
            for d in sorted(os.listdir(changes_abs)):
                if not d.startswith(f"{PART}="):
                    continue
                p = d.split("=", 1)[1]
                manifest.setdefault(p, [])
                manifest[p].extend(
                    self._entries_for(
                        os.path.join(changes_rel, d), sorted_write=compact,
                        stats_cols=stats_cols,
                    )
                )
            self._publish(v, manifest, op, meta_updates=meta_updates)
            return
        # Two actions per rewrite commit (data dirs + change files). A
        # FUSED single-action variant (union tagged by __dest, staged
        # write, driver renames) was built and A/B-measured in r6: a WASH
        # (19.4 vs 19.5 s on ivm_join_cdc warm) — the change frame is
        # persisted by the writers, so the second action's compute is
        # cached and only ~50 ms of local scheduling was at stake, not
        # worth the layout complexity. See BASELINE.md r6 IVM notes.
        content = rewritten if rewritten is not None else appended
        wrote_any = content is not None
        changes_abs = os.path.join(self.path, "changes", f"c{v}")
        if wrote_any:
            out = self._with_part(
                content.select(*self._data_cols(), *cluster_by),
                n_buckets=part_n_buckets,
            )
            if cluster_by:
                # one task per part, rows z-sorted inside it → every file's
                # parquet row groups carry tight stats on the clustered
                # columns; the transient key is projected away post-sort
                out = (
                    out.repartition(F.col(PART))
                    .sortWithinPartitions(PART, *cluster_by)
                    .drop(*cluster_by)
                )
            elif compact:
                out = out.repartition(
                    min(part_n_buckets or self.n_buckets, 32), F.col(PART)
                ).sortWithinPartitions(PART, *self._stats_cols())
                # hash collisions may co-locate two parts in one task —
                # still one file-RUN per part dir (partitionBy splits per
                # task; maxRecordsPerFile splits big parts into sorted
                # files with tight disjoint key ranges — the sub-part COW
                # granularity), while capping task count for wide-bucket
                # tables
            out.write.mode("overwrite").option(
                "maxRecordsPerFile", SPLIT_ROWS_PER_FILE
            ).partitionBy(PART).parquet(commit_abs)
        ch = changes.select(*change_cols)
        if compact:
            # change files are flat (rewrite layout): a handful of balanced
            # files beats one-per-upstream-task for every later
            # read_change_range of this commit. Round-robin, NOT keyed on
            # the ≤4-value change type — an insert-heavy slice would hash
            # every row into one task (r8 review finding)
            ch = ch.repartition(4)
        ch.write.mode("overwrite").parquet(changes_abs)

        manifest = dict(self._manifest(v - 1))
        if wrote_any and os.path.isdir(commit_abs):
            on_disk = {
                d.split("=", 1)[1]
                for d in os.listdir(commit_abs)
                if d.startswith(f"{PART}=")
            }
        else:
            on_disk = set()
        for p in rewritten_parts:
            # consolidated: old dirs superseded, minus the stat-disjoint
            # dirs the writer's pruned read never touched (sub-part COW)
            kept = list((carry_forward or {}).get(str(p), ()))
            if kept:
                manifest[str(p)] = kept
            else:
                manifest.pop(str(p), None)
        for p in on_disk:
            manifest.setdefault(p, [])
            manifest[p].extend(
                self._entries_for(
                    os.path.join(commit_rel, f"{PART}={p}"),
                    sorted_write=bool(compact or cluster_by),
                    stats_cols=stats_cols,
                )
            )
        self._publish(v, manifest, op, meta_updates=meta_updates)

    # ------------------------------------------------------------------
    # optimistic concurrency: version-slot claims
    # ------------------------------------------------------------------
    def _claim_path(self, v: int) -> str:
        return os.path.join(self.path, "manifests", f"claim_v{v}.json")

    @property
    def _writer_token(self) -> str:
        import threading  # noqa: PLC0415 - stdlib, cheap

        return f"{self._writer_token_base}-{threading.get_ident()}"

    def _try_claim(self, v: int) -> bool:
        """Atomically claim commit slot ``v`` through the backend's
        put-if-absent (POSIX O_CREAT|O_EXCL; S3 conditional PUT
        ``If-None-Match: *`` — the Delta log's primitive; stores with
        neither need a coordination service, as Delta-on-S3 ships —
        see backends.py for the full contract). Returns True when the
        slot is ours: freshly created, previously created by THIS writer
        (an in-process crash-retry re-entering its own commit), or stolen
        from a claim older than ``_claim_stale_s`` whose writer is
        presumed dead (the steal is an atomic replace; two stealers racing
        inside that window is the same best-effort caveat _publish always
        documented)."""
        p = self._claim_path(v)
        payload = json.dumps({"token": self._writer_token, "ts": time.time()})
        if self.backend.put_if_absent(p, payload):
            return True
        raw = self.backend.read(p)
        if raw is None:
            return False  # vanished between probe and read: re-poll
        try:
            claim = json.loads(raw)
        except ValueError:
            # unreadable body: a foreign claimant mid-write (re-poll), OR
            # a writer that died inside the hardlink-free fallback's
            # create-vs-content window, leaving an empty claim with no
            # heartbeat to age. Age those on the FILE's mtime instead —
            # without this the slot wedges permanently (r8 review
            # finding); an unknown mtime stays a conservative re-poll.
            mt = self.backend.mtime(p)
            if mt is not None and time.time() - mt > self._claim_stale_s:
                self.backend.replace(p, payload)
                return True
            return False
        if claim.get("token") == self._writer_token:
            return True
        if time.time() - float(claim.get("ts", 0)) > self._claim_stale_s:
            self.backend.replace(p, payload)
            return True
        return False

    def _assert_claim(self, v: int) -> None:
        """Ownership re-verification + heartbeat at the write edge: called
        by _write_commit immediately before the first file write. If the
        slot was STOLEN (this writer outlived ``_claim_stale_s`` and
        another writer took the claim), abort with ConcurrentWriteError
        BEFORE any overwrite-mode write can destroy the thief's
        version-addressed files; otherwise refresh the claim timestamp so
        staleness is measured from the last protocol step, not the claim
        instant — a live writer is only stealable if a SINGLE Spark action
        of its commit exceeds ``_claim_stale_s`` (size that above your
        longest action; the residual TOCTOU window between this check and
        the write is the documented best-effort caveat of a
        plain-filesystem log). A MISSING claim file (a racing release or
        an external sweep removed it) is re-taken only through the atomic
        put-if-absent — if another writer legitimately claimed the freed
        slot in the gap, this writer aborts loudly instead of silently
        overwriting their claim (both believing they own v would be the
        one split-brain this protocol must never widen)."""
        p = self._claim_path(v)
        token = self._writer_token
        payload = json.dumps({"token": token, "ts": time.time()})
        raw = self.backend.read(p)
        if raw is None:
            if self.backend.put_if_absent(p, payload):
                return  # re-claimed atomically; payload IS the heartbeat
            raw = self.backend.read(p)  # somebody else got there first
        try:
            claim = json.loads(raw) if raw is not None else {}
        except ValueError:
            # garbled content can only be a FOREIGN put-if-absent in
            # flight (our own writes land via atomic replace): not ours
            claim = {}
        if claim.get("token") != token:
            raise ConcurrentWriteError(
                f"commit slot v{v} of {self.name!r} was stolen or "
                "re-claimed while this writer was working (its claim went "
                "stale or was released — raise _claim_stale_s above the "
                "longest single commit action); aborting before any file "
                "write"
            )
        self.backend.replace(p, payload)

    def _release_claim(self, v: int) -> None:
        """Free an unused slot (failed or no-op commit) so waiting writers
        proceed immediately instead of riding out the stale timeout.
        Published slots keep their claim files (head ≥ v, so they can
        never block anyone); vacuum sweeps them with the manifests."""
        self.backend.remove(self._claim_path(v))

    def _next_version(self) -> int:
        """Claim-serialized version assignment — the commit protocol's
        step 0 and the whole OCC story:

        Every writer claims ``head + 1`` BEFORE writing any file, so two
        concurrent writers can never address the same data/c{v} /
        changes/c{v} paths (the clobbering hazard the raw _publish guard
        could only detect after the fact). The loser of a claim race
        waits for the in-flight winner to publish, then claims the next
        slot — at which point the writer body's snapshot(v-1) reads pick
        up the winner's rows, i.e. MERGE/APPEND/DELETE rebase
        automatically and serialize like sequential commits (their
        semantics are defined on the current snapshot). replace_keys is
        the one writer whose inputs are computed OUTSIDE against a pinned
        base; it layers an explicit scope-disjointness check on top (see
        its ``expected_version``). Waiting is bounded by
        ``_claim_wait_s``: a still-live writer holding the slot past that
        raises ConcurrentWriteError; a DEAD writer's claim is stolen
        after ``_claim_stale_s``."""
        deadline = time.monotonic() + self._claim_wait_s
        while True:
            v = self.version() + 1
            if self._try_claim(v):
                return v
            if time.monotonic() >= deadline:
                raise ConcurrentWriteError(
                    f"commit slot v{v} of {self.name!r} is claimed by "
                    f"another in-flight writer (waited "
                    f"{self._claim_wait_s:.1f}s); if that writer is dead, "
                    f"its claim becomes stealable after "
                    f"{self._claim_stale_s:.0f}s"
                )
            time.sleep(0.05)

    def _publish(
        self, v: int, manifest: dict, op: str, meta_updates: dict | None = None
    ) -> None:
        """Steps 3-4 of the commit protocol: overwrite manifest v + its
        timestamp file, then atomically bump the version — the publish
        point. Version slots are CLAIMED before any file write
        (_next_version: O_EXCL put-if-absent, the Delta-log analog), so
        concurrent writers serialize and never address the same
        version-addressed paths; the optimistic version check against a
        FRESH meta read kept here is belt-and-braces for the one
        remaining hole (two stealers racing on a stale claim inside the
        same instant). The fresh read also carries forward concurrent
        metadata-only updates (vacuum's change_floor) instead of
        clobbering them from the cache."""
        meta = dict(self._read_meta())
        if meta["version"] != v - 1:
            raise ConcurrentWriteError(
                f"commit v{v} of {self.name!r} expected head v{v - 1} but "
                f"found v{meta['version']}: another writer published since "
                "this commit started (the table is single-writer; this "
                "commit's manifest was not written, but its data/change "
                "files may have overwritten the winner's — re-run the "
                "winning commit to heal)"
            )
        with open(self._manifest_path(v), "w") as f:
            json.dump(manifest, f)
        # commit wall-clock, enabling TIMESTAMP AS OF reads (Delta analog);
        # kept out of the manifest dict (whose keys are part ids) and
        # idempotently overwritten like every pre-publish artifact.
        # Clamped monotonic (Delta does the same): a clock step backward
        # must not let snapshot_as_of resolve past a later-stamped commit.
        cts = time.time()
        prev_cts = self.commit_timestamp(v - 1)
        if prev_cts is not None and cts <= prev_cts:
            cts = prev_cts + 1e-3
        with open(os.path.join(self.path, "manifests", f"t{v}.json"), "w") as f:
            json.dump({"commit_ts": cts, "op": op}, f)
        # caller-supplied metadata rides the SAME atomic meta bump (e.g.
        # the IVM applied_through marker — exactly-once across stages
        # needs the input watermark and the commit to land together);
        # dict-valued entries merge key-wise so independent stages sharing
        # one target never clobber each other's markers
        for k, val in (meta_updates or {}).items():
            if isinstance(val, dict):
                merged = {**meta.get(k, {}), **val}
                if k == "applied_through":
                    # the marker is a high-water mark and must NEVER
                    # regress: a governor-chunked replay/rebuild commits
                    # chunk [0..10] while the recorded floor is 50 — a
                    # plain overwrite would drop the floor to 10 and the
                    # NEXT chunk's v0 == floor check would re-enable the
                    # additive fast path on a range whose effect is
                    # already in the stored values (double-count; r8
                    # review finding). Element-wise max keeps the floor
                    # at 50 until the replay genuinely catches up.
                    prev = meta.get(k, {})
                    for sk, versions in val.items():
                        old = prev.get(sk)
                        if old is not None and len(old) == len(versions):
                            merged[sk] = [
                                max(int(a), int(b))
                                for a, b in zip(old, versions)
                            ]
                meta[k] = merged
            else:
                meta[k] = val
        meta["version"] = v
        self._write_meta(meta)

    def _tag(self, df: DataFrame, change_type: str, v: int) -> DataFrame:
        return df.withColumn(CHANGE_TYPE, F.lit(change_type)).withColumn(
            COMMIT_VERSION, F.lit(v).cast("long")
        )

    # ------------------------------------------------------------------
    # writers
    # ------------------------------------------------------------------
    def append(self, df: DataFrame, merge_schema: bool = False) -> int:
        """Insert-only commit — O(batch): new file-sets are added to the
        touched parts' manifests, nothing is read or rewritten. The fast
        path for immutable event streams. ``merge_schema`` widens the table
        with the batch's new columns first (strict mode drops extras and
        errors on missing columns)."""
        v = self._next_version()
        try:
            if merge_schema:
                self._evolve_schema(df)
                df = self._align(df)
            else:
                missing = [c for c in self._base_cols() if c not in df.columns]
                if missing:
                    raise ValueError(
                        f"append batch is missing column(s) {missing}; pass "
                        "merge_schema=True to null-fill (and evolve new columns)"
                    )
            batch = self._apply_generated(df).select(*self._data_cols())
            self._check_constraints(batch)
            self._write_commit(v, self._tag(batch, INSERT, v), op="APPEND",
                               content_in_changes=True)
            return v
        except BaseException:
            self._release_claim(v)
            raise

    def _check_constraints(self, batch: DataFrame) -> None:
        """CHECK-constraint gate on the write edge: one conditional-count
        pass (operators/expectations.py physics); raises naming every
        violated constraint before anything hits disk."""
        cons = self.constraints
        if not cons:
            return
        from .operators.expectations import check

        bad = [
            (r["rule"], r["n_violations"])
            for r in check(batch, cons).collect()
            if r["n_violations"] > 0
        ]
        if bad:
            detail = ", ".join(f"{name} ({n} rows)" for name, n in bad)
            raise ValueError(
                f"CHECK constraint violation on {self.name!r}: {detail}"
            )

    def merge(
        self,
        batch: DataFrame,
        merge_schema: bool = False,
        hint_broadcast: bool = True,
    ) -> int:
        """Upsert by primary key with sequence-ordered late/duplicate
        protection — the engine's Delta-MERGE twin (reference MERGE machinery:
        elzyme/joins.py:563-570, 656-754; sequence condition ``u.seq <=
        staged.seq`` at joins.py:704-706).

        Only parts containing staged keys (by the staged rows' values *and*
        by the current rows matching those PKs — partition values may change
        on update) are consolidated; every other part carries forward.

        ``merge_schema`` widens the table with the batch's new columns
        first (Delta mergeSchema analog; old rows read back with nulls);
        strict mode silently drops extra columns and errors on missing
        ones.

        ``hint_broadcast``: the staged side of the matching-parts probe is
        broadcast by default (upsert batches are usually CDC-sized); pass
        False for bulk upserts that would not fit the driver — the probe
        degrades to a shuffled semi-join, same contract as replace_keys.
        """
        v = self._next_version()
        try:
            return self._merge_body(v, batch, merge_schema, hint_broadcast)
        except BaseException:
            self._release_claim(v)
            raise

    def _merge_body(
        self, v: int, batch: DataFrame, merge_schema: bool, hint_broadcast: bool
    ) -> int:
        if merge_schema:
            self._evolve_schema(batch)
            batch = self._align(batch)
        else:
            missing = [c for c in self._base_cols() if c not in batch.columns]
            if missing:
                raise ValueError(
                    f"merge batch is missing column(s) {missing}; pass "
                    "merge_schema=True to null-fill (and evolve new columns)"
                )
        manifest = self._manifest(v - 1)
        staged = (
            self._dedup_batch(self._apply_generated(batch))
            .select(*self._data_cols())
        )
        if manifest:
            # ONE materialization of the staged batch (r9 VERDICT
            # watch-item, same pin as _replace_body's scope): the bounds
            # probe, the matching-parts probe, the diff join and the
            # content write must all read identical rows — persist is
            # best-effort (an evicted partition of a nondeterministic
            # batch re-evaluates differently and the collected value
            # list could then wrongly exclude files holding real keys).
            # Same cost as the persist it replaces: the first action
            # materialized the batch either way.
            staged = staged.localCheckpoint(eager=True)
        else:
            staged = staged.persist()
        self._check_constraints(staged)

        if not manifest:
            # bulk-load fast path: merging into an EMPTY table has no
            # current rows, so every staged row is an insert and the whole
            # match/preimage/survivor machinery is vacuous — skip it and
            # commit single-write (the change rows ARE the content): ONE
            # Spark job instead of 5-6 (the first commit of every pipeline
            # and every ivm_* cycle takes this path)
            self._write_commit(v, self._tag(staged, INSERT, v), op="MERGE",
                               content_in_changes=True)
            staged.unpersist()
            return v

        # locate affected parts: staged rows' own parts + parts of current
        # rows with the same PKs (found via a key probe over the
        # FILE-PRUNED snapshot — at scale this is the same "find matching
        # files" scan Delta MERGE does, with the staged side broadcast and
        # footer stats skipping every dir whose PK range is disjoint from
        # the batch's)
        bounds = (
            self._scope_bounds(
                staged.select(*self.primary_keys), self.primary_keys,
                small=hint_broadcast,
            )
            if self._prunable(manifest)
            else None
        )
        cur_all = self._read_pruned(manifest, bounds)
        S, C = "staged", "cur"
        probe = staged.alias(S)
        if hint_broadcast:
            probe = F.broadcast(probe)
        cur_matching = cur_all.alias(C).join(
            probe, self._pk_cond(C, S), "left_semi"
        ).select(*self._data_cols())
        parts = self._collect_parts(
            staged.select(*self._data_cols())
            .unionByName(cur_matching.select(*self._data_cols()))
        )
        cur = self._read_pruned(manifest, bounds, parts)

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
        new_content = survivors.unionByName(applied.drop("__matched"))

        changes = (
            self._tag(inserts, INSERT, v)
            .unionByName(self._tag(preimages, UPDATE_PRE, v))
            .unionByName(self._tag(postimages, UPDATE_POST, v))
        )
        self._write_commit(
            v, changes, rewritten=new_content, rewritten_parts=parts,
            op="MERGE",
            carry_forward=self._carry_forward(manifest, bounds, parts),
        )
        applied.unpersist()
        _free_checkpoint(staged)  # checkpointed (manifest non-empty branch)
        return v

    def replace_keys(
        self,
        scope_keys: DataFrame,
        key_cols: Sequence[str],
        new_rows: DataFrame,
        hint_broadcast: bool = True,
        op: str = "REPLACE",
        merge_schema: bool = False,
        expected_version: int | None = None,
        applied_marker: tuple[str, Sequence[int]] | None = None,
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

        Scale: ``scope_keys`` is delta-derived and broadcast *when it fits*
        — the IVM governor passes ``hint_broadcast=False`` for
        over-threshold scopes (bulk loads, backlog catch-up) so the key
        probe shuffles instead of OOM-ing the driver; locating affected
        rows is one snapshot scan; the rewrite is bounded to the parts
        holding affected rows.

        ``expected_version``: OCC rebase guard for callers whose
        ``new_rows`` were computed OUTSIDE against a pinned target head
        (the IVM runtime). When another writer published commits in
        ``(expected_version, head]`` meanwhile, this commit proceeds iff
        their change rows' key scopes are DISJOINT from ``scope_keys``
        (the interleaved commits touched different keys, so the
        precomputed rows are still the correct result for this scope);
        an overlap raises ConcurrentWriteError — the caller must
        recompute from the new head. Writers whose semantics are defined
        on the current snapshot (merge/append/delete) need no such guard:
        version-slot claims serialize them and their bodies re-read the
        fresh head (see _next_version).

        ``applied_marker=(stage_key, input_versions)``: exactly-once
        bookkeeping for IVM stages — the input watermark this slice
        consumed is recorded in table meta ATOMICALLY with the version
        bump, so a slice RANGE that re-arrives (a crash between this
        commit and the stage's progress save, or an intentional rebuild
        from a fresh checkpoint) is detectable via ``applied_through``.
        Consumers must treat it as a replay SIGNAL, never as a watermark
        clamp (a clamp silently skips requested rebuilds): the aggregate
        stage routes replayed ranges to its idempotent recompute path
        instead of the additive fast path, whose stored ⊕ delta
        double-counts on replay (found by the r7 kill-point sweep).
        No-op commits record nothing (re-deriving a no-op is idempotent).
        """
        v = self._next_version()
        try:
            if expected_version is not None and v - 1 > int(expected_version):
                key_cols_l = list(key_cols)
                theirs = (
                    self.read_change_range(int(expected_version) + 1, v - 1)
                    .select(*key_cols_l)
                    .dropDuplicates(key_cols_l)
                )
                mine = scope_keys.select(*key_cols_l).dropDuplicates(key_cols_l)
                cond = None
                for k in key_cols_l:
                    c = F.col(f"t.`{k}`").eqNullSafe(F.col(f"m.`{k}`"))
                    cond = c if cond is None else (cond & c)
                overlap = theirs.alias("t").join(mine.alias("m"), cond, "inner")
                if not overlap.isEmpty():
                    raise ConcurrentWriteError(
                        f"replace_keys on {self.name!r} rebased from "
                        f"v{expected_version} to v{v - 1}, but the "
                        "interleaved commits touched keys inside this "
                        "commit's scope — the precomputed rows are stale; "
                        "recompute from the new head and retry"
                    )
            out = self._replace_body(
                v, scope_keys, key_cols, new_rows, hint_broadcast, op,
                merge_schema, applied_marker,
            )
            if out != v:  # no-op: slot unused, free it for waiting writers
                self._release_claim(v)
            return out
        except BaseException:
            self._release_claim(v)
            raise

    def _replace_body(
        self,
        v: int,
        scope_keys: DataFrame,
        key_cols: Sequence[str],
        new_rows: DataFrame,
        hint_broadcast: bool,
        op: str,
        merge_schema: bool,
        applied_marker: tuple[str, Sequence[int]] | None = None,
    ) -> int:
        meta_updates = (
            {"applied_through": {applied_marker[0]: [int(x) for x in applied_marker[1]]}}
            if applied_marker is not None
            else None
        )
        if merge_schema:
            # Delta mergeSchema analog on the IVM write edge: a slice
            # carrying columns the target lacks WIDENS the target first
            # (old rows and old change files read back with nulls via the
            # explicit-schema projection); strict mode (default) silently
            # projects extras away instead.
            self._evolve_schema(new_rows)
        manifest = self._manifest(v - 1)
        if not manifest:
            # first-cycle fast path: an EMPTY target has no scope rows to
            # diff against — every new row is an insert, committed
            # single-write (2 Spark jobs instead of ~5; every IVM
            # pipeline's first commit per target takes this path)
            new_rows = (
                self._apply_generated(new_rows)
                .select(*self._data_cols())
                .persist()
            )
            try:
                if new_rows.isEmpty():
                    return v - 1  # no-op: nothing to commit
                self._write_commit(v, self._tag(new_rows, INSERT, v), op=op,
                                   content_in_changes=True,
                                   meta_updates=meta_updates)
                return v
            finally:
                new_rows.unpersist()
        key_cols = list(key_cols)
        # ONE materialization of the key scope (r9 VERDICT watch-item):
        # the bounds probe below takes two actions, and the semi/anti
        # joins and the diff re-evaluate the scope again — a
        # NONdeterministic scope frame (or a persist eviction of one)
        # could yield a value list missing keys the joins later see,
        # wrongly excluding files that hold them (the NaN bug's failure
        # class through a different door). localCheckpoint pins every
        # consumer to the same rows; it also evaluates the (often
        # join-heavy, Δ-derived) scope plan ONCE instead of 3-5 times
        # per slice. Cost bounded by the key set, which the governor
        # already sized.
        scope = (
            scope_keys.select(*key_cols)
            .dropDuplicates(key_cols)
            .localCheckpoint(eager=True)
        )
        # sub-part COW: the scope's key bounds (one tiny aggregate) prune
        # the snapshot read AND split each affected part's dirs into
        # rewrite vs carry-forward — a churn commit rewrites only the
        # files that can hold scoped keys, not the whole hash bucket.
        # Skipped entirely (zero extra actions) when every part is a
        # single consolidated dir — nothing to carry forward then.
        bounds = (
            self._scope_bounds(scope, key_cols, small=hint_broadcast)
            if self._prunable(manifest)
            else None
        )
        if hint_broadcast:
            scope = F.broadcast(scope)
        cur_all = self._read_pruned(manifest, bounds)

        def scope_cond(a: str, b: str):
            cond = None
            for k in key_cols:
                c = F.col(f"{a}.`{k}`").eqNullSafe(F.col(f"{b}.`{k}`"))
                cond = c if cond is None else (cond & c)
            return cond

        C, K, N, O = "cur", "scope", "new", "old"
        old_scope = cur_all.alias(C).join(
            scope.alias(K), scope_cond(C, K), "left_semi"
        ).select(*self._data_cols()).persist()
        # probe the INCOMING frame's size before persist wraps it: a
        # scan-rooted multi-GB new_rows (externally precomputed bulk
        # replace) must veto the small-scope compaction hint below, or the
        # write serializes through ≤32 tasks; join-heavy IVM slices return
        # None here (unknown = pass — their estimates overshoot wildly)
        new_est = self._est_bytes_if_scan(new_rows)
        new_rows = (
            self._apply_generated(new_rows).select(*self._data_cols()).persist()
        )

        # ONE full-outer diff join classifies inserts / deletes / updates —
        # three separate anti/inner joins would recompute the same
        # scope-sized match three times. Presence is tracked by explicit
        # markers, not PK null-tests: outer-join targets legitimately carry
        # NULL key parts (the reason _pk_cond is null-safe).
        pk_cond = self._pk_cond(N, O)
        diff = (
            new_rows.withColumn("__np", F.lit(True)).alias(N)
            .join(
                old_scope.withColumn("__op", F.lit(True)).alias(O),
                pk_cond,
                "full_outer",
            )
            .persist()
        )
        n_present = F.col(f"{N}.__np").isNotNull()
        o_present = F.col(f"{O}.__op").isNotNull()
        n_cols = [F.col(f"{N}.`{c}`").alias(c) for c in self._data_cols()]
        o_cols = [F.col(f"{O}.`{c}`").alias(c) for c in self._data_cols()]
        data_struct = lambda q: F.struct(*[F.col(f"{q}.`{c}`") for c in self._data_cols()])
        inserts = diff.where(n_present & ~o_present).select(*n_cols)
        deletes = diff.where(o_present & ~n_present).select(*o_cols)
        changed_pairs = diff.where(
            n_present & o_present & ~data_struct(N).eqNullSafe(data_struct(O))
        )
        pre = changed_pairs.select(*o_cols)
        post = changed_pairs.select(*n_cols)

        changes = (
            self._tag(inserts, INSERT, v)
            .unionByName(self._tag(pre, UPDATE_PRE, v))
            .unionByName(self._tag(post, UPDATE_POST, v))
            .unionByName(self._tag(deletes, DELETE, v))
        ).persist()
        try:
            # ONE aggregate over the cached diff answers both protocol
            # questions (r8: this was two actions — a distinct-parts
            # collect plus a no-op probe — each launching its own job
            # cascade): (a) the distinct part ids of old_scope ∪ new_rows
            # — the diff's full outer contains every row of both, and a
            # matched UPDATE pair can span TWO parts when partition_by is
            # a non-key column that changed, so both sides' part ids are
            # collected; (b) whether any row is not an unchanged matched
            # pair (the no-op test). Bounded by 2·n_buckets values —
            # driver-safe.
            pb_cols = self.partition_by or self.primary_keys

            def part_over(q):
                return F.pmod(
                    F.xxhash64(*[F.col(f"{q}.`{c}`") for c in pb_cols]),
                    F.lit(self.n_buckets),
                )

            probe = diff.agg(
                F.collect_set(
                    F.when(n_present, part_over(N))
                ).alias("pn"),
                F.collect_set(
                    F.when(o_present, part_over(O))
                ).alias("po"),
                F.max(
                    F.when(
                        ~(n_present & o_present
                          & data_struct(N).eqNullSafe(data_struct(O))),
                        1,
                    ).otherwise(0)
                ).alias("has_change"),
            ).collect()[0]
            # no-op batches must not commit: an empty commit would produce
            # new change files, re-trigger downstream stages, and loop
            # forever.
            if not probe["has_change"]:
                return v - 1
            parts = sorted(set(probe["pn"]) | set(probe["po"]))
            cur_parts = self._read_pruned(manifest, bounds, parts)
            survivors = cur_parts.alias(C).join(
                scope.alias(K), scope_cond(C, K), "left_anti"
            ).select(*self._data_cols())
            new_content = survivors.unionByName(new_rows)
            # compaction keyed off the caller's small-scope signal, not the
            # auto plan-size gate: the recomputed slice is a join-heavy plan
            # whose Catalyst size estimate overshoots by orders of magnitude
            # and would decline compaction for every IVM churn slice. The
            # scope hint alone is not sufficient either (r8 review
            # finding): a small broadcastable scope whose keys hash into
            # every bucket of a large table rewrites ~all its parts — gate
            # additionally on the affected parts' file bytes (cur_parts is
            # scan-rooted, so the estimate is the exact on-disk sum), or a
            # multi-GB rewrite would serialize through ≤32 tasks.
            rewrite_est = self._est_bytes(cur_parts)
            self._write_commit(
                v, changes, rewritten=new_content,
                rewritten_parts=parts, op=op,
                meta_updates=meta_updates,
                carry_forward=self._carry_forward(manifest, bounds, parts),
                compact=(
                    hint_broadcast
                    and rewrite_est is not None
                    and rewrite_est <= _compact_limit(self.n_buckets)
                    and (new_est is None
                         or new_est <= _compact_limit(self.n_buckets))
                ),
            )
            return v
        finally:
            old_scope.unpersist()
            new_rows.unpersist()
            diff.unpersist()
            changes.unpersist()
            _free_checkpoint(scope)

    def delete_where(self, condition) -> int:
        """Delete rows matching a condition (Column or SQL string, like
        ``DataFrame.filter``), emitting ``delete`` change rows. The
        reference silently drops deletes at the source (elzyme/
        streams.py:132,142); we make delete propagation explicit and let
        downstream consumers opt in."""
        if isinstance(condition, str):
            condition = F.expr(condition)
        v = self._next_version()
        try:
            manifest = self._manifest(v - 1)
            # the doomed scan itself is condition-pruned (r10 VERDICT
            # task 2): a retention-window delete on a split table opens
            # only the stat-intersecting files instead of the full
            # snapshot — sound because _read_cond_pruned keeps every
            # entry that MAY hold a matching row, so `doomed` stays the
            # complete match set the rewrite below is defined on
            cur_all = self._read_cond_pruned(manifest, condition)
            doomed = cur_all.where(condition).persist()
            parts = self._collect_parts(doomed)
            # sub-part COW: every condition-matching row is in ``doomed``,
            # so a dir whose PK stats are disjoint from doomed's PK bounds
            # holds no matching row — all its rows survive; carry it
            # forward instead of rewriting (sound without PK uniqueness:
            # membership in doomed is by condition, bounds cover them all)
            # interval-only bounds (small=False): a bulk delete's doomed
            # set can be table-sized — a collect_set over it would be the
            # executor-memory hazard; deletes are usually range-shaped
            # (retention horizons), which intervals prune well
            bounds = (
                self._scope_bounds(
                    doomed.select(*self.primary_keys), self.primary_keys,
                    small=False,
                )
                if self._prunable(manifest)
                else None
            )
            remaining = self._read_pruned(manifest, bounds, parts).where(
                ~condition | condition.isNull()
            )
            changes = self._tag(doomed, DELETE, v)
            self._write_commit(
                v, changes, rewritten=remaining, rewritten_parts=parts,
                op="DELETE",
                carry_forward=self._carry_forward(manifest, bounds, parts),
            )
            doomed.unpersist()
            return v
        except BaseException:
            self._release_claim(v)
            raise

    def vacuum(self, retain_versions: int = 7) -> dict:
        """Retention cleanup (the VACUUM + CDF-retention analog): drop
        manifests, change dirs, and data dirs that only versions older than
        the retained window ``[v - retain_versions + 1, v]`` reference.

        Contract mirrors Delta's: snapshots and change ranges older than the
        window become unreadable — run it only when every downstream
        consumer's progress watermark is inside the window (the incremental
        runtime re-reads change ranges from its persisted watermark, so
        vacuum to a version ≤ the minimum watermark). Single-writer, like
        every other mutation here.

        At scale this is what keeps the changes/ feed and the copy-on-write
        data dirs from growing without bound: a part rewritten in commit N
        leaves its pre-N dirs unreferenced as soon as N falls out of every
        retained manifest.
        """
        v = self.version()
        keep_from = max(0, v - int(retain_versions) + 1)
        referenced: set[str] = set()
        for mv in range(keep_from, v + 1):
            for entries in self._manifest(mv).values():
                referenced.update(_entry_dir(e) for e in entries)

        removed = {
            "data_dirs": 0,
            "data_files": 0,
            "change_dirs": 0,
            "change_part_dirs": 0,
            "change_files": 0,
            "manifests": 0,
        }

        # Publish the retention floor BEFORE deleting anything (r11 review
        # finding): the floor write is claim-serialized (_update_meta) and
        # can therefore RAISE under writer contention — raising after the
        # change dirs are gone would leave a stale floor, and a consumer
        # with a watermark inside the vacuumed range would silently apply
        # a PARTIAL delta (read_change_range only fails loudly BELOW the
        # floor). Floor-first is crash-safe in the other direction: a
        # crash between the bump and the deletions merely leaves files
        # the truncated feed no longer exposes — the re-run removes them.
        # Monotonic max inside the mutation serializes racing vacuums.
        if keep_from > self.change_floor():
            self._update_meta(
                lambda meta: meta.__setitem__(
                    "change_floor",
                    max(keep_from, int(meta.get("change_floor", 0))),
                )
            )

        def prune_part_dir(rel: str, abs_dir: str) -> tuple[bool, int]:
            """File-granular retention inside one part dir: keep the dir
            whole when referenced as a dir, else keep only referenced
            FILES (manifests may reference per-file entries since r9,
            plus each kept file's .crc sidecar). Returns (dir removed,
            files removed)."""
            if rel in referenced:
                return False, 0
            names = list(os.listdir(abs_dir))
            kept = {
                f for f in names if os.path.join(rel, f) in referenced
            }
            if not kept:
                shutil.rmtree(abs_dir)
                return True, 0
            sidecars = {f".{f}.crc" for f in kept}
            dropped = 0
            for f in names:
                if f in kept or f in sidecars:
                    continue
                fp = os.path.join(abs_dir, f)
                if os.path.isfile(fp):
                    os.remove(fp)
                    if f.endswith(".parquet"):
                        dropped += 1
            return False, dropped

        data_root = os.path.join(self.path, "data")
        for commit_dir in sorted(os.listdir(data_root)):
            commit_abs = os.path.join(data_root, commit_dir)
            if not os.path.isdir(commit_abs):
                continue
            for part_dir in list(os.listdir(commit_abs)):
                if not part_dir.startswith(f"{PART}="):
                    continue
                rel = os.path.join("data", commit_dir, part_dir)
                gone, files = prune_part_dir(
                    rel, os.path.join(commit_abs, part_dir)
                )
                removed["data_dirs"] += int(gone)
                removed["data_files"] += files
            if not any(d.startswith(f"{PART}=") for d in os.listdir(commit_abs)):
                shutil.rmtree(commit_abs)

        changes_root = os.path.join(self.path, "changes")
        for change_dir in sorted(os.listdir(changes_root)):
            if not change_dir.startswith("c"):
                continue
            try:
                cv = int(change_dir[1:])
            except ValueError:
                continue
            if cv >= keep_from:
                continue
            # single-write (insert-only) commits: the change dir doubles as
            # live data — keep the part-dirs a retained manifest still
            # references, drop the rest; the change_floor bump below keeps
            # the FEED truncated to the window even when files survive here
            commit_abs = os.path.join(changes_root, change_dir)
            part_dirs = [
                d for d in os.listdir(commit_abs) if d.startswith(f"{PART}=")
            ]
            kept = 0
            for pd in part_dirs:
                rel = os.path.join("changes", change_dir, pd)
                gone, files = prune_part_dir(rel, os.path.join(commit_abs, pd))
                removed["change_files"] += files
                if gone:
                    # partial prunes of a live single-write dir are real
                    # cleanup work — count them so retention telemetry
                    # reflects what vacuum actually deleted
                    removed["change_part_dirs"] += 1
                else:
                    kept += 1
            if kept == 0:
                shutil.rmtree(commit_abs)
                removed["change_dirs"] += 1

        for mv in range(0, keep_from):
            mp = self._manifest_path(mv)
            if os.path.exists(mp):
                os.remove(mp)
                removed["manifests"] += 1
            for aux in (f"t{mv}.json", f"claim_v{mv}.json"):
                ap = os.path.join(self.path, "manifests", aux)
                if os.path.exists(ap):
                    os.remove(ap)

        return removed

    def max_dirs_per_part(self) -> int:
        """Fragmentation probe: the most COMMIT DIRS referenced by any one
        part in the current manifest (per-file entries of one dir count
        once — the trigger metric stays commit-granular). Append-only
        commits grow this by one per touched part, and (since sub-part
        COW) replace/merge commits add their new consolidated dir while
        stat-disjoint dirs/files carry forward — so churn also fragments,
        bounded by ``maybe_compact``. Fragmentation is the deliberate
        price of delta-proportional write amplification (exactly Delta's
        trade, which is why OPTIMIZE exists there)."""
        m = self._manifest(self.version())
        def ndirs(entries) -> int:
            dirs = set()
            for e in entries:
                d = _entry_dir(e)
                dirs.add(os.path.dirname(d) if d.endswith(".parquet") else d)
            return len(dirs)
        return max((ndirs(es) for es in m.values()), default=0)

    def maybe_compact(self, max_dirs_per_part: int = 64) -> bool:
        """Auto-OPTIMIZE policy: compact when any part's dir list exceeds
        the threshold. Safe mid-pipeline — compaction emits zero change
        rows, so downstream incremental consumers see an empty change
        range and advance their watermarks without recomputing anything.
        At 100 TB this is what keeps an append-heavy ingest table's
        file count (and scan-planning time) bounded."""
        if self.max_dirs_per_part() > max_dirs_per_part:
            self.compact()
            return True
        return False

    def compact(
        self,
        zorder_by: Sequence[str] = (),
        curve: str = "z",
        n_buckets: int | None = None,
    ) -> int:
        """Consolidate every part to a single file-set (the OPTIMIZE analog:
        bounds manifest growth after many appends). Emits no change rows.

        ``zorder_by``: cluster the rewritten files on a Z-order key over
        the given columns (OPTIMIZE ZORDER analog) — rows are sorted by
        the interleaved key within each part's rewrite, so parquet
        row-group min/max stats become tight hyper-rectangles on every
        clustered column and range predicates prune at row-group level
        (the layout.zone-map story applied to the table substrate). The
        key never reaches disk; content and change feed are unaffected,
        so downstream incremental consumers are not disturbed.
        ``curve="hilbert"`` (2 columns only) clusters on the Hilbert key
        instead — unit-step locality, the liquid-clustering-style sort.

        ``n_buckets``: ONLINE RE-BUCKETING (r9) — rewrite the table into a
        new copy-on-write granularity in the same zero-change-row commit,
        un-freezing the creation-time bucket count: a table that grew 100×
        re-tiers to the documented sizing rule (one bucket ≈ a few GB)
        without a copy job or downstream disturbance. The new count rides
        the SAME atomic meta bump as the version (crash-retry reruns under
        the old count until publish; version-pinned reads of older
        manifests list their dirs explicitly, so they never re-hash).
        Delta has no analog (hash-bucketing is the engine's own layout);
        the closest public story is Iceberg's bucket-transform evolution,
        which also rewrites on OPTIMIZE."""
        if n_buckets is not None and int(n_buckets) < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        v = self._next_version()
        try:
            cur = self.snapshot(v - 1)
            cluster_by: tuple[str, ...] = ()
            if zorder_by:
                if curve == "hilbert":
                    from .operators.layout import with_hilbert_key

                    cur = with_hilbert_key(cur, list(zorder_by), out_col="__zkey")
                elif curve == "z":
                    from .operators.layout import with_zorder_key

                    cur = with_zorder_key(cur, list(zorder_by), out_col="__zkey")
                else:
                    raise ValueError(
                        f"curve must be 'z' or 'hilbert', got {curve!r}"
                    )
                cluster_by = ("__zkey",)
            rebucket = n_buckets is not None and int(n_buckets) != self.n_buckets
            all_parts = [int(p) for p in self._manifest(v - 1)]
            empty_changes = self.spark.createDataFrame([], self.change_schema())
            op = "OPTIMIZE"
            if cluster_by:
                op += " ZORDER"
            if rebucket:
                # always visible in history, combined with zorder or not —
                # an operator auditing a layout shift must see the re-tier
                op += " REBUCKET"
            meta_updates: dict = {}
            stats_cols = None
            if rebucket:
                meta_updates["n_buckets"] = int(n_buckets)
                # scoped reads must not part-restrict pinned pre-rebucket
                # manifests with the NEW hash — record where it starts
                meta_updates["n_buckets_since"] = v
            if zorder_by:
                # the z-sorted files carry tight footer ranges on the
                # clustered dimensions — record them as stats columns so
                # THIS commit's entries (and every later one) harvest
                # min/max for them, letting scoped rewrites and scoped
                # reads prune on the zorder columns (r9 VERDICT task 5).
                # The list rides the same atomic meta bump; entries built
                # below get the widened set explicitly since the bump
                # publishes after them.
                merged = list(
                    dict.fromkeys([*self.stats_extra_cols, *zorder_by])
                )
                if tuple(merged) != self.stats_extra_cols:
                    meta_updates["stats_cols_extra"] = merged
                stats_cols = list(dict.fromkeys([*self._stats_cols(), *merged]))
            self._write_commit(
                v,
                empty_changes,
                rewritten=cur,
                rewritten_parts=all_parts,
                cluster_by=cluster_by,
                op=op,
                part_n_buckets=int(n_buckets) if rebucket else None,
                meta_updates=meta_updates or None,
                stats_cols=stats_cols,
            )
            return v
        except BaseException:
            self._release_claim(v)
            raise

    def restore(self, version: int) -> int:
        """Roll the table back to ``version`` as a NEW commit (the Delta
        RESTORE analog) — history is never rewritten; the commit carries
        the minimal *compensating* change feed (inserts for rows the
        rollback resurrects, deletes for rows it removes, update pre/post
        for rows it reverts), so downstream incremental consumers converge
        to the restored state through the normal CDC path instead of
        requiring a reset.

        Implementation: the restored snapshot replayed through
        ``replace_keys`` over the union of both versions' key sets — the
        diff machinery already emits exactly the compensating feed, and a
        restore to the current state is a no-op (no empty commit).

        Scale: one full-scope diff (both snapshots scanned once); the key
        scope is table-sized, so it is never broadcast."""
        cur_v = self.version()
        if not 0 <= version <= cur_v:
            raise ValueError(
                f"cannot restore {self.name!r} to v{version}: "
                f"valid range is [0, {cur_v}]"
            )
        target = self.snapshot(version)
        pks = list(self.primary_keys)
        scope = (
            self.snapshot(cur_v)
            .select(*pks)
            .unionByName(target.select(*pks))
            .dropDuplicates(pks)
        )
        return self.replace_keys(
            scope, pks, target, hint_broadcast=False, op="RESTORE"
        )

    def clone(self, new_path: str, name: str | None = None) -> "ChangeTable":
        """Deep-clone the current snapshot into a fresh table at
        ``new_path`` (the Delta CLONE analog): identical schema, keys,
        generated columns, constraints and bucketing; the clone starts at
        v1 = one insert-only commit of the snapshot, so its change feed is
        self-contained (no shared files with the source — vacuum/compact
        on either side never corrupts the other)."""
        base_fields = self._base_cols()
        schema = T.StructType(
            [f for f in self.schema().fields if f.name in base_fields]
        )
        out = ChangeTable.create(
            self.spark,
            new_path,
            schema,
            self.primary_keys,
            sequence_by=self.sequence_by,
            partition_by=self.partition_by,
            name=name,
            n_buckets=self.n_buckets,
            generated_columns=self.generated_columns,
            constraints=self.constraints,
        )
        snap = self.snapshot()
        if not snap.isEmpty():
            out.append(snap.select(*base_fields))
        return out
