"""CommitBackend — the storage-atomicity contract of the commit protocol.

The ChangeTable commit protocol (changelog.py) needs exactly TWO atomic
primitives from the storage layer; everything else it writes — data/changes
parquet file-sets and the version-addressed manifest/timestamp JSONs — is a
pure idempotent overwrite of a path no other writer can address once version
slots are claim-serialized, so plain writes suffice there.

1. ``put_if_absent(path, payload)`` — the version-slot claim. POSIX/HDFS:
   ``O_CREAT|O_EXCL`` (rename-no-overwrite class). S3: conditional PUT with
   ``If-None-Match: *`` (object-level put-if-absent, GA since 2024); stores
   predating conditional PUT need an external coordination service — the
   same answer Delta-on-S3 ships as its DynamoDB LogStore.
2. ``replace(path, payload)`` — an all-or-nothing overwrite, used for the
   meta publish and claim heartbeats/steals. Readers must never observe
   torn content. POSIX: write-temp + rename. S3: a plain PUT — S3 object
   writes are atomic (an object is either the old or the new body, never a
   prefix), so NO RENAME IS REQUIRED by the protocol.

Plus one consistency requirement on ``read``: **read-after-write within a
writer, and eventual-but-monotonic visibility across writers**. A writer
that claims slot v+1 has, by construction, already observed head v through
its own reads (``_next_version`` polls until the claim succeeds, and
published slots keep their claim files, so a stale head read just makes the
claim fail and the writer re-poll); its publish-time head check therefore
only needs reads that never regress below what this writer already saw.
S3 has been strongly consistent (read-after-write, all clients) since
Dec 2020; HDFS/ABFS/GCS always were. On a hypothetical store that serves
REGRESSIVE reads, the protocol degrades to failing loudly
(ConcurrentWriteError at the publish head check) — never to silent
corruption, because the manifest/meta of the losing commit is simply not
published and its version-addressed artifacts are invisible orphans.

The model suite (tests/test_commit_backend.py) proves both halves against a
fake object store with no rename and lagging cross-client reads.

Data-plane audit (r8) — every filesystem touch of the protocol, and why
each either goes through the backend or is deliberately plain I/O:

======================================  ==========================  =======
call-site                               primitive                   why
======================================  ==========================  =======
meta read / every meta bump             backend.read / replace      the publish point — atomicity IS the contract
claim files (claim/steal/release)       backend.put_if_absent /     OCC version-slot serialization
                                        replace / remove
create() initial meta                   backend.replace             the table's publish (readers gate on meta existing)
manifest v{v}.json / t{v}.json writes   plain write                 version-addressed artifact inside a CLAIMED slot: invisible
(_publish, create's v0/t0)                                          until the meta bump, torn/partial files idempotently
                                                                    overwritten by the retry of the same commit; readers only
                                                                    ever open v ≤ published head
manifest / timestamp reads              plain read                  published artifacts are immutable-once-visible; covered by
(snapshot, describe_history, ...)                                   the contract's monotonic-visibility requirement
_Progress.save / load (IVM watermarks)  plain temp+rename / read    WRITER-LOCAL state with a single owner — never coordinates
                                                                    writers; a lost/stale file is a rebuild request, made safe
                                                                    by the applied_through replay floor (never a double-apply)
vacuum walks (listdir/rmtree/remove)    plain, POSIX dir ops        maintenance of version-addressed artifacts strictly below
                                                                    the retention floor, idempotent under crash/re-run, floor
                                                                    published LAST via the backend; an object-store deployment
                                                                    substitutes LIST + DELETE with the same idempotence argument
parquet data/changes file-sets          Spark Hadoop FS             the data plane — Spark's committers, untouched by this layer
======================================  ==========================  =======

At 100 TB the protocol files are O(100 bytes) each and touched O(1) times
per commit — backend choice is a correctness contract, never a throughput
term; the data plane (parquet file-sets) goes through Spark's Hadoop
filesystem exactly as before.
"""

from __future__ import annotations

import os
import tempfile


class CommitBackend:
    """Default POSIX/HDFS-semantics implementation of the commit-protocol
    atomicity contract (see module docstring). Subclass and hand the
    instance to ``ChangeTable(..., backend=...)`` to run the protocol on a
    store with different primitives (e.g. S3 conditional PUT, an external
    lock service, or the test suite's fake object store)."""

    def put_if_absent(self, path: str, payload: str) -> bool:
        """Atomically create ``path`` WITH ``payload`` iff it does not
        exist. True when this call created it. Must evaluate against the
        store's AUTHORITATIVE state (S3 conditional PUT does; a cached
        read does not) and must be atomic WITH RESPECT TO CONTENT: a
        bare O_EXCL-create-then-write leaves an empty claim if the writer
        dies between the two syscalls, and an empty claim is
        unparseable → unstealable → permanently wedges the slot (r7
        review finding). POSIX spells content-atomic put-if-absent as
        write-temp + hardlink (link(2) fails with EEXIST when the target
        exists; the linked file already carries the full payload).

        Filesystems that DISABLE hardlinks (some FUSE/object-store mounts,
        ``nolink`` NFS configs) raise EPERM/ENOTSUP/EOPNOTSUPP/EACCES from
        link(2); those fall back to O_EXCL create + write + fsync — still
        an authoritative-state put-if-absent, re-accepting the empty-claim
        crash window the hardlink path closes (r8 review finding). That
        window is steal-recoverable: an unparseable claim body ages out
        on the file's ``mtime`` (see :meth:`mtime` and
        changelog._try_claim) instead of wedging the slot."""
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(path) or ".", suffix=".tmp"
        )
        try:
            with os.fdopen(fd, "w") as f:
                f.write(payload)
            try:
                os.link(tmp, path)
                return True
            except FileExistsError:
                return False
            except OSError as e:
                import errno

                if e.errno not in (
                    errno.EPERM, errno.ENOTSUP, errno.EOPNOTSUPP,
                    errno.EACCES, errno.EXDEV, errno.EMLINK,
                ):
                    raise
            # hardlink-free store: O_EXCL is still authoritative; fsync
            # narrows (not closes) the create-vs-content window
            try:
                fd2 = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False
            with os.fdopen(fd2, "w") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
            return True
        finally:
            os.unlink(tmp)

    def replace(self, path: str, payload: str) -> None:
        """All-or-nothing overwrite: readers see the old or the new body,
        never a torn prefix. POSIX spells it write-temp + rename; an
        object store spells it a plain PUT."""
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(path) or ".", suffix=".tmp"
        )
        with os.fdopen(fd, "w") as f:
            f.write(payload)
        os.replace(tmp, path)

    def read(self, path: str) -> str | None:
        """Current body of ``path``, or None if absent."""
        try:
            with open(path) as f:
                return f.read()
        except FileNotFoundError:
            return None

    def remove(self, path: str) -> None:
        """Delete ``path``; absent is not an error (claim releases race
        benignly with sweeps)."""
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def mtime(self, path: str) -> float | None:
        """Last-modified wall-clock of ``path``, or None if absent (or the
        store cannot answer). Object stores map this to the object's
        LastModified. Used as the staleness fallback for claims whose
        BODY is unreadable: the hardlink-free put_if_absent path can
        crash between O_EXCL create and write, leaving an empty claim
        with no parseable heartbeat — without an mtime the slot would
        wedge permanently (the r7 finding re-opened by the r8 fallback;
        _try_claim closes it by aging unparseable claims on mtime)."""
        try:
            return os.path.getmtime(path)
        except OSError:
            return None


#: process-wide default — POSIX semantics (local filesystems, HDFS-class
#: stores). ChangeTable instances constructed without an explicit backend
#: share this.
POSIX = CommitBackend()
