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
        exists; the linked file already carries the full payload)."""
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(path) or ".", suffix=".tmp"
        )
        try:
            with os.fdopen(fd, "w") as f:
                f.write(payload)
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
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


#: process-wide default — POSIX semantics (local filesystems, HDFS-class
#: stores). ChangeTable instances constructed without an explicit backend
#: share this.
POSIX = CommitBackend()
