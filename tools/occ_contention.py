"""Multi-PROCESS OCC contention measurement (r10, VERDICT r9 task 3).

The changelog's optimistic-concurrency protocol (version-slot claims via
O_EXCL put-if-absent, auto-rebase of snapshot-defined writers, stale-claim
steal) is model-proven with in-process threads
(tests/test_changelog_model.py two-writer interleaves). This tool measures
the REAL cross-process story the model cannot: N separate Spark drivers —
independent JVMs, independent ChangeTable instances, shared only through
the table directory — committing concurrently to one table.

Reported per writer count:
- total commits + wall clock → commits/sec (throughput under contention)
- per-commit claim wait (time from merge() entry to owning a slot,
  measured around _next_version) — p50 / p95 / max
- conflicts: ConcurrentWriteError raises (claim-wait timeouts / stolen
  slots) and how many retries each writer needed
- fairness: min/max commits per writer (starvation check)
- end-state integrity: version == total commits, snapshot row count and
  per-key values consistent with some serial order (every key's final
  name is one of the writers' stamps, and no duplicate PKs)

Usage:
    python tools/occ_contention.py [out.json] [--writers 1,2,4]
        [--commits 12] [--rows 200]

Each worker process builds its own tiny local Spark session (local[4],
UI off) and performs K merge commits of a disjoint-key batch plus a
shared-key batch (forcing genuine same-part contention). Runtime is
dominated by session startup (~15-20 s per process) and commit latency —
minutes, not hours; data stays KBs on purpose (the protocol under test is
metadata-path contention, not data throughput).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import tempfile
import time


def _worker(args) -> dict:
    (widx, path, n_commits, n_rows) = args
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from streamjoin_spark.changelog import ChangeTable, ConcurrentWriteError
    from streamjoin_spark.session import get_spark

    spark = get_spark(
        f"occ-writer-{widx}", cpus=4, shuffle_partitions=4,
        extra_conf={
            "spark.local.dir": tempfile.mkdtemp(prefix=f"occ_sl_{widx}_"),
        },
    )
    ct = ChangeTable(spark, path)

    # instrument claim wait: time spent inside _next_version (slot poll)
    waits: list[float] = []
    orig_next = ct._next_version

    def timed_next():
        t0 = time.monotonic()
        try:
            return orig_next()
        finally:
            waits.append(time.monotonic() - t0)

    ct._next_version = timed_next

    committed, conflicts, retries = 0, 0, 0
    t_start = time.monotonic()
    for i in range(n_commits):
        # disjoint keys per writer + a shared key band (same parts, same
        # files): contention is real, content stays serializable (merge
        # rebases automatically — bodies read the fresh head post-claim)
        own_lo = 1_000_000 * (widx + 1)
        batch = spark.range(own_lo + i * n_rows, own_lo + (i + 1) * n_rows)
        shared = spark.range(0, 64)
        df = batch.union(shared).selectExpr(
            "id", f"concat('w{widx}c{i}') AS name"
        )
        for attempt in range(6):
            try:
                ct.merge(df)
                committed += 1
                break
            except ConcurrentWriteError:
                conflicts += 1
                retries += 1
                time.sleep(0.05 * (attempt + 1))
        else:
            break  # persistent conflict: report, don't hang the sweep
    wall = time.monotonic() - t_start
    spark.stop()
    waits.sort()

    def pct(p):
        return waits[min(len(waits) - 1, int(p * len(waits)))] if waits else 0.0

    return {
        "writer": widx,
        "committed": committed,
        "conflicts": conflicts,
        "retries": retries,
        "wall_s": round(wall, 3),
        "claim_wait_p50_s": round(pct(0.50), 4),
        "claim_wait_p95_s": round(pct(0.95), 4),
        "claim_wait_max_s": round(max(waits), 4) if waits else 0.0,
        "claims": len(waits),
    }


def run_sweep(writer_counts, n_commits, n_rows) -> dict:
    from streamjoin_spark.changelog import ChangeTable
    from streamjoin_spark.session import get_spark

    results = {}
    for n in writer_counts:
        base = tempfile.mkdtemp(prefix=f"occ_{n}w_")
        path = os.path.join(base, "t")
        boot = get_spark("occ-boot", cpus=4, shuffle_partitions=4)
        schema = boot.range(1).selectExpr(
            "id", "'x' AS name"
        ).schema
        ChangeTable.create(boot, path, schema, ["id"], n_buckets=4)

        t0 = time.monotonic()
        ctx = mp.get_context("spawn")  # fresh interpreters: real processes,
        # no inherited JVM/session state
        with ctx.Pool(n) as pool:
            workers = pool.map(
                _worker,
                [(w, path, n_commits, n_rows) for w in range(n)],
            )
        wall = time.monotonic() - t0

        ct = ChangeTable(boot, path)
        total = sum(w["committed"] for w in workers)
        snap = ct.snapshot()
        ids = [r["id"] for r in snap.select("id").collect()]
        shared_names = {
            r["name"]
            for r in snap.where("id < 64").select("name").collect()
        }
        stamps = {
            f"w{w['writer']}c{c}"
            for w in workers
            for c in range(n_commits)
        }
        per = [w["committed"] for w in workers]
        results[str(n)] = {
            "writers": workers,
            "wall_s": round(wall, 2),
            "total_commits": total,
            "commits_per_sec": round(total / wall, 3) if wall else None,
            "version_matches_commits": ct.version() == total,
            "no_duplicate_pks": len(ids) == len(set(ids)),
            "shared_keys_single_stamp": (
                len(shared_names) == 1 and shared_names <= stamps
            ),
            "fairness_min_max": [min(per), max(per)],
            "claim_wait_max_s": max(w["claim_wait_max_s"] for w in workers),
        }
        print(json.dumps({n: results[str(n)]}, indent=None), flush=True)
    return results


def main() -> None:
    out_path = None
    writer_counts = [1, 2, 4]
    n_commits, n_rows = 12, 200
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--writers":
            writer_counts = [int(x) for x in args[i + 1].split(",")]
            i += 2
        elif a == "--commits":
            n_commits = int(args[i + 1])
            i += 2
        elif a == "--rows":
            n_rows = int(args[i + 1])
            i += 2
        else:
            out_path = a
            i += 1
    res = {
        "n_commits_per_writer": n_commits,
        "rows_per_commit": n_rows,
        "sweep": run_sweep(writer_counts, n_commits, n_rows),
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(res, f, indent=2)
    print(json.dumps({"done": True, "out": out_path}))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
