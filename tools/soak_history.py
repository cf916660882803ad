"""Long-history soak of the ChangeTable substrate (VERDICT r8 task 3).

The 10k-commit claim: ``read_change_range`` is O(range), ``snapshot`` is
O(parts·dirs-per-part), commit latency is O(batch + affected files) — all
independent of TABLE AGE. This script proves (or falsifies) it by driving
one table through N small churn commits and sampling, at checkpoints, the
operations whose cost could silently pick up an O(history) term:

- ``commit_s``      — median merge latency around the checkpoint
- ``snapshot_s``    — full snapshot read (collect-count)
- ``range_s``       — read_change_range over the last 10 commits
- ``feed_tail_s``   — read_change_feed filtered to the last 10 commits
  (the O(total-commits-ever) listing path, kept as the CONTRAST curve —
  it is *expected* to grow; IVM consumers use read_change_range)
- ``history_s``     — describe_history (O(versions) by design, contrast)
- ``manifest_kb``   — head manifest size (carry-forward creep detector)
- ``meta_kb``       — meta file size (applied_through / floor creep)
- ``listdir_manifests`` — files under manifests/ (claim/ts-file creep)
- ``vacuum_s``      — vacuum latency at the checkpoint (amortized op)

Usage::

    python tools/soak_history.py [N_COMMITS] [--vacuum-every K] [--out f.json]

Defaults: 1000 commits, checkpoints at 10/30/100/300/1000(/3000/10000),
vacuum only at checkpoints (so the walk cost is measured, not hidden).
Prints one JSON line: {"n_commits", "checkpoints": [{...per metric...}]}.
A flat commit_s/snapshot_s/range_s curve across decades = claim holds.

rebuild() cost (VERDICT r8 task 6) is measured separately by
``--rebuild``: builds a small maintained view over the soaked table at
each checkpoint and times ``rebuild()`` — O(history + source snapshot)
BY DESIGN (the repair path); the recorded curve documents the envelope
so operators know the cost before reaching for it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_of(fn, reps: int = 1) -> float:
    t0 = time.time()
    for _ in range(reps):
        fn()
    return (time.time() - t0) / reps


def soak(spark, n_commits: int, vacuum_every: int | None, tmp: str,
         rebuild: bool = False) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from streamjoin_spark.changelog import ChangeTable

    path = os.path.join(tmp, "soak")
    df0 = spark.createDataFrame(
        [], "id long, val string, seq long"
    )
    ct = ChangeTable.create(spark, path, df0.schema, ["id"],
                            sequence_by=["seq"], n_buckets=8)
    # seed: 10k rows so churn commits rewrite against real content
    ct.merge(spark.range(10_000).selectExpr(
        "id", "concat('v', id) AS val", "CAST(0 AS LONG) AS seq"))

    checkpoints = [c for c in (10, 30, 100, 300, 1000, 3000, 10_000)
                   if c <= n_commits]
    out = []
    commit_times = []
    for i in range(1, n_commits + 1):
        # small churn: update 2 keys + insert 1 (keys cycle through the
        # id space so sub-part stats see realistic scatter)
        k1, k2 = (i * 37) % 10_000, (i * 101) % 10_000
        batch = spark.createDataFrame(
            [(k1, f"u{i}", i), (k2, f"w{i}", i), (10_000 + i, f"n{i}", i)],
            "id long, val string, seq long",
        )
        t0 = time.time()
        ct.merge(batch)
        commit_times.append(time.time() - t0)
        if i in checkpoints:
            v = ct.version()
            rec = {
                "commits": i,
                "version": v,
                "commit_s_median": sorted(commit_times[-9:])[
                    len(commit_times[-9:]) // 2
                ],
                "snapshot_s": _time_of(lambda: ct.snapshot().count()),
                "range_s": _time_of(
                    lambda: ct.read_change_range(max(1, v - 9), v).count()
                ),
                "feed_tail_s": _time_of(
                    lambda: ct.read_change_feed(max(1, v - 9)).count()
                ),
                "history_s": _time_of(lambda: ct.describe_history().count()),
                "manifest_kb": round(
                    os.path.getsize(ct._manifest_path(v)) / 1024, 2
                ),
                "meta_kb": round(os.path.getsize(ct._meta_path) / 1024, 2),
                "listdir_manifests": len(
                    os.listdir(os.path.join(path, "manifests"))
                ),
                "max_dirs_per_part": ct.max_dirs_per_part(),
                "rows": ct.snapshot().count(),
            }
            if vacuum_every:
                rec["vacuum_s"] = _time_of(
                    lambda: ct.vacuum(retain_versions=vacuum_every)
                )
                rec["listdir_manifests_post_vacuum"] = len(
                    os.listdir(os.path.join(path, "manifests"))
                )
            if rebuild:
                rec["rebuild_s"] = _rebuild_probe(spark, ct, tmp, i)
            out.append(rec)
            print(json.dumps(rec), file=sys.stderr, flush=True)
    return {"n_commits": n_commits, "vacuum_every": vacuum_every,
            "checkpoints": out}


def _rebuild_probe(spark, src_ct, tmp: str, tag: int) -> float:
    """Time a full rebuild() of a maintained view over the soaked table —
    the O(history + source snapshot) repair path, measured so its cost
    envelope is documented rather than guessed."""
    from streamjoin_spark.streams import Stream

    w = (
        Stream.fromChangeTable(src_ct, f"soak{tag}")
        .primaryKeys("id")
        .to(lambda df: df.where("id % 2 = 0"))
        .writeToPath(os.path.join(tmp, f"rebuilt{tag}"))
    )
    w.run()
    t0 = time.time()
    w.rebuild()
    return time.time() - t0


def main() -> None:
    import argparse
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("n_commits", nargs="?", type=int, default=1000)
    ap.add_argument("--vacuum-every", type=int, default=None,
                    help="retain_versions for checkpoint vacuums")
    ap.add_argument("--rebuild", action="store_true",
                    help="also time rebuild() of a view at checkpoints")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from streamjoin_spark.session import get_spark

    spark = get_spark("soak-history", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "8")
    ), shuffle_partitions=8)
    with tempfile.TemporaryDirectory(prefix="sj_soak_") as tmp:
        res = soak(spark, args.n_commits, args.vacuum_every, tmp,
                   rebuild=args.rebuild)
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
