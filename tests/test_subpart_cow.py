"""Sub-part copy-on-write (r9, VERDICT r8 task 1).

merge/replace_keys/delete_where must rewrite only the dirs whose parquet
footer key stats intersect the write's key scope; stat-disjoint dirs carry
forward in the manifest untouched — write amplification scales with the
delta, not the hash-bucket size. These tests pin the manifest mechanics;
content correctness on the new layout is re-proven by the existing
changelog/model/CDC suites.
"""

import os

import pyspark.sql.functions as F

from streamjoin_spark.changelog import (
    ChangeTable,
    _dir_stats,
    _entry_dir,
    _entry_excluded,
)
from streamjoin_spark.streams import CHANGE_TYPE, DELETE, UPDATE_POST


def _dirs(manifest):
    return {_entry_dir(e) for es in manifest.values() for e in es}


def _mk(spark, tmp_path, n=10_000, n_buckets=4):
    df = spark.range(0, n).selectExpr("id", "concat('n', id) AS name")
    ct = ChangeTable.create(
        spark, str(tmp_path / "t"), df.schema, ["id"], n_buckets=n_buckets
    )
    ct.merge(df)  # v1: ids [0, n)
    ct.append(
        spark.range(n, 2 * n).selectExpr("id", "concat('n', id) AS name")
    )  # v2: ids [n, 2n) — each part now has 2 dirs with disjoint id ranges
    return ct


def test_churn_merge_carries_disjoint_dirs(spark, tmp_path):
    ct = _mk(spark, tmp_path)
    before = _dirs(ct._manifest(2))
    v = ct.merge(
        spark.range(19_000, 19_005).selectExpr("id", "'upd' AS name")
    )
    after = ct._manifest(v)
    # every v1 dir (ids 0..9999, disjoint from the scope) carried forward
    carried = {d for d in _dirs(after) if d in before}
    assert any(d.startswith("changes/c1/") for d in carried)
    v1_dirs = {d for d in before if "/c1/" in d}
    assert v1_dirs <= carried, f"v1 dirs were rewritten: {v1_dirs - carried}"
    # content intact
    snap = {r["id"]: r["name"] for r in ct.snapshot().collect()}
    assert len(snap) == 20_000
    assert snap[19_000] == "upd" and snap[0] == "n0" and snap[9_999] == "n9999"
    feed = ct.read_change_feed(starting_version=v)
    assert feed.where(F.col(CHANGE_TYPE) == UPDATE_POST).count() == 5


def test_scattered_keys_value_pruning(spark, tmp_path):
    """A scope of {5, 19000} spans the whole id interval — global bounds
    alone would un-prune everything; the small-scope value list must still
    skip the middle dirs (ids 10000..18999 in parts not holding either)."""
    ct = _mk(spark, tmp_path)
    before = ct._manifest(2)
    v = ct.merge(
        spark.createDataFrame(
            [(5, "upd"), (19_000, "upd")], "id long, name string"
        )
    )
    after = ct._manifest(v)
    # per affected part, at most the dirs whose range holds 5 or 19000
    # were rewritten; each part has a [0,1e4) dir and a [1e4,2e4) dir, and
    # no part holds both keys in both dirs — so at least one dir per
    # affected part carried forward, and unaffected parts are untouched
    rewritten = _dirs(before) - _dirs(after)
    for d in rewritten:
        stats = None
        for es in before.values():
            for e in es:
                if _entry_dir(e) == d and isinstance(e, dict):
                    stats = e["s"]["id"]
        assert stats is not None
        lo, hi = stats[0], stats[1]
        assert lo <= 5 <= hi or lo <= 19_000 <= hi, (
            f"dir {d} with id range [{lo}, {hi}] holds neither scoped key "
            "but was rewritten"
        )
    snap = {r["id"]: r["name"] for r in ct.snapshot().collect()}
    assert snap[5] == "upd" and snap[19_000] == "upd" and len(snap) == 20_000


def test_replace_keys_carries_disjoint_dirs(spark, tmp_path):
    ct = _mk(spark, tmp_path)
    before = _dirs(ct._manifest(2))
    scope = spark.createDataFrame([(19_123,), (19_456,)], "id long")
    new_rows = spark.createDataFrame(
        [(19_123, "r1"), (19_456, "r2")], "id long, name string"
    )
    v = ct.replace_keys(scope, ["id"], new_rows)
    after = _dirs(ct._manifest(v))
    v1_dirs = {d for d in before if "/c1/" in d}
    assert v1_dirs <= after, "stat-disjoint v1 dirs must carry forward"
    snap = {r["id"]: r["name"] for r in ct.snapshot().collect()}
    assert snap[19_123] == "r1" and snap[19_456] == "r2"
    assert len(snap) == 20_000


def test_replace_keys_null_scope_defeats_pruning_soundly(spark, tmp_path):
    """Outer-join targets carry NULL key parts: a scope containing a null
    must still match rows whose key is null (eqNullSafe), so dirs with
    nulls can never be pruned against a null-carrying scope."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "nullrow")], "id long, name string"
    )
    ct = ChangeTable.create(
        spark, str(tmp_path / "t"), df.schema, ["id"], n_buckets=2
    )
    ct.merge(df)
    scope = spark.createDataFrame([(None,)], "id long")
    new = spark.createDataFrame([(None, "replaced")], "id long, name string")
    v = ct.replace_keys(scope, ["id"], new)
    snap = {r["id"]: r["name"] for r in ct.snapshot().collect()}
    assert snap[None] == "replaced" and snap[1] == "a" and len(snap) == 3
    assert v == 2


def test_delete_where_carries_disjoint_dirs(spark, tmp_path):
    ct = _mk(spark, tmp_path)
    before = _dirs(ct._manifest(2))
    v = ct.delete_where(F.col("id") >= 19_990)
    after = _dirs(ct._manifest(v))
    v1_dirs = {d for d in before if "/c1/" in d}
    assert v1_dirs <= after
    feed = ct.read_change_feed(starting_version=v)
    assert feed.where(F.col(CHANGE_TYPE) == DELETE).count() == 10
    assert ct.snapshot().count() == 19_990


def test_vacuum_keeps_carried_dirs(spark, tmp_path):
    """A dir carried forward across many rewrite commits stays referenced
    by the head manifest — vacuum must never collect it."""
    ct = _mk(spark, tmp_path, n=1_000)
    for i in range(8):
        ct.merge(
            spark.createDataFrame([(1_900 + i, "u")], "id long, name string")
        )
    ct.vacuum(retain_versions=2)
    snap = {r["id"]: r["name"] for r in ct.snapshot().collect()}
    assert len(snap) == 2_000 and snap[0] == "n0" and snap[1_900] == "u"


def test_dir_stats_reads_footers(spark, tmp_path):
    p = str(tmp_path / "scan")
    spark.range(100, 200).selectExpr(
        "id", "concat('k', id) AS k", "CAST(NULL AS double) AS v"
    ).coalesce(1).write.parquet(p)
    s = _dir_stats(p, ["id", "k", "v", "missing"])
    assert s["id"] == [100, 199, False]
    assert s["k"][0] == "k100" and s["k"][2] is False
    assert "v" not in s  # all-null column: no min/max stats
    assert "missing" not in s


def test_entry_excluded_logic():
    e = {"d": "x", "s": {"id": [100, 200, False]}}
    assert _entry_excluded(e, {"id": (300, 400, False)})
    assert not _entry_excluded(e, {"id": (150, 400, False)})
    # value-list: interval overlaps but no value inside
    assert _entry_excluded(e, {"id": (50, 400, False, (50, 300, 400))})
    assert not _entry_excluded(e, {"id": (50, 400, False, (50, 150))})
    # null scope vs no-null dir: excluded when ranges disjoint
    assert _entry_excluded(e, {"id": (None, None, True)})
    # null scope vs dir WITH nulls: never excluded
    e2 = {"d": "x", "s": {"id": [100, 200, True]}}
    assert not _entry_excluded(e2, {"id": (None, None, True)})
    # legacy string entry: never excluded
    assert not _entry_excluded("plain/dir", {"id": (300, 400, False)})
    # incomparable types: never excluded
    assert not _entry_excluded(e, {"id": ("a", "b", False)})


def test_merge_only_table_prunes_at_file_level(spark, tmp_path, monkeypatch):
    """The case dir-level COW cannot help: a merge-only table always has
    ONE consolidated dir per part. Compacted rewrites sort by the stats
    columns and split at SPLIT_ROWS_PER_FILE, the manifest tracks the
    files individually, and a later churn commit rewrites only the files
    whose key range holds the scoped keys — the rest carry forward."""
    from streamjoin_spark import changelog as cl

    monkeypatch.setattr(cl, "SPLIT_ROWS_PER_FILE", 1000)
    df = spark.range(0, 10_000).selectExpr("id", "concat('n', id) AS name")
    ct = ChangeTable.create(
        spark, str(tmp_path / "t"), df.schema, ["id"], n_buckets=2
    )
    ct.merge(df)  # bulk: single-write, sorted + split into ~5 files/part
    m1 = ct._manifest(1)
    per_part_files = {
        p: [e for e in es if isinstance(e, dict)] for p, es in m1.items()
    }
    assert all(len(es) >= 3 for es in per_part_files.values()), {
        p: len(es) for p, es in per_part_files.items()
    }
    # split files carry tight disjoint id ranges within each part
    for es in per_part_files.values():
        ranges = sorted((e["s"]["id"][0], e["s"]["id"][1]) for e in es)
        for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2, ranges

    # churn one key: only the file holding it rewrites in its part
    before = _dirs(m1)
    v = ct.merge(
        spark.createDataFrame([(7_777, "upd")], "id long, name string")
    )
    after = _dirs(ct._manifest(v))
    carried = before & after
    rewritten = before - after
    assert len(rewritten) <= 2, rewritten  # ≤1 file per affected part
    assert len(carried) >= len(before) - 2
    snap = {r["id"]: r["name"] for r in ct.snapshot().collect()}
    assert snap[7_777] == "upd" and snap[0] == "n0" and len(snap) == 10_000

    # vacuum is file-granular: superseded split files inside a dir that
    # still holds carried files are removed individually, carried files
    # survive, and the snapshot is unchanged
    for i in range(3):
        ct.merge(spark.createDataFrame(
            [(7_700 + i, f"u{i}")], "id long, name string"
        ))
    removed = ct.vacuum(retain_versions=1)
    assert removed["change_files"] >= 1 or removed["data_files"] >= 1, removed
    snap2 = {r["id"]: r["name"] for r in ct.snapshot().collect()}
    assert len(snap2) == 10_000 and snap2[7_700] == "u0" and snap2[1] == "n1"


def test_nan_scope_key_never_excludes_files(spark, tmp_path, monkeypatch):
    """r9 review finding (reproduced): a NaN key in the scope's value
    list cannot be ordered by sorted()/bisect and wrongly excluded files
    holding real scoped keys — the stale row survived next to the new
    one (duplicate PK). NaN-carrying scopes must fall back to interval
    pruning, which Spark's NaN-as-max semantics keep sound."""
    from streamjoin_spark import changelog as cl

    monkeypatch.setattr(cl, "SPLIT_ROWS_PER_FILE", 100)
    nan = float("nan")
    # range-based (scan-rooted) so the compaction auto-gate sees real
    # bytes and takes the sorted-split path; id 500 becomes the NaN key
    df = spark.range(501).selectExpr(
        "CASE WHEN id = 500 THEN CAST('NaN' AS DOUBLE) "
        "ELSE CAST(id AS DOUBLE) END AS k",
        "concat('n', id) AS name",
    )
    ct = ChangeTable.create(
        spark, str(tmp_path / "t"), df.schema, ["k"], n_buckets=2
    )
    ct.merge(df)
    assert ct._prunable(ct._manifest(1))  # split files: pruning is live

    scope = spark.createDataFrame([(nan,), (150.0,)], "k double")
    new = spark.createDataFrame(
        [(nan, "nan-upd"), (150.0, "k150-upd")], "k double, name string"
    )
    ct.replace_keys(scope, ["k"], new)
    snap = ct.snapshot().collect()
    assert len(snap) == 501, "duplicate PK rows: stale row not replaced"
    by_name = {r["name"] for r in snap}
    assert "k150-upd" in by_name and "nan-upd" in by_name
    assert "n150" not in by_name and "n500" not in by_name


def test_unsorted_write_entries_capped(spark, tmp_path):
    """Unsorted task-parallel writes get ONE merged-stats dir entry (their
    overlapping per-file ranges barely prune) and _dir_stats refuses to
    walk more footers than the cap — a many-hundred-file bulk commit must
    not pay thousands of serial driver-side metadata reads."""
    p = str(tmp_path / "many")
    spark.range(300).repartition(3).write.parquet(p)  # 3 files
    assert _dir_stats(p, ["id"]) is not None
    assert _dir_stats(p, ["id"], max_files=2) is None  # over cap → no stats

    df = spark.range(1000).selectExpr("id", "concat('n', id) AS name")
    ct = ChangeTable.create(
        spark, str(tmp_path / "t"), df.schema, ["id"], n_buckets=2
    )
    ct.merge(df)
    # an unsorted write's entry emission: merged dir entry, never per-file
    entry0 = _entry_dir(ct._manifest(1)["0"][0])
    part_dir = (
        os.path.dirname(entry0) if entry0.endswith(".parquet") else entry0
    )
    entries = ct._entries_for(part_dir, sorted_write=False)
    assert len(entries) == 1
