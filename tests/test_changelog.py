"""ChangeTable substrate: commits, snapshots, change feed, merge semantics."""

import pyspark.sql.functions as F
import pytest

from streamjoin_spark.changelog import ChangeTable
from streamjoin_spark.streams import CHANGE_TYPE, COMMIT_VERSION, DELETE, INSERT, UPDATE_POST, UPDATE_PRE


@pytest.fixture()
def ct(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0, 1), (2, "b", 20.0, 1)],
        "id long, name string, amount double, seq int",
    )
    table = ChangeTable.create(
        spark, str(tmp_path / "t"), df.schema, ["id"], sequence_by=["seq"]
    )
    table.merge(df)
    return table


def test_create_and_version(ct):
    assert ct.version() == 1
    assert ct.primary_keys == ("id",)


def test_first_merge_all_inserts(ct):
    feed = ct.read_change_feed()
    assert feed.where(F.col(CHANGE_TYPE) == INSERT).count() == 2
    assert feed.count() == 2


def test_merge_update_and_insert(ct, spark):
    batch = spark.createDataFrame(
        [(2, "b2", 25.0, 2), (3, "c", 30.0, 1)],
        "id long, name string, amount double, seq int",
    )
    v = ct.merge(batch)
    assert v == 2
    snap = {r["id"]: r for r in ct.snapshot().collect()}
    assert snap[2]["name"] == "b2" and snap[3]["name"] == "c" and len(snap) == 3
    feed = ct.read_change_feed(starting_version=2)
    by_type = {r[0]: r[1] for r in feed.groupBy(CHANGE_TYPE).count().collect()}
    assert by_type == {INSERT: 1, UPDATE_PRE: 1, UPDATE_POST: 1}


def test_merge_stale_row_ignored(ct, spark):
    stale = spark.createDataFrame(
        [(1, "a_old", 5.0, 0)], "id long, name string, amount double, seq int"
    )
    ct.merge(stale)
    snap = {r["id"]: r for r in ct.snapshot().collect()}
    assert snap[1]["name"] == "a"  # seq 0 < existing seq 1 → not applied


def test_merge_batch_dedup_latest_wins(ct, spark):
    batch = spark.createDataFrame(
        [(5, "x1", 1.0, 1), (5, "x2", 2.0, 3), (5, "x0", 0.0, 2)],
        "id long, name string, amount double, seq int",
    )
    ct.merge(batch)
    snap = {r["id"]: r for r in ct.snapshot().collect()}
    assert snap[5]["name"] == "x2"


def test_snapshot_version_pinning(ct, spark):
    v1 = ct.version()
    ct.merge(
        spark.createDataFrame(
            [(9, "z", 0.0, 1)], "id long, name string, amount double, seq int"
        )
    )
    assert ct.snapshot(v1).count() == 2
    assert ct.snapshot().count() == 3


def test_delete_where(ct):
    ct.delete_where(F.col("id") == 1)
    assert ct.snapshot().count() == 1
    feed = ct.read_change_feed(starting_version=ct.version())
    rows = feed.collect()
    assert len(rows) == 1 and rows[0][CHANGE_TYPE] == DELETE


def test_append_fast_path(spark, tmp_path):
    df = spark.createDataFrame([(1, 1.0)], "event_id long, value double")
    t = ChangeTable.create(spark, str(tmp_path / "e"), df.schema, ["event_id"])
    t.append(df)
    t.append(spark.createDataFrame([(2, 2.0)], "event_id long, value double"))
    assert t.snapshot().count() == 2
    assert t.read_change_feed().where(F.col(CHANGE_TYPE) == INSERT).count() == 2


def test_change_stream_microbatches(ct, spark, tmp_path):
    """The changes/ dir drives a real Structured Streaming query."""
    out = []
    q = (
        ct.read_change_stream()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cdc_smoke")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) FROM cdc_smoke").collect()[0][0]
    assert got == ct.read_change_feed(0).count()


def test_crashed_commit_is_invisible_and_retry_safe(ct, spark):
    """Crash between change-file write and meta bump: the orphaned change
    rows (stamped v) must stay invisible to readers, and the retried commit
    (same v — progress saves only on the bump) must overwrite them in place,
    never append a second copy."""
    batch = spark.createDataFrame(
        [(2, "b2", 25.0, 2), (3, "c", 30.0, 1)],
        "id long, name string, amount double, seq int",
    )

    real_write_meta = ChangeTable._write_meta

    def crash(self, meta):
        raise RuntimeError("simulated crash before meta bump")

    ChangeTable._write_meta = crash
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            ct.merge(batch)
    finally:
        ChangeTable._write_meta = real_write_meta

    # data + change files for v2 exist on disk, but the table still reads v1
    assert ct.version() == 1
    assert ct.read_change_feed().where(F.col(COMMIT_VERSION) > 1).count() == 0
    assert ct.snapshot().count() == 2

    # retry commits the same version; the feed has exactly one copy of each
    v = ct.merge(batch)
    assert v == 2
    feed = ct.read_change_feed(2)
    assert feed.where(F.col(CHANGE_TYPE) == INSERT).count() == 1      # id 3
    assert feed.where(F.col(CHANGE_TYPE) == UPDATE_POST).count() == 1  # id 2
    assert ct.snapshot().count() == 3


def test_vacuum_retention(ct, spark):
    """vacuum() drops manifests/change-dirs/data-dirs only older versions
    reference: current + retained snapshots stay intact and readable, the
    change feed truncates to the window, and the table keeps committing."""
    for i in range(3):
        ct.merge(spark.createDataFrame(
            [(10 + i, f"x{i}", 1.0 * i, 1)],
            "id long, name string, amount double, seq int",
        ))
    assert ct.version() == 4
    snap_before = sorted(tuple(r) for r in ct.snapshot().collect())

    removed = ct.vacuum(retain_versions=2)   # keep v3..v4
    assert removed["change_dirs"] >= 1
    assert removed["manifests"] >= 1

    assert sorted(tuple(r) for r in ct.snapshot().collect()) == snap_before
    assert ct.snapshot(3).count() == 4       # inside the window: readable
    with pytest.raises(FileNotFoundError):
        ct.snapshot(1)                       # outside: gone
    min_v = ct.read_change_feed().agg(F.min(COMMIT_VERSION)).collect()[0][0]
    assert min_v >= 3

    v = ct.merge(spark.createDataFrame(
        [(99, "post-vacuum", 9.9, 1)],
        "id long, name string, amount double, seq int",
    ))
    assert v == 5 and ct.snapshot().count() == 6


def test_compact_consolidates_without_changes(ct, spark):
    """compact() consolidates every part to one file-set (OPTIMIZE analog):
    snapshot identical, no change rows emitted, manifest entries collapse."""
    ct.merge(spark.createDataFrame(
        [(3, "c", 30.0, 1), (4, "d", 40.0, 1)],
        "id long, name string, amount double, seq int",
    ))
    before = sorted(tuple(r) for r in ct.snapshot().collect())
    feed_before = ct.read_change_feed().count()
    v = ct.compact()
    assert sorted(tuple(r) for r in ct.snapshot().collect()) == before
    assert ct.read_change_feed().count() == feed_before   # no change rows
    manifest = ct._manifest(v)
    assert all(len(dirs) == 1 for dirs in manifest.values())


def test_merge_schema_evolution(ct, spark):
    """mergeSchema analog: new columns widen the table (old rows read back
    with nulls, change feed included); later batches missing the column
    null-fill; type changes are rejected."""
    wide = spark.createDataFrame(
        [(3, "c", 30.0, 1, True)],
        "id long, name string, amount double, seq int, vip boolean",
    )
    ct.merge(wide, merge_schema=True)
    snap = {r.id: r for r in ct.snapshot().collect()}
    assert snap[3]["vip"] is True
    assert snap[1]["vip"] is None          # pre-evolution row null-fills
    assert "vip" in ct.read_change_feed().columns

    # a batch without the new column still merges (null-filled)
    ct.merge(spark.createDataFrame(
        [(4, "d", 4.0, 1)], "id long, name string, amount double, seq int"
    ), merge_schema=True)
    assert ct.snapshot().where("id = 4").collect()[0]["vip"] is None

    # strict mode drops unknown columns instead of evolving, and errors
    # clearly on missing ones
    ct.merge(spark.createDataFrame(
        [(5, "e", 5.0, 1, True, "x")],
        "id long, name string, amount double, seq int, vip boolean, extra string",
    ))
    assert "extra" not in ct.snapshot().columns
    with pytest.raises(ValueError, match="missing column"):
        ct.merge(spark.createDataFrame(
            [(7, "g", 7.0, 1)], "id long, name string, amount double, seq int"
        ))

    with pytest.raises(ValueError, match="type change"):
        ct.merge(spark.createDataFrame(
            [(6, 6, 6.0, 1)], "id long, name long, amount double, seq int"
        ), merge_schema=True)


def test_generated_columns_computed_and_pruned(spark, tmp_path):
    """GENERATED ALWAYS AS analog: the column is computed on every write
    path (append, merge, update), writers never supply it, and partitioning
    by it aligns copy-on-write buckets with the derived value — the
    reference's derive-then-prune pattern (elzyme/joins.py:642-654,
    676-682)."""
    base = spark.createDataFrame(
        [(1, 5.0), (2, 25.0)], "id long, amount double"
    )
    ct = ChangeTable.create(
        spark, str(tmp_path / "gen"), base.schema, ["id"],
        generated_columns={"amt_band": "CAST(floor(amount / 10) AS INT)"},
        partition_by=("amt_band",),
    )
    assert "amt_band" in ct._data_cols()
    ct.merge(base)
    got = {r.id: r.amt_band for r in ct.snapshot().collect()}
    assert got == {1: 0, 2: 2}

    # update recomputes the generated value; the feed carries it too
    ct.merge(spark.createDataFrame([(1, 17.0)], "id long, amount double"))
    assert {r.id: r.amt_band for r in ct.snapshot().collect()} == {1: 1, 2: 2}
    assert "amt_band" in ct.read_change_feed().columns

    # bucket pruning: an amount in band 2 must not rewrite band 1's bucket
    m1 = dict(ct._manifest(ct.version()))
    ct.merge(spark.createDataFrame([(3, 29.0)], "id long, amount double"))
    m2 = dict(ct._manifest(ct.version()))
    changed = {p_ for p_ in set(m1) | set(m2) if m1.get(p_) != m2.get(p_)}
    buckets = {
        r["b"]: r["p"]
        for r in spark.createDataFrame([(1,), (2,)], "b int")
        .select("b", F.pmod(F.xxhash64("b"), F.lit(ct.n_buckets)).alias("p"))
        .collect()
    }
    assert str(buckets[2]) in changed
    if buckets[1] != buckets[2]:
        assert str(buckets[1]) not in changed


def test_history_scd2_intervals(ct, spark):
    """history() rebuilds SCD2 validity intervals from the feed: updates
    close the prior interval, deletes close without emitting, re-inserts
    open fresh intervals; exactly one current row per live key."""
    schema = "id long, name string, amount double, seq int"
    ct.merge(spark.createDataFrame([(1, "a2", 11.0, 2)], schema))   # v2: update 1
    ct.delete_where(F.col("id") == 2)                               # v3: delete 2
    ct.merge(spark.createDataFrame([(2, "b*", 99.0, 3)], schema))   # v4: re-insert 2
    hist = ct.history().collect()
    ivals = {(r["id"], r["valid_from"]): (r["valid_to"], r["is_current"], r["name"])
             for r in hist}
    assert ivals == {
        (1, 1): (2, False, "a"),
        (1, 2): (None, True, "a2"),
        (2, 1): (3, False, "b"),       # closed by the delete, no delete row
        (2, 4): (None, True, "b*"),    # re-insert opens a fresh interval
    }
    current = [r for r in hist if r["is_current"]]
    assert sorted(r["id"] for r in current) == [1, 2]


def test_compact_zorder_clusters_files(spark, tmp_path):
    """OPTIMIZE ZORDER analog: compact(zorder_by=...) rewrites every part
    with rows sorted by the interleaved key — verified by recomputing the
    interleave per physical file with pyarrow — while content, schema and
    the change feed stay untouched (zero change rows emitted)."""
    import glob as globlib

    import pyarrow.parquet as pq

    path = str(tmp_path / "zt")
    rows = [(i, (i * 37) % 100, (i * 91) % 100) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    ct = ChangeTable.create(spark, path, df.schema, ["id"])
    ct.append(df)
    before = sorted(map(tuple, ct.snapshot().collect()))
    v_before = ct.version()

    v = ct.compact(zorder_by=["x", "y"])
    assert v == v_before + 1
    assert sorted(map(tuple, ct.snapshot().collect())) == before
    assert "__zkey" not in ct.snapshot().columns
    # OPTIMIZE emits no change rows
    assert ct.read_change_feed(starting_version=v).count() == 0

    # physical clustering: within every rewritten file, the recomputed
    # z-interleave must be non-decreasing (lo=0, hi=99 -> exact doubles)
    def zval(x, y, lo=0.0, hi=99.0, bits=16):
        top = (1 << bits) - 1
        bx = min(int((x - lo) / (hi - lo) * (top + 1)), top)
        by = min(int((y - lo) / (hi - lo) * (top + 1)), top)
        z = 0
        for i in range(bits):
            z |= ((bx >> i) & 1) << (i * 2 + 0)
            z |= ((by >> i) & 1) << (i * 2 + 1)
        return z

    files = globlib.glob(f"{path}/data/c{v}/*/*.parquet")
    assert files
    checked = 0
    for fp in files:
        t = pq.read_table(fp, columns=["x", "y"])
        zs = [zval(x, y) for x, y in zip(t["x"].to_pylist(), t["y"].to_pylist())]
        if len(zs) > 1:
            checked += 1
            assert zs == sorted(zs), fp
    assert checked > 0


def test_check_constraints_block_bad_writes(spark, tmp_path):
    """Delta CHECK-constraint analog: violating append/merge batches raise
    BEFORE anything is written; clean batches flow; the constraint set
    persists in table metadata (a reopened handle still enforces)."""
    df = spark.createDataFrame([(1, 10.0)], "id long, amount double")
    ct = ChangeTable.create(
        spark, str(tmp_path / "ck"), df.schema, ["id"],
        constraints={"amount_positive": "amount > 0"},
    )
    ct.append(df)
    v = ct.version()
    bad = spark.createDataFrame([(2, -1.0)], "id long, amount double")
    with pytest.raises(ValueError, match="amount_positive"):
        ct.append(bad)
    with pytest.raises(ValueError, match="amount_positive"):
        ct.merge(bad)
    assert ct.version() == v            # nothing committed
    reopened = ChangeTable(spark, str(tmp_path / "ck"))
    with pytest.raises(ValueError, match="amount_positive"):
        reopened.merge(bad)
    reopened.merge(spark.createDataFrame([(2, 5.0)], "id long, amount double"))
    assert reopened.snapshot().count() == 2


def test_restore_emits_compensating_feed(spark, tmp_path):
    """RESTORE rolls back as a new commit whose change feed compensates —
    downstream incremental consumers converge to the restored state."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, val string"
    )
    ct = ChangeTable.create(spark, str(tmp_path / "rt"), df.schema, ["id"])
    ct.merge(df)                                     # v1
    v1 = ct.version()
    ct.merge(spark.createDataFrame([(2, "b2"), (3, "c")], "id long, val string"))
    ct.delete_where(F.col("id") == 1)                # v3
    v_restore = ct.restore(v1)
    assert v_restore == ct.version()
    assert sorted(map(tuple, ct.snapshot().collect())) == [(1, "a"), (2, "b")]
    # compensating feed of the restore commit: resurrect 1, revert 2, drop 3
    feed = ct.read_change_feed(starting_version=v_restore)
    kinds = {(r["id"], r["_change_type"]) for r in feed.collect()}
    assert (1, INSERT) in kinds
    assert (3, DELETE) in kinds
    assert (2, UPDATE_PRE) in kinds and (2, UPDATE_POST) in kinds
    # restoring to the current state is a no-op (no empty commit)
    assert ct.restore(ct.version()) == ct.version()


def test_clone_is_independent(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string")
    ct = ChangeTable.create(
        spark, str(tmp_path / "src"), df.schema, ["id"],
        constraints={"id_pos": "id > 0"},
    )
    ct.merge(df)
    cl = ct.clone(str(tmp_path / "dst"), name="copy")
    assert sorted(map(tuple, cl.snapshot().collect())) == sorted(
        map(tuple, ct.snapshot().collect())
    )
    assert cl.version() == 1 and cl.constraints == {"id_pos": "id > 0"}
    # divergence after the clone point stays local to each side
    ct.delete_where(F.col("id") == 1)
    cl.merge(spark.createDataFrame([(3, "c")], "id long, val string"))
    assert [r["id"] for r in ct.snapshot().orderBy("id").collect()] == [2]
    assert [r["id"] for r in cl.snapshot().orderBy("id").collect()] == [1, 2, 3]


def test_compact_hilbert_curve_variant(spark, tmp_path):
    """curve='hilbert' clusters the rewrite on the Hilbert key; content
    and feed invariants match the Z variant."""
    path = str(tmp_path / "ht")
    rows = [(i, (i * 37) % 100, (i * 91) % 100) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    ct = ChangeTable.create(spark, path, df.schema, ["id"])
    ct.append(df)
    before = sorted(map(tuple, ct.snapshot().collect()))
    v = ct.compact(zorder_by=["x", "y"], curve="hilbert")
    assert sorted(map(tuple, ct.snapshot().collect())) == before
    assert ct.read_change_feed(starting_version=v).count() == 0
    with pytest.raises(ValueError, match="curve"):
        ct.compact(zorder_by=["x", "y"], curve="peano")


def test_snapshot_as_of_timestamp(spark, tmp_path):
    """TIMESTAMP AS OF: every commit records wall-clock; reads resolve to
    the latest commit at-or-before the requested instant; pre-creation
    instants raise; vacuum-era tables without stamps return None."""
    import time as _time

    df = spark.createDataFrame([(1, "a")], "id long, val string")
    before_create = _time.time() - 0.001
    ct = ChangeTable.create(spark, str(tmp_path / "ts"), df.schema, ["id"])
    ct.merge(df)                                        # v1
    t_after_v1 = _time.time()
    _time.sleep(0.05)
    ct.merge(spark.createDataFrame([(2, "b")], "id long, val string"))  # v2
    assert ct.commit_timestamp(1) is not None
    assert sorted(
        r["id"] for r in ct.snapshot_as_of(t_after_v1).collect()
    ) == [1]
    assert sorted(
        r["id"] for r in ct.snapshot_as_of(_time.time()).collect()
    ) == [1, 2]
    with pytest.raises(ValueError, match="at or before"):
        ct.snapshot_as_of(before_create - 10.0)


def test_restore_and_clone_with_generated_columns(spark, tmp_path):
    """RESTORE re-derives generated columns through replace_keys and CLONE
    re-creates them as table metadata (writers still never supply them)."""
    base = spark.createDataFrame([(1, 10.0)], "id long, amount double")
    ct = ChangeTable.create(
        spark, str(tmp_path / "g"), base.schema, ["id"],
        generated_columns={"bucket": "CAST(amount / 10 AS INT)"},
    )
    ct.merge(base)                                         # v1
    v1 = ct.version()
    ct.merge(spark.createDataFrame([(1, 25.0)], "id long, amount double"))
    assert {r["bucket"] for r in ct.snapshot().collect()} == {2}
    ct.restore(v1)
    snap = ct.snapshot().collect()
    assert [(r["id"], r["amount"], r["bucket"]) for r in snap] == [(1, 10.0, 1)]
    cl = ct.clone(str(tmp_path / "g2"))
    assert cl.generated_columns == {"bucket": "CAST(amount / 10 AS INT)"}
    assert [(r["id"], r["bucket"]) for r in cl.snapshot().collect()] == [(1, 1)]
    cl.merge(spark.createDataFrame([(2, 33.0)], "id long, amount double"))
    assert {r["id"]: r["bucket"] for r in cl.snapshot().collect()} == {1: 1, 2: 3}


def test_describe_history_operations(spark, tmp_path):
    """DESCRIBE HISTORY analog: one row per version with the operation tag
    stamped at commit time and monotone timestamps."""
    ct = ChangeTable.create(
        spark, str(tmp_path / "hist"),
        spark.createDataFrame([], "id long, v string").schema, ["id"],
    )
    rows = lambda data: spark.createDataFrame(data, "id long, v string")
    ct.append(rows([(1, "a"), (2, "b")]))          # v1 APPEND
    ct.merge(rows([(2, "b2"), (3, "c")]))          # v2 MERGE
    ct.delete_where("id = 1")                      # v3 DELETE
    ct.compact()                                   # v4 OPTIMIZE
    ct.restore(1)                                  # v5 RESTORE

    hist = ct.describe_history().collect()
    ops = {r["version"]: r["operation"] for r in hist}
    assert ops == {
        0: "CREATE", 1: "APPEND", 2: "MERGE", 3: "DELETE",
        4: "OPTIMIZE", 5: "RESTORE",
    }
    ts = [r["commit_ts"] for r in sorted(hist, key=lambda r: r["version"])]
    assert ts == sorted(ts)
    assert all(r["change_bytes"] > 0 for r in hist
               if r["operation"] in ("APPEND", "MERGE", "DELETE", "RESTORE"))


def test_insert_only_commits_write_once(spark, tmp_path):
    """Single-write layout: an insert-only commit (append / bulk-load
    merge) materializes its rows ONCE under changes/c{v} and the manifest
    points into it — no data/c{v} dir at all (Delta serves insert-only
    CDF from data files the same way; here the roles are flipped). At
    100 TB ingest this halves write amplification."""
    import os

    df = spark.createDataFrame(
        [(1, "a", 1.0, 1), (2, "b", 2.0, 1)],
        "id long, name string, amount double, seq int",
    )
    path = str(tmp_path / "t")
    ct = ChangeTable.create(spark, path, df.schema, ["id"], sequence_by=["seq"])
    ct.merge(df)                                     # bulk load (v1)
    ct.append(spark.createDataFrame(
        [(3, "c", 3.0, 1)], "id long, name string, amount double, seq int",
    ))                                               # append (v2)

    assert not os.path.exists(os.path.join(path, "data", "c1"))
    assert not os.path.exists(os.path.join(path, "data", "c2"))
    from streamjoin_spark.changelog import _entry_dir

    manifest = ct._manifest(2)
    entries = [_entry_dir(e) for ds in manifest.values() for e in ds]
    assert entries and all(e.startswith("changes") for e in entries)

    # both surfaces read correctly from the shared files
    snap = {r["id"]: r["name"] for r in ct.snapshot().collect()}
    assert snap == {1: "a", 2: "b", 3: "c"}
    feed = ct.read_change_feed()
    assert feed.count() == 3
    assert feed.where(F.col(CHANGE_TYPE) != INSERT).count() == 0

    # a later real merge (update path) coexists with the shared layout
    ct.merge(spark.createDataFrame(
        [(2, "b2", 9.0, 2)], "id long, name string, amount double, seq int",
    ))
    snap = {r["id"]: r["name"] for r in ct.snapshot().collect()}
    assert snap[2] == "b2" and len(snap) == 3


def test_vacuum_keeps_live_single_write_files(spark, tmp_path):
    """vacuum past an insert-only commit whose files are still live data:
    referenced change part-dirs survive (snapshot stays correct), but the
    change feed still truncates to the retained window via the
    change_floor watermark."""
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i), 1) for i in range(8)],
        "id long, name string, amount double, seq int",
    )
    path = str(tmp_path / "t")
    ct = ChangeTable.create(spark, path, df.schema, ["id"], sequence_by=["seq"])
    ct.merge(df)                                     # v1: bulk load, single-write
    for i in range(3):                               # v2..v4: regular merges
        ct.merge(spark.createDataFrame(
            [(100 + i, "u", 0.0, 1)],
            "id long, name string, amount double, seq int",
        ))
    snap_before = sorted(tuple(r) for r in ct.snapshot().collect())

    ct.vacuum(retain_versions=2)                     # keep v3..v4
    assert ct.change_floor() == 3
    assert sorted(tuple(r) for r in ct.snapshot().collect()) == snap_before
    # v1's rows are still on disk (live data) yet absent from the feed
    min_v = ct.read_change_feed().agg(F.min(COMMIT_VERSION)).collect()[0][0]
    assert min_v >= 3
    # explicit sub-floor request clamps instead of resurrecting old rows
    assert ct.read_change_feed(starting_version=1).where(
        F.col(COMMIT_VERSION) < 3).count() == 0


def test_vacuum_counts_partial_part_prunes(spark, tmp_path):
    """Retention telemetry: pruning SOME part dirs out of a live
    single-write commit (others kept as manifest-referenced data) is
    counted in ``change_part_dirs`` — previously such partial prunes
    reported nothing, undercounting vacuum's actual cleanup work."""
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i), 1) for i in range(8)],
        "id long, name string, amount double, seq int",
    )
    path = str(tmp_path / "t")
    ct = ChangeTable.create(
        spark, path, df.schema, ["id"], sequence_by=["seq"], n_buckets=2
    )
    ct.merge(df)                                 # v1: single-write, 2 part dirs
    # rewrite ONE bucket's key repeatedly: only that part gets superseded;
    # the other bucket's part dir stays live in the head manifest
    bucketed = df.withColumn("b", F.pmod(F.xxhash64("id"), F.lit(2)))
    ids = {r["b"]: r["id"] for r in bucketed.collect()}
    assert set(ids) == {0, 1}                    # both buckets populated
    hot = ids[0]
    for i in range(3):                           # v2..v4
        ct.merge(spark.createDataFrame(
            [(hot, f"u{i}", 0.0, 2 + i)],
            "id long, name string, amount double, seq int",
        ))
    snap_before = sorted(tuple(r) for r in ct.snapshot().collect())
    removed = ct.vacuum(retain_versions=2)       # keep v3..v4
    assert removed["change_part_dirs"] >= 1      # the partial prune is counted
    assert sorted(tuple(r) for r in ct.snapshot().collect()) == snap_before


def test_read_change_range_lists_only_range_dirs(spark, tmp_path):
    """read_change_range is O(range): only the commit dirs inside
    [v_from, v_to] are opened (inputFiles pins the listing scope), and the
    rows equal the version-filtered full feed."""
    df = spark.createDataFrame(
        [(1, "a", 1.0, 1)], "id long, name string, amount double, seq int"
    )
    path = str(tmp_path / "t")
    ct = ChangeTable.create(spark, path, df.schema, ["id"], sequence_by=["seq"])
    ct.merge(df)                                      # v1
    for i in range(2, 5):                             # v2..v4
        ct.merge(spark.createDataFrame(
            [(i, f"n{i}", float(i), 1)],
            "id long, name string, amount double, seq int",
        ))

    ranged = ct.read_change_range(2, 3)
    files = ranged.inputFiles()
    assert files and all("/changes/c2/" in f or "/changes/c3/" in f
                         for f in files)
    full = ct.read_change_feed(2).where(F.col(COMMIT_VERSION) <= 3)
    assert sorted(map(tuple, ranged.collect())) == sorted(map(tuple, full.collect()))
    # open-ended range caps at the head
    assert ct.read_change_range(1).count() == ct.read_change_feed().count()
    # a pinned range starting below the vacuum floor RAISES (silently
    # skipping a vacuumed range would diverge a stale-watermark consumer)
    ct.vacuum(retain_versions=2)
    assert ct.change_floor() == 3
    with pytest.raises(ValueError, match="retention floor"):
        ct.read_change_range(1, 4)
    assert ct.read_change_range(3, 4).count() > 0      # inside: fine
    assert ct.read_change_range(5, 4).count() == 0     # empty range: no-op


def test_concurrent_write_detected_at_publish(spark, tmp_path):
    """Optimistic concurrency: a commit whose expected head moved (another
    writer published first) raises ConcurrentWriteError at the publish
    point instead of silently losing the other commit; the table head is
    untouched and keeps committing."""
    from streamjoin_spark.changelog import ConcurrentWriteError

    df = spark.createDataFrame(
        [(1, "a", 1.0, 1)], "id long, name string, amount double, seq int"
    )
    path = str(tmp_path / "t")
    ct = ChangeTable.create(spark, path, df.schema, ["id"], sequence_by=["seq"])
    ct.merge(df)                                       # head = v1
    manifest_before = ct._manifest(1)
    with pytest.raises(ConcurrentWriteError):
        ct._publish(1, {}, "X")                        # stale: expects head v0
    assert ct.version() == 1
    # the check fires BEFORE the manifest overwrite: the published
    # winning commit's manifest survives the losing publish attempt
    assert ct._manifest(1) == manifest_before
    ct.merge(spark.createDataFrame(
        [(2, "b", 2.0, 1)], "id long, name string, amount double, seq int"
    ))
    assert ct.version() == 2


def test_publish_carries_forward_fresh_meta(spark, tmp_path):
    """The publish bump re-reads meta: metadata-only updates landed since
    the commit started (vacuum's change_floor) survive instead of being
    clobbered by the writer's stale cache."""
    df = spark.createDataFrame(
        [(1, "a", 1.0, 1)], "id long, name string, amount double, seq int"
    )
    path = str(tmp_path / "t")
    ct = ChangeTable.create(spark, path, df.schema, ["id"], sequence_by=["seq"])
    for i in range(4):
        ct.merge(spark.createDataFrame(
            [(10 + i, "x", 1.0, 1)],
            "id long, name string, amount double, seq int",
        ))
    ct.vacuum(retain_versions=2)
    floor = ct.change_floor()
    assert floor > 0
    ct.merge(spark.createDataFrame(
        [(99, "y", 9.0, 1)], "id long, name string, amount double, seq int"
    ))
    assert ct.change_floor() == floor                  # survived the bump


def test_crashed_single_write_commit_retry_safe(spark, tmp_path):
    """Crash before the meta bump on a SINGLE-WRITE (insert-only) commit:
    the orphaned changes/c{v} files stay invisible (version cap), and the
    retried commit overwrites them in place — one copy in both the
    snapshot and the feed."""
    df = spark.createDataFrame(
        [(1, "a", 1.0, 1), (2, "b", 2.0, 1)],
        "id long, name string, amount double, seq int",
    )
    path = str(tmp_path / "t")
    ct = ChangeTable.create(spark, path, df.schema, ["id"], sequence_by=["seq"])

    real_write_meta = ChangeTable._write_meta

    def crash(self, meta):
        raise RuntimeError("simulated crash before meta bump")

    ChangeTable._write_meta = crash
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            ct.merge(df)                        # bulk load = single-write
    finally:
        ChangeTable._write_meta = real_write_meta

    assert ct.version() == 0
    assert ct.read_change_feed().count() == 0   # orphans invisible
    assert ct.snapshot().count() == 0

    v = ct.merge(df)                            # retry same version
    assert v == 1
    assert ct.snapshot().count() == 2
    assert ct.read_change_feed().count() == 2   # exactly one copy


def test_small_commit_writes_compact_files(spark, tmp_path):
    """r8 write compaction: a commit whose content is estimated under
    COMPACT_WRITE_MAX_BYTES lands ONE parquet file per part dir (and a
    handful of flat change files), instead of one file per write task per
    part — measured r8: the fragmentation cost every later snapshot /
    affected-part read, and the unrepartitioned write was the single
    biggest job of an IVM churn slice (2.4 of 7 s)."""
    import os

    def parquet_files(root):
        return [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        ]

    n = 200
    df = spark.range(n).select(
        F.col("id"), F.concat(F.lit("name"), F.col("id")).alias("name")
    ).repartition(16)  # many upstream tasks: the pre-fix fragmentation setup
    path = str(tmp_path / "t")
    ct = ChangeTable.create(spark, path, df.schema, ["id"], n_buckets=4)
    ct.merge(df)  # bulk load, insert-only single-write layout
    per_part = {}
    for d in os.listdir(os.path.join(path, "changes", "c1")):
        if d.startswith("__part="):
            per_part[d] = len(
                parquet_files(os.path.join(path, "changes", "c1", d))
            )
    assert per_part and all(v == 1 for v in per_part.values()), per_part

    # rewrite commit (update path): data/c2 compact too, changes bounded
    ct.merge(
        spark.range(0, n, 2).select(
            F.col("id"), F.lit("upd").alias("name")
        ).repartition(16)
    )
    data2 = os.path.join(path, "data", "c2")
    for d in os.listdir(data2):
        if d.startswith("__part="):
            assert len(parquet_files(os.path.join(data2, d))) == 1, d
    assert len(parquet_files(os.path.join(path, "changes", "c2"))) <= 4

    # correctness on the compacted layout
    snap = {r["id"]: r["name"] for r in ct.snapshot().collect()}
    assert len(snap) == n and snap[0] == "upd" and snap[1] == "name1"


def test_est_bytes_canary_on_parquet_scan(spark, tmp_path):
    """Canary for the private Catalyst stats accessor (_est_bytes rides
    df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()): it
    must return a positive number on a parquet-scan plan, or a Spark
    upgrade has silently disabled write compaction (the auto-gate treats
    None as "don't compact") — fail loudly here instead."""
    p = str(tmp_path / "scan")
    spark.range(1000).selectExpr("id", "id * 2 AS v").write.parquet(p)
    scan = spark.read.parquet(p)
    est = ChangeTable._est_bytes(scan)
    assert est is not None and est > 0, (
        "Catalyst plan-size estimate broke: write compaction is silently "
        f"disabled (got {est!r})"
    )
    # the scan-rooted variant agrees on a pure scan...
    scan_est = ChangeTable._est_bytes_if_scan(scan)
    assert scan_est == est
    # ...and returns None (= unknown, gates must pass) on join/agg plans,
    # whose estimates overshoot by orders of magnitude
    joined = scan.alias("a").join(scan.alias("b"), "id")
    assert ChangeTable._est_bytes_if_scan(joined) is None
    agged = scan.groupBy("id").count()
    assert ChangeTable._est_bytes_if_scan(agged) is None


def test_compact_rebucket_online(spark, tmp_path):
    """Online re-bucketing (r9): compact(n_buckets=N) re-tiers a grown
    table's copy-on-write granularity in one zero-change-row commit —
    content identical, feed untouched, old pinned snapshots readable,
    later writes hash into the new bucket space."""
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i), 1) for i in range(200)],
        "id long, name string, amount double, seq int",
    )
    path = str(tmp_path / "t")
    ct = ChangeTable.create(spark, path, df.schema, ["id"], n_buckets=2)
    ct.merge(df)
    before = sorted(tuple(r) for r in ct.snapshot().collect())
    feed_before = ct.read_change_feed().count()

    v = ct.compact(n_buckets=8)
    assert ct.n_buckets == 8
    m = ct._manifest(v)
    assert len(m) > 2  # data actually spread into the wider bucket space
    assert sorted(tuple(r) for r in ct.snapshot().collect()) == before
    assert ct.read_change_feed().count() == feed_before  # no change rows
    # pinned pre-rebucket snapshot still reads (dirs listed explicitly)
    assert sorted(tuple(r) for r in ct.snapshot(1).collect()) == before
    # history carries the operation tag
    ops = {r["version"]: r["operation"]
           for r in ct.describe_history().collect()}
    assert ops[v] == "OPTIMIZE REBUCKET"

    # later writes hash into the new space and stay correct
    ct.merge(spark.createDataFrame(
        [(5, "upd", 1.0, 2), (500, "new", 2.0, 1)],
        "id long, name string, amount double, seq int",
    ))
    snap = {r["id"]: r["name"] for r in ct.snapshot().collect()}
    assert snap[5] == "upd" and snap[500] == "new" and len(snap) == 201

    # a fresh instance reads the bumped bucket count from meta
    ct2 = ChangeTable(spark, path)
    assert ct2.n_buckets == 8

    # shrinking works too (consolidation for an over-bucketed small table)
    ct.compact(n_buckets=2)
    assert ct.n_buckets == 2
    assert {r["id"] for r in ct.snapshot().collect()} == set(range(200)) | {500}
