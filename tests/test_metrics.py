"""IVM observability: per-slice metrics (r6).

Every drained slice records {backlog range, slice bytes, governor rung,
rows out, committed version, latency} on its stage (bounded ring, surfaced
via stageProgress) and, with the ``metricsPath`` writer option, flushes to
a metrics ChangeTable — itself CDC-consumable. The reference's analog is
its composite streaming-progress merge (elzyme/streams.py:242-314); these
metrics add the engine-specific currencies that object cannot carry.
"""

import pyspark.sql.functions as F

from streamjoin_spark import Stream
from streamjoin_spark.changelog import ChangeTable

DOC = "id long, val string"


def _rows(spark, rows):
    return spark.createDataFrame(rows, DOC)


def test_slice_metrics_recorded_and_flushed(spark, tmp_path):
    src = ChangeTable.create(
        spark, str(tmp_path / "src"),
        spark.createDataFrame([], DOC).schema, ["id"],
    )
    mpath = str(tmp_path / "metrics")
    w = (
        Stream.fromChangeTable(src, "s")
        .primaryKeys("id")
        .to(lambda df: df)
        .writeToPath(str(tmp_path / "view"))
        .option("maxVersionsPerTrigger", 2)
        .option("metricsPath", mpath)
    )
    for i in range(6):
        src.merge(_rows(spark, [(i, f"v{i}")]))
    w.run()

    # one record per drained slice: 6 commits / 2 per slice = 3
    st = w.pipeline.stages[-1]
    recs = list(st.metrics)
    assert len(recs) == 3
    for m in recs:
        assert m["stage"] == "UnionLegStage"
        assert m["slice_bytes"] > 0
        assert m["rung"] == "broadcast"          # tiny scope: first ladder rung
        assert m["committed_version"] is not None
        assert m["rows_out"] == 2                # 2 insert change rows / slice
        assert m["seconds"] >= 0
        assert m["versions_to"][0] - m["versions_from"][0] == 2
    assert [m["seq"] for m in recs] == [0, 1, 2]

    # composite progress carries the latest record
    sp = w.stageProgress()[-1]
    assert sp["last_metrics"]["seq"] == 2

    # flushed to the metrics ChangeTable — queryable like any table
    mt = ChangeTable(spark, mpath)
    assert mt.snapshot().count() == 3
    agg = mt.snapshot().agg(
        F.sum("rows_out").alias("r"), F.max("committed_version").alias("v")
    ).collect()[0]
    assert agg["r"] == 6 and agg["v"] == 3

    # idle run flushes nothing; new churn appends exactly its slices
    w.run()
    assert mt.snapshot().count() == 3
    src.merge(_rows(spark, [(99, "x")]))
    w.run()
    assert mt.snapshot().count() == 4
    last = mt.snapshot().orderBy(F.desc("seq")).limit(1).collect()[0]
    assert last["rows_out"] == 1 and last["rung"] == "broadcast"


def test_metrics_flush_retry_is_idempotent(spark, tmp_path):
    """ADVICE r6: metric_ids are deterministic (run_id|idx|seq) and the
    cursor advances only after the flush commits, so a run() retried
    after a published-but-interrupted flush re-submits the same ids —
    the MERGE-by-pk flush must absorb the retry instead of stacking
    duplicate-key rows. Simulated by rolling the cursor back (exactly
    the state a crash between commit and cursor update leaves)."""
    src = ChangeTable.create(
        spark, str(tmp_path / "src"),
        spark.createDataFrame([], DOC).schema, ["id"],
    )
    mpath = str(tmp_path / "metrics")
    w = (
        Stream.fromChangeTable(src, "s")
        .primaryKeys("id")
        .to(lambda df: df)
        .writeToPath(str(tmp_path / "view"))
        .option("metricsPath", mpath)
    )
    src.merge(_rows(spark, [(1, "a"), (2, "b")]))
    w.run()
    mt = ChangeTable(spark, mpath)
    assert mt.snapshot().count() == 1
    # crash window: flush committed, cursor did not persist → re-flush
    w._metrics_cursor = {}
    w._flush_metrics(mpath)
    snap = mt.snapshot()
    assert snap.count() == 1  # merged, not duplicated
    assert snap.select("metric_id").distinct().count() == 1


def test_metrics_survive_rebuild(spark, tmp_path):
    """r8 review finding: rebuild() replaces the stage objects, restarting
    their seq counters at 0 — with the old run_id|idx|seq ids the flush
    dedupe anti-join silently dropped every post-rebuild record whose id
    collided with an already-flushed row. The metrics generation (bumped
    by rebuild(), part of metric_id) keeps the streams disjoint."""
    src = ChangeTable.create(
        spark, str(tmp_path / "src"),
        spark.createDataFrame([], DOC).schema, ["id"],
    )
    mpath = str(tmp_path / "metrics")
    w = (
        Stream.fromChangeTable(src, "s")
        .primaryKeys("id")
        .to(lambda df: df)
        .writeToPath(str(tmp_path / "view"))
        .option("metricsPath", mpath)
    )
    src.merge(_rows(spark, [(1, "a"), (2, "b")]))
    w.run()
    mt = ChangeTable(spark, mpath)
    assert mt.snapshot().count() == 1

    # rebuild replays history through fresh stage objects (seq restarts
    # at 0); its slice record must LAND, not vanish into the dedupe
    w.rebuild()
    snap = mt.snapshot()
    assert snap.count() == 2
    assert snap.select("metric_id").distinct().count() == 2

    # post-rebuild steady state keeps flowing and stays retry-idempotent
    src.merge(_rows(spark, [(3, "c")]))
    w.run()
    assert mt.snapshot().count() == 3
    w._metrics_cursor = {}
    w._flush_metrics(mpath)
    assert mt.snapshot().count() == 3  # retry absorbed, nothing stacked


def test_metrics_steady_state_flush_skips_snapshot_scan(spark, tmp_path, monkeypatch):
    """VERDICT r7 task 6: the flush dedupe guard anti-joined the staged
    frame against the FULL metric_id column on EVERY flush — O(history)
    read per flush on a table that grows one row per slice forever. The
    scan now runs only when a duplicate is POSSIBLE (flush cursor below
    the high-water mark, i.e. the crash-retry window); the steady-state
    flush is a pure O(batch) append with no snapshot read of the metrics
    table."""
    src = ChangeTable.create(
        spark, str(tmp_path / "src"),
        spark.createDataFrame([], DOC).schema, ["id"],
    )
    mpath = str(tmp_path / "metrics")
    w = (
        Stream.fromChangeTable(src, "s")
        .primaryKeys("id")
        .to(lambda df: df)
        .writeToPath(str(tmp_path / "view"))
        .option("metricsPath", mpath)
    )
    src.merge(_rows(spark, [(1, "a")]))
    w.run()

    snapshot_paths = []
    real_snapshot = ChangeTable.snapshot

    def counting_snapshot(self, *a, **kw):
        snapshot_paths.append(self.path)
        return real_snapshot(self, *a, **kw)

    monkeypatch.setattr(ChangeTable, "snapshot", counting_snapshot)

    # steady-state slices: flush appends, never reads the metrics table
    for i in range(2, 4):
        src.merge(_rows(spark, [(i, f"v{i}")]))
        w.run()
    assert mpath not in snapshot_paths
    mt = ChangeTable(spark, mpath)
    assert mt.snapshot().count() == 3
    snapshot_paths.clear()

    # crash-retry window (cursor regressed below the hwm): the guard DOES
    # scan, and absorbs the duplicate ids
    w._metrics_cursor = {}
    w._flush_metrics(mpath)
    assert mpath in snapshot_paths
    assert mt.snapshot().count() == 3


def test_table_sink_batch_ids_increment(spark, tmp_path):
    """ADVICE r6: table-sink stages count slices in progress.batch_id
    too (previously only foreachBatch did, leaving batch_id=0 forever in
    their metrics records)."""
    src = ChangeTable.create(
        spark, str(tmp_path / "src"),
        spark.createDataFrame([], DOC).schema, ["id"],
    )
    w = (
        Stream.fromChangeTable(src, "s")
        .primaryKeys("id")
        .to(lambda df: df)
        .writeToPath(str(tmp_path / "view"))
        .option("maxVersionsPerTrigger", 1)
    )
    for i in range(3):
        src.merge(_rows(spark, [(i, f"v{i}")]))
    w.run()
    st = w.pipeline.stages[-1]
    assert st.progress.batch_id == 3
    assert [m["batch_id"] for m in st.metrics] == [1, 2, 3]


def test_metrics_record_shuffle_rung(spark, tmp_path):
    """broadcastThreshold=0 + Bloom off ⇒ the recorded rung is the exact
    shuffle semi-join (the ladder's bottom), proving the metric reflects
    the governor's actual decision, not a constant."""
    src = ChangeTable.create(
        spark, str(tmp_path / "src"),
        spark.createDataFrame([], DOC).schema, ["id"],
    )
    w = (
        Stream.fromChangeTable(src, "s")
        .primaryKeys("id")
        .to(lambda df: df)
        .writeToPath(str(tmp_path / "view"))
        .option("broadcastThreshold", 0)
        .option("scopeBloomFilter", "false")
    )
    src.merge(_rows(spark, [(1, "a"), (2, "b")]))
    w.run()
    assert w.pipeline.stages[-1].metrics[-1]["rung"] == "shuffle"


def test_metrics_flush_in_continuous_start_mode(spark, tmp_path):
    """start() mode (real Structured Streaming trigger loop) must keep the
    metricsPath table flowing: the foreachBatch trigger drives writer.run()
    (which flushes), not the raw pipeline drain — previously the metrics
    table was silently never written in exactly the long-running mode it
    targets."""
    src = ChangeTable.create(
        spark, str(tmp_path / "src"),
        spark.createDataFrame([], DOC).schema, ["id"],
    )
    mpath = str(tmp_path / "metrics")
    src.merge(_rows(spark, [(1, "a"), (2, "b")]))
    w = (
        Stream.fromChangeTable(src, "s")
        .primaryKeys("id")
        .to(lambda df: df)
        .writeToPath(str(tmp_path / "view"))
        .option("metricsPath", mpath)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
    )
    w.trigger(availableNow=True).start()
    try:
        w.awaitTermination(120)
    finally:
        w.stop()
    mt = ChangeTable(spark, mpath)
    recs = mt.snapshot().collect()
    assert len(recs) >= 1
    assert {r["rows_out"] for r in recs} == {2}
    assert all(r["rung"] == "broadcast" for r in recs)


def test_metrics_retention_ages_out_old_rows(spark, tmp_path):
    """r8 VERDICT task 7: metricsRetainSeconds expires metric rows past
    the wall-clock horizon (delete_where on flushed_ts, amortized) while
    the flush/dedupe path keeps appending new slices untouched."""
    src = ChangeTable.create(
        spark, str(tmp_path / "src"),
        spark.createDataFrame([], DOC).schema, ["id"],
    )
    mpath = str(tmp_path / "metrics")
    w = (
        Stream.fromChangeTable(src, "s")
        .primaryKeys("id")
        .to(lambda df: df)
        .writeToPath(str(tmp_path / "view"))
        .option("metricsPath", mpath)
        .option("metricsRetainSeconds", 3600)
    )
    src.merge(_rows(spark, [(1, "a"), (2, "b")]))
    w.run()
    mt = ChangeTable(spark, mpath)
    first = mt.snapshot().collect()
    assert len(first) == 1 and first[0]["flushed_ts"] is not None

    import json as _json
    import os as _os

    stamp_path = _os.path.join(mt.path, "metrics_purge_stamp.json")

    def force_probe():
        # the amortization stamp persists OUTSIDE meta since r11 (meta is
        # the commit publish point; the sidecar write can never clobber a
        # racing flush's version bump — r10 ADVICE), so forcing a probe
        # clears the in-memory stamp AND the sidecar
        w._metrics_last_purge = 0.0
        mt.backend.remove(stamp_path)

    # within the horizon nothing expires (purge probe runs, deletes none)
    force_probe()
    w._purge_metrics(mpath)
    assert mt.snapshot().count() == 1
    # the probe stamped the SIDECAR (never meta): a FRESH writer instance
    # (the one-writer-object-per-run batch idiom) skips the snapshot
    # probe entirely — r9 ADVICE's scenario — without any meta RMW race
    assert float(_json.loads(mt.backend.read(stamp_path))["ts"]) > 0.0
    assert "metrics_last_purge" not in mt._read_meta()

    # age the horizon to ~zero: the old row expires
    w._options["metricsRetainSeconds"] = 1e-9
    force_probe()
    import time as _time

    _time.sleep(0.01)  # ensure flushed_ts < now - 1e-9
    w._purge_metrics(mpath)
    assert mt.snapshot().count() == 0

    # flush path unaffected: a new slice lands with a fresh stamp, and
    # the retry-dedupe bookkeeping still advances
    w._options["metricsRetainSeconds"] = 3600
    src.merge(_rows(spark, [(3, "c")]))
    w.run()
    rows = mt.snapshot().collect()
    assert len(rows) == 1 and rows[0]["rows_out"] == 1
    assert rows[0]["flushed_ts"] is not None

    # pre-r9 tables (no flushed_ts column) evolve on the next flush and
    # unknown-age rows expire once retention is on — simulated by
    # nulling the stamp through a raw update
    mt.merge(
        mt.snapshot().withColumn("flushed_ts", F.lit(None).cast("double"))
    )
    force_probe()
    w._purge_metrics(mpath)
    assert mt.snapshot().count() == 0
