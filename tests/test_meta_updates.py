"""Claim-serialized metadata-only updates + legacy n_buckets_since + the
r10-ADVICE checkpoint-release fixes.

The meta file is the commit publish point: a bare read-modify-write of it
(the pre-r11 set_stats_columns / vacuum-floor / metrics-stamp pattern)
races a concurrent commit whose version bump gets clobbered — the table
head silently regresses and committed rows are unpublished. `_update_meta`
holds the head+1 claim for the duration of the RMW, so it serializes with
every commit writer (r10 ADVICE, medium).
"""

import json
import os
import time

import pytest

from streamjoin_spark.changelog import ChangeTable, ConcurrentWriteError


def _mk(spark, tmp_path, n=200, name="t"):
    df = spark.range(n).selectExpr("id", "concat('n', id) AS name")
    ct = ChangeTable.create(
        spark, str(tmp_path / name), df.schema, ["id"], n_buckets=2
    )
    ct.merge(df)
    return ct


def test_update_meta_serializes_with_foreign_claim(spark, tmp_path):
    """A metadata-only update must WAIT on (and eventually fail against)
    a foreign in-flight commit claim instead of blindly overwriting meta
    — the pre-fix RMW would have clobbered that commit's publish."""
    ct = _mk(spark, tmp_path)
    other = ChangeTable(spark, ct.path)  # foreign writer (own token)
    v = other._next_version()            # in-flight commit holds head+1
    try:
        ct._claim_wait_s = 0.3
        with pytest.raises(ConcurrentWriteError):
            ct.set_stats_columns("name")
        # nothing was written while the claim was held
        assert "name" not in ct.stats_extra_cols
    finally:
        other._release_claim(v)
    ct.set_stats_columns("name")
    assert "name" in ChangeTable(spark, ct.path).stats_extra_cols


def test_update_meta_reentrant_inside_own_commit(spark, tmp_path):
    """When THIS writer already holds the head+1 claim (a metadata update
    triggered from inside its own commit body), _update_meta must write
    directly and must NOT release the outer commit's claim."""
    ct = _mk(spark, tmp_path)
    v = ct._next_version()  # simulate: we are inside our own commit body
    try:
        ct.set_stats_columns("name")
        assert "name" in ct.stats_extra_cols
        raw = ct.backend.read(ct._claim_path(v))
        assert raw is not None, "re-entrant update released the outer claim"
        assert json.loads(raw)["token"] == ct._writer_token
    finally:
        ct._release_claim(v)


def test_update_meta_carries_concurrent_version(spark, tmp_path):
    """The mutation applies to a FRESH meta read under the claim — a
    version bump published before the update is carried forward."""
    ct = _mk(spark, tmp_path)
    stale = ChangeTable(spark, ct.path)  # caches meta at v1
    ct.append(
        spark.createDataFrame([(999, "x")], "id long, name string")
    )  # head moves to v2
    stale.set_stats_columns("name")
    meta = json.loads(stale.backend.read(stale._meta_path))
    assert meta["version"] == ct.version() == 2
    assert meta["stats_cols_extra"] == ["name"]


def test_vacuum_floor_survives_concurrent_head(spark, tmp_path):
    """vacuum's change_floor bump rides _update_meta: a racing vacuum pair
    keeps the monotonic max and never regresses the version head."""
    ct = _mk(spark, tmp_path)
    for i in range(6):
        ct.append(
            spark.createDataFrame([(1000 + i, "x")], "id long, name string")
        )
    head = ct.version()
    ct.vacuum(retain_versions=2)
    meta = json.loads(ct.backend.read(ct._meta_path))
    assert meta["version"] == head
    assert meta["change_floor"] == head - 1
    # an idempotent re-run keeps the monotonic floor
    ct.vacuum(retain_versions=2)
    assert ct.change_floor() == head - 1


def test_metrics_purge_stamp_lives_outside_meta(spark, tmp_path, sf_dir):
    """The purge amortization stamp must never touch the metrics table's
    meta file (the publish point) — it lands in a sidecar (r10 ADVICE)."""
    from streamjoin_spark.streams import Stream

    df = spark.range(50).selectExpr("id", "CAST(id AS double) AS v")
    src = ChangeTable.create(
        spark, str(tmp_path / "src"), df.schema, ["id"], n_buckets=2
    )
    src.merge(df)
    w = (
        Stream.fromChangeTable(src, "s").primaryKeys("id")
        .writeToPath(str(tmp_path / "view"))
        .option("metricsPath", str(tmp_path / "metrics"))
        .option("metricsRetainSeconds", 3600)
    )
    w.run()
    src.append(spark.createDataFrame([(999, 1.0)], "id long, v double"))
    w.run()
    mpath = str(tmp_path / "metrics")
    assert ChangeTable.exists(mpath)
    mt = ChangeTable(spark, mpath)
    assert "metrics_last_purge" not in mt._read_meta()
    stamp = os.path.join(mpath, "metrics_purge_stamp.json")
    assert os.path.exists(stamp)
    assert json.loads(mt.backend.read(stamp))["ts"] <= time.time()


def test_legacy_nbuckets_since_inferred_from_rebucket_history(
    spark, tmp_path
):
    """A pre-r10 table (no n_buckets_since stamp) that WAS rebucketed must
    not default to 0 — part restriction under the new hash on a version
    pinned before the rebucket would silently miss rows (r10 ADVICE). The
    floor is inferred from the commit-op tags and backfilled."""
    ct = _mk(spark, tmp_path, n=500)
    rv = ct.compact(n_buckets=4)  # stamps n_buckets_since=rv
    # simulate the legacy table: strip the stamp
    meta = dict(ct._read_meta())
    meta.pop("n_buckets_since")
    ct._write_meta(meta)

    fresh = ChangeTable(spark, ct.path)
    assert fresh.n_buckets_since == rv
    # backfilled so the next instance skips the scan
    assert json.loads(
        fresh.backend.read(fresh._meta_path)
    )["n_buckets_since"] == rv
    # and a scoped read pinned BEFORE the rebucket still finds its rows
    keys = spark.createDataFrame([(7,), (423,)], "id long")
    got = {
        r["id"]
        for r in fresh.read_where(keys, ["id"], version=rv - 1).collect()
    }
    assert got == {7, 423}


def test_legacy_nbuckets_since_no_rebucket_infers_zero(spark, tmp_path):
    ct = _mk(spark, tmp_path)
    meta = dict(ct._read_meta())
    meta.pop("n_buckets_since")
    ct._write_meta(meta)
    fresh = ChangeTable(spark, ct.path)
    assert fresh.n_buckets_since == 0


def test_foreach_sink_releases_scope_checkpoints(spark, tmp_path):
    """r10 ADVICE (low): _ForeachStage never freed the affected-scope
    checkpoint — every batch accumulated blocks until JVM GC. Drained
    batches must leave the persistent-RDD registry where it started."""
    from streamjoin_spark.streams import Stream

    df = spark.range(300).selectExpr(
        "id AS k", "CAST(id AS double) AS v"
    )
    a = ChangeTable.create(
        spark, str(tmp_path / "a"), df.schema, ["k"], n_buckets=2
    )
    a.merge(df)
    b = ChangeTable.create(
        spark, str(tmp_path / "b"), df.schema, ["k"], n_buckets=2
    )
    b.merge(df)
    sa = Stream.fromChangeTable(a, "a").primaryKeys("k")
    sb = Stream.fromChangeTable(b, "b").primaryKeys("k")
    seen = []
    fw = (
        sa.join(sb, "inner")
        .onKeys("k")
        .select(sa["k"], sa["v"])
        .foreachBatch(lambda bdf, bid: seen.append(bdf.count()))
    )
    jsc = spark.sparkContext._jsc.sc()
    fw.run()
    base = jsc.getPersistentRDDs().size()
    for i in range(3):
        a.merge(
            spark.createDataFrame([(i, float(i) + 100)], "k long, v double")
        )
        fw.run()
    assert seen, "sink never called"
    assert jsc.getPersistentRDDs().size() <= base


def test_claim_wait_writer_option_plumbs_to_targets(spark, tmp_path):
    """claimWaitSeconds/claimStaleSeconds writer options reach every
    pipeline-owned table (final target + staging), not the roots."""
    from streamjoin_spark.streams import Stream

    df = spark.range(20).selectExpr("id AS k", "CAST(id AS double) AS v")
    a = ChangeTable.create(
        spark, str(tmp_path / "a"), df.schema, ["k"], n_buckets=2
    )
    a.merge(df)
    s = Stream.fromChangeTable(a, "a").primaryKeys("k")
    w = (
        s.groupBy("k")
        .agg(__import__("pyspark.sql.functions", fromlist=["F"]).sum("v").alias("t"))
        .writeToPath(str(tmp_path / "agg"))
        .option("claimWaitSeconds", 7)
        .option("claimStaleSeconds", 1200)
    )
    w.run()
    assert w.target._claim_wait_s == 7.0
    assert w.target._claim_stale_s == 1200.0
    assert a._claim_wait_s == 30.0  # roots untouched


def test_stats_columns_writer_option(spark, tmp_path):
    """statsColumns (r11): the writer-option spelling of
    set_stats_columns — the FINAL target's commits harvest footer stats
    on the declared dims so scoped reads prune on them; staging tables
    and roots stay untouched."""
    from streamjoin_spark.streams import Stream

    df = spark.range(100).selectExpr(
        "id AS k", "CAST(id AS double) AS ts", "CAST(id % 7 AS long) AS g"
    )
    src = ChangeTable.create(
        spark, str(tmp_path / "src"), df.schema, ["k"], n_buckets=2
    )
    src.merge(df)
    w = (
        Stream.fromChangeTable(src, "s").primaryKeys("k")
        .writeToPath(str(tmp_path / "view"))
        .option("statsColumns", "ts, g")
    )
    w.run()
    assert w.target.stats_extra_cols == ("ts", "g")
    assert src.stats_extra_cols == ()
    m = w.target._manifest(w.target.version())
    assert any(
        isinstance(e, dict) and "ts" in (e.get("s") or {})
        for es in m.values()
        for e in es
    ), "view commits carry no stats on the declared columns"
