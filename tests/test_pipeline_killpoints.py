"""Pipeline-level crash-resume differential (VERDICT r6 task 4).

test_changelog_model's kill-point fuzz proves single-table commit crash
safety; this sweep proves the RUNTIME's exactly-once-across-stages claim
(SURVEY §7 hard problem #2): kill a chained incremental pipeline
(join → agg with a staging ChangeTable) at every protocol edge —

- ``pre_manifest`` (ChangeTable._publish): a stage's data/changes files
  are written, the manifest + version bump are not — the commit is
  invisible; the restart regenerates it in place;
- ``pre_meta`` (ChangeTable._write_meta): the manifest is written, the
  version bump is not — still invisible (readers gate on meta);
- ``pre_progress`` (_Progress.save): the stage's commit PUBLISHED but its
  watermark did not persist — the restarted writer re-derives the same
  slice; replace_keys' scope-diff reconciliation makes the re-apply a
  no-op for join/union stages, and the aggregate stage suppresses its
  NON-idempotent additive fast path on ranges below the target's
  ``applied_through`` marker (recorded atomically with each commit) so
  the replay re-aggregates instead of double-adding;

then restarts (fresh writer over the same path, persisted watermarks),
drains, and differential-checks the target against the batch twin
recomputed on the final snapshots. Each kill site is swept across
multiple call ordinals so the kill lands in different stages / different
CDC rounds. The marker never CLAMPS a watermark: a fresh checkpoint /
startingVersion pin below it is a rebuild REQUEST and must reprocess
(test_fresh_checkpoint_rebuilds_instead_of_skipping).
"""

import pyspark.sql.functions as F
import pytest

from streamjoin_spark import Stream
from streamjoin_spark.changelog import ChangeTable
from streamjoin_spark.streaming import incremental as inc

CUST = "id long, name string, seg string"
ORD = "oid long, cid long, price double"


class _Kill(RuntimeError):
    pass


def assert_same(a, b):
    assert sorted(a.columns) == sorted(b.columns)
    cols = sorted(a.columns)
    d1 = a.select(*cols).exceptAll(b.select(*cols))
    d2 = b.select(*cols).exceptAll(a.select(*cols))
    assert d1.count() == 0 and d2.count() == 0, (
        f"mismatch:\n only-incremental={d1.collect()[:5]}"
        f"\n only-batch={d2.collect()[:5]}"
    )


KILL_SITES = {
    "pre_manifest": (ChangeTable, "_publish"),
    "pre_meta": (ChangeTable, "_write_meta"),
    "pre_progress": (inc._Progress, "save"),
}


def _arm(monkeypatch, site, kill_at):
    """Wrap the site's method: while armed, the ``kill_at``-th call dies
    (once); all other calls pass through. Source-table CDC commits in the
    drive script run UNARMED so the kill always lands inside the
    pipeline's own drain."""
    holder, attr = KILL_SITES[site]
    orig = getattr(holder, attr)
    state = {"calls": 0, "fired": False, "armed": False}

    def wrapper(self, *a, **kw):
        if state["armed"] and not state["fired"]:
            state["calls"] += 1
            if state["calls"] == kill_at:
                state["fired"] = True
                raise _Kill(f"killed {attr} at armed call {kill_at}")
        return orig(self, *a, **kw)

    monkeypatch.setattr(holder, attr, wrapper)
    return state


@pytest.mark.parametrize("site", sorted(KILL_SITES))
@pytest.mark.parametrize("kill_at", [1, 2, 3, 5])
def test_chained_pipeline_crash_resume(spark, tmp_path, monkeypatch, site, kill_at):
    cust_ct = ChangeTable.create(
        spark, str(tmp_path / "cust"),
        spark.createDataFrame([], CUST).schema, ["id"],
    )
    ord_ct = ChangeTable.create(
        spark, str(tmp_path / "ord"),
        spark.createDataFrame([], ORD).schema, ["oid"],
    )
    path = str(tmp_path / "seg_totals")

    def make_writer():
        # fresh writer objects each restart; watermarks persist on disk
        c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
        o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
        return (
            c.join(o, "inner")
            .on(c["id"] == o["cid"])
            .groupBy("seg")
            .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
            .writeToPath(path)
        )

    def oracle():
        C, O = cust_ct.snapshot().alias("c"), ord_ct.snapshot().alias("o")
        return (
            C.join(O, F.col("c.id") == F.col("o.cid"))
            .groupBy("seg")
            .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
        )

    state = _arm(monkeypatch, site, kill_at)

    def drain():
        state["armed"] = True
        w = make_writer()
        for _ in range(4):  # the kill fires at most once → ≤1 restart
            try:
                w.run()
                state["armed"] = False
                return w
            except _Kill:
                w = make_writer()  # crash → restart over same path
        raise AssertionError("drain did not converge after restarts")

    # CDC round 1: base data
    cust_ct.merge(spark.createDataFrame(
        [(1, "ann", "A"), (2, "bob", "B"), (3, "cyd", "A")], CUST))
    ord_ct.merge(spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, 7.0), (12, 1, 2.0)], ORD))
    w = drain()
    assert_same(w.toDF(), oracle())

    # CDC round 2: segment move (retraction through the agg) + delete
    cust_ct.merge(spark.createDataFrame([(1, "ann", "B")], CUST))
    ord_ct.delete_where(F.col("oid") == 11)
    w = drain()
    assert_same(w.toDF(), oracle())

    # CDC round 3: late insert + FK move
    ord_ct.merge(spark.createDataFrame(
        [(13, 3, 9.0), (10, 3, 5.5)], ORD))
    w = drain()
    assert_same(w.toDF(), oracle())

    # no residual backlog, no double-apply on an idle re-run
    assert w.run() == 0
    assert_same(w.toDF(), oracle())


def test_fresh_checkpoint_rebuilds_instead_of_skipping(spark, tmp_path):
    """r7 review finding: the applied_through marker must never CLAMP a
    fresh watermark — a deleted checkpoint is a rebuild request. The
    rebuild replays the whole history through the replay-safe recompute
    path, which also REPAIRS a diverged target (here: a row corrupted
    out-of-band), where a marker-clamp would have silently skipped
    everything and kept the corruption."""
    import os

    cust_ct = ChangeTable.create(
        spark, str(tmp_path / "cust"),
        spark.createDataFrame([], CUST).schema, ["id"],
    )
    ord_ct = ChangeTable.create(
        spark, str(tmp_path / "ord"),
        spark.createDataFrame([], ORD).schema, ["oid"],
    )
    path = str(tmp_path / "totals")

    def make_writer():
        c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
        o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
        return (
            c.join(o, "inner")
            .on(c["id"] == o["cid"])
            .groupBy("seg")
            .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
            .writeToPath(path)
        )

    def oracle():
        C, O = cust_ct.snapshot().alias("c"), ord_ct.snapshot().alias("o")
        return (
            C.join(O, F.col("c.id") == F.col("o.cid"))
            .groupBy("seg")
            .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
        )

    cust_ct.merge(spark.createDataFrame(
        [(1, "ann", "A"), (2, "bob", "B")], CUST))
    ord_ct.merge(spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, 7.0), (12, 1, 2.0)], ORD))
    w1 = make_writer()
    w1.run()
    assert_same(w1.toDF(), oracle())

    # corrupt the managed target out-of-band, then request a rebuild by
    # deleting the checkpoint (progress file)
    tgt = ChangeTable(spark, path)
    tgt.merge(spark.createDataFrame(
        [("A", 999.0, 99)], "seg string, total double, n long"))
    assert [r["total"] for r in tgt.snapshot().where("seg='A'").collect()] == [999.0]
    os.remove(os.path.join(path, "_progress.json"))

    w2 = make_writer()
    assert w2.run() > 0  # reprocessed, not skipped
    assert_same(w2.toDF(), oracle())  # corruption repaired by the rebuild

    # the first-class API does the same without touching files by hand:
    # corrupt again, rebuild(), converge — and an idle rebuild of a
    # correct view commits nothing beyond reconciling no-ops
    tgt2 = ChangeTable(spark, path)
    tgt2.merge(spark.createDataFrame(
        [("B", -1.0, 1)], "seg string, total double, n long"))
    w2.rebuild()
    assert_same(w2.toDF(), oracle())
    assert w2.run() == 0  # rebuilt view is drained
