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

import os

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


@pytest.mark.parametrize("site", sorted(KILL_SITES))
def test_concurrent_writer_crash_during_contention(spark, tmp_path, monkeypatch, site):
    """VERDICT r7 task 4 — kill-points × concurrency. The OCC model suite
    proves two-writer serialization; the kill-point sweep proves
    single-writer crash-resume. Composed: writer A dies at a protocol
    edge WHILE writer B drains the same pipeline over the same target.
    Acceptable per-writer outcomes are success, the armed kill, or a
    LOUD ConcurrentWriteError (OCC rebase guard) — never corruption.
    Afterwards a fresh writer converges; the target's version sequence
    is contiguous (every v ≤ head has its manifest — no wedged slot, no
    hole) and the table matches the batch twin."""
    import threading

    from streamjoin_spark.changelog import ConcurrentWriteError

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

    # thread-targeted kill: fires once, only on the victim thread
    holder, attr = KILL_SITES[site]
    orig = getattr(holder, attr)
    state = {"calls": 0, "fired": False, "victim": None}

    def wrapper(self, *a, **kw):
        if (
            state["victim"] is not None
            and threading.current_thread().name == state["victim"]
            and not state["fired"]
        ):
            state["calls"] += 1
            if state["calls"] == 2:
                state["fired"] = True
                raise _Kill(f"killed {attr} on victim thread")
        return orig(self, *a, **kw)

    monkeypatch.setattr(holder, attr, wrapper)

    # base data, drained cleanly
    cust_ct.merge(spark.createDataFrame(
        [(1, "ann", "A"), (2, "bob", "B"), (3, "cyd", "A")], CUST))
    ord_ct.merge(spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, 7.0), (12, 1, 2.0)], ORD))
    make_writer().run()

    # CDC churn, then two writers drain it CONCURRENTLY; A dies mid-drain
    cust_ct.merge(spark.createDataFrame([(1, "ann", "B")], CUST))
    ord_ct.delete_where(F.col("oid") == 11)
    ord_ct.merge(spark.createDataFrame([(13, 3, 9.0), (10, 3, 5.5)], ORD))

    state["victim"] = "victimA"
    errs: list = []

    def drain(tolerate_kill: bool):
        try:
            make_writer().run()
        except _Kill:
            if not tolerate_kill:
                errs.append("kill on wrong thread")
        except ConcurrentWriteError:
            pass  # loud OCC abort — acceptable, a fresh run converges
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ta = threading.Thread(target=drain, args=(True,), name="victimA")
    tb = threading.Thread(target=drain, args=(False,), name="drainB")
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not errs, errs
    state["victim"] = None

    # fresh writer converges over whatever the race left behind
    w = make_writer()
    for _ in range(3):
        try:
            w.run()
            break
        except ConcurrentWriteError:
            w = make_writer()
    assert_same(w.toDF(), oracle())
    assert w.run() == 0  # drained, no residual backlog, no double-apply

    # version sequence contiguous on the target — no wedged or skipped slot
    tgt = ChangeTable(spark, path)
    for v in range(1, tgt.version() + 1):
        assert os.path.exists(
            os.path.join(path, "manifests", f"v{v}.json")
        ), f"hole at v{v}"


def test_crash_mid_rebuild_with_concurrent_writer(spark, tmp_path, monkeypatch):
    """The rebuild() variant of crash-during-contention: writer A's full
    rebuild dies at a publish edge while writer B drains the same
    pipeline; a fresh rebuild converges the view to its definition."""
    import threading

    from streamjoin_spark.changelog import ConcurrentWriteError

    src = ChangeTable.create(
        spark, str(tmp_path / "src"),
        spark.createDataFrame([], ORD).schema, ["oid"],
    )
    path = str(tmp_path / "totals")

    def make_writer():
        o = Stream.fromChangeTable(src, "o").primaryKeys("oid")
        return (
            o.groupBy("cid")
            .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
            .writeToPath(path)
        )

    def oracle():
        return (
            src.snapshot()
            .groupBy("cid")
            .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
        )

    for oid, cid, price in [(10, 1, 1.0), (11, 2, 4.0), (12, 1, 100.0)]:
        src.merge(spark.createDataFrame([(oid, cid, price)], ORD))
    w0 = make_writer()
    w0.run()

    # corrupt the target, then crash a rebuild at its FIRST publish while
    # a concurrent writer drains (new churn) against the same target
    tgt = ChangeTable(spark, path)
    tgt.merge(spark.createDataFrame(
        [(1, -1.0, 1)], "cid long, total double, n long"))

    orig = ChangeTable._publish
    state = {"fired": False}

    def wrapper(self, *a, **kw):
        if (not state["fired"]
                and threading.current_thread().name == "rebuildA"):
            state["fired"] = True
            raise _Kill("killed rebuild publish")
        return orig(self, *a, **kw)

    monkeypatch.setattr(ChangeTable, "_publish", wrapper)
    src.merge(spark.createDataFrame([(13, 2, 7.0)], ORD))
    errs: list = []

    def rebuild_a():
        try:
            make_writer().rebuild()
        except _Kill:
            pass
        except ConcurrentWriteError:
            pass
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    def drain_b():
        try:
            make_writer().run()
        except ConcurrentWriteError:
            pass
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ta = threading.Thread(target=rebuild_a, name="rebuildA")
    tb = threading.Thread(target=drain_b, name="drainB")
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not errs, errs

    # the interrupted rebuild left a rebuild REQUEST (reset watermarks) or
    # a partial replay — a fresh rebuild converges and repairs everything
    w = make_writer()
    for _ in range(3):
        try:
            w.rebuild()
            break
        except ConcurrentWriteError:
            w = make_writer()
    assert_same(w.toDF(), oracle())
    assert w.run() == 0


def test_chunked_replay_never_double_counts(spark, tmp_path):
    """r8 review finding (high): the applied_through marker must never
    REGRESS under a governor-CHUNKED replay. Each committed chunk records
    its own end version; a plain overwrite would drop the floor from 6 to
    2 after the first chunk of a rebuild, so the SECOND chunk's
    ``v0 < floor`` check reads false and the additive fast path adds
    delta(2..4) onto stored values that already include history through 6
    — double-counted sums for every group untouched by chunk 1.
    ChangeTable._publish now merges the marker element-wise-max, so every
    replayed chunk below the true floor takes the recompute path."""
    import os

    src = ChangeTable.create(
        spark, str(tmp_path / "src"),
        spark.createDataFrame([], ORD).schema, ["oid"],
    )
    path = str(tmp_path / "totals")

    def make_writer(chunked: bool):
        o = Stream.fromChangeTable(src, "o").primaryKeys("oid")
        w = (
            o.groupBy("cid")
            .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
            .writeToPath(path)
        )
        return w.option("maxVersionsPerTrigger", 2) if chunked else w

    def oracle():
        return (
            src.snapshot()
            .groupBy("cid")
            .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
        )

    # 6 insert-only commits, shaped so the bug actually fires: the marker
    # only regresses when a replay chunk COMMITS (a pure no-op chunk never
    # writes it), so group 1 is touched in chunk [0..2] AND again later —
    # its chunk-end value (3.0) differs from its final stored value
    # (103.0), forcing chunk 1 to commit and (pre-fix) drop the floor from
    # 6 to 2. Groups 2 and 3 are each touched ONLY after chunk 1, so their
    # stored values are still ahead when chunks [2..4] / [4..6] read the
    # regressed floor, take the additive fast path, and re-add deltas
    # already present (g2: 4→8, g3: 48→96 pre-fix). Insert-only images
    # keep the additive path eligible throughout.
    for oid, cid, price in [
        (10, 1, 1.0), (11, 1, 2.0),
        (20, 2, 4.0), (21, 1, 100.0),
        (22, 3, 16.0), (23, 3, 32.0),
    ]:
        src.merge(spark.createDataFrame([(oid, cid, price)], ORD))

    w1 = make_writer(chunked=False)
    w1.run()
    assert_same(w1.toDF(), oracle())
    tgt = ChangeTable(spark, path)
    key = next(iter(tgt._meta["applied_through"]))
    assert tgt.applied_through(key) == [6]

    # rebuild request: fresh checkpoint + CHUNKED replay (3 chunks of 2)
    os.remove(os.path.join(path, "_progress.json"))
    w2 = make_writer(chunked=True)
    assert w2.run() >= 3  # replayed in multiple chunks, not skipped
    assert_same(w2.toDF(), oracle())

    # the floor never regressed below the true high-water mark
    tgt2 = ChangeTable(spark, path)
    assert tgt2.applied_through(key) == [6]
    assert w2.run() == 0  # drained; idle re-run applies nothing
    assert_same(w2.toDF(), oracle())


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


def test_rebuild_replays_staged_stages_and_keeps_maintaining(spark, tmp_path):
    """r8 review finding (reproduced): rebuilding a CHAINED pipeline must
    rebuild the staged upstream stage too. The first build binds the
    StagedStream to its staging ChangeTable; a rebuild that treats the
    bound stream as a root (a) never replays the join — out-of-band
    staging corruption survives into the final view — and (b) leaves the
    writer blind to all further source CDC."""
    cust_ct = ChangeTable.create(
        spark, str(tmp_path / "cust"),
        spark.createDataFrame([], CUST).schema, ["id"],
    )
    ord_ct = ChangeTable.create(
        spark, str(tmp_path / "ord"),
        spark.createDataFrame([], ORD).schema, ["oid"],
    )
    path = str(tmp_path / "totals")
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    w = (
        c.join(o, "inner")
        .on(c["id"] == o["cid"])
        .select(c["id"], c["seg"], o["oid"], o["price"])
        .groupBy("seg")
        .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
        .writeToPath(path)
    )

    def oracle():
        C = cust_ct.snapshot().alias("c")
        O = ord_ct.snapshot().alias("o")
        return (
            C.join(O, F.col("c.id") == F.col("o.cid"))
            .groupBy("seg")
            .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
        )

    cust_ct.merge(spark.createDataFrame(
        [(1, "ann", "A"), (2, "bob", "B")], CUST))
    ord_ct.merge(spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, 7.0)], ORD))
    w.run()
    assert_same(w.toDF(), oracle())

    # corrupt the STAGING table out-of-band: a phantom join row under keys
    # no source produces
    staging = ChangeTable(spark, f"{path}__stages/src")
    staging.merge(spark.createDataFrame(
        [(77, "PHANTOM", 777, 1000.0)],
        "id long, seg string, oid long, price double",
    ))
    w.rebuild()
    # the rebuilt pipeline kept BOTH stages and the phantom is gone
    kinds = {type(st).__name__ for st in w.pipeline.stages}
    assert "_JoinStage" in kinds and "_AggStage" in kinds, kinds
    assert_same(w.toDF(), oracle())
    assert w.toDF().where("seg = 'PHANTOM'").isEmpty()

    # the SAME writer object still maintains the view after rebuild()
    ord_ct.merge(spark.createDataFrame([(12, 1, 100.0)], ORD))
    assert w.run() > 0
    assert_same(w.toDF(), oracle())


def test_rebuild_prunes_phantom_on_pure_join_target(spark, tmp_path):
    """r8 review finding (reproduced): _prune_phantoms anti-joined on the
    join target's COMPOSED primary keys while the expected-key frame
    carried only the preserved side's — every rebuild() of a
    join-materialization pipeline raised UNRESOLVED_COLUMN after the full
    replay. The prune now works in each stage's own reconcile key space."""
    cust_ct = ChangeTable.create(
        spark, str(tmp_path / "cust"),
        spark.createDataFrame([], CUST).schema, ["id"],
    )
    ord_ct = ChangeTable.create(
        spark, str(tmp_path / "ord"),
        spark.createDataFrame([], ORD).schema, ["oid"],
    )
    path = str(tmp_path / "pairs")
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    w = (
        c.join(o, "inner")
        .on(c["id"] == o["cid"])
        .select(c["id"], c["seg"], o["oid"], o["price"])
        .writeToPath(path)
    )
    cust_ct.merge(spark.createDataFrame(
        [(1, "ann", "A"), (2, "bob", "B")], CUST))
    ord_ct.merge(spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, 7.0)], ORD))
    w.run()

    tgt = ChangeTable(spark, path)
    tgt.merge(spark.createDataFrame(
        [(99, "PHANTOM", 999, 0.0)],
        "id long, seg string, oid long, price double",
    ))
    w.rebuild()  # raised AnalysisException before the fix

    def oracle():
        C = cust_ct.snapshot().alias("c")
        O = ord_ct.snapshot().alias("o")
        return C.join(O, F.col("c.id") == F.col("o.cid")).select(
            "c.id", "c.seg", "o.oid", "o.price"
        )

    assert_same(w.toDF(), oracle())
    assert w.toDF().where("seg = 'PHANTOM'").isEmpty()


def test_second_writer_over_same_staged_operators_raises(spark, tmp_path):
    """r8 ADVICE: bind_input rebinds a shared StagedStream's change_table
    on every build, so a SECOND writer built over the same operator
    objects would silently redirect the first writer's already-built
    stages to its own staging table. Operator graphs are single-writer —
    the second build must raise, not corrupt."""
    cust_ct = ChangeTable.create(
        spark, str(tmp_path / "cust"),
        spark.createDataFrame([], CUST).schema, ["id"],
    )
    ord_ct = ChangeTable.create(
        spark, str(tmp_path / "ord"),
        spark.createDataFrame([], ORD).schema, ["oid"],
    )
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    agg = (
        c.join(o, "inner")
        .on(c["id"] == o["cid"])
        .select(c["id"], c["seg"], o["oid"], o["price"])
        .groupBy("seg")
        .agg(F.sum("price").alias("total"))
    )
    cust_ct.merge(spark.createDataFrame([(1, "ann", "A")], CUST))
    ord_ct.merge(spark.createDataFrame([(10, 1, 5.0)], ORD))
    w1 = agg.writeToPath(str(tmp_path / "t1"))
    w1.run()
    w2 = agg.writeToPath(str(tmp_path / "t2"))
    with pytest.raises(ValueError, match="already bound"):
        w2.run()
    # the first writer is undisturbed: still bound to ITS staging table
    # and still maintaining
    ord_ct.merge(spark.createDataFrame([(11, 1, 7.0)], ORD))
    w1.run()
    assert {r["total"] for r in w1.toDF().collect()} == {12.0}
