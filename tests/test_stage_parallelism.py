"""Level-parallel stage draining (writer option ``stageParallelism`` — the
reference's per-query fair-scheduler pools, elzyme/streams.py:353-359).

A diamond topology (two independent join branches feeding a final join)
must place the branches in one topological level, drain them concurrently,
and still converge to the batch twin — bit-for-bit the same final state as
the serial drain, because every stage's slice math is identical; only job
submission overlaps.
"""

import pytest

from streamjoin_spark import Stream
from streamjoin_spark.changelog import ChangeTable

from .test_incremental import assert_same, c_rows, cust_ct, o_rows, ord_ct

ITEM = "iid long, oid long, qty long"
PAY = "pid long, piid long, amt double"


@pytest.fixture()
def item_ct(spark, tmp_path):
    return ChangeTable.create(
        spark, str(tmp_path / "item"), spark.createDataFrame([], ITEM).schema, ["iid"]
    )


@pytest.fixture()
def pay_ct(spark, tmp_path):
    return ChangeTable.create(
        spark, str(tmp_path / "pay"), spark.createDataFrame([], PAY).schema, ["pid"]
    )


def make_diamond(cust_ct, ord_ct, item_ct, pay_ct):
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    i = Stream.fromChangeTable(item_ct, "i").primaryKeys("iid")
    p = Stream.fromChangeTable(pay_ct, "p").primaryKeys("pid")
    b1 = c.join(o, "inner").on(c["id"] == o["cid"])
    b2 = i.join(p, "inner").on(i["iid"] == p["piid"])
    return b1.join(b2.stage("b2"), "inner").onKeys("oid")


def seed(spark, cust_ct, ord_ct, item_ct, pay_ct):
    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 2, 7.0)]))
    item_ct.merge(spark.createDataFrame(
        [(100, 10, 3), (101, 11, 4)], ITEM))
    pay_ct.merge(spark.createDataFrame(
        [(900, 100, 9.5), (901, 101, 2.5)], PAY))


def test_diamond_levels_and_parallel_convergence(
    spark, tmp_path, cust_ct, ord_ct, item_ct, pay_ct
):
    seed(spark, cust_ct, ord_ct, item_ct, pay_ct)
    w = (
        make_diamond(cust_ct, ord_ct, item_ct, pay_ct)
        .writeToPath(str(tmp_path / "out"))
        .option("stageParallelism", 2)
    )
    # the two branch groups are independent → same (first) level; the
    # final join waits for both
    levels = w.pipeline._levels()
    assert [len(level) for level in levels] == [2, 1]
    w.run()
    assert_same(
        w.toDF(), make_diamond(cust_ct, ord_ct, item_ct, pay_ct).toDF()
    )

    # CDC on both branches (update + insert + delete) drains in parallel
    # and still converges
    ord_ct.merge(o_rows(spark, [(10, 2, 6.0), (12, 1, 3.0)]))
    pay_ct.merge(spark.createDataFrame([(902, 100, 4.0)], PAY))
    item_ct.delete_where("iid = 101")
    w.run()
    assert_same(
        w.toDF(), make_diamond(cust_ct, ord_ct, item_ct, pay_ct).toDF()
    )


def test_parallel_equals_serial_state(
    spark, tmp_path, cust_ct, ord_ct, item_ct, pay_ct
):
    """Same pipeline drained serially and in parallel lands the identical
    final state (multiset equality of target snapshots)."""
    seed(spark, cust_ct, ord_ct, item_ct, pay_ct)
    ws = (
        make_diamond(cust_ct, ord_ct, item_ct, pay_ct)
        .writeToPath(str(tmp_path / "serial"))
    )
    wp = (
        make_diamond(cust_ct, ord_ct, item_ct, pay_ct)
        .writeToPath(str(tmp_path / "parallel"))
        .option("stageParallelism", 4)
    )
    ws.run()
    wp.run()
    assert_same(ws.toDF(), wp.toDF())


def test_level_groups_overlap_in_wall_clock(
    spark, tmp_path, cust_ct, ord_ct, item_ct, pay_ct
):
    """Concurrency pin (VERDICT r6 task 6): stageParallelism must actually
    OVERLAP the independent level-0 branch drains in wall-clock, not just
    converge — each branch stage's process() is wrapped with a widened
    window (sleep + timestamps); under parallelism=2 the two branches'
    first slices must run concurrently, and under the serial drain the
    same instrumentation must show disjoint intervals (guards against the
    overlap assertion passing vacuously)."""
    import time

    seed(spark, cust_ct, ord_ct, item_ct, pay_ct)

    def instrument(w):
        intervals = {}
        levels = w.pipeline._levels()
        assert [len(level) for level in levels] == [2, 1]
        for gi, group in enumerate(levels[0]):
            for st in group:
                orig = st.process

                def run(orig=orig, gi=gi):
                    t0 = time.monotonic()
                    time.sleep(0.4)  # widen the window: sleep ≫ scheduling jitter
                    out = orig()
                    intervals.setdefault(gi, []).append((t0, time.monotonic()))
                    return out

                st.process = run
        return intervals

    def first_overlap(intervals):
        (a0, a1), (b0, b1) = intervals[0][0], intervals[1][0]
        return a0 < b1 and b0 < a1

    wp = (
        make_diamond(cust_ct, ord_ct, item_ct, pay_ct)
        .writeToPath(str(tmp_path / "overlap_par"))
        .option("stageParallelism", 2)
    )
    par_iv = instrument(wp)
    wp.run()
    assert first_overlap(par_iv), f"parallel branches did not overlap: {par_iv}"

    ws = make_diamond(cust_ct, ord_ct, item_ct, pay_ct).writeToPath(
        str(tmp_path / "overlap_ser")
    )
    ser_iv = instrument(ws)
    ws.run()
    assert not first_overlap(ser_iv), f"serial drain overlapped: {ser_iv}"
    assert_same(wp.toDF(), ws.toDF())


def test_parallel_drain_through_streaming_start(
    spark, tmp_path, cust_ct, ord_ct, item_ct, pay_ct
):
    """stageParallelism applies in continuous mode too: start() drives each
    trigger through the same level-parallel process_all_available, and the
    diamond converges to the batch twin."""
    seed(spark, cust_ct, ord_ct, item_ct, pay_ct)
    w = (
        make_diamond(cust_ct, ord_ct, item_ct, pay_ct)
        .writeToPath(str(tmp_path / "out_stream"))
        .option("stageParallelism", 2)
    )
    w.trigger(availableNow=True).queryName("diamond_par").start()
    try:
        w.awaitTermination(120)
    finally:
        w.stop()
    assert_same(
        w.toDF(), make_diamond(cust_ct, ord_ct, item_ct, pay_ct).toDF()
    )
