"""The reference's incremental join-type matrix, run differentially.

The reference proves {inner,left,right} combinations to depth 3 with 18
dedicated notebook tests (reference RunTests.py:29-54, e.g.
JoinTestRightRightLeft, JoinTestLeftRightLeft), each comparing the
incrementally-maintained gold table against a batch recompute of the final
snapshots (reference tests/JoinTestRightRightLeft.py:28-46). This suite is
the same oracle, parametrized: every depth-2 combination (9) and the six
depth-3 mixes the reference ships, driven through an insert / update /
FK-move / delete workload, plus the agg↔join interleaving analog of
AggsTestRightGroupByInnerGroupByMax.

The nullable-key composition logic (operators/joins.py compose_keys) is
exactly where the reference is subtlest (elzyme/joins.py:584-744); these
topologies exercise every preserved-side/nullable-side mix of it.
"""

import pyspark.sql.functions as F
import pytest

from streamjoin_spark import Stream
from streamjoin_spark.changelog import ChangeTable

from tests.test_incremental import assert_same

CUST = "id long, name string, seg string"
ORD = "oid long, cid long, price double"
ITEM = "iid long, oid long, qty long"
SHIP = "sid long, iid long, loc string"

HOWS = ("inner", "left", "right")


def _ct(spark, tmp_path, name, schema, pk):
    return ChangeTable.create(
        spark, str(tmp_path / name), spark.createDataFrame([], schema).schema, [pk]
    )


def _tables(spark, tmp_path, depth3=False):
    ts = {
        "c": _ct(spark, tmp_path, "c", CUST, "id"),
        "o": _ct(spark, tmp_path, "o", ORD, "oid"),
        "i": _ct(spark, tmp_path, "i", ITEM, "iid"),
    }
    if depth3:
        ts["s"] = _ct(spark, tmp_path, "s", SHIP, "sid")
    return ts


def _streams(ts):
    st = {
        "c": Stream.fromChangeTable(ts["c"], "c").primaryKeys("id"),
        "o": Stream.fromChangeTable(ts["o"], "o").primaryKeys("oid"),
        "i": Stream.fromChangeTable(ts["i"], "i").primaryKeys("iid"),
    }
    if "s" in ts:
        st["s"] = Stream.fromChangeTable(ts["s"], "s").primaryKeys("sid")
    return st


def _chain(st, hows):
    """c ⋈ o ⋈ i (⋈ s) with the given join types; conditions reference the
    inner streams directly (exercising lineage binding at every stage)."""
    b = st["c"].join(st["o"], hows[0]).on(st["c"]["id"] == st["o"]["cid"])
    b = b.join(st["i"], hows[1]).on(st["o"]["oid"] == st["i"]["oid"])
    if len(hows) > 2:
        b = b.join(st["s"], hows[2]).on(st["i"]["iid"] == st["s"]["iid"])
    return b


def _workload(spark, ts, w, build):
    """Shared CDC workload: base load with orphans at every level, then
    updates + FK moves (including onto a previously-orphaned parent), then
    deletes at every level. After each commit the incrementally-maintained
    target must equal the batch twin recomputed on the final snapshots."""
    def check():
        assert_same(w.toDF(), build().toDF())

    # commit 1: base. c3 has no orders; order 12 is an orphan (cid 99);
    # item 102 is an orphan (oid 77)
    ts["c"].merge(spark.createDataFrame(
        [(1, "ann", "A"), (2, "bob", "B"), (3, "cyd", "A")], CUST))
    ts["o"].merge(spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, 7.0), (12, 99, 1.0)], ORD))
    ts["i"].merge(spark.createDataFrame(
        [(100, 10, 3), (101, 11, 4), (102, 77, 9)], ITEM))
    if "s" in ts:
        ts["s"].merge(spark.createDataFrame(
            [(1000, 100, "NY"), (1001, 101, "SF"), (1002, 999, "LA")], SHIP))
    w.run()
    check()

    # commit 2: update + FK moves — order 10 re-parents 1→2, orphan item 102
    # attaches to order 10, new item lands on the orphan order 12
    ts["c"].merge(spark.createDataFrame([(1, "ann2", "B")], CUST))
    ts["o"].merge(spark.createDataFrame([(10, 2, 5.5)], ORD))
    ts["i"].merge(spark.createDataFrame([(102, 10, 8), (103, 12, 2)], ITEM))
    if "s" in ts:
        ts["s"].merge(spark.createDataFrame(
            [(1002, 102, "LA"), (1003, 103, "TX")], SHIP))
    w.run()
    check()

    # commit 3: deletes at every level (cascade + null-transition coverage)
    ts["i"].delete_where(F.col("iid") == 101)
    ts["o"].delete_where(F.col("oid") == 11)
    ts["c"].delete_where(F.col("id") == 3)
    if "s" in ts:
        ts["s"].delete_where(F.col("sid") == 1000)
    w.run()
    check()

    # drained: nothing outstanding
    assert w.run() == 0


@pytest.mark.parametrize("h1", HOWS)
@pytest.mark.parametrize("h2", HOWS)
def test_join_matrix_depth2(spark, tmp_path, h1, h2):
    ts = _tables(spark, tmp_path)

    def build():
        return _chain(_streams(ts), (h1, h2))

    w = build().writeToPath(str(tmp_path / "out"))
    _workload(spark, ts, w, build)


# the six depth-3 mixes the reference ships (RunTests.py:40-46)
DEPTH3 = [
    ("inner", "inner", "inner"),
    ("left", "right", "inner"),
    ("inner", "inner", "left"),
    ("right", "right", "left"),
    ("left", "inner", "right"),
    ("left", "right", "left"),
]


@pytest.mark.parametrize("hows", DEPTH3, ids=["".join(h[0] for h in c) for c in DEPTH3])
def test_join_matrix_depth3(spark, tmp_path, hows):
    ts = _tables(spark, tmp_path, depth3=True)

    def build():
        return _chain(_streams(ts), hows)

    w = build().writeToPath(str(tmp_path / "out"))
    _workload(spark, ts, w, build)


def test_right_groupby_join_groupby_max(spark, tmp_path):
    """Agg↔join interleaving (reference AggsTestRightGroupByInnerGroupByMax):
    right join → groupBy(sum) → inner join → groupBy(max), four incremental
    stages deep, converging under update / FK-move / delete."""
    ts = _tables(spark, tmp_path)

    def build():
        st = _streams(ts)
        per_cust = (
            st["c"].join(st["o"], "right")
            .on(st["c"]["id"] == st["o"]["cid"])
            .groupBy("cid")
            .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
        )
        staged = per_cust.stage("per_cust")
        c2 = Stream.fromChangeTable(ts["c"], "c2").primaryKeys("id")
        return (
            staged.join(c2, "inner")
            .on(staged["cid"] == c2["id"])
            .groupBy("seg")
            .agg(F.max("total").alias("max_total"), F.sum("n").alias("n_orders"))
        )

    w = build().writeToPath(str(tmp_path / "seg_max"))

    ts["c"].merge(spark.createDataFrame(
        [(1, "ann", "A"), (2, "bob", "B"), (3, "cyd", "A")], CUST))
    ts["o"].merge(spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, 7.0), (12, 1, 2.0), (13, 3, 9.0)], ORD))
    w.run()
    assert_same(w.toDF(), build().toDF())

    # retract the max within seg A (order 13 price drops) + FK move
    ts["o"].merge(spark.createDataFrame([(13, 3, 1.0), (11, 1, 7.0)], ORD))
    w.run()
    assert_same(w.toDF(), build().toDF())

    # delete customer 2 (group vanish through both aggs)
    ts["c"].delete_where(F.col("id") == 2)
    ts["o"].delete_where(F.col("oid") == 10)
    w.run()
    assert_same(w.toDF(), build().toDF())
