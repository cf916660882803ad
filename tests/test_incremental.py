"""Incremental IVM runtime: differential convergence tests.

Strategy mirrors the reference's oracle (`compare_dataframes`,
reference tests/SetupInputStream.py:214-227): drive CDC commits into source
ChangeTables, drain the incremental pipeline, and assert the target snapshot
is multiset-equal to the batch twin recomputed on the final snapshots —
including under updates, deletes, FK moves and outer-join null transitions.
"""

import pyspark.sql.functions as F
import pytest

from streamjoin_spark import Stream
from streamjoin_spark.changelog import ChangeTable
from streamjoin_spark.streams import CHANGE_TYPE, DELETE


def assert_same(a, b):
    """Order-insensitive multiset equality (the reference oracle's
    bidirectional exceptAll)."""
    assert sorted(a.columns) == sorted(b.columns)
    cols = sorted(a.columns)
    d1 = a.select(*cols).exceptAll(b.select(*cols))
    d2 = b.select(*cols).exceptAll(a.select(*cols))
    assert d1.count() == 0 and d2.count() == 0, (
        f"mismatch:\n only-incremental={d1.collect()[:5]}\n only-batch={d2.collect()[:5]}"
    )


CUST = "id long, name string, seg string"
ORD = "oid long, cid long, price double"


@pytest.fixture()
def cust_ct(spark, tmp_path):
    return ChangeTable.create(
        spark, str(tmp_path / "cust"), spark.createDataFrame([], CUST).schema, ["id"]
    )


@pytest.fixture()
def ord_ct(spark, tmp_path):
    return ChangeTable.create(
        spark, str(tmp_path / "ord"), spark.createDataFrame([], ORD).schema, ["oid"]
    )


def c_rows(spark, rows):
    return spark.createDataFrame(rows, CUST)


def o_rows(spark, rows):
    return spark.createDataFrame(rows, ORD)


def batch_join(cust_ct, ord_ct, how):
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    b = c.join(o, how).on(c["id"] == o["cid"]) if how != "right" else o.join(
        c, "right"
    ).on(o["cid"] == c["id"])
    return b.toDF()


def make_writer(cust_ct, ord_ct, how, path):
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    if how == "right":
        return o.join(c, "right").on(o["cid"] == c["id"]).writeToPath(str(path))
    return c.join(o, how).on(c["id"] == o["cid"]).writeToPath(str(path))


@pytest.mark.parametrize("how", ["inner", "left", "right"])
def test_join_converges_under_cdc(spark, tmp_path, cust_ct, ord_ct, how):
    w = make_writer(cust_ct, ord_ct, how, tmp_path / f"out_{how}")

    # commit 1: base data (c3 has no orders; o4 is an orphan order)
    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B"), (3, "cyd", "A")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 2, 7.0), (12, 99, 1.0)]))
    w.run()
    assert_same(w.toDF(), batch_join(cust_ct, ord_ct, how))

    # commit 2: update + late order for c3 (null-extension flips to match)
    cust_ct.merge(c_rows(spark, [(1, "ann2", "A")]))
    ord_ct.merge(o_rows(spark, [(13, 3, 9.0)]))
    w.run()
    assert_same(w.toDF(), batch_join(cust_ct, ord_ct, how))

    # commit 3: FK move (order 10 re-parents 1→2) + delete order 11
    ord_ct.merge(o_rows(spark, [(10, 2, 5.5)]))
    ord_ct.delete_where(F.col("oid") == 11)
    w.run()
    assert_same(w.toDF(), batch_join(cust_ct, ord_ct, how))

    # commit 4: delete customer 2 (cascades through join)
    cust_ct.delete_where(F.col("id") == 2)
    w.run()
    assert_same(w.toDF(), batch_join(cust_ct, ord_ct, how))

    # idempotence: nothing new → no commits
    assert w.run() == 0


def test_join_delete_emits_change_feed(spark, tmp_path, cust_ct, ord_ct):
    w = make_writer(cust_ct, ord_ct, "inner", tmp_path / "out")
    cust_ct.merge(c_rows(spark, [(1, "ann", "A")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0)]))
    w.run()
    ord_ct.delete_where(F.col("oid") == 10)
    w.run()
    feed = w.target.read_change_feed()
    assert feed.where(F.col(CHANGE_TYPE) == DELETE).count() == 1
    assert w.toDF().count() == 0


def test_agg_converges_including_max_retraction(spark, tmp_path, ord_ct):
    """Dirty-group re-aggregation is correct where the reference's additive
    delta is documented-wrong: retracting the max (SURVEY.md §4)."""
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    w = (
        o.groupBy("cid")
        .agg(
            F.sum("price").alias("total"),
            F.max("price").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
        .writeToPath(str(tmp_path / "agg"))
    )

    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 1, 9.0), (12, 2, 3.0)]))
    w.run()

    def oracle():
        return (
            ord_ct.snapshot()
            .groupBy("cid")
            .agg(
                F.sum("price").alias("total"),
                F.max("price").alias("mx"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    assert_same(w.toDF(), oracle())

    # retract the max: update 11 down, then delete it entirely
    ord_ct.merge(o_rows(spark, [(11, 1, 4.0)]))
    w.run()
    assert_same(w.toDF(), oracle())
    assert w.toDF().where("cid = 1").collect()[0]["mx"] == 5.0

    ord_ct.delete_where(F.col("oid") == 11)
    w.run()
    assert_same(w.toDF(), oracle())

    # group move: order 12 changes cid 2→1; group 2 must vanish
    ord_ct.merge(o_rows(spark, [(12, 1, 3.0)]))
    w.run()
    assert_same(w.toDF(), oracle())
    assert w.toDF().where("cid = 2").count() == 0


def test_chained_join_then_agg_incremental(spark, tmp_path, cust_ct, ord_ct):
    """Two-stage pipeline: join stage materializes into a staging ChangeTable
    whose change feed drives the agg stage (reference topology,
    elzyme/joins.py:812-859)."""
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    w = (
        c.join(o, "inner")
        .on(c["id"] == o["cid"])
        .groupBy("seg")
        .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
        .writeToPath(str(tmp_path / "seg_totals"))
    )

    def oracle():
        C, O = cust_ct.snapshot().alias("c"), ord_ct.snapshot().alias("o")
        return (
            C.join(O, F.col("c.id") == F.col("o.cid"))
            .groupBy("seg")
            .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
        )

    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 2, 7.0), (12, 1, 2.0)]))
    w.run()
    assert_same(w.toDF(), oracle())

    # customer 1 switches segment A→B: join stage emits update, agg stage
    # must move 7.0 of revenue between groups and delete group A
    cust_ct.merge(c_rows(spark, [(1, "ann", "B")]))
    w.run()
    assert_same(w.toDF(), oracle())
    assert w.toDF().where("seg = 'A'").count() == 0

    ord_ct.delete_where(F.col("oid") == 11)
    w.run()
    assert_same(w.toDF(), oracle())


def test_three_stage_chain_incremental(spark, tmp_path, cust_ct, ord_ct):
    """join → join → agg, three stages deep (the reference's deepest tested
    topology, RunTests.py:29-54)."""
    item_schema = "iid long, oid long, qty long"
    item_ct = ChangeTable.create(
        spark, str(tmp_path / "item"), spark.createDataFrame([], item_schema).schema, ["iid"]
    )
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    i = Stream.fromChangeTable(item_ct, "i").primaryKeys("iid")
    w = (
        c.join(o, "inner")
        .on(c["id"] == o["cid"])
        .join(i, "left")
        .onKeys("oid")
        .groupBy("seg")
        .agg(F.sum("qty").alias("total_qty"), F.count(F.lit(1)).alias("n"))
        .writeToPath(str(tmp_path / "deep"))
    )

    def oracle():
        C = cust_ct.snapshot().alias("c")
        O = ord_ct.snapshot().alias("o")
        I = item_ct.snapshot().alias("i")
        return (
            C.join(O, F.col("c.id") == F.col("o.cid"))
            .join(I, F.col("o.oid") == F.col("i.oid"), "left")
            .groupBy("seg")
            .agg(F.sum("qty").alias("total_qty"), F.count(F.lit(1)).alias("n"))
        )

    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 2, 7.0)]))
    item_ct.merge(spark.createDataFrame([(100, 10, 3), (101, 10, 4)], item_schema))
    w.run()
    assert_same(w.toDF(), oracle())

    item_ct.merge(spark.createDataFrame([(102, 11, 9), (100, 11, 1)], item_schema))
    ord_ct.merge(o_rows(spark, [(10, 2, 5.0)]))
    w.run()
    assert_same(w.toDF(), oracle())

    item_ct.delete_where(F.col("iid") == 101)
    cust_ct.delete_where(F.col("id") == 1)
    w.run()
    assert_same(w.toDF(), oracle())


def test_restart_resumes_from_progress(spark, tmp_path, cust_ct, ord_ct):
    """A fresh writer over the same path picks up the persisted watermarks
    (exactly-once across restarts; reference gets this from the streaming
    checkpoint)."""
    path = tmp_path / "restartable"
    w1 = make_writer(cust_ct, ord_ct, "inner", path)
    cust_ct.merge(c_rows(spark, [(1, "ann", "A")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0)]))
    w1.run()
    v_after = w1.target.version()

    # new writer object, same path — must not reprocess old versions
    w2 = make_writer(cust_ct, ord_ct, "inner", path)
    assert w2.run() == 0
    assert w2.target.version() == v_after

    ord_ct.merge(o_rows(spark, [(11, 1, 6.0)]))
    w2.run()
    assert_same(w2.toDF(), batch_join(cust_ct, ord_ct, "inner"))


def test_streaming_start_drains(spark, tmp_path, cust_ct, ord_ct):
    """Structured Streaming mode: a real query over the root change feeds
    drives the same incremental core."""
    w = make_writer(cust_ct, ord_ct, "inner", tmp_path / "streamed")
    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 2, 7.0)]))
    w.trigger(availableNow=True).start()
    try:
        w.awaitAllProcessed()
    finally:
        w.stop()
    assert_same(w.toDF(), batch_join(cust_ct, ord_ct, "inner"))


def test_foreach_batch_user_sink(spark, tmp_path, cust_ct, ord_ct):
    """S7: user-supplied sink receives the recomputed affected slice per
    batch (reference foreachBatch, elzyme/joins.py:536-554)."""
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    seen = []
    w = (
        c.join(o, "inner")
        .on(c["id"] == o["cid"])
        .foreachBatch(lambda df, bid: seen.append((bid, df.count())))
    )
    cust_ct.merge(c_rows(spark, [(1, "ann", "A")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 1, 6.0)]))
    w.run()
    assert seen == [(0, 2)]
    ord_ct.merge(o_rows(spark, [(12, 1, 7.0)]))
    w.run()
    # slice = all current rows for affected customer 1 (3 orders now)
    assert seen[-1] == (1, 3)


def test_additive_fast_path_converges(spark, tmp_path, ord_ct):
    """sum/count aggs with a count column take the plus/minus additive path
    (reference elzyme/aggs.py:44-59) — O(delta), no source rescan — and
    still converge under updates, deletes, and group vanish."""
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    w = (
        o.groupBy("cid")
        .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
        .writeToPath(str(tmp_path / "agg_add"))
    )

    def oracle():
        return (
            ord_ct.snapshot()
            .groupBy("cid")
            .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
        )

    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 1, 9.5), (12, 2, 3.0)]))
    w.run()
    assert w.pipeline.stages[-1].additive is True
    assert_same(w.toDF(), oracle())

    # update (retraction + addition) and a cross-group move
    ord_ct.merge(o_rows(spark, [(11, 1, 4.5), (12, 1, 3.0)]))
    w.run()
    assert_same(w.toDF(), oracle())
    assert w.toDF().where("cid = 2").count() == 0   # group 2 vanished

    # delete the whole remaining group 1 → table empties
    ord_ct.delete_where(F.col("cid") == 1)
    w.run()
    assert_same(w.toDF(), oracle())
    assert w.toDF().count() == 0


def test_reduce_recipe_in_additive_path(spark, tmp_path, ord_ct):
    """A2: user .reduce() recipes drive the merge for non-sum columns
    (reference elzyme/aggs.py:100-110) — here a running max via greatest,
    valid while values only grow."""
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    w = (
        o.groupBy("cid")
        .agg(F.max("price").alias("mx"), F.count(F.lit(1)).alias("n"))
        .reduce(
            "mx",
            update=lambda u, d: F.greatest(u, d),
            delta_update=lambda p, m: p,
        )
        .writeToPath(str(tmp_path / "agg_reduce"))
    )
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 1, 9.0)]))
    w.run()
    assert w.pipeline.stages[-1].additive is True
    ord_ct.merge(o_rows(spark, [(12, 1, 12.0)]))   # grow-only workload
    w.run()
    got = w.toDF().collect()[0]
    assert got["mx"] == 12.0 and got["n"] == 3


def test_sum_null_semantics_incremental(spark, tmp_path, ord_ct):
    """SQL NULL edges of additive SUM: a group whose inputs are all NULL has
    SUM = NULL (not 0), both when the group is born that way and when a
    retraction removes its last non-null value. The reference's COALESCE-to-0
    delta (elzyme/aggs.py:76) gets both wrong; here the first is handled by
    NULL-propagating deltas and the second by routing retraction-touched
    groups to dirty-group recomputation."""
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    w = (
        o.groupBy("cid")
        .agg(F.sum("price").alias("total"), F.count("price").alias("n_priced"))
        .writeToPath(str(tmp_path / "agg_null"))
    )

    def oracle():
        return (
            ord_ct.snapshot()
            .groupBy("cid")
            .agg(F.sum("price").alias("total"), F.count("price").alias("n_priced"))
        )

    # group 1: mixed null/non-null; group 2: born all-NULL (additive path)
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 1, None), (12, 2, None)]))
    w.run()
    assert w.pipeline.stages[-1].additive is True
    assert_same(w.toDF(), oracle())
    got = {r.cid: (r.total, r.n_priced) for r in w.toDF().collect()}
    assert got[1] == (5.0, 1)
    assert got[2] == (None, 0)   # present with NULL sum, not dropped, not 0

    # retraction removes group 1's only non-null value → SUM back to NULL
    ord_ct.delete_where(F.col("oid") == 10)
    w.run()
    assert_same(w.toDF(), oracle())
    got = {r.cid: (r.total, r.n_priced) for r in w.toDF().collect()}
    assert got[1] == (None, 0)

def test_chained_on_condition_refs_inner_stream(spark, tmp_path, cust_ct, ord_ct):
    """A chained .on() condition referencing an inner (pre-staging) stream
    must resolve in incremental mode too: the probe leg binds each side's
    full lineage exactly like the batch path's _execute."""
    item_schema = "iid long, oid long, qty long"
    item_ct = ChangeTable.create(
        spark, str(tmp_path / "item2"),
        spark.createDataFrame([], item_schema).schema, ["iid"],
    )
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    i = Stream.fromChangeTable(item_ct, "i").primaryKeys("iid")
    w = (
        c.join(o, "inner")
        .on(c["id"] == o["cid"])
        .join(i, "inner")
        .on(o["oid"] == i["oid"])   # o is nested inside the staged left side
        .writeToPath(str(tmp_path / "lineage_out"))
    )

    def oracle():
        C = cust_ct.snapshot().alias("c")
        O = ord_ct.snapshot().alias("o")
        I = item_ct.snapshot().alias("i")
        return (
            C.join(O, F.col("c.id") == F.col("o.cid"))
            .join(I, F.col("o.oid") == F.col("i.oid"))
            .select(
                "id", "name", "seg", F.col("o.oid").alias("oid"),
                "cid", "price", "iid", "qty",
            )
        )

    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 2, 7.0)]))
    item_ct.merge(spark.createDataFrame([(100, 10, 3), (101, 11, 4)], item_schema))
    w.run()
    assert_same(w.toDF(), oracle())

    # the probe leg fires on a Δ of the *other* side (items) specifically
    item_ct.merge(spark.createDataFrame([(102, 10, 9)], item_schema))
    w.run()
    assert_same(w.toDF(), oracle())


def test_foreach_batch_restart_resumes(spark, tmp_path, cust_ct, ord_ct):
    """foreachBatch with a checkpointLocation persists progress + batch id:
    a fresh writer over the same checkpoint neither replays delivered
    batches nor restarts batch ids at 0."""
    ckpt = str(tmp_path / "fb_ckpt")

    def build(sink):
        c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
        o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
        return (
            c.join(o, "inner")
            .on(c["id"] == o["cid"])
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
        )

    seen1 = []
    w1 = build(lambda df, bid: seen1.append((bid, df.count())))
    cust_ct.merge(c_rows(spark, [(1, "ann", "A")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 1, 6.0)]))
    w1.run()
    assert seen1 == [(0, 2)]

    # restart: nothing outstanding → the sink must NOT be re-invoked
    seen2 = []
    w2 = build(lambda df, bid: seen2.append((bid, df.count())))
    assert w2.run() == 0
    assert seen2 == []

    # new data resumes with the persisted batch id
    ord_ct.merge(o_rows(spark, [(12, 1, 7.0)]))
    w2.run()
    assert seen2 == [(1, 3)]


def test_count_distinct_not_additive(spark, tmp_path, ord_ct):
    """DISTINCT aggregates must route to dirty-group recomputation: Spark 4's
    Column repr drops the DISTINCT qualifier (str(F.countDistinct('x')) ==
    'count(x)'), so a repr-based additive classifier silently double-counts
    values seen in more than one insert-only batch. Structural detection via
    the ColumnNode's isDistinct flag keeps this exact."""
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    w = (
        o.groupBy("cid")
        .agg(
            F.countDistinct("price").alias("n_prices"),
            F.count(F.lit(1)).alias("n"),
        )
        .writeToPath(str(tmp_path / "agg_distinct"))
    )

    def oracle():
        return (
            ord_ct.snapshot()
            .groupBy("cid")
            .agg(
                F.countDistinct("price").alias("n_prices"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    # batch 1 inserts prices {5.0, 9.0}; batch 2 inserts {5.0, 3.0} — a
    # per-batch-additive distinct count would report 4 instead of 3
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 1, 9.0)]))
    w.run()
    assert w.pipeline.stages[-1].additive is False
    assert_same(w.toDF(), oracle())

    ord_ct.merge(o_rows(spark, [(12, 1, 5.0), (13, 1, 3.0)]))
    w.run()
    assert_same(w.toDF(), oracle())
    assert w.toDF().collect()[0]["n_prices"] == 3

    ord_ct.delete_where(F.col("oid") == 11)
    w.run()
    assert_same(w.toDF(), oracle())


def test_to_transform_receives_side_frames(spark, tmp_path, cust_ct, ord_ct):
    """P4: a 3-arg .to() transform receives (joined, left, right) — the
    reference hands the side frames to transformFunc (elzyme/joins.py:
    507-525). Batch and incremental must agree."""

    def enrich(joined, left, right):
        mx = right.groupBy("cid").agg(F.max("price").alias("cid_max"))
        return joined.join(F.broadcast(mx), "cid", "left")

    def build():
        c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
        o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
        return c.join(o, "inner").on(c["id"] == o["cid"]).to(enrich)

    w = build().writeToPath(str(tmp_path / "to3"))
    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 1, 9.0), (12, 2, 3.0)]))
    w.run()
    assert_same(w.toDF(), build().toDF())
    got = {r.oid: r.cid_max for r in w.toDF().collect()}
    assert got[10] == 9.0 and got[12] == 3.0

    # retract the max: the transform's right-frame aggregate must refresh
    ord_ct.delete_where(F.col("oid") == 11)
    w.run()
    assert_same(w.toDF(), build().toDF())
    assert {r.oid: r.cid_max for r in w.toDF().collect()}[10] == 5.0


def test_partitioned_staging_rewrite_prunes(spark, tmp_path, cust_ct, ord_ct):
    """Per-stage .partitionBy() aligns an intermediate staging table's
    copy-on-write buckets with a domain column (reference join-aligned
    merge pruning, elzyme/joins.py:676-682): a commit touching only one
    partition value rewrites only that value's bucket."""
    def build():
        c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
        o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
        return (
            c.join(o, "inner").on(c["id"] == o["cid"]).partitionBy("seg")
            .groupBy("seg")
            .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
        )

    w = build().writeToPath(str(tmp_path / "pruned"))
    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 2, 7.0)]))
    w.run()
    assert_same(w.toDF(), build().toDF())

    stage_ct = w.pipeline.stages[0].target
    assert stage_ct.partition_by == ("seg",)
    m1 = dict(stage_ct._manifest(stage_ct.version()))

    # seg-A-only change (customer 1 is in A)
    ord_ct.merge(o_rows(spark, [(12, 1, 9.0)]))
    w.run()
    assert_same(w.toDF(), build().toDF())
    m2 = dict(stage_ct._manifest(stage_ct.version()))

    buckets = {
        r["seg"]: r["p"]
        for r in spark.createDataFrame([("A",), ("B",)], "seg string")
        .select("seg", F.pmod(F.xxhash64("seg"), F.lit(stage_ct.n_buckets)).alias("p"))
        .collect()
    }
    changed = {p for p in set(m1) | set(m2) if m1.get(p) != m2.get(p)}
    assert str(buckets["A"]) in changed
    if buckets["A"] != buckets["B"]:
        assert str(buckets["B"]) not in changed, (
            "untouched partition's bucket was rewritten"
        )


def test_fromtable_streams_change_feed(spark, tmp_path):
    """S2/S6: table-name addressing end to end (reference Stream.fromTable +
    writeToTable, elzyme/streams.py:136-144, elzyme/joins.py:878-879).
    fromTable on a registered name returns the live incremental stream;
    writeToTable registers the target so it too can be streamed by name."""
    cust_ct = ChangeTable.create(
        spark, str(tmp_path / "cust_ft"),
        spark.createDataFrame([], CUST).schema, ["id"], name="cust_ft",
    )
    ord_ct = ChangeTable.create(
        spark, str(tmp_path / "ord_ft"),
        spark.createDataFrame([], ORD).schema, ["oid"], name="ord_ft",
    )

    c = Stream.fromTable(spark, "cust_ft").primaryKeys("id")
    o = Stream.fromTable(spark, "ord_ft").primaryKeys("oid")
    assert c.change_table is not None, "registered name must stream CDF"
    w = c.join(o, "inner").on(c["id"] == o["cid"]).writeToTable("joined_ft")

    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 2, 7.0)]))
    w.run()
    assert_same(w.toDF(), batch_join(cust_ct, ord_ct, "inner"))

    # same CDC workload as the path-addressed test: update, FK move, delete
    cust_ct.merge(c_rows(spark, [(1, "ann2", "A")]))
    ord_ct.merge(o_rows(spark, [(10, 2, 5.5)]))
    w.run()
    assert_same(w.toDF(), batch_join(cust_ct, ord_ct, "inner"))

    ord_ct.delete_where(F.col("oid") == 11)
    w.run()
    assert_same(w.toDF(), batch_join(cust_ct, ord_ct, "inner"))

    # the sink itself is now addressable by name, as a live stream
    j = Stream.fromTable(spark, "joined_ft")
    assert j.change_table is not None
    assert j.static().count() == w.toDF().count()


def test_incremental_union_converges(spark, tmp_path, cust_ct, ord_ct):
    """U1: .union() on a live stream in incremental mode (reference
    elzyme/joins.py:861-865). The leg is an extra root feed maintaining its
    own (disjoint) key-space of the target; changes on either the join
    sides or the union leg converge independently."""
    leg_schema = "id long, name string, seg string, oid long, cid long, price double"
    leg_ct = ChangeTable.create(
        spark, str(tmp_path / "leg"),
        spark.createDataFrame([], leg_schema).schema, ["id", "oid"],
    )

    def build():
        c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
        o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
        leg = Stream.fromChangeTable(leg_ct, "leg").primaryKeys("id", "oid")
        return c.join(o, "inner").on(c["id"] == o["cid"]).union(leg)

    w = build().writeToPath(str(tmp_path / "union_out"))

    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 2, 7.0)]))
    leg_ct.merge(spark.createDataFrame(
        [(100, "ext", "X", 900, 100, 1.5)], leg_schema))
    w.run()
    assert_same(w.toDF(), build().toDF())

    # leg-only change (update + insert)
    leg_ct.merge(spark.createDataFrame(
        [(100, "ext2", "X", 900, 100, 2.5), (101, "ext3", "Y", 901, 101, 3.0)],
        leg_schema))
    w.run()
    assert_same(w.toDF(), build().toDF())

    # join-side-only change must not disturb leg rows
    ord_ct.merge(o_rows(spark, [(10, 2, 9.0)]))
    w.run()
    assert_same(w.toDF(), build().toDF())

    # leg delete propagates
    leg_ct.delete_where(F.col("id") == 100)
    w.run()
    assert_same(w.toDF(), build().toDF())
    assert w.run() == 0


def test_theta_inequality_join_converges(spark, tmp_path, cust_ct, ord_ct):
    """Theta condition with an inequality leg: updates move rows across the
    predicate threshold in both directions; incremental must track the
    appearing/disappearing matches exactly."""

    def build():
        c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
        o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
        return c.join(o, "inner").on((c["id"] == o["cid"]) & (o["price"] > 4.0))

    w = build().writeToPath(str(tmp_path / "theta"))

    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 1, 3.0), (12, 2, 9.0)]))
    w.run()
    assert_same(w.toDF(), build().toDF())
    assert w.toDF().count() == 2  # 11 fails the price predicate

    # price crosses the threshold upward (11 appears) and downward (12 drops)
    ord_ct.merge(o_rows(spark, [(11, 1, 6.0), (12, 2, 1.0)]))
    w.run()
    assert_same(w.toDF(), build().toDF())

    # delete a matching order; update a customer to refresh its slice
    ord_ct.delete_where(F.col("oid") == 10)
    cust_ct.merge(c_rows(spark, [(1, "ann2", "A")]))
    w.run()
    assert_same(w.toDF(), build().toDF())


def test_randomized_cdc_fuzz(spark, tmp_path, cust_ct, ord_ct):
    """Seeded randomized CDC workload: ten commits of mixed inserts /
    updates / FK moves / deletes (including orphan FKs and whole-group
    deletions) through a left-join → aggregation pipeline, converging to
    the batch twin after every drain. Complements the systematic matrix
    with operation *interleavings* no hand-written case covers."""
    import random

    rnd = random.Random(42)
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    w = (
        c.join(o, "left")
        .on(c["id"] == o["cid"])
        .groupBy("seg")
        .agg(
            F.sum("price").alias("total"),
            F.count("price").alias("n_priced"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .writeToPath(str(tmp_path / "fuzz"))
    )

    def oracle():
        C, O = cust_ct.snapshot().alias("c"), ord_ct.snapshot().alias("o")
        return (
            C.join(O, F.col("c.id") == F.col("o.cid"), "left")
            .groupBy("seg")
            .agg(
                F.sum("price").alias("total"),
                F.count("price").alias("n_priced"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )

    segs = ["A", "B", "C"]
    custs, orders = {}, {}
    next_c, next_o = 1, 100
    for step in range(10):
        crows = []
        for _ in range(rnd.randint(0, 3)):
            if not custs or rnd.random() < 0.5:
                custs[next_c] = rnd.choice(segs)
                crows.append((next_c, f"c{next_c}", custs[next_c]))
                next_c += 1
            else:
                k = rnd.choice(list(custs))
                custs[k] = rnd.choice(segs)
                crows.append((k, f"c{k}v{step}", custs[k]))
        if crows:
            cust_ct.merge(c_rows(spark, crows))
        if custs and rnd.random() < 0.25:
            k = rnd.choice(list(custs))
            del custs[k]
            cust_ct.delete_where(F.col("id") == k)

        orows = []
        for _ in range(rnd.randint(0, 4)):
            cid = rnd.choice(list(custs) + [999]) if custs else 999
            price = None if rnd.random() < 0.15 else round(rnd.uniform(1, 50), 2)
            if not orders or rnd.random() < 0.6:
                orders[next_o] = cid
                orows.append((next_o, cid, price))
                next_o += 1
            else:
                k = rnd.choice(list(orders))
                orders[k] = cid                     # FK move
                orows.append((k, cid, price))
        if orows:
            ord_ct.merge(o_rows(spark, orows))
        if orders and rnd.random() < 0.25:
            k = rnd.choice(list(orders))
            del orders[k]
            ord_ct.delete_where(F.col("oid") == k)

        w.run()
        # round the double SUM on both sides: stored+delta association vs a
        # fresh re-sum differ at the last ulp (Spark's own partial-agg merge
        # order is nondeterministic there) — 6 dp is far above ulp noise and
        # far below the 2 dp data resolution
        r6 = lambda df: df.withColumn("total", F.round("total", 6))
        assert_same(r6(w.toDF()), r6(oracle()))


def test_reference_api_parity_surface(spark, tmp_path, cust_ct, ord_ct):
    """Reference API spellings work end to end: explicit stagingPath on a
    chained join (elzyme/joins.py:867-873), Stream accessors
    (setName/containsColumn/getPrimaryKeys/getSequenceColumns), and the
    query-control surface (isActive/awaitAllProcessedAndStop)."""
    item_schema = "iid long, oid long, qty long"
    item_ct = ChangeTable.create(
        spark, str(tmp_path / "item_ap"),
        spark.createDataFrame([], item_schema).schema, ["iid"],
    )
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id").setName("cust")
    assert c.name == "cust"
    assert c.containsColumn("seg") and not c.containsColumn("nope")
    assert c.getPrimaryKeys() == ("id",)
    assert c.getSequenceColumns() == ()

    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    i = Stream.fromChangeTable(item_ct, "i").primaryKeys("iid")
    custom_stage = str(tmp_path / "my_stage_loc")
    w = (
        c.join(o, "inner").on(c["id"] == o["cid"])
        .join(i, "left", stagingPath=custom_stage)
        .on(o["oid"] == i["oid"])
        .writeToPath(str(tmp_path / "ap_out"))
    )
    cust_ct.merge(c_rows(spark, [(1, "ann", "A")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0)]))
    item_ct.merge(spark.createDataFrame([(100, 10, 2)], item_schema))
    w.run()
    assert ChangeTable.exists(custom_stage), "user stagingPath not honored"
    assert w.toDF().count() == 1

    # streaming query-control spellings
    assert w.isActive() is False
    w.trigger(availableNow=True).start()
    w.awaitAllProcessedAndStop()
    assert w.isActive() is False


def test_writer_generated_columns(spark, tmp_path, cust_ct, ord_ct):
    """M4 analog end to end: writeToPath(generated_columns=...) adds a
    derived column to the incremental target, recomputed on every
    affected-slice rewrite and usable as the partition column."""
    w = make_writer_gen(cust_ct, ord_ct, tmp_path / "gen_out")
    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 2, 25.0)]))
    w.run()
    got = {r.oid: r.price_band for r in w.toDF().collect()}
    assert got == {10: 0, 11: 2}
    assert w.target.partition_by == ("price_band",)

    ord_ct.merge(o_rows(spark, [(10, 1, 17.0)]))   # band 0 → 1
    w.run()
    assert {r.oid: r.price_band for r in w.toDF().collect()} == {10: 1, 11: 2}


def make_writer_gen(cust_ct, ord_ct, path):
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    return (
        c.join(o, "inner")
        .on(c["id"] == o["cid"])
        .writeToPath(
            str(path),
            partition_by=("price_band",),
            generated_columns={"price_band": "CAST(floor(price / 10) AS INT)"},
        )
    )


def test_stage_progress_surface(spark, tmp_path, cust_ct, ord_ct):
    """stageProgress() reports each stage's persisted watermarks (pull-mode
    composite progress, C4)."""
    w = make_writer(cust_ct, ord_ct, "inner", tmp_path / "prog")
    cust_ct.merge(c_rows(spark, [(1, "ann", "A")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0)]))
    w.run()
    prog = w.stageProgress()
    assert len(prog) == 1
    assert prog[0]["stage"] == "JoinStage"
    assert prog[0]["versions"] == [1, 1]


def test_randomized_union_agg_fuzz(spark, tmp_path, cust_ct, ord_ct):
    """Seeded randomized CDC over the deepest union topology: (customer ⋈
    orders) ∪ external leg → groupBy aggregation. Interleaves inserts,
    updates, FK moves and deletes on all THREE roots, converging to the
    batch twin after every drain — hardens the union-leg slice scoping
    the systematic U1 test can't reach."""
    import random

    rnd = random.Random(7)
    leg_schema = "id long, name string, seg string, oid long, cid long, price double"
    leg_ct = ChangeTable.create(
        spark, str(tmp_path / "fuzzleg"),
        spark.createDataFrame([], leg_schema).schema, ["id", "oid"],
    )

    def build():
        c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
        o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
        leg = Stream.fromChangeTable(leg_ct, "leg").primaryKeys("id", "oid")
        return (
            c.join(o, "inner").on(c["id"] == o["cid"]).union(leg)
            .groupBy("seg")
            .agg(
                F.sum("price").alias("total"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )

    w = build().writeToPath(str(tmp_path / "fuzz_union_out"))
    segs = ["A", "B", "C"]
    custs, orders, legs = {}, {}, {}
    next_c, next_o, next_l = 1, 100, 1000
    for step in range(8):
        crows = []
        for _ in range(rnd.randint(0, 2)):
            if not custs or rnd.random() < 0.5:
                custs[next_c] = rnd.choice(segs)
                crows.append((next_c, f"c{next_c}", custs[next_c]))
                next_c += 1
            else:
                k = rnd.choice(list(custs))
                custs[k] = rnd.choice(segs)
                crows.append((k, f"c{k}v{step}", custs[k]))
        if crows:
            cust_ct.merge(c_rows(spark, crows))
        if custs and rnd.random() < 0.2:
            k = rnd.choice(list(custs))
            del custs[k]
            cust_ct.delete_where(F.col("id") == k)

        orows = []
        for _ in range(rnd.randint(0, 3)):
            cid = rnd.choice(list(custs) + [999]) if custs else 999
            price = round(rnd.uniform(1, 50), 2)
            if not orders or rnd.random() < 0.6:
                orders[next_o] = cid
                orows.append((next_o, cid, price))
                next_o += 1
            else:
                k = rnd.choice(list(orders))
                orders[k] = cid
                orows.append((k, cid, price))
        if orows:
            ord_ct.merge(o_rows(spark, orows))
        if orders and rnd.random() < 0.2:
            k = rnd.choice(list(orders))
            del orders[k]
            ord_ct.delete_where(F.col("oid") == k)

        lrows = []
        for _ in range(rnd.randint(0, 2)):
            if not legs or rnd.random() < 0.6:
                legs[next_l] = rnd.choice(segs)
                lrows.append((next_l, f"l{next_l}", legs[next_l],
                              next_l + 5000, next_l, round(rnd.uniform(1, 9), 2)))
                next_l += 1
            else:
                k = rnd.choice(list(legs))
                legs[k] = rnd.choice(segs)
                lrows.append((k, f"l{k}v{step}", legs[k],
                              k + 5000, k, round(rnd.uniform(1, 9), 2)))
        if lrows:
            leg_ct.merge(spark.createDataFrame(lrows, leg_schema))
        if legs and rnd.random() < 0.2:
            k = rnd.choice(list(legs))
            del legs[k]
            leg_ct.delete_where(F.col("id") == k)

        w.run()
        r6 = lambda df: df.withColumn("total", F.round("total", 6))
        assert_same(r6(w.toDF()), r6(build().toDF()))


def test_history_of_maintained_view(spark, tmp_path, cust_ct, ord_ct):
    """SCD2 history composes with the IVM runtime: ChangeTable.history() on
    an incrementally-maintained join target yields the view's temporal
    lineage — every version each joined row ever held, updates closing the
    prior interval and the cascade delete closing the last."""
    w = make_writer(cust_ct, ord_ct, "inner", tmp_path / "hist_out")
    cust_ct.merge(c_rows(spark, [(1, "ann", "A")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0)]))
    w.run()                                    # target v1: (10, ann)
    cust_ct.merge(c_rows(spark, [(1, "ann2", "A")]))
    w.run()                                    # target v2: name flows through
    ord_ct.delete_where(F.col("oid") == 10)
    w.run()                                    # target v3: row vanishes
    hist = w.target.history().collect()
    by_from = {r["valid_from"]: r for r in hist}
    assert set(by_from) == {1, 2}
    assert by_from[1]["name"] == "ann" and by_from[1]["valid_to"] == 2
    assert by_from[2]["name"] == "ann2" and by_from[2]["valid_to"] == 3
    assert not any(r["is_current"] for r in hist)   # deleted → no open interval


def test_ignore_deletes_reference_compat(spark, tmp_path, cust_ct, ord_ct):
    """Source-level `.ignoreDeletes()` reproduces the reference's CDF
    behavior (deletes silently skipped at the source, elzyme/streams.py:
    132,142): a deleted upstream row does NOT retract downstream state.
    A later change touching the same preserved key reconciles against the
    snapshot and the stale row finally drops — deferred, not resurrected."""
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid").ignoreDeletes()
    w = c.join(o, "inner").on(c["id"] == o["cid"]).writeToPath(
        str(tmp_path / "compat")
    )
    cust_ct.merge(c_rows(spark, [(1, "ann", "A")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 1, 6.0)]))
    w.run()
    assert w.toDF().count() == 2

    # default mode would retract the joined row; compat mode keeps it stale
    ord_ct.delete_where(F.col("oid") == 11)
    w.run()
    assert w.toDF().where("oid = 11").count() == 1

    # churn on the preserved key → slice recompute vs the (post-delete)
    # snapshot reconciles the stale row away
    cust_ct.merge(c_rows(spark, [(1, "ann2", "A")]))
    w.run()
    assert w.toDF().where("oid = 11").count() == 0
    assert_same(w.toDF(), batch_join(cust_ct, ord_ct, "inner"))


def test_incremental_union_dataframe_shim(spark, tmp_path, cust_ct, ord_ct):
    """Strict-compat: the reference unions a plain DataFrame into a live
    pipeline (elzyme/joins.py:861-865). Incremental mode wraps the static
    frame in a one-commit ChangeTable leg; the pipeline converges with the
    frame's rows present, across later join-side CDC, and across a restart
    (the wrapper is reused, not re-committed)."""
    leg_schema = "id long, name string, seg string, oid long, cid long, price double"
    static_leg = spark.createDataFrame(
        [(100, "ext", "X", 900, 100, 1.5), (101, "ext2", "Y", 901, 101, 2.5)],
        leg_schema,
    )

    def build():
        c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
        o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
        return c.join(o, "inner").on(c["id"] == o["cid"]).union(static_leg)

    w = build().writeToPath(str(tmp_path / "u_df_out"))
    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 2, 7.0)]))
    w.run()
    assert_same(w.toDF(), build().toDF())

    # join-side CDC must not disturb the static leg's rows
    ord_ct.merge(o_rows(spark, [(10, 2, 9.0), (12, 1, 3.0)]))
    w.run()
    assert_same(w.toDF(), build().toDF())

    # restart: rebuild the writer against the same path — the wrapper table
    # is reused (still one commit) and the state is unchanged
    w2 = build().writeToPath(str(tmp_path / "u_df_out"))
    w2.run()
    assert_same(w2.toDF(), build().toDF())
