"""Depth-3 chained drain through REAL Structured Streaming triggers.

The reference's deepest topology (RightRightLeft, reference RunTests.py:
29-54) runs as N streaming queries + N-1 staging Delta tables with a 1 GB
per-trigger cap (elzyme/streams.py:128,138,242-314). The pull-mode twin of
this test is tests/test_incremental.py::test_three_stage_chain_incremental;
here the same join → join → agg chain is driven by ``start()`` — a real
``writeStream`` over the root change feeds — exercising:

- the ``maxFilesPerTrigger`` cap on the trigger stream (threaded from the
  writer's options into ``read_change_stream``), so a commit backlog fires
  MULTIPLE microbatch triggers rather than one monster batch;
- the microbatch governor inside each trigger (``maxVersionsPerTrigger``),
  so each slice covers a bounded version range;
- checkpoint recovery mid-chain: stop the query, commit more upstream,
  start a NEW writer over the same path — both the Structured Streaming
  checkpoint (trigger stream) and the per-stage watermarks resume; nothing
  replays, everything converges.
"""

import pyspark.sql.functions as F
import pytest

from streamjoin_spark import Stream
from streamjoin_spark.changelog import ChangeTable

from .test_incremental import assert_same, c_rows, cust_ct, o_rows, ord_ct

ITEM = "iid long, oid long, qty long"


@pytest.fixture()
def item_ct(spark, tmp_path):
    return ChangeTable.create(
        spark, str(tmp_path / "item"), spark.createDataFrame([], ITEM).schema, ["iid"]
    )


def make_chain_writer(cust_ct, ord_ct, item_ct, path):
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    i = Stream.fromChangeTable(item_ct, "i").primaryKeys("iid")
    return (
        c.join(o, "inner")
        .on(c["id"] == o["cid"])
        .join(i, "left")
        .onKeys("oid")
        .groupBy("seg")
        .agg(F.sum("qty").alias("total_qty"), F.count(F.lit(1)).alias("n"))
        .writeToPath(str(path))
        .option("maxFilesPerTrigger", 1)
        .option("maxVersionsPerTrigger", 2)
    )


def chain_oracle(cust_ct, ord_ct, item_ct):
    C = cust_ct.snapshot().alias("c")
    O = ord_ct.snapshot().alias("o")
    I = item_ct.snapshot().alias("i")
    return (
        C.join(O, F.col("c.id") == F.col("o.cid"))
        .join(I, F.col("o.oid") == F.col("i.oid"), "left")
        .groupBy("seg")
        .agg(F.sum("qty").alias("total_qty"), F.count(F.lit(1)).alias("n"))
    )


def test_streaming_chain_depth3_multi_trigger_and_recovery(
    spark, tmp_path, cust_ct, ord_ct, item_ct
):
    path = tmp_path / "chain"
    rows = lambda data: spark.createDataFrame(data, ITEM)

    # a commit backlog BEFORE the query starts: several commits per root
    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B"), (3, "cyd", "A")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 2, 7.0)]))
    ord_ct.merge(o_rows(spark, [(12, 3, 2.0)]))
    item_ct.merge(rows([(100, 10, 3), (101, 10, 4)]))
    item_ct.merge(rows([(102, 11, 9)]))
    item_ct.merge(rows([(103, 12, 1), (104, 12, 6)]))

    w = make_chain_writer(cust_ct, ord_ct, item_ct, path)
    w.trigger(availableNow=True).queryName("chain3").start()
    try:
        w.awaitTermination(120)
        progress = list(w.recentProgress)
    finally:
        w.stop()
    # maxFilesPerTrigger=1 over a 6-commit backlog ⇒ multiple microbatches
    assert len(progress) >= 2, f"expected multi-trigger drain, got {len(progress)}"
    assert_same(w.toDF(), chain_oracle(cust_ct, ord_ct, item_ct))

    # staged tables exist and carry watermarks (mid-chain state is durable)
    stages = w.stageProgress()
    assert len(stages) == 3
    assert all(any(v > 0 for v in st["versions"]) for st in stages)

    # --- recovery: new writer over the same path, more upstream churn ----
    item_ct.merge(rows([(100, 11, 8)]))          # FK move item 100: 10 → 11
    ord_ct.delete_where(F.col("oid") == 11)      # cascades through the chain
    cust_ct.merge(c_rows(spark, [(2, "bob2", "B")]))

    w2 = make_chain_writer(cust_ct, ord_ct, item_ct, path)
    w2.trigger(availableNow=True).start()
    try:
        w2.awaitTermination(120)
    finally:
        w2.stop()
    assert_same(w2.toDF(), chain_oracle(cust_ct, ord_ct, item_ct))

    # nothing outstanding: an immediate pull-mode drain is a no-op
    assert w2.run() == 0
