"""Incremental sketch maintenance through the CDC runtime: HLL registers
as a streaming groupBy(MAX) target — inserts fold in via the additive
runtime, deletes/updates land through dirty-group recompute, and the
maintained register table always equals the batch-recomputed truth."""

import pyspark.sql.functions as F

from streamjoin_spark import Stream
from streamjoin_spark.changelog import ChangeTable
from streamjoin_spark.operators.sketches import hll_registers, hll_row


def _attach(df):
    bucket, rho = hll_row("v", b=5)
    return df.select("id", "g", bucket.alias("bucket"), rho.alias("rho"))


def _registers(df):
    return {
        (r["g"], r["bucket"]): r["rho"]
        for r in hll_registers(df, ["g"], "v", b=5).collect()
    }


def test_incremental_hll_registers_maintained(spark, tmp_path):
    ct = ChangeTable.create(
        spark,
        str(tmp_path / "vals"),
        spark.createDataFrame([], "id long, g string, v string").schema,
        ["id"],
    )
    maintained = (
        Stream.fromChangeTable(ct, "vals")
        .primaryKeys("id")
        .to(_attach)
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("rho"))
        .writeToPath(str(tmp_path / "registers"))
    )

    rows = [(i, "a" if i % 2 == 0 else "b", f"val{i}") for i in range(200)]
    ct.merge(spark.createDataFrame(rows, "id long, g string, v string"))
    maintained.run()
    got = {
        (r["g"], r["bucket"]): r["rho"] for r in maintained.toDF().collect()
    }
    assert got == _registers(ct.snapshot())

    # deletes can LOWER a register max (dirty-group recompute, not additive)
    ct.delete_where(F.col("id") < 50)
    # and updates rewrite values in place
    ct.merge(
        spark.createDataFrame(
            [(i, "a" if i % 2 == 0 else "b", f"new{i}") for i in range(60, 80)],
            "id long, g string, v string",
        )
    )
    maintained.run()
    got = {
        (r["g"], r["bucket"]): r["rho"] for r in maintained.toDF().collect()
    }
    assert got == _registers(ct.snapshot())


def test_incremental_topk_leaderboard_maintained(spark, tmp_path):
    """A per-group top-k 'leaderboard' maintained incrementally: top-k is
    the array aggregate slice(sort_array(collect_list(...))) — non-additive,
    so every touched group flows through the runtime's dirty-group
    recompute; overtakes, updates and deletes all converge to the batch
    twin."""
    from streamjoin_spark import Stream
    from streamjoin_spark.changelog import ChangeTable

    ct = ChangeTable.create(
        spark,
        str(tmp_path / "scores"),
        spark.createDataFrame([], "id long, grp string, score long").schema,
        ["id"],
    )
    top2 = F.slice(
        F.sort_array(F.collect_list(F.struct("score", "id")), asc=False), 1, 2
    ).alias("top2")
    w = (
        Stream.fromChangeTable(ct, "scores")
        .primaryKeys("id")
        .groupBy("grp")
        .agg(top2)
        .writeToPath(str(tmp_path / "board"))
    )

    def board():
        return {
            r["grp"]: [(e["score"], e["id"]) for e in r["top2"]]
            for r in w.toDF().collect()
        }

    ct.merge(spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 5)],
        "id long, grp string, score long"))
    w.run()
    assert board() == {"a": [(30, 3), (20, 2)], "b": [(5, 4)]}

    ct.merge(spark.createDataFrame(
        [(1, "a", 99)], "id long, grp string, score long"))  # overtake
    w.run()
    assert board() == {"a": [(99, 1), (30, 3)], "b": [(5, 4)]}

    ct.delete_where(F.col("id") == 1)                        # leader leaves
    w.run()
    assert board() == {"a": [(30, 3), (20, 2)], "b": [(5, 4)]}

    ct.merge(spark.createDataFrame(
        [(4, "a", 40)], "id long, grp string, score long"))  # group move
    w.run()
    assert board() == {"a": [(40, 4), (30, 3)]}


def test_incremental_hll_via_pipeline_builder(spark, tmp_path):
    """The packaged builder (pipelines.incremental_hll) wires the same
    maintained-registers pipeline; estimates from the maintained target
    match the batch-recomputed registers after CDC."""
    from streamjoin_spark.pipelines import incremental_hll

    ct = ChangeTable.create(
        spark,
        str(tmp_path / "vals2"),
        spark.createDataFrame([], "id long, g string, v string").schema,
        ["id"],
    )
    w = incremental_hll(ct, str(tmp_path / "regs2"), ["g"], "v", b=5)
    # the greatest-recipe must put insert-only batches on the additive
    # O(delta) path (registers are MAX-monotone under insertion)
    assert w.pipeline.stages[-1].additive is True
    rows = [(i, "a" if i % 3 == 0 else "b", f"val{i}") for i in range(150)]
    ct.merge(spark.createDataFrame(rows, "id long, g string, v string"))
    w.run()
    got = {(r["g"], r["bucket"]): r["rho"] for r in w.toDF().collect()}
    assert got == _registers(ct.snapshot())
    ct.delete_where("id % 5 = 0")
    w.run()
    got = {(r["g"], r["bucket"]): r["rho"] for r in w.toDF().collect()}
    assert got == _registers(ct.snapshot())
