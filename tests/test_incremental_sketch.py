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
