"""Bucketed co-located join writer (sources/bucketed.py)."""

import shutil

import pyspark.sql.functions as F

from streamjoin_spark.sources.bucketed import cobucketed_join_ready, write_bucketed

from .conftest import load


def test_write_bucketed_join_has_no_exchange(spark, sf_dir):
    # NB: warehouse dir is a static conf — tables land in ./spark-warehouse,
    # removed in the finally block
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    try:
        write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=4)
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem", ["o_orderkey"], n_buckets=4,
        )
        assert cobucketed_join_ready(spark, "b_orders", "b_lineitem")
        j = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-bucketed scan: the join needs no shuffle on either side
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        shutil.rmtree("spark-warehouse", ignore_errors=True)
