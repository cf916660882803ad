"""Window-analytics operators (operators/windows.py) vs plain-Spark oracles."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.window import Window

from streamjoin_spark.operators.windows import cumulative_agg, rolling_agg

from .conftest import load


def test_rolling_agg_matches_window(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    got = rolling_agg(
        o,
        partition_by=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        aggs={"mov_sum": ("sum", F.col("o_totalprice"))},
        preceding=1,
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(-1, 0)
    )
    exp = o.withColumn("mov_sum", F.sum("o_totalprice").over(w))
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_cumulative_agg_running_total(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    got = cumulative_agg(
        o,
        partition_by=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        aggs={"run_n": ("count", F.lit(1))},
    )
    # the last row per customer's running count equals the group size
    last = got.groupBy("o_custkey").agg(F.max("run_n").alias("run_n"))
    exp = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("run_n"))
    assert last.exceptAll(exp).count() == 0 and exp.exceptAll(last).count() == 0


def test_empty_partition_by_refused(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="partition_by"):
        rolling_agg(o, [], ["o_orderkey"], {"x": ("sum", F.col("o_totalprice"))})


def test_lag_lead_features_edges(spark):
    """Lags/leads NULL off the partition edge; delta = value - lag1;
    partition keys mandatory."""
    import pytest

    from streamjoin_spark.operators.windows import lag_lead_features

    rows = [(1, "u", 1, 10.0), (2, "u", 2, 13.0), (3, "v", 1, 5.0)]
    df = spark.createDataFrame(rows, "id long, k string, t long, value double")
    out = {r["id"]: r for r in lag_lead_features(
        df, ["k"], ["t", "id"], "value", lags=(1,), leads=(1,)).collect()}
    assert out[1]["value_lag1"] is None and out[1]["value_lead1"] == 13.0
    assert out[2]["value_lag1"] == 10.0 and out[2]["value_delta"] == 3.0
    assert out[3]["value_lag1"] is None and out[3]["value_lead1"] is None
    with pytest.raises(ValueError, match="partition_by"):
        lag_lead_features(df, [], ["t"], "value")
