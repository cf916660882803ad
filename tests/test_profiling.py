"""Dataset profiling operators (operators/profiling.py): per-column stats
and clamped equal-width histograms."""

from streamjoin_spark.operators.profiling import histogram, profile_columns


def test_profile_columns_stats(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (2.0,), (None,)], "x double"
    )
    r = profile_columns(df, ["x"]).collect()[0]
    assert r["col_name"] == "x"
    assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (4, 1, 2)
    assert (r["min_val"], r["max_val"]) == (1.0, 2.0)
    assert abs(r["mean_val"] - 5.0 / 3.0) < 1e-4   # nulls excluded


def test_profile_multiple_columns_one_row_each(spark):
    df = spark.createDataFrame([(1.0, 10), (2.0, 10)], "a double, b long")
    out = {r["col_name"]: r for r in profile_columns(df, ["a", "b"]).collect()}
    assert set(out) == {"a", "b"}
    assert out["b"]["n_distinct"] == 1 and out["b"]["mean_val"] == 10.0


def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.9,), (10.0,), (25.0,), (None,)], "x double"
    )
    got = {r["bucket"]: (r["bucket_lo"], r["n"])
           for r in histogram(df, "x", lo=0.0, hi=20.0, n_buckets=2).collect()}
    assert got == {0: (0.0, 3), 1: (10.0, 2)}   # nulls dropped, edges clamped
