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


def test_zorder_interleave_corners(spark):
    """Known corners of an exactly-[0,255] 2-D space interleave to the
    classic Z-values; locality: quadrant prefixes match."""
    from pyspark.sql import functions as F

    from streamjoin_spark.operators.layout import with_zorder_key

    df = spark.createDataFrame(
        [(1, 0, 0), (2, 255, 0), (3, 0, 255), (4, 255, 255)],
        "id long, x long, y long",
    )
    z = {r["id"]: r["z_key"]
         for r in with_zorder_key(df, ["x", "y"], bits=8).collect()}
    assert z[1] == 0
    assert z[2] == 0x5555          # x occupies even bit positions
    assert z[3] == 0xAAAA          # y occupies odd bit positions
    assert z[4] == 0xFFFF


def test_zorder_range_partition_clusters(spark):
    """repartitionByRange on the Z-key yields partitions whose x/y spans
    are narrow hyper-rectangles, not full-range slices."""
    from pyspark.sql import functions as F

    from streamjoin_spark.operators.layout import with_zorder_key

    rows = [(i, i % 64, (i * 7) % 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    keyed = with_zorder_key(df, ["x", "y"], bits=6)
    parts = (
        keyed.repartitionByRange(16, F.col("z_key"))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg((F.max("x") - F.min("x")).alias("dx"),
             (F.max("y") - F.min("y")).alias("dy"))
        .collect()
    )
    # every Z-range partition spans at most half of each dimension —
    # a plain sort by x would give dy == full range (63) everywhere
    assert all(p["dx"] <= 32 and p["dy"] <= 32 for p in parts)


def xy2d_ref(n, x, y):
    """Classic Wikipedia xy2d reference (driver-side truth)."""
    rx = ry = 0
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference_grid(spark):
    """Every point of the full 16x16 grid (bits=4) maps to the classic
    xy2d distance — and therefore inherits the curve's unit-step locality."""
    from streamjoin_spark.operators.layout import with_hilbert_key

    n = 16
    pts = [(x * n + y, x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    # x,y already span [0, 15] so min/max normalization at bits=4 is the
    # identity mapping
    out = with_hilbert_key(df, ["x", "y"], bits=4)
    got = {(r["x"], r["y"]): r["h_key"] for r in out.collect()}
    for _, x, y in pts:
        assert got[(x, y)] == xy2d_ref(n, x, y), (x, y)
    # bijection over the grid
    assert sorted(got.values()) == list(range(n * n))


def test_robust_outliers_median_mad(spark):
    """Median/MAD flags survive what drags a z-score: one huge outlier
    shifts the mean but not the median, so it is the ONLY flagged row;
    median and MAD report at bin resolution."""
    from streamjoin_spark.operators.profiling import robust_outliers

    rows = [(i, "g", float(v)) for i, v in enumerate(
        [10.0, 10.5, 11.0, 11.5, 12.0, 12.5, 13.0, 1000.0]
    )] + [(100, "h", 5.0), (101, "h", 5.1), (102, "h", None)]
    df = spark.createDataFrame(rows, "id long, grp string, value double")
    out = {r["id"]: r for r in robust_outliers(
        df, ["grp"], "value", k=5.0).collect()}

    assert out[7]["is_outlier"] is True            # the 1000.0 spike
    assert all(out[i]["is_outlier"] is False for i in range(7))
    assert out[0]["med"] == 11.5                   # median of 8 = 4th bin
    assert out[0]["mad"] == 1.0                    # |devs| median at bins
    assert 102 not in out                          # NULLs dropped
    # two-point group: med = lower value, mad = 0 -> only exact-median rows
    # escape flagging; 5.1 sits 10 bins away with mad 0 -> flagged
    assert out[100]["is_outlier"] is False
    assert out[101]["is_outlier"] is True


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vals=st.lists(
            st.floats(min_value=-50, max_value=50, allow_nan=False,
                      width=32),
            min_size=3,
            max_size=20,
        ),
        k=st.sampled_from([1.0, 3.0]),
    )
    def test_robust_outliers_matches_python_truth(spark, vals, k):
        """Property pin for the histogram-median math: robust_outliers
        must equal a python reference computing bin-resolution median,
        MAD, and flags on arbitrary value lists."""
        import math

        from streamjoin_spark.operators.profiling import robust_outliers

        rows = [(i, "g", float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "id long, grp string, value double")
        got = {r["id"]: (r["med"], r["mad"], r["is_outlier"])
               for r in robust_outliers(df, ["grp"], "value", k=k).collect()}

        bins = sorted(math.floor(float(v) * 100) for v in vals)
        n = len(bins)

        def hist_median(sorted_bins):
            target = (len(sorted_bins) + 1) // 2
            # smallest bin whose ascending cumulative reaches ceil(n/2)
            seen = 0
            for b in sorted(set(sorted_bins)):
                seen += sorted_bins.count(b)
                if seen >= target:
                    return b
            raise AssertionError

        med = hist_median(bins)
        mad = hist_median(sorted(abs(b - med) for b in bins))
        for i, v in enumerate(vals):
            b = math.floor(float(v) * 100)
            want = (med / 100.0, mad / 100.0, abs(b - med) > k * mad)
            assert got[i] == want, (i, v, got[i], want)
