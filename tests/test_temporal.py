"""Unit tests for as-of and range joins (operators/temporal.py) on small
hand-built frames with known answers, including the edge cases the window
algorithm must get right: equal timestamps (inclusive bound), NULL fields in
the matched right row, tolerance windows, and bucket-boundary points."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from streamjoin_spark.operators.temporal import asof_join, range_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", lts=10.0, lv="L1"),
            Row(k="a", lts=20.0, lv="L2"),
            Row(k="a", lts=5.0, lv="L0"),
            Row(k="b", lts=10.0, lv="L3"),
            Row(k="c", lts=10.0, lv="L4"),  # no right rows for key c
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rts=10.0, rid=1, rv="R10"),  # equal-ts: must match lts=10
            Row(k="a", rts=12.0, rid=2, rv="R12"),
            Row(k="a", rts=12.0, rid=3, rv=None),   # tie on ts: rid=3 wins; rv NULL
            Row(k="b", rts=9.0, rid=4, rv="R9"),
        ]
    )
    return left, right


def test_asof_backward_inclusive(frames):
    left, right = frames
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        how="left", right_order="rid",
    )
    got = {(r.k, r.lts): (r.rid, r.rv) for r in out.collect()}
    assert got[("a", 5.0)] == (None, None)        # nothing at or before 5
    assert got[("a", 10.0)] == (1, "R10")         # inclusive: rts == lts matches
    # tie at rts=12: right_order picks rid=3, whose rv is legitimately NULL —
    # the struct carry must NOT fall back to rid=2's non-null value
    assert got[("a", 20.0)] == (3, None)
    assert got[("b", 10.0)] == (4, "R9")
    assert got[("c", 10.0)] == (None, None)
    assert out.count() == 5


def test_asof_inner_and_tolerance(frames):
    left, right = frames
    inner = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        how="inner", right_order="rid",
    )
    assert inner.count() == 3  # (a,10) (a,20) (b,10)

    tol = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        how="left", tolerance=1.0, right_order="rid",
    )
    got = {(r.k, r.lts): r.rid for r in tol.collect()}
    assert got[("a", 10.0)] == 1      # gap 0 <= 1
    assert got[("a", 20.0)] is None   # gap 8 > 1 nulled out
    assert got[("b", 10.0)] == 4      # gap exactly == tolerance is kept


def test_asof_name_clash_suffix(spark):
    left = spark.createDataFrame([Row(k="a", ts=10.0, v=1.0)])
    right = spark.createDataFrame([Row(k="a", ts=8.0, v=2.0)])
    out = asof_join(left, right, on=["k"], left_ts="ts")
    assert set(out.columns) == {"k", "ts", "v", "ts_right", "v_right"}
    row = out.collect()[0]
    assert (row.v, row.v_right, row.ts_right) == (1.0, 2.0, 8.0)


def test_range_join_buckets_and_bounds(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", sid=1, lo=0.0, hi=10.0),
            Row(k="a", sid=2, lo=95.0, hi=105.0),  # spans a bucket boundary
            Row(k="a", sid=3, lo=50.0, hi=40.0),   # inverted: dropped, no ANSI throw
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", pid=1, p=0.0),     # on the lower bound
            Row(k="a", pid=2, p=10.0),    # on the upper bound
            Row(k="a", pid=3, p=100.0),   # inside sid=2, different bucket than lo
            Row(k="a", pid=4, p=200.0),   # matches nothing
            Row(k="b", pid=5, p=5.0),     # key mismatch
        ]
    )
    out = range_join(
        left, right, keys=["k"], lower="lo", upper="hi", point="p",
        bucket_width=50.0,
    )
    pairs = {(r.sid, r.pid) for r in out.collect()}
    assert pairs == {(1, 1), (1, 2), (2, 3)}

    half_open = range_join(
        left, right, keys=["k"], lower="lo", upper="hi", point="p",
        bucket_width=50.0, include_lower=False, include_upper=False,
    )
    assert {(r.sid, r.pid) for r in half_open.collect()} == {(2, 3)}


def test_range_join_clash_rejected(spark):
    df = spark.createDataFrame([Row(k="a", x=1.0, lo=0.0, hi=1.0, p=0.5)])
    with pytest.raises(ValueError, match="clash"):
        range_join(df, df, keys=["k"], lower="lo", upper="hi", point="p",
                   bucket_width=1.0)


def test_gap_fill_ffill_and_flags(spark):
    """Missing steps materialize with is_gap=true and the measure carried
    forward; per-key spine bounds come from that key's own min/max."""
    import datetime as dt

    from pyspark.sql import functions as F

    from streamjoin_spark.operators.temporal import gap_fill

    t0 = dt.datetime(2024, 1, 1, 0)
    rows = [
        ("a", t0, 1.0),
        ("a", t0 + dt.timedelta(hours=3), 4.0),
        ("b", t0 + dt.timedelta(hours=1), 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, h timestamp, v double")
    out = gap_fill(df, ["k"], "h", F.expr("INTERVAL 1 HOUR"), ["v"])
    got = {(r["k"], r["h"].hour): (r["v"], r["is_gap"]) for r in out.collect()}
    assert got == {
        ("a", 0): (1.0, False),
        ("a", 1): (1.0, True),
        ("a", 2): (1.0, True),
        ("a", 3): (4.0, False),
        ("b", 1): (9.0, False),
    }
    none_filled = gap_fill(df, ["k"], "h", F.expr("INTERVAL 1 HOUR"), ["v"],
                           fill="none")
    assert none_filled.where("v IS NULL").count() == 2

    # a genuine input row whose measure is NULL is a real observation:
    # is_gap must stay false (join-presence marker, not measure-NULL
    # inference); ffill still fills its measure (Pandas ffill semantics)
    rows2 = [("a", t0, 1.0), ("a", t0 + dt.timedelta(hours=1), None)]
    df2 = spark.createDataFrame(rows2, "k string, h timestamp, v double")
    out2 = gap_fill(df2, ["k"], "h", F.expr("INTERVAL 1 HOUR"), ["v"])
    got2 = {r["h"].hour: (r["v"], r["is_gap"]) for r in out2.collect()}
    assert got2 == {0: (1.0, False), 1: (1.0, False)}


def test_merge_intervals_semantics(spark):
    """Overlapping and touching spans merge; disjoint spans stay separate;
    a span contained in the running group extends nothing but still counts;
    keys never merge across."""
    from streamjoin_spark.operators.temporal import merge_intervals

    rows = [
        # key a: [0,10] + [5,20] overlap; [20,25] touches; [40,50] separate
        ("a", 1, 0.0, 10.0),
        ("a", 2, 5.0, 20.0),
        ("a", 3, 20.0, 25.0),
        ("a", 4, 40.0, 50.0),
        # contained span: [41,43] inside [40,50]
        ("a", 5, 41.0, 43.0),
        # key b: same coords as key a's first span — must not merge with a
        ("b", 6, 0.0, 10.0),
    ]
    df = spark.createDataFrame(rows, "k string, id long, s double, e double")
    out = sorted(
        (r["k"], r["interval_start"], r["interval_end"], r["n_spans"])
        for r in merge_intervals(df, ["k"], "s", "e", "id").collect()
    )
    assert out == [
        ("a", 0.0, 25.0, 3),
        ("a", 40.0, 50.0, 2),
        ("b", 0.0, 10.0, 1),
    ]


def test_ewma_known_sequence(spark):
    """Hand-computed EWMA (α=0.5): weights 0.5/0.25/0.125, partial-window
    normalized — row k averages only the weights present."""
    from streamjoin_spark.operators.temporal import ewma

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 7.0)],
        "uid long, seq long, v double",
    )
    out = {
        (r["uid"], r["seq"]): r["ewma"]
        for r in ewma(df, ["uid"], ["seq"], "v", alpha=0.5, window=8).collect()
    }
    assert out[(1, 1)] == 10.0
    assert out[(1, 2)] == 16.666666          # 12.5 / 0.75, floored 6 dp
    assert out[(1, 3)] == 24.285714          # 21.25 / 0.875
    assert out[(2, 1)] == 7.0                # keys never mix


def test_hopping_rollup_fanout_and_edges(spark):
    """Each event lands in exactly ceil(size/slide) windows (trailing
    partial windows included), counts per window match a python reference,
    and window starts are epoch-aligned to the slide."""
    from streamjoin_spark.operators.temporal import hopping_rollup

    import datetime as dt

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (1, "a", 1.0, base),
        (2, "a", 2.0, base + dt.timedelta(seconds=899)),   # same slide slot
        (3, "a", 4.0, base + dt.timedelta(seconds=900)),   # next slot
        (4, "b", 8.0, base + dt.timedelta(seconds=3600)),  # one hour on
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts timestamp"
    )
    out = hopping_rollup(df, size_s=3600, slide_s=900)
    got = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
           for r in out.collect()}

    # python reference
    want = {}
    for _, et, v, ts in rows:
        ep = int(ts.replace(tzinfo=dt.timezone.utc).timestamp())
        b = ep // 900 * 900
        for k in range(4):
            ws = b - k * 900
            if ws + 3600 > ep:
                key = (ws, et)
                n, s = want.get(key, (0, 0.0))
                want[key] = (n + 1, s + v)
    assert got == want
    assert all(ws % 900 == 0 for ws, _ in got)
    # every event appears in exactly 4 windows
    assert sum(n for n, _ in got.values()) == 4 * len(rows)
