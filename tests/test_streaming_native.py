"""Native Structured Streaming operators (streaming/stateful.py): stateful
sessionization with checkpoint-recovered state, and watermarked windowed
rollup — each converging to its batch twin."""

import pyspark.sql.functions as F
import pytest

from streamjoin_spark.changelog import ChangeTable
from streamjoin_spark.streaming.stateful import (
    streaming_sessionize,
    windowed_rollup_stream,
)

EV = "event_id long, user_id long, ts double, value double"
GAP = 100.0


@pytest.fixture()
def ev_ct(spark, tmp_path):
    return ChangeTable.create(
        spark, str(tmp_path / "ev"), spark.createDataFrame([], EV).schema,
        ["event_id"],
    )


def _drain_sessions(spark, ev_ct, tmp_path, results):
    """One availableNow pass of the stateful sessionizer; merge updated
    session rows into `results` (latest per (user, session_seq))."""
    stream = ev_ct.read_change_stream().where(
        F.col("_change_type") == "insert"
    )
    sess = streaming_sessionize(stream, gap_s=GAP)

    def sink(df, batch_id):
        for r in df.collect():
            results[(r.user_id, r.session_seq)] = (
                r.n_events, round(r.session_value, 4)
            )

    q = (
        sess.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def batch_sessions(spark, ev_ct):
    from pyspark.sql.window import Window

    ev = ev_ct.snapshot()
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag("ts").over(w)
    new_sess = F.when(gap.isNull() | (gap > GAP), 1).otherwise(0)
    sess = ev.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return {
        (r.user_id, r.session_seq): (r.n_events, round(r.session_value, 4))
        for r in sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .collect()
    }


def test_stateful_sessionize_converges_across_restarts(spark, tmp_path, ev_ct):
    results = {}
    # batch 1: two users; user 1 has a gap-split (t=0,50 | t=300)
    ev_ct.append(spark.createDataFrame(
        [(1, 1, 0.0, 1.0), (2, 1, 50.0, 2.0), (3, 1, 300.0, 4.0),
         (4, 2, 10.0, 8.0)], EV))
    _drain_sessions(spark, ev_ct, tmp_path, results)
    assert results[(1, 1)] == (2, 3.0)
    assert results[(1, 2)] == (1, 4.0)

    # batch 2 in a NEW query (state recovered from checkpoint): user 1's
    # open session continues (t=350 within gap of 300); user 2 splits
    ev_ct.append(spark.createDataFrame(
        [(5, 1, 350.0, 10.0), (6, 2, 500.0, 16.0)], EV))
    _drain_sessions(spark, ev_ct, tmp_path, results)

    assert results == batch_sessions(spark, ev_ct)
    assert results[(1, 2)] == (2, 14.0)  # continued, not restarted
    assert results[(2, 2)] == (1, 16.0)


def test_windowed_rollup_stream_matches_batch(spark, tmp_path, ev_ct):
    rows = [
        (1, 1, 0.0, 1.0), (2, 1, 1800.0, 2.0),     # window 0
        (3, 2, 3700.0, 4.0), (4, 2, 5400.0, 8.0),  # windows 1
        (5, 1, 7300.0, 16.0),                      # window 2
    ]
    ev_ct.append(spark.createDataFrame(rows, EV))
    stream = (
        ev_ct.read_change_stream()
        .where(F.col("_change_type") == "insert")
        .withColumn("ts", F.timestamp_seconds("ts"))
        .withColumn("event_type", F.lit("e"))
    )
    out = windowed_rollup_stream(stream, window="1 hour", watermark="2 hours")
    got = {}

    def sink(df, batch_id):
        for r in df.collect():
            got[(r.window_start, r.event_type)] = (r.n_events, r.sum_value)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    ev = ev_ct.snapshot().withColumn("ts", F.timestamp_seconds("ts"))
    exp = {
        (r.window_start, "e"): (r.n_events, r.sum_value)
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        .collect()
    }
    assert got == exp


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join: click→purchase attribution
    within 100 s, converging to the batch twin on the same data."""
    from streamjoin_spark.streaming.stateful import stream_interval_join

    CK = "click_id long, user_id long, ts_s double"
    PU = "buy_id long, user_id long, ts_s double, amount double"
    clicks_ct = ChangeTable.create(
        spark, str(tmp_path / "clicks"), spark.createDataFrame([], CK).schema,
        ["click_id"],
    )
    buys_ct = ChangeTable.create(
        spark, str(tmp_path / "buys"), spark.createDataFrame([], PU).schema,
        ["buy_id"],
    )
    base = 1_700_000_000.0
    clicks_ct.append(spark.createDataFrame(
        [(1, 10, base), (2, 10, base + 500.0), (3, 20, base + 50.0)], CK))
    buys_ct.append(spark.createDataFrame(
        [(100, 10, base + 60.0, 9.99),     # matches click 1 (within 100 s)
         (101, 10, base + 530.0, 5.00),    # matches click 2
         (102, 20, base + 300.0, 1.00),    # too late for click 3
         (103, 30, base + 10.0, 2.00)],    # no click at all
        PU))

    def prep(stream_df, ts_out):
        return stream_df.where(F.col("_change_type") == "insert").select(
            "*", F.timestamp_seconds(F.col("ts_s")).alias(ts_out)
        ).drop("_change_type", "_commit_version", "ts_s")

    joined = stream_interval_join(
        prep(clicks_ct.read_change_stream(), "click_ts"),
        prep(buys_ct.read_change_stream(), "buy_ts"),
        on="user_id", left_ts="click_ts", right_ts="buy_ts",
        lower_s=0, upper_s=100, watermark="10 minutes",
    ).select(
        F.col("l.click_id"), F.col("r.buy_id"), F.col("r.amount")
    )

    got = set()
    q = (
        joined.writeStream.foreachBatch(
            lambda df, bid: got.update((r.click_id, r.buy_id, r.amount)
                                       for r in df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ij_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert got == {(1, 100, 9.99), (2, 101, 5.00)}


def test_streaming_dedup_drops_redeliveries(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps the first arrival per key and
    drops in-horizon re-deliveries across microbatches."""
    from streamjoin_spark.streaming.stateful import streaming_dedup

    EV2 = "event_id long, ts_s double, value double"
    ev_ct = ChangeTable.create(
        spark, str(tmp_path / "dd"), spark.createDataFrame([], EV2).schema,
        ["event_id"],
    )
    base = 1_700_000_000.0
    # two commits → two file-sets; event 1 re-delivered in the second
    ev_ct.append(spark.createDataFrame(
        [(1, base, 1.0), (2, base + 10.0, 2.0)], EV2))
    ev_ct.append(spark.createDataFrame(
        [(1, base, 1.0), (3, base + 20.0, 3.0)], EV2))

    stream = ev_ct.read_change_stream().where(
        F.col("_change_type") == "insert"
    ).select("event_id", F.timestamp_seconds(F.col("ts_s")).alias("ts"), "value")

    got = []
    q = (
        streaming_dedup(stream, ("event_id",), watermark="10 minutes")
        .writeStream.foreachBatch(
            lambda df, bid: got.extend((r.event_id, r.value) for r in df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .option("maxFilesPerTrigger", 1)   # force multiple microbatches
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == [(1, 1.0), (2, 2.0), (3, 3.0)]


def test_session_window_rollup_matches_batch(spark, tmp_path, ev_ct):
    """Built-in merging session_window: closed sessions emitted by the
    stream equal the batch session_window aggregation on the same data
    (a far-future sentinel pushes the watermark so real sessions close)."""
    from streamjoin_spark.streaming.stateful import session_window_rollup_stream

    rows = [
        (1, 1, 0.0, 1.0), (2, 1, 50.0, 2.0), (3, 1, 70.0, 4.0),  # session A
        (4, 1, 1000.0, 8.0),                                      # session B
        (5, 2, 40.0, 16.0),                                       # session C
        (6, 99, 1e6, 0.0),                                        # sentinel
    ]
    ev_ct.append(spark.createDataFrame(rows, EV))
    stream = (
        ev_ct.read_change_stream()
        .where(F.col("_change_type") == "insert")
        .withColumn("ts", F.timestamp_seconds("ts"))
    )
    out = session_window_rollup_stream(stream, gap="100 seconds",
                                       watermark="10 seconds")
    got = {}

    def sink(df, batch_id):
        for r in df.collect():
            got[(r.user_id, r.session_start)] = (r.n_events, r.session_value)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "swckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    ev = ev_ct.snapshot().where(F.col("user_id") != 99).withColumn(
        "ts", F.timestamp_seconds("ts")
    )
    exp = {
        (r.user_id, r.session_start): (r.n_events, r.session_value)
        for r in ev.groupBy(
            F.session_window("ts", "100 seconds").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("session_value"))
        .select("user_id", F.col("w.start").alias("session_start"),
                "n_events", "session_value")
        .collect()
    }
    assert got == exp
    assert len(got) == 3  # A, B, C closed; sentinel session still open
