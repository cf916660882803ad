"""Microbatch governor: bounded backlog slices + size-guarded broadcasts.

The reference caps every CDF microbatch at 1 GB (``maxBytesPerTrigger``,
elzyme/streams.py:128,138) so its broadcast-the-microbatch strategy can never
overflow. These tests pin the analog in the affected-slice runtime:

- a multi-commit backlog drains in MULTIPLE bounded slices (never one
  whole-backlog slice) and converges to the batch twin;
- an over-threshold Δ carries NO broadcast hint in the slice plan (the
  shuffle fallback), while the default threshold keeps the hint.
"""

import pyspark.sql.functions as F
import pytest

from streamjoin_spark import Stream
from streamjoin_spark.changelog import ChangeTable
from streamjoin_spark.streaming.incremental import _Governor, _parse_bytes

from .test_incremental import assert_same, batch_join, c_rows, cust_ct, o_rows, ord_ct


def make_writer(cust_ct, ord_ct, path, **options):
    c = Stream.fromChangeTable(cust_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    w = c.join(o, "left").on(c["id"] == o["cid"]).writeToPath(str(path))
    for k, v in options.items():
        w.option(k, v)
    return w


def test_parse_bytes():
    assert _parse_bytes("1g") == 1024**3
    assert _parse_bytes("256m") == 256 * 1024**2
    assert _parse_bytes("64k") == 64 * 1024
    assert _parse_bytes(1048576) == 1048576
    assert _parse_bytes(None) is None


def test_version_backlog_drains_in_bounded_slices(spark, tmp_path, cust_ct, ord_ct):
    """A 20-commit backlog with maxVersionsPerTrigger=5 must take ≥4 join
    slices (plus the cust-side slice) and still reach the batch fixpoint."""
    cust_ct.merge(c_rows(spark, [(i, f"c{i}", "A") for i in range(1, 6)]))
    for i in range(20):
        ord_ct.merge(o_rows(spark, [(100 + i, 1 + (i % 5), float(i))]))
    w = make_writer(cust_ct, ord_ct, tmp_path / "out", maxVersionsPerTrigger=5)
    slices = w.run()
    assert slices >= 4, f"backlog drained in {slices} slice(s) — governor inert"
    assert_same(w.toDF(), batch_join(cust_ct, ord_ct, "left"))
    # watermarks at the heads; nothing left
    assert w.run() == 0
    # post-drain incremental step still works and stays chunked
    ord_ct.merge(o_rows(spark, [(200, 2, 9.0)]))
    assert w.run() == 1
    assert_same(w.toDF(), batch_join(cust_ct, ord_ct, "left"))


def test_byte_budget_chunks_backlog(spark, tmp_path, cust_ct, ord_ct):
    """maxBytesPerTrigger smaller than one commit ⇒ one commit per slice
    (chunking always makes progress: ≥1 commit per slice)."""
    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B")]))
    for i in range(4):
        ord_ct.merge(o_rows(spark, [(10 + i, 1 + (i % 2), float(i))]))
    w = make_writer(cust_ct, ord_ct, tmp_path / "out", maxBytesPerTrigger="1k")
    slices = w.run()
    # 4 order commits, each its own chunk (every change file > 1 KiB), plus
    # the first slice also covering the cust commit
    assert slices >= 4
    assert_same(w.toDF(), batch_join(cust_ct, ord_ct, "left"))


def test_agg_backlog_chunked(spark, tmp_path, ord_ct):
    """The agg stage is governed too: commit backlog drains in >1 slice and
    matches the batch aggregate."""
    for i in range(8):
        ord_ct.merge(o_rows(spark, [(10 + i, i % 3, float(i))]))
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    w = (
        o.groupBy("cid")
        .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
        .writeToPath(str(tmp_path / "agg"))
        .option("maxVersionsPerTrigger", 3)
    )
    slices = w.run()
    assert slices >= 3
    expect = (
        ord_ct.snapshot()
        .groupBy("cid")
        .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
    )
    assert_same(w.toDF(), expect)


def test_over_threshold_delta_not_broadcast(spark, tmp_path, cust_ct, ord_ct):
    """broadcastThreshold=0 ⇒ the recomputed slice plan carries NO broadcast
    hint anywhere (Δ probe leg, affected-key scope); the default threshold
    keeps the hints. Asserted on the optimized logical plan — AQE may still
    *choose* broadcast at runtime for tiny data, which is fine (a runtime
    decision, not an unbounded forced hint)."""
    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 2, 7.0)]))

    def slice_plan(path, **options):
        w = make_writer(cust_ct, ord_ct, path, **options)
        stage = w.pipeline.stages[-1]
        _affected, new_slice, _versions, _nbytes = stage.compute_slice()
        return new_slice._jdf.queryExecution().optimizedPlan().toString()

    hinted = slice_plan(tmp_path / "a")
    assert "broadcast" in hinted.lower(), hinted
    unhinted = slice_plan(
        tmp_path / "b", broadcastThreshold=0, scopeBloomFilter="false"
    )
    assert "broadcast" not in unhinted.lower(), unhinted
    # default over-threshold path: the Bloom pre-reduction engages — the
    # only broadcasts are the bounded position sets (≤ 2^scopeBloomBits
    # rows), recognizable by the position column they produce
    bloomed = slice_plan(tmp_path / "c", broadcastThreshold=0)
    assert "position" in bloomed, bloomed
    assert "broadcast" in bloomed.lower(), bloomed


def test_bloom_scope_tier_exact_under_churn(spark, tmp_path, cust_ct, ord_ct):
    """threshold=0 with the Bloom tier ON: every scope filter goes through
    bloom-prefilter + exact shuffle semi-join; the fixpoint matches the
    batch join exactly (the tier is a superset filter, results identical)."""
    w = make_writer(
        cust_ct, ord_ct, tmp_path / "out", broadcastThreshold=0,
    )
    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B"), (3, "cyd", "A")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 2, 7.0), (12, 99, 1.0)]))
    w.run()
    cust_ct.merge(c_rows(spark, [(2, "bob2", "B")]))
    ord_ct.delete_where(F.col("oid") == 10)
    w.run()
    assert_same(w.toDF(), batch_join(cust_ct, ord_ct, "left"))


def test_governed_run_converges_under_cdc_churn(spark, tmp_path, cust_ct, ord_ct):
    """Updates/deletes/FK moves under a tight version budget behave exactly
    like the ungoverned runtime (same fixpoint, just more slices)."""
    w = make_writer(
        cust_ct, ord_ct, tmp_path / "out",
        maxVersionsPerTrigger=1, broadcastThreshold=0,
    )
    cust_ct.merge(c_rows(spark, [(1, "ann", "A"), (2, "bob", "B"), (3, "cyd", "A")]))
    ord_ct.merge(o_rows(spark, [(10, 1, 5.0), (11, 2, 7.0), (12, 99, 1.0)]))
    cust_ct.merge(c_rows(spark, [(1, "ann2", "A")]))
    ord_ct.merge(o_rows(spark, [(10, 2, 5.5)]))   # FK move
    ord_ct.delete_where(F.col("oid") == 11)
    cust_ct.delete_where(F.col("id") == 2)
    slices = w.run()
    # 3 commits per side; a slice consumes ≤1 version from EACH side
    assert slices >= 3
    assert_same(w.toDF(), batch_join(cust_ct, ord_ct, "left"))


# ---------------------------------------------------------------------------
# pure-Python property tests for the chunking math (no Spark session)
# ---------------------------------------------------------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    class _FakeCT:
        def __init__(self, sizes):
            self.sizes = sizes  # sizes[v] = change bytes of commit v (1-based)

        def change_bytes(self, v):
            return self.sizes[v - 1]

    @settings(max_examples=200, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=0, max_value=10_000),
                       min_size=1, max_size=50),
        max_bytes=st.one_of(st.none(), st.integers(min_value=1, max_value=20_000)),
        max_versions=st.one_of(st.none(), st.integers(min_value=1, max_value=10)),
    )
    def test_chunk_end_properties(sizes, max_bytes, max_versions):
        """Invariants of the governor's chunking: (1) progress is always
        made when backlog exists; (2) repeated chunking partitions the
        whole range with no gaps or overlaps; (3) a chunk only exceeds the
        byte budget when it is a single commit (chunk granularity is a
        whole commit); (4) the version cap is never exceeded."""
        gov = _Governor({})
        gov.max_bytes = max_bytes
        gov.max_versions = max_versions
        ct = _FakeCT(sizes)
        v1 = len(sizes)
        v0, chunks = 0, []
        while v0 < v1:
            end, nbytes = gov.chunk_end(ct, v0, v1)
            assert end > v0                                   # (1) progress
            assert nbytes == sum(sizes[v0:end])               # byte account
            if max_versions is not None:
                assert end - v0 <= max_versions               # (4)
            if max_bytes is not None and end - v0 > 1:
                assert nbytes <= max_bytes                    # (3)
            chunks.append((v0, end))
            v0 = end
        assert chunks[0][0] == 0 and chunks[-1][1] == v1      # (2) cover
        for (a, b), (c, d) in zip(chunks, chunks[1:]):
            assert b == c                                     # (2) contiguous

    @settings(max_examples=50, deadline=None)
    @given(st.integers(min_value=0, max_value=2**40))
    def test_should_hint_monotone(est):
        gov = _Governor({"broadcastThreshold": "1m"})
        assert gov.should_hint(est) == (est <= 1024 * 1024)

except ImportError:  # pragma: no cover - hypothesis always in this env
    pass


def test_bloom_ladder_plan_shapes(spark):
    """Plan-level pin for the degradation ladder (VERDICT r3 #8): over the
    broadcast threshold the scope filter must compile to k broadcast
    semi-joins on the Bloom POSITION frame (counter-sized, bounded) plus a
    NON-broadcast exact semi-join on the key scope; under the threshold a
    single broadcast semi-join on the keys, no Bloom machinery."""
    import re

    gov = _Governor({"broadcastThreshold": "1k", "scopeBloomBits": 12})
    snap = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    keys = spark.range(0, 1000, 7).select(F.col("id").alias("k"))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable auto-broadcast so every BroadcastHashJoin in the plan is
        # an EXPLICIT hint — the thing under test
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        over = gov.scoped(snap, keys, ["k"], est_bytes=10_000_000)
        p_over = over._jdf.queryExecution().executedPlan().toString()
        under = gov.scoped(snap, keys, ["k"], est_bytes=10)
        p_under = under._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # over threshold: 3 Bloom passes (broadcast, keyed on position) then
    # the exact semi-join — which must NOT broadcast the key scope. Every
    # BroadcastHashJoin must be a position join (the hash expressions in
    # the Bloom keys mention `k`, so discriminate per join line).
    assert p_over.count("LeftSemi") == 4, p_over
    bhj = [l for l in p_over.splitlines() if "BroadcastHashJoin" in l]
    assert len(bhj) == 3 and all("position" in l for l in bhj), p_over
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin) ", p_over), p_over

    # under threshold: one broadcast semi-join on the keys, no Bloom tier
    assert p_under.count("LeftSemi") == 1, p_under
    assert "position" not in p_under, p_under
    assert "BroadcastHashJoin" in p_under, p_under

    # both tiers return identical rows (the ladder changes plans, not rows)
    assert sorted(r["k"] for r in over.collect()) == sorted(
        r["k"] for r in under.collect()
    )


# ---------------------------------------------------------------------------
# Skewed CDC: a zipfian delta (one key = ~50% of changes) must neither
# diverge nor serialize the recompute into one task (r6)
# ---------------------------------------------------------------------------


def test_zipfian_cdc_converges_join_and_agg(spark, tmp_path, cust_ct, ord_ct):
    """Differential CDC under a zipfian workload: customer 1 owns half of
    all order churn (inserts + updates + deletes, forcing the dirty-group
    recompute path); the governed join AND agg targets still converge to
    their batch twins. Guards the skew story's CORRECTNESS half; the plan
    half is pinned below."""
    cust_ct.merge(c_rows(spark, [(i, f"c{i}", "A") for i in range(1, 6)]))
    # hot key 1: 40 orders; cold keys 2..5: 10 orders each
    hot = [(1000 + i, 1, float(i)) for i in range(40)]
    cold = [(2000 + 10 * c + i, c, float(i)) for c in range(2, 6) for i in range(10)]
    ord_ct.merge(o_rows(spark, hot + cold))

    w_join = make_writer(cust_ct, ord_ct, tmp_path / "j", maxVersionsPerTrigger=2)
    o = Stream.fromChangeTable(ord_ct, "o").primaryKeys("oid")
    w_agg = (
        o.groupBy("cid")
        .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
        .writeToPath(str(tmp_path / "a"))
    )
    w_join.run()
    w_agg.run()

    # zipfian churn: updates + deletes concentrated on key 1 (retractions
    # route its group through dirty-group recompute every cycle)
    ord_ct.merge(o_rows(spark, [(1000 + i, 1, float(i) + 0.5) for i in range(20)]))
    ord_ct.delete_where("oid >= 1030 AND oid < 1040")
    ord_ct.merge(o_rows(spark, [(2021, 2, 99.0)]))   # a cold-key touch too
    w_join.run()
    w_agg.run()

    assert_same(w_join.toDF(), batch_join(cust_ct, ord_ct, "left"))
    expect = (
        ord_ct.snapshot()
        .groupBy("cid")
        .agg(F.sum("price").alias("total"), F.count(F.lit(1)).alias("n"))
    )
    assert_same(w_agg.toDF(), expect)


def test_dirty_group_recompute_is_two_phase_not_single_task(spark, tmp_path, ord_ct):
    """Plan pin for the skew story's PHYSICS half: the dirty-group
    recompute (governor.scoped snapshot → groupBy.agg) compiles to a
    TWO-PHASE hash aggregate — partial_sum/partial_count BELOW the
    exchange — so a hot group's rows combine map-side across every input
    partition and only k partial rows cross the shuffle; the hot group can
    never serialize its raw rows into one task. The shuffled scope rung
    additionally runs under AQE skew-join (session factory pins
    spark.sql.adaptive.skewJoin.enabled)."""
    from streamjoin_spark.streaming.incremental import _Governor

    ord_ct.merge(o_rows(
        spark, [(i, 1 if i % 2 == 0 else i, float(i)) for i in range(100)]
    ))
    gov = _Governor({})
    keys = ord_ct.snapshot().select("cid").dropDuplicates(["cid"])
    dirty = gov.scoped(ord_ct.snapshot(), keys, ["cid"], est_bytes=0)
    out = dirty.groupBy("cid").agg(
        F.sum("price").alias("total"), F.count(F.lit(1)).alias("n")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan and "partial_count" in plan, plan
    # the partial aggregate sits BELOW the shuffle (printed after Exchange
    # in the top-down tree): map-side combine, k rows cross the wire
    ex = plan.find("Exchange")
    assert ex != -1 and plan.find("partial_sum") > ex, plan
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
