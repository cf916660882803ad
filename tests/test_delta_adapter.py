"""Delta Lake CDF interop (sources/delta.py).

delta-spark is not installed in this environment, so the suite splits the
way the module does:

- the pure translation layer (``normalize_cdf``) is tested over synthetic
  Delta-CDF-shaped frames — no Delta runtime involved;
- the ChangeTable duck surface the adapter implements is proven
  *sufficient for the IVM runtime* by driving a full incremental pipeline
  through a fake adapter that emulates Delta CDF output (native change
  feed + ``_commit_timestamp`` column, re-normalized through the real
  ``normalize_cdf``) — if the adapter's surface were missing anything the
  runtime needs, this test would fail the same way a real Delta source
  would;
- the live-runtime path (real Delta table, CDF enabled) is skip-marked on
  ``has_delta()`` and runs wherever delta-spark exists;
- the import guard itself is asserted to raise with install guidance.
"""

import pytest
from pyspark.sql import functions as F

from streamjoin_spark.changelog import ChangeTable
from streamjoin_spark.sources.delta import (
    DeltaSourceTable,
    has_delta,
    is_delta_path,
    normalize_cdf,
)
from streamjoin_spark.streams import Stream

from .test_incremental import assert_same

CDF = (
    "id long, name string, _change_type string, _commit_version int, "
    "_commit_timestamp timestamp"
)


def cdf_rows(spark, rows):
    return spark.createDataFrame(
        [(i, n, t, v, None) for (i, n, t, v) in rows], CDF
    )


def test_normalize_cdf_contract(spark):
    raw = cdf_rows(spark, [
        (1, "a", "insert", 1),
        (2, "b", "insert", 1),
        (2, "b", "update_preimage", 2),
        (2, "b2", "update_postimage", 2),
        (1, "a", "delete", 3),
    ])
    out = normalize_cdf(raw)
    # _commit_timestamp dropped, _commit_version pinned to long
    assert out.columns == ["id", "name", "_change_type", "_commit_version"]
    assert dict(out.dtypes)["_commit_version"] == "bigint"
    assert out.count() == 5
    # reference-compat delete filter at the same spot the reference filters
    assert normalize_cdf(raw, ignore_deletes=True).where(
        F.col("_change_type") == "delete"
    ).count() == 0
    # startingVersion lower bound
    sv = normalize_cdf(raw, starting_version=2)
    assert sv.agg(F.min("_commit_version")).collect()[0][0] == 2


def test_normalize_cdf_passes_user_columns_untouched(spark):
    raw = cdf_rows(spark, [(7, "x", "insert", 4)])
    row = normalize_cdf(raw).collect()[0]
    assert (row["id"], row["name"], row["_change_type"], row["_commit_version"]) == (
        7, "x", "insert", 4
    )


class _FakeDelta:
    """Delta-CDF-shaped wrapper over a native ChangeTable: every feed read
    goes out in Delta's shape (extra ``_commit_timestamp``) and back in
    through the REAL ``normalize_cdf`` — exactly the translation
    ``DeltaSourceTable`` performs, minus the delta-spark reader calls. Its
    public surface is the ChangeTable duck contract the IVM runtime
    consumes; feeding a real pipeline through it proves that contract is
    complete."""

    def __init__(self, ct: ChangeTable):
        self._ct = ct
        self.spark = ct.spark
        self.name = ct.name + "_delta"
        self.path = ct.path

    def _cdfify(self, df):
        return df.withColumn(
            "_commit_timestamp",
            F.lit("2024-01-01 00:00:00").cast("timestamp"),
        )

    def version(self) -> int:
        return self._ct.version()

    def snapshot(self, version=None):
        return self._ct.snapshot(version)

    def read_change_feed(self, starting_version: int = 1):
        return normalize_cdf(
            self._cdfify(self._ct.read_change_feed(starting_version))
        )

    def read_change_stream(self, max_files_per_trigger=None):
        return normalize_cdf(
            self._cdfify(self._ct.read_change_stream(max_files_per_trigger))
        )

    def change_bytes(self, version: int) -> int:
        return self._ct.change_bytes(version)


CUST = "id long, name string, seg string"
ORD = "oid long, cid long, price double"


def test_delta_shaped_source_feeds_incremental_join(spark, tmp_path):
    """A CDF-shaped source consumed through the adapter's duck surface
    drives a real incremental join to batch convergence under
    insert/update/delete — the end-to-end proof that a Delta table (whose
    reads produce exactly these frames) can be an IVM input."""
    c_ct = ChangeTable.create(
        spark, str(tmp_path / "c"), spark.createDataFrame([], CUST).schema, ["id"]
    )
    o_ct = ChangeTable.create(
        spark, str(tmp_path / "o"), spark.createDataFrame([], ORD).schema, ["oid"]
    )
    c_ct.merge(spark.createDataFrame(
        [(1, "ann", "a"), (2, "bob", "b")], CUST))
    o_ct.merge(spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, 7.0), (12, 9, 1.0)], ORD))

    c = Stream.fromChangeTable(_FakeDelta(c_ct), "cust").primaryKeys("id")
    o = Stream.fromChangeTable(_FakeDelta(o_ct), "ord").primaryKeys("oid")
    w = (
        c.join(o, "inner").on(c["id"] == o["cid"])
        .writeToPath(str(tmp_path / "j"))
    )
    w.run()

    def twin():
        cs, os_ = c_ct.snapshot(), o_ct.snapshot()
        return cs.join(os_, cs["id"] == os_["cid"], "inner")

    assert_same(w.toDF(), twin())

    # CDC: update a customer, delete an order, insert a new matching pair
    c_ct.merge(spark.createDataFrame([(2, "bob2", "b2")], CUST))
    o_ct.delete_where("oid = 10")
    o_ct.merge(spark.createDataFrame([(13, 1, 2.5)], ORD))
    w.run()
    assert_same(w.toDF(), twin())


def test_delta_shaped_source_respects_ignore_deletes(spark, tmp_path):
    """Reference strict-compat mode through the adapter: delete images are
    filtered from the feed, so the downstream row survives an upstream
    delete (the reference's keep-stale-rows behavior,
    elzyme/streams.py:132,142)."""
    c_ct = ChangeTable.create(
        spark, str(tmp_path / "c"), spark.createDataFrame([], CUST).schema, ["id"]
    )
    c_ct.merge(spark.createDataFrame([(1, "ann", "a"), (2, "bob", "b")], CUST))

    s = (
        Stream.fromChangeTable(_FakeDelta(c_ct), "cust")
        .primaryKeys("id")
        .ignoreDeletes()
    )
    w = s.to(lambda df: df).writeToPath(str(tmp_path / "view"))
    w.run()
    assert w.toDF().count() == 2
    c_ct.delete_where("id = 2")
    w.run()
    assert w.toDF().count() == 2  # stale row kept, as the reference does


class _FakeDeltaV0(_FakeDelta):
    """Delta-CDF-shaped wrapper with DELTA VERSION NUMBERING: a real Delta
    table carries its initial data in commit 0 (CTAS / first write), while
    the native substrate's v0 is an empty CREATE. This fake shifts the
    wrapped ChangeTable's versions down by one (native v1 = delta v0), so
    it reproduces the table shape that used to silently lose its founding
    rows before ``seed_watermark = -1`` (ADVICE r5, incremental._seed_version)."""

    seed_watermark = -1

    def version(self) -> int:
        return self._ct.version() - 1

    def snapshot(self, version=None):
        return self._ct.snapshot(None if version is None else version + 1)

    def read_change_feed(self, starting_version: int = 1):
        native = self._ct.read_change_feed(starting_version + 1)
        shifted = native.withColumn(
            "_commit_version", F.col("_commit_version") - 1
        )
        return normalize_cdf(self._cdfify(shifted))

    def change_bytes(self, version: int) -> int:
        return self._ct.change_bytes(version + 1)


def test_delta_commit0_rows_not_lost(spark, tmp_path):
    """A Delta-shaped source whose commit 0 CARRIES the initial data (the
    normal CTAS shape) must deliver those rows to a maintained view on the
    first drain: the IVM seed watermark for Delta adapters is -1, so the
    first slice covers [0, head]. Before the fix the seed floored at 0 and
    every view built on the migration bridge silently dropped commit 0."""
    c_ct = ChangeTable.create(
        spark, str(tmp_path / "c"), spark.createDataFrame([], CUST).schema, ["id"]
    )
    # native v1 == delta v0: the founding rows
    c_ct.merge(spark.createDataFrame([(1, "ann", "a"), (2, "bob", "b")], CUST))
    fake = _FakeDeltaV0(c_ct)
    assert fake.version() == 0 and fake.read_change_feed(0).count() == 2

    s = Stream.fromChangeTable(fake, "cust").primaryKeys("id")
    w = s.to(lambda df: df).writeToPath(str(tmp_path / "view"))
    w.run()
    assert {r["id"] for r in w.toDF().collect()} == {1, 2}

    # subsequent commits still flow (delta v1 = native v2)
    c_ct.merge(spark.createDataFrame([(3, "cat", "c")], CUST))
    w.run()
    assert {r["id"] for r in w.toDF().collect()} == {1, 2, 3}

    # explicit startingVersion=0 must ALSO cover commit 0 (max(floor, -1))
    s2 = Stream.fromChangeTable(
        _FakeDeltaV0(c_ct), "cust0", startingVersion=0
    ).primaryKeys("id")
    w2 = s2.to(lambda df: df).writeToPath(str(tmp_path / "view0"))
    w2.run()
    assert {r["id"] for r in w2.toDF().collect()} == {1, 2, 3}


def test_seed_version_law(spark, tmp_path):
    """_seed_version: native sources floor at 0 (v0 is an empty CREATE);
    Delta-adapter sources floor at -1 (v0 carries data); an explicit
    startingVersion pins max(floor, sv-1)."""
    from streamjoin_spark.streaming.incremental import _seed_version

    ct = ChangeTable.create(
        spark, str(tmp_path / "n"), spark.createDataFrame([], CUST).schema, ["id"]
    )
    native = Stream.fromChangeTable(ct, "n")
    assert _seed_version(native) == 0
    assert _seed_version(Stream.fromChangeTable(ct, "n", startingVersion=3)) == 2

    fake = _FakeDeltaV0(ct)
    assert _seed_version(Stream.fromChangeTable(fake, "d")) == -1
    assert _seed_version(Stream.fromChangeTable(fake, "d", startingVersion=0)) == -1
    assert _seed_version(Stream.fromChangeTable(fake, "d", startingVersion=2)) == 1


def test_import_guard_without_delta(spark, tmp_path):
    if has_delta():  # pragma: no cover — environment-dependent
        pytest.skip("delta-spark installed; guard not exercisable")
    with pytest.raises(ImportError, match="delta-spark"):
        DeltaSourceTable(spark, path=str(tmp_path))
    # fromPath on a _delta_log directory fails with guidance, not a misread
    d = tmp_path / "dtab"
    (d / "_delta_log").mkdir(parents=True)
    assert is_delta_path(str(d))
    with pytest.raises(ImportError, match="delta-spark"):
        Stream.fromPath(spark, str(d))


@pytest.mark.skipif(not has_delta(), reason="delta-spark not installed")
def test_live_delta_roundtrip(spark, tmp_path):  # pragma: no cover
    """Real-runtime path: create a Delta table with CDF on, feed it through
    Stream.fromDelta into an incremental maintained view, converge under
    update + delete."""
    path = str(tmp_path / "live")
    (
        spark.createDataFrame([(1, "a", "x"), (2, "b", "y")], CUST)
        .write.format("delta")
        .option("delta.enableChangeDataFeed", "true")
        .save(path)
    )
    s = Stream.fromDelta(spark, path).primaryKeys("id")
    w = s.to(lambda df: df).writeToPath(str(tmp_path / "view"))
    w.run()
    assert_same(w.toDF(), spark.read.format("delta").load(path))
    from delta.tables import DeltaTable

    dt = DeltaTable.forPath(spark, path)
    dt.update("id = 2", {"name": F.lit("b2")})
    dt.delete("id = 1")
    w.run()
    assert_same(w.toDF(), spark.read.format("delta").load(path))
    # versioned + history read surface
    adapter = s.change_table
    assert adapter.version() >= 2
    assert adapter.snapshot(0).count() == 2
    assert adapter.describe_history().count() >= 3


# ---------------------------------------------------------------------------
# Delta as a sink: delete-propagating MERGE source + 3-arg foreachBatch
# ---------------------------------------------------------------------------


def test_sink_source_classifies_outcomes(spark):
    """sink_source: full-outer scope-diff of the slice against the sink's
    current rows — slice-only = insert, both = update, sink-only-in-scope
    = delete, out-of-scope sink rows never appear."""
    from streamjoin_spark.sources.delta import SINK_FLAG, sink_source

    # scope key = cid; row key = oid
    slice_df = spark.createDataFrame(
        [(10, 1, "a"), (13, 2, "x")], "oid long, cid long, name string"
    )
    affected = spark.createDataFrame([(1,), (2,)], "cid long")
    sink_now = spark.createDataFrame(
        [(10, 1, "old"), (11, 1, "gone"), (20, 9, "other")],
        "oid long, cid long, name string",
    )
    src = {
        r["oid"]: r
        for r in sink_source(
            slice_df, affected, ["cid"], ["oid"], sink_now
        ).collect()
    }
    assert set(src) == {10, 11, 13}          # 20 is out of scope: untouched
    assert src[10][SINK_FLAG] is True and src[10]["name"] == "a"   # update
    assert src[13][SINK_FLAG] is True and src[13]["name"] == "x"   # insert
    assert src[11][SINK_FLAG] is None                              # delete


def test_foreach_scope_sink_propagates_deletes(spark, tmp_path):
    """End-to-end: a 3-parameter foreachBatch sink receives the affected-key
    scope alongside the slice, so an external mirror (here a dict applying
    sink_source outcomes — exactly what delta_sink's MERGE does) converges
    to the batch twin under insert/update/DELETE. A 2-parameter sink cannot
    delete key 1's rows; this proves the extended contract can."""
    from streamjoin_spark.sources.delta import SINK_FLAG, sink_source

    CUST = "id long, name string, seg string"
    ORD = "oid long, cid long, price double"
    c_ct = ChangeTable.create(
        spark, str(tmp_path / "c"), spark.createDataFrame([], CUST).schema, ["id"]
    )
    o_ct = ChangeTable.create(
        spark, str(tmp_path / "o"), spark.createDataFrame([], ORD).schema, ["oid"]
    )
    c = Stream.fromChangeTable(c_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(o_ct, "o").primaryKeys("oid")

    mirror: dict = {}

    def sink(slice_df, affected_keys, _bid):
        sink_now = spark.createDataFrame(
            [(k, *v) for k, v in mirror.items()] or [],
            "oid long, id long, name string, price double",
        )
        src = sink_source(
            slice_df, affected_keys, ["id"], ["oid"], sink_now
        ).collect()
        for r in src:
            if r[SINK_FLAG]:
                mirror[r["oid"]] = (r["id"], r["name"], r["price"])
            else:
                mirror.pop(r["oid"], None)

    w = (
        c.join(o, "inner").on(c["id"] == o["cid"])
        .select(o["oid"], c["id"], c["name"], o["price"])
        .foreachBatch(sink)
    )
    c_ct.merge(spark.createDataFrame([(1, "ann", "a"), (2, "bob", "b")], CUST))
    o_ct.merge(spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, 7.0), (12, 1, 9.0)], ORD))
    w.run()
    assert set(mirror) == {10, 11, 12}

    c_ct.delete_where("id = 1")                     # orders 10,12 vanish
    o_ct.merge(spark.createDataFrame([(11, 2, 8.5)], ORD))  # update
    o_ct.merge(spark.createDataFrame([(13, 2, 1.0)], ORD))  # insert
    w.run()
    assert mirror == {11: (2, "bob", 8.5), 13: (2, "bob", 1.0)}


@pytest.mark.skipif(has_delta(), reason="delta-spark present: guard inert")
def test_delta_sink_requires_delta(spark):
    from streamjoin_spark.sources.delta import delta_sink

    with pytest.raises(ImportError, match="delta-spark"):
        delta_sink(spark, "/tmp/nowhere", ["id"])


def test_foreach_arity_detection(spark, tmp_path):
    """Only REQUIRED positional parameters opt a sink into the scope
    contract: a legacy 2-arg sink with a defaulted third parameter keeps
    (batch_df, batch_id); a 3-required-arg sink receives the scope."""
    CUST = "id long, name string, seg string"
    ORD = "oid long, cid long, price double"
    c_ct = ChangeTable.create(
        spark, str(tmp_path / "c2"), spark.createDataFrame([], CUST).schema, ["id"]
    )
    o_ct = ChangeTable.create(
        spark, str(tmp_path / "o2"), spark.createDataFrame([], ORD).schema, ["oid"]
    )
    c = Stream.fromChangeTable(c_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(o_ct, "o").primaryKeys("oid")
    legacy_calls, scoped_calls = [], []

    def legacy(df, bid, log=None):          # 2 required -> legacy contract
        legacy_calls.append((bid, df.count(), log))

    def scoped(df, keys, bid):              # 3 required -> scope contract
        scoped_calls.append((bid, df.count(), keys.columns))

    w1 = c.join(o, "inner").on(c["id"] == o["cid"]).foreachBatch(legacy)
    w2 = c.join(o, "inner").on(c["id"] == o["cid"]).foreachBatch(scoped)
    c_ct.merge(spark.createDataFrame([(1, "ann", "a")], CUST))
    o_ct.merge(spark.createDataFrame([(10, 1, 5.0)], ORD))
    w1.run()
    w2.run()
    assert legacy_calls == [(0, 1, None)]   # batch_id is the int, log unset
    assert scoped_calls == [(0, 1, ["id"])]
