"""Pin the Delta bridge against delta-spark's DOCUMENTED API (r7 task 1).

delta-spark cannot be installed in this sandbox (pip resolution fails —
no network route to any index; attempt recorded in BASELINE.md r7), so the
live round-trip stays skip-marked. What CAN be certified offline is the
exact surface the bridge drives, pinned here against the documented API so
any drift between our adapter and delta-spark's contract fails a test
instead of a migration:

- **CDF reader options** (docs.delta.io/latest/delta-change-data-feed):
  batch reads use ``format("delta")`` + ``readChangeFeed=true`` +
  ``startingVersion``/``endingVersion``; streaming reads add
  ``maxFilesPerTrigger``; snapshot pinning uses ``versionAsOf`` and
  ``timestampAsOf``. A recording fake session captures every reader call
  DeltaSourceTable makes and asserts the exact option spellings/values.
- **CDF output schema**: ``_change_type`` ∈ {insert, update_preimage,
  update_postimage, delete}, ``_commit_version`` long,
  ``_commit_timestamp`` timestamp — the fixture frames use exactly the
  documented shape and ``normalize_cdf`` must map them onto the engine
  contract.
- **History surface**: ``DESCRIBE HISTORY`` with ``version`` +
  ``operationMetrics`` (byte-valued metrics summed for the governor).
- **DeltaTable merge-builder chain** (docs.delta.io/latest/delta-update):
  ``delta_sink`` must drive ``forPath/forName → alias → merge(src, cond)
  → whenMatchedDelete(condition) → whenMatchedUpdate(set) →
  whenNotMatchedInsert(condition, values) → execute()`` with a null-safe
  ON condition — verified end-to-end by a fake ``delta.tables`` module
  whose execute() APPLIES the documented MERGE semantics to an in-memory
  table, driven by a real incremental pipeline under insert/update/delete.
"""

import importlib.machinery
import sys
import types

import pyspark.sql.functions as F
import pytest

from streamjoin_spark.changelog import ChangeTable
from streamjoin_spark.sources import delta as delta_mod
from streamjoin_spark.sources.delta import DeltaSourceTable
from streamjoin_spark.streams import Stream

CDF = (
    "id long, name string, _change_type string, _commit_version int, "
    "_commit_timestamp timestamp"
)
DOCUMENTED_CHANGE_TYPES = {
    "insert", "update_preimage", "update_postimage", "delete",
}


class _RecordingReader:
    """Stand-in for spark.read / spark.readStream: records format/option/
    load calls, returns a canned CDF-shaped frame."""

    def __init__(self, result, log, kind):
        self._result = result
        self._log = log
        self._kind = kind
        self._fmt = None
        self._opts = {}

    def format(self, f):
        self._fmt = f
        return self

    def option(self, k, v):
        self._opts[k] = v
        return self

    def load(self, path):
        self._log.append((self._kind, self._fmt, dict(self._opts), path))
        return self._result

    def table(self, name):
        self._log.append((self._kind, self._fmt, dict(self._opts), name))
        return self._result


class _FakeSession:
    """Duck-session: routes read/readStream through recorders, DESCRIBE
    HISTORY through a canned frame, everything else to the real session."""

    def __init__(self, spark, cdf_df, hist_df, log):
        self._spark = spark
        self._cdf = cdf_df
        self._hist = hist_df
        self.log = log

    @property
    def read(self):
        return _RecordingReader(self._cdf, self.log, "batch")

    @property
    def readStream(self):
        return _RecordingReader(self._cdf, self.log, "stream")

    def sql(self, q):
        self.log.append(("sql", q))
        return self._hist

    def __getattr__(self, item):
        return getattr(self._spark, item)


@pytest.fixture()
def adapter(spark, monkeypatch):
    monkeypatch.setattr(delta_mod, "require_delta", lambda: None)
    cdf = spark.createDataFrame(
        [
            (1, "a", "insert", 0, None),
            (2, "b", "insert", 0, None),
            (2, "b", "update_preimage", 1, None),
            (2, "b2", "update_postimage", 1, None),
            (1, "a", "delete", 2, None),
        ],
        CDF,
    )
    hist = spark.createDataFrame(
        [
            (0, {"numOutputBytes": "1000"}),
            (1, {"numTargetBytesAdded": "64", "numTargetRowsUpdated": "1"}),
            (2, {"numRemovedBytes": "32"}),
        ],
        "version long, operationMetrics map<string,string>",
    )
    log: list = []
    fake = _FakeSession(spark, cdf, hist, log)
    a = DeltaSourceTable(fake, path="/delta/tbl")
    return a, log


def test_reader_option_spellings(adapter):
    """Every reader call uses the DOCUMENTED delta-spark option names."""
    a, log = adapter

    assert a.version() == 2
    assert log[-1] == ("sql", "DESCRIBE HISTORY delta.`/delta/tbl`")

    a.snapshot(1)
    kind, fmt, opts, path = log[-1]
    assert (kind, fmt, path) == ("batch", "delta", "/delta/tbl")
    assert opts == {"versionAsOf": 1}

    a.snapshot_as_of("2024-01-01")
    assert log[-1][2] == {"timestampAsOf": "2024-01-01"}

    a.read_change_feed(0).count()
    kind, fmt, opts, _ = [e for e in log if e[0] == "batch"][-1]
    assert fmt == "delta"
    assert opts == {"readChangeFeed": "true", "startingVersion": 0}

    a.read_change_range(1, 2)
    opts = [e for e in log if e[0] == "batch"][-1][2]
    assert opts == {
        "readChangeFeed": "true", "startingVersion": 1, "endingVersion": 2,
    }

    # empty backlog range: served from the always-valid [0, 0] window
    assert a.read_change_range(5, 4).count() == 0
    opts = [e for e in log if e[0] == "batch"][-1][2]
    assert opts == {
        "readChangeFeed": "true", "startingVersion": 0, "endingVersion": 0,
    }

    a.read_change_stream(max_files_per_trigger=7)
    kind, fmt, opts, _ = [e for e in log if e[0] == "stream"][-1]
    assert (kind, fmt) == ("stream", "delta")
    assert opts == {"readChangeFeed": "true", "maxFilesPerTrigger": 7}


def test_cdf_schema_normalization_and_head_cap(adapter):
    """The documented CDF output shape maps onto the engine contract:
    _commit_timestamp dropped, _commit_version long, change-type
    vocabulary passes through untouched, feed capped at the head."""
    a, _ = adapter
    out = a.read_change_feed(0)
    assert out.columns == ["id", "name", "_change_type", "_commit_version"]
    assert dict(out.dtypes)["_commit_version"] == "bigint"
    got_types = {r["_change_type"] for r in out.collect()}
    assert got_types == DOCUMENTED_CHANGE_TYPES


def test_history_operation_metrics_bytes(adapter):
    """Governor byte currency: byte-valued operationMetrics summed,
    row-count metrics ignored, absent metrics -> 0."""
    a, _ = adapter
    assert a.change_bytes(0) == 1000
    assert a.change_bytes(1) == 64      # numTargetRowsUpdated ignored
    assert a.change_bytes(2) == 32
    assert a.change_bytes(99) == 0


def test_table_name_addressing(spark, monkeypatch):
    """Catalog-name constructor reads via reader.table(name) and DESCRIBE
    HISTORY <name> — the reference's fromTable surface."""
    monkeypatch.setattr(delta_mod, "require_delta", lambda: None)
    log: list = []
    cdf = spark.createDataFrame([], CDF)
    hist = spark.createDataFrame(
        [(3, None)], "version long, operationMetrics map<string,string>"
    )
    a = DeltaSourceTable(
        _FakeSession(spark, cdf, hist, log), table="cat.db.orders"
    )
    assert a.name == "orders"
    assert a.version() == 3
    assert log[-1] == ("sql", "DESCRIBE HISTORY cat.db.orders")
    a.snapshot()
    assert log[-1] == ("batch", "delta", {}, "cat.db.orders")


# ---------------------------------------------------------------------------
# delta_sink against the documented DeltaTable merge-builder API
# ---------------------------------------------------------------------------


class _FakeMergeBuilder:
    """Records the documented merge-builder chain and APPLIES the
    documented MERGE semantics to the owning fake table's store on
    execute(): matched+delete-condition rows delete, matched rows update,
    unmatched+insert-condition rows insert."""

    def __init__(self, table, src, cond):
        self.table = table
        self.src = src
        self.cond = cond
        self.clauses = []

    def whenMatchedDelete(self, condition=None):
        self.clauses.append(("matched_delete", condition))
        return self

    def whenMatchedUpdate(self, set=None):  # noqa: A002 - documented kwarg
        self.clauses.append(("matched_update", sorted(set)))
        return self

    def whenNotMatchedInsert(self, condition=None, values=None):
        self.clauses.append(("not_matched_insert", condition, sorted(values)))
        return self

    def execute(self):
        self.table.merge_log.append(
            {"cond": self.cond, "clauses": list(self.clauses)}
        )
        from streamjoin_spark.sources.delta import SINK_FLAG

        for r in self.src.collect():
            key = r["oid"]
            if r[SINK_FLAG] is None:
                self.table.store.pop(key, None)   # matched delete
            else:
                self.table.store[key] = (r["id"], r["name"], r["price"])


class _FakeDeltaTable:
    instances: dict = {}

    def __init__(self, spark, target):
        self.spark = spark
        self.target = target
        self.store: dict = {}
        self.merge_log: list = []

    @classmethod
    def forPath(cls, spark, path):
        return cls.instances.setdefault(path, cls(spark, path))

    @classmethod
    def forName(cls, spark, name):
        return cls.instances.setdefault(name, cls(spark, name))

    def toDF(self):
        rows = [(k, *v) for k, v in self.store.items()]
        return self.spark.createDataFrame(
            rows or [], "oid long, id long, name string, price double"
        )

    def alias(self, _a):
        return self

    def merge(self, src, cond):
        return _FakeMergeBuilder(self, src, cond)


@pytest.fixture()
def fake_delta_modules(monkeypatch):
    mod = types.ModuleType("delta")
    mod.__spec__ = importlib.machinery.ModuleSpec("delta", None)
    tables = types.ModuleType("delta.tables")
    tables.__spec__ = importlib.machinery.ModuleSpec("delta.tables", None)
    tables.DeltaTable = _FakeDeltaTable
    mod.tables = tables
    monkeypatch.setitem(sys.modules, "delta", mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables)
    _FakeDeltaTable.instances = {}
    yield


def test_delta_sink_merge_builder_contract(spark, tmp_path, fake_delta_modules):
    """End-to-end: a real incremental join lands in a (fake) Delta table
    through delta_sink; the recorded builder chain matches the documented
    API and the applied MERGE semantics converge under insert/update/
    DELETE — the delete-propagation claim of the migration bridge."""
    from streamjoin_spark.sources.delta import delta_sink

    CUST = "id long, name string, seg string"
    ORD = "oid long, cid long, price double"
    c_ct = ChangeTable.create(
        spark, str(tmp_path / "c"),
        spark.createDataFrame([], CUST).schema, ["id"],
    )
    o_ct = ChangeTable.create(
        spark, str(tmp_path / "o"),
        spark.createDataFrame([], ORD).schema, ["oid"],
    )
    c = Stream.fromChangeTable(c_ct, "c").primaryKeys("id")
    o = Stream.fromChangeTable(o_ct, "o").primaryKeys("oid")
    sink = delta_sink(spark, "/delta/mirror", ["id"], row_keys=["oid"])
    w = (
        c.join(o, "inner").on(c["id"] == o["cid"])
        .select(o["oid"], c["id"], c["name"], o["price"])
        .foreachBatch(sink)
    )

    c_ct.merge(spark.createDataFrame([(1, "ann", "a"), (2, "bob", "b")], CUST))
    o_ct.merge(spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, 7.0), (12, 1, 9.0)], ORD))
    w.run()
    tbl = _FakeDeltaTable.instances["/delta/mirror"]
    assert set(tbl.store) == {10, 11, 12}

    # documented builder chain, null-safe ON condition, flag conditions
    m = tbl.merge_log[-1]
    assert m["cond"] == "t.`oid` <=> s.`oid`"
    kinds = [cl[0] for cl in m["clauses"]]
    assert kinds == ["matched_delete", "matched_update", "not_matched_insert"]
    assert m["clauses"][0][1] == "s.`__sj_new` IS NULL"
    assert m["clauses"][2][1] == "s.`__sj_new` IS NOT NULL"
    assert m["clauses"][1][1] == ["id", "name", "oid", "price"]

    # CDC: delete customer 1 (orders 10,12 must DELETE in the mirror),
    # update order 11, insert order 13
    c_ct.delete_where("id = 1")
    o_ct.merge(spark.createDataFrame([(11, 2, 8.5), (13, 2, 1.0)], ORD))
    w.run()
    assert tbl.store == {11: (2, "bob", 8.5), 13: (2, "bob", 1.0)}


def test_has_delta_sees_injected_runtime(fake_delta_modules):
    """has_delta() flips on when a delta runtime is importable — the same
    probe that will activate the live skip-marked round-trip test on a
    real cluster."""
    assert delta_mod.has_delta()


# ---------------------------------------------------------------------------
# scoped Delta reads (r11): scope_filter + adapter snapshot_pruned
# ---------------------------------------------------------------------------


def test_scope_filter_membership_shapes(spark):
    """scope_filter builds a per-column membership Column — the sound
    Cartesian SUPERSET of the tuple set — with null keys riding isNull,
    NaN scopes refusing, and over-cap scopes refusing (None = read all).
    Pure Spark; no delta-spark needed."""
    from streamjoin_spark.sources.delta import scope_filter

    data = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "k long, g string"
    )
    scope = spark.createDataFrame([(1, "a"), (3, None)], "k long, g string")
    cond = scope_filter(scope, ["k", "g"])
    assert cond is not None
    got = sorted(r["k"] for r in data.where(cond).collect())
    assert got == [1, 3]  # superset of the tuple set; exact here
    # single-column scope
    cond1 = scope_filter(scope, ["k"])
    assert sorted(r["k"] for r in data.where(cond1).collect()) == [1, 3]
    # over-cap refuses
    big = spark.range(100).selectExpr("id AS k")
    assert scope_filter(big, ["k"], cap=10) is None
    # NaN refuses (cross-engine NaN membership semantics)
    nan_scope = spark.createDataFrame([(float("nan"),)], "x double")
    assert scope_filter(nan_scope, ["x"]) is None
    # empty scope: provably matchless — a zero-row filter, never a
    # full-read fallback
    empty = spark.createDataFrame([], "k long")
    cond_empty = scope_filter(empty, ["k"])
    assert cond_empty is not None
    assert data.where(cond_empty).count() == 0
    # unhashable key types (array/struct): the set comprehension raises
    # TypeError — must be the sound full-snapshot fallback (None), not a
    # failed read (r11 ADVICE)
    arr_scope = spark.createDataFrame([([1, 2],), ([3],)], "k array<long>")
    assert scope_filter(arr_scope, ["k"]) is None


def test_adapter_snapshot_pruned_is_superset_and_falls_back(adapter, spark):
    """DeltaSourceTable.snapshot_pruned pushes the membership filter into
    the Delta scan (superset contract) and returns the plain snapshot
    for unbounded scopes (small=False)."""
    a, log = adapter
    scope = spark.createDataFrame([(1,)], "id long")
    out = a.snapshot_pruned(scope, ["id"])
    ids = {r["id"] for r in out.collect()}
    assert ids == {1}  # per-column exact for a single key col
    # unbounded scope: full snapshot, no collect
    full = a.snapshot_pruned(scope, ["id"], small=False)
    assert full.count() == a.snapshot().count()
