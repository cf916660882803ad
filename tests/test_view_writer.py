"""Maintained projections (Stream.writeToPath without join/groupBy): the
simplest IVM case — a row-locally transformed, keyed materialized view kept
converged under CDC by a single-leg _UnionLegStage."""

import pyspark.sql.functions as F
import pytest

from streamjoin_spark.changelog import ChangeTable
from streamjoin_spark.streams import Stream

from .test_incremental import assert_same

DOC = "doc_id long, text string"


def enrich(df):
    from streamjoin_spark.functions import normalize_text, token_count

    return df.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.md5(normalize_text(F.col("text"))).alias("fp"),
    )


@pytest.fixture()
def docs_ct(spark, tmp_path):
    return ChangeTable.create(
        spark, str(tmp_path / "docs"),
        spark.createDataFrame([], DOC).schema, ["doc_id"],
    )


def rows(spark, data):
    return spark.createDataFrame(data, DOC)


def test_maintained_view_converges(spark, tmp_path, docs_ct):
    w = (
        Stream.fromChangeTable(docs_ct, "docs_view_src")
        .primaryKeys("doc_id")
        .to(enrich)
        .writeToPath(str(tmp_path / "view"))
    )
    docs_ct.merge(rows(spark, [(1, "a b c"), (2, "hello world")]))
    w.run()
    assert_same(w.toDF(), enrich(docs_ct.snapshot()))

    # update rewrites the derived row; delete removes it; insert adds
    docs_ct.merge(rows(spark, [(1, "a b c d e"), (3, "fresh")]))
    docs_ct.delete_where("doc_id = 2")
    w.run()
    assert_same(w.toDF(), enrich(docs_ct.snapshot()))
    got = {r["doc_id"]: r["n_tokens"] for r in w.toDF().collect()}
    assert got == {1: 5, 3: 1}

    # restart on the same path: watermark persisted → no replay, and the
    # view is still converged
    w2 = (
        Stream.fromChangeTable(docs_ct, "docs_view_src2")
        .primaryKeys("doc_id")
        .to(enrich)
        .writeToPath(str(tmp_path / "view"))
    )
    assert w2.run() == 0
    assert_same(w2.toDF(), enrich(docs_ct.snapshot()))


def test_view_requires_primary_keys(spark, tmp_path, docs_ct):
    w = Stream.fromChangeTable(docs_ct, "nopk").to(enrich).writeToPath(
        str(tmp_path / "v2")
    )
    with pytest.raises(ValueError, match="primaryKeys"):
        w.run()


def test_view_feeds_downstream_stream(spark, tmp_path, docs_ct):
    """The maintained view is a first-class ChangeTable: a downstream
    consumer can read its change feed and chain further pipelines."""
    w = (
        Stream.fromChangeTable(docs_ct, "docs_view_src3")
        .primaryKeys("doc_id")
        .to(enrich)
        .writeToPath(str(tmp_path / "view3"))
    )
    docs_ct.merge(rows(spark, [(1, "x y"), (2, "x y"), (3, "z")]))
    w.run()
    agg = (
        w.toStream()
        .primaryKeys("doc_id")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeToPath(str(tmp_path / "agg3"))
    )
    agg.run()
    assert_same(
        agg.toDF(),
        enrich(docs_ct.snapshot()).groupBy("fp").agg(
            F.count(F.lit(1)).alias("n")
        ),
    )


def test_maintained_view_streaming_mode(spark, tmp_path, docs_ct):
    """The view writer under start(): a real writeStream trigger drains
    the backlog through the single-leg stage; a second start() resumes
    from the persisted watermark and catches the new churn."""
    w = (
        Stream.fromChangeTable(docs_ct, "docs_view_stream")
        .primaryKeys("doc_id")
        .to(enrich)
        .writeToPath(str(tmp_path / "sview"))
    )
    docs_ct.merge(rows(spark, [(1, "a b"), (2, "c d e")]))
    docs_ct.merge(rows(spark, [(3, "f")]))
    w.trigger(availableNow=True).queryName("view_stream").start()
    try:
        w.awaitTermination(120)
    finally:
        w.stop()
    assert_same(w.toDF(), enrich(docs_ct.snapshot()))

    docs_ct.merge(rows(spark, [(1, "a b c d")]))
    docs_ct.delete_where("doc_id = 2")
    w2 = (
        Stream.fromChangeTable(docs_ct, "docs_view_stream2")
        .primaryKeys("doc_id")
        .to(enrich)
        .writeToPath(str(tmp_path / "sview"))
    )
    w2.trigger(availableNow=True).start()
    try:
        w2.awaitTermination(120)
    finally:
        w2.stop()
    assert_same(w2.toDF(), enrich(docs_ct.snapshot()))


def test_vacuum_retain_option_housekeeps_target(spark, tmp_path, docs_ct):
    """writer option vacuumRetain=N: after a full drain the pipeline
    vacuums its managed targets to an N-version window (amortized — only
    once history outgrows 2N), the change_floor advances, old manifests
    drop, and the view stays converged through further CDC rounds."""
    w = (
        Stream.fromChangeTable(docs_ct, "docs_vac_src")
        .primaryKeys("doc_id")
        .to(enrich)
        .writeToPath(str(tmp_path / "view"))
        .option("vacuumRetain", 2)
    )
    for i in range(6):  # one target commit per drain
        docs_ct.merge(rows(spark, [(i, f"doc number {i} body")]))
        w.run()
    t = w.target
    assert t.change_floor() > 0                     # housekeeping ran
    assert t.version() - t.change_floor() <= 4      # window bounded
    with pytest.raises(FileNotFoundError):
        t.snapshot(1)                               # old manifest gone
    assert_same(w.toDF(), enrich(docs_ct.snapshot()))

    # still converges after housekeeping (watermarks were at head)
    docs_ct.merge(rows(spark, [(0, "rewritten zero"), (9, "nine")]))
    docs_ct.delete_where("doc_id = 1")
    w.run()
    assert_same(w.toDF(), enrich(docs_ct.snapshot()))


def test_auto_compact_option_bounds_fragmentation(
    spark, tmp_path, docs_ct, monkeypatch
):
    """writer option autoCompact=N (r10, VERDICT r9 task 6): after each
    full drain the pipeline runs maybe_compact on its managed targets, so
    a fragmenting churn workload (sub-part COW carries stat-disjoint
    dirs forward — one more commit dir per localized slice) stays under
    the dir cap automatically — while version history and convergence
    semantics are unchanged (compaction emits zero change rows)."""
    from streamjoin_spark import changelog as cl

    # single-bucket target with small split files: every localized churn
    # slice rewrites one split file and carries the rest, growing the
    # part's dir list by one per drain — the fragmentation autoCompact
    # must bound
    monkeypatch.setattr(cl, "SPLIT_ROWS_PER_FILE", 10)
    orig_create = ChangeTable.create
    monkeypatch.setattr(
        ChangeTable,
        "create",
        staticmethod(
            lambda *a, **kw: orig_create(*a, **{**kw, "n_buckets": 1})
        ),
    )
    w = (
        Stream.fromChangeTable(docs_ct, "docs_ac_src")
        .primaryKeys("doc_id")
        .to(enrich)
        .writeToPath(str(tmp_path / "view_ac"))
        .option("autoCompact", 3)
    )
    docs_ct.merge(rows(spark, [(i, f"body {i}") for i in range(50)]))
    w.run()
    frag_seen = 0
    for i in (0, 10, 20, 30, 40, 5, 15, 25):  # one split file per slice
        docs_ct.merge(rows(spark, [(i, f"rewritten body {i} round")]))
        w.run()
        frag_seen = max(frag_seen, w.target.max_dirs_per_part())
    t = w.target
    assert frag_seen >= 2, "workload never fragmented — test is vacuous"
    assert t.max_dirs_per_part() <= 3, t.max_dirs_per_part()
    assert_same(w.toDF(), enrich(docs_ct.snapshot()))
    ops = {r["operation"] for r in t.describe_history().collect()}
    assert "OPTIMIZE" in ops  # ran as a normal zero-change commit

    # converges through further CDC after auto-compaction
    docs_ct.merge(rows(spark, [(0, "final zero")]))
    docs_ct.delete_where("doc_id = 1")
    w.run()
    assert_same(w.toDF(), enrich(docs_ct.snapshot()))


def test_expectations_drop_mode_converges(spark, tmp_path, docs_ct):
    """writer option expectations + expectationsMode=drop: the maintained
    view holds exactly the rows passing the rules, converging under CDC
    (DLT expect_or_drop on a materialized view) — an update that makes a
    row fail DELETES it from the target, one that fixes it reinstates."""
    w = (
        Stream.fromChangeTable(docs_ct, "docs_exp_src")
        .primaryKeys("doc_id")
        .to(enrich)
        .writeToPath(str(tmp_path / "view"))
        .option("expectations", {"min_tokens": "n_tokens >= 2"})
        .option("expectationsMode", "drop")
    )

    def twin():
        return enrich(docs_ct.snapshot()).where(F.col("n_tokens") >= 2)

    docs_ct.merge(rows(spark, [(1, "a b c"), (2, "solo"), (3, "x y")]))
    w.run()
    assert_same(w.toDF(), twin())
    assert {r["doc_id"] for r in w.toDF().collect()} == {1, 3}

    docs_ct.merge(rows(spark, [(1, "shrunk"), (2, "now two tokens")]))
    w.run()                      # 1 fails now (deleted), 2 passes (appears)
    assert_same(w.toDF(), twin())
    assert {r["doc_id"] for r in w.toDF().collect()} == {2, 3}


def test_expectations_fail_mode_blocks_commit(spark, tmp_path, docs_ct):
    """expectationsMode=fail (default): a violating slice raises BEFORE
    commit — target and watermark unchanged — and the drain succeeds after
    the upstream fix (DLT expect_or_fail, exactly-once preserved)."""
    w = (
        Stream.fromChangeTable(docs_ct, "docs_exp_f_src")
        .primaryKeys("doc_id")
        .to(enrich)
        .writeToPath(str(tmp_path / "view"))
        .option("expectations", {"min_tokens": "n_tokens >= 2"})
    )
    docs_ct.merge(rows(spark, [(1, "a b c"), (2, "ok fine")]))
    w.run()
    assert w.toDF().count() == 2

    docs_ct.merge(rows(spark, [(3, "bad")]))
    with pytest.raises(ValueError, match="expectation violation"):
        w.run()
    assert w.toDF().count() == 2            # nothing committed

    docs_ct.merge(rows(spark, [(3, "bad fixed now")]))
    w.run()                                  # same slice retried + the fix
    assert {r["doc_id"] for r in w.toDF().collect()} == {1, 2, 3}


def test_expectations_quarantine_mode(spark, tmp_path, docs_ct):
    """expectationsMode=quarantine: the target holds passing rows (drop
    semantics) AND failing rows land in a content-addressed side
    ChangeTable with their violations — retried slices merge to no-ops
    (exactly-once audit log)."""
    from streamjoin_spark.changelog import ChangeTable as CT

    qpath = str(tmp_path / "quarantine")
    w = (
        Stream.fromChangeTable(docs_ct, "docs_exp_q_src")
        .primaryKeys("doc_id")
        .to(enrich)
        .writeToPath(str(tmp_path / "view"))
        .option("expectations", {"min_tokens": "n_tokens >= 2"})
        .option("expectationsMode", "quarantine")
        .option("expectationsQuarantinePath", qpath)
    )
    docs_ct.merge(rows(spark, [(1, "a b c"), (2, "solo"), (3, "x y")]))
    w.run()
    assert {r["doc_id"] for r in w.toDF().collect()} == {1, 3}
    qt = CT(spark, qpath)
    qrows = qt.snapshot().collect()
    assert {r["doc_id"] for r in qrows} == {2}
    assert qrows[0]["_violations"] == "min_tokens"

    # same bad row re-derived in a later slice (doc 3 churns, doc 2
    # unchanged stays out of scope; then doc 2 churns while still bad):
    # content-addressed merge keeps exactly one quarantine copy per
    # distinct bad row version
    docs_ct.merge(rows(spark, [(2, "nope")]))
    w.run()
    assert qt.snapshot().count() == 2          # two DISTINCT bad versions
    docs_ct.merge(rows(spark, [(2, "nope")]))  # idempotent re-merge (no-op
    w.run()                                    # change feed -> no new slice)
    assert qt.snapshot().count() == 2
    assert {r["doc_id"] for r in w.toDF().collect()} == {1, 3}

    # COMMIT-FREE retry law: re-deriving an already-quarantined _qid in a
    # later slice must not advance the quarantine table's version (merge
    # would emit spurious update_pre/post history for identical rows; the
    # gate anti-joins known _qids away and skips the merge entirely)
    docs_ct.merge(rows(spark, [(2, "no")]))    # a third DISTINCT bad version
    w.run()
    assert qt.snapshot().count() == 3
    v_mid = qt.version()
    docs_ct.merge(rows(spark, [(2, "nope")]))  # back to a known bad row
    w.run()
    assert qt.snapshot().count() == 3
    assert qt.version() == v_mid


def test_merge_schema_option_evolves_view(spark, tmp_path):
    """writer option mergeSchema=true: when the SOURCE evolves a new
    column and the transform passes it through, the maintained target
    WIDENS (old rows read back null) and keeps converging; without the
    option the extra column is silently projected away (strict default)."""
    src = ChangeTable.create(
        spark, str(tmp_path / "src"),
        spark.createDataFrame([], DOC).schema, ["doc_id"],
    )
    w = (
        Stream.fromChangeTable(src, "docs_ms_src")
        .primaryKeys("doc_id")
        .writeToPath(str(tmp_path / "view"))
        .option("mergeSchema", "true")
    )
    src.merge(rows(spark, [(1, "a b"), (2, "c d")]))
    w.run()
    assert set(w.toDF().columns) == {"doc_id", "text"}

    wide = spark.createDataFrame(
        [(3, "e f", "en")], "doc_id long, text string, lang string"
    )
    src.merge(wide, merge_schema=True)           # source evolves
    w.run()
    out = {r["doc_id"]: r for r in w.toDF().collect()}
    assert set(w.toDF().columns) == {"doc_id", "text", "lang"}
    assert out[3]["lang"] == "en"
    assert out[1]["lang"] is None                # old rows null-fill

    # further CDC over the widened schema still converges
    src.merge(spark.createDataFrame(
        [(1, "a b c", "de")], "doc_id long, text string, lang string"))
    src.delete_where("doc_id = 2")
    w.run()
    out = {r["doc_id"]: (r["text"], r["lang"]) for r in w.toDF().collect()}
    assert out == {1: ("a b c", "de"), 3: ("e f", "en")}

    # strict default: the extra column is projected away, not an error
    w2 = (
        Stream.fromChangeTable(src, "docs_ms_strict")
        .primaryKeys("doc_id")
        .writeToPath(str(tmp_path / "view_strict"))
    )
    w2.run()
    assert set(w2.toDF().columns) == {"doc_id", "text", "lang"}
