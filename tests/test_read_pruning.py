"""Reader-side data skipping (r10, VERDICT r9 task 1) + scope determinism.

The r9 footer stats pruned only REWRITES; these tests pin the read twin:
``snapshot_pruned``/``read_where`` open ~one split file per part for a
bounded key scope instead of scanning every file, the Stream plumbing
routes IVM slice reads through it (and falls back soundly under ``.to``
transforms), post-ZORDER tables prune on the clustered dimensions, and
the scope-frame localCheckpoint keeps pruning sound even for
NONdeterministic scope frames (VERDICT r9 watch-item 1).
"""

import random

import pyspark.sql.functions as F

from streamjoin_spark.changelog import ChangeTable, _entry_dir
from streamjoin_spark.streams import CHANGE_TYPE, DELETE, Stream


def _mk_split(spark, tmp_path, monkeypatch, n=10_000, n_buckets=4, split=1000):
    """A table whose parts hold several sorted split files each (the
    post-compaction steady state where file pruning has something to do)."""
    from streamjoin_spark import changelog as cl

    monkeypatch.setattr(cl, "SPLIT_ROWS_PER_FILE", split)
    # test tables sit under the probe-for-profit byte gate — disable it
    # so the pruning MECHANICS are what these tests pin
    monkeypatch.setattr(cl, "PRUNE_MIN_READ_BYTES", 0)
    df = spark.range(0, n).selectExpr("id", "concat('n', id) AS name")
    ct = ChangeTable.create(
        spark, str(tmp_path / "t"), df.schema, ["id"], n_buckets=n_buckets
    )
    ct.merge(df)
    assert ct._prunable(ct._manifest(ct.version()))
    return ct


def test_read_where_opens_few_files_and_is_exact(spark, tmp_path, monkeypatch):
    ct = _mk_split(spark, tmp_path, monkeypatch)
    all_files = ct.snapshot().inputFiles()
    assert len(all_files) >= 8  # split layout: several files per part

    keys = spark.createDataFrame([(7_777,), (42,)], "id long")
    out = ct.read_where(keys, ["id"])
    # exact rows
    rows = {r["id"]: r["name"] for r in out.collect()}
    assert rows == {7_777: "n7777", 42: "n42"}
    # file skipping: only the split files whose id range can hold a key
    opened = out.inputFiles()
    assert len(opened) <= 4, (len(opened), len(all_files))
    assert len(opened) < len(all_files)


def test_snapshot_pruned_is_superset_and_version_pinned(
    spark, tmp_path, monkeypatch
):
    ct = _mk_split(spark, tmp_path, monkeypatch, n=4_000)
    v1 = ct.version()
    ct.merge(spark.createDataFrame([(99, "upd")], "id long, name string"))
    keys = spark.createDataFrame([(99,)], "id long")
    pruned = ct.snapshot_pruned(keys, ["id"], version=v1)
    got = {r["name"] for r in pruned.where(F.col("id") == 99).collect()}
    assert got == {"n99"}  # pinned read: pre-update value
    # superset semantics: every row of the files it kept, nothing filtered
    assert pruned.count() >= 1
    # head read sees the update
    assert {
        r["name"] for r in ct.read_where(keys, ["id"]).collect()
    } == {"upd"}


def test_stream_static_pruned_routes_and_falls_back(
    spark, tmp_path, monkeypatch
):
    ct = _mk_split(spark, tmp_path, monkeypatch)
    s = Stream.fromChangeTable(ct).primaryKeys("id")
    keys = spark.createDataFrame([(123,)], "id long")
    pruned = s.static_pruned(ct.version(), keys, ["id"])
    full = s.static(ct.version())
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    # r11 (VERDICT r10 task 1): a RENAME transform — the reference's
    # idiomatic source shape — maps post-transform keys back to base
    # columns through the analyzed plan and keeps pruning
    s2 = s.to(lambda df: df.withColumnRenamed("name", "id2"))
    fb = s2.static_pruned(ct.version(), keys, ["id"])
    assert len(fb.inputFiles()) < len(full.inputFiles())
    assert "id2" in fb.columns
    # renamed KEY: scope arrives under the post-transform name and prunes
    s3 = s.to(lambda df: df.withColumnRenamed("id", "doc"))
    kd = spark.createDataFrame([(123,)], "doc long")
    fb3 = s3.static_pruned(ct.version(), kd, ["doc"])
    assert len(fb3.inputFiles()) < len(full.inputFiles())
    assert {r["doc"] for r in fb3.where("doc = 123").collect()} == {123}
    # a COMPUTED key cannot map → sound full-read fallback
    s4 = s.to(
        lambda df: df.withColumn("doc", F.col("id") + 1).drop("id")
    )
    fb4 = s4.static_pruned(ct.version(), kd, ["doc"])
    assert len(fb4.inputFiles()) == len(full.inputFiles())
    # a cross-row transform (window) cannot prune either, even though the
    # key passes through untouched — sibling columns would be computed
    # over the pruned row set
    from pyspark.sql import Window

    s5 = s.to(
        lambda df: df.withColumn(
            "rn", F.row_number().over(Window.orderBy("id"))
        )
    )
    fb5 = s5.static_pruned(ct.version(), keys, ["id"])
    assert len(fb5.inputFiles()) == len(full.inputFiles())


def test_nondeterministic_scope_stays_sound(spark, tmp_path, monkeypatch):
    """VERDICT r9 watch-item 1: the bounds/value-list probe, the scope
    joins, and the write must all read ONE evaluation of the scope frame.
    A nondeterministic scope (each evaluation samples a different key
    subset) would otherwise collect a value list missing keys the joins
    later see — wrongly excluding files and leaving stale+new duplicate
    PK rows. localCheckpoint pins it; this asserts the invariant that
    survives whatever subset was sampled."""
    ct = _mk_split(spark, tmp_path, monkeypatch, n=2_000, split=100)
    sample = F.udf(lambda: random.random(), "double").asNondeterministic()
    for _ in range(3):
        before = {r["id"] for r in ct.snapshot().select("id").collect()}
        scope = (
            ct.snapshot().select("id").where(sample() < 0.3)
        )
        empty = spark.createDataFrame([], "id long, name string")
        v0 = ct.version()
        v = ct.replace_keys(scope, ["id"], empty)  # delete the sampled keys
        if v == v0:
            continue  # sampled empty scope: no-op
        deleted = {
            r["id"]
            for r in ct.read_change_feed(starting_version=v)
            .where(F.col(CHANGE_TYPE) == DELETE)
            .select("id")
            .collect()
        }
        snap = ct.snapshot().select("id").collect()
        ids = [r["id"] for r in snap]
        assert len(ids) == len(set(ids)), "duplicate PK rows survived"
        assert set(ids) == before - deleted, (
            "snapshot diverged from the change feed: a file holding "
            "scoped keys was wrongly excluded from the rewrite"
        )


def test_zorder_declares_stats_columns_and_prunes(
    spark, tmp_path, monkeypatch
):
    """VERDICT r9 task 5: compact(zorder_by=...) records the clustered
    dimensions as manifest stats columns, so scoped reads (and rewrites)
    prune on them — before r10 the z-sorted files carried no manifest
    stats on x/y and post-ZORDER tables could not prune at all."""
    from streamjoin_spark import changelog as cl

    monkeypatch.setattr(cl, "SPLIT_ROWS_PER_FILE", 500)
    monkeypatch.setattr(cl, "PRUNE_MIN_READ_BYTES", 0)
    df = spark.range(0, 8_000).selectExpr(
        "id", "CAST(id % 97 AS long) AS x", "CAST(id % 89 AS long) AS y"
    )
    ct = ChangeTable.create(
        spark, str(tmp_path / "t"), df.schema, ["id"], n_buckets=2
    )
    ct.merge(df)
    v = ct.compact(zorder_by=["x", "y"])
    assert ct.stats_extra_cols == ("x", "y")
    assert "x" in ct._stats_cols() and "y" in ct._stats_cols()
    # THIS commit's entries already carry x stats (the meta bump publishes
    # after the entries are built — they must get the widened set anyway)
    m = ct._manifest(v)
    with_x = [
        e
        for es in m.values()
        for e in es
        if isinstance(e, dict) and "x" in (e.get("s") or {})
    ]
    assert with_x, "zorder commit entries carry no stats on the zorder cols"
    # a scope on x opens fewer files than the full snapshot
    keys = spark.createDataFrame([(3,)], "x long")
    pruned = ct.snapshot_pruned(keys, ["x"])
    full = ct.snapshot()
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    # and the exact read returns precisely the x=3 rows
    got = ct.read_where(keys, ["x"])
    assert got.count() == full.where("x = 3").count()


def test_sorted_fallback_entry_caps_footer_reads(
    spark, tmp_path, monkeypatch
):
    """r9 ADVICE: a SORTED dir exceeding _ENTRY_FILES_MAX must not fold
    stats with unbounded serial footer reads — the merged entry passes a
    cap and degrades to a stats-less plain entry over it."""
    from streamjoin_spark import changelog as cl

    monkeypatch.setattr(cl, "SPLIT_ROWS_PER_FILE", 100)
    df = spark.range(1_000).selectExpr("id", "concat('n', id) AS name")
    ct = ChangeTable.create(
        spark, str(tmp_path / "t"), df.schema, ["id"], n_buckets=1
    )
    ct.merge(df)
    entry0 = _entry_dir(ct._manifest(1)["0"][0])
    part_dir = (
        entry0
        if not entry0.endswith(".parquet")
        else entry0.rsplit("/", 1)[0]
    )
    import os

    n_files = len([
        f
        for f in os.listdir(os.path.join(ct.path, part_dir))
        if f.endswith(".parquet")
    ])
    monkeypatch.setattr(cl, "_ENTRY_FILES_MAX", max(1, n_files - 1))
    entries = ct._entries_for(part_dir, sorted_write=True)
    # one STATS-LESS entry (sizes still ride along): no unbounded fold
    assert len(entries) == 1 and _entry_dir(entries[0]) == part_dir
    assert not (isinstance(entries[0], dict) and entries[0].get("s"))


def test_est_bytes_if_scan_classifies_by_node_not_string(spark, tmp_path):
    """r9 ADVICE: plan classification must match node class names — a
    file path containing 'Join' is still a pure scan (returns bytes);
    real joins/aggregates/cached relations return None."""
    p = str(tmp_path / "Joined" / "AggregateStats")
    spark.range(100).selectExpr("id", "id AS join_key").write.parquet(p)
    df = spark.read.parquet(p)
    assert ChangeTable._est_bytes_if_scan(df) is not None
    joined = df.alias("a").join(df.alias("b"), "id")
    assert ChangeTable._est_bytes_if_scan(joined) is None
    agg = df.groupBy("join_key").count()
    assert ChangeTable._est_bytes_if_scan(agg) is None
    cached = spark.read.parquet(p).persist()
    try:
        cached.count()  # materialize so the optimized plan is the cache
        assert ChangeTable._est_bytes_if_scan(cached) is None
    finally:
        cached.unpersist()


def test_equi_column_pairs_extraction(spark):
    """Structural breadcrumbs on the Expr AST: equality pairs are provable
    through AND spines, and OR / theta / literal shapes yield nothing
    (pruning by an OR branch would be unsound)."""
    from streamjoin_spark.columns import equi_column_pairs
    from streamjoin_spark.streams import Stream

    a = Stream.fromDataFrame(spark.range(1).selectExpr("id AS x", "id AS z"), "a")
    b = Stream.fromDataFrame(spark.range(1).selectExpr("id AS y", "id AS w"), "b")
    pairs = equi_column_pairs(a["x"] == b["y"])
    assert [(p.name, q.name) for p, q in pairs] == [("x", "y")]
    pairs = equi_column_pairs((a["x"] == b["y"]) & (a["z"] > b["w"]))
    assert [(p.name, q.name) for p, q in pairs] == [("x", "y")]
    pairs = equi_column_pairs(
        (a["x"] == b["y"]) & (a["z"].eqNullSafe(b["w"]))
    )
    assert [(p.name, q.name) for p, q in pairs] == [("x", "y"), ("z", "w")]
    assert equi_column_pairs((a["x"] == b["y"]) | (a["z"] == b["w"])) == []
    assert equi_column_pairs(a["x"] > b["y"]) == []
    assert equi_column_pairs(a["x"] == 5) == []
    # the tagged __eq__ still evaluates correctly as a condition
    got = (
        a.static().alias("l")
        .join(b.static().alias("r"), (a["x"] == b["y"]).column(
            __import__("streamjoin_spark.columns", fromlist=["Binding"]).Binding.of((a, "l"), (b, "r"))
        ))
        .count()
    )
    assert got == 1


def test_ivm_join_slice_reads_are_pruned(spark, tmp_path, monkeypatch):
    """The join stage's slice + probe reads open only scope-intersecting
    files of a split source table — and the maintained view still
    converges exactly (the differential law)."""
    from streamjoin_spark import changelog as cl

    monkeypatch.setattr(cl, "SPLIT_ROWS_PER_FILE", 500)
    monkeypatch.setattr(cl, "PRUNE_MIN_READ_BYTES", 0)
    cust = spark.range(2_000).selectExpr(
        "id AS c_custkey", "concat('seg', id % 5) AS c_mktsegment"
    )
    orders = spark.range(8_000).selectExpr(
        "id AS o_orderkey", "CAST(id % 2000 AS long) AS o_custkey",
        "CAST(id AS double) AS o_totalprice"
    )
    cct = ChangeTable.create(
        spark, str(tmp_path / "c"), cust.schema, ["c_custkey"], n_buckets=2
    )
    oct_ = ChangeTable.create(
        spark, str(tmp_path / "o"), orders.schema, ["o_orderkey"], n_buckets=2
    )
    cct.merge(cust)
    oct_.merge(orders)
    c = Stream.fromChangeTable(cct, "c").primaryKeys("c_custkey")
    o = Stream.fromChangeTable(oct_, "o").primaryKeys("o_orderkey")
    w = (
        c.join(o, "inner")
        .on(c["c_custkey"] == o["o_custkey"])
        .select(c["c_custkey"], c["c_mktsegment"], o["o_orderkey"],
                o["o_totalprice"])
        .writeToPath(str(tmp_path / "state"))
    )
    w.run()
    batch = (
        c.join(o, "inner")
        .on(c["c_custkey"] == o["o_custkey"])
        .select(c["c_custkey"], c["c_mktsegment"], o["o_orderkey"],
                o["o_totalprice"])
        .toDF()
    )
    assert w.toDF().count() == batch.count()

    # a localized churn round: only low custkeys touched
    cct.merge(
        spark.range(40).selectExpr(
            "id AS c_custkey", "'MOVED' AS c_mktsegment"
        )
    )
    st = w.pipeline.stages[0]
    out = st.compute_slice()
    assert out is not None
    affected, new_slice, versions, nbytes = out
    opened = new_slice.inputFiles()
    full_c = len(cct.snapshot().inputFiles())
    full_o = len(oct_.snapshot().inputFiles())
    # the slice's preserved-side read is file-pruned (the o side keeps a
    # full read here: o_custkey carries no stats on the orders table)
    assert len(opened) < full_c + full_o, (len(opened), full_c, full_o)
    st.process()  # drains the slice just computed (fresh compute inside)
    w.run()
    got = {(r["c_custkey"], r["o_orderkey"]): r["c_mktsegment"]
           for r in w.toDF().collect()}
    exp = {(r["c_custkey"], r["o_orderkey"]): r["c_mktsegment"]
           for r in (
               c.join(o, "inner")
               .on(c["c_custkey"] == o["o_custkey"])
               .select(c["c_custkey"], c["c_mktsegment"], o["o_orderkey"],
                       o["o_totalprice"]).toDF()
           ).collect()}
    assert got == exp


def test_probe_for_profit_gate_skips_tiny_tables(spark, tmp_path, monkeypatch):
    """Scoped reads must not pay bounds-probe jobs on snapshots too small
    for pruning to matter: entries carry their on-disk sizes (the Delta
    add-file size analog) and a sub-threshold total reads everything —
    exactness is untouched (read_where's semi filter still applies)."""
    from streamjoin_spark import changelog as cl

    monkeypatch.setattr(cl, "SPLIT_ROWS_PER_FILE", 1000)
    df = spark.range(0, 10_000).selectExpr("id", "concat('n', id) AS name")
    ct = ChangeTable.create(
        spark, str(tmp_path / "t"), df.schema, ["id"], n_buckets=4
    )
    ct.merge(df)
    m = ct._manifest(ct.version())
    assert all(
        isinstance(e, dict) and "b" in e for es in m.values() for e in es
    ), "entries must carry byte sizes"
    keys = spark.createDataFrame([(42,)], "id long")
    pruned = ct.snapshot_pruned(keys, ["id"])  # default threshold: skip
    assert len(pruned.inputFiles()) == len(ct.snapshot().inputFiles())
    got = {r["id"] for r in ct.read_where(keys, ["id"]).collect()}
    assert got == {42}


def test_read_where_scope_released_with_result(spark, tmp_path, monkeypatch):
    """r10 VERDICT watch-item 1 + r11 review: small scopes are inlined
    as literal filters (checkpoint freed before returning — the result
    composes freely, including chained temporaries); big scopes keep the
    semi-join whose checkpoint is finalizer-tied to the result object.
    Neither path may accumulate persistent-RDD blocks."""
    import gc

    from streamjoin_spark import changelog as cl

    ct = _mk_split(spark, tmp_path, monkeypatch)
    jsc = spark.sparkContext._jsc.sc()
    gc.collect()
    base = jsc.getPersistentRDDs().size()
    for i in range(5):
        keys = spark.createDataFrame([(i * 7,)], "id long")
        out = ct.read_where(keys, ["id"])
        assert out.count() == 1
        del out
    gc.collect()
    assert jsc.getPersistentRDDs().size() <= base
    # r11 review finding 3: CHAINED temporaries must survive — the
    # finalizer-only design freed the scope the moment the intermediate
    # result was GC'd and the derived frame crashed on evaluation
    keys = spark.createDataFrame([(3,), (7_777,)], "id long")
    rows = ct.read_where(keys, ["id"]).where("id > 100").collect()
    assert [r["id"] for r in rows] == [7_777]
    derived = ct.read_where(keys, ["id"]).select("name")
    gc.collect()
    assert {r["name"] for r in derived.collect()} == {"n3", "n7777"}
    # big-scope path (forced): finalizer releases with the result object
    monkeypatch.setattr(cl, "READ_WHERE_INLINE_MAX", 0)
    out = ct.read_where(keys, ["id"])
    assert out.count() == 2
    assert hasattr(out, "_sj_free_scope")
    out._sj_free_scope()
    gc.collect()
    assert jsc.getPersistentRDDs().size() <= base


def test_ivm_slice_reads_pruned_through_renamed_sources(
    spark, tmp_path, monkeypatch
):
    """r10 VERDICT task 1 'done' criterion: an IVM join slice over
    RENAMED sources (the reference's idiomatic declaration shape,
    SetupInputStream.py:170-202) opens ~one file's worth per part on a
    split table instead of the full snapshots — and still converges."""
    from streamjoin_spark import changelog as cl

    monkeypatch.setattr(cl, "SPLIT_ROWS_PER_FILE", 500)
    monkeypatch.setattr(cl, "PRUNE_MIN_READ_BYTES", 0)
    cust = spark.range(2_000).selectExpr(
        "id AS c_custkey", "concat('seg', id % 5) AS c_mktsegment"
    )
    orders = spark.range(8_000).selectExpr(
        "id AS o_orderkey", "CAST(id % 2000 AS long) AS o_custkey",
        "CAST(id AS double) AS o_totalprice"
    )
    cct = ChangeTable.create(
        spark, str(tmp_path / "c"), cust.schema, ["c_custkey"], n_buckets=2
    )
    oct_ = ChangeTable.create(
        spark, str(tmp_path / "o"), orders.schema, ["o_orderkey"], n_buckets=2
    )
    cct.merge(cust)
    oct_.merge(orders)
    # rename transforms on BOTH streams — pre-r11 this disabled every
    # scoped read in the slice (full-snapshot fallback)
    c = (
        Stream.fromChangeTable(cct, "c")
        .primaryKeys("ck")
        .to(lambda df: df.withColumnRenamed("c_custkey", "ck")
            .withColumnRenamed("c_mktsegment", "seg"))
    )
    o = (
        Stream.fromChangeTable(oct_, "o")
        .primaryKeys("ok")
        .to(lambda df: df.withColumnRenamed("o_orderkey", "ok")
            .withColumnRenamed("o_custkey", "cid"))
    )

    def build():
        return (
            c.join(o, "inner")
            .on(c["ck"] == o["cid"])
            .select(c["ck"], c["seg"], o["ok"], o["o_totalprice"])
        )

    w = build().writeToPath(str(tmp_path / "state"))
    w.run()
    # localized churn: only low custkeys touched
    cct.merge(
        spark.range(40).selectExpr(
            "id AS c_custkey", "'MOVED' AS c_mktsegment"
        )
    )
    st = w.pipeline.stages[0]
    out = st.compute_slice()
    assert out is not None
    affected, new_slice, versions, nbytes = out
    opened = new_slice.inputFiles()
    full_c = len(cct.snapshot().inputFiles())
    full_o = len(oct_.snapshot().inputFiles())
    # preserved side (c, pk ck→c_custkey) prunes through the rename;
    # the o side prunes nothing (cid carries no stats on orders) but the
    # total must be well under both full snapshots summed
    assert len(opened) < full_c + full_o, (len(opened), full_c, full_o)
    st.process()
    w.run()
    got = {(r["ck"], r["ok"]): r["seg"] for r in w.toDF().collect()}
    exp = {(r["ck"], r["ok"]): r["seg"] for r in build().toDF().collect()}
    assert got == exp


def test_chain_stage_probe_leg_prunes_like_leaf(spark, tmp_path, monkeypatch):
    """r10 VERDICT task 3: a depth-3 staged chain whose outer `.on()`
    condition references an INNER (pre-staging) stream must prune its
    probe-leg and slice reads like a leaf stage — key provenance composes
    through StagedStream (the staged output carries inner columns under
    the same name, and `_lineage` resolves the ref to the staged side)."""
    from streamjoin_spark import changelog as cl

    monkeypatch.setattr(cl, "SPLIT_ROWS_PER_FILE", 500)
    monkeypatch.setattr(cl, "PRUNE_MIN_READ_BYTES", 0)
    cust = spark.range(2_000).selectExpr(
        "id AS c_custkey", "concat('seg', id % 5) AS seg"
    )
    orders = spark.range(8_000).selectExpr(
        "id AS o_orderkey", "CAST(id % 2000 AS long) AS o_custkey"
    )
    items = spark.range(16_000).selectExpr(
        "id AS l_id", "CAST(id % 8000 AS long) AS l_orderkey"
    )
    nat = spark.range(2_000).selectExpr(
        "id AS n_custkey", "concat('nat', id % 25) AS n_name"
    )
    cct = ChangeTable.create(spark, str(tmp_path / "c"), cust.schema,
                             ["c_custkey"], n_buckets=2)
    oct_ = ChangeTable.create(spark, str(tmp_path / "o"), orders.schema,
                              ["o_orderkey"], n_buckets=2)
    lct = ChangeTable.create(spark, str(tmp_path / "l"), items.schema,
                             ["l_id"], n_buckets=2)
    nct = ChangeTable.create(spark, str(tmp_path / "n"), nat.schema,
                             ["n_custkey"], n_buckets=2)
    for ct, df in ((cct, cust), (oct_, orders), (lct, items), (nct, nat)):
        ct.merge(df)
    c = Stream.fromChangeTable(cct, "c").primaryKeys("c_custkey")
    o = Stream.fromChangeTable(oct_, "o").primaryKeys("o_orderkey")
    l = Stream.fromChangeTable(lct, "l").primaryKeys("l_id")
    n = Stream.fromChangeTable(nct, "n").primaryKeys("n_custkey")
    w = (
        c.join(o, "inner").on(c["c_custkey"] == o["o_custkey"])
        .select(c["c_custkey"], c["seg"], o["o_orderkey"])
        .join(l, "inner").on(o["o_orderkey"] == l["l_orderkey"])
        .select(c["c_custkey"], o["o_orderkey"], l["l_id"])
        .join(n, "inner").on(c["c_custkey"] == n["n_custkey"])
        .select(c["c_custkey"], o["o_orderkey"], l["l_id"],
                n["n_custkey"], n["n_name"])
        .writeToPath(str(tmp_path / "state"))
    )
    w.run()
    st3 = w.pipeline.stages[-1]
    # the inner-stream ref (c_custkey, two stagings deep) IS provable
    assert st3._equi_pairs() == [("c_custkey", "n_custkey")]
    nct.merge(
        spark.range(10).selectExpr("id AS n_custkey", "'NEW' AS n_name")
    )
    out = st3.compute_slice()
    assert out is not None
    affected, new_slice, versions, nbytes = out
    staged = st3.preserved.change_table
    full = len(staged.snapshot().inputFiles()) + len(
        nct.snapshot().inputFiles()
    )
    assert len(new_slice.inputFiles()) < full
    st3.process()
    w.run()
    # convergence: the chain equals its batch twin after the churn
    assert w.toDF().where("n_name = 'NEW'").count() == 16_000 * 10 // 2000
