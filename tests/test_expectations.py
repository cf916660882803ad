"""Data-quality expectations: report / enforce / quarantine / FK checks,
with NULL-strict three-valued-logic semantics pinned."""

import pyspark.sql.functions as F

from streamjoin_spark.operators.expectations import (
    check,
    enforce,
    fk_check,
    quarantine,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 100.0)],
        "id long, amount double",
    )


RULES = {"amount_positive": "amount > 0", "id_small": "id <= 3"}


def test_check_counts_null_as_violation(spark):
    out = {r.rule: (r.n_rows, r.n_violations) for r in check(_df(spark), RULES).collect()}
    # amount > 0 is NULL for id=3 -> strict violation; -5 violates too
    assert out["amount_positive"] == (4, 2)
    assert out["id_small"] == (4, 1)


def test_enforce_drop_and_mark(spark):
    kept = enforce(_df(spark), RULES, mode="drop").select("id").collect()
    # id=2 fails amount_positive, id=3 NULL-fails it, id=4 fails id_small
    assert sorted(r.id for r in kept) == [1]
    marked = {
        r.id: sorted(r._violations)
        for r in enforce(_df(spark), RULES, mode="mark").collect()
    }
    assert marked[1] == []
    assert marked[2] == ["amount_positive"]
    assert marked[3] == ["amount_positive"]
    assert marked[4] == ["id_small"]


def test_quarantine_split(spark):
    good, bad = quarantine(_df(spark), RULES)
    assert sorted(r.id for r in good.collect()) == [1]
    assert "_violations" not in good.columns
    assert sorted(r.id for r in bad.collect()) == [2, 3, 4]


def test_fk_check_orphans_and_null_exclusion(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, ref long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "k long")
    orphans = fk_check(child, parent, {"ref": "k"}).collect()
    # 99 is an orphan; NULL ref is excluded per SQL FK semantics
    assert sorted(r.id for r in orphans) == [3]


def test_fk_check_plan_broadcasts_parent(spark):
    child = spark.range(100).select(F.col("id"), (F.col("id") % 10).alias("ref"))
    parent = spark.range(10).select(F.col("id").alias("k"))
    p = fk_check(child, parent, {"ref": "k"})._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_stream_expect_gates_incremental_pipeline(spark, tmp_path):
    """Stream.expect(drop) applies to the batch twin AND every incremental
    slice: rows failing the rule never reach the aggregate, and an update
    that makes a row fail REMOVES it from the maintained result."""
    from streamjoin_spark import Stream
    from streamjoin_spark.changelog import ChangeTable

    ct = ChangeTable.create(
        spark,
        str(tmp_path / "src"),
        spark.createDataFrame([], "id long, grp string, amount double").schema,
        ["id"],
    )
    w = (
        Stream.fromChangeTable(ct, "src")
        .primaryKeys("id")
        .expect({"amount_positive": "amount > 0"})
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeToPath(str(tmp_path / "out"))
    )
    ct.merge(
        spark.createDataFrame(
            [(1, "a", 5.0), (2, "a", -1.0), (3, "b", 2.0)],
            "id long, grp string, amount double",
        )
    )
    w.run()
    assert {r.grp: r.n for r in w.toDF().collect()} == {"a": 1, "b": 1}
    # id=1 turns invalid -> must vanish from the aggregate; id=2 turns valid
    ct.merge(
        spark.createDataFrame(
            [(1, "a", -9.0), (2, "a", 7.0)], "id long, grp string, amount double"
        )
    )
    w.run()
    assert {r.grp: r.n for r in w.toDF().collect()} == {"a": 1, "b": 1}
    ct.delete_where(F.col("id") == 3)
    w.run()
    assert {r.grp: r.n for r in w.toDF().collect()} == {"a": 1}


def test_stream_expect_mark_mode_incremental(spark, tmp_path):
    """mark mode carries the _violations array through the incremental
    pipeline (schema includes it; updates re-derive it)."""
    from streamjoin_spark import Stream
    from streamjoin_spark.changelog import ChangeTable

    ct = ChangeTable.create(
        spark,
        str(tmp_path / "src"),
        spark.createDataFrame([], "id long, amount double").schema,
        ["id"],
    )
    s = (
        Stream.fromChangeTable(ct, "src")
        .primaryKeys("id")
        .expect({"pos": "amount > 0"}, mode="mark")
        .to(lambda df: df.withColumn(
            "flags", F.concat_ws(",", "_violations")).drop("_violations"))
    )
    # materialize via a trivial incremental aggregate keyed by id
    w = (
        s.groupBy("id")
        .agg(F.max("flags").alias("flags"))
        .writeToPath(str(tmp_path / "out"))
    )
    ct.merge(spark.createDataFrame([(1, 5.0), (2, -1.0)], "id long, amount double"))
    w.run()
    got = {r["id"]: r["flags"] for r in w.toDF().collect()}
    assert got == {1: "", 2: "pos"}
    ct.merge(spark.createDataFrame([(2, 9.0)], "id long, amount double"))
    w.run()
    got = {r["id"]: r["flags"] for r in w.toDF().collect()}
    assert got == {1: "", 2: ""}
