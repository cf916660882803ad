"""Batch-twin tests for the join builder against plain DataFrame oracles."""

import pyspark.sql.functions as F

from streamjoin_spark import Stream

from .conftest import load


def same(a, b):
    """Bidirectional multiset equality, order-insensitive — the reference's
    oracle protocol (compare_dataframes, tests/SetupInputStream.py:214-227)."""
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_inner_join_on_keys(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    c = Stream.fromDataFrame(cust, "customer").primaryKeys("c_custkey")
    o = Stream.fromDataFrame(
        orders.withColumnRenamed("o_custkey", "c_custkey"), "orders"
    ).primaryKeys("o_orderkey")

    got = c.join(o, "inner").onKeys("c_custkey").toDF()
    exp = cust.join(orders, cust.c_custkey == orders.o_custkey, "inner").drop("o_custkey")
    assert set(got.columns) == set(exp.columns)
    same(got.select(*sorted(got.columns)), exp.select(*sorted(got.columns)))


def test_left_join_keeps_unmatched(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    c = Stream.fromDataFrame(cust, "customer").primaryKeys("c_custkey")
    o = Stream.fromDataFrame(
        orders.withColumnRenamed("o_custkey", "c_custkey"), "orders"
    ).primaryKeys("o_orderkey")

    got = c.join(o, "left").onKeys("c_custkey").toDF()
    exp = cust.join(orders, cust.c_custkey == orders.o_custkey, "left").drop("o_custkey")
    same(got.select(*sorted(got.columns)), exp.select(*sorted(got.columns)))
    assert got.count() >= cust.count()


def test_theta_join_expression(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    p = Stream.fromDataFrame(part, "part").primaryKeys("p_partkey")
    l = Stream.fromDataFrame(li, "lineitem").primaryKeys("l_orderkey", "l_linenumber")

    got = (
        p.join(l, "inner")
        .on((p["p_partkey"] == l["l_partkey"]) & (p["p_size"] < 10))
        .select(p["p_partkey"], p["p_size"], l["l_quantity"])
        .toDF()
    )
    exp = part.join(li, (part.p_partkey == li.l_partkey) & (part.p_size < 10)).select(
        "p_partkey", "p_size", "l_quantity"
    )
    same(got, exp)


def test_select_star_dedups_key(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    c = Stream.fromDataFrame(cust, "customer").primaryKeys("c_custkey")
    n = Stream.fromDataFrame(
        nation.withColumnRenamed("n_nationkey", "c_nationkey"), "nation"
    ).primaryKeys("c_nationkey")
    got = c.join(n, "inner").onKeys("c_nationkey").toDF()
    # joined key appears exactly once
    assert got.columns.count("c_nationkey") == 1


def test_chain_three_way(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = Stream.fromDataFrame(cust, "customer").primaryKeys("c_custkey")
    o = Stream.fromDataFrame(
        orders.withColumnRenamed("o_custkey", "c_custkey"), "orders"
    ).primaryKeys("o_orderkey")
    l = Stream.fromDataFrame(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem"
    ).primaryKeys("o_orderkey", "l_linenumber")

    got = c.join(o, "inner").onKeys("c_custkey").join(l, "inner").onKeys("o_orderkey").toDF()
    exp = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .drop("o_custkey", "l_orderkey")
    )
    assert got.count() == exp.count()


def test_groupby_agg_batch(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    l = Stream.fromDataFrame(li, "lineitem")
    got = (
        l.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .toDF()
    )
    exp = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )
    same(got, exp)


def test_join_then_groupby_chain(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    c = Stream.fromDataFrame(cust, "customer").primaryKeys("c_custkey")
    o = Stream.fromDataFrame(
        orders.withColumnRenamed("o_custkey", "c_custkey"), "orders"
    ).primaryKeys("o_orderkey")
    got = (
        c.join(o, "inner")
        .onKeys("c_custkey")
        .groupBy("c_mktsegment")
        .agg(F.sum("o_totalprice").alias("total"))
        .toDF()
    )
    exp = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum("o_totalprice").alias("total"))
    )
    same(got, exp)


def test_union_and_transform(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    o1 = Stream.fromDataFrame(orders, "orders").primaryKeys("o_orderkey")
    o2 = Stream.fromDataFrame(orders, "orders2").primaryKeys("o_orderkey")
    extra = orders.limit(5).select("o_orderkey", "o_totalprice")
    got = (
        o1.join(o2, "inner")
        .onKeys("o_orderkey")
        .select(o1["o_orderkey"], o1["o_totalprice"])
        .union(extra)
        .toDF()
    )
    assert got.count() == orders.count() + 5


def test_chained_select_inner_stream_refs(spark, sf_dir):
    """Refs to streams *inside* a staged chain resolve through the stage's
    output (lineage-aware side resolution in JoinBuilder._output_columns)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    o = Stream.fromDataFrame(
        orders.withColumnRenamed("o_custkey", "c_custkey"), "orders"
    ).primaryKeys("o_orderkey")
    c = Stream.fromDataFrame(cust, "customer").primaryKeys("c_custkey")
    l = Stream.fromDataFrame(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem"
    ).primaryKeys("o_orderkey", "l_linenumber")

    got = (
        l.join(o, "inner")
        .onKeys("o_orderkey")
        .join(c, "inner")
        .onKeys("c_custkey")
        .select(c["c_custkey"], c["c_name"], l["o_orderkey"], o["o_totalprice"])
        .toDF()
    )
    assert got.columns == ["c_custkey", "c_name", "o_orderkey", "o_totalprice"]
    exp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
    )
    same(got, exp)


def test_agg_stage_then_join_select_refs(spark, sf_dir):
    """HAVING-style agg → filter → join chain with refs to the staged agg
    stream (the TPC-H Q18 shape)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    l = Stream.fromDataFrame(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem"
    ).primaryKeys("o_orderkey", "l_linenumber")
    o = Stream.fromDataFrame(orders, "orders").primaryKeys("o_orderkey")
    big = (
        l.groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .to(lambda df: df.where(F.col("sum_qty") > 100))
        .stage("big_orders")
    )
    got = (
        big.join(o, "inner")
        .onKeys("o_orderkey")
        .select(big["o_orderkey"], big["sum_qty"], o["o_totalprice"])
        .toDF()
    )
    exp = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 100)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .select(F.col("l_orderkey").alias("o_orderkey"), "sum_qty", "o_totalprice")
    )
    same(got, exp)


def test_broadcast_hint_same_result(spark, sf_dir):
    """Explicit .broadcast('right') changes the physical strategy only —
    results identical to the unhinted plan."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    c = Stream.fromDataFrame(cust, "customer").primaryKeys("c_custkey")
    n = Stream.fromDataFrame(
        nation.withColumnRenamed("n_nationkey", "c_nationkey"), "nation"
    ).primaryKeys("c_nationkey")
    got = c.join(n, "inner").onKeys("c_nationkey").broadcast("right").toDF()
    exp = c.join(n, "inner").onKeys("c_nationkey").toDF()
    same(got, exp)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_reference_accessor_parity(spark, tmp_path):
    """Thin reference accessors a migrating pipeline may call
    (elzyme/streams.py:149-193, elzyme/utils.py:4): isTable/getCatalog/
    getSchema/getTableName parse the addressing name; path() reports the
    backing path; to_ddl renders a schema."""
    from streamjoin_spark import Stream
    from streamjoin_spark.changelog import ChangeTable, register_table
    from streamjoin_spark.functions import to_ddl

    p = str(tmp_path / "acc")
    ct = ChangeTable.create(
        spark, p, spark.createDataFrame([], "id long, v string").schema, ["id"]
    )
    register_table("cat.db.acc_t", p)

    s_path = Stream.fromChangeTable(ct, "s")
    assert s_path.path() == p and not s_path.isTable()
    assert s_path.getTableName() is None

    s_tbl = Stream.fromTable(spark, "cat.db.acc_t")
    assert s_tbl.isTable() and s_tbl.path() == p
    assert s_tbl.getCatalog() == "cat"
    assert s_tbl.getSchema() == "db"
    assert s_tbl.getTableName() == "acc_t"
    # metadata survives .to() cloning
    assert s_tbl.to(lambda df: df).getTableName() == "acc_t"

    ddl = to_ddl(ct.schema())
    assert "id" in ddl and "v" in ddl

    s_raw = Stream.fromPath(spark, str(tmp_path / "raw.parquet"), name="raw")
    assert s_raw.path() == str(tmp_path / "raw.parquet")
