"""Measure stageParallelism on vs off at 10× (VERDICT r6 task 6).

Two topologies, one CDC round each, wall-clock per drain:

- **diamond** (two independent join branches feeding a final join — the
  shape stageParallelism exists for): branches sit in one topological
  level and drain concurrently when parallelism ≥ 2.
- **chain** (join → agg, the ivm_chain_cdc shape): stages are DEPENDENT,
  so parallelism cannot overlap them — expected a wash; measured so the
  claim is a number, not an argument.

Usage: python tools/parallelism_bench.py [sf_dir]  (default /tmp/scale/sf1)
Prints one JSON line per (topology, parallelism).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, sf_dir: str, topology: str, parallelism: int) -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from streamjoin_spark.changelog import ChangeTable
    from streamjoin_spark.streams import Stream

    E._prep(spark)
    cust = E._t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    orders = (
        E._t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 4 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    li = (
        E._t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 4 == 0)
        .select(
            # deterministic row id; orderkey shares the b1 column name so
            # the diamond's final join can use onKeys
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("l_id"),
            F.col("l_orderkey").alias("o_orderkey"),
            "l_partkey", "l_quantity",
        )
    )
    part = E._t(spark, sf_dir, "part").select("p_partkey", "p_brand")

    base = tempfile.mkdtemp(prefix=f"sj_par_{topology}_{parallelism}_")
    cct = ChangeTable.create(spark, f"{base}/c", cust.schema, ["c_custkey"], n_buckets=8)
    oct_ = ChangeTable.create(spark, f"{base}/o", orders.schema, ["o_orderkey"], n_buckets=8)
    cct.merge(cust)
    oct_.merge(orders)
    c = Stream.fromChangeTable(cct, "c").primaryKeys("c_custkey")
    o = Stream.fromChangeTable(oct_, "o").primaryKeys("o_orderkey")
    b1 = c.join(o, "inner").on(c["c_custkey"] == o["o_custkey"])

    if topology == "diamond":
        lct = ChangeTable.create(spark, f"{base}/l", li.schema, ["l_id"], n_buckets=8)
        pct = ChangeTable.create(spark, f"{base}/p", part.schema, ["p_partkey"], n_buckets=8)
        lct.merge(li)
        pct.merge(part)
        ls = Stream.fromChangeTable(lct, "l").primaryKeys("l_id")
        ps = Stream.fromChangeTable(pct, "p").primaryKeys("p_partkey")
        b2 = ls.join(ps, "inner").on(ls["l_partkey"] == ps["p_partkey"])
        builder = b1.join(b2.stage("b2"), "inner").onKeys("o_orderkey")
    else:
        builder = (
            b1.groupBy("c_mktsegment")
            .agg(F.sum("o_totalprice").alias("total"),
                 F.count(F.lit(1)).alias("n"))
        )
    w = builder.writeToPath(f"{base}/out").option(
        "stageParallelism", parallelism
    )
    t0 = time.monotonic()
    w.run()
    bulk_s = time.monotonic() - t0

    # CDC round on both branches
    cct.merge(cust.where(F.col("c_custkey") % 5 == 0).select(
        "c_custkey", "c_name", F.lit("MOVED").alias("c_mktsegment")))
    oct_.delete_where("o_orderkey % 13 = 1")
    if topology == "diamond":
        pct.merge(part.where(F.col("p_partkey") % 7 == 0).select(
            "p_partkey", F.lit("REBRAND").alias("p_brand")))
    t0 = time.monotonic()
    w.run()
    churn_s = time.monotonic() - t0
    rows = w.toDF().count()
    return {
        "topology": topology, "parallelism": parallelism,
        "bulk_s": round(bulk_s, 1), "churn_s": round(churn_s, 1),
        "rows": rows,
    }


def main() -> None:
    from streamjoin_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/sf1"
    spark = get_spark("par_bench", cpus=32, shuffle_partitions=32)
    for topology in ("diamond", "chain"):
        for p in (1, 2):
            print(json.dumps(run(spark, sf_dir, topology, p)), flush=True)


if __name__ == "__main__":
    main()
