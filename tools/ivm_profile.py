"""Per-slice IVM cost profile from the metricsPath table (VERDICT r6 task 5).

Runs the standard customer⋈orders CDC round (the ivm_join_cdc shape) at a
given scale factor with ``metricsPath`` set, then derives the
regime-normalized per-slice cost profile the driver wall-clock totals
can't show. Two cost classes exist by construction: the FIRST slice per
target takes the first-cycle single-write path (2 Spark jobs, cheapest
commit in the protocol); every later slice pays the scope-diff rewrite
(~5 jobs), machinery-bound and nearly byte-independent at test scales.
BASELINE.md records both; a driver-side ivm_* drift (e.g. r6's join_cdc
16.9→20.2 s) is attributable in one look by re-running this at the same
sf: a host regime shift moves BOTH classes proportionally, a protocol/
plan regression moves one class (or the rung distribution).

Usage: python tools/ivm_profile.py [sf_dir ...]   (default sf0.001 sf0.1)
Prints one JSON line per sf: {"sf_dir", "slices": [per-slice records],
"total_s", "bulk_slice_s", "churn_slice_s_median",
"churn_slice_s_range", "rungs"}.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile(spark, sf_dir: str) -> dict:
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
    base = tempfile.mkdtemp(prefix="sj_ivm_profile_")
    cct = ChangeTable.create(
        spark, f"{base}/c", cust.schema, ["c_custkey"], n_buckets=8
    )
    oct_ = ChangeTable.create(
        spark, f"{base}/o", orders.schema, ["o_orderkey"], n_buckets=8
    )
    cct.merge(cust)
    oct_.merge(orders)
    c = Stream.fromChangeTable(cct, "c").primaryKeys("c_custkey")
    o = Stream.fromChangeTable(oct_, "o").primaryKeys("o_orderkey")
    w = (
        c.join(o, "inner")
        .on(c["c_custkey"] == o["o_custkey"])
        .select(c["c_custkey"], c["c_mktsegment"],
                o["o_orderkey"], o["o_totalprice"])
        .writeToPath(f"{base}/state")
        # several bounded slices instead of one bulk slice, so the fit
        # has points across the byte range
        .option("maxVersionsPerTrigger", 1)
        .option("metricsPath", f"{base}/metrics")
    )
    w.run()
    # the ivm_join_cdc churn round: updates fan out, deletes retract,
    # clones insert
    cct.merge(
        cust.where(F.col("c_custkey") % 5 == 0).select(
            "c_custkey", "c_name", F.lit("MOVED").alias("c_mktsegment")
        )
    )
    oct_.delete_where("o_orderkey % 13 = 1")
    oct_.merge(
        orders.where(F.col("o_orderkey") % 17 == 2).select(
            (F.col("o_orderkey") + F.lit(10000000)).alias("o_orderkey"),
            "o_custkey", "o_totalprice",
        )
    )
    w.run()
    # micro-churn rounds of decreasing width → byte spread across slices
    for mod in (7, 23, 101):
        cct.merge(
            cust.where(F.col("c_custkey") % mod == 3).select(
                "c_custkey", "c_name", F.lit(f"M{mod}").alias("c_mktsegment")
            )
        )
        w.run()

    mt = ChangeTable(spark, f"{base}/metrics")
    recs = sorted(
        (r.asDict() for r in mt.snapshot().collect()),
        key=lambda r: r["seq"],
    )
    slices = [
        {
            "mb": round((r["slice_bytes"] or 0) / 1e6, 3),
            "s": r["seconds"],
            "rows_out": r["rows_out"],
            "rung": r["rung"],
        }
        for r in recs
    ]
    # Two distinct cost classes (measured r7): the FIRST slice takes the
    # first-cycle single-write fast path (2 jobs — the cheapest commit in
    # the protocol, whatever its bytes), every later slice pays the
    # scope-diff rewrite (~5 jobs), machinery-bound and nearly
    # byte-independent at test scales. Report them separately — a
    # per-MB regression across the classes is structurally negative and
    # meaningless.
    bulk, churn = slices[0], slices[1:]
    churn_s = sorted(x["s"] for x in churn)
    rungs: dict = {}
    for r in recs:
        rungs[str(r["rung"])] = rungs.get(str(r["rung"]), 0) + 1
    return {
        "sf_dir": sf_dir,
        "slices": slices,
        "total_s": round(sum(x["s"] for x in slices), 2),
        "bulk_slice_s": bulk["s"],
        "churn_slice_s_median": churn_s[len(churn_s) // 2] if churn_s else None,
        "churn_slice_s_range": (
            [churn_s[0], churn_s[-1]] if churn_s else None
        ),
        "rungs": rungs,
    }


def main() -> None:
    from streamjoin_spark.session import get_spark

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.1",
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ivm_profile", cpus=cpus, shuffle_partitions=cpus)
    for sf in sf_dirs:
        print(json.dumps(profile(spark, sf)), flush=True)


if __name__ == "__main__":
    main()
