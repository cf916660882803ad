"""Per-slice IVM cost profile from the metricsPath table (VERDICT r6 task 5).

Runs the standard customer⋈orders CDC round (the ivm_join_cdc shape) at a
given scale factor with ``metricsPath`` set, then derives the
regime-normalized per-slice cost model the driver wall-clock totals can't
show: seconds per slice vs slice change-bytes and rows_out, plus the
governor rung distribution. BASELINE.md records the fitted invariant; a
driver-side ivm_* drift (e.g. r6's join_cdc 16.9→20.2 s) is attributable
in one look by re-running this at the same sf and comparing the
machinery floor (intercept) and marginal byte cost (slope) — a host
regime shift moves BOTH proportionally; a plan/protocol regression moves
one.

Usage: python tools/ivm_profile.py [sf_dir ...]   (default sf0.001 sf0.1)
Prints one JSON line per sf: {"sf_dir", "slices", "total_s",
"floor_s_per_slice", "marginal_s_per_mb", "rungs", "rows_out"}.
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

    mt = ChangeTable(spark, f"{base}/metrics")
    recs = [r.asDict() for r in mt.snapshot().collect()]
    xs = [(r["slice_bytes"] or 0) / 1e6 for r in recs]   # MB
    ys = [r["seconds"] for r in recs]
    n = len(xs)
    # least-squares line: seconds = floor + marginal * MB
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs) or 1e-12
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
    floor = my - slope * mx
    rungs: dict = {}
    for r in recs:
        rungs[str(r["rung"])] = rungs.get(str(r["rung"]), 0) + 1
    return {
        "sf_dir": sf_dir,
        "slices": n,
        "total_s": round(sum(ys), 2),
        "bytes_mb": round(sum(xs), 2),
        "rows_out": sum(r["rows_out"] or 0 for r in recs),
        "floor_s_per_slice": round(floor, 3),
        "marginal_s_per_mb": round(slope, 4),
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
