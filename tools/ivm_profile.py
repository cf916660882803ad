"""Per-slice IVM cost profile from the metricsPath table (VERDICT r6 task 5;
r8: join/agg/chain shapes + multi-decade runs for the IVM scaling law).

Runs a churn-heavy customer⋈orders CDC round at a given scale factor with
``metricsPath`` set, then derives the regime-normalized per-slice cost
profile the driver wall-clock totals can't show. Three shapes, matching
the driver's ivm_* gate queries:

- ``join``  — c⋈o incremental join (the ivm_join_cdc shape)
- ``agg``   — grouped count+sum over orders (the ivm_agg_cdc shape, with
  the r7 replay-floor check on its commit path)
- ``chain`` — join staged into a grouped agg (staging ChangeTable + two
  stages, the ivm_chain_cdc cost structure)

Two cost classes exist by construction: the FIRST slice per target takes
the first-cycle single-write path (2 Spark jobs, cheapest commit in the
protocol); every later slice pays the scope-diff rewrite (~5 jobs),
machinery-bound and nearly byte-independent at test scales. BASELINE.md
records both; a driver-side ivm_* drift (e.g. r6's join_cdc 16.9→20.2 s)
is attributable in one look by re-running this at the same sf: a host
regime shift moves BOTH classes proportionally, a protocol/plan
regression moves one class (or the rung distribution).

Usage: python tools/ivm_profile.py [--shapes join,agg,chain] [sf_dir ...]
(default shapes: join; default sf_dirs: sf0.001 sf0.1)
Prints one JSON line per (shape, sf): {"shape", "sf_dir", "slices":
[per-slice records], "total_s", "bulk_slice_s", "churn_slice_s_median",
"churn_slice_s_range", "rungs", "maintained_rows"}.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile(spark, sf_dir: str, shape: str = "join") -> dict:
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
    oct_ = ChangeTable.create(
        spark, f"{base}/o", orders.schema, ["o_orderkey"], n_buckets=8
    )
    oct_.merge(orders)
    o = Stream.fromChangeTable(oct_, "o").primaryKeys("o_orderkey")
    # the customer table feeds only the join-bearing shapes — building it
    # for 'agg' would add untimed bulk-load jobs to an attribution tool
    cct = None
    if shape in ("join", "join_renamed", "chain"):
        cct = ChangeTable.create(
            spark, f"{base}/c", cust.schema, ["c_custkey"], n_buckets=8
        )
        cct.merge(cust)
        c = Stream.fromChangeTable(cct, "c").primaryKeys("c_custkey")
        joined = (
            c.join(o, "inner")
            .on(c["c_custkey"] == o["o_custkey"])
            .select(c["c_custkey"], c["c_mktsegment"],
                    o["o_orderkey"], o["o_totalprice"])
        )
    if shape == "join_renamed":
        # the reference's idiomatic declaration: every stream renamed at
        # source (r11 transform-aware scoped reads) — identical physics
        # to 'join' is the acceptance bar; pre-r11 every slice read fell
        # back to the full snapshots under these transforms
        cr = (
            Stream.fromChangeTable(cct, "c")
            .primaryKeys("ck")
            .to(lambda df: df.withColumnRenamed("c_custkey", "ck")
                .withColumnRenamed("c_mktsegment", "seg"))
        )
        orn = (
            Stream.fromChangeTable(oct_, "o")
            .primaryKeys("ok")
            .to(lambda df: df.withColumnRenamed("o_orderkey", "ok")
                .withColumnRenamed("o_custkey", "cid"))
        )
        w = (
            cr.join(orn, "inner")
            .on(cr["ck"] == orn["cid"])
            .select(cr["ck"], cr["seg"], orn["ok"], orn["o_totalprice"])
        )
    elif shape == "join":
        w = joined
    elif shape == "agg":
        w = o.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
        )
    elif shape == "chain":
        w = joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
        )
    else:  # pragma: no cover - CLI guard
        raise ValueError(f"unknown shape {shape!r}")
    w = (
        w.writeToPath(f"{base}/state")
        # several bounded slices instead of one bulk slice, so the fit
        # has points across the byte range
        .option("maxVersionsPerTrigger", 1)
        .option("metricsPath", f"{base}/metrics")
    )
    w.run()
    # the ivm_join_cdc churn round: updates fan out, deletes retract,
    # clones insert (customer churn only exists for the join-bearing
    # shapes; for 'agg' those commits touched an unconsumed table and
    # only wasted profile wall-clock)
    if cct is not None:
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
        ),
        # bulk-width batch (2.2M rows at 1000×): shuffled semi-join probe,
        # same physics note as the localized merge below — an explicit
        # broadcast of a batch this wide is heap-state-dependent on the
        # shared single JVM (OOM'd under external load, r10)
        hint_broadcast=False,
    )
    w.run()
    # micro-churn rounds of decreasing width → byte spread across slices
    for mod in (7, 23, 101):
        if cct is not None:
            cct.merge(
                cust.where(F.col("c_custkey") % mod == 3).select(
                    "c_custkey", "c_name",
                    F.lit(f"M{mod}").alias("c_mktsegment"),
                )
            )
        w.run()
    # LOCALIZED churn (r9): update the bottom ~1% of the key range — the
    # common production shape (recent-key updates). Sub-part COW should
    # make this slice's written bytes scale with Δ, not bucket size:
    # files whose key range sits above the horizon carry forward.
    o_hi = orders.agg(F.max("o_orderkey")).collect()[0][0] or 0
    oct_.merge(
        orders.where(F.col("o_orderkey") <= o_hi / 100).select(
            "o_orderkey", "o_custkey",
            (F.col("o_totalprice") * 1.01).alias("o_totalprice"),
        ),
        # at 1000× this batch is ~1M rows — a broadcast probe build OOMs
        # the shared single-JVM heap; the shuffled semi-join probe is the
        # right physics for a bulk-width batch anyway
        hint_broadcast=False,
    )
    w.run()
    # CUSTKEY-localized churn (r9): orders of the bottom ~1% of the
    # customer key range — the reconcile scope of every downstream slice
    # (join stages replace by preserved-side c_custkey; the agg shape
    # groups by o_custkey) is then LOCALIZED in the target's leading sort
    # key, so sub-part COW should cut the slice's written bytes toward
    # the Δ floor: target files above the horizon carry forward. This is
    # the r8 VERDICT write-amplification scenario made measurable on the
    # TARGET side (the o_orderkey-localized round above demonstrates the
    # source side).
    c_hi = orders.agg(F.max("o_custkey")).collect()[0][0] or 0
    oct_.merge(
        orders.where(F.col("o_custkey") <= c_hi / 100).select(
            "o_orderkey", "o_custkey",
            (F.col("o_totalprice") * 1.001).alias("o_totalprice"),
        ),
        hint_broadcast=False,  # bulk-width (375k rows at 1000×), as above
    )
    w.run()

    mt = ChangeTable(spark, f"{base}/metrics")
    recs = sorted(
        (r.asDict() for r in mt.snapshot().collect()),
        key=lambda r: r["seq"],
    )
    def _written_mb(table_path: str, v) -> float | None:
        """On-disk bytes this commit WROTE (data + change files of
        version v) — the write-amplification currency of the sub-part
        COW law (driver-side walk, no Spark job)."""
        if v is None:
            return None
        total = 0
        for sub in ("data", "changes"):
            d = os.path.join(table_path, sub, f"c{int(v)}")
            for root, _dirs, files in os.walk(d):
                for fn in files:
                    if fn.endswith(".parquet"):
                        total += os.path.getsize(os.path.join(root, fn))
        return round(total / 1e6, 3)

    slices = [
        {
            "mb": round((r["slice_bytes"] or 0) / 1e6, 3),
            "s": r["seconds"],
            "rows_out": r["rows_out"],
            "rung": r["rung"],
            # the metric record's target field IS the table path, so
            # written bytes attribute correctly to staging stages too
            "written_mb": _written_mb(
                r["target"] or f"{base}/state", r["committed_version"]
            ),
        }
        for r in recs
    ]
    # Reader-side data-skipping audit (r10): the localized-churn scope
    # replayed as a scoped read — full snapshot scan vs snapshot_pruned,
    # measured in the bytes of the files each plan actually opens
    # (inputFiles, driver-side size sum; the read twin of written_mb).
    def _files_mb(df) -> list:
        fs = df.inputFiles()
        total = 0
        for f in fs:
            p = f[7:] if f.startswith("file://") else f
            try:
                total += os.path.getsize(p)
            except OSError:
                pass
        return [len(fs), round(total / 1e6, 3)]

    # two scope shapes: the ORDERKEY-localized round's contiguous bottom-1%
    # (interval pruning — the recent-key production shape; the custkey
    # round's orderkeys are scattered across the whole range and
    # legitimately cannot prune), and a ≤64k "small" scope that engages
    # the exact value list + owning-part restriction. OPTIMIZE first:
    # the profile's final wide merge leaves the SOURCE in the unsorted
    # full-rewrite layout (merged per-part stats — the documented
    # needs-OPTIMIZE state); the audit measures the post-OPTIMIZE steady
    # state, which is what long-lived tables run in (the maintained
    # STATE tables are already there — their compacted rewrites is where
    # the profile's written_mb/slice wins live).
    oct_.compact()
    scope = orders.where(F.col("o_orderkey") <= o_hi / 100).select(
        "o_orderkey"
    )
    small_scope = orders.where(F.col("o_orderkey") <= o_hi / 2500).select(
        "o_orderkey"
    )
    read_audit = {
        "source_scope_rows": scope.count(),
        "source_full_files_mb": _files_mb(oct_.snapshot()),
        "source_pruned_files_mb": _files_mb(
            oct_.snapshot_pruned(scope, ["o_orderkey"])
        ),
        "source_small_scope_rows": small_scope.count(),
        "source_small_pruned_files_mb": _files_mb(
            oct_.snapshot_pruned(small_scope, ["o_orderkey"])
        ),
    }
    if shape == "agg":
        st = ChangeTable(spark, f"{base}/state")
        kscope = spark.range(0, max(1, int(c_hi / 100))).selectExpr(
            "id AS o_custkey"
        )
        read_audit["state_full_files_mb"] = _files_mb(st.snapshot())
        read_audit["state_pruned_files_mb"] = _files_mb(
            st.snapshot_pruned(kscope, ["o_custkey"])
        )

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
        "shape": shape,
        "sf_dir": sf_dir,
        "slices": slices,
        "total_s": round(sum(x["s"] for x in slices), 2),
        "bulk_slice_s": bulk["s"],
        "churn_slice_s_median": churn_s[len(churn_s) // 2] if churn_s else None,
        "churn_slice_s_range": (
            [churn_s[0], churn_s[-1]] if churn_s else None
        ),
        "rungs": rungs,
        "read_audit": read_audit,
        "maintained_rows": ChangeTable(spark, f"{base}/state")
        .snapshot().count(),
        "base": base,  # transient tables; main() deletes after reporting
    }


def main() -> None:
    from streamjoin_spark.session import get_spark

    args = list(sys.argv[1:])
    shapes = ["join"]
    if args and args[0] == "--shapes":
        shapes = args[1].split(",")
        args = args[2:]
    sf_dirs = args or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.1",
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ivm_profile", cpus=cpus, shuffle_partitions=cpus)
    import shutil

    for sf in sf_dirs:
        for shape in shapes:
            rec = profile(spark, sf, shape)
            print(json.dumps(rec), flush=True)
            # the profiled tables are multi-GB transients at 100×/1000×;
            # a three-shape sweep left un-deleted fills the disk (r10)
            shutil.rmtree(rec.pop("base"), ignore_errors=True)


if __name__ == "__main__":
    main()
