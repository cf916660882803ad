"""Dump `.explain("formatted")` for declared queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <before|after> [query ...]
Writes plans/<tag>/<query>_<label>.txt for each named query (all queries
when none named). Uses the same session shape as bench.py so plan shapes
(AQE, broadcast thresholds, shuffle partitions) match what the bench runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    tag, label = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("plan-dump")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = names or list(qs)
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record, keep dumping
            txt = f"ERROR: {e}"
        with open(os.path.join(outdir, f"{name}_{label}.txt"), "w") as f:
            f.write(txt)
        print(f"# {name}: {len(txt)} chars", file=sys.stderr, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
