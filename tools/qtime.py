"""Time a subset of declared queries, best-of-N, bench-identical session.

Usage: python tools/qtime.py [-n RUNS] [--noop] query [query ...]
Default action is df.count() (bench methodology); --noop times the
noop-sink write instead (computes every column, guide §1.4) for stage
isolation. Prints one line per query: name, per-run seconds, best.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    noop = False
    if "-n" in args:
        i = args.index("-n")
        runs = int(args[i + 1])
        del args[i : i + 2]
    if "--noop" in args:
        noop = True
        args.remove("--noop")
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("qtime")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    # warm the Python worker pool (same as bench.py)
    def _identity(batches):
        yield from batches

    spark.range(0, int(cpus) * 4, 1, int(cpus)).mapInPandas(
        _identity, "id long"
    ).count()

    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        ts = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            ts.append(round(time.monotonic() - t0, 3))
        print(f"{name}: runs={ts} best={min(ts)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
