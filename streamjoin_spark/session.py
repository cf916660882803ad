"""SparkSession factory tuned for this engine.

The reference (LeoneGarage/StreamJoin) sets Databricks-only knobs at import
time (reference: elzyme/streams.py:9 raises the adaptive broadcast threshold
to 2 GB). We instead centralize session construction with open-source Spark
configuration that expresses the same physical strategy:

- AQE on (runtime re-planning, skew-join handling, partition coalescing),
- a generous broadcast threshold so microbatch deltas broadcast,
- shuffle partitions sized to cores rather than the 200 default,
- Arrow enabled for the Pandas-UDF slow path,
- UTC session timezone so results compare bit-for-bit with external oracles.

At 100 TB on a real cluster the same settings apply, except
``spark.sql.shuffle.partitions`` should be sized to ~2-3x total cores (or
left to AQE's coalescing with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "streamjoin-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession with scale-appropriate defaults."""
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Microbatch deltas are capped small (see ChangeTable.max_bytes_per_trigger);
        # raise the broadcast threshold so the delta legs of incremental joins
        # broadcast instead of shuffling the snapshot side.
        .config("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
