"""SparkSession factory with scale-aware defaults.

The reference runs stock Spark with zero ``spark.sql.*`` tuning
(``/root/reference/yarn/spark-defaults.conf`` sets only master/memory).
We instead pin the knobs that matter at 100 TB:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- shuffle partitions sized to the local core count (on a real cluster
  this would be ~2-3x total executor cores; AQE coalesces down)
- Arrow enabled for the few Pandas-UDF paths (vectorized transfer)
- session timezone pinned to UTC so results are reproducible and
  comparable against external engines (DuckDB oracle)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "iowa-warehouse-engine", cores: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for local testing of
    cluster-shaped plans.

    Every config here is also the right *direction* on a 1000-executor
    cluster; only the magnitudes (shuffle partitions, broadcast
    threshold) would be re-tuned per deployment.
    """
    n = cores or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        # -- shuffle & parallelism ------------------------------------
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        # -- adaptive query execution ---------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- broadcast: all six reference dims are small; 64 MB leaves
        #    headroom for dimension growth at 100 TB fact scale
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # -- arrow for pandas-UDF paths (dedup/similarity/multimodal) --
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # -- reproducibility vs the DuckDB oracle ---------------------
        .config("spark.sql.session.timeZone", "UTC")
        # -- parquet scan sizing: 128 MB splits is the scale default --
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # quieter local runs
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
