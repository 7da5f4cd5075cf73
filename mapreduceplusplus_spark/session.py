"""SparkSession factory tuned for this engine.

The reference exposes two scale knobs: M = number of input files and
R = ``MR_REDUCE_NUM_TASKS`` (reference ``CMakeLists.txt:43-45``).  Spark's
analogue of R is ``spark.sql.shuffle.partitions``; M is implicit in the
file-scan split planning (``spark.sql.files.maxPartitionBytes``).

Scale posture (100 TB design, local[32] test):
- AQE on: runtime partition coalescing, skew-join splitting, and
  broadcast-join conversion replace any hand-tuned static plan.
- shuffle.partitions sized to cores locally; on a real cluster this is
  overridden upward (or left to AQE's initialPartitionNum).
- Arrow enabled so the Pandas-UDF escape hatches (the reference's
  arbitrary-UDF model) move columnar batches, not pickled rows.
- session timezone pinned UTC so timestamp semantics are stable across
  engines (DuckDB oracle is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mapreduceplusplus_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with the engine's defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone to UTC (runtime-settable SQL conf).

    Every declared query calls this so timestamp→string rendering matches
    the UTC-naive DuckDB oracle even when the caller built the session.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
