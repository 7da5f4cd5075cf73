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


def conf_for_scale(
    input_bytes: int,
    executors: int = 1,
    cores_per_executor: int = 32,
    executor_mem_bytes: int = 128 << 30,
) -> dict[str, str]:
    """Cluster-sizing recipe: the Spark confs this engine recommends for
    a given input size — the arithmetic behind every "would this hold at
    100 TB?" claim in the operator docstrings, stated once, executable,
    and unit-tested.

    Reasoning per knob:
    - ``spark.sql.files.maxPartitionBytes``: scan tasks should be
      128–256 MiB so a task neither starves the scheduler (too many)
      nor stalls stragglers (too few).  Kept at 256 MiB for large
      inputs — with 100 TB that is ~400k scan tasks, a fine granularity
      for 32k cores.
    - ``spark.sql.shuffle.partitions``: target ~200 MiB of pre-spill
      shuffle input per partition, floored at 2× total cores (always
      enough parallelism to occupy the cluster) and ceilinged at 200k
      (file-handle and scheduler sanity).  AQE coalesces DOWN from this
      at runtime, so erring high is safe; erring low cannot be fixed
      at runtime and spills.
    - ``spark.sql.adaptive.advisoryPartitionSizeInBytes``: 128 MiB —
      the post-coalesce target AQE aims for.
    - ``spark.sql.autoBroadcastJoinThreshold``: ~1% of executor memory,
      capped at 256 MiB: a broadcast table is materialized on the
      driver AND per-executor, so the ceiling protects both.

    Deliberately NOT set: executor/driver memory (cluster-manager
    territory), AQE toggles (always on, see ``get_spark``)."""
    total_cores = max(1, executors * cores_per_executor)
    scan_part = 256 << 20
    shuffle_parts = min(
        200_000,
        max(2 * total_cores, input_bytes // (200 << 20) or 1),
    )
    broadcast_cap = min(256 << 20, executor_mem_bytes // 100)
    return {
        "spark.sql.files.maxPartitionBytes": str(scan_part),
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(128 << 20),
        "spark.sql.autoBroadcastJoinThreshold": str(broadcast_cap),
    }


def floor_div_sql(num: str, den: str, dialect: str) -> str:
    """SQL fragment computing FLOOR(num/den) for integer expressions
    with a POSITIVE denominator, with identical results on both
    engines.  Needed because neither dialect's integer division
    floors: Spark's ``div`` and DuckDB's ``//`` BOTH truncate toward
    zero (empirically: DuckDB 1.0 ``(-7001)//2 = -3500``), so a bare
    quotient agrees across engines but violates the floor contract
    every negative-sum mean/centroid in this repo documents.  The
    CASE routes negative numerators through ``-((-n + d - 1) / d)``
    whose operands are nonnegative — where truncation IS floor.

    One definition, both dialects: a one-sided edit (fixing the Spark
    expression but not the oracle SQL) is exactly the bug class a
    review pass caught in ``events_cusum_drift`` — emitting both
    fragments from here makes it unrepresentable.

    Precondition: operands must be 64-bit-typed EXPRESSIONS (column
    aggregates are; bare SQL integer literals type as INT32 in DuckDB,
    where the internal ``−n + d − 1`` can overflow — cast literals to
    BIGINT first)."""
    op = {"spark": "div", "duckdb": "//"}[dialect]
    return (
        f"CASE WHEN ({num}) >= 0 THEN ({num}) {op} ({den})"
        f" ELSE -((-({num}) + ({den}) - 1) {op} ({den})) END"
    )


def qln_micro(x):
    """THE quantized-ln device shared by every log-space-exact
    operator (mixture entropy, perplexity, TF-IDF, Naive Bayes,
    Kaplan-Meier): ``floor(ln(x)·1e6)`` as BIGINT — evaluated once per
    DISTINCT count so all downstream sums are exact integers and no
    accumulation-order float noise can flip a result between engines
    or partitionings.  One definition: diverging local copies of the
    quantum or the cast would silently break the cross-engine
    bit-exactness these queries document (review r9).

    ``x`` is a pyspark Column (any numeric type)."""
    from pyspark.sql import functions as F

    return F.floor(F.log(x.cast("double")) * 1000000).cast("bigint")
