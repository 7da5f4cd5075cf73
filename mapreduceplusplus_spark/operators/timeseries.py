"""Time-series resampling — regularize an irregular event stream onto a
fixed calendar grid and fill the gaps (forward-fill + linear
interpolation).

A charter extension: the reference cannot express this (its only
grouping construct is key-grouped fold, reference ``src/worker.cc:
208-229``); feature pipelines need it constantly ("daily activity per
user, no holes, carry the last reading forward").

Spark-first shape — no UDF, no driver loop:

1. bucket to the grain with a hash aggregation (one shuffle on
   (key, bucket));
2. per-key grid = ``sequence(min_bucket, max_bucket)`` exploded — the
   grid is GENERATED inside the plan, sized by each key's own active
   span (no global calendar join, no driver-side date arithmetic);
3. left join observations onto the grid (co-keyed equi-join);
4. fills are windows over the grid: ``last(value, ignorenulls)``
   rows-unbounded-preceding for forward fill, the symmetric
   ``first(...)`` following-frame for the next observation, and
   linear interpolation from the (prev, next) pair + date distances.

Determinism contract (matters beyond the oracle): every numeric step
is INTEGER arithmetic until the final ``/ 1000.0`` — float sums are
partition-order dependent (a cluster re-run can flip last bits and,
at a rounding tie, the visible decimals) and the two engines break
exact .0005 ``round()`` ties differently, both observed against the
oracle during development.  Values are quantized to cents, aggregated
as integer sums, and rounded to milli-units with explicit integer
half-up arithmetic (``(2p + q) div (2q)``, valid for the nonnegative
``value`` domain), so the series is bitwise reproducible on any
partitioning and any engine.

At 100 TB: every stage is keyed by ``user_id`` — the grid explode is
map-side (follows the bounds aggregation), the observation join and
the fill windows hash-partition on the same key, and AQE coalesces the
tiny post-grid partitions.  Grid size is bounded by each key's span at
the chosen grain, not by corpus size.  Nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceplusplus_spark.registry import query
from mapreduceplusplus_spark.session import ensure_utc
from mapreduceplusplus_spark.sources.tables import load_table

#: keys resampled by the registered query — a fixed slice so the
#: output stays bounded and comparable across scale factors
_MAX_USER = 40


@query(
    "ts_resample_gapfill",
    oracle=f"""
    WITH daily AS (
      -- integer milli-units of the day mean of cent-quantized values:
      -- m = round_half_up(1000 * sum(cents) / (100 * n))
      --   = (20*sum(cents) + n) // (2*n)
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST((20 * sum(CAST(round(value * 100) AS BIGINT)) + count(*))
                  // (2 * count(*)) AS BIGINT) AS m
      FROM events
      WHERE user_id < {_MAX_USER}
      GROUP BY user_id, CAST(ts AS DATE)
    ),
    bounds AS (
      SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ),
    j AS (
      SELECT g.user_id, g.d, dl.m
      FROM grid g LEFT JOIN daily dl ON dl.user_id = g.user_id AND dl.d = g.d
    ),
    filled AS (
      SELECT user_id, d, m,
             last_value(m IGNORE NULLS) OVER w_prev AS pm,
             last_value(CASE WHEN m IS NOT NULL THEN d END IGNORE NULLS)
               OVER w_prev AS pd,
             first_value(m IGNORE NULLS) OVER w_next AS nm,
             first_value(CASE WHEN m IS NOT NULL THEN d END IGNORE NULLS)
               OVER w_next AS nd
      FROM j
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id,
           strftime(d, '%Y-%m-%d') AS day,
           (m IS NULL)             AS is_gap,
           pm / 1000.0             AS ffill_value,
           CASE
             WHEN m IS NOT NULL THEN m
             WHEN pm IS NULL THEN nm
             WHEN nm IS NULL THEN pm
             -- round_half_up(pm + (nm-pm)*dp/dn), all-integer
             ELSE (2 * (pm * date_diff('day', pd, nd)
                        + (nm - pm) * date_diff('day', pd, d))
                   + date_diff('day', pd, nd))
                  // (2 * date_diff('day', pd, nd))
           END / 1000.0            AS interp_value
    FROM filled
    """,
)
def ts_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample per-user event values onto a daily grid over each
    user's own active span; emit the forward-filled and the linearly
    interpolated series plus the gap flag.  See the module docstring
    for the integer-exact determinism contract."""
    ensure_utc(spark)
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < _MAX_USER)
        .select("user_id", F.to_date("ts").alias("d"), "value")
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    daily = (
        ev.groupBy("user_id", "d")
        .agg(F.sum(cents).alias("cs"), F.count("*").alias("cn"))
        .select(
            "user_id",
            "d",
            F.expr("(20 * cs + cn) div (2 * cn)").alias("m"),
        )
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("d"),
    )
    j = grid.join(daily.select("user_id", "d", "m"), ["user_id", "d"], "left")

    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("m").isNotNull(), F.col("d"))
    filled = j.select(
        "user_id",
        "d",
        "m",
        F.last("m", ignorenulls=True).over(w_prev).alias("pm"),
        F.last(obs_d, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("m", ignorenulls=True).over(w_next).alias("nm"),
        F.first(obs_d, ignorenulls=True).over(w_next).alias("nd"),
    )
    # integer half-up interpolation; operands are nonnegative so
    # div == floor, and the expression stays BIGINT until the final
    # /1000.0 (expr: the Column API has no infix integer-div)
    filled = filled.withColumn(
        "interp_m",
        F.when(F.col("m").isNotNull(), F.col("m"))
        .when(F.col("pm").isNull(), F.col("nm"))
        .when(F.col("nm").isNull(), F.col("pm"))
        .otherwise(
            F.expr(
                "(2 * (pm * datediff(nd, pd) + (nm - pm) * datediff(d, pd))"
                " + datediff(nd, pd)) div (2 * datediff(nd, pd))"
            )
        ),
    )
    return filled.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("m").isNull().alias("is_gap"),
        (F.col("pm") / 1000.0).alias("ffill_value"),
        (F.col("interp_m") / 1000.0).alias("interp_value"),
    )
