"""Hypertable-style time-series rollups: time_bucket + gap-fill + LOCF.

The reference stores everything in TimescaleDB hypertables
(sql/01_schema.sql:22-69) whose signature query pattern is
`time_bucket_gapfill(...) + locf(...)` — continuous per-entity time grids
with missing buckets filled and last-observation-carried-forward. The
reference's own queries stop at `time > NOW() - interval` windows, but any
fleet dashboard on this schema reaches for gap-fill next; it is also the
canonical "hypertable rollup" the Spark engine must express.

Spark-first shape (no generator UDFs, no driver loops):
  1. bucket = date_trunc(hour) → groupBy(entity, bucket) aggregate
  2. per-entity [min,max] bucket bounds → sequence() + explode = the spine
     (distributed row generation, one row per (entity, bucket))
  3. left join aggregates onto the spine (both sides partitioned by
     entity — AQE coalesces; at scale bucketing by entity makes this a
     no-shuffle join)
  4. LOCF = last(value, ignoreNulls) over (entity ORDER BY bucket ROWS
     UNBOUNDED PRECEDING) — the same carry-forward window as the as-of
     join (operators/asof.py)

Scale: spine size = entities × buckets — generated distributively from a
1-row-per-entity frame, so a year of minutes for 10^6 vehicles (~5·10^11
rows) parallelizes trivially and never exists driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import exact_sum, sql_exact_sum


def hourly_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly event rollup on a gap-free grid: bucket count (0 for
    empty hours) and LOCF-filled value sum."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum("value", 2).alias("sum_value"),
    )
    # Single-pass gapfill: each occupied bucket explodes into itself plus the
    # empty hours up to (but excluding) the user's next occupied bucket,
    # carrying its sum — which IS the LOCF value, since the generated hours
    # have no events of their own. Replaces the bounds-agg + spine + left
    # self-join formulation (which evaluated `agg` twice and shuffled three
    # times) with one lead() window over the aggregate: 2 shuffles total,
    # one scan, identical output. The ANSI twin keeps the spine/LOCF
    # spelling — it is the semantic spec, and the oracle proves this plan
    # equivalent to it.
    w = Window.partitionBy("user_id").orderBy("bucket")
    filled = agg.withColumn("nxt", F.lead("bucket").over(w)).select(
        "user_id",
        "n_events",
        "sum_value",
        F.col("bucket").alias("src_bucket"),
        F.explode(
            F.sequence(
                F.col("bucket"),
                F.coalesce(
                    F.col("nxt") - F.expr("INTERVAL 1 HOUR"), F.col("bucket")
                ),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket"),
    )
    return filled.select(
        "user_id",
        "bucket",
        F.when(F.col("bucket") == F.col("src_bucket"), F.col("n_events"))
        .otherwise(F.lit(0))
        .alias("n_events"),
        F.col("sum_value").alias("sum_value_locf"),
    ).orderBy("user_id", "bucket")


_GAPFILL_SQL = f"""
WITH agg AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         COUNT(*) AS n_events,
         {sql_exact_sum("value", 2)} AS sum_value
  FROM events GROUP BY 1, 2),
bounds AS (SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx FROM agg GROUP BY 1),
spine AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
  FROM bounds)
SELECT s.user_id, s.bucket,
       COALESCE(a.n_events, 0) AS n_events,
       LAST_VALUE(a.sum_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value_locf
FROM spine s LEFT JOIN agg a ON s.user_id = a.user_id AND s.bucket = a.bucket
ORDER BY s.user_id, s.bucket
"""


def daily_fleet_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level hypertable rollup: hourly per-user buckets re-aggregated to
    fleet-wide daily rows (continuous-aggregate-over-continuous-aggregate,
    the TimescaleDB cagg stacking pattern). Exact int sums re-aggregate
    losslessly — the property that makes hierarchical rollups safe."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket_h")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")).alias("v_e2"),
    )
    return (
        hourly.groupBy(F.to_date("bucket_h").alias("day"))
        .agg(
            F.sum("n_events").alias("n_events"),
            (F.sum("v_e2").cast("double") / F.lit(100.0)).alias("sum_value"),
            F.count(F.lit(1)).alias("active_hours"),
        )
        .orderBy("day")
    )


_DAILY_ROLLUP_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket_h,
         COUNT(*) AS n_events,
         SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS v_e2
  FROM events GROUP BY 1)
SELECT CAST(bucket_h AS DATE) AS day,
       SUM(n_events) AS n_events,
       CAST(SUM(v_e2) AS DOUBLE) / 100.0 AS sum_value,
       COUNT(*) AS active_hours
FROM hourly
GROUP BY 1
ORDER BY day
"""


QUERIES = {
    "hourly_gapfill_locf": hourly_gapfill_locf,
    "daily_fleet_rollup": daily_fleet_rollup,
}

ORACLES = {
    "hourly_gapfill_locf": _GAPFILL_SQL,
    "daily_fleet_rollup": _DAILY_ROLLUP_SQL,
}
