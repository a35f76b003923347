"""Streaming alert pipeline: the reference's consumer re-expressed as
Structured Streaming.

Reference: src/processing/consumer.py —
  R1 speed violation (:90-98), R2 low battery (:99-107), R3 collision risk
  (:111-124) — rule logic shared with operators.metrics.derive_alerts;
  R4 buffered batch writes (:33,133-149) → micro-batch foreachBatch append;
  R5 at-least-once w/ possible duplicates → checkpointed exactly-once
    (strictly stronger, SURVEY.md §2.9);
  R6 graceful shutdown (:62-66,151-161) → query.stop()/awaitTermination;
  bounded runs (the reference's queue sentinel, run_full_pipeline_local.py
  :90,110) → Trigger.AvailableNow.

Scale: the rules are stateless filters — no shuffle at all in the streaming
plan; sink parallelism is per-partition parquet appends with checkpointed
exactly-once. At 100 TB/day the only knobs are source partition count and
maxFilesPerTrigger.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.metrics import derive_alerts

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet directory (file streaming source).

    The explicit schema (mandatory for streaming reads) requests classic
    TIMESTAMP for `ts`, matching catalog.load_table's naive-as-UTC reading.
    """
    # UTC is load-bearing for oracle parity (see catalog.load_table); the
    # streaming path bypasses load_table so it pins the TZ itself
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # the file streaming source requires a directory; events.parquet is a
    # single file inside sf_dir, so stream the dir with a glob filter
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )


def run_alert_pipeline(
    spark: SparkSession,
    sf_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> int:
    """Bounded end-to-end run: stream events → rules → parquet alert sink.

    foreachBatch lands each micro-batch in its own batch_id partition via
    `sinks.append_stream_exactly_once` (R4), so checkpoint replay after a
    crash overwrites rather than duplicates — true exactly-once, the
    upgrade over the reference's at-least-once consumer (R5). Returns
    rows written.
    """
    from ..sinks import append_stream_exactly_once

    alerts = derive_alerts(stream_events(spark, sf_dir))

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        append_stream_exactly_once(
            batch_df,
            epoch_id,
            output_dir,
            time_col="time",
            sort_cols=("vehicle_id",),
        )

    q = (
        alerts.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(output_dir).count()


_MEMORY_SINK_SEQ = 0


def streaming_alerts_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming rules run to completion into a memory sink; returns the
    materialized alerts — byte-identical to the batch derive_alerts output,
    which is the oracle-checkable property."""
    global _MEMORY_SINK_SEQ
    _MEMORY_SINK_SEQ += 1
    name = f"stream_alerts_{_MEMORY_SINK_SEQ}"
    alerts = derive_alerts(stream_events(spark, sf_dir))
    q = (
        alerts.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# --- reference-schema rules (R1-R3 on the telemetry/perception streams) -----

SPEED_LIMIT_KMH = 65.0  # config/settings.yaml:25
LOW_BATTERY_PCT = 20.0  # config/settings.yaml:24
COLLISION_DISTANCE_M = 5.0  # config/settings.yaml:26
COLLISION_SPEED_KMH = 10.0  # hard-coded in consumer.py:115


def derive_fleet_alerts(telemetry: DataFrame, perception: DataFrame) -> DataFrame:
    """R1-R3 over the reference's own stream schemas (works identically on
    batch and streaming frames — the rules are stateless projections):

      R1 speed violation: trusts the producer-set flag, like the consumer
         (consumer.py:90 reads `speed_limit_violation`, not the config)
      R2 low battery: battery_level_pct < 20
      R3 collision risk: object_distance_m < 5 AND object_speed_kmh > 10

    Message formats mirror consumer.py:96,105,121-123.
    """
    speed = telemetry.filter(F.col("speed_limit_violation")).select(
        F.col("time"),
        F.col("vehicle_id"),
        F.lit("Speed Violation").alias("alert_type"),
        F.format_string(
            "Vehicle %d exceeded speed limit (%.0f km/h)",
            F.col("vehicle_id"),
            F.col("current_speed_kmh"),
        ).alias("alert_message"),
    )
    battery = telemetry.filter(F.col("battery_level_pct") < LOW_BATTERY_PCT).select(
        F.col("time"),
        F.col("vehicle_id"),
        F.lit("Low Battery").alias("alert_type"),
        F.format_string(
            "Vehicle %d battery low (%.1f%%)",
            F.col("vehicle_id"),
            F.col("battery_level_pct"),
        ).alias("alert_message"),
    )
    collision = perception.filter(
        (F.col("object_distance_m") < COLLISION_DISTANCE_M)
        & (F.col("object_speed_kmh") > COLLISION_SPEED_KMH)
    ).select(
        F.col("time"),
        F.col("vehicle_id"),
        F.lit("Collision Risk").alias("alert_type"),
        F.format_string(
            "Vehicle %d: %s at %.1f m moving %.1f km/h",
            F.col("vehicle_id"),
            F.col("object_class"),
            F.col("object_distance_m"),
            F.col("object_speed_kmh"),
        ).alias("alert_message"),
    )
    return speed.unionByName(battery).unionByName(collision)
