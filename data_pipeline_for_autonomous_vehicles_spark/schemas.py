"""Fixed StructType schemas for every stream/table in the engine.

Mirrors the reference's SQL-declared schemas (reference: sql/01_schema.sql:7-69)
— telemetry, perception, driving events, alerts, metrics — plus the driver's
parquet test tables. Schema-on-read is always explicit: no inferSchema anywhere
(reference enforces the same discipline at its replay edge,
src/ingestion/waymo_replay.py:25-58).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference stream schemas (sql/01_schema.sql) -------------------------

VEHICLE_TELEMETRY = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("vehicle_id", T.IntegerType(), False),
        T.StructField("current_speed_kmh", T.DoubleType(), True),
        T.StructField("speed_limit_violation", T.BooleanType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("battery_level_pct", T.DoubleType(), True),
        T.StructField("remaining_range_km", T.DoubleType(), True),
        T.StructField("autopilot_engaged", T.BooleanType(), True),
        T.StructField("odometer_km", T.DoubleType(), True),
        T.StructField("start_location", T.StringType(), True),
        T.StructField("destination", T.StringType(), True),
    ]
)

PERCEPTION_EVENTS = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("vehicle_id", T.IntegerType(), False),
        T.StructField("object_class", T.StringType(), True),
        T.StructField("object_distance_m", T.DoubleType(), True),
        T.StructField("object_speed_kmh", T.DoubleType(), True),
        T.StructField("object_relative_direction", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), True),
    ]
)

DRIVING_EVENTS = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("vehicle_id", T.IntegerType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("event_detail", T.StringType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
    ]
)

ALERTS = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("vehicle_id", T.IntegerType(), False),
        T.StructField("alert_type", T.StringType(), False),
        T.StructField("alert_message", T.StringType(), True),
    ]
)

# self_driving_metrics (sql/01_schema.sql:61-69) — declared in the reference,
# never read/written; kept for parity as an optional aggregate sink schema.
SELF_DRIVING_METRICS = T.StructType(
    [
        T.StructField("time_bucket", T.TimestampType(), False),
        T.StructField("vehicle_id", T.IntegerType(), True),
        T.StructField("metric_name", T.StringType(), False),
        T.StructField("metric_value", T.DoubleType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# Value domains (producer.py:54,113,122; consumer.py:95,104,120)
OBJECT_CLASSES = ("car", "pedestrian", "cyclist", "truck", "motorcycle", "bus")
DIRECTIONS = ("left", "right", "ahead", "rear")
DRIVING_EVENT_TYPES = ("intervention", "disengagement", "lane_change", "hard_brake")
ALERT_TYPES = ("Speed Violation", "Low Battery", "Collision Risk")

# --- Driver test-table schemas (TESTDATA.md) ------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)
