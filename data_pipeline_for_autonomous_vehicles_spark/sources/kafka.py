"""Kafka source/sink wiring (SURVEY.md §2.1 S1/S2).

The reference subscribes one consumer to three JSON topics and routes each
message to a per-table pipeline (src/processing/consumer.py:51-60,86-127);
its producer JSON-serializes dicts per topic (src/ingestion/producer.py:
142-145). Spark-first equivalent: ONE `readStream.format("kafka")` over all
topics, `from_json` against the per-topic schema, and filter-on-`topic`
fan-out — partitions map to tasks, so parallelism is the topic partition
count (3×3 in the reference's create_topics.sh).

The container has no broker and no spark-sql-kafka package, so the
*transport* calls are thin and untested, while everything testable — the
encode/decode projections between typed rows and Kafka's (key, value:
binary, topic) wire shape — is pure column expressions, exercised in batch
by tests/test_kafka.py. This mirrors the reference's own transport-free
local mode (scripts/run_full_pipeline_local.py, queue.Queue instead of
Kafka).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..schemas import DRIVING_EVENTS, PERCEPTION_EVENTS, VEHICLE_TELEMETRY

TOPIC_SCHEMAS: dict[str, StructType] = {
    "vehicle_telemetry": VEHICLE_TELEMETRY,
    "perception_events": PERCEPTION_EVENTS,
    "driving_events": DRIVING_EVENTS,
}


# --- wire-shape transformations (testable without a broker) ---------------


def encode_for_kafka(df: DataFrame, topic: str, key_col: str | None = "vehicle_id") -> DataFrame:
    """Typed rows → Kafka wire rows: JSON-serialized `value`, optional
    string `key` (keying by vehicle keeps per-vehicle ordering within a
    partition, which the reference relies on implicitly), literal `topic`.
    """
    cols = [
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
    ]
    if key_col and key_col in df.columns:
        cols.insert(0, F.col(key_col).cast("string").cast("binary").alias("key"))
    return df.select(*cols)


def decode_topic(df: DataFrame, topic: str) -> DataFrame:
    """Kafka wire rows → typed rows for one topic: filter the topic column,
    parse `value` with the topic's fixed schema (never inferred), flatten.
    Malformed JSON parses to an all-null struct (PERMISSIVE mode); rows
    missing the NOT NULL columns of the reference schema (time, vehicle_id
    — sql/01_schema.sql) are dropped, matching the consumer's
    swallow-and-continue (consumer.py:81-84)."""
    schema = TOPIC_SCHEMAS[topic]
    parsed = (
        df.filter(F.col("topic") == topic)
        .select(F.from_json(F.col("value").cast("string"), schema).alias("r"))
        .filter(F.col("r.time").isNotNull() & F.col("r.vehicle_id").isNotNull())
    )
    return parsed.select("r.*")


def decode_all_topics(df: DataFrame) -> dict[str, DataFrame]:
    """Demultiplex one multi-topic frame into per-table frames (J4)."""
    return {t: decode_topic(df, t) for t in TOPIC_SCHEMAS}


# --- transport (requires spark-sql-kafka on the classpath) ----------------


def read_topics_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: tuple[str, ...] = tuple(TOPIC_SCHEMAS),
    starting_offsets: str = "earliest",
) -> DataFrame:
    """One streaming source over all topics (S1). Earliest offsets match the
    reference's auto_offset_reset="earliest" (consumer.py:56); group
    semantics are handled by Spark's own offset tracking + checkpoint,
    which upgrades the reference's at-least-once to exactly-once."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting_offsets)
        .load()
    )


def write_stream_to_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """Streaming sink (S2): encode with `encode_for_kafka` first."""
    return (
        encode_for_kafka(df, topic)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
