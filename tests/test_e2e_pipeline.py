"""Full pipeline lifecycle e2e (SURVEY.md §3.3, run_full_pipeline_local):

  simulate fleet → encode/decode Kafka wire shape → derive alerts →
  write partitioned storage → run dashboard metrics over it → export CSV

— every stage on Spark, no external infra, fully deterministic from the
simulator seed. This is the reference's own "test harness" path,
end-to-end on the new engine.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark.schemas import ALERT_TYPES
from data_pipeline_for_autonomous_vehicles_spark.streaming.rules import derive_fleet_alerts
from data_pipeline_for_autonomous_vehicles_spark.sinks import write_time_partitioned
from data_pipeline_for_autonomous_vehicles_spark.sources import kafka as k
from data_pipeline_for_autonomous_vehicles_spark.sources.simulator import generate_fleet


def test_full_pipeline_lifecycle(spark, tmp_path):
    # 1. produce (deterministic simulator, 3 topics)
    frames = generate_fleet(spark, n_vehicles=5, n_ticks=40, seed=7)
    n_tel = frames["vehicle_telemetry"].count()
    assert n_tel == 5 * 40

    # 2. through the wire: encode each topic, decode back (consumer path)
    wire = None
    for topic, df in frames.items():
        enc = k.encode_for_kafka(df, topic)
        wire = enc if wire is None else wire.unionByName(enc, allowMissingColumns=True)
    tables = k.decode_all_topics(wire)
    assert tables["vehicle_telemetry"].count() == n_tel

    # 3. rules on the decoded streams (R1-R3 union, reference schemas)
    alerts = derive_fleet_alerts(
        tables["vehicle_telemetry"], tables["perception_events"]
    )
    got_types = {r["alert_type"] for r in alerts.select("alert_type").distinct().collect()}
    assert got_types and got_types <= set(ALERT_TYPES)
    # R1 must equal the flag count in the telemetry itself
    n_speed = (
        tables["vehicle_telemetry"].filter(F.col("speed_limit_violation")).count()
    )
    assert alerts.filter(F.col("alert_type") == "Speed Violation").count() == n_speed

    # 4. store: date-partitioned telemetry + alerts
    tel_path = str(tmp_path / "telemetry")
    write_time_partitioned(
        tables["vehicle_telemetry"], tel_path, time_col="time", sort_cols=("vehicle_id",)
    )
    stored = spark.read.parquet(tel_path)
    assert stored.count() == n_tel

    # 5. metric over storage: latest telemetry per vehicle (W1)
    from pyspark.sql import Window

    w = Window.partitionBy("vehicle_id").orderBy(F.desc("time"))
    latest = (
        stored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    assert latest.count() == 5
    # odometer is monotone → the latest row carries each vehicle's max
    max_odo = stored.groupBy("vehicle_id").agg(F.max("odometer_km").alias("mx"))
    joined = latest.join(max_odo, "vehicle_id")
    assert joined.filter(F.col("odometer_km") != F.col("mx")).count() == 0

    # 6. export (S10)
    out_csv = str(tmp_path / "export")
    latest.coalesce(1).write.option("header", True).csv(out_csv)
    assert glob.glob(f"{out_csv}/*.csv")


def test_pipeline_is_deterministic(spark):
    a = generate_fleet(spark, n_vehicles=3, n_ticks=10, seed=11)
    b = generate_fleet(spark, n_vehicles=3, n_ticks=10, seed=11)
    ra = sorted(map(str, a["vehicle_telemetry"].collect()))
    rb = sorted(map(str, b["vehicle_telemetry"].collect()))
    assert ra == rb
