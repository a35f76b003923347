"""Streaming pipeline tests: bounded runs (Trigger.AvailableNow) mirroring
the reference's local no-Docker harness (run_full_pipeline_local.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark.operators.metrics import alerts_batch
from data_pipeline_for_autonomous_vehicles_spark.operators.windows import user_sessions
from data_pipeline_for_autonomous_vehicles_spark.streaming import aggregates, rules


def test_streaming_alerts_equal_batch(spark, sf_dir):
    stream_out = rules.streaming_alerts_table(spark, sf_dir)
    batch_out = alerts_batch(spark, sf_dir)
    a = sorted(map(tuple, stream_out.collect()))
    b = sorted(map(tuple, batch_out.collect()))
    assert a == b


def test_alert_pipeline_foreachbatch_sink(spark, sf_dir, tmp_path):
    out = tmp_path / "alerts_out"
    ckpt = tmp_path / "ckpt"
    n = rules.run_alert_pipeline(spark, sf_dir, str(out), str(ckpt))
    assert n == alerts_batch(spark, sf_dir).count()
    written = spark.read.parquet(str(out))
    # data columns plus the sink's layout partitions (batch-scoped
    # exactly-once dir + date pruning)
    assert set(written.columns) == {
        "time",
        "vehicle_id",
        "alert_type",
        "alert_message",
        "batch_id",
        "event_date",
    }
    # exactly-once: re-running with the same checkpoint adds nothing
    n2 = rules.run_alert_pipeline(spark, sf_dir, str(out), str(ckpt))
    assert n2 == n


def test_streaming_daily_counts_equal_batch(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table

    stream_out = aggregates.streaming_daily_event_counts(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(
            F.to_date(F.date_trunc("day", "ts")).alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    s = {(r["day"], r["event_type"]): r["n_events"] for r in stream_out}
    b = {(r["day"], r["event_type"]): r["n_events"] for r in batch}
    assert s == b


def test_streaming_sessions_match_batch_sessionization(spark, sf_dir):
    stream_out = aggregates.streaming_user_sessions(spark, sf_dir).collect()
    batch_out = user_sessions(spark, sf_dir).collect()
    s = {r["user_id"]: r["n_sessions"] for r in stream_out}
    b = {r["user_id"]: r["n_sessions"] for r in batch_out}
    assert s == b


def test_streaming_dedup_removes_doubled_delivery(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.streaming.aggregates import (
        streaming_dedup_counts,
    )

    out = {r["event_type"]: r["n_events"] for r in streaming_dedup_counts(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    batch = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert out == batch


def test_stream_stream_join_matches_batch_self_join(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.streaming.joins import (
        streaming_view_purchase_pairs,
    )

    out = {
        r["user_id"]: (r["n_pairs"], r["n_attributed_views"], r["n_attributing_purchases"])
        for r in streaming_view_purchase_pairs(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), F.col("event_id").alias("vid")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("uid"), F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    batch = (
        v.join(
            p,
            (F.col("user_id") == F.col("uid"))
            & (F.col("pts") >= F.col("vts"))
            & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("vid").alias("nv"),
            F.countDistinct("pid").alias("np"),
        )
        .collect()
    )
    assert out == {r["user_id"]: (r["n"], r["nv"], r["np"]) for r in batch}


def test_stream_static_enrichment_matches_batch_join(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.streaming.joins import (
        streaming_enriched_nation_counts,
    )

    out = {
        r["c_nationkey"]: (r["n_events"], r["n_users"])
        for r in streaming_enriched_nation_counts(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    batch = {
        r["c_nationkey"]: (r["n"], r["nu"])
        for r in ev.join(cust, "user_id")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("nu"))
        .collect()
    }
    assert out == batch
