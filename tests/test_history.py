"""Property tests for SCD2 history, PII redaction, and quantization audit."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
from data_pipeline_for_autonomous_vehicles_spark.operators import (
    history,
    similarity,
    text,
)


def test_scd2_current_matches_latest_event(spark, sf_dir):
    cur = {
        r["user_id"]: r["state"]
        for r in history.scd2_current_states(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = {
        r["user_id"]: r["event_type"]
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert cur == latest


def test_scd2_durations_account_for_all_users(spark, sf_dir):
    out = history.scd2_state_durations(spark, sf_dir).collect()
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(r["n_current"] for r in out) == n_users
    n_events = load_table(spark, sf_dir, "events").count()
    total_intervals = sum(r["n_intervals"] for r in out)
    assert n_users <= total_intervals <= n_events
    for r in out:
        assert r["closed_hours"] is None or r["closed_hours"] >= 0.0


def test_pii_redaction_finds_injected_spans(spark, sf_dir):
    out = text.pii_redaction_stats(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    per_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert {r["source"] for r in out} == set(per_source)
    for r in out:
        # every doc gets exactly one injected email and one injected phone
        assert r["n_docs"] == per_source[r["source"]]
        assert r["n_emails"] == r["n_docs"]
        assert r["n_phones"] == r["n_docs"]
        # masking shrinks the text (spans are longer than the mask tokens)
        assert r["chars_removed"] > 0


def test_quantize_error_bounded_by_half_scale(spark, sf_dir):
    out = similarity.embedding_quantize_report(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_vecs"] > 0
        assert r["mean_scale"] > 0.0
        # |x - dequant(x)| <= s/2 pointwise, so the mean obeys the same bound
        assert 0.0 <= r["mean_abs_err"] <= r["mean_scale"] / 2.0 + 1e-8
