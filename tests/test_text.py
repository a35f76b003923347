"""Text acting artifacts (PII scrub) — acting frame vs stats report
consistency on driver data."""

from __future__ import annotations


def test_pii_redacted_docs_aggregates_to_stats_and_scrubs(spark, sf_dir):
    """The per-doc acting artifact grouped by source reproduces
    pii_redaction_stats cell-for-cell, and no email/phone pattern
    survives in redacted_text."""
    import re

    from pyspark.sql import functions as F

    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.operators.text import (
        _EMAIL_RE,
        _PHONE_RE,
        pii_redacted_docs,
        pii_redaction_stats,
    )

    acting = pii_redacted_docs(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    regrouped = {
        r["source"]: (r["n_docs"], r["n_emails"], r["n_phones"], r["chars_removed"])
        for r in acting.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_emails").alias("n_emails"),
            F.sum("n_phones").alias("n_phones"),
            F.sum("chars_removed").alias("chars_removed"),
        )
        .collect()
    }
    stats = {
        r["source"]: (r["n_docs"], r["n_emails"], r["n_phones"], r["chars_removed"])
        for r in pii_redaction_stats(spark, sf_dir).collect()
    }
    assert regrouped == stats
    email, phone = re.compile(_EMAIL_RE), re.compile(_PHONE_RE)
    sample = acting.limit(50).collect()
    assert all(r["n_emails"] > 0 for r in sample)  # augmentation guarantees spans
    for r in sample:
        assert not email.search(r["redacted_text"])
        assert not phone.search(r["redacted_text"])
        assert "[EMAIL]" in r["redacted_text"]
