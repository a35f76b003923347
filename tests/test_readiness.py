"""Readiness scorecard: verdicts recompute from the gate frames themselves."""

from __future__ import annotations

import pytest

from data_pipeline_for_autonomous_vehicles_spark.operators.readiness import (
    _GATES,
    DECON_THETA,
    corpus_readiness_report,
)


def test_readiness_rows_recompute_from_gate_operators(spark, sf_dir):
    """Each scorecard headline equals a direct reduction of its gate
    operator's frame, and pass == (headline <= threshold) with the
    committed thresholds."""
    from data_pipeline_for_autonomous_vehicles_spark.operators.corpus import (
        curation_vocab_impact,
    )
    from data_pipeline_for_autonomous_vehicles_spark.operators.dedup import (
        decontamination_policy_sweep,
        split_leakage_compare,
    )
    from data_pipeline_for_autonomous_vehicles_spark.operators.similarity import (
        embedding_coverage_audit,
        embedding_drift_audit,
    )

    rows = {r["gate"]: r for r in corpus_readiness_report(spark, sf_dir).collect()}
    assert [rows[g]["gate_order"] for _, g, _ in _GATES] == [o for o, _, _ in _GATES]
    for o, g, thr in _GATES:
        r = rows[g]
        assert r["threshold_pct"] == thr
        assert r["pass"] == (r["headline_pct"] <= thr)

    drift = embedding_drift_audit(spark, sf_dir).collect()
    assert rows["embedding_drift"]["headline_pct"] == pytest.approx(
        100.0 * sum(x["drifted"] for x in drift) / len(drift), abs=1e-4
    )
    cov = embedding_coverage_audit(spark, sf_dir).collect()
    assert rows["embedding_coverage"]["headline_pct"] == pytest.approx(
        max(
            100.0 * x["n_missing_embedding"] / x["n_docs"]
            for x in cov
            if x["n_docs"] > 0
        ),
        abs=1e-4,
    )
    total_emb = sum(x["n_with_embedding"] + x["n_orphan_embeddings"] for x in cov)
    assert rows["embedding_orphans"]["headline_pct"] == pytest.approx(
        100.0 * sum(x["n_orphan_embeddings"] for x in cov) / total_emb, abs=1e-4
    )
    leak = {r["policy"]: r for r in split_leakage_compare(spark, sf_dir).collect()}
    rep = leak["cluster_representative"]["leaked_pct"]
    assert rows["split_leakage"]["headline_pct"] == pytest.approx(
        100.0 * (rep or 0.0), abs=1e-4
    )
    dec = {r["theta"]: r for r in decontamination_policy_sweep(spark, sf_dir).collect()}
    assert rows["decontamination_cost"]["headline_pct"] == pytest.approx(
        dec[DECON_THETA]["dropped_tokens_pct"], abs=1e-4
    )
    voc = curation_vocab_impact(spark, sf_dir).collect()
    assert rows["vocab_loss"]["headline_pct"] == pytest.approx(
        100.0 * max(x["vocab_lost_frac"] for x in voc), abs=1e-4
    )


def test_readiness_all_green_on_driver_data(spark, sf_dir):
    """The synthetic corpus is healthy by construction under the committed
    thresholds — the scorecard must agree (a false alarm here would block
    every training run downstream)."""
    rows = corpus_readiness_report(spark, sf_dir).collect()
    assert len(rows) == len(_GATES)
    assert all(r["pass"] for r in rows)
