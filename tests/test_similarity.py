"""Embedding-space maintenance audits — fixed-point recounts on driver
data."""

from __future__ import annotations


def test_embedding_drift_audit_matches_bruteforce(spark, sf_dir):
    """Per-dim corpus/delta means and the cross-multiplied drift flag
    equal a literal fixed-point recount over the vec_id split."""
    import math

    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.operators.similarity import (
        DRIFT_ABS_E6,
        SEM_DELTA_MOD,
        embedding_drift_audit,
    )

    rows = load_table(spark, sf_dir, "embeddings").collect()
    dim = len(rows[0]["embedding"])
    sums = {d: [0, 0, 0, 0] for d in range(dim)}  # n_c, sx_c, n_d, sx_d
    for r in rows:
        is_d = r["vec_id"] % SEM_DELTA_MOD == SEM_DELTA_MOD - 1
        for d, x in enumerate(r["embedding"]):
            v = math.floor(float(x) * 1e6 + 0.5)
            if is_d:
                sums[d][2] += 1
                sums[d][3] += v
            else:
                sums[d][0] += 1
                sums[d][1] += v
    got = {r["dim"]: r for r in embedding_drift_audit(spark, sf_dir).collect()}
    assert set(got) == set(range(dim))
    for d, (n_c, sx_c, n_d, sx_d) in sums.items():
        r = got[d]
        assert (r["n_corpus"], r["n_delta"]) == (n_c, n_d)
        assert r["drifted"] == (abs(sx_d * n_c - sx_c * n_d) > DRIFT_ABS_E6 * n_d * n_c)
        expect_shift = sx_d / n_d / 1e6 - sx_c / n_c / 1e6
        assert abs(r["shift"] - expect_shift) < 1.01e-6
    # same encoder generated both slices: no dim should drift on driver data
    assert not any(r["drifted"] for r in got.values())
