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


def test_embedding_drift_audit_empty_delta_parity(spark, tmp_path):
    """A corpus with no delta slice must degrade cleanly on BOTH engines:
    NULL means/shift (not IEEE inf/NaN), drifted false everywhere —
    pinned by running the Spark operator AND its DuckDB oracle on the
    same parquet (the round-7 review's degenerate-input finding)."""
    import duckdb
    from pyspark.sql import Row

    from data_pipeline_for_autonomous_vehicles_spark.operators.similarity import (
        _DRIFT_AUDIT_SQL,
        embedding_drift_audit,
    )

    rows = [
        Row(vec_id=i, embedding=[0.1 * (i + 1), -0.2], label=0) for i in range(3)
    ]  # vec_id % 5 == 4 never fires -> empty delta slice
    d = str(tmp_path / "emb")
    spark.createDataFrame(rows).coalesce(1).write.parquet(d + "/embeddings.parquet")

    got = embedding_drift_audit(spark, d).collect()
    assert [r["dim"] for r in got] == [0, 1]
    for r in got:
        assert r["n_delta"] == 0 and r["n_corpus"] == 3
        assert r["mean_delta"] is None and r["shift"] is None
        assert r["mean_corpus"] is not None
        assert r["drifted"] is False

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet/*.parquet'"
    )
    oracle = con.execute(_DRIFT_AUDIT_SQL).fetchall()
    assert len(oracle) == 2
    for (dim, n_c, n_d, mc, md, sh, drifted), r in zip(oracle, got):
        assert (dim, n_c, n_d) == (r["dim"], 3, 0)
        assert md is None and sh is None and drifted is False
        assert mc == r["mean_corpus"]
