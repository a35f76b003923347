"""Salted-join equivalence tests (functions/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark.functions.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of left rows share key 1 — the pathological hot key
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rval")
    )
    return left, right


def _key_set(df):
    return {tuple(r) for r in df.collect()}


def test_salted_inner_equals_plain(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", n_salt=4)
    assert _key_set(salted.select("k", "lval", "rval")) == _key_set(
        plain.select("k", "lval", "rval")
    )


def test_salted_left_keeps_unmatched(spark, skewed):
    left, right = skewed
    right_holes = right.filter(F.col("k") != 1)  # drop the hot key from right
    plain = left.join(right_holes, "k", "left")
    salted = salted_join(left, right_holes, "k", n_salt=4, how="left")
    assert _key_set(salted.select("k", "lval", "rval")) == _key_set(
        plain.select("k", "lval", "rval")
    )


def test_unsupported_how_raises(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")


# --- degenerate-band LSH cap (VERDICT r2 task 4) -----------------------------


def test_lsh_cap_bounds_degenerate_band_and_reports_drops(spark):
    """A boilerplate corpus (many docs sharing a signature band) must NOT go
    quadratic: the (band_id, band_hash) bucket over the cap is dropped
    BEFORE the self-join (bounded fan-out), and the drop is accounted, not
    silent — the dropped-comparison count is exactly n·(n−1)/2 per dropped
    bucket."""
    from data_pipeline_for_autonomous_vehicles_spark.operators.dedup import (
        LSH_BANDS,
        MAX_BUCKET,
        MINHASH_K,
        _banded,
        _cap_buckets,
        _lsh_candidates,
    )

    n_hot = MAX_BUCKET + 50  # one degenerate cohort, over the cap
    n_ok = 20  # a small legitimate near-dup cohort, under the cap
    sigs = spark.range(n_hot + n_ok).select(
        F.col("id").alias("doc_id"),
        # hot cohort: all-identical signatures; ok cohort: distinct in the
        # upper bands but identical in band 0 (sig_0..3 = constant)
        *[
            (
                F.when(F.col("id") < n_hot, F.lit(7))
                .otherwise(F.lit(9) if i < 4 else F.col("id") * 100 + i)
                .cast("long")
            ).alias(f"sig_{i}")
            for i in range(MINHASH_K)
        ],
    )

    banded = _banded(sigs)
    # fan-out bound: after the cap no bucket exceeds MAX_BUCKET, so the
    # join's worst bucket is ≤ MAX_BUCKET² comparisons
    capped = _cap_buckets(banded, ["band_id", "band_hash"], MAX_BUCKET)
    worst = capped.groupBy("band_id", "band_hash").count().agg(F.max("count")).first()[0]
    assert worst is not None and worst <= MAX_BUCKET

    # the hot cohort produces ZERO candidates (its every band bucket is
    # degenerate); the ok cohort still pairs up via band 0
    cand = _lsh_candidates(sigs)
    assert cand.filter(F.col("doc_a") < n_hot).count() == 0
    expected_ok_pairs = n_ok * (n_ok - 1) // 2
    assert cand.filter(F.col("doc_a") >= n_hot).count() == expected_ok_pairs

    # drop accounting (the "no silent caps" rule): every band of the hot
    # cohort is one dropped bucket of n_hot postings
    bs = banded.groupBy("band_id", "band_hash").agg(F.count(F.lit(1)).alias("n"))
    dropped = bs.filter(F.col("n") > MAX_BUCKET)
    assert dropped.count() == LSH_BANDS
    got = dropped.agg(
        F.sum(F.expr("(n * (n - 1)) div 2")).alias("dropped_comparisons")
    ).first()["dropped_comparisons"]
    assert got == LSH_BANDS * (n_hot * (n_hot - 1) // 2)


def test_lsh_cap_report_matches_manual_accounting(spark, sf_dir):
    """lsh_cap_report's rollup must reconcile with a direct bucket-size
    histogram on the same corpus."""
    from data_pipeline_for_autonomous_vehicles_spark.operators.dedup import (
        MAX_BUCKET,
        _banded,
        _minhash_signatures,
        lsh_cap_report,
    )

    row = lsh_cap_report(spark, sf_dir).first()
    bs = (
        _banded(_minhash_signatures(spark, sf_dir))
        .groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert row["n_buckets"] == len(bs)
    assert row["n_buckets_dropped"] == sum(1 for r in bs if r["n"] > MAX_BUCKET)
    assert row["kept_comparisons"] == sum(
        r["n"] * (r["n"] - 1) // 2 for r in bs if r["n"] <= MAX_BUCKET
    )
    assert (
        row["dropped_comparisons"]
        == sum(r["n"] * (r["n"] - 1) // 2 for r in bs if r["n"] > MAX_BUCKET)
    )


def test_tie_aware_running_correct_under_single_value_skew(spark):
    """Irreducible single-value skew (99% of mass on one key) must degrade
    BALANCE only, never correctness: rows_before/keys_before must equal
    the single-partition reference on a pathological distribution,
    including the all-identical-values edge (a single distinct key →
    every cut equals it → one pid)."""
    from data_pipeline_for_autonomous_vehicles_spark.operators.windows import (
        _tie_aware_running,
    )

    # 99% of rows share value 42; the rest are unique stragglers
    vals = [42] * 99 + [1, 7, 99, 100, 500]
    dist = (
        spark.createDataFrame([(v,) for v in vals], "v bigint")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    got = {
        r["v"]: (r["rows_before"], r["keys_before"])
        for r in _tie_aware_running(dist, [], "v", ascending=True, n_parts=8).collect()
    }
    ordered = sorted(set(vals))
    rows_before, keys_before = 0, 0
    for v in ordered:
        assert got[v] == (rows_before, keys_before), v
        rows_before += vals.count(v)
        keys_before += 1

    # all-identical edge: hi == lo collapses to one bin / one pid
    one = (
        spark.createDataFrame([(5,)] * 10, "v bigint")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    r = _tie_aware_running(one, [], "v", ascending=False, n_parts=8).collect()
    assert [(x["rows_before"], x["keys_before"]) for x in r] == [(0, 0)]


def test_tie_aware_cuts_balanced_under_heavy_tailed_values(spark):
    """The round-3 equal-width value bins collapsed under heavy-tailed
    order columns (one extreme outlier stretched [min, max] so every key
    landed in bin 0 → all cuts on one bin → a single-task window — the
    ADVICE.md r3 finding). The hash-sampled KEY-quantile cuts are
    distribution-free: on an exponentially exploding value range the keys
    must still spread across pids with no pid holding more than a small
    multiple of the fair share — and the counts must stay exact."""
    import math

    from pyspark.sql import Row

    from data_pipeline_for_autonomous_vehicles_spark.operators.windows import (
        _tie_aware_running,
    )

    n_parts = 8
    # 4000 distinct keys spanning 17 orders of magnitude; >99% of keys sit
    # in the lowest 1e-12 of the value range — equal-width bins put them
    # all in bin 0
    vals = [int(math.exp(i / 100.0)) + i for i in range(4000)]
    dist = (
        spark.createDataFrame([Row(v=v) for v in vals], "v bigint")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = _tie_aware_running(dist, [], "v", ascending=True, n_parts=n_parts).collect()
    # correctness: exact tie-aware counts regardless of balance
    ordered = sorted(set(vals))
    got = {r["v"]: (r["rows_before"], r["keys_before"]) for r in out}
    rows_before = 0
    for i, v in enumerate(ordered):
        assert got[v] == (rows_before, i), v
        rows_before += vals.count(v)
    # balance: rebuild the pid of each key exactly as the operator does
    # (count of sampled-quantile cuts strictly below) and bound the worst
    # pid's key count. With OVERSAMPLE=64 the expected share error is
    # ~12%; 2x fair share is a generous, flake-proof bound.
    from collections import Counter
    from data_pipeline_for_autonomous_vehicles_spark.operators import windows as W

    k = len(ordered)
    sample_target = n_parts * W.OVERSAMPLE
    rate_e4 = min(10_000, (10_000 * sample_target) // max(k, 1) + 1)
    df_hash = spark.createDataFrame([Row(v=v) for v in ordered], "v bigint").select(
        "v", F.pmod(F.xxhash64("v"), F.lit(10_000)).alias("h")
    )
    sample = sorted(r["v"] for r in df_hash.collect() if r["h"] < rate_e4)
    assert sample, "hash sample must not be empty"
    cuts = sorted(
        {sample[max(1, (i * len(sample)) // n_parts) - 1] for i in range(1, n_parts)}
    )
    pids = Counter(sum(1 for c in cuts if c < v) for v in ordered)
    assert len(pids) >= n_parts - 1, f"cuts collapsed: {len(pids)} pids"
    fair = k / n_parts
    assert max(pids.values()) <= 2 * fair, dict(pids)
