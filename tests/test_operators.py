"""Operator-level tests over the shared sf0.001 tables: sanity properties
that complement the differential oracle harness (tools/check_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
from data_pipeline_for_autonomous_vehicles_spark.operators import (
    dedup,
    similarity,
    text,
    tpch,
    windows,
)


def test_q1_groups_and_totals(spark, sf_dir):
    out = tpch.q1_pricing_summary(spark, sf_dir).collect()
    assert 1 <= len(out) <= 6  # |returnflag| × |linestatus|
    li = load_table(spark, sf_dir, "lineitem")
    n = li.filter(F.col("l_shipdate") <= "1998-09-02").count()
    assert sum(r["count_order"] for r in out) == n
    for r in out:
        assert abs(r["avg_qty"] * r["count_order"] - r["sum_qty"]) < 0.5
        assert r["sum_qty"] > 0 and r["avg_disc"] >= 0


def test_q3_topk_is_sorted_and_bounded(spark, sf_dir):
    out = tpch.q3_shipping_priority(spark, sf_dir).collect()
    assert len(out) <= 10
    revs = [r["revenue"] for r in out]
    assert revs == sorted(revs, reverse=True)


def test_top_orders_rank_within_group(spark, sf_dir):
    out = windows.top_orders_per_priority(spark, sf_dir).collect()
    by_p = {}
    for r in out:
        by_p.setdefault(r["o_orderpriority"], []).append(r)
    for rows in by_p.values():
        assert [r["rank_in_priority"] for r in rows] == list(range(1, len(rows) + 1))
        prices = [r["o_totalprice"] for r in rows]
        assert prices == sorted(prices, reverse=True)


def test_sessions_bounded_by_event_count(spark, sf_dir):
    out = windows.user_sessions(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    counts = {r["user_id"]: r["n"] for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    for r in out:
        assert 1 <= r["n_sessions"] <= counts[r["user_id"]]
        assert r["avg_events_per_session"] >= 1.0


def test_dedup_exact_partitions_the_corpus(spark, sf_dir):
    out = dedup.dedup_exact(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_copies"] for r in out) == n_docs


def test_minhash_estimates_bounded(spark, sf_dir):
    out = dedup.minhash_lsh_pairs(spark, sf_dir).collect()
    for r in out:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert r["doc_a"] < r["doc_b"]


def test_cap_buckets_drops_hot_bucket(spark):
    """A deliberately degenerate bucket (VERDICT r1 task 5): rows in a
    bucket holding more than max_bucket members are dropped entirely;
    cooler buckets pass through untouched."""
    rows = [("hot", i) for i in range(10)] + [("cool", i) for i in range(3)]
    df = spark.createDataFrame(rows, ["bucket", "doc_id"])
    kept = dedup._cap_buckets(df, ["bucket"], max_bucket=5).collect()
    assert {r["bucket"] for r in kept} == {"cool"}
    assert len(kept) == 3
    # self-join fan-out after the cap is bounded by max_bucket² per bucket
    capped = dedup._cap_buckets(df, ["bucket"], max_bucket=10)
    pairs = (
        capped.alias("a")
        .join(capped.alias("b"), "bucket")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .count()
    )
    assert pairs == 45 + 3  # C(10,2) + C(3,2), no cross-bucket pairs


def test_ann_lsh_bucket_cap_in_plan(spark, sf_dir):
    """The per-bucket probe cap must compile to WindowGroupLimit (bounded
    per-group buffers, partial map-side mode) — not a full bucket sort."""
    from data_pipeline_for_autonomous_vehicles_spark import plans

    txt = plans.plan_text(similarity.ann_lsh_topk(spark, sf_dir))
    assert txt.count("WindowGroupLimit") >= 2  # probe cap + final top-k


def test_ann_topk_selfconsistent(spark, sf_dir):
    out = similarity.ann_bruteforce_topk(spark, sf_dir).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert len(rows) == similarity.TOP_K
        cos = [r["cosine"] for r in rows]
        assert cos == sorted(cos, reverse=True)
        assert all(r["vec_id"] != q for r in rows)
        assert all(-1.0001 <= c <= 1.0001 for c in cos)


def test_lsh_topk_subset_of_bucket(spark, sf_dir):
    """LSH results are a subset of brute-force candidates (same scoring)."""
    bf = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in similarity.ann_bruteforce_topk(spark, sf_dir).collect()
    }
    lsh = similarity.ann_lsh_topk(spark, sf_dir).collect()
    for r in lsh:
        # any (q, v) present in both must agree on the score
        if (r["query_id"], r["vec_id"]) in bf:
            assert bf[(r["query_id"], r["vec_id"])] == r["cosine"]


def test_token_counts_nonnegative_ttr(spark, sf_dir):
    out = text.token_counts(spark, sf_dir).collect()
    for r in out:
        assert r["n_tokens"] >= r["n_distinct_tokens"] >= 0
        if r["n_tokens"]:
            assert 0.0 < r["type_token_ratio"] <= 1.0


def test_quality_scores_in_unit_interval(spark, sf_dir):
    out = text.quality_scores(spark, sf_dir).collect()
    for r in out:
        assert 0.0 <= r["quality_score"] <= 1.0


def test_connected_components_hand_graph(spark):
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (10, 11), (11, 12), (12, 10)], "a long, b long"
    )
    nodes = spark.createDataFrame([(n,) for n in (1, 2, 3, 5, 6, 8, 10, 11, 12)], "node long")
    got = {
        r["node"]: r["label"]
        for r in dedup.connected_components(edges, nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 8, 10: 10, 11: 10, 12: 10}


def test_connected_components_long_chain_crosses_stats_reset(spark):
    """A 400-node path graph needs more than STATS_RESET_EVERY rounds even
    with pointer jumping, so the loop crosses at least one parquet
    stats-reset flush (the round-7 fix for Catalyst's per-round
    sizeInBytes squaring) — labels must still converge to the path's min
    id, and the reversed id order exercises propagation both ways."""
    n = 400
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "a long, b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "node long")
    got = {
        r["node"]: r["label"]
        for r in dedup.connected_components(edges, nodes).collect()
    }
    assert got == {i: 1 for i in range(1, n + 1)}
    assert dedup.CC_MAX_ITER > dedup.STATS_RESET_EVERY  # flush actually reachable


def test_grouping_sets_union_of_single_groupbys(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap

    out = olap.status_priority_grouping_sets(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    n_status = orders.select("o_orderstatus").distinct().count()
    n_prio = orders.select("o_orderpriority").distinct().count()
    assert len(out) == n_status + n_prio
    # every row has exactly one non-null grouping column
    for r in out:
        assert (r["o_orderstatus"] is None) != (r["o_orderpriority"] is None)
    # each set's counts partition the table
    total = orders.count()
    assert sum(r["n_orders"] for r in out if r["o_orderstatus"] is not None) == total
    assert sum(r["n_orders"] for r in out if r["o_orderpriority"] is not None) == total


def test_unpivot_matches_pivot_cells(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap

    long = olap.user_metric_unpivot(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    # total of the long-form counts equals the event count
    assert long.agg(F.sum("n")).first()[0] == ev.count()
    # metric labels are the wide column names
    labels = {r["metric"] for r in long.select("metric").distinct().collect()}
    assert labels <= {f"n_{t}" for t in olap.EVENT_TYPES}


def test_full_outer_segments_cover_both_sides(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap

    out = olap.viewers_vs_buyers(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    viewers = {r[0] for r in ev.filter(F.col("event_type") == "view").select("user_id").distinct().collect()}
    buyers = {r[0] for r in ev.filter(F.col("event_type") == "purchase").select("user_id").distinct().collect()}
    assert {r["user_id"] for r in out} == viewers | buyers
    for r in out:
        if r["segment"] == "view_only":
            assert r["n_views"] > 0 and r["n_purchases"] == 0
        elif r["segment"] == "purchase_only":
            assert r["n_purchases"] > 0 and r["n_views"] == 0
        else:
            assert r["n_views"] > 0 and r["n_purchases"] > 0


def test_price_position_bounds_and_monotonic(spark, sf_dir):
    out = windows.order_price_position(spark, sf_dir).collect()
    by_p = {}
    for r in out:
        assert 0.0 <= r["price_pct_rank"] <= 1.0
        assert 0.0 < r["price_cume_dist"] <= 1.0
        by_p.setdefault(r["o_orderpriority"], []).append(r)
    for rows in by_p.values():
        rows.sort(key=lambda r: r["o_totalprice"])
        ranks = [r["price_pct_rank"] for r in rows]
        assert ranks == sorted(ranks)  # non-decreasing with price
        assert max(r["price_cume_dist"] for r in rows) == 1.0


def test_stratified_sample_rates_bounded(spark, sf_dir):
    out = text.stratified_sample_report(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r["n_sampled"] <= r["n_total"]
        assert r["target_pct"] == text.STRATA_PCT.get(r["lang"], text.DEFAULT_STRATUM_PCT)


def test_token_budget_bins_partition_corpus(spark, sf_dir):
    out = text.token_budget_bins(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in out) == docs.count()
    assert sum(r["bin_chars"] for r in out) == docs.agg(F.sum("n_chars")).first()[0]
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["bin_id"])
    for bins in by_lang.values():
        assert sorted(bins) == list(range(len(bins)))  # consecutive from 0


def test_training_corpus_mix_is_subset_of_corpus(spark, sf_dir):
    out = dedup.training_corpus_mix(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert 0 < sum(r["n_docs"] for r in out) <= docs.count()
    assert {r["split"] for r in out} <= {"train", "holdout"}
    langs = {r[0] for r in docs.select("lang").distinct().collect()}
    assert {r["lang"] for r in out} <= langs


def test_decontamination_excludes_eval_docs(spark, sf_dir):
    out = dedup.decontamination_report(spark, sf_dir).collect()
    for r in out:
        assert r["doc_id"] % dedup.EVAL_MOD != 0  # eval docs never flagged
        assert 1 <= r["n_contaminated"] <= r["n_shingles"]
        assert 0.0 < r["contamination_rate"] <= 1.0


def test_fuzzy_pairs_within_threshold_and_blocked(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import fuzzy

    out = fuzzy.fuzzy_name_pairs(spark, sf_dir).collect()
    for r in out:
        assert 0 <= r["edit_distance"] <= fuzzy.MAX_EDIT_DISTANCE
        # blocking key: pairs share their last name token
        assert r["name_a"].split()[-1] == r["name_b"].split()[-1]
        assert r["name_a"] != r["name_b"]


def test_kmeans_covers_corpus_and_improves_inertia(spark, sf_dir):
    out = similarity.kmeans_cluster_stats(spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_members"] for r in out) == n_vecs
    assert 1 <= len(out) <= similarity.KMEANS_K
    for r in out:
        assert r["mean_sqdist"] >= 0.0


def test_chi2_nonnegative_and_consistent(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap

    row = olap.lang_source_chi2(spark, sf_dir).collect()[0]
    assert row["chi2"] >= 0.0
    assert 0.0 <= row["cramers_v"] <= 1.0 + 1e-9
    assert row["dof"] >= 1 and row["n_cells"] >= 1


def test_pagerank_ranks_positive_and_suppliers_sink(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import graph

    out = graph.pagerank_top_nodes(spark, sf_dir).collect()
    assert len(out) == graph.TOP_NODES
    assert [r["pos"] for r in out] == list(range(1, len(out) + 1))
    ranks = [r["rank_e12"] for r in out]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r["rank_e12"] > 0 for r in out)
    # bipartite graph: all mass flows customers -> suppliers, so the top
    # nodes are supplier-side
    assert out[0]["is_supplier"]


def test_bpe_tokens_at_least_ws_tokens(spark, sf_dir):
    out = text.bpe_token_estimate(spark, sf_dir).collect()
    for r in out:
        # subword lexing never merges across whitespace, so it cannot
        # produce fewer tokens than the whitespace count (for non-empty docs)
        if r["n_ws_tokens"] > 0:
            assert r["n_bpe_tokens"] >= r["n_ws_tokens"]
            assert r["tokens_per_word"] >= 1.0


def test_hybrid_rrf_bounds(spark, sf_dir):
    out = similarity.hybrid_search_rrf(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert 1 <= len(out) <= similarity.RRF_TOP
    scores = [r["rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    hi = 2.0 / (similarity.RRF_K + 1)
    lo = 2.0 / (similarity.RRF_K + n)
    for r in out:
        assert lo <= r["rrf_score"] <= hi
        assert 1 <= r["rank_lex"] <= n and 1 <= r["rank_vec"] <= n


def test_table_profile_counts_consistent(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import quality

    out = {r["col_name"]: r for r in quality.table_profile(spark, sf_dir).collect()}
    n = load_table(spark, sf_dir, "orders").count()
    assert set(out) == set(quality._PROFILE_COLS)
    for c, r in out.items():
        assert r["n_rows"] == n
        assert 0 <= r["n_nulls"] <= n
        assert 1 <= r["n_distinct"] <= n
        if c in quality._NUMERIC_COLS:
            assert r["min_val"] is not None and r["min_val"] <= r["max_val"]
        else:
            assert r["min_val"] is None and r["max_val"] is None


def test_dq_checks_all_pass_on_clean_data(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import quality

    out = quality.dq_checks(spark, sf_dir).collect()
    assert len(out) == 5
    # driver testdata is referentially clean, so the whole suite passes
    for r in out:
        assert r["metric"] == 1.0 and r["passed"], r["check_name"]


def test_journey_patterns_consistent(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import sequences

    per_user = sequences.user_journey_patterns(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    counts = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert {r["user_id"] for r in per_user} == set(counts)
    for r in per_user:
        assert r["n_events"] == counts[r["user_id"]]
        # funnel requires all three stages, so it implies the weaker pattern set
        if r["funnel_vcp"]:
            assert r["n_events"] >= 3

    rollup = {
        r["pattern"]: r["n_users"]
        for r in sequences.journey_pattern_counts(spark, sf_dir).collect()
    }
    for name in sequences.PATTERNS:
        assert rollup[name] == sum(1 for r in per_user if r[name])


def test_bm25_ranks_and_bounds(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import ranking

    out = ranking.bm25_topk(spark, sf_dir).collect()
    assert 1 <= len(out) <= ranking.TOP_K
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    scores = [r["bm25"] for r in out]
    assert scores == sorted(scores, reverse=True)
    for r in out:
        assert r["bm25"] > 0
        assert 1 <= r["n_matched_terms"] <= len(ranking.QUERY_TERMS)


def test_hot_keys_threshold_and_order(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import frequency

    out = frequency.hot_keys_report(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    d = li.select("l_partkey").distinct().count()
    counts = [r["cnt"] for r in out]
    assert counts == sorted(counts, reverse=True)
    for r in out:
        assert r["cnt"] * d * 10 >= 15 * n  # exact integer hot predicate
        assert r["ratio_to_mean"] >= 1.5


def test_psi_bins_partition_events(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import drift

    out = drift.value_drift_psi(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_base"] + r["n_curr"] for r in out) == n
    assert {r["bin_id"] for r in out} <= set(range(drift.N_BINS))
    total = drift.drift_psi_total(spark, sf_dir).collect()[0]
    assert abs(total["psi"] - sum(r["psi_term"] for r in out)) < 1e-6
    assert total["verdict"] in ("stable", "moderate_shift", "significant_shift")


def test_benford_shares_sum_to_one(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import quality

    out = quality.benford_audit(spark, sf_dir).collect()
    assert {r["digit"] for r in out} <= set(range(1, 10))
    n = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_obs"] for r in out) == n
    assert abs(sum(r["obs_share"] for r in out) - 1.0) < 1e-4
    assert abs(sum(r["exp_share"] for r in out) - 1.0) < 1e-4
    for r in out:
        assert r["abs_dev"] >= 0


def test_weighted_sample_deterministic_and_sorted(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import sampling

    a = sampling.weighted_sample_topk(spark, sf_dir).collect()
    b = sampling.weighted_sample_topk(spark, sf_dir).collect()
    assert a == b  # replayable: same sample bits on every run
    assert len(a) == min(
        sampling.SAMPLE_K, load_table(spark, sf_dir, "documents").count()
    )
    pris = [r["log_priority"] for r in a]
    assert pris == sorted(pris, reverse=True)
    for r in a:
        assert r["log_priority"] <= 0.0 and r["weight"] >= 1


def test_dsir_weights_favor_target_language(spark, sf_dir):
    """The DSIR construction working = target-slice docs score higher on
    the hashed-n-gram log-ratio than any other language, and the Gumbel
    resample is enriched in the target language vs its base rate."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import sampling

    w = sampling.dsir_importance_weights(spark, sf_dir).collect()
    by_lang: dict[str, list[float]] = {}
    for r in w:
        by_lang.setdefault(r["lang"], []).append(r["log_weight"])
    means = {k: sum(v) / len(v) for k, v in by_lang.items()}
    tgt = sampling.DSIR_TARGET_LANG
    assert all(means[tgt] > m for k, m in means.items() if k != tgt)

    sample = sampling.dsir_resample_topk(spark, sf_dir).collect()
    assert len(sample) == min(sampling.SAMPLE_K, len(w))
    keys = [r["gumbel_key"] for r in sample]
    assert keys == sorted(keys, reverse=True)
    base_rate = len(by_lang[tgt]) / len(w)
    sample_rate = sum(1 for r in sample if r["lang"] == tgt) / len(sample)
    assert sample_rate > base_rate
    # replayable: the selected ids are a pure function of the data
    again = sampling.dsir_resample_topk(spark, sf_dir).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in sample]

    # out-of-fold scoring: the held-out slice is disjoint and ~1/DSIR_FOLDS
    # of the corpus, and removing self-influence DEFLATES the target
    # language's mean score (each in-sample target doc's own grams inflate
    # p_target) — the inflation the held-out pass exists to expose; on
    # this synthetic corpus the cross-doc signal all but vanishes
    held = sampling.dsir_heldout_scores(spark, sf_dir).collect()
    held_ids = {r["doc_id"] for r in held}
    assert held_ids and held_ids < {r["doc_id"] for r in w}
    assert len(held) < len(w) / 2
    h_tgt = [r["log_weight"] for r in held if r["lang"] == tgt]
    if h_tgt:
        assert means[tgt] > sum(h_tgt) / len(h_tgt)


def test_cv_fold_leakage_consistent_with_fingerprint_groups(spark, sf_dir):
    """Fold totals cover the corpus; leaked docs are exactly the members
    of multi-member fingerprint groups that straddle folds, so the leaked
    count is bounded by the duplicate mass."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import dedup

    rep = dedup.cv_fold_leakage_report(spark, sf_dir).collect()
    assert sorted(r["fold"] for r in rep) == list(range(dedup.N_FOLDS))
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rep) == n_docs
    dup_mass = sum(
        r["n_members"]
        for r in dedup.dedup_fingerprint(spark, sf_dir).collect()
        if r["n_members"] > 1
    )
    assert sum(r["n_leaked_docs"] for r in rep) <= dup_mass
    for r in rep:
        assert 0 <= r["n_leaked_docs"] <= r["n_docs"]
        assert 0.0 <= r["leak_frac"] <= 1.0


def test_k_anonymity_monotone_in_k(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import quality

    rep = quality.k_anonymity_report(spark, sf_dir).collect()
    assert [r["k"] for r in rep] == list(quality.K_ANON_THRESHOLDS)
    below = [r["n_classes_below"] for r in rep]
    at_risk = [r["n_rows_at_risk"] for r in rep]
    assert below == sorted(below) and at_risk == sorted(at_risk)
    assert len({r["n_classes_total"] for r in rep}) == 1
    for r in rep:
        assert 0.0 <= r["frac_rows_at_risk"] <= 1.0
        assert r["n_classes_below"] <= r["n_classes_total"]


def test_cohort_survival_km_invariants(spark, sf_dir):
    """KM bookkeeping: the risk set shrinks by exactly the deaths+censored
    of the prior row, survival is non-increasing within a cohort, and the
    per-user tally covers every user once."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import timeseries as ts

    rows = ts.cohort_survival_km(spark, sf_dir).collect()
    assert rows
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    for curve in by_cohort.values():
        curve.sort(key=lambda r: r["duration"])
        for prev, cur in zip(curve, curve[1:]):
            assert (
                cur["n_at_risk"]
                == prev["n_at_risk"] - prev["n_deaths"] - prev["n_censored"]
            )
            assert cur["survival"] <= prev["survival"] + 1e-9
        assert all(0.0 <= r["survival"] <= 1.0 for r in curve)
        assert all(r["n_deaths"] + r["n_censored"] >= 1 for r in curve)
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_deaths"] + r["n_censored"] for r in rows) == n_users


def test_multi_touch_attribution_conserves_value(spark, sf_dir):
    """Both models distribute (almost) exactly the touched conversions'
    total value — the integer-division remainder is the only loss — and
    channels stay within the configured touch types."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import asof

    out = asof.multi_touch_attribution(spark, sf_dir).collect()
    assert {r["channel"] for r in out} <= set(asof.ATTR_TOUCH_TYPES)
    lin = sum(r["linear_value"] for r in out)
    pos = sum(r["positional_value"] for r in out)
    # ground truth: total value of purchases that have >= 1 touch in window
    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("cts"), "value"
    )
    touch = ev.filter(F.col("event_type").isin(*asof.ATTR_TOUCH_TYPES)).select(
        "user_id", F.col("ts").alias("tts")
    )
    touched = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("tts") <= F.col("cts"))
            & (F.col("tts") > F.col("cts") - F.expr(f"INTERVAL {asof.ATTR_WINDOW_DAYS} DAYS"))
        )
        .select("cid", "value")
        .distinct()
    )
    truth = sum(r["value"] for r in touched.collect())
    assert abs(lin - truth) / truth < 0.001
    assert abs(pos - truth) / truth < 0.001


def test_zipf_fit_flags_flat_synthetic_vocabulary(spark, sf_dir):
    """The driver corpus is word-salad over a tiny vocabulary, so the
    rank-frequency slope must be far flatter than natural text's ≈ −1 —
    exactly the boilerplate signature the operator exists to flag — and
    the bookkeeping columns must be consistent."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import text

    [r] = text.zipf_fit_report(spark, sf_dir).collect()
    assert r["n_fit_tokens"] == min(text.ZIPF_TOP, r["vocab_size"])
    assert r["slope"] < 0.0  # frequency still decreases in rank
    assert r["slope"] > -0.8  # …but far flatter than natural language
    assert r["n_token_mass"] >= r["vocab_size"]
    assert r["intercept"] > 0.0


def test_forecast_backtest_covers_holdout_week(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import timeseries as ts

    out = ts.forecast_backtest_mape(spark, sf_dir).collect()
    types = {
        r["event_type"]
        for r in load_table(spark, sf_dir, "events").select("event_type").distinct().collect()
    }
    assert {r["event_type"] for r in out} == types
    for r in out:
        assert 1 <= r["n_test_days"] <= ts.BACKTEST_DAYS
        assert 0 <= r["n_zero_days"] <= r["n_test_days"]
        assert r["mape"] >= 0.0 and r["wape"] >= 0.0
        # WAPE is a volume-weighted MAPE: both zero together
        assert (r["mape"] == 0.0) == (r["wape"] == 0.0)


def test_approx_percentiles_bounded_error(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap

    out = olap.approx_value_percentiles(spark, sf_dir).collect()
    assert len(out) >= 1
    for r in out:
        # monotone quantiles, both estimators
        assert r["approx_p50"] <= r["approx_p90"] <= r["approx_p99"]
        assert r["exact_p50"] <= r["exact_p90"] <= r["exact_p99"]
        # nearest-rank vs interpolation differ at tiny N; sketch error itself
        # is ~1/accuracy — keep an honest generous bound for sf test data
        assert r["max_rel_error"] < 0.5


def test_missing_days_complement_active_days(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import timeseries

    out = timeseries.user_missing_days(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    ).collect()[0]
    span_days = (hi - lo).days + 1
    active = (
        ev.filter(F.col("user_id") <= timeseries.MISSING_DAYS_MAX_USER)
        .groupBy("user_id")
        .agg(F.countDistinct(F.to_date("ts")).alias("n_active"))
        .collect()
    )
    missing_by_user = {}
    for r in out:
        assert lo <= r["missing_day"] <= hi
        missing_by_user.setdefault(r["user_id"], 0)
        missing_by_user[r["user_id"]] += 1
    for r in active:
        assert missing_by_user.get(r["user_id"], 0) == span_days - r["n_active"]


def test_cusum_closed_form_equals_recursion(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import anomaly

    out = anomaly.cusum_alerts(spark, sf_dir).collect()
    # recompute one series with the literal recursion S_t = max(0, S+x-k)
    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("hour")
        .collect()
    )
    total, cells = sum(r["n"] for r in rows), len(rows)
    k_e3 = int(total * 1000.0 / cells + 0.5)
    s, expect = 0, {}
    for r in rows:
        s = max(0, s + r["n"] * 1000 - k_e3)
        if s * 1000 > k_e3 * anomaly.ALERT_MULTIPLE_E3:
            expect[r["hour"]] = s / 1000.0
    got = {r["hour"]: r["cusum"] for r in out if r["event_type"] == "error"}
    assert got == expect


def test_daily_trend_matches_numpy_lstsq(spark, sf_dir):
    import numpy as np

    from data_pipeline_for_autonomous_vehicles_spark.operators import anomaly

    out = {r["event_type"]: r for r in anomaly.daily_value_trend(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg((F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")) / 100.0).alias("s"))
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["s"]))
    for et, pts in series.items():
        pts.sort()
        d0 = pts[0][0]
        x = np.array([(d - d0).days for d, _ in pts], dtype=float)
        y = np.array([s for _, s in pts])
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(out[et]["slope_per_day"] - slope) < 1e-2
        assert abs(out[et]["intercept"] - intercept) < 1e-1
        assert out[et]["n_days"] == len(pts)


def test_triangle_count_invariants(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import graph

    r = graph.copurchase_triangle_count(spark, sf_dir).collect()[0]
    n, e, t = r["n_nodes"], r["n_edges"], r["n_triangles"]
    assert 0 < n and 0 < e <= n * (n - 1) // 2
    # each triangle needs 3 edges; an edge is in at most (n-2) triangles
    assert 0 <= t <= e * (n - 2) // 3


def test_copurchase_edges_hot_basket_spill(spark):
    """A basket larger than BASKET_CAP must spill to the chunked expansion
    path and still produce exactly the pair set of the naive distinct +
    self-join (the round-9 oversized-basket guard: one pathological giant
    order may not expand O(k²) structs inside a single row/task)."""
    from pyspark.sql import functions as F

    from data_pipeline_for_autonomous_vehicles_spark.operators.graph import (
        BASKET_CAP,
        _copurchase_edges,
    )

    hot_k = BASKET_CAP * 2 + 7  # spans 3 chunks, incl. a partial tail chunk
    rows = [(1, p * 3 + 1) for p in range(hot_k)]  # the hot order
    rows += [(2, p) for p in (5, 9, 2)]  # a normal basket
    rows += [(3, 7), (3, 7), (3, 11)]  # duplicate lineitems collapse
    rows += [(4, 42)]  # singleton basket: no pairs
    li = spark.createDataFrame(rows, "l_orderkey INT, l_partkey INT")

    got = {(r["p1"], r["p2"]) for r in _copurchase_edges(li).collect()}

    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    want = {
        (r["p1"], r["p2"])
        for r in a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .distinct()
        .collect()
    }
    assert got == want
    assert len(want) >= hot_k * (hot_k - 1) // 2  # the hot basket really fanned out


def test_postings_sorted_capped_consistent(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import ranking

    out = ranking.term_postings(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(out) >= 1
    for r in out:
        ids = r["top_doc_ids"]
        assert ids == sorted(ids)
        assert len(ids) == min(r["df"], ranking.POSTINGS_CAP)
        assert r["total_tf"] >= r["df"] and r["df"] <= n_docs


def test_latency_histogram_shares(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import asof

    out = asof.view_to_purchase_latency(spark, sf_dir).collect()
    n_views = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .count()
    )
    assert {r["bucket"] for r in out} <= {"lt_5m", "5m_to_15m", "15m_to_1h"}
    assert 0 < sum(r["n_views"] for r in out) <= n_views  # each view ≤ once
    assert abs(sum(r["share"] for r in out) - 1.0) < 1e-3


def test_inter_purchase_gap_counts(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import timeseries

    r = timeseries.inter_purchase_gaps(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    n_p = purchases.count()
    n_buyers = purchases.select("user_id").distinct().count()
    assert r["n_gaps"] == n_p - n_buyers  # one fewer gap than events per user
    assert 0 < r["p50_gap_min"] <= r["p90_gap_min"]
    assert r["mean_gap_min"] > 0


def test_spend_deciles_partition_customers(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap

    out = olap.customer_spend_deciles(spark, sf_dir).collect()
    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in out) == n_cust
    assert [r["decile"] for r in out] == sorted(r["decile"] for r in out)
    # buckets are value-ordered: each decile's max ≤ the next decile's min
    for lo, hi in zip(out, out[1:]):
        assert lo["spend_max"] <= hi["spend_min"]
        # roughly equal populations (boundary bucketing, ±interpolation slack)
        assert abs(lo["n_customers"] - n_cust / 10) <= max(2, n_cust * 0.02)


def test_top_journeys_shares_and_order(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import sequences

    out = sequences.top_journeys(spark, sf_dir).collect()
    assert 1 <= len(out) <= sequences.TOP_JOURNEYS
    counts = [r["n_users"] for r in out]
    assert counts == sorted(counts, reverse=True)
    for r in out:
        assert 1 <= len(r["journey_prefix"]) <= sequences.PREFIX_LEN
        assert set(r["journey_prefix"]) <= set("cepsv")
        assert 0 < r["user_share"] <= 1


def test_seasonality_covers_all_events(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import timeseries

    out = timeseries.event_seasonality(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in out) == n
    assert len(out) <= 168
    for r in out:
        assert 1 <= r["dow_iso"] <= 7 and 0 <= r["hour"] <= 23
    assert abs(sum(r["share"] for r in out) - 1.0) < 1e-2


def test_variant_stats_agree_with_json_path(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap

    variant = {r["event_type"]: r for r in olap.props_variant_stats(spark, sf_dir).collect()}
    legacy = {r["event_type"]: r for r in olap.props_json_stats(spark, sf_dir).collect()}
    assert set(variant) == set(legacy)
    for et, v in variant.items():
        # two extraction paths, one answer
        assert v["n_with_k"] == legacy[et]["n_with_k"]
        assert v["n_rows"] >= v["n_with_k"] >= v["n_distinct_k"] >= 1


def test_hll_union_mergeability(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap

    out = olap.hll_mergeable_distinct(spark, sf_dir).collect()
    assert len(out) >= 1
    for r in out:
        # union of daily sketches ≡ one whole-range sketch (mergeability)
        assert r["union_equals_direct"], r
        # HLL (lgConfigK=12 default) is ~1.6% σ; allow 5σ
        assert abs(r["est_direct"] - r["exact_users"]) <= max(2, 0.08 * r["exact_users"])


def test_ann_pq_structural_invariants(spark, sf_dir):
    # PQ ADC search: exactly PQ_TOP rows, approx distances nonnegative and
    # nondecreasing in output order, and the whole computation (codebook
    # training included) is deterministic run-to-run. Recall vs exact is
    # data-limited on the near-random synthetic embeddings (distance
    # concentration), so it is audited, not asserted.
    from data_pipeline_for_autonomous_vehicles_spark.operators.similarity import (
        PQ_TOP,
        ann_pq_topk,
    )

    rows1 = ann_pq_topk(spark, sf_dir).collect()
    assert len(rows1) == PQ_TOP
    dists = [r.approx_sqdist for r in rows1]
    assert all(d >= 0 for d in dists)
    assert dists == sorted(dists)
    assert all(r.exact_sqdist >= 0 for r in rows1)
    rows2 = ann_pq_topk(spark, sf_dir).collect()
    assert [tuple(r) for r in rows1] == [tuple(r) for r in rows2]


def test_rank_of_topk_equals_row_number_with_ties(spark):
    # rank_of_topk replaced the display-rank windows in bm25/pagerank; it
    # must reproduce ROW_NUMBER() OVER (ORDER BY score DESC, id ASC)
    # exactly, including tie groups and a single max row
    from pyspark.sql import Row

    from data_pipeline_for_autonomous_vehicles_spark.operators.ranking import (
        rank_of_topk,
    )

    rows = [
        Row(id=5, score=10.0),
        Row(id=2, score=10.0),  # tie with id=5 -> id 2 ranks first
        Row(id=9, score=30.0),
        Row(id=1, score=20.0),
        Row(id=7, score=20.0),
        Row(id=3, score=5.0),
    ]
    got = {
        r.id: r.topk_pos
        for r in rank_of_topk(spark.createDataFrame(rows), "score", "id").collect()
    }
    assert got == {9: 1, 1: 2, 7: 3, 2: 4, 5: 5, 3: 6}


def test_ann_ivfpq_candidates_restricted_to_probed_cells(spark, sf_dir):
    # IVF-PQ must (a) return rows only from the query's NPROBE probed
    # coarse cells and (b) agree with ann_pq_topk's ADC distance on every
    # vector it returns (the fine quantizer is shared)
    from pyspark.sql import functions as F

    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.operators.similarity import (
        N_CENTROIDS,
        N_QUERIES,
        NPROBE,
        PQ_TOP,
        QUERY_VEC,
        _scaled_vec,
        _sq_dist,
        ann_ivfpq_topk,
        ann_pq_topk,
    )

    rows = ann_ivfpq_topk(spark, sf_dir).collect()
    assert len(rows) == PQ_TOP
    cells_used = {r.cell for r in rows}
    assert len(cells_used) <= NPROBE
    assert all(N_QUERIES <= c < N_QUERIES + N_CENTROIDS for c in cells_used)
    # the query's true NPROBE nearest coarse cells (int L2, tie by cent_id)
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", _scaled_vec(F.col("embedding")).alias("sx"))
    coarse = vecs.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + N_CENTROIDS)
    ).select(F.col("vec_id").alias("cent_id"), F.col("sx").alias("cx"))
    qv = vecs.filter(F.col("vec_id") == QUERY_VEC).select(F.col("sx").alias("q"))
    probed = {
        r.cent_id
        for r in coarse.crossJoin(F.broadcast(qv))
        .select("cent_id", _sq_dist(F.col("cx"), F.col("q")).alias("d"))
        .orderBy("d", "cent_id")
        .limit(NPROBE)
        .collect()
    }
    assert cells_used <= probed
    # shared fine quantizer: ADC distances agree with the global PQ query
    pq = {r.vec_id: r.approx_sqdist for r in ann_pq_topk(spark, sf_dir).collect()}
    for r in rows:
        if r.vec_id in pq:
            assert r.approx_sqdist == pq[r.vec_id]


def test_seasonal_outliers_match_bruteforce(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import anomaly

    out = {
        (r["event_type"], r["hour"]): (r["n_events"], r["direction"])
        for r in anomaly.seasonal_residual_outliers(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.groupBy(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    groups = {}
    for r in cells:
        key = (r["event_type"], r["hour"].isoweekday(), r["hour"].hour)
        groups.setdefault(key, []).append((r["hour"], r["n"]))
    expect = {}
    for (et, dow, hod), members in groups.items():
        sum_n, n_cells = sum(n for _, n in members), len(members)
        for hour, n in members:
            if n * n_cells >= 2 * sum_n:
                expect[(et, hour)] = (n, "high")
            elif 2 * n * n_cells <= sum_n:
                expect[(et, hour)] = (n, "low")
    assert out == expect
    assert any(d == "high" for _, d in out.values())
    assert any(d == "low" for _, d in out.values())


def test_winsorized_stats_bounds_and_clip_counts(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import quality

    out = {r["event_type"]: r for r in quality.value_winsorized_stats(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    vals = (
        ev.select("event_type", F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("v"))
        .collect()
    )
    series = {}
    for r in vals:
        series.setdefault(r["event_type"], []).append(r["v"])
    for et, vs in series.items():
        vs.sort()
        n = len(vs)
        k_lo, k_hi = (5 * n + 99) // 100, (95 * n + 99) // 100
        lo, hi = vs[k_lo - 1], vs[k_hi - 1]  # smallest value whose CDF >= k
        r = out[et]
        assert r["n"] == n
        assert r["p05_value"] == lo / 100.0
        assert r["p95_value"] == hi / 100.0
        assert r["n_clipped_low"] == sum(1 for v in vs if v < lo)
        assert r["n_clipped_high"] == sum(1 for v in vs if v > hi)
        wmean = sum(min(max(v, lo), hi) for v in vs) / n / 100.0
        assert abs(r["winsorized_mean"] - wmean) < 1e-3
        # winsorization pulls the mean toward the middle, never outside bounds
        assert lo / 100.0 <= r["winsorized_mean"] <= hi / 100.0


def test_containment_pairs_bounds_and_asymmetry(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import dedup

    rows = dedup.ngram_containment_pairs(spark, sf_dir, topk=None).collect()
    assert rows, "expect some subsumed near-dups at test SF"
    for r in rows:
        a, b = r["containment_a_in_b"], r["containment_b_in_a"]
        assert 0.0 < a <= 1.0 and 0.0 < b <= 1.0
        # admission rule: the smaller side is >=80% contained in the other
        assert max(a, b) >= 0.8 - 1e-4


def test_pair_reports_bounded_emission(spark, sf_dir):
    """The default pair reports are bounded to per-doc top-k: every doc
    appears <= TOPK_NEIGHBORS times, ranks are 1..m contiguous, scores are
    non-increasing within a doc, and each (doc, neighbor, score) row comes
    from the unbounded pair list (mirrored)."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import dedup

    full = dedup.ngram_jaccard_pairs(spark, sf_dir, topk=None).collect()
    mirrored = {}
    for r in full:
        mirrored.setdefault(r["doc_a"], {})[r["doc_b"]] = r["jaccard"]
        mirrored.setdefault(r["doc_b"], {})[r["doc_a"]] = r["jaccard"]
    topk = dedup.ngram_jaccard_pairs(spark, sf_dir).collect()
    per_doc = {}
    for r in topk:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rows in per_doc.items():
        assert len(rows) <= dedup.TOPK_NEIGHBORS
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["jaccard"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        # exactly the k best neighbors of this doc (score desc, id asc)
        want = sorted(mirrored[doc].items(), key=lambda kv: (-kv[1], kv[0]))[
            : dedup.TOPK_NEIGHBORS
        ]
        assert [(r["neighbor"], r["jaccard"]) for r in rows] == want
    # every doc with at least one qualifying pair is represented
    assert set(per_doc) == set(mirrored)


def test_conversion_lift_ztest_consistency(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap

    rows = olap.conversion_lift_by_nation(spark, sf_dir).collect()
    assert rows, "non-degenerate split expected at test SF"
    tv = sum(r["n_views"] for r in rows)
    tp = sum(r["n_converted"] for r in rows)
    assert 0 < tp < tv
    for r in rows:
        assert 0 <= r["n_converted"] <= r["n_views"]
        assert 0.0 <= r["cvr"] <= 1.0
        assert abs(r["cvr"] - r["n_converted"] / r["n_views"]) < 1e-3
        # z sign agrees with lift sign; both finite
        import math

        assert math.isfinite(r["z_score"]) and math.isfinite(r["lift_vs_rest"])
        if abs(r["lift_vs_rest"]) > 1e-9:
            assert (r["z_score"] > 0) == (r["lift_vs_rest"] > 0)


def test_ks_test_matches_scipy_free_bruteforce(spark, sf_dir):
    """KS D statistic must equal the brute-force empirical-CDF sup gap."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import drift

    r = drift.value_ks_test(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    vals = ev.filter(F.col("event_type").isin("purchase", "view")).select(
        "event_type", "value"
    ).collect()
    a = sorted(v["value"] for v in vals if v["event_type"] == "purchase")
    b = sorted(v["value"] for v in vals if v["event_type"] == "view")
    import bisect

    grid = sorted(set(a) | set(b))
    d = max(
        abs(bisect.bisect_right(a, x) / len(a) - bisect.bisect_right(b, x) / len(b))
        for x in grid
    )
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert abs(r["ks_d"] - d) < 1e-5
    import math

    stat = math.sqrt(len(a) * len(b) / (len(a) + len(b))) * d
    assert abs(r["ks_stat"] - stat) < 1e-3
    assert r["reject_at_5pct"] == (stat > 1.358)


def test_mannwhitney_matches_bruteforce_pairs(spark, sf_dir):
    """U must equal the literal pair count #(a>b) + 0.5*#(a==b)."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import drift

    r = drift.value_mannwhitney_test(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    vals = ev.filter(F.col("event_type").isin("purchase", "view")).select(
        "event_type", "value"
    ).collect()
    a = sorted(v["value"] for v in vals if v["event_type"] == "purchase")
    b = sorted(v["value"] for v in vals if v["event_type"] == "view")
    import bisect

    u2 = 0  # 2U as an exact integer
    for x in a:
        lt = bisect.bisect_left(b, x)
        eq = bisect.bisect_right(b, x) - lt
        u2 += 2 * lt + eq
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert r["u_stat"] == u2 / 2.0
    # z consistent with normal approx against scipy-free recomputation
    import math

    n = len(a) + len(b)
    from collections import Counter

    ties = Counter(a) + Counter(b)
    tie3 = sum(t**3 - t for t in ties.values())
    var_u = len(a) * len(b) / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u2 / 2.0 - len(a) * len(b) / 2.0) / math.sqrt(var_u)
    assert abs(r["z_score"] - z) < 1e-3
    assert r["reject_at_5pct"] == (abs(z) > 1.96)


def test_simhash_hamming_pairs_verified_and_recall(spark, sf_dir):
    """Every returned pair is verified ≤ HAMMING_MAX, ordered, and — the
    pigeonhole recall guarantee — every fingerprint pair within the
    threshold whose four 8-bit bands all sit in un-capped buckets appears
    in the output."""
    fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash_fingerprints(spark, sf_dir).collect()}
    out = dedup.simhash_hamming_pairs(spark, sf_dir).collect()
    got = set()
    for r in out:
        assert r["doc_a"] < r["doc_b"]
        assert bin(fps[r["doc_a"]] ^ fps[r["doc_b"]]).count("1") == r["hamming"]
        assert r["hamming"] <= dedup.HAMMING_MAX
        got.add((r["doc_a"], r["doc_b"]))
    # recall check on a brute-force subsample (full O(n²) is fine at sf0.001)
    from collections import Counter

    bucket_sizes = Counter()
    for d, fp in fps.items():
        for b in range(dedup.SIMHASH_N_BANDS):
            bucket_sizes[(b, (fp >> (8 * b)) & 255)] += 1
    ids = sorted(fps)
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            if bin(fps[da] ^ fps[db]).count("1") <= dedup.HAMMING_MAX:
                bands_ok = any(
                    ((fps[da] >> (8 * b)) & 255) == ((fps[db] >> (8 * b)) & 255)
                    and bucket_sizes[(b, (fps[da] >> (8 * b)) & 255)] <= dedup.MAX_BUCKET
                    for b in range(dedup.SIMHASH_N_BANDS)
                )
                if bands_ok:
                    assert (da, db) in got


def test_bpe_merge_candidates_counts_and_order(spark, sf_dir):
    """Top pair count equals a literal Python recount of the corpus, and
    the report is (n desc, pair asc) ordered."""
    out = text.bpe_merge_candidates(spark, sf_dir).collect()
    assert out == sorted(out, key=lambda r: (-r["n"], r["pair"]))
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    from collections import Counter

    c = Counter()
    for row in docs:
        for w in row["text"].strip().lower().split():
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += 1
    top = out[0]
    assert c[top["pair"]] == top["n"] == max(c.values())


def test_training_shards_partition_and_determinism(spark, sf_dir):
    """Shards partition the corpus exactly (doc/token/char totals are
    conserved) and assignment is stable across runs."""
    out = text.training_shards(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in out) == docs.count()
    assert sum(r["sum_chars"] for r in out) == docs.agg(F.sum("n_chars")).first()[0]
    assert all(0 <= r["shard"] < text.N_SHARDS for r in out)
    again = text.training_shards(spark, sf_dir).collect()
    assert out == again


def test_minhash_audit_exactness_and_candidate_parity(spark, sf_dir):
    """Audit rows cover exactly the LSH candidate set; est = matches/k in
    fixed point; exact Jaccard matches a literal Python shingle recount."""
    audit = dedup.minhash_estimate_audit(spark, sf_dir, rollup=False).collect()
    pairs_q = {(r["doc_a"], r["doc_b"]) for r in dedup.minhash_lsh_pairs(spark, sf_dir).collect()}
    assert {(r["doc_a"], r["doc_b"]) for r in audit} == pairs_q
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }

    def shingles(t):
        w = t.strip().lower().split()
        return {" ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 0))}

    for r in audit:
        assert 0 <= r["est_matches"] <= dedup.MINHASH_K
        assert abs(r["est_jaccard"] - r["est_matches"] / dedup.MINHASH_K) < 1e-9
        sa, sb = shingles(docs[r["doc_a"]]), shingles(docs[r["doc_b"]])
        assert r["n_inter"] == len(sa & sb)
        assert r["n_union"] == len(sa | sb)
        assert abs(r["abs_err"] - abs(r["est_jaccard"] - r["exact_jaccard"])) < 1.01e-4


def test_minhash_audit_rollup_matches_per_pair(spark, sf_dir):
    """The bounded (default) rollup is an exact fixed-point aggregation of
    the per-pair audit frame: counts, round-half-up means, and maxes per
    est_matches level."""
    from collections import defaultdict

    per_pair = dedup.minhash_estimate_audit(spark, sf_dir, rollup=False).collect()
    rolled = {r["est_matches"]: r for r in dedup.minhash_estimate_audit(spark, sf_dir).collect()}
    groups = defaultdict(list)
    for r in per_pair:
        groups[r["est_matches"]].append(r)
    assert set(rolled) == set(groups)
    for m, rows in groups.items():
        rr = rolled[m]
        n = len(rows)
        assert rr["n_pairs"] == n
        assert abs(rr["est_jaccard"] - m / dedup.MINHASH_K) < 1e-9
        ex4 = [round(r["exact_jaccard"] * 10000) for r in rows]
        ab4 = [round(r["abs_err"] * 10000) for r in rows]
        assert round(rr["mean_exact_jaccard"] * 10000) == (2 * sum(ex4) + n) // (2 * n)
        assert round(rr["mean_abs_err"] * 10000) == (2 * sum(ab4) + n) // (2 * n)
        assert round(rr["max_abs_err"] * 10000) == max(ab4)


def test_mad_outliers_match_bruteforce(spark, sf_dir):
    """Median, MAD, and outlier count match a literal Python recomputation
    (percentile_disc lower-bound semantics on cent-rounded values)."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import quality

    out = {r["event_type"]: r for r in quality.value_mad_outliers(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    import math
    from collections import defaultdict

    groups = defaultdict(list)
    for r in ev:
        groups[r["event_type"]].append(int(math.floor(r["value"] * 100.0 + 0.5)))

    def disc_median(vals):
        vals = sorted(vals)
        k = (50 * len(vals) + 99) // 100
        return vals[k - 1]

    for t, vals in groups.items():
        med = disc_median(vals)
        mad = disc_median([abs(v - med) for v in vals])
        n_out = sum(1 for v in vals if abs(v - med) * 10000 > quality.MAD_K_E4 * mad)
        r = out[t]
        assert r["n"] == len(vals)
        assert r["median_value"] == med / 100.0
        assert r["mad_value"] == mad / 100.0
        assert r["n_outliers"] == n_out


def test_cms_overestimates_and_merges(spark, sf_dir):
    """CMS estimates are one-sided (est ≥ exact), and cell-wise addition of
    two half-corpus sketches equals the full-corpus sketch (mergeability —
    the property that lets per-day sketches roll up)."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import frequency

    out = frequency.cms_token_counts(spark, sf_dir).collect()
    assert len(out) == frequency.CMS_TOP_K
    for r in out:
        assert r["cms_n"] >= r["exact_n"]
        assert r["overestimate"] == r["cms_n"] - r["exact_n"]

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(frequency._doc_tokens()).alias("token")).filter(
        F.length("token") >= 1
    )
    grid = F.array(
        *[
            F.struct(F.lit(d).alias("d"), frequency._cms_bucket(F.col("token"), d).alias("bucket"))
            for d in range(frequency.CMS_DEPTH)
        ]
    )

    def sketch(df):
        rows = (
            df.select(F.explode(grid).alias("g"))
            .groupBy(F.col("g.d").alias("d"), F.col("g.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        return {(r["d"], r["bucket"]): r["n"] for r in rows}

    full = sketch(toks)
    docs_a = docs.filter(F.col("doc_id") % 2 == 0)
    docs_b = docs.filter(F.col("doc_id") % 2 == 1)
    half_a = sketch(docs_a.select(F.explode(frequency._doc_tokens()).alias("token")).filter(F.length("token") >= 1))
    half_b = sketch(docs_b.select(F.explode(frequency._doc_tokens()).alias("token")).filter(F.length("token") >= 1))
    merged = dict(half_a)
    for k, v in half_b.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == full


def test_dedup_savings_consistent_with_fingerprint_groups(spark, sf_dir):
    """The savings rollup must agree with the fingerprint group report and
    conserve the corpus char total."""
    r = dedup.dedup_token_savings(spark, sf_dir).collect()[0]
    groups = dedup.dedup_fingerprint(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert r["n_groups"] == len(groups)
    assert r["n_docs"] == docs.count()
    assert r["n_dup_docs"] == r["n_docs"] - r["n_groups"]
    assert r["chars_total"] == docs.agg(F.sum("n_chars")).first()[0]
    assert r["chars_total"] == r["chars_kept"] + r["chars_saved"]
    assert 0.0 <= r["savings_share"] <= 1.0


def test_source_centroid_similarity_bounds_and_symmetry_base(spark, sf_dir):
    """Cosines live in [-1, 1]; every unordered source pair appears exactly
    once; identical sources would give cosine 1 (self-pairs excluded)."""
    out = similarity.source_centroid_similarity(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    n_sources = (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .select("source")
        .distinct()
        .count()
    )
    assert len(out) == n_sources * (n_sources - 1) // 2
    seen = set()
    for r in out:
        assert r["source_a"] < r["source_b"]
        assert -1.0 <= r["cosine"] <= 1.0
        seen.add((r["source_a"], r["source_b"]))
    assert len(seen) == len(out)


def test_theilsen_matches_bruteforce(spark, sf_dir):
    """Median-of-slopes matches a literal Python recomputation with the
    same fixed-point truncation and lower-bound median."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import anomaly

    out = {r["event_type"]: r for r in anomaly.daily_trend_theilsen(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    import math
    from collections import defaultdict

    daily = defaultdict(lambda: defaultdict(int))
    for r in ev:
        daily[r["event_type"]][r["ts"].date()] += int(math.floor(r["value"] * 100.0 + 0.5))
    for t, by_day in daily.items():
        days = sorted(by_day)
        x0 = days[0]
        pts = [((d - x0).days, by_day[d]) for d in days]
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dy = (pts[j][1] - pts[i][1]) * 10000
                dx = pts[j][0] - pts[i][0]
                q = abs(dy) // dx if dy >= 0 else -(abs(dy) // dx)  # trunc toward 0
                slopes.append(q)
        slopes.sort()
        k = (50 * len(slopes) + 99) // 100
        med = slopes[k - 1]
        r = out[t]
        assert r["n_days"] == len(days)
        assert r["n_pairs"] == len(slopes)
        assert abs(r["theilsen_slope_per_day"] - med / 1e6) < 1e-12


def test_session_window_native_equals_islands(spark, sf_dir):
    """The native session_window operator and a lag/cumsum islands
    recomputation (gap ≥ 30 min starts a session) agree exactly."""
    out = {r["user_id"]: r for r in windows.session_window_stats(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id").collect()
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"]))
    gap = windows.SESSION_GAP_MINUTES * 60
    for u, rows in by_user.items():
        rows.sort()
        sessions = []
        for ts, _ in rows:
            if sessions and (ts - sessions[-1][-1]).total_seconds() < gap:
                sessions[-1].append(ts)
            else:
                sessions.append([ts])
        r = out[u]
        assert r["n_sessions"] == len(sessions)
        assert r["max_session_events"] == max(len(s) for s in sessions)
        # the operator spans floor-to-second timestamps (unix_timestamp)
        assert r["max_session_seconds"] == max(
            int(
                (
                    s[-1].replace(microsecond=0) - s[0].replace(microsecond=0)
                ).total_seconds()
            )
            for s in sessions
        )


def test_oov_share_consistent(spark, sf_dir):
    """OOV counts are bounded by totals; the corpus-wide vocab covers the
    most frequent tokens (top token is never OOV anywhere)."""
    out = text.oov_rate_report(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0.0 <= r["oov_share"] <= 1.0
    docs = load_table(spark, sf_dir, "documents")
    total_tokens = (
        docs.select(F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("t"))
        .filter(F.length("t") >= 1)
        .count()
    )
    assert sum(r["n_tokens"] for r in out) == total_tokens


def test_blocking_recall_bounds(spark, sf_dir):
    """Blocking can only lose pairs (found ≤ true) and the share is the
    integer-rounded ratio."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import fuzzy

    r = fuzzy.fuzzy_blocking_recall(spark, sf_dir).collect()[0]
    assert 0 < r["n_names_sampled"]
    assert 0 <= r["n_found_by_blocking"] <= r["n_true_pairs"]
    assert 0.0 <= r["recall_share"] <= 1.0


def test_pareto_invariants(spark, sf_dir):
    """Concentration report: top set is non-empty, bounded by the customer
    count, achieves ≥ the target share, and revenue matches the orders
    table exactly."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap
    import math

    out = olap.region_revenue_pareto(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect()
    total_cents = sum(int(math.floor(r["o_totalprice"] * 100.0 + 0.5)) for r in orders)
    assert abs(sum(r["revenue_total"] for r in out) * 100 - total_cents) < 0.5 * len(out) + 1
    for r in out:
        assert 1 <= r["n_top80"] <= r["n_customers"]
        assert r["top80_share"] >= 0.80
        assert r["threshold_spend"] >= 0.0


def test_yoy_growth_consistent(spark, sf_dir):
    """Growth column equals the ratio of the two reported revenues; months
    without a prior year are NULL, not dropped."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import timeseries

    out = timeseries.orders_monthly_yoy(spark, sf_dir).collect()
    months = {r["month"] for r in out}
    for r in out:
        prev_m = r["month"].replace(year=r["month"].year - 1)
        if prev_m in months:
            assert r["revenue_prev_year"] is not None
            expect = r["revenue"] / r["revenue_prev_year"] - 1.0
            assert abs(r["yoy_growth"] - expect) < 1.01e-4
        else:
            assert r["revenue_prev_year"] is None and r["yoy_growth"] is None


def test_rfm_segments_partition_customers(spark, sf_dir):
    """Every customer lands in exactly one (r,f,m) cell; scores are 1–5;
    monetary total matches the orders table."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap
    import math

    out = olap.customer_rfm_segments(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in out) == n_cust
    total_cents = sum(
        int(math.floor(r["o_totalprice"] * 100.0 + 0.5))
        for r in orders.select("o_totalprice").collect()
    )
    assert abs(sum(r["monetary_total"] for r in out) - total_cents / 100.0) < 1e-6 * total_cents
    for r in out:
        assert 1 <= r["r_score"] <= 5 and 1 <= r["f_score"] <= 5 and 1 <= r["m_score"] <= 5


def test_degree_distribution_conserves_nodes_and_edges(spark, sf_dir):
    """Σ n_nodes = |V|, Σ sum_deg = 2|E| (handshake), bins are log2-exact."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import graph

    out = graph.copurchase_degree_distribution(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .distinct()
    )
    n_edges = edges.count()
    n_nodes = edges.select(F.col("p1").alias("p")).union(edges.select("p2")).distinct().count()
    assert sum(r["n_nodes"] for r in out) == n_nodes
    assert sum(r["sum_deg"] for r in out) == 2 * n_edges
    for r in out:
        assert (1 << r["deg_bin"]) <= r["min_deg"] <= r["max_deg"] < (1 << (r["deg_bin"] + 1))


def test_incremental_minhash_equals_rebuild(spark, sf_dir):
    """Index maintenance: computing signatures for only the new batch and
    unioning equals a from-scratch rebuild over the full corpus; replaying
    the same batch is a no-op (idempotent)."""
    docs = load_table(spark, sf_dir, "documents")
    old_docs = docs.filter(F.col("doc_id") % 3 != 0)
    new_docs = docs.filter(F.col("doc_id") % 3 == 0)

    def sigs_of(d):
        from data_pipeline_for_autonomous_vehicles_spark.functions.scalars import portable_hash

        sh = dedup._shingles_df(d)
        h = portable_hash("shingle")
        aggs = [
            F.min((F.lit(dedup._A[i]) * h + F.lit(dedup._B[i])) % F.lit(dedup._MERSENNE)).alias(f"sig_{i}")
            for i in range(dedup.MINHASH_K)
        ]
        return sh.groupBy("doc_id").agg(*aggs)

    existing = sigs_of(old_docs)
    updated = dedup.incremental_minhash_update(existing, new_docs)
    rebuilt = sigs_of(docs)
    assert sorted(map(tuple, updated.collect())) == sorted(map(tuple, rebuilt.collect()))
    replayed = dedup.incremental_minhash_update(updated, new_docs)
    assert replayed.count() == updated.count()


def test_bloom_audit_no_false_negatives_and_fpr_sane(spark, sf_dir):
    """Every member key must test positive (zero false negatives — the
    Bloom guarantee), and the observed FPR on absent keys is within a loose
    factor of the theoretical (1 − e^{−kn/m})^k."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import frequency
    import math

    r = frequency.bloom_filter_audit(spark, sf_dir).collect()[0]
    assert 0 < r["n_bits_set"] <= min(frequency.BLOOM_M, frequency.BLOOM_K * r["n_members"])
    assert 0 <= r["n_false_positives"] <= r["n_negatives"] == frequency.N_BLOOM_PROBES
    theo = (1 - math.exp(-frequency.BLOOM_K * r["n_members"] / frequency.BLOOM_M)) ** frequency.BLOOM_K
    assert r["observed_fpr"] <= max(5 * theo, 0.02)
    # no false negatives: probe the members themselves
    orders = load_table(spark, sf_dir, "orders")
    members = orders.select(F.col("o_custkey").cast("string").alias("key")).distinct()
    pos_array = F.array(
        *[frequency._bloom_pos(F.col("key"), j) for j in range(frequency.BLOOM_K)]
    )
    bits = members.select(F.explode(pos_array).alias("pos")).distinct()
    hits = (
        members.select("key", F.explode(pos_array).alias("pos"))
        .join(bits, "pos")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("h"))
        .filter(F.col("h") == frequency.BLOOM_K)
        .count()
    )
    assert hits == members.count()


def test_theta_overlap_exact_columns_and_estimate_bounds(spark, sf_dir):
    """Exact overlap columns match a brute-force set recount; theta
    estimates sit within a loose relative band of the exact values
    (lgK default gives ~3% at these cardinalities; we allow 10%)."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap
    from collections import defaultdict

    out = olap.theta_audience_overlap(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").collect()
    sets = defaultdict(set)
    for r in ev:
        sets[r["event_type"]].add(r["user_id"])
    types = sorted(sets)
    expected_pairs = {(a, b) for i, a in enumerate(types) for b in types[i + 1 :]}
    assert {(r["type_a"], r["type_b"]) for r in out} == expected_pairs
    for r in out:
        sa, sb = sets[r["type_a"]], sets[r["type_b"]]
        assert r["exact_a"] == len(sa) and r["exact_b"] == len(sb)
        assert r["exact_overlap"] == len(sa & sb)
        assert r["exact_only_a"] == len(sa - sb)
        if r["exact_overlap"] >= 50:
            assert abs(r["est_overlap"] - r["exact_overlap"]) <= 0.10 * r["exact_overlap"]
        if r["exact_only_a"] >= 50:
            assert abs(r["est_only_a"] - r["exact_only_a"]) <= 0.10 * r["exact_only_a"]


def test_props_key_profile_consistent(spark, sf_dir):
    """Key coverage and type votes agree with a literal JSON recount."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap
    import json, re
    from collections import Counter

    out = {r["key"]: r for r in olap.props_key_profile(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "events").select("props").collect()
    present, numeric = Counter(), Counter()
    num_re = re.compile(r"^-?[0-9]+(\.[0-9]+)?$")
    for r in rows:
        d = json.loads(r["props"])
        for k, v in d.items():
            present[k] += 1
            sv = json.dumps(v) if not isinstance(v, str) else v
            if num_re.match(sv):
                numeric[k] += 1
    assert set(out) == set(present)
    for k in present:
        assert out[k]["n_present"] == present[k]
        assert out[k]["n_numeric"] == numeric[k]
        assert out[k]["n_non_numeric"] == present[k] - numeric[k]
        assert 0.0 <= out[k]["coverage"] <= 1.0


def test_embedding_norm_audit_partitions_vectors(spark, sf_dir):
    """Zero/low/high/ok partition the vector count; flags match a numpy
    recount in the same fixed-point grid."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import similarity as sim
    import math

    r = sim.embedding_norm_audit(spark, sf_dir).collect()[0]
    assert r["n_vectors"] == r["n_zero"] + r["n_low_norm"] + r["n_high_norm"] + r["n_ok"]
    rows = load_table(spark, sf_dir, "embeddings").select("embedding").collect()
    zero = low = high = 0
    for row in rows:
        n2 = sum(
            int(math.floor(x * 1e6 + 0.5)) ** 2 for x in row["embedding"]
        )
        if n2 == 0:
            zero += 1
        elif n2 < sim._NORM2_LO:
            low += 1
        elif n2 > sim._NORM2_HI:
            high += 1
    assert (r["n_zero"], r["n_low_norm"], r["n_high_norm"]) == (zero, low, high)


def test_kmeans_purity_consistent_with_assignment(spark, sf_dir):
    """Purity equals a recount over the shared final assignment; members
    per cluster match kmeans_cluster_stats; purity ≥ 1/n_labels."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import similarity as sim
    from collections import Counter, defaultdict

    out = {r["cid"]: r for r in sim.kmeans_label_purity(spark, sf_dir).collect()}
    stats = {r["cid"]: r["n_members"] for r in sim.kmeans_cluster_stats(spark, sf_dir).collect()}
    assert {c: r["n_members"] for c, r in out.items()} == stats
    final = sim._km_final_assignment(spark, sf_dir).select("vec_id", "cid").collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    per = defaultdict(Counter)
    for r in final:
        per[r["cid"]][labels[r["vec_id"]]] += 1
    for cid, cnt in per.items():
        best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
        r = out[cid]
        assert (r["majority_label"], r["majority_n"]) == best
        assert r["n_labels"] == len(cnt)
        assert r["purity"] >= 1.0 / r["n_labels"] - 1e-9


def test_affinity_rules_consistent_with_cooccurrence(spark, sf_dir):
    """Every rule's n_ab equals the unordered pair count; confidence and
    support respect the declared thresholds; lift is symmetric across the
    two directions of a pair."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap

    rules = olap.basket_affinity_rules(spark, sf_dir).collect()
    co = {
        tuple(sorted((r["item_a"], r["item_b"]))): r["n_ab"]
        for r in olap.event_cooccurrence(spark, sf_dir).collect()
    }
    lifts = {}
    for r in rules:
        key = tuple(sorted((r["antecedent"], r["consequent"])))
        assert co[key] == r["n_ab"]
        assert r["support"] >= olap.RULE_MIN_SUPPORT_PCT / 100 - 1e-4
        assert r["confidence"] >= olap.RULE_MIN_CONF_PCT / 100 - 1e-4
        lifts.setdefault(key, set()).add(r["lift"])
    for key, ls in lifts.items():
        assert len(ls) == 1  # lift is direction-independent


def test_novelty_and_dim_stats_consistency(spark, sf_dir):
    """Novelty shares are in [0,1] and cover every doc; dim stats match a
    numpy recount in the fixed-point grid."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import similarity as sim
    import math

    nov = dedup.doc_ngram_novelty(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(nov) == n_docs
    for r in nov:
        assert 0 <= r["n_unique"] <= r["n_shingles"]
        if r["novelty"] is not None:
            assert 0.0 <= r["novelty"] <= 1.0

    out = {r["dim"]: r for r in sim.embedding_dim_stats(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "embeddings").select("embedding").collect()
    dims = len(rows[0]["embedding"])
    assert set(out) == set(range(dims))
    for d in range(0, dims, 16):  # spot-check every 16th dim
        vals = [int(math.floor(r["embedding"][d] * 1e6 + 0.5)) for r in rows]
        n, sx = len(vals), sum(vals)
        sxx = sum(v * v for v in vals)
        var = (n * sxx - sx * sx) / (n * n) / 1e12
        r = out[d]
        assert r["n"] == n
        assert abs(r["mean"] - sx / n / 1e6) < 1.01e-6
        assert abs(r["variance"] - var) < 1.01e-6
        assert r["is_dead"] == ((n * sxx - sx * sx) < n * n * sim._DEAD_VAR_E12)


def test_autocorrelation_matches_numpy(spark, sf_dir):
    """ACF values equal a numpy corrcoef recount over the same hourly
    integer cells."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import anomaly
    import math
    from collections import defaultdict

    out = {(r["event_type"], r["lag"]): r for r in anomaly.value_autocorrelation(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    cells = defaultdict(lambda: defaultdict(int))
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    for r in ev:
        h = int((r["ts"] - epoch).total_seconds()) // 3600
        cells[r["event_type"]][h] += int(math.floor(r["value"] * 100.0 + 0.5))
    for (t, k), r in out.items():
        series = cells[t]
        pairs = [(series[h], series[h + k]) for h in series if h + k in series]
        assert r["n_pairs"] == len(pairs)
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        exp = (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )
        assert abs(r["acf"] - exp) < 1.01e-6
        assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9


def test_detector_agreement_reconciles_with_pair_sets(spark, sf_dir):
    """Counts in the agreement report equal recounts of the two pair
    relations and their intersection."""
    r = dedup.near_dup_detector_agreement(spark, sf_dir).collect()[0]
    mh = {(p["doc_a"], p["doc_b"]) for p in dedup.minhash_lsh_pairs(spark, sf_dir).collect()}
    sh = {(p["doc_a"], p["doc_b"]) for p in dedup.simhash_hamming_pairs(spark, sf_dir).collect()}
    assert r["n_minhash"] == len(mh)
    assert r["n_simhash"] == len(sh)
    assert r["n_both"] == len(mh & sh)
    assert r["n_union"] == len(mh | sh)
    assert 0.0 <= r["edge_jaccard"] <= 1.0


def test_five_number_and_segment_matrix_invariants(spark, sf_dir):
    """Boxplot quartiles are ordered and match percentile_disc recounts;
    segment matrix shares sum to 1 per segment and revenue reconciles."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap, quality
    import math
    from collections import defaultdict

    out = {r["event_type"]: r for r in quality.value_five_number_summary(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    groups = defaultdict(list)
    for r in ev:
        groups[r["event_type"]].append(int(math.floor(r["value"] * 100.0 + 0.5)))
    for t, vals in groups.items():
        vals.sort()
        n = len(vals)
        r = out[t]
        assert r["min_value"] <= r["p25"] <= r["p50"] <= r["p75"] <= r["max_value"]
        for p, col in ((25, "p25"), (50, "p50"), (75, "p75")):
            assert r[col] == vals[(p * n + 99) // 100 - 1] / 100.0
        iqr = r["p75"] - r["p25"]
        n_out = sum(
            1
            for v in vals
            if 2 * (r["p25"] * 100 - v) > 3 * iqr * 100 or 2 * (v - r["p75"] * 100) > 3 * iqr * 100
        )
        assert r["n_tukey_outliers"] == n_out

    m = olap.segment_priority_matrix(spark, sf_dir).collect()
    by_seg = defaultdict(float)
    for r in m:
        by_seg[r["c_mktsegment"]] += r["segment_share"]
    for seg, s in by_seg.items():
        assert abs(s - 1.0) < 5e-4  # 4dp rounding per cell, ≤5 cells
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice").collect()
    total = sum(int(math.floor(r["o_totalprice"] * 100.0 + 0.5)) for r in orders) / 100.0
    assert abs(sum(r["revenue"] for r in m) - total) < 1e-6 * total


def test_acctbal_bands_partition_customers(spark, sf_dir):
    """Bands partition the customer dim; activity counts reconcile with the
    orders table."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap

    out = olap.acctbal_band_activity(spark, sf_dir).collect()
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    assert sum(r["n_customers"] for r in out) == customer.count()
    assert sum(r["n_orders"] for r in out) == orders.count()
    assert sum(r["n_active"] for r in out) == orders.select("o_custkey").distinct().count()
    for r in out:
        assert 1 <= r["balance_band"] <= 5
        assert 0 <= r["n_active"] <= r["n_customers"]


def test_semdedup_prune_matches_bruteforce(spark, sf_dir):
    """The parallel prune rule (x pruned iff a lower-id same-cluster member
    has cos >= tau) must match a literal Python recomputation from the
    shared k-means assignment, and the smallest id of every cluster must
    never be pruned."""
    import math

    from data_pipeline_for_autonomous_vehicles_spark.operators import similarity as sim

    report = {r["cid"]: r for r in sim.semdedup_prune_report(spark, sf_dir).collect()}
    members = sim._km_final_assignment(spark, sf_dir).select("vec_id", "cid", "sx").collect()
    by_cid = {}
    for r in members:
        by_cid.setdefault(r["cid"], []).append((r["vec_id"], r["sx"]))

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    for cid, rows in by_cid.items():
        rows.sort()
        ex = rows[: sim.SEMDEDUP_CAP]
        pruned = set()
        max_cos = 0.0
        for i, (vb, xb) in enumerate(ex):
            for va, xa in ex[:i]:
                c = math.floor(cos(xa, xb) * 10000 + 0.5) / 10000.0
                max_cos = max(max_cos, c)
                if c >= sim.SEMDEDUP_TAU:
                    pruned.add(vb)
        rr = report[cid]
        assert rr["n_members"] == len(rows)
        assert rr["n_examined"] == len(ex)
        assert rr["n_pruned"] == len(pruned)
        assert abs(rr["max_intra_cosine"] - max_cos) < 1.01e-4
        assert ex[0][0] not in pruned  # smallest id is always kept


def test_lsh_jaccard_tau_sweep_matches_pairs(spark, sf_dir):
    """The θ sweep must reproduce a literal recount from the committed
    `minhash_lsh_pairs` frame at every θ, be monotone non-increasing, and
    conserve corpus = pruned + kept on every row."""
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.operators import dedup as dd

    pairs = [
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in dd.minhash_lsh_pairs(spark, sf_dir).collect()
    ]
    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = {r["theta"]: r for r in dd.lsh_jaccard_tau_sweep(spark, sf_dir).collect()}
    assert sorted(rows) == sorted(dd.LSH_TAU_GRID)
    prev = None
    for theta in sorted(dd.LSH_TAU_GRID):
        r = rows[theta]
        assert r["n_pairs"] == sum(1 for _, _, j in pairs if j >= theta)
        assert r["n_pruned"] == len({b for _, b, j in pairs if j >= theta})
        assert r["n_pruned"] + r["n_kept_docs"] == n_docs
        if prev is not None:
            assert r["n_pairs"] <= prev["n_pairs"]
            assert r["n_pruned"] <= prev["n_pruned"]
        prev = r
    # banded collision guarantees >= LSH_ROWS matching components, so the
    # lowest grid point counts EVERY candidate pair
    assert rows[min(dd.LSH_TAU_GRID)]["n_pairs"] == len(pairs)


def test_semdedup_tau_sweep_matches_bruteforce_and_report(spark, sf_dir):
    """The grid sweep must reproduce a literal Python recount at EVERY tau
    (pairs and victims from one pairwise pass), be monotone non-increasing
    in tau, conserve examined = pruned + kept on every row, and agree with
    `semdedup_prune_report`'s corpus total at the report's own tau."""
    import math

    from data_pipeline_for_autonomous_vehicles_spark.operators import similarity as sim

    rows = {r["tau"]: r for r in sim.semdedup_tau_sweep(spark, sf_dir).collect()}
    assert sorted(rows) == sorted(sim.SEMDEDUP_TAU_GRID)

    members = sim._km_final_assignment(spark, sf_dir).select("vec_id", "cid", "sx").collect()
    by_cid: dict = {}
    for r in members:
        by_cid.setdefault(r["cid"], []).append((r["vec_id"], r["sx"]))

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    all_pairs = []  # (cos, vb) over every cluster's capped pairwise pass
    n_examined = 0
    for rows_c in by_cid.values():
        rows_c.sort()
        ex = rows_c[: sim.SEMDEDUP_CAP]
        n_examined += len(ex)
        for i, (vb, xb) in enumerate(ex):
            for _va, xa in ex[:i]:
                all_pairs.append((math.floor(cos(xa, xb) * 10000 + 0.5) / 10000.0, vb))
    prev = None
    for tau in sorted(sim.SEMDEDUP_TAU_GRID):
        r = rows[tau]
        want_pairs = sum(1 for c, _ in all_pairs if c >= tau)
        want_pruned = len({vb for c, vb in all_pairs if c >= tau})
        assert r["n_pairs"] == want_pairs
        assert r["n_pruned"] == want_pruned
        assert r["n_pruned"] + r["n_kept_examined"] == n_examined
        if prev is not None:  # tighter tau never prunes more
            assert r["n_pairs"] <= prev["n_pairs"]
            assert r["n_pruned"] <= prev["n_pruned"]
        prev = r
    report_total = sum(
        r["n_pruned"] for r in sim.semdedup_prune_report(spark, sf_dir).collect()
    )
    assert rows[sim.SEMDEDUP_TAU]["n_pruned"] == report_total


def test_decontamination_policy_sweep_matches_report(spark, sf_dir):
    """The policy curve must reproduce a literal recount from the
    committed per-doc contamination report at every θ (docs and token
    mass), be monotone non-increasing in θ, and anchor θ=0.0 to the
    any-hit policy (exactly the report's row count)."""
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.operators import dedup as dd
    from pyspark.sql import functions as F2

    report = {
        r["doc_id"]: r["contamination_rate"]
        for r in dd.decontamination_report(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    tok_rows = docs.filter(F2.col("doc_id") % dd.EVAL_MOD != 0).select(
        "doc_id",
        F2.when(F2.trim(F2.col("text")) == "", F2.lit(0))
        .otherwise(F2.size(F2.split(F2.lower(F2.trim(F2.col("text"))), r"\s+")))
        .alias("n_tokens"),
    ).collect()
    toks = {r["doc_id"]: r["n_tokens"] for r in tok_rows}
    out = {
        r["theta"]: r
        for r in dd.decontamination_policy_sweep(spark, sf_dir).collect()
    }
    assert sorted(out) == sorted(dd.DECON_RATE_GRID)
    prev = None
    for theta in sorted(dd.DECON_RATE_GRID):
        r = out[theta]
        dropped = [d for d, rate in report.items() if rate >= theta]
        assert r["n_dropped_docs"] == len(dropped)
        assert r["dropped_tokens"] == sum(toks[d] for d in dropped)
        if prev is not None:
            assert r["n_dropped_docs"] <= prev["n_dropped_docs"]
            assert r["dropped_tokens"] <= prev["dropped_tokens"]
        prev = r
    assert out[0.0]["n_dropped_docs"] == len(report)  # any-hit anchor


def test_incremental_semdedup_probe_matches_bruteforce(spark, sf_dir):
    """The O(delta) probe must equal a literal Python recomputation of
    frozen-centroid assignment (int64 argmin, ties to lowest cid), the
    per-cell smallest-id cap, and the capped pairwise cosine — for every
    delta vector: cell, examined members, dup count at tau, max cosine,
    first dup, and the novelty verdict."""
    import math

    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.operators import similarity as sim
    from pyspark.sql import functions as F2

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", sim._scaled_vec(F2.col("embedding")).alias("sx"))
    corpus_rows = {
        r["vec_id"]: r["sx"] for r in vecs.filter(~sim._sem_delta_cond()).collect()
    }
    delta_rows = {
        r["vec_id"]: r["sx"] for r in vecs.filter(sim._sem_delta_cond()).collect()
    }
    # frozen centroids via the module's own Lloyd helpers (pinned elsewhere
    # by the kmeans brute-force tests); the PROBE logic below is literal
    cents_df = vecs.filter(~sim._sem_delta_cond()).filter(
        F2.col("vec_id").isin(sim._sem_seed_ids())
    ).select(F2.col("vec_id").cast("int").alias("cid"), F2.col("sx").alias("c"))
    corpus_df = vecs.filter(~sim._sem_delta_cond())
    for _ in range(2):
        cents_df = sim._km_update(sim._km_assign(corpus_df, cents_df))
    cents = {r["cid"]: r["c"] for r in cents_df.collect()}

    def assign(x):
        return min(
            (sum((a - b) ** 2 for a, b in zip(x, c)), cid) for cid, c in cents.items()
        )[1]

    cells: dict = {}
    for vid in sorted(corpus_rows):
        cells.setdefault(assign(corpus_rows[vid]), []).append(vid)
    capped = {cid: vids[: sim.SEMDEDUP_CAP] for cid, vids in cells.items()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return math.floor(
            d
            / (
                math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
            )
            * 10000
            + 0.5
        ) / 10000.0

    out = {
        r["vec_id"]: r
        for r in sim.incremental_semdedup_probe(spark, sf_dir).collect()
    }
    assert set(out) == set(delta_rows)
    for vid, x in delta_rows.items():
        cell = assign(x)
        members = capped.get(cell, [])
        cs = [(cos(x, corpus_rows[m]), m) for m in members]
        dups = [(c, m) for c, m in cs if c >= sim.SEMDEDUP_TAU]
        r = out[vid]
        assert r["cell"] == cell
        assert r["n_cell_corpus"] == len(members)
        assert r["n_corpus_dups"] == len(dups)
        assert r["max_corpus_cosine"] == (max(c for c, _ in cs) if cs else 0.0)
        assert r["first_dup_vec"] == (min(m for _, m in dups) if dups else None)
        assert r["is_novel"] == (0 if dups else 1)


def test_embedding_coverage_audit_reconciles(spark, sf_dir):
    """Coverage rows reconcile exactly with the two tables: per-source doc
    counts partition the corpus, with+missing = docs on every row, orphan
    embeddings only ever appear on the (no_document) row, and the grand
    totals match distinct id-set intersections."""
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.operators import similarity as sim

    out = sim.embedding_coverage_audit(spark, sf_dir).collect()
    doc_ids = {
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    vec_ids = {
        r["vec_id"]
        for r in load_table(spark, sf_dir, "embeddings").select("vec_id").collect()
    }
    both = doc_ids & vec_ids
    assert sum(r["n_docs"] for r in out) == len(doc_ids)
    assert sum(r["n_with_embedding"] for r in out) == len(both)
    assert sum(r["n_missing_embedding"] for r in out) == len(doc_ids) - len(both)
    assert sum(r["n_orphan_embeddings"] for r in out) == len(vec_ids) - len(both)
    for r in out:
        assert r["n_with_embedding"] + r["n_missing_embedding"] == r["n_docs"]
        if r["source"] == "(no_document)":
            assert r["n_docs"] == 0 and r["coverage_pct"] is None
        else:
            assert r["n_orphan_embeddings"] == 0
            assert 0.0 <= r["coverage_pct"] <= 100.0


def test_quality_calibration_bins_are_consistent(spark, sf_dir):
    """Calibration bins partition the scoreable corpus; the classifier's
    keep decision is pinned to the 0.5 boundary (rate 0 strictly below the
    boundary bin, 1 strictly above — only the boundary bin may mix, where
    4dp rounding folds tiny +/- margins together); each bin's mean clf
    score lies inside the bin's own interval."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import text as t

    out = t.quality_calibration_report(spark, sf_dir).collect()
    clf = t.quality_classifier_scores(spark, sf_dir).collect()
    scoreable = [r for r in clf if r["clf_score"] is not None]
    assert sum(r["n_docs"] for r in out) == len(scoreable)
    boundary = t.CAL_BINS // 2  # clf 0.5 — the keep_flag decision edge
    for r in out:
        assert 0 <= r["bin"] < t.CAL_BINS
        assert abs(r["bin_lo"] - r["bin"] / t.CAL_BINS) < 1e-12
        if r["bin"] < boundary:
            assert r["keep_rate"] == 0.0
        elif r["bin"] > boundary:
            assert r["keep_rate"] == 1.0
        lo, hi = r["bin"] / t.CAL_BINS, (r["bin"] + 1) / t.CAL_BINS
        assert lo - 1.01e-4 <= r["mean_clf_score"] <= hi + 1.01e-4
        assert 0.0 <= r["mean_quality_score"] <= 1.0


def test_embedding_near_dups_equals_vec_level_bruteforce(spark, sf_dir):
    """The distinct-vector-level rewrite must emit exactly the pairs the
    direct vec-level formulation produces: same LSH bucket collisions,
    same rounded cosines, for both the unbounded and top-k forms."""
    from pyspark.sql import Window

    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.functions.scalars import round_half_up
    from data_pipeline_for_autonomous_vehicles_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    sig = emb.withColumn("bucket", sim._signature(F.col("emb")))
    a = sig.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a"), "bucket")
    b = sig.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("emb_b"), "bucket")
    ref = (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            round_half_up(sim._cosine(F.col("emb_a"), F.col("emb_b")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= sim.NEAR_DUP_COSINE)
    )
    ref_pairs = {(r["vec_a"], r["vec_b"], r["cosine"]) for r in ref.collect()}
    got_pairs = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in sim.embedding_near_dups(spark, sf_dir, topk=None).collect()
    }
    assert got_pairs == ref_pairs

    # top-k form: the k best mirrored neighbors of the reference pair set
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor"))
    ref_topk = (
        ref.select(F.col("vec_a").alias("vec_id"), F.col("vec_b").alias("neighbor"), "cosine")
        .unionByName(
            ref.select(F.col("vec_b").alias("vec_id"), F.col("vec_a").alias("neighbor"), "cosine")
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= sim.NEAR_DUP_TOPK)
    )
    expect = {(r["vec_id"], r["rank"]): (r["neighbor"], r["cosine"]) for r in ref_topk.collect()}
    got = {
        (r["vec_id"], r["rank"]): (r["neighbor"], r["cosine"])
        for r in sim.embedding_near_dups(spark, sf_dir).collect()
    }
    assert got == expect


def test_incremental_ivf_update_equals_rebuild_and_is_idempotent(spark, sf_dir):
    """Appending a batch through incremental_ivf_update over frozen
    centroids must equal assigning the full corpus in one pass, and
    replaying the same batch must change nothing (exactly-once index
    under at-least-once ingest)."""
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", sim._scaled_vec(F.col("embedding")).alias("sx"))
    cents = vecs.filter(F.col("vec_id") < sim.KMEANS_K).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("sx").alias("c")
    )
    for _ in range(2):
        cents = sim._km_update(sim._km_assign(vecs, cents))

    old = vecs.filter(F.col("vec_id") % 3 != 0)
    batch = vecs.filter(F.col("vec_id") % 3 == 0)
    existing = sim._km_assign(old, cents)
    incr = sim.incremental_ivf_update(existing, batch, cents)
    full = sim._km_assign(vecs, cents)

    def _snap(df):
        return {r["vec_id"]: (r["cid"], r["sqdist"]) for r in df.collect()}

    assert _snap(incr) == _snap(full)
    # replay: same batch again (plus an overlap with old) is a no-op
    replay = sim.incremental_ivf_update(incr, batch.unionByName(old.limit(5)), cents)
    assert _snap(replay) == _snap(full)


def test_contrastive_mining_consistency(spark, sf_dir):
    """hard_negative_topk and triplet_margin_report agree: the rank-1 hard
    negative IS the triplet's hardest negative, labels respect the
    cross-class/same-class contracts, and margin = pos − neg at e4."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import similarity as sim

    negs = sim.hard_negative_topk(spark, sf_dir).collect()
    trip = sim.triplet_margin_report(spark, sf_dir).collect()

    by_q: dict[int, list] = {}
    for r in negs:
        assert r["neg_label"] != r["query_label"]
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        cosines = [r["cosine"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        assert len(rows) <= sim.TOP_K

    n_anchors = (
        load_table(spark, sf_dir, "embeddings")
        .filter(
            (F.col("vec_id") % sim.ANCHOR_MOD == 0)
            & (F.col("vec_id") < sim.ANCHOR_CAP)
        )
        .count()
    )
    assert len(trip) == n_anchors
    for t in trip:
        rank1 = next(r for r in by_q[t["query_id"]] if r["rank"] == 1)
        assert t["neg_vec_id"] == rank1["vec_id"]
        assert t["neg_cosine"] == rank1["cosine"]
        assert abs(t["margin"] - (t["pos_cosine"] - t["neg_cosine"])) < 1e-9
        # anchors never pick themselves
        assert t["pos_vec_id"] != t["query_id"]


def test_uncertainty_sampling_margins_are_true_top2_gaps(spark, sf_dir):
    """The selected vectors carry the smallest best-vs-second centroid
    gaps, the two centroids differ, and margins are non-negative and
    sorted ascending."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import similarity as sim

    out = sim.uncertainty_sampling_topk(spark, sf_dir).collect()
    assert len(out) == sim.UNCERTAIN_K
    margins = [r["margin"] for r in out]
    assert margins == sorted(margins)
    for r in out:
        assert r["margin"] >= 0.0
        assert r["best_cid"] != r["second_cid"]
    # cross-check one selected vector against the shared final assignment:
    # its best centroid must equal the k-means assignment's winner
    final = {
        r["vec_id"]: r["cid"]
        for r in sim._km_final_assignment(spark, sf_dir).collect()
    }
    for r in out:
        assert final[r["vec_id"]] == r["best_cid"]


def test_mmr_diversifies_against_greedy_relevance(spark, sf_dir):
    """Rank 1 is the pure-relevance argmax (ties to lowest vec_id),
    relevance within a query never increases down the MMR ranking ONLY
    when penalties are zero — in general later picks trade relevance for
    diversity, so instead verify the greedy invariant directly: each
    pick's (relevance − max_sim_selected) beats every unpicked
    candidate's at its step is expensive to recheck, so assert the
    cheaper necessary conditions: K picks per query, no repeats, rank-1
    matches brute-force top-1, and every max_sim_selected is ≤ the max
    pairwise similarity possible (1.0)."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import similarity as sim

    out = sim.mmr_diversified_topk(spark, sf_dir).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    bf = sim.ann_bruteforce_topk(spark, sf_dir).collect()
    top1 = {r["query_id"]: r["vec_id"] for r in bf if r["rank"] == 1}
    assert len(by_q) == sim.N_QUERIES
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, sim.MMR_K + 1))
        picked = [r["vec_id"] for r in rows]
        assert len(set(picked)) == sim.MMR_K  # no repeats
        assert picked[0] == top1[q]  # rank 1 = pure relevance winner
        assert rows[0]["max_sim_selected"] == 0.0
        for r in rows[1:]:
            assert -1.0 <= r["max_sim_selected"] <= 1.0
            assert -1.0 <= r["relevance"] <= 1.0


def test_pca_anisotropy_audit_against_numpy_spectrum(spark, sf_dir):
    """Independent linear-algebra check: the Rayleigh estimate must sit
    inside numpy's [λ_min, λ_max] of the same uncentered Gram (guaranteed
    for ANY nonzero iterate), the exact mean eigenvalue must equal
    numpy's trace/d, and the anisotropy ratio must read ≈ 1 on the
    driver's isotropic synthetic vectors (the healthy-space verdict).
    The vector itself is the current iterate, max-normalized."""
    import numpy as np

    from data_pipeline_for_autonomous_vehicles_spark.operators import similarity as sim

    rows = sim.embedding_pca_top_component(spark, sf_dir).collect()
    assert len(rows) == sim.DIM
    v = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    assert np.max(np.abs(v)) == 1.0  # max-normalized iterate
    lam = rows[0]["eigenvalue"]
    assert len({r["eigenvalue"] for r in rows}) == 1

    X = np.array(
        [
            r["embedding"]
            for r in load_table(spark, sf_dir, "embeddings").collect()
        ],
        dtype=np.float64,
    )
    G = X.T @ X
    evals = np.linalg.eigvalsh(G)
    assert float(evals[0]) - 0.01 <= lam <= float(evals[-1]) + 0.01
    mean_eig = rows[0]["mean_eigenvalue"]
    assert abs(mean_eig - float(np.trace(G)) / sim.DIM) < 0.01
    ratio = rows[0]["anisotropy_ratio"]
    assert abs(ratio - lam / mean_eig) < 1e-3
    # isotropic synthetic cloud → no dominant direction: the ratio stays
    # near the Marchenko–Pastur bulk edge (1+sqrt(d/n))² ≈ 1.8, nowhere
    # near the ≫ 2 a collapsed space would read
    assert 0.9 <= ratio <= 2.0


def test_quality_classifier_decision_consistency(spark, sf_dir):
    """clf_score is the normalized integer margin: keep_flag must agree
    with the sign of weight_sum, scores stay in [0,1], and every document
    is scored exactly once."""
    out = text.quality_classifier_scores(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(out) == n_docs
    for r in out:
        assert r["keep_flag"] == int(
            r["weight_sum"] >= 0 and r["n_scored_tokens"] > 0
        )
        if r["clf_score"] is not None:
            assert 0.0 <= r["clf_score"] <= 1.0
            assert abs(r["weight_sum"]) <= r["n_scored_tokens"] * 500


def test_minhash_delta_probe_slices_and_novelty(spark, sf_dir):
    """The probe reports exactly the delta slice; matches always point into
    the corpus slice (never delta-vs-delta); is_novel <=> zero matches."""
    out = dedup.minhash_delta_probe(spark, sf_dir).collect()
    d = dedup.DELTA_MOD
    delta_ids = {
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % d == d - 1)
        .collect()
    }
    assert {r["doc_id"] for r in out} == delta_ids
    for r in out:
        assert (r["is_novel"] == 1) == (r["n_corpus_matches"] == 0)
        if r["first_match_doc"] is not None:
            assert r["first_match_doc"] % d != d - 1


def test_near_dup_canonicals_pick_best_member(spark, sf_dir):
    """One keeper per cluster; the keeper is a member of its cluster with
    the cluster-max quality score; sizes partition the corpus."""
    keep = {r["cluster_id"]: r for r in dedup.near_dup_canonicals(spark, sf_dir).collect()}
    labels = dedup.near_dup_clusters(spark, sf_dir).collect()
    quality = {
        r["doc_id"]: r["quality_score"]
        for r in text.quality_scores(spark, sf_dir).collect()
    }
    members: dict[int, list[int]] = {}
    for r in labels:
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    assert set(keep) == set(members)
    assert sum(r["n_docs"] for r in keep.values()) == len(labels)
    for cid, r in keep.items():
        assert r["keeper_doc_id"] in members[cid]
        assert r["n_removed"] == r["n_docs"] - 1 == len(members[cid]) - 1
        best_q = max(quality[m] for m in members[cid])
        assert r["keeper_quality"] == best_q
        # deterministic tiebreak: min doc_id among the max-quality members
        assert r["keeper_doc_id"] == min(
            m for m in members[cid] if quality[m] == best_q
        )


def test_bigram_fluency_bounds_and_rarest(spark, sf_dir):
    """fluency is a mean of per-bigram corpus counts: it must lie within
    [rarest_count, corpus-max bigram count], and a doc duplicated in the
    corpus can never have rarest_count below its copy count."""
    out = text.bigram_fluency_scores(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(out) == n_docs
    for r in out:
        if r["n_bigrams"] == 0:
            assert r["rarest_count"] is None and r["fluency_score"] is None
        else:
            assert 1 <= r["rarest_count"]
            assert r["fluency_score"] >= r["rarest_count"] - 0.5e-4


def test_nprobe_curve_monotone_with_full_probe_anchor(spark, sf_dir):
    """Recall and scanned candidates must be non-decreasing in the probe
    budget, and probing every list must recover brute-force exactly
    (micro_recall == 1.0) — the curve's built-in self-check."""
    rows = similarity.ann_nprobe_recall_curve(spark, sf_dir).collect()
    assert [r["nprobe"] for r in rows] == sorted(similarity.NPROBE_SWEEP)
    for a, b in zip(rows, rows[1:]):
        assert b["micro_recall"] >= a["micro_recall"]
        assert b["avg_candidates"] >= a["avg_candidates"]
    assert rows[-1]["micro_recall"] == 1.0


def test_retrieval_ndcg_matches_bruteforce(spark, sf_dir):
    """NDCG@10 / MRR report equals a literal Python evaluation: shared-token
    + same-source relevance grades, fixed-point DCG, ideal-head IDCG."""
    import math

    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.operators import ranking, similarity

    rows = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    qsource = next(r["source"] for r in rows if r["doc_id"] == similarity.QUERY_VEC)
    rel = {}
    for r in rows:
        toks = set(r["text"].strip().lower().split())
        rel[r["doc_id"]] = sum(t in toks for t in ranking.QUERY_TERMS) + (
            r["source"] == qsource
        )

    def gain_e8(rl: int, rank: int) -> int:
        disc = 1.0 / math.log2(rank + 1)
        return math.floor((float((1 << rl) - 1) * disc) * 1e8 + 0.5)

    ideal = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[: ranking.NDCG_K]
    idcg = sum(gain_e8(rl, i + 1) for i, (_, rl) in enumerate(ideal))

    def metrics(ranked_ids: list[int]) -> tuple[float, float, int]:
        dcg = sum(gain_e8(rel[d], i + 1) for i, d in enumerate(ranked_ids))
        hits = [i + 1 for i, d in enumerate(ranked_ids) if rel[d] >= 1]
        ndcg = math.floor(dcg / idcg * 1e6 + 0.5) / 1e6 if idcg else 0.0
        mrr = math.floor(1.0 / hits[0] * 1e6 + 0.5) / 1e6 if hits else 0.0
        return (ndcg, mrr, len(hits))

    bm_ids = [r["doc_id"] for r in ranking.bm25_topk(spark, sf_dir).collect()]
    hy = sorted(
        similarity.hybrid_search_rrf(spark, sf_dir).collect(),
        key=lambda r: (-r["rrf_score"], r["doc_id"]),
    )
    ivf_ids = [
        r["vec_id"]
        for r in sorted(
            similarity.ann_ivf_topk(spark, sf_dir)
            .filter(f"query_id = {similarity.QUERY_VEC}")
            .collect(),
            key=lambda r: r["rank"],
        )
    ]
    pq_ids = [
        r["vec_id"]
        for r in sorted(
            similarity.ann_ivfpq_topk(spark, sf_dir).collect(),
            key=lambda r: (r["approx_sqdist"], r["vec_id"]),
        )
    ]
    expect = {
        "bm25": metrics(bm_ids),
        "hybrid_rrf": metrics([r["doc_id"] for r in hy]),
        "ann_ivf": metrics(ivf_ids),
        "ann_ivfpq": metrics(pq_ids),
    }
    got = {
        r["system"]: (r["ndcg_at_10"], r["mrr_at_10"], r["n_relevant_topk"])
        for r in ranking.retrieval_ndcg_report(spark, sf_dir).collect()
    }
    assert got == expect
    # the gate discriminates: the lexical and fused systems score
    # differently on NDCG, and every arm of the ladder is graded
    assert got["bm25"][0] != got["hybrid_rrf"][0]
    assert set(got) == {"bm25", "hybrid_rrf", "ann_ivf", "ann_ivfpq"}


def test_retrieval_ndcg_degrades_without_anchor_doc(spark, sf_dir, tmp_path):
    """Round-6 ADVICE: if the QUERY_VEC anchor document is absent, the
    relevance labels must degrade to lexical-only (source component 0,
    matching the SQL twin's NULL scalar subquery) — NOT silently empty the
    relevance frame and zero both systems' scores."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import ranking, similarity

    d = str(tmp_path / "noanchor")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.filter(docs.doc_id != similarity.QUERY_VEC).coalesce(1).write.parquet(
        d + "/documents.parquet"
    )
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").coalesce(1).write.parquet(
        d + "/embeddings.parquet"
    )
    got = {r["system"]: r for r in ranking.retrieval_ndcg_report(spark, d).collect()}
    assert set(got) == {"bm25", "hybrid_rrf", "ann_ivf", "ann_ivfpq"}
    # lexical labels still grade the systems: bm25 retrieves docs that
    # contain QUERY_TERMS, so its top-k cannot be relevance-free
    assert got["bm25"]["n_relevant_topk"] > 0
    assert got["bm25"]["ndcg_at_10"] > 0.0
