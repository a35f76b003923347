"""Physical-plan regression tests, via the pkg/plans audit API.

Correctness is the oracle harness's job; these pin the PLAN SHAPE — the
properties that decide whether a query survives a 100×–10⁶× scale-up
(SCALE.md). If an edit silently drops a pushed filter, de-broadcasts a
dimension, or turns top-k into a global sort, these fail even though
results stay correct.
"""

from __future__ import annotations

from data_pipeline_for_autonomous_vehicles_spark import plans
from data_pipeline_for_autonomous_vehicles_spark.operators import (
    metrics,
    spatial,
    tpch,
    tpch_ext,
    windows,
)


def test_q1_filter_pushdown_and_column_pruning(spark, sf_dir):
    df = tpch.q1_pricing_summary(spark, sf_dir)
    pushed = plans.pushed_filters(df)
    assert any("LessThanOrEqual(l_shipdate" in p for p in pushed)
    # 7 of 11 lineitem columns read — l_orderkey/partkey/suppkey/linenumber pruned
    (schema,) = plans.scan_read_schemas(df)
    assert "l_orderkey" not in schema and "l_partkey" not in schema
    # partial + final hash aggregation
    assert plans.plan_text(df).count("HashAggregate") >= 2


def test_q3_broadcasts_dimensions_and_takeordered(spark, sf_dir):
    df = tpch.q3_shipping_priority(spark, sf_dir)
    joins = plans.join_strategies(df)
    assert joins.count("BroadcastHashJoin") >= 2
    assert not plans.uses_cartesian_product(df)
    assert "TakeOrderedAndProject" in plans.plan_text(df)
    # the BUILDING filter reaches the customer scan
    assert any("EqualTo(c_mktsegment,BUILDING)" in p for p in plans.pushed_filters(df))


def test_q5_no_shuffle_for_dimension_joins(spark, sf_dir):
    df = tpch.q5_local_supplier_volume(spark, sf_dir)
    joins = plans.join_strategies(df)
    # all four dimension joins broadcast; at most one shuffle join for facts
    assert joins.count("BroadcastHashJoin") >= 4
    assert joins.count("SortMergeJoin") + joins.count("ShuffledHashJoin") <= 1


def test_latest_telemetry_window_group_limit(spark, sf_dir):
    # rank<=1 must push into the window sort (bounded buffers per group)
    assert "WindowGroupLimit" in plans.plan_text(metrics.latest_telemetry(spark, sf_dir))


def test_top_orders_window_group_limit(spark, sf_dir):
    assert "WindowGroupLimit" in plans.plan_text(
        windows.top_orders_per_priority(spark, sf_dir)
    )


def test_ranking_queries_have_no_global_windows(spark, sf_dir):
    # VERDICT r1 "What's wrong" #3: rank/ntile/percent_rank formerly ran a
    # Window.orderBy() with no partitioning — one task sorts everything at
    # 100×. The two-pass _tie_aware_running rewrite must keep every window
    # partitioned (range-partition locals + bounded tie groups only).
    for fn in (
        windows.supplier_revenue_ranks,
        windows.customer_balance_quartiles,
        windows.order_price_position,
    ):
        assert plans.unpartitioned_windows(fn(spark, sf_dir)) == [], fn.__name__


def test_unpartitioned_window_detector_positive_control(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    bad = spark.range(10).select(
        F.row_number().over(Window.orderBy("id")).alias("rn")
    )
    assert len(plans.unpartitioned_windows(bad)) == 1


def test_spatial_join_is_equi_not_cartesian(spark, sf_dir):
    df = spatial.nearby_vehicle_pairs(spark, sf_dir)
    # cell-bucketing must make this a hash join keyed on the cell —
    # never a cartesian/nested-loop over all pairs
    assert not plans.uses_cartesian_product(df)
    assert any("HashJoin" in j for j in plans.join_strategies(df))


def test_q21_two_exchanges_not_four(spark, sf_dir):
    df = tpch_ext.q21_blocking_suppliers(spark, sf_dir)
    # one exchange for groupBy(l_orderkey, l_suppkey), one narrowing to the
    # window's partitionBy(l_orderkey) — the single window pass must NOT
    # reintroduce the three self-join shuffles it replaced
    n_orderkey = sum(
        1
        for line in plans.plan_text(df).splitlines()
        if line.strip().startswith("Arguments: hashpartitioning(l_orderkey")
    )
    assert n_orderkey == 2


def test_q6_all_predicates_pushed(spark, sf_dir):
    pushed = plans.pushed_filters(tpch.q6_forecast_revenue(spark, sf_dir))
    joined = " ".join(pushed)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in joined, pushed


def test_exchange_count_bounded_on_flagships(spark, sf_dir):
    # shuffle inventory of SCALE.md §4, as assertions
    assert plans.exchange_count(tpch.q1_pricing_summary(spark, sf_dir)) <= 2
    assert plans.exchange_count(tpch.q6_forecast_revenue(spark, sf_dir)) <= 1
    assert plans.exchange_count(metrics.latest_telemetry(spark, sf_dir)) <= 2


def test_ohlc_is_pure_hash_aggregate(spark, sf_dir):
    # struct min/max would compile to SortAggregate (full fact-table sort);
    # the decimal-packed min_by/max_by keeps it hash-only: one exchange for
    # the group keys plus the presentation sort, nothing else
    from data_pipeline_for_autonomous_vehicles_spark.operators import timeseries

    df = timeseries.hourly_ohlc(spark, sf_dir)
    txt = plans.plan_text(df)
    assert "SortAggregate" not in txt
    assert txt.count("HashAggregate") >= 2  # partial + final
    assert "Window" not in txt
    assert plans.exchange_count(df) <= 2  # group-by + presentation orderBy


def test_gapfill_single_window_pass(spark, sf_dir):
    # the lead()-based gapfill must not reintroduce the spine join: no join
    # at all, one window pass, bounded exchanges (agg + window + final sort)
    from data_pipeline_for_autonomous_vehicles_spark.operators import timeseries

    for fn in (timeseries.hourly_gapfill_locf, timeseries.hourly_gapfill_interpolate):
        df = fn(spark, sf_dir)
        txt = plans.plan_text(df)
        assert "Join" not in txt, fn.__name__
        assert plans.exchange_count(df) <= 3, fn.__name__


def test_cohort_retention_dedups_before_window(spark, sf_dir):
    # the (user, week) distinct must run BEFORE the min-over-user window so
    # the window sorts |users × weeks| rows, not the raw fact table; the
    # distinct's hashpartitioning(user, week) can't serve the window, so:
    # distinct + window + final agg + presentation sort = ≤4 exchanges,
    # aggregates all hash (no distinct aggregate in the final pass)
    from data_pipeline_for_autonomous_vehicles_spark.operators import timeseries

    df = timeseries.cohort_retention(spark, sf_dir)
    txt = plans.plan_text(df)
    assert "SortAggregate" not in txt
    # formatted plan prints top-down: a HashAggregate BELOW the window node
    # is the (user, week) distinct feeding it
    assert txt.rindex("HashAggregate") > txt.index("Window")
    assert plans.exchange_count(df) <= 4
    assert not plans.uses_cartesian_product(df)


def test_scd2_windows_share_one_shuffle(spark, sf_dir):
    # lag-filter-lead both partition by user_id: the second window must
    # reuse the first's hashpartitioning, so: 1 window shuffle + 1 group-by
    # shuffle + 1 presentation sort
    from data_pipeline_for_autonomous_vehicles_spark.operators import history

    df = history.scd2_state_durations(spark, sf_dir)
    assert plans.exchange_count(df) <= 3
    assert not plans.uses_cartesian_product(df)


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    # DPP's shuffle-join sibling: a selective dim filter injects a bloom
    # filter subquery on the fact side's join key, discarding non-matching
    # fact rows BEFORE the shuffle. The size thresholds exist so tiny scans
    # skip the overhead — at 100 TB they are met naturally; the test lowers
    # them to pin the mechanism on sf-test data.
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark import plans as P
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        assert "might_contain" in plans.plan_text(j)
        assert j.collect()[0]["o_orderpriority"] == "1-URGENT"
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_bm25_broadcasts_and_takeordered(spark, sf_dir):
    # df + corpus scalars broadcast; top-k is TakeOrderedAndProject; the
    # display rank over the K survivors is rank_of_topk's broadcast
    # self-join, so there is NO WindowExec anywhere in the plan
    from data_pipeline_for_autonomous_vehicles_spark.operators import ranking

    df = ranking.bm25_topk(spark, sf_dir)
    txt = plans.plan_text(df)
    assert "TakeOrderedAndProject" in txt
    assert not plans.uses_cartesian_product(df)
    assert "Window" not in txt


def test_topk_display_ranks_are_windowless(spark, sf_dir):
    # round-1 bench tail carried "No Partition Defined for Window" warnings
    # from the post-limit display-rank windows in bm25/pagerank; both now
    # derive rank via broadcast self-join over the K survivors — assert the
    # operator is fully absent so the warning cannot come back
    from data_pipeline_for_autonomous_vehicles_spark.operators import graph

    df = graph.pagerank_top_nodes(spark, sf_dir)
    assert "Window" not in plans.plan_text(df)
    assert plans.unpartitioned_windows(df) == []


def test_journey_patterns_one_fact_shuffle(spark, sf_dir):
    # journey build = single user-keyed shuffle (partial collect_list),
    # regex flags are post-agg projections; plus the presentation sort
    from data_pipeline_for_autonomous_vehicles_spark.operators import sequences

    df = sequences.user_journey_patterns(spark, sf_dir)
    txt = plans.plan_text(df)
    assert "Join" not in txt
    assert plans.exchange_count(df) <= 2


def test_hot_keys_scans_fact_once(spark, sf_dir):
    # N/D scalars derive from the per-key counts via a reused exchange —
    # the 100 TB fact table must be scanned and shuffled exactly once.
    # Exchange reuse is applied by AQE at runtime (the static plan prints
    # both subtrees), so execute first and audit the final adaptive plan.
    from data_pipeline_for_autonomous_vehicles_spark.operators import frequency

    df = frequency.hot_keys_report(spark, sf_dir)
    assert "TakeOrderedAndProject" in plans.plan_text(df)
    assert not plans.uses_cartesian_product(df)
    df.collect()
    final = plans.plan_text(df)
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final


def test_dq_checks_bounded_scans(spark, sf_dir):
    # the five checks must NOT union five aggregate scans: one pass over
    # orders (melted), one lineitem pass that carries both the quantity and
    # the referential check through a single join, plus the pruned key side
    from data_pipeline_for_autonomous_vehicles_spark.operators import quality

    df = quality.dq_checks(spark, sf_dir)
    # one ReadSchema per scan node: orders agg + lineitem + orders key side
    assert len(plans.scan_read_schemas(df)) <= 3
    assert "SortAggregate" not in plans.plan_text(df)


def test_psi_and_cusum_exchange_bounds(spark, sf_dir):
    # drift: fact scan → 9-bin agg (1 exchange) + scalar reuse + final sort;
    # cusum: hourly cells agg + per-type window + presentation sort — the
    # windows run over CELLS, so no second fact-sized exchange may appear
    from data_pipeline_for_autonomous_vehicles_spark.operators import anomaly, drift

    psi = drift.value_drift_psi(spark, sf_dir)
    assert plans.exchange_count(psi) <= 3
    assert not plans.uses_cartesian_product(psi)

    cus = anomaly.cusum_alerts(spark, sf_dir)
    txt = plans.plan_text(cus)
    assert "Join" not in txt
    assert plans.exchange_count(cus) <= 4
    assert txt.count("HashAggregate") >= 2  # partial+final on the cell agg


def test_trend_derives_from_cells(spark, sf_dir):
    # regression moments must aggregate the daily-cell frame, not rescan the
    # fact table: exactly one scan node feeds the whole plan
    from data_pipeline_for_autonomous_vehicles_spark.operators import anomaly

    df = anomaly.daily_value_trend(spark, sf_dir)
    assert len(plans.scan_read_schemas(df)) == 1
    assert "Join" not in plans.plan_text(df)


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    # SCALE.md claims skewed keys are AQE's job — pin the mechanism: build a
    # deliberately skewed fact (every row the same join key) and check the
    # final adaptive plan marks the sort-merge join as skew-handled. The
    # thresholds are lowered so sf-test data trips the optimization; at
    # 100 TB the defaults (256 MB / 5× median) trip naturally.
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        # the downstream agg re-shuffles anyway; without force the rule
        # conservatively declines whenever a later exchange exists
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        # 80 % of fact rows share key 0. Three constructions that DON'T trip
        # the rule, for the record: a literal key (folds the equi-condition
        # → cross join), a single-map-task input (a skewed reduce partition
        # splits at mapper-block granularity — hence the repartition(8)),
        # and a dim DERIVED from the fact (an agg between shuffle and join
        # breaks the rule's shuffle-sort-join pattern match).
        hot = F.when(F.col("l_orderkey") % 10 < 8, F.lit(0)).otherwise(
            F.col("l_orderkey")
        )
        li = (
            load_table(spark, sf_dir, "lineitem")
            .repartition(8)
            .withColumn("hot_key", hot)
        )
        dim = (
            load_table(spark, sf_dir, "orders")
            .select(F.col("o_orderkey").alias("hot_key"))
            .union(spark.range(1).select(F.lit(0).cast("long").alias("hot_key")))
        )
        j = li.join(dim, "hot_key").groupBy("l_returnflag").count()
        j.collect()
        final = plans.plan_text(j)
        assert "isFinalPlan=true" in final
        assert "skew=true" in final
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_hybrid_rrf_no_global_window(spark, sf_dir):
    # the fused top-k comes from the provable candidate cut: tower top-Ms
    # are TakeOrderedAndProject (per-partition heaps), candidate ranks are
    # broadcast comparison-counts — there must be NO Window over the full
    # scored-doc relation (the single-partition sort that breaks at scale)
    from data_pipeline_for_autonomous_vehicles_spark.operators import similarity

    df = similarity.hybrid_search_rrf(spark, sf_dir)
    txt = plans.plan_text(df)
    assert "Window" not in txt
    assert "TakeOrderedAndProject" in txt


def test_triangle_census_degree_oriented(spark, sf_dir):
    # compact-forward wedge join: no cartesian product, and the wedge/close
    # joins stay equi-keyed (SortMergeJoin/ShuffledHashJoin/BroadcastHashJoin)
    from data_pipeline_for_autonomous_vehicles_spark.operators import graph

    df = graph.copurchase_triangle_count(spark, sf_dir)
    assert not plans.uses_cartesian_product(df)
    # wedge + closing joins are hash-based EQUI joins (the only nested-loop
    # joins are the 1-row scalar combines for n_edges/n_nodes). At test
    # scale the eagerly-checkpointed adjacency is tiny, so the planner may
    # legitimately broadcast it (round-8: the array-form pair expansion
    # made the checkpoint sizes visible and flipped SMJ → BHJ here); any
    # equi strategy is the pinned property, nested-loop wedge joins are not.
    txt = plans.plan_text(df)
    assert (
        "SortMergeJoin" in txt
        or "ShuffledHashJoin" in txt
        or "BroadcastHashJoin" in txt
    )


def test_shipment_proximity_is_equi_join_banded(spark, sf_dir):
    # cross-table banded join must stay an equi-join on (customer, cell)
    # with the band as a post-join filter — no cartesian/nested-loop pair
    # generation, and the anchor-side explode is the only row expansion
    from data_pipeline_for_autonomous_vehicles_spark.operators import temporal

    df = temporal.order_shipment_proximity(spark, sf_dir)
    assert not plans.uses_cartesian_product(df)
    txt = plans.plan_text(df)
    assert "BroadcastNestedLoopJoin" not in txt
    assert "Generate" in txt  # the 3-cell explode


def test_corpus_ops_prune_scans_and_avoid_global_windows(spark, sf_dir):
    # corpus.py shapes: explode -> hash-agg (+ one digest equi-join for
    # passage dedup). No windows at all, documents scan pruned to the two
    # columns the signals need (doc_id, text) — at 100 TB the scan IS the
    # dominant cost, so reading lang/source/n_chars here would be a bug.
    from data_pipeline_for_autonomous_vehicles_spark.operators import corpus

    for fn in (
        corpus.repetition_ratios,
        corpus.passage_dedup_stats,
        corpus.token_entropy,
    ):
        df = fn(spark, sf_dir)
        assert plans.unpartitioned_windows(df) == [], fn.__name__
        schemas = plans.scan_read_schemas(df)
        assert schemas, fn.__name__
        for s in schemas:
            assert "lang" not in s and "source" not in s and "n_chars" not in s, (
                fn.__name__,
                s,
            )
        assert not plans.uses_cartesian_product(df), fn.__name__


def test_tie_aware_rank_queries_have_no_range_exchange_at_execution(spark, sf_dir):
    # _tie_aware_running derives its partition id from the data itself (a
    # broadcast percentile-boundary array), so no rangepartitioning exchange
    # exists on the tie keys at all — range boundaries can't be re-sampled
    # per consumer branch (the round-2 offset-corruption hazard) because
    # there are none. Round 3 dropped the eager localCheckpoint that
    # previously pinned one physical partitioning.
    df = windows.order_price_position(spark, sf_dir)
    txt = plans.plan_text(df)
    # no materialization step survives
    assert "Scan ExistingRDD" not in txt
    # NO range exchange anywhere: none on the (priority, price) tie keys,
    # and — since the round-8 optimization dropped the presentation sort
    # (scaling output, order-insensitive driver gate) — none on o_orderkey
    # either
    import re

    ranges = re.findall(r"rangepartitioning\(([^)]*)\)", txt)
    assert ranges == [], ranges
    # the window that finishes the running counts partitions by the derived
    # pid — never an unpartitioned (single-task) window
    assert plans.unpartitioned_windows(df) == []


def test_unpartitioned_window_detector_catches_orderless_global(spark):
    # `max over ()` has no ORDER BY, so the spec's first argument is the
    # frame itself — the detector must flag it (it moves all data to one
    # partition just like the ordered form)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    bad = spark.range(10).select(F.max("id").over(Window.partitionBy()).alias("m"))
    assert len(plans.unpartitioned_windows(bad)) == 1


def test_q15_max_is_broadcast_scalar_not_global_window(spark, sf_dir):
    # q15's MAX-over-aggregate must be a 1-row broadcast combine, not a
    # Window.partitionBy() over the growing per-supplier frame
    df = tpch_ext.q15_top_supplier(spark, sf_dir)
    assert plans.unpartitioned_windows(df) == []
    assert "Window" not in plans.plan_text(df)


def test_new_cell_frame_ops_have_no_unpartitioned_windows(spark, sf_dir):
    """Round-2 additions must honor the no-global-window rule: every Window
    in their plans partitions by a key, and fan-out/aggregation runs on
    cell frames (bounded exchanges), never on the raw fact table."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import (
        anomaly,
        olap,
        quality,
        timeseries,
    )

    from data_pipeline_for_autonomous_vehicles_spark.operators import drift

    for df, max_ex in [
        (anomaly.seasonal_residual_outliers(spark, sf_dir), 4),
        (quality.value_winsorized_stats(spark, sf_dir), 5),
        (olap.value_percentiles(spark, sf_dir), 4),
        (timeseries.hourly_event_ewma(spark, sf_dir), 5),
        # two-level bucket CDF: prefix sums with no unpartitioned window.
        # The decomposition trades a few extra exchanges (bucket totals,
        # offsets self-join) for that property — every one of them carries
        # the cell/bucket frame, never the fact table, so the higher count
        # is cheap rows, not data volume.
        (drift.value_ks_test(spark, sf_dir), 11),
        (drift.value_mannwhitney_test(spark, sf_dir), 11),
    ]:
        assert plans.unpartitioned_windows(df) == []
        assert plans.exchange_count(df) <= max_ex
        assert not plans.uses_cartesian_product(df)


def test_value_percentiles_no_buffering_percentile_aggregate(spark, sf_dir):
    """The cell-CDF rewrite must keep the Percentile buffer-aggregate out
    of the plan (the OOM shape at 100 TB) — quantiles come from cells."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import olap

    txt = plans.plan_text(olap.value_percentiles(spark, sf_dir))
    assert "percentile" not in txt.lower()
    assert "Window" in txt  # cell CDF running count


def test_session2_dedup_ops_bucketed_not_allpairs(spark, sf_dir):
    # simhash_hamming_pairs / minhash_estimate_audit: candidates must come
    # from equi-joins (band buckets), never a cartesian product, and no
    # unpartitioned window may appear anywhere
    from data_pipeline_for_autonomous_vehicles_spark.operators import dedup

    for fn in (dedup.simhash_hamming_pairs, dedup.minhash_estimate_audit):
        df = fn(spark, sf_dir)
        assert not plans.uses_cartesian_product(df), fn.__name__
        assert plans.unpartitioned_windows(df) == [], fn.__name__


def test_session2_fixed_width_aggregates(spark, sf_dir):
    # cms_token_counts / training_shards / bpe_merge_candidates aggregate
    # on bounded keys (2048 cells / 16 shards / alphabet² pairs): no join in
    # shards, no cartesian anywhere, and the pair/top-k reports end in
    # TakeOrderedAndProject rather than a global sort
    from data_pipeline_for_autonomous_vehicles_spark.operators import frequency, text

    shards = text.training_shards(spark, sf_dir)
    assert "Join" not in plans.plan_text(shards)
    assert plans.exchange_count(shards) <= 2

    for fn in (text.bpe_merge_candidates, frequency.cms_token_counts):
        df = fn(spark, sf_dir)
        assert not plans.uses_cartesian_product(df), fn.__name__
    assert "TakeOrderedAndProject" in plans.plan_text(text.bpe_merge_candidates(spark, sf_dir))


def test_mad_outliers_windows_partitioned_by_type(spark, sf_dir):
    # both cell-CDF passes must window over (event_type)-partitioned cells —
    # an orderless global window here would single-task the fact table
    from data_pipeline_for_autonomous_vehicles_spark.operators import quality

    df = quality.value_mad_outliers(spark, sf_dir)
    assert plans.unpartitioned_windows(df) == []
    assert not plans.uses_cartesian_product(df)


def test_session3b_ops_scale_shapes(spark, sf_dir):
    # theilsen: pairwise stage joins daily CELLS (equi-join on type), never
    # the fact table, and its windows are type-partitioned; session_window:
    # native merging agg, no join at all; oov: broadcast vocab lookup, no
    # cartesian; spine: recursion is calendar-bounded, no cartesian
    from data_pipeline_for_autonomous_vehicles_spark.operators import (
        anomaly,
        text,
        timeseries,
        windows as win_ops,
    )

    ts_df = anomaly.daily_trend_theilsen(spark, sf_dir)
    assert not plans.uses_cartesian_product(ts_df)
    assert plans.unpartitioned_windows(ts_df) == []

    sw = win_ops.session_window_stats(spark, sf_dir)
    assert "Join" not in plans.plan_text(sw)
    assert plans.unpartitioned_windows(sw) == []

    for fn in (text.oov_rate_report, timeseries.monthly_order_spine):
        df = fn(spark, sf_dir)
        assert not plans.uses_cartesian_product(df), fn.__name__


def test_registry_wide_no_cartesian_no_unpartitioned_windows(spark, sf_dir):
    """Every registered query — the full driver surface — must compile
    without a CartesianProduct and without any unpartitioned (global-sort)
    window. This is the blanket version of the targeted assertions above:
    a new operator that reintroduces either scale cliff fails here without
    needing its own plan test."""
    import __spark_entry__ as entrymod

    offenders = []
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        if plans.uses_cartesian_product(df):
            offenders.append((name, "cartesian"))
        if plans.unpartitioned_windows(df):
            offenders.append((name, "unpartitioned window"))
    assert offenders == []


def test_ann_pq_bm25_exchange_bounds(spark, sf_dir):
    # round-2 verdict task: these were the deepest plans in the registry
    # (14-15 exchanges) because codeword/centroid assignment ran as a
    # row_number window over the corpus and bm25 re-derived the (doc, term)
    # aggregate in four branches. Assignment is now a broadcast array-argmin
    # (map-side, corpus never shuffles) and bm25 scores per-doc in closed
    # form — pin the flattened shapes well under the <=8 target.
    from data_pipeline_for_autonomous_vehicles_spark.operators import ranking, similarity

    assert plans.exchange_count(ranking.bm25_topk(spark, sf_dir)) <= 2
    assert plans.exchange_count(similarity.ann_pq_topk(spark, sf_dir)) <= 6
    assert plans.exchange_count(similarity.ann_ivfpq_topk(spark, sf_dir)) <= 6
    assert plans.exchange_count(similarity.ann_ivf_topk(spark, sf_dir)) <= 4
    assert plans.exchange_count(similarity.kmeans_cluster_stats(spark, sf_dir)) <= 8


def test_tie_aware_rank_exchange_bounds(spark, sf_dir):
    # round-3 verdict task 2: these were the three deepest plans in the
    # registry (21/15/13 exchanges) because the equal-mass cut array was
    # re-derived through a histogram self-join + two crossJoins per call.
    # The hash-sampled key-quantile cuts collapse that to one count + one
    # collect aggregate over the cached distinct-key table — pin the
    # flattened shapes at the measured 8/8/6. Cache substitution from an
    # earlier test's materialized plan cache changes the printed tree, so
    # measure against a clean cache state.
    from data_pipeline_for_autonomous_vehicles_spark import caching
    from data_pipeline_for_autonomous_vehicles_spark.operators import windows as win_ops

    spark.catalog.clearCache()
    caching.release_plan_caches()

    assert plans.exchange_count(win_ops.supplier_revenue_ranks(spark, sf_dir)) <= 8
    assert plans.exchange_count(win_ops.customer_balance_quartiles(spark, sf_dir)) <= 8
    assert plans.exchange_count(win_ops.order_price_position(spark, sf_dir)) <= 6
