"""Physical-plan regression tests.

Correctness is the oracle harness's job; these pin the PLAN SHAPE — the
properties that decide whether a query survives a 100×–10⁶× scale-up
(SCALE.md). If an edit silently drops a pushed filter, de-broadcasts a
dimension, or turns top-k into a global sort, these fail even though
results stay correct.
"""

from __future__ import annotations

import io
import contextlib

import pytest

from data_pipeline_for_autonomous_vehicles_spark.operators import (
    metrics,
    spatial,
    tpch,
    tpch_ext,
    windows,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = _plan(tpch.q1_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # 7 of 11 lineitem columns read — l_orderkey/partkey/suppkey/linenumber pruned
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read and "l_partkey" not in read
    # partial + final hash aggregation
    assert plan.count("HashAggregate") >= 2


def test_q3_broadcasts_dimensions_and_takeordered(spark, sf_dir):
    plan = _plan(tpch.q3_shipping_priority(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # the BUILDING filter reaches the customer scan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_q5_no_shuffle_for_dimension_joins(spark, sf_dir):
    plan = _plan(tpch.q5_local_supplier_volume(spark, sf_dir))
    # all four dimension joins broadcast; only fact join + agg shuffle
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_latest_telemetry_window_group_limit(spark, sf_dir):
    plan = _plan(metrics.latest_telemetry(spark, sf_dir))
    # rank<=1 must push into the window sort (bounded buffers per group)
    assert "WindowGroupLimit" in plan


def test_top_orders_window_group_limit(spark, sf_dir):
    plan = _plan(windows.top_orders_per_priority(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_spatial_join_is_equi_not_cartesian(spark, sf_dir):
    plan = _plan(spatial.nearby_vehicle_pairs(spark, sf_dir))
    # cell-bucketing must make this a hash join keyed on the cell —
    # never a cartesian/nested-loop over all pairs
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan


def test_q21_two_exchanges_not_four(spark, sf_dir):
    plan = _plan(tpch_ext.q21_blocking_suppliers(spark, sf_dir))
    # one exchange for groupBy(l_orderkey, l_suppkey), one narrowing to the
    # window's partitionBy(l_orderkey) — the single window pass must NOT
    # reintroduce the three self-join shuffles it replaced
    n_orderkey_exchanges = sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("Arguments: hashpartitioning(l_orderkey")
    )
    assert n_orderkey_exchanges == 2, plan


def test_q6_all_predicates_pushed(spark, sf_dir):
    plan = _plan(tpch.q6_forecast_revenue(spark, sf_dir))
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
