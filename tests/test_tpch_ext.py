"""Sanity tests for the extended TPC-H query shapes (operators/tpch_ext.py).

The differential oracle harness (tools/check_oracle.py, driver CORRECTNESS
gate) is the primary correctness check; these assert structural properties
at sf0.001 — group bounds, monotone sorts, cross-query consistency.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
from data_pipeline_for_autonomous_vehicles_spark.operators import tpch_ext


def test_q2_one_min_cost_per_part(spark, sf_dir):
    out = tpch_ext.q2_min_cost_supplier(spark, sf_dir).collect()
    # every returned (part, supplier) pair carries the per-part minimum:
    # grouping by part, all unit_costs must be equal
    by_part = {}
    for r in out:
        by_part.setdefault(r["p_partkey"], []).append(r["unit_cost"])
    for costs in by_part.values():
        assert max(costs) == min(costs)


def test_q8_share_in_unit_interval(spark, sf_dir):
    out = tpch_ext.q8_market_share(spark, sf_dir).collect()
    assert out, "q8 returned no year rows"
    for r in out:
        assert 0.0 <= r["mkt_share"] <= 1.0
    years = [r["o_year"] for r in out]
    assert years == sorted(years)


def test_q12_counts_split_exactly(spark, sf_dir):
    out = tpch_ext.q12_late_shipments(spark, sf_dir).collect()
    for r in out:
        high = r["o_orderpriority"] in ("1-URGENT", "2-HIGH")
        # each priority group is entirely high or entirely low
        assert (r["low_line_count"] == 0) if high else (r["high_line_count"] == 0)


def test_q13_histogram_covers_all_customers(spark, sf_dir):
    out = tpch_ext.q13_customer_distribution(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r["custdist"] for r in out) == n_cust


def test_q15_returns_global_max(spark, sf_dir):
    out = tpch_ext.q15_top_supplier(spark, sf_dir).collect()
    assert len(out) >= 1
    revs = {r["total_revenue"] for r in out}
    assert len(revs) == 1  # all rows tie at the maximum


def test_q16_distinct_bounded_by_suppliers(spark, sf_dir):
    out = tpch_ext.q16_supplier_part_counts(spark, sf_dir).collect()
    n_supp = load_table(spark, sf_dir, "supplier").count()
    assert out
    for r in out:
        assert 1 <= r["supplier_cnt"] <= n_supp


def test_q21_numwait_bounded_by_f_orders(spark, sf_dir):
    out = tpch_ext.q21_blocking_suppliers(spark, sf_dir).collect()
    n_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .count()
    )
    assert len(out) <= 20
    for r in out:
        assert 1 <= r["numwait"] <= n_f


def test_q22_excludes_recent_buyers(spark, sf_dir):
    out = tpch_ext.q22_sales_opportunity(spark, sf_dir).collect()
    for r in out:
        assert r["numcust"] >= 1 and r["totacctbal"] > 0


def test_scalar_queries_return_single_row(spark, sf_dir):
    for fn in (tpch_ext.q17_small_quantity_revenue, tpch_ext.q19_disjunctive_revenue):
        assert fn(spark, sf_dir).count() == 1


def test_lead_time_percentiles_match_bruteforce(spark, sf_dir):
    """p50/p90 equal percentile_disc lower-bound on a literal recount."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import tpch_ext
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from collections import defaultdict

    out = {r["l_suppkey"]: r for r in tpch_ext.supplier_lead_time_percentiles(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate").collect()
    od = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate").collect()
    }
    lead = defaultdict(list)
    for r in li:
        lead[r["l_suppkey"]].append((r["l_shipdate"] - od[r["l_orderkey"]]).days)
    assert set(out) == set(lead)
    for s, days in lead.items():
        days.sort()
        n = len(days)
        r = out[s]
        assert r["n_shipments"] == n
        assert r["p50_days"] == days[(50 * n + 99) // 100 - 1]
        assert r["p90_days"] == days[(90 * n + 99) // 100 - 1]
        assert r["max_days"] == days[-1]


def test_second_order_gap_and_brand_returns(spark, sf_dir):
    """Gap rows exist only for repeat customers and match a brute recount;
    brand return shares partition correctly."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import tpch_ext
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from collections import defaultdict

    out = {r["o_custkey"]: r for r in tpch_ext.customer_second_order_gap(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey").collect()
    by_cust = defaultdict(list)
    for r in orders:
        by_cust[r["o_custkey"]].append((r["o_orderdate"], r["o_orderkey"]))
    for c, rows in by_cust.items():
        rows.sort()
        if len(rows) >= 2:
            r = out[c]
            assert r["n_orders"] == len(rows)
            assert r["first_date"] == rows[0][0]
            assert r["second_date"] == rows[1][0]
            assert r["gap_days"] == (rows[1][0] - rows[0][0]).days
        else:
            assert c not in out

    br = tpch_ext.brand_return_rates(spark, sf_dir).collect()
    for r in br:
        assert r["n_lines"] >= tpch_ext.BRAND_MIN_LINES
        assert 0 <= r["n_returned"] <= r["n_lines"]
        assert 0.0 <= r["return_share"] <= 1.0
    shares = [r["return_share"] for r in br]
    assert shares == sorted(shares, reverse=True)


def test_trade_balance_conserves_totals(spark, sf_dir):
    """Exports sum to total discounted lineitem revenue; imports sum to
    total order value; net sums to the difference."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import tpch_ext
    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from pyspark.sql import functions as F
    import math

    out = tpch_ext.nation_trade_balance(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice", "l_discount").collect()
    total_rev = sum(
        int(math.floor(r["l_extendedprice"] * (1.0 - r["l_discount"]) * 1e4 + 0.5)) for r in li
    ) / 1e4
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice").collect()
    total_spend = sum(int(math.floor(r["o_totalprice"] * 1e4 + 0.5)) for r in orders) / 1e4
    assert abs(sum(r["export_revenue"] for r in out) - total_rev) < 1e-6 * total_rev
    assert abs(sum(r["import_spend"] for r in out) - total_spend) < 1e-6 * total_spend
    for r in out:
        assert abs(r["net_balance"] - (r["export_revenue"] - r["import_spend"])) < 1e-6
