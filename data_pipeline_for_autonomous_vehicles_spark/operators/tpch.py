"""TPC-H-shaped analytic queries over the driver's star schema.

These exercise the operator classes the reference's nine metrics use
(groupBy-agg, left-join-of-aggregates, top-k, window functions — SURVEY.md
§2.3-2.6) at bench scale. All plans are declarative DataFrame expressions:
Catalyst pushes filters into the parquet scans, prunes columns, and
auto-broadcasts the small dimension sides (AQE confirms at runtime).

Scale notes (100 TB design intent):
- Fact-to-fact joins (orders ⋈ lineitem) shuffle on the join key; dimension
  joins (region/nation/customer/supplier/part) are explicitly broadcast.
- Aggregates use map-side partial aggregation (Spark default for hash agg).
- Sums use exact scaled-integer arithmetic (functions.scalars.exact_sum) so
  results are order-independent → identical on any cluster size AND bit-equal
  to the DuckDB oracle. At true 100 TB the int64 accumulators would move to
  DECIMAL(38,4); noted per-query where magnitude matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import (
    exact_avg,
    exact_sum,
    round_half_up,
    sql_exact_avg,
    sql_exact_sum,
    sql_round_half_up,
)

# revenue expression: per-row product is IEEE-identical across engines;
# scale=4 captures the full 2dp*2dp decimal product exactly.
_REV_SCALE = 4


def _revenue() -> "F.Column":
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


_SQL_REV = "l_extendedprice * (1.0 - l_discount)"


# --- Q1: pricing summary (pure groupBy-agg, the flagship) ------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-agg with 8 aggregates.

    Plan check: filter on l_shipdate is pushed to the parquet scan
    (PushedFilters), only 7 columns read (ReadSchema), partial+final hash
    aggregation, whole-stage codegen end to end.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    charge = _revenue() * (F.lit(1.0) + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", 2).alias("sum_qty"),
            exact_sum("l_extendedprice", 2).alias("sum_base_price"),
            exact_sum(_revenue(), _REV_SCALE).alias("sum_disc_price"),
            exact_sum(charge, 6).alias("sum_charge"),
            exact_avg("l_quantity", 2).alias("avg_qty"),
            exact_avg("l_extendedprice", 2).alias("avg_price"),
            exact_avg("l_discount", 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_exact_sum("l_quantity", 2)} AS sum_qty,
       {sql_exact_sum("l_extendedprice", 2)} AS sum_base_price,
       {sql_exact_sum(_SQL_REV, _REV_SCALE)} AS sum_disc_price,
       {sql_exact_sum(_SQL_REV + " * (1.0 + l_tax)", 6)} AS sum_charge,
       {sql_exact_avg("l_quantity", 2)} AS avg_qty,
       {sql_exact_avg("l_extendedprice", 2)} AS avg_price,
       {sql_exact_avg("l_discount", 2)} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- Q3: shipping priority (3-way join + agg + top-k) ----------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem, revenue per order, top 10.

    customer is a dimension → broadcast (no shuffle for that join);
    orders ⋈ lineitem shuffles on orderkey. Top-k is TakeOrderedAndProject
    (no global sort). Deterministic tiebreak on l_orderkey.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(_revenue(), _REV_SCALE).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {sql_exact_sum(_SQL_REV, _REV_SCALE)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- Q5-shape: local supplier volume (5-way join) --------------------------


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region ⋈ nation ⋈ supplier ⋈ customer ⋈ orders ⋈ lineitem with the
    classic c_nationkey = s_nationkey "local" constraint; revenue per nation.

    All dimensions broadcast; the only shuffles are the two fact joins
    (orders⋈lineitem on orderkey, then customer equi-join on custkey).
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(exact_sum(_revenue(), _REV_SCALE).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


_Q5_SQL = f"""
SELECT n_name, {sql_exact_sum(_SQL_REV, _REV_SCALE)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --- Q10-shape: returned items (join + agg + top 20 customers) -------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_sum(_revenue(), _REV_SCALE).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {sql_exact_sum(_SQL_REV, _REV_SCALE)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- order-priority counts (semi-join shape, Q4-ish) -----------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders that have at least one lineitem shipped after order date —
    LEFT SEMI join (EXISTS), then count per priority."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    late = lineitem.filter(F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp"))
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- customers with no orders (anti-join) ----------------------------------


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who never placed a 1-URGENT order (LEFT ANTI join; the
    unfiltered variant is empty at every driver SF — all customers order)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


_ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


# --- Q6-shape: forecast revenue change (pure scan-filter-agg) --------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(extendedprice · discount) under three range predicates — the
    pushdown showcase: every filter reaches the parquet scan; zero shuffle
    beyond the final single-row reduce."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue")
        )
    )


_Q6_SQL = f"""
SELECT {sql_exact_sum("l_extendedprice * l_discount", 4)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- Q7-shape: volume between nation pairs ---------------------------------


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade volume per (supp_nation, cust_nation, year).
    Two broadcast nation lookups; the orders⋈lineitem shuffle is shared."""
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(exact_sum(_revenue(), _REV_SCALE).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {sql_exact_sum(_SQL_REV, _REV_SCALE)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


# --- Q14-shape: promotion revenue share ------------------------------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 · Σ(promo revenue) / Σ(revenue) over one month — conditional
    aggregate over a broadcast part join."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    rev_e4 = F.floor(_revenue() * F.lit(10_000.0) + F.lit(0.5)).cast("long")
    promo_e4 = F.when(F.col("p_type") == "PROMO", rev_e4).otherwise(F.lit(0))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            round_half_up(
                F.lit(100.0)
                * F.sum(promo_e4).cast("double")
                / F.sum(rev_e4).cast("double"),
                4,
            ).alias("promo_revenue_pct")
        )
    )


_Q14_SQL = f"""
SELECT {sql_round_half_up(
    "100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN CAST(FLOOR((" + _SQL_REV + ") * 10000.0 + 0.5) AS BIGINT) ELSE 0 END) AS DOUBLE)"
    " / CAST(SUM(CAST(FLOOR((" + _SQL_REV + ") * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)", 4)} AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
"""


# --- Q18-shape: large-volume customers (agg → semi-join back) --------------

Q18_QTY = 150.0


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold, with customer info —
    the HAVING-subquery shape: aggregate once, semi-join the fact back."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(exact_sum("l_quantity", 2).alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


_Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, {sql_exact_sum("l_quantity", 2)} AS total_qty
  FROM lineitem GROUP BY l_orderkey) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE total_qty > {Q18_QTY}
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q10_returned_items": q10_returned_items,
    "q4_order_priority": q4_order_priority,
    "customers_without_orders": customers_without_orders,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_nation_volume": q7_nation_volume,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
}

ORACLES = {
    "q1_pricing_summary": _Q1_SQL,
    "q3_shipping_priority": _Q3_SQL,
    "q5_local_supplier_volume": _Q5_SQL,
    "q10_returned_items": _Q10_SQL,
    "q4_order_priority": _Q4_SQL,
    "customers_without_orders": _ANTI_SQL,
    "q6_forecast_revenue": _Q6_SQL,
    "q7_nation_volume": _Q7_SQL,
    "q14_promo_revenue": _Q14_SQL,
    "q18_large_orders": _Q18_SQL,
}
