"""Temporal range (interval) self-join, bucketed — the 1-D twin of the
spatial cell join (operators/spatial.py).

Query: for every error event, how many events did the same user generate
within ±5 minutes (the incident-context window a fleet operator pulls when
triaging)? A naive theta join `|t_a − t_b| <= W` over a fact table is
O(n²)-per-key; the scalable shape buckets time into W-sized cells so each
left row probes its own and two adjacent cells — an equi-join on
(user, cell), cost O(n · density), same trick as the geo-cell join and the
standard banded range-join strategy (e.g. Databricks' range-join hints).

The oracle twin runs the brute-force range join, so the check proves
bucketed ≡ naive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

WINDOW_S = 300  # ±5 minutes


def temporal_neighbor_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: count + exact value sum of same-user events within
    ±WINDOW_S seconds (the event itself excluded)."""
    ev = load_table(spark, sf_dir, "events")
    # integer epoch micros: cell arithmetic stays exact in both engines
    epoch_us = F.unix_micros(F.col("ts"))
    base = ev.select(
        "event_id", "user_id", "event_type", "value", epoch_us.alias("t_us")
    )
    # integer DIV: exact cell id at any epoch magnitude (no double rounding)
    cell = F.expr(f"t_us DIV {WINDOW_S * 1_000_000}")

    errors = base.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("u"),
        F.col("t_us").alias("err_t"),
        cell.alias("cell0"),
    )
    # probe own + adjacent cells: every |Δt| <= W pair shares or neighbors
    probes = errors.select(
        "err_id",
        "u",
        "err_t",
        F.explode(
            F.array(F.col("cell0") - 1, F.col("cell0"), F.col("cell0") + 1)
        ).alias("cell"),
    )
    others = base.select(
        F.col("event_id").alias("nbr_id"),
        F.col("user_id").alias("u"),
        F.col("t_us").alias("nbr_t"),
        F.expr(f"t_us DIV {WINDOW_S * 1_000_000}").alias("cell"),
        F.col("value").alias("nbr_value"),
    )
    joined = (
        probes.join(others, ["u", "cell"])
        .filter(
            (F.col("nbr_id") != F.col("err_id"))
            & (F.abs(F.col("nbr_t") - F.col("err_t")) <= F.lit(WINDOW_S * 1_000_000))
        )
    )
    return (
        joined.groupBy(F.col("err_id").alias("event_id"))
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            (
                F.sum(
                    F.floor(F.col("nbr_value") * 100.0 + F.lit(0.5)).cast("long")
                ).cast("double")
                / 100.0
            ).alias("neighbor_value_sum"),
        )
        .orderBy("event_id")
    )


_TEMPORAL_SQL = f"""
WITH base AS (
  SELECT event_id, user_id, event_type, value,
         epoch_us(ts) AS t_us
  FROM events)
SELECT e.event_id AS event_id,
       COUNT(*) AS n_neighbors,
       CAST(SUM(CAST(FLOOR(n.value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS neighbor_value_sum
FROM base e
JOIN base n
  ON e.user_id = n.user_id
 AND n.event_id <> e.event_id
 AND ABS(n.t_us - e.t_us) <= {WINDOW_S * 1_000_000}
WHERE e.event_type = 'error'
GROUP BY e.event_id
ORDER BY event_id
"""


QUERIES = {"temporal_neighbor_counts": temporal_neighbor_counts}
ORACLES = {"temporal_neighbor_counts": _TEMPORAL_SQL}


# --- cross-table banded proximity join -------------------------------------

SHIP_WINDOW_S = 30 * 86_400  # ±30 days around the order moment


def order_shipment_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer shipment-cadence rollup: for each order, the lineitems
    of the SAME customer's OTHER orders that shipped within ±30 days of it
    — the cross-table point-in-window join (attribution shape: anchor
    table × activity table banded on time).

    Cross-table variant of the banded self-join above: the anchor side
    (orders) explodes to its own + adjacent 30-day cells — 3× the smaller
    table, never the lineitem fact — and the probe is a pure equi-join on
    (customer, cell) + band filter: each table shuffles once, cost
    O(anchors · density), never O(orders × lineitem). The lineitem→orders
    key join that attaches the customer to each line is the same
    orderkey-partitioned join every TPC-H query uses.

    Output (one row per customer with ≥1 proximate pair): n_orders with a
    nearby foreign shipment, total pairs, max pairs for one order.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cell_us = SHIP_WINDOW_S * 1_000_000

    # attach the owning customer to every lineitem (orderkey equi-join)
    le = li.select("l_orderkey", F.unix_micros(F.col("l_shipdate")).alias("s_t")).join(
        orders.select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.col("o_custkey").alias("cust"),
        ),
        "l_orderkey",
    )
    e = le.select(
        "cust",
        F.col("l_orderkey").alias("ship_okey"),
        "s_t",
        F.expr(f"s_t DIV {cell_us}").alias("cell"),
    )
    anchors = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("cust"),
        F.unix_micros(F.col("o_orderdate")).alias("o_t"),
    )
    probes = anchors.select(
        "okey",
        "cust",
        "o_t",
        F.explode(
            F.array(
                F.expr(f"o_t DIV {cell_us}") - 1,
                F.expr(f"o_t DIV {cell_us}"),
                F.expr(f"o_t DIV {cell_us}") + 1,
            )
        ).alias("cell"),
    )
    pairs = probes.join(e, ["cust", "cell"]).filter(
        (F.col("ship_okey") != F.col("okey"))
        & (F.abs(F.col("s_t") - F.col("o_t")) <= F.lit(cell_us))
    )
    per_order = pairs.groupBy("cust", "okey").agg(F.count(F.lit(1)).alias("n_near"))
    return (
        per_order.groupBy(F.col("cust").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders_with_nearby"),
            F.sum("n_near").alias("n_pairs"),
            F.max("n_near").alias("max_pairs_one_order"),
        )
        .orderBy("custkey")
    )


_SHIP_PROXIMITY_SQL = f"""
WITH le AS (
  SELECT o.o_custkey AS cust, l.l_orderkey AS ship_okey,
         epoch_us(l.l_shipdate) AS s_t
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
pairs AS (
  SELECT a.o_custkey AS cust, a.o_orderkey AS okey, COUNT(*) AS n_near
  FROM orders a
  JOIN le ON le.cust = a.o_custkey
         AND le.ship_okey <> a.o_orderkey
         AND ABS(le.s_t - epoch_us(a.o_orderdate)) <= {SHIP_WINDOW_S * 1_000_000}
  GROUP BY 1, 2)
SELECT cust AS custkey,
       COUNT(*) AS n_orders_with_nearby,
       CAST(SUM(n_near) AS BIGINT) AS n_pairs,
       MAX(n_near) AS max_pairs_one_order
FROM pairs
GROUP BY cust
ORDER BY custkey
"""

QUERIES["order_shipment_proximity"] = order_shipment_proximity
ORACLES["order_shipment_proximity"] = _SHIP_PROXIMITY_SQL
