"""Heavy-hitter (hot-key) detection — the measurement half of skew handling
(`functions/skew.py:salted_join` is the mitigation half).

Finds join/group keys whose frequency exceeds HOT_MULTIPLE× the mean key
frequency — the keys a planner would salt, and the report AQE's skew-join
reads off shuffle statistics at runtime. The reference has no frequency
analysis at all; this is engine infrastructure for the 100 TB path.

Exactness: the threshold compare is pure int64 cross-multiplication
(cnt·D·10 ≥ 15·N ⇔ cnt ≥ 1.5·N/D), so hot-set membership is exact in both
engines — no double division at the decision point. The reported ratios are
display-rounded after the fact.

Scale shape: ONE shuffle — groupBy(key).count() with map-side partial
aggregation, so the shuffle carries one row per (task × distinct key). The
corpus scalars (total rows N, distinct keys D) come from a second agg over
the tiny per-key relation — the fact table is scanned once. The hot filter
then reduces that relation to the handful of skewed keys, and top-k is a
TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import round_half_up, sql_round_half_up

HOT_MULTIPLE_E1 = 15  # threshold = 1.5× mean frequency, as tenths
TOP_K = 100


def hot_keys_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys of lineitem.l_partkey whose frequency ≥ 1.5× the mean, with
    exact count, share of rows, and ratio to the mean frequency."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    scalars = counts.agg(
        F.sum("cnt").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    hot = (
        counts.crossJoin(F.broadcast(scalars))
        # int64 cross-multiply: cnt/N ≥ 1.5/D without a double in the predicate
        .filter(
            F.col("cnt") * F.col("n_keys") * F.lit(10)
            >= F.lit(HOT_MULTIPLE_E1) * F.col("n_rows")
        )
        .select(
            "l_partkey",
            "cnt",
            round_half_up(
                F.col("cnt").cast("double") / F.col("n_rows").cast("double"), 6
            ).alias("row_share"),
            round_half_up(
                F.col("cnt").cast("double")
                * F.col("n_keys").cast("double")
                / F.col("n_rows").cast("double"),
                4,
            ).alias("ratio_to_mean"),
        )
    )
    return hot.orderBy(F.desc("cnt"), F.asc("l_partkey")).limit(TOP_K)


def _sql_hot_keys() -> str:
    share = sql_round_half_up(
        "CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE)", 6
    )
    ratio = sql_round_half_up(
        "CAST(cnt AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE)", 4
    )
    return f"""
WITH counts AS (
  SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey),
scalars AS (
  SELECT SUM(cnt) AS n_rows, COUNT(*) AS n_keys FROM counts)
SELECT l_partkey, cnt,
       {share} AS row_share,
       {ratio} AS ratio_to_mean
FROM counts CROSS JOIN scalars
WHERE cnt * n_keys * 10 >= {HOT_MULTIPLE_E1} * n_rows
ORDER BY cnt DESC, l_partkey ASC
LIMIT {TOP_K}
"""


QUERIES = {"hot_keys_report": hot_keys_report}
ORACLES = {"hot_keys_report": _sql_hot_keys()}
