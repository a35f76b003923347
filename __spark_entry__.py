"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_pipeline_for_autonomous_vehicles_spark``;
this module only adapts it to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_for_autonomous_vehicles_spark.operators import all_oracles, all_queries
from data_pipeline_for_autonomous_vehicles_spark.operators.tpch import q1_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-shaped pricing summary at sf0.001."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
