"""Observation-API write accounting: metrics ride the write job itself and
equal a direct (second-scan) aggregation of the same frame."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
from data_pipeline_for_autonomous_vehicles_spark.functions.scalars import exact_sum
from data_pipeline_for_autonomous_vehicles_spark.observe import observed_write


def test_observed_write_matches_direct_agg(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    got = observed_write(
        ev,
        str(tmp_path / "purchases"),
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_users": F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)),
            "value_sum": exact_sum(F.col("value")),
        },
    )
    direct = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias("n_null_users"),
        exact_sum(F.col("value")).alias("value_sum"),
    ).collect()[0]
    assert got["n_rows"] == direct["n_rows"] > 0
    assert got["n_null_users"] == direct["n_null_users"]
    assert got["value_sum"] == direct["value_sum"]
    # and the write really landed those rows
    assert spark.read.parquet(str(tmp_path / "purchases")).count() == got["n_rows"]
