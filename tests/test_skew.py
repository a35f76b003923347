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
