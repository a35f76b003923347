"""As-of join tests (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark.operators import asof


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_hand_case(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100),
            (1, _ts("2024-01-01 12:00:00"), 101),
            (2, _ts("2024-01-01 11:00:00"), 102),
            (3, _ts("2024-01-01 09:00:00"), 103),  # no right row at all
        ],
        "k int, t timestamp, lid int",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 10, 1.5),
            (1, _ts("2024-01-01 11:00:00"), 11, 2.5),
            (1, _ts("2024-01-01 12:00:00"), 12, 3.5),  # equal ts: visible
            (2, _ts("2024-01-01 11:30:00"), 13, 4.5),  # after left: invisible
        ],
        "k int, t timestamp, rid int, v double",
    )
    out = asof.asof_join(
        left.withColumnRenamed("lid", "tie_id"),
        right.withColumnRenamed("rid", "tie_id"),
        on="k",
        left_time="t",
        right_time="t",
        value_cols=["v"],
        tie="tie_id",
    )
    got = {r["tie_id"]: r["asof_v"] for r in out.collect()}
    assert got == {100: 1.5, 101: 3.5, 102: None, 103: None}


def test_purchases_asof_never_future(spark, sf_dir):
    out = asof.purchases_with_last_view(spark, sf_dir)
    # every purchase appears exactly once
    ev_ids = [r["event_id"] for r in out.collect()]
    assert len(ev_ids) == len(set(ev_ids)) > 0


def test_ivf_vs_bruteforce_recall(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators import similarity as s

    bf = {
        (r["query_id"], r["vec_id"])
        for r in s.ann_bruteforce_topk(spark, sf_dir).collect()
    }
    ivf = {
        (r["query_id"], r["vec_id"]) for r in s.ann_ivf_topk(spark, sf_dir).collect()
    }
    # approximate: every IVF hit is a real vector pair, per-query ≤ TOP_K,
    # and recall against exact top-k is non-trivial
    assert ivf and len(ivf & bf) / len(bf) > 0.2
