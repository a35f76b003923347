"""Continuous-aggregate lifecycle: full build → late data → incremental
refresh of one day → merged serve path equals a direct aggregate of raw."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark import caggs
from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table


def _direct(events):
    return caggs.hourly_rollup_frame(events).select(
        "user_id",
        "bucket_h",
        "n_events",
        (F.col("v_scaled").cast("double") / float(caggs.ROLLUP_SCALE)).alias(
            "sum_value"
        ),
    )


def _as_sorted_rows(df):
    return sorted(
        ((r["user_id"], r["bucket_h"], r["n_events"], round(r["sum_value"], 2)) for r in df.collect())
    )


def test_cagg_full_lifecycle(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    days = sorted(
        r["d"].isoformat()
        for r in ev.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    assert len(days) >= 3
    cut = days[-1]  # last day = the raw tail, never materialized
    late_day = days[1]

    rollup = str(tmp_path / "rollup")
    # initial build WITHOUT the late slice of `late_day` (simulate data that
    # hasn't arrived: drop error events of that day)
    late_mask = (F.to_date("ts") == late_day) & (F.col("event_type") == "error")
    caggs.refresh_rollup(spark, ev.filter(~late_mask), rollup)

    # the stale rollup must disagree with raw (late rows missing)
    stale = caggs.serve_hourly(spark, ev, rollup, cut)
    expected = _direct(ev)
    assert _as_sorted_rows(stale) != _as_sorted_rows(expected)

    # incremental refresh of only the late day
    before = {
        d: os.path.getmtime(os.path.join(rollup, f"day={d}"))
        for d in days[:-1]
        if os.path.isdir(os.path.join(rollup, f"day={d}"))
    }
    caggs.refresh_rollup(spark, ev, rollup, days=[late_day])

    # only the refreshed day's partition directory was rewritten
    for d, mtime in before.items():
        cur = os.path.getmtime(os.path.join(rollup, f"day={d}"))
        if d == late_day:
            assert cur >= mtime
        else:
            assert cur == mtime, f"partition day={d} was rewritten"

    # serve path now equals the direct aggregate of all raw data
    served = caggs.serve_hourly(spark, ev, rollup, cut)
    assert _as_sorted_rows(served) == _as_sorted_rows(expected)


def test_serve_prunes_materialized_partitions(spark, sf_dir, tmp_path):
    from data_pipeline_for_autonomous_vehicles_spark import plans

    ev = load_table(spark, sf_dir, "events")
    rollup = str(tmp_path / "rollup")
    caggs.refresh_rollup(spark, ev, rollup)
    days = sorted(
        r["d"].isoformat()
        for r in ev.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    served = caggs.serve_hourly(spark, ev, rollup, days[-1])
    txt = plans.plan_text(served)
    # the rollup scan carries a partition filter on `day` (pruning), and the
    # raw scan pushes the tail's date predicate
    assert "day#" in txt and "PartitionFilters" in txt
