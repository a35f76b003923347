"""Layout tests (pkg/sinks.py): prove partition pruning and row-group
skipping actually engage on the written layout — the SCALE.md §2 claims as
executable assertions."""

from __future__ import annotations

import contextlib
import glob
import io
import os

from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
from data_pipeline_for_autonomous_vehicles_spark.sinks import write_time_partitioned


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_round_trip_and_pruning(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_parts")
    write_time_partitioned(ev, path)

    # one directory per day, hive-style
    days = sorted(os.path.basename(p) for p in glob.glob(f"{path}/event_date=*"))
    assert len(days) >= 5 and days[0].startswith("event_date=")

    back = spark.read.parquet(path)
    assert back.count() == ev.count()

    # a one-day predicate must prune partitions at plan time
    one_day = back.filter(F.col("event_date") == "2024-01-05")
    plan = _plan(one_day)
    assert "PartitionFilters" in plan and "event_date" in plan
    # the filter is NOT a post-scan data filter: it never appears as a
    # parquet PushedFilter (it's resolved against directories instead)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert all("event_date" not in l for l in pushed)
    day_count = one_day.count()
    assert 0 < day_count < back.count()


def test_entity_predicate_pushed_on_sorted_layout(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_sorted")
    write_time_partitioned(ev, path)
    back = spark.read.parquet(path)
    plan = _plan(back.filter(F.col("user_id") == 3))
    # entity predicate reaches the parquet reader → row-group min/max
    # skipping applies on the within-partition-sorted files
    assert any(
        "PushedFilters" in l and "user_id" in l for l in plan.splitlines()
    ), plan
