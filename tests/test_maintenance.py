"""Storage maintenance: compaction bin-packs only the partitions that need
it, retention is metadata-only, merge-upsert rewrites only touched days."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_for_autonomous_vehicles_spark import maintenance
from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
from data_pipeline_for_autonomous_vehicles_spark.sinks import (
    PARTITION_COL,
    write_time_partitioned,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _part_dir(path, day):
    return os.path.join(path, f"{PARTITION_COL}={day}")


def _write_fragmented(spark, sf_dir, path, files_per_day=8):
    """Simulate a micro-batch append history: many small files per day."""
    ev = load_table(spark, sf_dir, "events")
    (
        ev.withColumn(PARTITION_COL, F.to_date("ts"))
        .repartition(files_per_day)
        .write.partitionBy(PARTITION_COL)
        .mode("overwrite")
        .parquet(path)
    )
    return ev


def test_compaction_binpacks_selected_days_only(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events")
    ev = _write_fragmented(spark, sf_dir, path)
    before = maintenance.list_partitions(spark, path)
    days = sorted(before)
    assert all(st["files"] > 1 for st in before.values())

    target_day, untouched = days[0], days[1:]
    mtimes = {d: os.path.getmtime(_part_dir(path, d)) for d in untouched}
    # huge target size -> every selected day packs to exactly one file
    plan = maintenance.compact_partitions(
        spark, path, target_file_bytes=1 << 40, days=[target_day]
    )
    assert set(plan) == {target_day} and plan[target_day]["planned"] == 1

    after = maintenance.list_partitions(spark, path)
    assert after[target_day]["files"] == 1
    for d in untouched:
        assert after[d]["files"] == before[d]["files"]
        assert os.path.getmtime(_part_dir(path, d)) == mtimes[d], (
            f"partition {d} was rewritten"
        )
    # data survives byte-for-byte (values, not layout)
    got = spark.read.parquet(path).drop(PARTITION_COL)
    assert _rows(got, ev.columns) == _rows(ev, ev.columns)
    # second run is a no-op: everything already at the planned file count
    assert maintenance.compact_partitions(spark, path, target_file_bytes=1 << 40) != {}
    assert maintenance.compact_partitions(spark, path, target_file_bytes=1 << 40) == {}


def test_retention_drops_old_partitions_without_reading(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events")
    ev = _write_fragmented(spark, sf_dir, path, files_per_day=2)
    days = sorted(maintenance.list_partitions(spark, path))
    cutoff = days[2]
    dropped = maintenance.expire_partitions(spark, path, keep_from=cutoff)
    assert dropped == days[:2]
    assert sorted(maintenance.list_partitions(spark, path)) == days[2:]
    kept = spark.read.parquet(path)
    expected = ev.filter(F.to_date("ts") >= cutoff)
    assert kept.count() == expected.count()


def test_merge_upsert_applies_cdc_and_prunes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events")
    ev = load_table(spark, sf_dir, "events")
    write_time_partitioned(ev, path, time_col="ts", sort_cols=("event_id",))
    days = sorted(maintenance.list_partitions(spark, path))
    day0 = days[0]

    # CDC batch, all on day0: update one row's value, delete another row,
    # insert a brand-new row
    day0_rows = ev.filter(F.to_date("ts") == day0).orderBy("event_id").limit(2).collect()
    upd_row, del_row = day0_rows[0], day0_rows[1]
    new_row = dict(upd_row.asDict(), event_id=999_999_999, value=42.5)
    updates = spark.createDataFrame(
        [
            dict(upd_row.asDict(), value=123.25, _op="U"),
            dict(del_row.asDict(), _op="D"),
            dict(new_row, _op="I"),
        ],
        # fresh StructType: .add() would mutate the DataFrame's cached schema
        schema=T.StructType(list(ev.schema.fields) + [T.StructField("_op", T.StringType())]),
    )

    mtimes = {d: os.path.getmtime(_part_dir(path, d)) for d in days[1:]}
    changed = maintenance.merge_upsert(
        spark, path, updates, key_cols=("event_id",), seq_col="ts", op_col="_op"
    )
    assert changed == [day0]
    for d, mt in mtimes.items():
        assert os.path.getmtime(_part_dir(path, d)) == mt, f"partition {d} rewritten"

    got = spark.read.parquet(path).drop(PARTITION_COL)
    expected = (
        ev.filter(F.col("event_id") != del_row["event_id"])
        .withColumn(
            "value",
            F.when(F.col("event_id") == upd_row["event_id"], F.lit(123.25)).otherwise(
                F.col("value")
            ),
        )
        .unionByName(spark.createDataFrame([new_row], schema=ev.schema))
    )
    assert _rows(got, ev.columns) == _rows(expected, ev.columns)
