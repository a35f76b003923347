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


def test_purge_entities_rewrites_only_affected_partitions(spark, sf_dir, tmp_path):
    """GDPR/opt-out purge: (a) every row of the opted-out users is gone and
    nobody else's rows are touched; (b) partitions without any opted-out
    row keep their files byte-identical (no rewrite); (c) a partition whose
    rows ALL belong to opted-out users is deleted outright (the dynamic-
    overwrite blind spot); (d) re-running is a no-op (idempotent)."""
    import glob as _glob
    import os

    from pyspark.sql import functions as F

    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.maintenance import purge_entities
    from data_pipeline_for_autonomous_vehicles_spark.sinks import write_time_partitioned

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events")
    # craft one day fully owned by user 1: day 1 keeps only user 1's rows
    days = sorted(r["d"] for r in ev.select(F.to_date("ts").alias("d")).distinct().collect())
    solo_day = days[1]
    ev = ev.filter((F.to_date("ts") != F.lit(solo_day)) | (F.col("user_id") == 1))
    write_time_partitioned(ev, path)

    def _snapshot():
        return {
            p: os.path.getmtime(p)
            for p in _glob.glob(f"{path}/event_date=*/part-*.parquet")
        }

    before = _snapshot()
    opt_out = spark.createDataFrame([(1,), (3,)], "user_id bigint")
    # restrict user 3's presence map before the purge for assertion (c)/(a)
    affected_days = {
        r["d"].isoformat()
        for r in ev.filter(F.col("user_id").isin(1, 3))
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .collect()
    }

    rewritten = purge_entities(spark, path, opt_out)
    assert set(rewritten) == affected_days

    back = spark.read.parquet(path)
    # (a) purged users gone, everyone else intact
    assert back.filter(F.col("user_id").isin(1, 3)).count() == 0
    expect_left = ev.filter(~F.col("user_id").isin(1, 3)).count()
    assert back.count() == expect_left
    # (c) the fully-owned day is gone from disk entirely
    assert not os.path.isdir(f"{path}/event_date={solo_day}")
    # (b) untouched partitions' files were not rewritten
    after = _snapshot()
    for p, mtime in before.items():
        day = p.split("event_date=")[1].split("/")[0]
        if day not in affected_days:
            assert p in after and after[p] == mtime, p
    # (d) idempotent re-run: nothing affected, nothing rewritten
    assert purge_entities(spark, path, opt_out) == []
    assert _snapshot() == after
    # (e) no staging/trash residue after a clean run
    assert not _glob.glob(f"{path}/_purge_*")


def test_purge_entities_opt_out_column_selection(spark, sf_dir, tmp_path):
    """The opt-out frame's id column is selected BY NAME: a multi-column
    consent export with a key_col column joins on that column (regardless
    of position), and a multi-column export WITHOUT key_col raises instead
    of silently purging on the wrong values (ADVICE r3 medium)."""
    import pytest
    from pyspark.sql import functions as F

    from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
    from data_pipeline_for_autonomous_vehicles_spark.maintenance import purge_entities
    from data_pipeline_for_autonomous_vehicles_spark.sinks import write_time_partitioned

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events")
    write_time_partitioned(ev, path)

    # multi-column export with key_col NOT first: must purge user 2 only —
    # the first column (opted_out_at ~ a timestamp-like number) would be a
    # silent no-op join under the old first-column rule
    opt_out = spark.createDataFrame(
        [(1700000000, 2)], "opted_out_at bigint, user_id bigint"
    )
    purge_entities(spark, path, opt_out)
    back = spark.read.parquet(path)
    assert back.filter(F.col("user_id") == 2).count() == 0
    assert back.filter(F.col("user_id") == 1).count() > 0

    # multi-column export without key_col: hard error, nothing touched
    bad = spark.createDataFrame([(1700000000, 3)], "opted_out_at bigint, uid bigint")
    n_before = back.count()
    with pytest.raises(ValueError, match="user_id"):
        purge_entities(spark, path, bad)
    assert spark.read.parquet(path).count() == n_before
