"""S11 SQLite mirror + S13 catalog bootstrap (reference
scripts/run_full_pipeline_local.py:42-64,152-213 and src/storage/db.py:43-64)."""

from __future__ import annotations

import datetime as dt
import sqlite3

from pyspark.sql import Row

from data_pipeline_for_autonomous_vehicles_spark.mirror import (
    ensure_database,
    mirror_many,
    mirror_to_sqlite,
    read_sqlite_table,
)


def _alerts_df(spark):
    return spark.createDataFrame(
        [
            Row(
                time=dt.datetime(2024, 1, 1, 12, 0, 5),
                vehicle_id=3,
                alert_type="Speed Violation",
                alert_message="Vehicle 3 exceeded speed limit (68 km/h)",
                acked=False,
            ),
            Row(
                time=dt.datetime(2024, 1, 1, 12, 1, 0),
                vehicle_id=7,
                alert_type="Low Battery",
                alert_message="Vehicle 7 battery at 15.0%",
                acked=True,
            ),
        ]
    )


def test_mirror_roundtrip_with_reference_degradations(spark, tmp_path):
    """Timestamps land as '%Y-%m-%d %H:%M:%S' TEXT and booleans as 0/1 —
    the exact SQLite degradations of the reference local mode (SURVEY §1.3)."""
    db = str(tmp_path / "mirror.db")
    n = mirror_to_sqlite(_alerts_df(spark), db, "alerts")
    assert n == 2
    rows = read_sqlite_table(db, "alerts")
    assert rows == [
        ("2024-01-01 12:00:05", 3, "Speed Violation", "Vehicle 3 exceeded speed limit (68 km/h)", 0),
        ("2024-01-01 12:01:00", 7, "Low Battery", "Vehicle 7 battery at 15.0%", 1),
    ]
    # declared affinities mirror the schema (bool/int -> INTEGER, ts -> TEXT)
    conn = sqlite3.connect(db)
    cols = {r[1]: r[2] for r in conn.execute("PRAGMA table_info(alerts)")}
    conn.close()
    assert cols["time"] == "TEXT"
    assert cols["vehicle_id"] == "INTEGER"
    assert cols["acked"] == "INTEGER"


def test_mirror_truncates_on_start_like_reference(spark, tmp_path):
    """DELETE FROM truncate-on-start (run_full_pipeline_local.py:60-64):
    re-mirroring replaces, append mode accumulates."""
    db = str(tmp_path / "mirror.db")
    df = _alerts_df(spark)
    mirror_to_sqlite(df, db, "alerts")
    mirror_to_sqlite(df, db, "alerts")
    assert len(read_sqlite_table(db, "alerts")) == 2
    mirror_to_sqlite(df, db, "alerts", truncate=False)
    assert len(read_sqlite_table(db, "alerts")) == 4


def test_mirror_pages_bounded(spark, tmp_path):
    """Row streaming with a small page size writes everything exactly once."""
    db = str(tmp_path / "mirror.db")
    df = spark.range(0, 137).withColumnRenamed("id", "k")
    n = mirror_to_sqlite(df, db, "ks", page_size=10)
    assert n == 137
    assert [r[0] for r in read_sqlite_table(db, "ks")] == list(range(137))


def test_mirror_many(spark, tmp_path):
    db = str(tmp_path / "mirror.db")
    counts = mirror_many(
        spark,
        [("alerts", _alerts_df(spark)), ("ks", spark.range(0, 5))],
        db,
    )
    assert counts == {"alerts": 2, "ks": 5}
    assert len(read_sqlite_table(db, "ks")) == 5


def test_ensure_database_bootstrap(spark):
    """S13: created on first call, reported as pre-existing on the second
    (the reference's pg_database probe then CREATE, db.py:43-64)."""
    name = "graft_boot_test"
    spark.sql(f"DROP DATABASE IF EXISTS `{name}`")
    try:
        assert ensure_database(spark, name) is True
        assert spark.catalog.databaseExists(name)
        assert ensure_database(spark, name) is False
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS `{name}`")


def test_mirror_handles_nulls(spark, tmp_path):
    """Nullable result columns must mirror and read back without the
    None-vs-value ordering TypeError (NULLs sort first per cell)."""
    db = str(tmp_path / "mirror.db")
    df = spark.createDataFrame(
        [Row(k=1, label="a"), Row(k=2, label=None), Row(k=3, label="b")]
    )
    assert mirror_to_sqlite(df, db, "t") == 3
    rows = read_sqlite_table(db, "t")
    assert (2, None) in rows and len(rows) == 3
