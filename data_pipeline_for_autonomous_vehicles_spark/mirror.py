"""Local-mode mirrors: SQLite result sink (S11) and catalog bootstrap (S13).

Closes the two SURVEY §2.1 rows previously documented as by-design
omissions:

* **S11 — SQLite mirror** (reference
  ``scripts/run_full_pipeline_local.py:42-64,152-213``): the reference's
  no-Docker mode mirrors its PostgreSQL schema into a local SQLite file —
  ``DELETE FROM`` truncate-on-start, batched inserts, lossy physical
  encodings (booleans → 0/1 INTEGER, timestamps → TEXT; SURVEY §1.3).
  Here that is an **edge sink**, same tier as the CSV export (S10): it
  serves dashboard/export-scale *result* tables (alerts, metric rollups —
  thousands of rows), never the 100 TB fact path, whose write side is the
  partitioned/bucketed parquet layout in ``sinks.py``. Rows stream
  driver-side via ``toLocalIterator`` (one partition in memory at a time,
  never a full ``collect()``) and land in pages of 500 — the same page
  size as the reference's ``execute_values`` (``src/storage/db.py:89``).

* **S13 — DB bootstrap** (reference ``src/storage/db.py:43-64``): the
  reference checks ``pg_database`` and creates its database if absent.
  Spark equivalent: probe the session catalog and ``CREATE DATABASE IF
  NOT EXISTS`` — metastore-agnostic (works against the default in-memory
  catalog in tests and against Hive/Glue in deployment).
"""

from __future__ import annotations

import datetime as _dt
import json
import sqlite3
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

PAGE_SIZE = 500  # matches reference execute_values page_size (db.py:89)

# Spark simpleString type → SQLite column affinity. Anything absent maps
# to TEXT via _encode (the reference's SQLite mode is explicitly lossy —
# SURVEY §1.3 "the logical model tolerates lossy physical encodings").
_AFFINITY = {
    "boolean": "INTEGER",
    "tinyint": "INTEGER",
    "smallint": "INTEGER",
    "int": "INTEGER",
    "bigint": "INTEGER",
    "float": "REAL",
    "double": "REAL",
    "string": "TEXT",
    "timestamp": "TEXT",
    "timestamp_ntz": "TEXT",
    "date": "TEXT",
}


def _encode(v):
    """Mirror the reference's SQLite degradations: bool → 0/1, timestamp →
    '%Y-%m-%d %H:%M:%S' TEXT (run_full_pipeline_local.py:44-64), date →
    ISO TEXT; containers → JSON TEXT."""
    if isinstance(v, bool):  # must precede the int check (bool ⊂ int)
        return int(v)
    if v is None or isinstance(v, (int, float, str, bytes)):
        return v
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict)):
        return json.dumps(v, default=str)
    return str(v)


def mirror_to_sqlite(
    df: DataFrame,
    db_path: str,
    table: str,
    truncate: bool = True,
    page_size: int = PAGE_SIZE,
) -> int:
    """Mirror a (result-sized) DataFrame into a SQLite table; returns rows
    written. Truncate-on-start by default, exactly like the reference local
    mode (`DELETE FROM` at run_full_pipeline_local.py:60-64). Driver-side
    by construction — this is the S10/S11 edge tier, not a fact-table sink.
    """
    cols = df.schema.fields
    decl = ", ".join(
        f'"{f.name}" {_AFFINITY.get(f.dataType.simpleString(), "TEXT")}' for f in cols
    )
    placeholders = ", ".join("?" for _ in cols)
    insert = f'INSERT INTO "{table}" VALUES ({placeholders})'

    conn = sqlite3.connect(db_path)
    try:
        conn.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({decl})')
        if truncate:
            conn.execute(f'DELETE FROM "{table}"')
        n = 0
        page: list[tuple] = []
        # toLocalIterator: one partition resident at a time; bounded driver
        # memory even if the caller passes something larger than intended.
        for row in df.toLocalIterator():
            page.append(tuple(_encode(v) for v in row))
            if len(page) >= page_size:
                conn.executemany(insert, page)
                n += len(page)
                page.clear()
        if page:
            conn.executemany(insert, page)
            n += len(page)
        conn.commit()
        return n
    finally:
        conn.close()


def read_sqlite_table(db_path: str, table: str) -> list[tuple]:
    """Test/verification helper: read a mirrored table back, ordered by
    all columns for deterministic comparison."""
    conn = sqlite3.connect(db_path)
    try:
        cur = conn.execute(f'SELECT * FROM "{table}"')
        # None is unorderable against str/int in Python 3; sort NULLs first
        # per cell so nullable result columns don't crash the comparison
        return sorted(
            cur.fetchall(),
            key=lambda row: tuple((v is not None, v) for v in row),
        )
    finally:
        conn.close()


def ensure_database(spark: SparkSession, name: str) -> bool:
    """S13: create `name` in the session catalog if absent; True iff it was
    created by this call (the reference returns the same signal by checking
    pg_database before CREATE — db.py:43-64)."""
    existed = spark.catalog.databaseExists(name)
    if not existed:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS `{name}`")
    return not existed


def mirror_many(
    spark: SparkSession,
    frames: Iterable[tuple[str, DataFrame]],
    db_path: str,
) -> dict[str, int]:
    """Mirror several result tables in one pass (the reference local mode
    exports its three tables plus one aggregate the same way,
    run_full_pipeline_local.py:218-245)."""
    return {table: mirror_to_sqlite(df, db_path, table) for table, df in frames}
