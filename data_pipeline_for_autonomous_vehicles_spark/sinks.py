"""Batch sinks: the storage layout that replaces the reference's hypertable
chunking + composite indexes (sql/01_schema.sql:22-75, SURVEY.md §4).

The driver's test tables are read-only unpartitioned parquet, so layout
cannot be demonstrated on them in place; this module is the write side any
deployment of the engine uses, and tests/test_sinks.py proves the two
benefits on a real write→read cycle:

  1. date partitioning → partition pruning (time predicates never touch
     other days' files — the hypertable chunk-exclusion equivalent);
  2. within-partition sort on the entity key → parquet row-group min/max
     skipping for per-vehicle scans (the (vehicle_id, time DESC) composite
     index equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PARTITION_COL = "event_date"


def write_time_partitioned(
    df: DataFrame,
    path: str,
    time_col: str = "ts",
    sort_cols: tuple[str, ...] = ("user_id",),
    mode: str = "overwrite",
) -> None:
    """Write `df` date-partitioned on `time_col`, sorted by `sort_cols`
    within each partition.

    repartition on the partition column keeps one task per output date
    (no small-file explosion: without it every task writes every date it
    sees). At very high volume add a bucket column to the repartition to
    spread one hot day over N tasks."""
    (
        df.withColumn(PARTITION_COL, F.to_date(F.col(time_col)))
        .repartition(F.col(PARTITION_COL))
        .sortWithinPartitions(PARTITION_COL, *sort_cols)
        .write.partitionBy(PARTITION_COL)
        .mode(mode)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    key: str,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a bucketed+sorted table on `key` — the co-located-join
    layout for fact tables that are repeatedly joined on the same key.

    Two tables bucketed on their join key with the SAME bucket count
    sort-merge-join with ZERO exchanges: each task reads bucket i of both
    sides (proven in tests/test_sinks.py via plans.audit). At 100 TB this
    is the difference between re-shuffling the fact table on every query
    and shuffling it once at write time; bucket count is chosen so one
    bucket ≈ one task's memory (e.g. 4096 buckets for a 10 TB table).
    """
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode(mode)
        .format("parquet")
        .saveAsTable(table)
    )


def append_stream_partitioned(batch_df: DataFrame, path: str, time_col: str = "ts") -> None:
    """foreachBatch-compatible append variant (streaming sinks, SURVEY §2.9
    R4): same layout, append mode, idempotent per micro-batch under
    checkpointing."""
    write_time_partitioned(batch_df, path, time_col=time_col, mode="append")
