"""Slowly-changing-dimension (SCD type 2) history derivation.

The reference keeps only the *latest* per-entity state (DISTINCT ON —
src/metrics/queries.py:80-83) and appends raw events. The standard
warehouse companion is the SCD2 view: collapse an append-only event stream
into validity intervals `[valid_from, valid_to)` per entity state, with the
open interval marking the current state. This is pure window algebra —
lag() to detect state changes, lead() to close intervals — one shuffle on
the entity key, no self-joins.

Scale: both queries are a single window pass partitioned by `user_id`
(millions of independent partitions at fleet scale) followed by a
low-cardinality hash-agg or a per-user filter — the same
partition-by-entity shape every other per-entity operator in this engine
uses, so a corpus bucketed by user_id runs it shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import round_half_up, sql_round_half_up


def _intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events → SCD2 intervals: one row per (user, consecutive state run)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "ts", "event_id", F.col("event_type").alias("state"))
        .withColumn("prev_state", F.lag("state").over(w))
        .filter(F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )


_SQL_INTERVALS = """
  SELECT user_id, state, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM (
    SELECT user_id, ts, event_id, event_type AS state,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_state
    FROM events) c
  WHERE prev_state IS NULL OR prev_state <> state
"""


def scd2_state_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per state: how many SCD2 intervals it opened, how many are current
    (open-ended), and the total closed-interval dwell time in hours — the
    aggregate shape of 'how long do users sit in each state'."""
    iv = _intervals(spark, sf_dir)
    dur_us = F.unix_micros("valid_to") - F.unix_micros("valid_from")
    return (
        iv.groupBy("state")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.count(F.when(F.col("valid_to").isNull(), F.lit(1))).alias("n_current"),
            round_half_up(
                F.sum(dur_us).cast("double") / F.lit(3.6e9), 2
            ).alias("closed_hours"),
        )
        .orderBy("state")
    )


_SCD2_DURATIONS_SQL = f"""
WITH iv AS ({_SQL_INTERVALS})
SELECT state,
       COUNT(*) AS n_intervals,
       COUNT(CASE WHEN valid_to IS NULL THEN 1 END) AS n_current,
       {sql_round_half_up("CAST(SUM(date_diff('microsecond', valid_from, valid_to)) AS DOUBLE) / 3600000000.0", 2)} AS closed_hours
FROM iv
GROUP BY state
ORDER BY state
"""


def scd2_current_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The current-state dimension view: one row per user — the state whose
    interval is still open, and when it began (the SCD2 equivalent of the
    reference's DISTINCT ON latest-telemetry query, W1)."""
    iv = _intervals(spark, sf_dir)
    return (
        iv.filter(F.col("valid_to").isNull())
        .select("user_id", "state", "valid_from")
        .orderBy("user_id")
    )


_SCD2_CURRENT_SQL = f"""
WITH iv AS ({_SQL_INTERVALS})
SELECT user_id, state, valid_from
FROM iv
WHERE valid_to IS NULL
ORDER BY user_id
"""


QUERIES = {
    "scd2_state_durations": scd2_state_durations,
    "scd2_current_states": scd2_current_states,
}

ORACLES = {
    "scd2_state_durations": _SCD2_DURATIONS_SQL,
    "scd2_current_states": _SCD2_CURRENT_SQL,
}
