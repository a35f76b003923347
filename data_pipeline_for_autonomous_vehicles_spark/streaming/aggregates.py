"""Watermarked streaming aggregates — the idiomatic-Spark upgrade the
reference lacks (SURVEY.md §2.9: "no watermarks, no event-time windows").

Each streaming aggregate here has an exact batch/ANSI twin so the driver's
DuckDB oracle can verify the *semantics*, not just the row count:
  - tumbling event-time window counts ≡ date_trunc bucket GROUP BY
  - session_window(gap) session counts ≡ the lag/cumsum sessionization
    (operators.windows.user_sessions)

Both run with Trigger.AvailableNow into a memory sink in COMPLETE mode, so
every window — including the final, not-yet-watermark-closed one — is
emitted and the result equals the batch computation over the same files.

Scale: streaming state is keyed on (window, key); the watermark bounds state
size — with a 1-hour watermark and 1-day windows, state holds ≤2 open
windows per key regardless of input volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timeseries import BACKTEST_DAYS
from .rules import stream_events

_SEQ = 0


def _run_to_memory(stream_df: DataFrame, mode: str = "complete") -> DataFrame:
    global _SEQ
    _SEQ += 1
    name = f"stream_agg_{_SEQ}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def streaming_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time windows with a 1-hour watermark:
    count + exact value sum per (day, event_type)."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")).cast(
                    "double"
                )
                / 100.0
            ).alias("sum_value"),
        )
    )
    out = _run_to_memory(agg)
    return out.select(
        F.to_date(F.col("win.start")).alias("day"),
        "event_type",
        "n_events",
        "sum_value",
    ).orderBy("day", "event_type")


STREAMING_DAILY_COUNTS_SQL = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


def streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, 30 min) per user — Spark's native gap-based
    sessionization. Emits per-user session count + total events; must equal
    the batch lag/cumsum sessionization (operators.windows.user_sessions)."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    out = _run_to_memory(agg)
    return (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("total_events"),
        )
        .orderBy("user_id")
    )


STREAMING_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         -- session_window splits when the exact event-time gap is >= the
         -- 30-min gap (new event lands at/after the previous session end);
         -- epoch() is fractional DOUBLE, matching micros precision
         CASE WHEN prev_ts IS NULL OR (epoch(ts) - epoch(prev_ts)) >= 1800
              THEN 1 ELSE 0 END AS new_session
  FROM (
    SELECT user_id, ts, event_id,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events) t)
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS total_events
FROM flagged
GROUP BY user_id
ORDER BY user_id
"""

_SLIDE_US = 6 * 3600 * 1_000_000  # 6 hours
_SLIDE_PER_WINDOW = 4  # 1-day window / 6-hour slide


def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows: 1-day span advancing every 6 hours, so
    each event lands in exactly 4 overlapping windows. The ANSI twin
    expands each event into its 4 epoch-aligned window starts — the same
    replication Spark's window() generator performs physically."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.window("ts", "1 day", "6 hours").alias("win")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")).cast(
                "double"
            )
            / 100.0
        ).alias("sum_value"),
    )
    out = _run_to_memory(agg)
    return out.select(
        F.col("win.start").alias("win_start"), "n_events", "sum_value"
    ).orderBy("win_start")


STREAMING_SLIDING_SQL = f"""
WITH expanded AS (
  SELECT make_timestamp((epoch_us(ts) // {_SLIDE_US}) * {_SLIDE_US} - i * {_SLIDE_US})
           AS win_start,
         value
  FROM events, generate_series(0, {_SLIDE_PER_WINDOW - 1}) AS g(i))
SELECT win_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_value
FROM expanded
GROUP BY win_start
ORDER BY win_start
"""

def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once delivery repair: the event stream unioned with itself
    (every record delivered twice, the duplicate pattern a crashing
    producer/consumer creates — SURVEY.md §2.9 R5) is deduplicated by key
    with `dropDuplicatesWithinWatermark("event_id")`, then counted per
    event type. Counts must equal the single-delivery batch GROUP BY.

    Scale: dedup state is hash-partitioned by event_id and holds only keys
    newer than `watermark - delay`, so state size is bounded by the
    duplicate-arrival horizon (1 hour here), not by stream length —
    unbounded-retention dropDuplicates() would OOM on an infinite stream.
    """
    doubled = stream_events(spark, sf_dir).union(stream_events(spark, sf_dir))
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = _run_to_memory(deduped, mode="append")
    return (
        out.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


STREAMING_DEDUP_SQL = """
SELECT event_type, COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def streaming_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static anomaly gate: each event is enriched (broadcast
    stream-static join) with its (event_type, ISO weekday, hour-of-day)
    seasonal baseline — derived from the TRAINING window only (everything
    before the trailing BACKTEST_DAYS, the same holdout convention as
    forecast_backtest_mape) so an evaluated hour never contributes to its
    own baseline (r4 ADVICE: the old full-table baseline let a 3× hour
    damp its own gate). Hourly tumbling-window counts are flagged 'high'
    when the hour runs > 2× its baseline mean, 'low' under half, 'novel'
    when the (type, weekday, hour) cell never occurred in training, else
    'normal'. The flag is exact integer cross-multiplication (n·n_days vs
    2·s), never a float rate.

    This is the on-arrival twin of forecast_backtest_mape's offline
    check: same frozen baseline, evaluated inside the stream — the
    production shape, where the baseline snapshot predates every arriving
    hour by construction. Scale: the baseline is |types|·168 rows
    (broadcast); streaming state is one (window, type) count per open
    hour, watermark-bounded.
    """
    from ..catalog import load_table

    ev_b = load_table(spark, sf_dir, "events")
    hmax = ev_b.agg(F.max(F.to_date("ts")).alias("hmax"))
    train = ev_b.crossJoin(F.broadcast(hmax)).where(
        F.datediff(F.col("hmax"), F.to_date("ts")) >= BACKTEST_DAYS
    )
    days = (
        train.select(F.to_date("ts").alias("day"))
        .distinct()
        .select((F.expr("weekday(day)") + F.lit(1)).cast("long").alias("dow_iso"))
        .groupBy("dow_iso")
        .agg(F.count(F.lit(1)).alias("n_days"))
    )
    cells = (
        train.select(
            "event_type",
            (F.expr("weekday(ts)") + F.lit(1)).cast("long").alias("dow_iso"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .groupBy("event_type", "dow_iso", "hod")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    base = cells.join(days, "dow_iso")

    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    enriched = ev.select(
        "ts",
        "event_type",
        (F.expr("weekday(ts)") + F.lit(1)).cast("long").alias("dow_iso"),
        F.hour("ts").cast("long").alias("hod"),
    ).join(F.broadcast(base), ["event_type", "dow_iso", "hod"], "left")
    agg = enriched.groupBy(
        F.window("ts", "1 hour").alias("win"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("s").alias("s"),
        F.min("n_days").alias("nd"),
    )
    out = _run_to_memory(agg)
    flag = (
        F.when(F.col("s").isNull(), "novel")
        .when(F.col("n_events") * F.col("nd") > F.lit(2) * F.col("s"), "high")
        .when(F.lit(2) * F.col("n_events") * F.col("nd") < F.col("s"), "low")
        .otherwise("normal")
    )
    from ..functions.scalars import round_half_up

    return out.select(
        F.col("win.start").alias("win_start"),
        "event_type",
        "n_events",
        round_half_up(
            F.col("s").cast("double") / F.col("nd").cast("double"), 4
        ).alias("baseline"),
        flag.alias("flag"),
    )  # no final orderBy: scaling output, order-insensitive gate (guide §2.4)


STREAMING_SEASONAL_SQL = f"""
WITH horizon AS (SELECT MAX(CAST(ts AS DATE)) AS hmax FROM events),
train AS (
  SELECT e.* FROM events e CROSS JOIN horizon
  WHERE date_diff('day', CAST(ts AS DATE), hmax) >= {BACKTEST_DAYS}),
days AS (
  SELECT isodow(day) AS dow_iso, COUNT(*) AS n_days
  FROM (SELECT DISTINCT CAST(ts AS DATE) AS day FROM train) t
  GROUP BY 1),
cells AS (
  SELECT event_type, isodow(ts) AS dow_iso, EXTRACT(hour FROM ts) AS hod,
         COUNT(*) AS s
  FROM train GROUP BY 1, 2, 3),
hourly AS (
  SELECT date_trunc('hour', ts) AS win_start, event_type,
         isodow(ts) AS dow_iso, EXTRACT(hour FROM ts) AS hod,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3, 4)
SELECT h.win_start, h.event_type, h.n AS n_events,
       CAST(FLOOR(CAST(c.s AS DOUBLE) / CAST(d.n_days AS DOUBLE) * 10000.0 + 0.5)
            AS DOUBLE) / 10000.0 AS baseline,
       CASE WHEN c.s IS NULL THEN 'novel'
            WHEN h.n * d.n_days > 2 * c.s THEN 'high'
            WHEN 2 * h.n * d.n_days < c.s THEN 'low'
            ELSE 'normal' END AS flag
FROM hourly h
LEFT JOIN cells c USING (event_type, dow_iso, hod)
LEFT JOIN days d USING (dow_iso)
ORDER BY win_start, event_type
"""


QUERIES = {
    "streaming_daily_event_counts": streaming_daily_event_counts,
    "streaming_seasonal_anomalies": streaming_seasonal_anomalies,
    "streaming_user_sessions": streaming_user_sessions,
    "streaming_sliding_counts": streaming_sliding_counts,
    "streaming_dedup_counts": streaming_dedup_counts,
}

ORACLES = {
    "streaming_daily_event_counts": STREAMING_DAILY_COUNTS_SQL,
    "streaming_seasonal_anomalies": STREAMING_SEASONAL_SQL,
    "streaming_user_sessions": STREAMING_SESSIONS_SQL,
    "streaming_sliding_counts": STREAMING_SLIDING_SQL,
    "streaming_dedup_counts": STREAMING_DEDUP_SQL,
}
