"""Custom stateful streaming operator: applyInPandasWithState.

`session_window` (streaming/aggregates.py) covers gap sessionization, but
composite per-session statistics — number of sessions, the *longest*
session, events in the *current* open session — need a hand-rolled state
machine. The reference's only stateful construct is the producer's
per-vehicle dict random walk (src/ingestion/producer.py:148-164, SURVEY.md
§2.9 R7); this is that pattern upgraded to Spark's managed streaming state:
per-key mutable state, checkpointed, with the operator expressed as an
Arrow-batched pandas function.

Semantics (per user, 30-minute gap, matching STREAMING_SESSIONS_SQL):
  n_sessions          sessions started (gap >= 1800 s opens a new one)
  longest_session     max events in any one session
  total_events        all events seen

Scale: state is one 4-tuple per user; Arrow batches carry each group's
micro-batch slice. Within a micro-batch the slice is sorted by event time
(cheap: per-group pandas sort); across micro-batches the state carries
(last_ts, current run length), so the operator is correct for any batch
split as long as batches arrive in event-time order per key — guaranteed
here by the single-file AvailableNow source, and in production by
watermark-ordered replay from the checkpoint.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from .rules import stream_events

GAP_SECONDS = 1800.0

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("longest_session", LongType()),
        StructField("total_events", LongType()),
    ]
)

# state: (last_ts_epoch, cur_len, n_sessions, longest, total)
_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", DoubleType()),
        StructField("cur_len", LongType()),
        StructField("n_sessions", LongType()),
        StructField("longest", LongType()),
        StructField("total", LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events into the per-user session state."""
    if state.exists:
        last_ts, cur_len, n_sessions, longest, total = state.get
    else:
        last_ts, cur_len, n_sessions, longest, total = (None, 0, 0, 0, 0)

    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts in pdf["ts"]:
            t = ts.timestamp()
            if last_ts is None or (t - last_ts) >= GAP_SECONDS:
                n_sessions += 1
                cur_len = 1
            else:
                cur_len += 1
            longest = max(longest, cur_len)
            last_ts = t
            total += 1

    state.update((last_ts, cur_len, n_sessions, longest, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_sessions": [n_sessions],
            "longest_session": [longest],
            "total_events": [total],
        }
    )


def stateful_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite session statistics via applyInPandasWithState over the
    bounded events stream (Trigger.AvailableNow, update mode). The memory
    sink holds one row per (user, micro-batch); the last row per user is
    the final state — selected by max total_events (monotone in batches).
    """
    ev = stream_events(spark, sf_dir).select("user_id", "ts", "event_id")
    stats = ev.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = "stateful_session_stats_sink"
    q = (
        stats.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    out = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.desc("total_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_sessions", "longest_session", "total_events")
        .orderBy("user_id")
    )


STATEFUL_SESSION_STATS_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL OR (epoch(ts) - epoch(prev_ts)) >= 1800
              THEN 1 ELSE 0 END AS new_session
  FROM (
    SELECT user_id, ts, event_id,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events) t),
sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged),
per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM sessions GROUP BY user_id, session_id)
SELECT user_id,
       COUNT(*) AS n_sessions,
       MAX(n_events) AS longest_session,
       CAST(SUM(n_events) AS BIGINT) AS total_events
FROM per_session
GROUP BY user_id
ORDER BY user_id
"""

# --- event-time timer: expired-session detector ------------------------------
#
# The timer half of the stateful API that the gap-session operators above
# don't exercise: EventTimeTimeout. A user's state arms a timer at
# last_seen + EXPIRY; when the event-time WATERMARK passes the deadline the
# group is invoked with hasTimedOut=True, emits one expiry record, and its
# state is removed — the abandoned-cart / silent-device alert pattern, with
# state GC driven by the watermark rather than by data arrival. On the
# bounded AvailableNow run, timers fire in the engine's closing no-data
# micro-batch against the final watermark (max event time − delay), which
# makes the result exactly SQL-expressible: the users whose last event
# precedes the final watermark by more than EXPIRY.

EXPIRY_S = 6 * 3600  # silence that counts as an expired session
WM_DELAY_S = 600  # watermark delay (late-data allowance)

_EXP_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("last_seen_us", LongType()),
        StructField("events_before_expiry", LongType()),
    ]
)

_EXP_STATE_SCHEMA = StructType(
    [StructField("last_us", LongType()), StructField("total", LongType())]
)


def _expire_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        last_us, total = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "last_seen_us": [last_us],
                "events_before_expiry": [total],
            }
        )
        return
    last_us, total = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        total += len(pdf)
        last_us = max(last_us, max(int(t.value) // 1000 for t in pdf["ts"]))
    state.update((last_us, total))
    # arm the timer at last_seen + EXPIRY (ms granularity — the watermark's);
    # the update path emits nothing — expiry rows come only from the timer
    state.setTimeoutTimestamp(last_us // 1000 + EXPIRY_S * 1000)


def streaming_expired_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users whose session expired: no events for EXPIRY_S before the final
    watermark. Emitted by the EventTimeTimeout timer, not by data arrival."""
    ev = (
        stream_events(spark, sf_dir)
        .select("user_id", "ts")
        .withWatermark("ts", f"{WM_DELAY_S} seconds")
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _expire_update,
        outputStructType=_EXP_OUT_SCHEMA,
        stateStructType=_EXP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    name = "streaming_expired_sessions_sink"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("user_id")


# The engine's timer rule on the closing no-data batch: a timer fires iff
# its deadline < final watermark, where the watermark is ms-truncated
# max event time minus the delay.
STREAMING_EXPIRED_SESSIONS_SQL = f"""
WITH per_user AS (
  SELECT user_id, CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_seen_us,
         COUNT(*) AS events_before_expiry
  FROM events GROUP BY user_id),
wm AS (
  SELECT CAST(MAX(epoch_us(ts)) AS BIGINT) // 1000 - {WM_DELAY_S * 1000} AS wm_ms
  FROM events)
SELECT user_id, last_seen_us, events_before_expiry
FROM per_user CROSS JOIN wm
WHERE last_seen_us // 1000 + {EXPIRY_S * 1000} < wm_ms
ORDER BY user_id
"""

QUERIES = {
    "stateful_session_stats": stateful_session_stats,
    "streaming_expired_sessions": streaming_expired_sessions,
}
ORACLES = {
    "stateful_session_stats": STATEFUL_SESSION_STATS_SQL,
    "streaming_expired_sessions": STREAMING_EXPIRED_SESSIONS_SQL,
}
