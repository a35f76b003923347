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

QUERIES = {"stateful_session_stats": stateful_session_stats}
ORACLES = {"stateful_session_stats": STATEFUL_SESSION_STATS_SQL}
