"""Custom stateful streaming operator on Spark 4's transformWithState API.

`stateful.py` exercises the original `applyInPandasWithState`; this module
covers its successor, `transformWithStateInPandas` (Spark 4.0+,
SPARK-46815 "arbitrary stateful processing v2"): a `StatefulProcessor`
class with named, schema'd state variables managed by the state store —
the API a production engine would standardize on for custom operators
(typed ValueState/ListState/MapState, timers, TTL, initial state).

The operator is an **online per-user outlier counter** — the streaming
twin of the batch z-score family (`operators/anomaly.py`): for each event
in (ts, event_id) order, flag it if its value exceeds
mean + 2·σ of all the user's PRIOR events (population moments, cents
fixed-point), with a warmup of MIN_PRIOR prior events before any
flagging. Moments accumulate in a ValueState of exact integer sums
(n, Σcents, Σcents²), so the result is independent of micro-batch
boundaries and bit-reproducible against the ANSI running-window twin:
every float in the threshold (division, subtraction, sqrt, multiply-add)
is derived from the same exact integers in both engines, and IEEE-754
makes those operations deterministic.

Scale: state is three 64-bit integers per user (Σcents² ≤ ~1e16 for 1e6
events of ≤1e5 cents — no overflow); each micro-batch ships one Arrow
batch per key group. Reference parity anchor: the producer's per-vehicle
dict state machine (src/ingestion/producer.py:148-164) is the pattern
being upgraded, as in `stateful.py`.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StructField, StructType

from .rules import stream_events

MIN_PRIOR = 5
SIGMAS = 2.0


def _tws_available() -> bool:
    """transformWithState's Python worker speaks protobuf to the state
    server; without the `protobuf` package the driver worker crashes at
    init (observed: ImportError in StateMessage_pb2). Gate on the import
    so the operator degrades to the v1 API instead of failing."""
    try:  # pragma: no cover - environment probe
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_flagged", LongType()),
    ]
)

_MOMENTS_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", LongType()),
        StructField("q", LongType()),
        StructField("flagged", LongType()),
    ]
)


def _fold(moments: tuple, cents_in_order) -> tuple:
    """The shared state machine: fold ordered cent values into exact
    integer moments, flagging > mean+2σ of the PRIOR events. Used by both
    the v2 StatefulProcessor and the v1 applyInPandasWithState fallback,
    so the two paths are semantically identical by construction."""
    n, s, q, flagged = moments
    for c in cents_in_order:
        c = int(c)
        if n >= MIN_PRIOR:
            mean = s / n
            var = q / n - mean * mean
            if c > mean + SIGMAS * math.sqrt(max(var, 0.0)):
                flagged += 1
        n += 1
        s += c
        q += c * c
    return n, s, q, flagged


class OnlineOutlierProcessor(StatefulProcessor):
    """Sequential fold over each user's events: flag value_cents >
    mean_prior + 2·σ_prior once MIN_PRIOR prior events exist, then fold
    the event into the exact integer moments."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._moments = handle.getValueState("moments", _MOMENTS_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        got = self._moments.get() if self._moments.exists() else None
        pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
        n, s, q, flagged = _fold(got if got is not None else (0, 0, 0, 0), pdf["cents"])
        self._moments.update((n, s, q, flagged))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "n_flagged": [flagged]}
        )

    def close(self) -> None:
        pass


def _update_v1(key: tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState twin of OnlineOutlierProcessor (same _fold).

    Concatenate ALL of this micro-batch's Arrow chunks BEFORE the single
    sort: a large key group arrives as multiple chunks in arbitrary order
    (> arrow.maxRecordsPerBatch rows), and sorting each chunk separately
    would fold late-timestamp rows of an early chunk before earlier rows
    of a later chunk — diverging from the v2 processor and the oracle."""
    moments = state.get if state.exists else (0, 0, 0, 0)
    pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    moments = _fold(moments, pdf["cents"])
    state.update(moments)
    n, _s, _q, flagged = moments
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "n_flagged": [flagged]})


def streaming_online_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the processor over the bounded events stream
    (Trigger.AvailableNow, update mode) and return the final per-user row.

    transformWithState requires the RocksDB state store provider; set it
    for the run and restore the previous provider after (the same
    scoped-conf pattern as the exactly-once sink)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = (
        stream_events(spark, sf_dir)
        .select(
            "user_id",
            "ts",
            "event_id",
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    if _tws_available():
        stats = ev.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=OnlineOutlierProcessor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
        spark.conf.set(
            provider_key,
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    else:
        from pyspark.sql.streaming.state import GroupStateTimeout

        stats = ev.groupBy("user_id").applyInPandasWithState(
            _update_v1,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_MOMENTS_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    name = "streaming_online_outliers_sink"
    try:
        q = (
            stats.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)

    out = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "n_flagged")
        .orderBy("user_id")
    )


# ANSI twin: the same sequential semantics as a running window — prior-row
# exact integer moments per (user, ts, event_id) position, identical float
# expression for the threshold.
STREAMING_ONLINE_OUTLIERS_SQL = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events),
running AS (
  SELECT user_id, cents,
         COUNT(*) OVER w AS n_prior,
         CAST(COALESCE(SUM(cents) OVER w, 0) AS BIGINT) AS s_prior,
         CAST(COALESCE(SUM(cents * cents) OVER w, 0) AS BIGINT) AS q_prior
  FROM ordered
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN n_prior >= {MIN_PRIOR}
                      AND CAST(cents AS DOUBLE) >
                          (CAST(s_prior AS DOUBLE) / CAST(n_prior AS DOUBLE))
                          + {SIGMAS} * sqrt(GREATEST(
                              CAST(q_prior AS DOUBLE) / CAST(n_prior AS DOUBLE)
                              - (CAST(s_prior AS DOUBLE) / CAST(n_prior AS DOUBLE))
                                * (CAST(s_prior AS DOUBLE) / CAST(n_prior AS DOUBLE)),
                              0.0))
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM running
GROUP BY user_id
ORDER BY user_id
"""

QUERIES = {"streaming_online_outliers": streaming_online_outliers}
ORACLES = {"streaming_online_outliers": STREAMING_ONLINE_OUTLIERS_SQL}
