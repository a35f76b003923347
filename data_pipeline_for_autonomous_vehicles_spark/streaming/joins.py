"""Stream-stream joins — the remaining Structured Streaming operator class
(aggregates, sessionization, and keyed dedup live in ``aggregates.py``).

The reference computes view→purchase attribution at query time over storage
(SURVEY.md §2.9: every windowed metric re-scans); the streaming-native form
joins the two live streams directly, with watermarks bounding the buffered
state on both sides.

Scale: a stream-stream inner join with an event-time range condition keeps
each side's rows in state only until ``watermark - range`` passes them, so
state is bounded by (join horizon × arrival rate) per key — independent of
stream length. Both sides hash-partition on the equi-key (user_id), the
same exchange a batch join would perform, amortized across micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .aggregates import _run_to_memory
from .rules import stream_events


def streaming_view_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join: each view event joined to the
    same user's purchase events occurring within the following hour, then
    rolled up per user. Must equal the batch self-join twin exactly.
    """
    views = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    buys = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("buyer_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    pairs = views.join(
        buys,
        (F.col("user_id") == F.col("buyer_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    out = _run_to_memory(pairs, mode="append")
    return (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("view_id").alias("n_attributed_views"),
            F.countDistinct("purchase_id").alias("n_attributing_purchases"),
        )
        .orderBy("user_id")
    )


STREAMING_VIEW_PURCHASE_SQL = """
SELECT v.user_id,
       COUNT(*) AS n_pairs,
       COUNT(DISTINCT v.event_id) AS n_attributed_views,
       COUNT(DISTINCT p.event_id) AS n_attributing_purchases
FROM events v
JOIN events p
  ON p.user_id = v.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
GROUP BY v.user_id
ORDER BY v.user_id
"""


def streaming_unconverted_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER interval join: views that saw NO
    purchase from the same user within the following hour, counted per user.

    This is the join class `streaming_view_purchase_pairs` cannot express:
    the *absence* of a match. The outer side emits its null-padded row only
    when the watermark proves no future purchase can still arrive
    (watermark > view_ts + 1h), i.e. state eviction doubles as negative
    evidence — the streaming-native form of the reference's query-time
    NOT EXISTS anti-joins (SURVEY.md §2.3 semi/anti family).

    Determinism at the stream tail: rows younger than the final watermark
    minus the join horizon are still in state when a bounded run ends. The
    final watermark is min over BOTH input streams of (that stream's max
    event time − 1h delay) — deriving the bound from the global max(ts)
    would overshoot whenever the view stream ends earlier than the
    purchase stream (at sf0.001 the last view trails the last purchase by
    >1h, which would eat the whole safety margin). So both this query and
    its oracle restrict to views with
    ``view_ts <= least(max view ts, max purchase ts) - 3 hours``
    (1h join horizon + 1h watermark delay + 1h safety), a region the
    no-data flush batch is guaranteed to have emitted. The cutoff is a
    broadcast 1-row scalar (J2 pattern), applied AFTER the stream
    completes — it never parameterizes the stream itself.

    Scale: left-outer keeps the same bounded per-key state as the inner
    join (each side held only until watermark - horizon passes it); the
    null-emit path adds no extra state, only the eviction-time output.
    """
    from ..catalog import load_table

    views = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    buys = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("buyer_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        buys,
        (F.col("user_id") == F.col("buyer_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    )
    out = _run_to_memory(joined, mode="append")
    cutoff = load_table(spark, sf_dir, "events").agg(
        (
            F.least(
                F.max(F.when(F.col("event_type") == "view", F.col("ts"))),
                F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
            )
            - F.expr("INTERVAL 3 HOUR")
        ).alias("cutoff")
    )
    return (
        out.filter(F.col("purchase_id").isNull())
        .join(F.broadcast(cutoff))
        .filter(F.col("view_ts") <= F.col("cutoff"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_unconverted"))
        .orderBy("user_id")
    )


STREAMING_UNCONVERTED_SQL = """
WITH bound AS (
  SELECT LEAST(MAX(CASE WHEN event_type = 'view' THEN ts END),
               MAX(CASE WHEN event_type = 'purchase' THEN ts END))
         - INTERVAL 3 HOUR AS cutoff
  FROM events)
SELECT v.user_id,
       COUNT(*) AS n_unconverted
FROM events v, bound b
WHERE v.event_type = 'view'
  AND v.ts <= b.cutoff
  AND NOT EXISTS (
      SELECT 1 FROM events p
      WHERE p.user_id = v.user_id
        AND p.event_type = 'purchase'
        AND p.ts >= v.ts
        AND p.ts <= v.ts + INTERVAL 1 HOUR)
GROUP BY v.user_id
ORDER BY v.user_id
"""


def streaming_enriched_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the live event stream joined to the static
    customer dimension (user_id ↔ c_custkey) inside the stream, rolled up by
    nation. Stream-static joins are STATELESS — the dim is (re)broadcast per
    micro-batch, no watermark, no state store — which is why enrichment
    belongs in the stream and windowed analytics stays query-time
    (SURVEY.md §2.9). Inner join semantics: events without a customer row
    drop, exactly as the batch twin does.

    Scale: the stream side never shuffles (broadcast hash join per batch);
    at dimension sizes above the broadcast threshold Spark falls back to a
    per-batch shuffle join with no code change.
    """
    from ..catalog import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    enriched = stream_events(spark, sf_dir).join(F.broadcast(cust), "user_id")
    out = _run_to_memory(enriched, mode="append")
    return (
        out.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("c_nationkey")
    )


STREAMING_ENRICHED_SQL = """
SELECT c.c_nationkey AS c_nationkey,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
GROUP BY c.c_nationkey
ORDER BY c_nationkey
"""


QUERIES = {
    "streaming_view_purchase_pairs": streaming_view_purchase_pairs,
    "streaming_unconverted_views": streaming_unconverted_views,
    "streaming_enriched_nation_counts": streaming_enriched_nation_counts,
}

ORACLES = {
    "streaming_view_purchase_pairs": STREAMING_VIEW_PURCHASE_SQL,
    "streaming_unconverted_views": STREAMING_UNCONVERTED_SQL,
    "streaming_enriched_nation_counts": STREAMING_ENRICHED_SQL,
}
