"""As-of (point-in-time) join — a time-series operator Spark has no builtin
for (SURVEY.md §2.3: the reference has none either; this is the canonical
telemetry-analytics extension, e.g. "attach the latest telemetry row at or
before each driving event").

Naive formulations are O(n·m) (theta join on time ranges) or need an
equality-free merge join. The scalable Spark-first shape used here:

    union(left tagged, right tagged)
      → window over (key ORDER BY time, tie) with
        last_value(right_payload, ignoreNulls) ROWS UNBOUNDED PRECEDING
      → keep left rows

ONE shuffle on the key, linear work per partition, no join operator at
all. The same trick backs as-of joins in kdb-style engines and Flink's
temporal joins; on 100 TB it scales exactly like any windowed aggregate
(state = one carried row per key). The tie/order column makes the result
total-order deterministic under equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import round_half_up


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tie: str,
) -> DataFrame:
    """Generic as-of join: for each left row, the values of the latest right
    row with right_time <= left_time (in (time, tie) order) and equal `on`
    key. Returns all left columns plus `value_cols` (null when no prior
    right row exists).

    `tie` must be a column present in both frames that totally orders rows
    within equal timestamps (e.g. a unique event id).
    """
    lt = left.select(
        F.lit(1).alias("_is_left"),
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.col(tie).alias("_tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left_row"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_rv_{c}") for c in value_cols],
    )
    rt = right.select(
        F.lit(0).alias("_is_left"),
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.col(tie).alias("_tie"),
        F.lit(None).cast(lt.schema["_left_row"].dataType).alias("_left_row"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    # right rows sort before left rows at equal (_t, _tie) via _is_left, so
    # a right row with exactly the left row's timestamp IS visible to it
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_left", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "_is_left",
        "_left_row",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_is_left") == 1).select(
        "_left_row.*", *[f"asof_{c}" for c in value_cols]
    )


def purchases_with_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase event with the value of the user's latest at-or-before
    view event — the as-of join exercised on the driver's events table."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", F.col("value").alias("view_value")
    )
    out = asof_join(
        purchases,
        views,
        on="user_id",
        left_time="ts",
        right_time="ts",
        value_cols=["view_value"],
        tie="event_id",
    )
    return out.select(
        "event_id", "user_id", "value", F.col("asof_view_value").alias("last_view_value")
    )  # no final orderBy: scaling output, order-insensitive gate (guide §2.4)


_ASOF_SQL = """
WITH tagged AS (
  SELECT 1 AS is_left, user_id AS k, ts AS t, event_id AS tie,
         event_id, value, NULL::DOUBLE AS rv
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT 0 AS is_left, user_id AS k, ts AS t, event_id AS tie,
         NULL::BIGINT AS event_id, NULL::DOUBLE AS value, value AS rv
  FROM events WHERE event_type = 'view'),
carried AS (
  SELECT is_left, event_id, k, value,
         LAST_VALUE(rv IGNORE NULLS) OVER (
           PARTITION BY k ORDER BY t, is_left, tie
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_value
  FROM tagged)
SELECT event_id, k AS user_id, value, last_view_value
FROM carried WHERE is_left = 1
ORDER BY event_id
"""


def telemetry_at_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-shaped variant: each intervention/disengagement driving
    event (event_type IN …, SURVEY §2.2 P5) annotated with the vehicle's
    speed proxy (value) from its latest at-or-before click event — the
    'telemetry state at event time' query a fleet operator runs."""
    ev = load_table(spark, sf_dir, "events")
    incidents = ev.filter(F.col("event_type").isin("error", "signup")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    telemetry = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("speed_proxy")
    )
    out = asof_join(
        incidents,
        telemetry,
        on="user_id",
        left_time="ts",
        right_time="ts",
        value_cols=["speed_proxy"],
        tie="event_id",
    )
    return out.select(
        "event_id", "user_id", "event_type", F.col("asof_speed_proxy").alias("speed_at_event")
    )  # no final orderBy: scaling output, order-insensitive gate (guide §2.4)


_TELEMETRY_AT_EVENT_SQL = """
WITH tagged AS (
  SELECT 1 AS is_left, user_id AS k, ts AS t, event_id AS tie,
         event_id, event_type, NULL::DOUBLE AS rv
  FROM events WHERE event_type IN ('error', 'signup')
  UNION ALL
  SELECT 0 AS is_left, user_id AS k, ts AS t, event_id AS tie,
         NULL::BIGINT AS event_id, NULL::VARCHAR AS event_type, value AS rv
  FROM events WHERE event_type = 'click'),
carried AS (
  SELECT is_left, event_id, k, event_type,
         LAST_VALUE(rv IGNORE NULLS) OVER (
           PARTITION BY k ORDER BY t, is_left, tie
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS speed_at_event
  FROM tagged)
SELECT event_id, k AS user_id, event_type, speed_at_event
FROM carried WHERE is_left = 1
ORDER BY event_id
"""


FUNNEL_WINDOW_S = 1800


def view_to_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user conversion funnel: purchases preceded by a view within 30
    minutes count as converted. Composes the as-of join (carry the latest
    view timestamp onto each purchase) with a per-user rollup — the
    attribution-window pattern of product analytics."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", F.col("ts").alias("view_ts")
    )
    joined = asof_join(
        purchases,
        views,
        on="user_id",
        left_time="ts",
        right_time="ts",
        value_cols=["view_ts"],
        tie="event_id",
    )
    converted = F.when(
        F.col("asof_view_ts").isNotNull()
        & (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_view_ts"))
            <= FUNNEL_WINDOW_S * 1_000_000
        ),
        1,
    ).otherwise(0)
    return (
        joined.select("user_id", converted.alias("conv"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("conv").alias("n_converted"),
        )
        .orderBy("user_id")
    )


_FUNNEL_SQL = f"""
WITH tagged AS (
  SELECT 1 AS is_left, user_id, ts AS t, event_id AS tie, NULL::TIMESTAMP AS rv
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT 0 AS is_left, user_id, ts AS t, event_id AS tie, ts AS rv
  FROM events WHERE event_type = 'view'),
carried AS (
  SELECT is_left, user_id, t,
         LAST_VALUE(rv IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, is_left, tie
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_ts
  FROM tagged)
SELECT user_id,
       COUNT(*) AS n_purchases,
       CAST(SUM(CASE WHEN view_ts IS NOT NULL
                 AND epoch_us(t) - epoch_us(view_ts) <= {FUNNEL_WINDOW_S * 1_000_000}
            THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM carried WHERE is_left = 1
GROUP BY user_id
ORDER BY user_id
"""


LATENCY_CAP_US = 3_600_000_000  # attribute purchases within 1 hour


def view_to_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of view→first-purchase latency (within 1 hour): how fast
    browsing converts. FORWARD as-of via the same union+window machinery as
    `asof_join` — time and tiebreak are NEGATED, so "latest right ≤ t"
    becomes "earliest purchase ≥ view, ties to the lowest event_id". Same
    single-shuffle scale shape as the backward join: no fact⋈fact pair
    blow-up, each view meets exactly one purchase candidate.

    Bucket edges are integer micros, counts integers, shares rounded — the
    whole report is exact.
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id",
        "user_id",
        (-F.unix_micros("ts")).alias("negt"),
        (-F.col("event_id")).alias("negid"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        (-F.unix_micros("ts")).alias("negt"),
        (-F.col("event_id")).alias("negid"),
        F.unix_micros("ts").alias("p_us"),
    )
    matched = asof_join(
        views,
        purchases,
        on="user_id",
        left_time="negt",
        right_time="negt",
        value_cols=["p_us"],
        tie="negid",
    )
    lat = matched.select(
        (F.col("asof_p_us") - (-F.col("negt"))).alias("lat_us")
    ).filter(F.col("lat_us").isNotNull() & (F.col("lat_us") <= F.lit(LATENCY_CAP_US)))
    bucket = (
        F.when(F.col("lat_us") < 300_000_000, "lt_5m")
        .when(F.col("lat_us") < 900_000_000, "5m_to_15m")
        .otherwise("15m_to_1h")
    )
    counts = lat.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_views")
    )
    total = counts.agg(F.sum("n_views").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n_views",
            round_half_up(
                F.col("n_views").cast("double") / F.col("n_total").cast("double"), 4
            ).alias("share"),
        )
        .orderBy("bucket")
    )


_LATENCY_SQL = f"""
WITH v AS (
  SELECT event_id, user_id, epoch_us(ts) AS v_us
  FROM events WHERE event_type = 'view'),
p AS (
  SELECT event_id, user_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'),
pairs AS (
  SELECT v.event_id AS vid, v.v_us, p.p_us,
         ROW_NUMBER() OVER (PARTITION BY v.event_id
                            ORDER BY p.p_us ASC, p.event_id ASC) AS rn
  FROM v JOIN p ON p.user_id = v.user_id AND p.p_us >= v.v_us),
lat AS (
  SELECT p_us - v_us AS lat_us FROM pairs
  WHERE rn = 1 AND p_us - v_us <= {LATENCY_CAP_US}),
counts AS (
  SELECT CASE WHEN lat_us < 300000000 THEN 'lt_5m'
              WHEN lat_us < 900000000 THEN '5m_to_15m'
              ELSE '15m_to_1h' END AS bucket,
         COUNT(*) AS n_views
  FROM lat GROUP BY 1)
SELECT bucket, n_views,
       CAST(FLOOR((CAST(n_views AS DOUBLE)
             / CAST((SELECT SUM(n_views) FROM counts) AS DOUBLE)) * 10000.0 + 0.5)
            AS DOUBLE) / 10000.0 AS share
FROM counts
ORDER BY bucket
"""


# --- multi-touch attribution -------------------------------------------------

ATTR_WINDOW_DAYS = 7
ATTR_TOUCH_TYPES = ("view", "click")


def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel attributed revenue under two standard multi-touch
    models. A conversion is a purchase event; its touches are the same
    user's view/click events in the trailing ATTR_WINDOW_DAYS. Linear
    splits the purchase value evenly across touches; position-based (the
    "U-shape" model) gives 40% to the first touch, 40% to the last, and
    splits 20% across the middle (n=1 → 100%, n=2 → 50/50).

    Exactness: purchase value is scaled to int64 cents, weights to 1e-6
    fixed point via integer division, so every attributed amount and
    channel sum is exact integer arithmetic — order-independent.

    Scale: one shuffle on user_id for the touch join (the sessionization
    key — co-partitioned with user_sessions et al. under bucketing), one
    window shuffle on conversion id (≤ touches rows), then a 2-key
    channel rollup. A touch may legitimately fund multiple conversions
    inside the window; output is |channels| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("value_e2"),
    )
    touch = ev.filter(F.col("event_type").isin(*ATTR_TOUCH_TYPES)).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("ts").alias("touch_ts"),
        F.col("event_type").alias("channel"),
    )
    pairs = conv.join(touch, "user_id").filter(
        (F.col("touch_ts") <= F.col("conv_ts"))
        & (
            F.col("touch_ts")
            > F.col("conv_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
        )
    )
    w = Window.partitionBy("conv_id")
    wo = w.orderBy(F.asc("touch_ts"), F.asc("touch_id"))
    ranked = pairs.select(
        "conv_id",
        "channel",
        "value_e2",
        F.count(F.lit(1)).over(w).alias("n"),
        F.row_number().over(wo).alias("rnk"),
    )
    lin_e6 = F.expr("1000000 DIV n")
    pos_e6 = (
        F.when(F.col("n") == 1, F.lit(1000000))
        .when(F.col("n") == 2, F.lit(500000))
        .when((F.col("rnk") == 1) | (F.col("rnk") == F.col("n")), F.lit(400000))
        .otherwise(F.expr("200000 DIV (n - 2)"))
    )
    return (
        ranked.select(
            "channel",
            "conv_id",
            (F.col("value_e2") * lin_e6).alias("lin_e8"),
            (F.col("value_e2") * pos_e6).alias("pos_e8"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("conv_id").alias("n_conversions"),
            F.sum("lin_e8").alias("_lin"),
            F.sum("pos_e8").alias("_pos"),
        )
        .select(
            "channel",
            "n_touches",
            "n_conversions",
            (F.col("_lin").cast("double") / F.lit(1e8)).alias("linear_value"),
            (F.col("_pos").cast("double") / F.lit(1e8)).alias("positional_value"),
        )
        .orderBy("channel")
    )


_ATTR_SQL = f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts AS conv_ts,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS value_e2
  FROM events WHERE event_type = 'purchase'),
touch AS (
  SELECT event_id AS touch_id, user_id, ts AS touch_ts, event_type AS channel
  FROM events WHERE event_type IN {ATTR_TOUCH_TYPES!r}),
pairs AS (
  SELECT c.conv_id, t.channel, c.value_e2, t.touch_ts, t.touch_id
  FROM conv c JOIN touch t ON t.user_id = c.user_id
   AND t.touch_ts <= c.conv_ts
   AND t.touch_ts > c.conv_ts - INTERVAL {ATTR_WINDOW_DAYS} DAYS),
ranked AS (
  SELECT conv_id, channel, value_e2,
         COUNT(*) OVER (PARTITION BY conv_id) AS n,
         ROW_NUMBER() OVER (PARTITION BY conv_id
                            ORDER BY touch_ts ASC, touch_id ASC) AS rnk
  FROM pairs)
SELECT channel,
       COUNT(*) AS n_touches,
       COUNT(DISTINCT conv_id) AS n_conversions,
       CAST(SUM(value_e2 * (1000000 // n)) AS DOUBLE) / 100000000.0 AS linear_value,
       CAST(SUM(value_e2 * (CASE WHEN n = 1 THEN 1000000
                                 WHEN n = 2 THEN 500000
                                 WHEN rnk = 1 OR rnk = n THEN 400000
                                 ELSE 200000 // (n - 2) END)) AS DOUBLE)
         / 100000000.0 AS positional_value
FROM ranked
GROUP BY channel
ORDER BY channel
"""


QUERIES = {
    "view_to_purchase_latency": view_to_purchase_latency,
    "multi_touch_attribution": multi_touch_attribution,
    "purchases_with_last_view": purchases_with_last_view,
    "telemetry_at_event": telemetry_at_event,
    "view_to_purchase_funnel": view_to_purchase_funnel,
}

ORACLES = {
    "view_to_purchase_latency": _LATENCY_SQL,
    "multi_touch_attribution": _ATTR_SQL,
    "purchases_with_last_view": _ASOF_SQL,
    "telemetry_at_event": _TELEMETRY_AT_EVENT_SQL,
    "view_to_purchase_funnel": _FUNNEL_SQL,
}
