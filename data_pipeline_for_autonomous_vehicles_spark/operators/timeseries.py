"""Hypertable-style time-series rollups: time_bucket + gap-fill + LOCF.

The reference stores everything in TimescaleDB hypertables
(sql/01_schema.sql:22-69) whose signature query pattern is
`time_bucket_gapfill(...) + locf(...)` — continuous per-entity time grids
with missing buckets filled and last-observation-carried-forward. The
reference's own queries stop at `time > NOW() - interval` windows, but any
fleet dashboard on this schema reaches for gap-fill next; it is also the
canonical "hypertable rollup" the Spark engine must express.

Spark-first shape (no generator UDFs, no driver loops):
  1. bucket = date_trunc(hour) → groupBy(entity, bucket) aggregate
  2. per-entity [min,max] bucket bounds → sequence() + explode = the spine
     (distributed row generation, one row per (entity, bucket))
  3. left join aggregates onto the spine (both sides partitioned by
     entity — AQE coalesces; at scale bucketing by entity makes this a
     no-shuffle join)
  4. LOCF = last(value, ignoreNulls) over (entity ORDER BY bucket ROWS
     UNBOUNDED PRECEDING) — the same carry-forward window as the as-of
     join (operators/asof.py)

Scale: spine size = entities × buckets — generated distributively from a
1-row-per-entity frame, so a year of minutes for 10^6 vehicles (~5·10^11
rows) parallelizes trivially and never exists driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import register_plan_cache as _register_cache
from ..catalog import load_table
from ..functions.scalars import (
    exact_avg,
    exact_sum,
    round_half_up,
    sql_exact_avg,
    sql_exact_sum,
    sql_round_half_up,
)


def hourly_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly event rollup on a gap-free grid: bucket count (0 for
    empty hours) and LOCF-filled value sum."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum("value", 2).alias("sum_value"),
    )
    # Single-pass gapfill: each occupied bucket explodes into itself plus the
    # empty hours up to (but excluding) the user's next occupied bucket,
    # carrying its sum — which IS the LOCF value, since the generated hours
    # have no events of their own. Replaces the bounds-agg + spine + left
    # self-join formulation (which evaluated `agg` twice and shuffled three
    # times) with one lead() window over the aggregate: 2 shuffles total,
    # one scan, identical output. The ANSI twin keeps the spine/LOCF
    # spelling — it is the semantic spec, and the oracle proves this plan
    # equivalent to it.
    w = Window.partitionBy("user_id").orderBy("bucket")
    filled = agg.withColumn("nxt", F.lead("bucket").over(w)).select(
        "user_id",
        "n_events",
        "sum_value",
        F.col("bucket").alias("src_bucket"),
        F.explode(
            F.sequence(
                F.col("bucket"),
                F.coalesce(
                    F.col("nxt") - F.expr("INTERVAL 1 HOUR"), F.col("bucket")
                ),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket"),
    )
    # No final orderBy: the driver comparator is order-insensitive (row count
    # + schema + sorted-multiset hash), and the global range sort was the
    # single largest cost of the query — it ran over the EXPLODED grid (the
    # widest intermediate), adding a sampling pass + range Exchange + sort
    # (guide §2.4: "an orderBy used only to make output deterministic").
    # The ANSI twin keeps ORDER BY as the readable spec; the oracle compare
    # itself sorts rows, so parity is unchanged.
    return filled.select(
        "user_id",
        "bucket",
        F.when(F.col("bucket") == F.col("src_bucket"), F.col("n_events"))
        .otherwise(F.lit(0))
        .alias("n_events"),
        F.col("sum_value").alias("sum_value_locf"),
    )


_GAPFILL_SQL = f"""
WITH agg AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         COUNT(*) AS n_events,
         {sql_exact_sum("value", 2)} AS sum_value
  FROM events GROUP BY 1, 2),
bounds AS (SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx FROM agg GROUP BY 1),
spine AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
  FROM bounds)
SELECT s.user_id, s.bucket,
       COALESCE(a.n_events, 0) AS n_events,
       LAST_VALUE(a.sum_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value_locf
FROM spine s LEFT JOIN agg a ON s.user_id = a.user_id AND s.bucket = a.bucket
ORDER BY s.user_id, s.bucket
"""


def daily_fleet_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level hypertable rollup: hourly per-user buckets re-aggregated to
    fleet-wide daily rows (continuous-aggregate-over-continuous-aggregate,
    the TimescaleDB cagg stacking pattern). Exact int sums re-aggregate
    losslessly — the property that makes hierarchical rollups safe."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket_h")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")).alias("v_e2"),
    )
    return (
        hourly.groupBy(F.to_date("bucket_h").alias("day"))
        .agg(
            F.sum("n_events").alias("n_events"),
            (F.sum("v_e2").cast("double") / F.lit(100.0)).alias("sum_value"),
            F.count(F.lit(1)).alias("active_hours"),
        )
        .orderBy("day")
    )


_DAILY_ROLLUP_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket_h,
         COUNT(*) AS n_events,
         SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS v_e2
  FROM events GROUP BY 1)
SELECT CAST(bucket_h AS DATE) AS day,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(v_e2) AS DOUBLE) / 100.0 AS sum_value,
       COUNT(*) AS active_hours
FROM hourly
GROUP BY 1
ORDER BY day
"""


def hourly_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly average on a gap-free grid with *linear interpolation*
    across empty hours — the `time_bucket_gapfill + interpolate()` companion
    of `hourly_gapfill_locf` (TimescaleDB's other gap-fill mode; the
    reference's hypertables, sql/01_schema.sql:22-69, are the data model
    this targets).

    Same single-pass shape as the LOCF variant: one window pass gives each
    occupied bucket its successor's value, then sequence+explode generates
    the in-between hours with value = v + (v_next - v) * i/gap. No spine
    join, two shuffles total, and the interpolation arithmetic is a fixed
    IEEE op chain so Spark and the oracle agree bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")).agg(
        exact_avg("value", 2).alias("v")
    )
    w = Window.partitionBy("user_id").orderBy("bucket")
    led = agg.withColumn("nxt", F.lead("bucket").over(w)).withColumn(
        "nxt_v", F.lead("v").over(w)
    )
    gap = (
        (F.unix_timestamp("nxt") - F.unix_timestamp("bucket")) / F.lit(3600)
    ).cast("long")
    exploded = led.withColumn(
        "gap", F.coalesce(gap, F.lit(1)).alias("gap")
    ).select(
        "user_id",
        "bucket",
        "v",
        "nxt_v",
        "gap",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("gap") - 1)).alias("i"),
    )
    interp = F.when(F.col("i") == 0, F.col("v")).otherwise(
        F.col("v")
        + (F.col("nxt_v") - F.col("v"))
        * (F.col("i").cast("double") / F.col("gap").cast("double"))
    )
    # No final orderBy — same reasoning as `hourly_gapfill_locf`: the global
    # range sort ran over the exploded grid and the driver comparator is
    # order-insensitive.
    return exploded.select(
        "user_id",
        (F.col("bucket") + F.make_interval(hours=F.col("i").cast("int"))).alias(
            "bucket"
        ),
        round_half_up(interp, 4).alias("value_interp"),
    )


_GAPFILL_INTERP_SQL = f"""
WITH agg AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         {sql_exact_avg("value", 2)} AS v
  FROM events GROUP BY 1, 2),
led AS (
  SELECT user_id, bucket, v,
         lead(bucket) OVER w AS nxt, lead(v) OVER w AS nxt_v
  FROM agg WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
gaps AS (
  SELECT *, COALESCE(date_diff('hour', bucket, nxt), 1) AS gap FROM led),
expanded AS (
  SELECT user_id, bucket, v, nxt_v, gap, unnest(generate_series(0, gap - 1)) AS i
  FROM gaps)
SELECT user_id,
       bucket + i * INTERVAL 1 HOUR AS bucket,
       {sql_round_half_up("CASE WHEN i = 0 THEN v ELSE v + (nxt_v - v) * (CAST(i AS DOUBLE) / CAST(gap AS DOUBLE)) END", 4)} AS value_interp
FROM expanded
ORDER BY user_id, bucket
"""


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of `value` over the event timeline
    (TimescaleDB `time_weight('LOCF', ...)` / `average()`): each observation
    is weighted by how long it was the latest one. Irregularly-sampled
    telemetry (the reference's vehicle streams) needs this instead of the
    plain mean, which over-weights chatty periods.

    One window pass (lead over user,ts) then a hash-agg; the weighted sum is
    scaled-int64 so partial aggregation order cannot change the result."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select("user_id", "ts", "event_id", "value").withColumn(
        "dur_us", F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
    )
    wsum = F.sum(
        F.floor(
            (F.col("value") * F.col("dur_us").cast("double")) * F.lit(100.0)
            + F.lit(0.5)
        ).cast("long")
    )
    total = F.sum("dur_us")
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("dur_us").alias("n_segments"),
            round_half_up(
                (wsum.cast("double") / F.lit(100.0)) / total.cast("double"), 4
            ).alias("twa_value"),
            round_half_up(total.cast("double") / F.lit(3.6e9), 2).alias(
                "span_hours"
            ),
        )
        .orderBy("user_id")
    )


_TWA_SQL = f"""
WITH seg AS (
  SELECT user_id, value,
         date_diff('microsecond', ts,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS dur_us
  FROM events)
SELECT user_id,
       COUNT(dur_us) AS n_segments,
       {sql_round_half_up("(CAST(SUM(CAST(FLOOR((value * CAST(dur_us AS DOUBLE)) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0) / CAST(SUM(dur_us) AS DOUBLE)", 4)} AS twa_value,
       {sql_round_half_up("CAST(SUM(dur_us) AS DOUBLE) / 3600000000.0", 2)} AS span_hours
FROM seg
GROUP BY user_id
ORDER BY user_id
"""


def counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style counter `increase()` with reset detection, per user:
    deltas between consecutive samples; a negative delta is a counter reset
    and contributes the post-reset value (the counter restarted from 0).
    The per-entity lag + conditional-sum shape is what monotone telemetry
    (the reference's `odometer_km`) needs as soon as devices can reboot —
    the plain MAX-MIN span (SURVEY.md A2/A3) under-counts across resets."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select("user_id", "ts", "event_id", "value").withColumn(
        "delta", F.col("value") - F.lag("value").over(w)
    )
    term = F.when(F.col("delta") >= 0, F.col("delta")).otherwise(F.col("value"))
    return (
        d.groupBy("user_id")
        .agg(
            exact_sum(term, 2).alias("total_increase"),
            F.count(F.when(F.col("delta") < 0, F.lit(1))).alias("n_resets"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .orderBy("user_id")
    )


_COUNTER_RATE_SQL = f"""
WITH d AS (
  SELECT user_id, value,
         value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
  FROM events)
SELECT user_id,
       {sql_exact_sum("CASE WHEN delta >= 0 THEN delta ELSE value END", 2)} AS total_increase,
       COUNT(CASE WHEN delta < 0 THEN 1 END) AS n_resets,
       COUNT(*) AS n_samples
FROM d
GROUP BY user_id
ORDER BY user_id
"""


def hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly OHLC downsample: open/close = first/last value by
    (ts, event_id), high/low = max/min. The canonical lossy time-series
    downsampling (candlestick / Timescale `first()`/`last()` aggregates) —
    turns raw telemetry into bounded-size series for dashboards.

    first/last are min_by/max_by over a single order-preserving DECIMAL(38,0)
    key (ts_micros·10¹² + event_id — struct min/max would force SortAggregate,
    i.e. a full sort of the fact table before aggregating; a fixed-width
    decimal buffer keeps the whole query ONE HashAggregate: no window, no
    sort, map-side combine, one exchange). The oracle uses ordered-set
    aggregates, the semantic spec this plan must match."""
    ev = load_table(spark, sf_dir, "events")
    # order-preserving pack; event_id < 10^12 per entity-bucket is assumed
    # (driver data: < 10^6; at larger id ranges raise the multiplier — the
    # decimal has 38 digits, ts_micros uses 16).
    key = F.unix_micros("ts").cast("decimal(38,0)") * F.lit(
        1_000_000_000_000
    ).cast("decimal(38,0)") + F.col("event_id").cast("decimal(38,0)")
    return (
        ev.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        # no final orderBy: scaling output, order-insensitive gate (guide §2.4)
    )


_OHLC_SQL = """
SELECT user_id, date_trunc('hour', ts) AS bucket,
       first(value ORDER BY ts, event_id) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       last(value ORDER BY ts, event_id) AS close,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
ORDER BY user_id, bucket
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen week
    (cohort), counted in each subsequent week they were active. The
    standard growth-analytics triangle the reference's dashboard
    (src/visualization/dashboard.py:60-68 — per-vehicle aggregates only)
    cannot express.

    Single-scan plan: dedup to one row per (user, week) FIRST — shrinking
    the fact table to |users × weeks| before any window work — then the
    cohort week is a min-over-user window on that reduced frame, and the
    matrix a hash aggregate. COUNT(*) on the deduped frame ≡ COUNT
    (DISTINCT user) on raw events, without a distinct aggregate in the
    final (thus map-side-combinable) pass."""
    ev = load_table(spark, sf_dir, "events")
    user_weeks = ev.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("event_week")
    ).distinct()
    cohort = F.min("event_week").over(Window.partitionBy("user_id"))
    return (
        user_weeks.withColumn("cohort_week", cohort)
        .groupBy(
            "cohort_week",
            (F.datediff("event_week", "cohort_week") / 7).cast("long").alias("week_n"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_n")
    )


_COHORT_SQL = """
WITH uw AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS event_week
    FROM events
), c AS (
    SELECT user_id, event_week,
           MIN(event_week) OVER (PARTITION BY user_id) AS cohort_week
    FROM uw
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, event_week) // 7 AS BIGINT) AS week_n,
       COUNT(*) AS n_users
FROM c
GROUP BY cohort_week, week_n
ORDER BY cohort_week, week_n
"""


def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-day distinct active users per day — the canonical
    sliding-window COUNT(DISTINCT) that naive SQL writes as a range
    self-join (every day rescanning a week of raw events).

    Spark-first shape: dedup to (user, day) FIRST, then each user-day
    contributes itself to the 7 report days it falls into via
    `sequence + explode` — a map-side ×7 fan-out on the already-tiny
    deduped frame — and one distinct aggregate per report day finishes it.
    No range join, no re-scan: the raw fact table is read once, and the
    shuffled volume is |users × days| × 7, independent of event count.
    Report days are clipped to the observed range so every output window
    is fully contained in the data."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    bounds = ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    return (
        ud.withColumn(
            "report_day", F.explode(F.sequence(F.col("day"), F.date_add("day", 6)))
        )
        .crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("report_day") >= F.date_add(F.col("lo"), 6))
            & (F.col("report_day") <= F.col("hi"))
        )
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("report_day")
    )


_ROLLING_7D_SQL = """
WITH ud AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), b AS (
    SELECT MIN(day) AS lo, MAX(day) AS hi FROM ud
), fan AS (
    SELECT ud.user_id, ud.day + CAST(i AS INTEGER) AS report_day
    FROM ud, unnest(generate_series(0, 6)) AS t(i)
)
SELECT report_day, COUNT(DISTINCT user_id) AS active_users
FROM fan, b
WHERE report_day >= b.lo + 6 AND report_day <= b.hi
GROUP BY report_day
ORDER BY report_day
"""


MISSING_DAYS_MAX_USER = 5


def user_missing_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-completeness audit: for the first MISSING_DAYS_MAX_USER
    users, every day in the corpus span on which that user produced NO
    events — the inverse of an activity rollup, and the missing-partition
    detector an ingestion monitor runs nightly.

    Pattern: distributed date-spine generation + LEFT ANTI join. The corpus
    (min_day, max_day) is a 1-row broadcast; `sequence() + explode` expands
    it to the user×day spine ON EXECUTORS (the spine never exists
    driver-side), and the anti-join probes the observed (user, day) pairs —
    which the plan dedups first, so the join carries |users × active days|,
    not the fact table. At 100 TB the spine side is |users|·|days| rows
    regardless of event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    users = (
        ev.filter(F.col("user_id") <= MISSING_DAYS_MAX_USER)
        .select("user_id")
        .distinct()
    )
    spine = users.crossJoin(F.broadcast(span)).select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias(
            "missing_day"
        ),
    )
    observed = (
        ev.filter(F.col("user_id") <= MISSING_DAYS_MAX_USER)
        .select("user_id", F.to_date("ts").alias("missing_day"))
        .distinct()
    )
    return spine.join(observed, ["user_id", "missing_day"], "left_anti").orderBy(
        "user_id", "missing_day"
    )


_MISSING_DAYS_SQL = f"""
WITH span AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events),
users AS (
  SELECT DISTINCT user_id FROM events WHERE user_id <= {MISSING_DAYS_MAX_USER}),
spine AS (
  SELECT u.user_id, CAST(gs.d AS DATE) AS missing_day
  FROM users u
  CROSS JOIN span s
  CROSS JOIN LATERAL unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS gs(d)),
observed AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS missing_day
  FROM events WHERE user_id <= {MISSING_DAYS_MAX_USER})
SELECT sp.user_id, sp.missing_day
FROM spine sp
ANTI JOIN observed o
  ON o.user_id = sp.user_id AND o.missing_day = sp.missing_day
ORDER BY user_id, missing_day
"""


def inter_purchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival analytics: per-user purchase-to-purchase gaps, rolled
    into one fleet row — repeat-purchase cadence (n gaps, exact mean gap,
    exact p50/p90 gap, all in minutes). One entity-keyed window computes the
    lag on integer epoch micros; the global aggregate runs over |purchases|
    gap rows. Mean via int64 micros sum; percentiles via `F.percentile`
    (≡ DuckDB `quantile_cont`) on int64 micros, scaled to minutes through
    one mirrored division. Scale note (SCALE.md quality section): gap
    micros are row-cardinality, so the cell-CDF rewrite that de-buffered
    `value_percentiles` buys nothing here — the exact global quantile is
    one-task-sized by nature; swap in the KLL sketch path when |gaps|
    outgrows a task."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    gaps = (
        p.withColumn("gap_us", F.col("t_us") - F.lag("t_us").over(w))
        .filter(F.col("gap_us").isNotNull())
        .select("gap_us")
    )
    m = 60_000_000.0  # micros per minute
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        round_half_up(
            F.sum("gap_us").cast("double") / F.count(F.lit(1)).cast("double") / F.lit(m),
            4,
        ).alias("mean_gap_min"),
        round_half_up(F.percentile(F.col("gap_us"), F.lit(0.5)) / F.lit(m), 4).alias(
            "p50_gap_min"
        ),
        round_half_up(F.percentile(F.col("gap_us"), F.lit(0.9)) / F.lit(m), 4).alias(
            "p90_gap_min"
        ),
    )


_INTER_PURCHASE_SQL = f"""
WITH p AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us
  FROM events WHERE event_type = 'purchase'),
gaps AS (
  SELECT t_us - LAG(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
           AS gap_us
  FROM p)
SELECT COUNT(*) AS n_gaps,
       {sql_round_half_up("CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 60000000.0", 4)} AS mean_gap_min,
       {sql_round_half_up("quantile_cont(gap_us, 0.5) / 60000000.0", 4)} AS p50_gap_min,
       {sql_round_half_up("quantile_cont(gap_us, 0.9) / 60000000.0", 4)} AS p90_gap_min
FROM gaps
WHERE gap_us IS NOT NULL
"""


def event_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity matrix with share of total — the
    load-shape report behind capacity planning and anomaly baselines. One
    hash agg to ≤168 cells; the total re-aggregates the cell frame.
    Day-part portability: Spark's `dayofweek` is 1=Sunday while DuckDB's
    `dayofweek` is 0=Sunday — both sides use the ISO convention instead
    (Spark `weekday(ts)+1`, DuckDB `isodow(ts)`: 1=Monday…7=Sunday)."""
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.expr("weekday(ts)") + F.lit(1)).cast("long").alias("dow_iso"),
            F.hour("ts").cast("long").alias("hour"),
        )
        .groupBy("dow_iso", "hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    total = cells.agg(F.sum("n_events").alias("n_total"))
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            "dow_iso",
            "hour",
            "n_events",
            round_half_up(
                F.col("n_events").cast("double") / F.col("n_total").cast("double"), 5
            ).alias("share"),
        )
        .orderBy("dow_iso", "hour")
    )


_SEASONALITY_SQL = """
WITH cells AS (
  SELECT CAST(isodow(ts) AS BIGINT) AS dow_iso,
         CAST(hour(ts) AS BIGINT) AS hour,
         COUNT(*) AS n_events
  FROM events
  GROUP BY 1, 2)
SELECT dow_iso, hour, n_events,
       CAST(FLOOR((CAST(n_events AS DOUBLE)
             / CAST((SELECT SUM(n_events) FROM cells) AS DOUBLE)) * 100000.0 + 0.5)
            AS DOUBLE) / 100000.0 AS share
FROM cells
ORDER BY dow_iso, hour
"""


# EWMA weights: alpha=0.3, 24h horizon, scaled to exact int64 so the
# weighted sums are order-independent and engine-portable (embedding
# round(0.7^i * 1e6) as literals sidesteps cross-engine pow() rounding).
_EWMA_HORIZON = 24
_EWMA_W = [round(0.7**i * 1_000_000) for i in range(_EWMA_HORIZON)]


def hourly_event_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted 24h trailing average of hourly event counts
    per type — the smoothing companion to `hourly_ohlc`/`cusum_alerts`
    (TimescaleDB ships this as a hyperfunction; here it is pure algebra).

    Semantics: ewma(h) = Σ w_i·n(h−i) / Σ w_i over the PRESENT cells in
    the trailing 24 hours (absent hours contribute nothing and their
    weight is excluded — renormalized finite-horizon EWMA, deterministic
    on gapped series).

    Exactness: weights are int64 literals (round(0.7^i·10⁶) precomputed
    once in Python and embedded in BOTH engines), so numerator and
    denominator are exact int64 sums on any partitioning; the single
    float op is the final display division.

    Scale shape: facts collapse to |types|·|hours| cells (one shuffle);
    the 24× contribution fan-out and its re-aggregation run on CELLS.
    The shuffle of the contribution frame is keyed by (type, target
    hour) — bounded by the calendar, never by event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = F.array(
        *[
            F.struct(F.lit(i).alias("off"), F.lit(w).alias("w"))
            for i, w in enumerate(_EWMA_W)
        ]
    )
    contrib = (
        cells.select(
            "event_type",
            "hour",
            "n",
            F.explode(spine).alias("ow"),
        )
        .select(
            "event_type",
            (F.col("hour") + F.make_interval(hours=F.col("ow.off"))).alias("target"),
            (F.col("n") * F.col("ow.w")).alias("num"),
            F.col("ow.w").alias("den"),
        )
        .groupBy("event_type", "target")
        .agg(F.sum("num").alias("num"), F.sum("den").alias("den"))
    )
    return (
        cells.alias("c")
        .join(
            contrib.alias("k"),
            (F.col("c.event_type") == F.col("k.event_type"))
            & (F.col("c.hour") == F.col("k.target")),
        )
        .select(
            F.col("c.event_type").alias("event_type"),
            F.col("c.hour").alias("hour"),
            "n",
            round_half_up(
                F.col("k.num").cast("double") / F.col("k.den").cast("double"), 4
            ).alias("ewma"),
        )
        # no final orderBy: scaling output, order-insensitive gate (guide §2.4)
    )


_EWMA_SQL = f"""
WITH cells AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
spine AS (
  SELECT * FROM (VALUES {", ".join(f"({i}, {w})" for i, w in enumerate(_EWMA_W))})
         AS t(off, w)),
contrib AS (
  SELECT c.event_type,
         c.hour + to_hours(CAST(s.off AS BIGINT)) AS target,
         CAST(SUM(c.n * s.w) AS BIGINT) AS num,
         CAST(SUM(s.w) AS BIGINT) AS den
  FROM cells c CROSS JOIN spine s
  GROUP BY 1, 2)
SELECT c.event_type, c.hour, c.n,
       {sql_round_half_up("CAST(k.num AS DOUBLE) / CAST(k.den AS DOUBLE)", 4)} AS ewma
FROM cells c
JOIN contrib k ON k.event_type = c.event_type AND k.target = c.hour
ORDER BY c.event_type, c.hour
"""


# --- interval concurrency (sweep line over bounded cells) --------------------

_CONC_GAP_MIN = 30


def daily_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of simultaneously-active user sessions per day, with the
    earliest second (offset into the day) the peak is reached — the
    capacity-planning readout (max concurrent connections / vehicles /
    streams) computed as an exact sweep line.

    Sessions come from the native session_window (30-min gap, floor-to-
    second bounds, inclusive [start, end]); each session splits into ≤
    (days spanned) day segments; every segment contributes +1 at its start
    second and −1 after its end. The sweep is a running sum — but over
    (day, second) DELTA CELLS, not raw boundaries: cells are capped at
    86 401 per day no matter how many sessions the day holds, so the
    per-day ordered window never sees a data-sized partition (same
    cell-frame trick as `value_winsorized_stats` / `cusum_alerts`).

    Tie semantics: a session ending at second t and another starting at t
    overlap (inclusive end), matching the intuitive "both were active at
    t". All arithmetic is integer.
    """
    ev = load_table(spark, sf_dir, "events")
    sess = ev.groupBy("user_id", F.session_window("ts", f"{_CONC_GAP_MIN} minutes")).agg(
        F.unix_timestamp(F.min("ts")).alias("start_s"),
        F.unix_timestamp(F.max("ts")).alias("end_s"),
    )
    # day arithmetic stays on epoch integers (day = epoch div 86400) — no
    # timestamp/timezone round-trip to diverge between engines
    seg = (
        sess.withColumn(
            "di",
            F.explode(
                F.sequence(
                    F.expr("start_s div 86400"), F.expr("end_s div 86400")
                )
            ),
        )
        .withColumn("day", F.date_add(F.to_date(F.lit("1970-01-01")), F.col("di").cast("int")))
        .withColumn("day_start", F.col("di") * F.lit(86400))
    )
    starts = seg.select(
        "day",
        (F.greatest(F.col("start_s"), F.col("day_start")) - F.col("day_start")).alias("sec"),
        F.lit(1).alias("delta"),
    )
    ends = seg.select(
        "day",
        (
            F.least(F.col("end_s"), F.col("day_start") + F.lit(86399))
            - F.col("day_start")
            + F.lit(1)
        ).alias("sec"),
        F.lit(-1).alias("delta"),
    )
    cells = starts.unionByName(ends).groupBy("day", "sec").agg(
        F.sum("delta").alias("net")
    )
    per_day = Window.partitionBy("day")
    run = (
        Window.partitionBy("day")
        .orderBy("sec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = cells.withColumn("conc", F.sum("net").over(run)).withColumn(
        "peak", F.max("conc").over(per_day)
    )
    return (
        swept.filter(F.col("conc") == F.col("peak"))
        .groupBy("day")
        .agg(
            F.min("peak").cast("long").alias("peak_concurrent"),
            F.min("sec").cast("long").alias("at_second"),
        )
        .orderBy("day")
    )


_PEAK_CONC_SQL = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
flagged AS (
  -- microsecond-precision gap test, matching session_window's raw-ts
  -- semantics (see session_window_stats' oracle note)
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                   OR (epoch_us(ts) - epoch_us(prev_ts)) >= {_CONC_GAP_MIN * 60} * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM ordered),
sids AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged),
sess AS (
  SELECT user_id, session_id,
         CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS start_s,
         CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS end_s
  FROM sids GROUP BY user_id, session_id),
seg AS (
  SELECT DATE '1970-01-01' + CAST(di AS INTEGER) AS day,
         di * 86400 AS day_start,
         start_s, end_s
  FROM sess,
       LATERAL unnest(range(start_s // 86400, end_s // 86400 + 1)) AS t(di)),
deltas AS (
  SELECT day, GREATEST(start_s, day_start) - day_start AS sec, 1 AS delta FROM seg
  UNION ALL
  SELECT day, LEAST(end_s, day_start + 86399) - day_start + 1 AS sec, -1 AS delta FROM seg),
cells AS (SELECT day, sec, SUM(delta) AS net FROM deltas GROUP BY day, sec),
swept AS (
  SELECT day, sec,
         SUM(net) OVER (PARTITION BY day ORDER BY sec
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
  FROM cells),
peaks AS (
  SELECT day, sec, conc, MAX(conc) OVER (PARTITION BY day) AS peak FROM swept)
SELECT day,
       CAST(MIN(peak) AS BIGINT) AS peak_concurrent,
       CAST(MIN(sec) AS BIGINT) AS at_second
FROM peaks WHERE conc = peak
GROUP BY day
ORDER BY day
"""


# --- stickiness (DAU/MAU) ------------------------------------------------------


def monthly_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month engagement stickiness = mean DAU / MAU (the share of a
    month's users active on an average day) — the engagement-quality
    companion to `weekly_growth_accounting`'s volume view. Also reports
    MAU, mean DAU, and days with activity.

    Exactness: DAU and MAU are exact distinct counts from one (user, day)
    dedup; stickiness = Σdau / (n_days · mau) in integer round-half-up.
    The MAU distinct-aggregate runs on the already-deduped (user, day)
    relation, so no distinct aggregate touches the fact table.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = _register_cache(ev.select("user_id", F.to_date("ts").alias("day")).distinct().cache())
    with_m = ud.withColumn("month", F.trunc("day", "MM"))
    dau = with_m.groupBy("month", "day").agg(F.count(F.lit(1)).alias("dau"))
    per_month_days = dau.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("dau").alias("sum_dau")
    )
    mau = with_m.groupBy("month").agg(F.countDistinct("user_id").alias("mau"))
    return (
        per_month_days.join(mau, "month")
        .select(
            "month",
            "mau",
            "n_days",
            F.expr("(sum_dau * 20000 + n_days) div (2 * n_days)").cast("double").alias("_avg_dau_e4"),
            F.expr("(sum_dau * 20000 + n_days * mau) div (2 * n_days * mau)").cast("double").alias("_stick_e4"),
        )
        .select(
            "month",
            "mau",
            "n_days",
            (F.col("_avg_dau_e4") / F.lit(10000.0)).alias("avg_dau"),
            (F.col("_stick_e4") / F.lit(10000.0)).alias("stickiness"),
        )
        .orderBy("month")
    )


_STICKINESS_SQL = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
wm AS (SELECT user_id, day, CAST(date_trunc('month', day) AS DATE) AS month FROM ud),
dau AS (SELECT month, day, COUNT(*) AS dau FROM wm GROUP BY 1, 2),
pmd AS (SELECT month, COUNT(*) AS n_days, SUM(dau) AS sum_dau FROM dau GROUP BY month),
mau AS (SELECT month, COUNT(DISTINCT user_id) AS mau FROM wm GROUP BY month)
SELECT p.month,
       CAST(m.mau AS BIGINT) AS mau,
       CAST(p.n_days AS BIGINT) AS n_days,
       CAST((p.sum_dau * 20000 + p.n_days) // (2 * p.n_days) AS DOUBLE) / 10000.0 AS avg_dau,
       CAST((p.sum_dau * 20000 + p.n_days * m.mau) // (2 * p.n_days * m.mau) AS DOUBLE)
         / 10000.0 AS stickiness
FROM pmd p JOIN mau m USING (month)
ORDER BY p.month
"""


# --- cohort lifetime value -----------------------------------------------------


def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue ("LTV") triangle per weekly cohort: for each
    first-seen-week cohort and weeks-since-signup, the week's revenue, the
    cohort's cumulative revenue, and cumulative LTV per cohort user — the
    monetized companion of `cohort_retention` (same cohort definition, so
    the two triangles join on (cohort_week, week_n)).

    Exactness: revenue accumulates as int64 cents; the running sum windows
    over (cohort, week_n) CELLS — ≤ weeks² rows — never the fact table;
    LTV-per-user is int-div 4dp (cohort size from one broadcast join).
    """
    ev = load_table(spark, sf_dir, "events")
    uwk = ev.select(
        "user_id",
        F.to_date(F.date_trunc("week", F.col("ts"))).alias("event_week"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long").alias("cents"),
    )
    per_user_week = uwk.groupBy("user_id", "event_week").agg(
        F.sum("cents").alias("cents")
    )
    cohort = F.min("event_week").over(Window.partitionBy("user_id"))
    cw = per_user_week.withColumn("cohort_week", cohort)
    cells = cw.groupBy(
        "cohort_week",
        (F.datediff("event_week", "cohort_week") / 7).cast("long").alias("week_n"),
    ).agg(F.sum("cents").alias("rev_cents"))
    sizes = (
        cw.select("cohort_week", "user_id")
        .distinct()
        .groupBy("cohort_week")
        .agg(F.count(F.lit(1)).alias("n_cohort_users"))
    )
    run = (
        Window.partitionBy("cohort_week")
        .orderBy("week_n")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.withColumn("cum_cents", F.sum("rev_cents").over(run))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_n",
            "n_cohort_users",
            (F.col("rev_cents").cast("double") / F.lit(100.0)).alias("revenue"),
            (F.col("cum_cents").cast("double") / F.lit(100.0)).alias("cum_revenue"),
            (
                F.expr("(cum_cents * 200 + n_cohort_users) div (2 * n_cohort_users)").cast("double")
                / F.lit(100.0)
            ).alias("cum_ltv_per_user"),
        )
        .orderBy("cohort_week", "week_n")
    )


_COHORT_LTV_SQL = """
WITH puw AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS event_week,
         SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2),
cw AS (
  SELECT *, MIN(event_week) OVER (PARTITION BY user_id) AS cohort_week FROM puw),
cells AS (
  SELECT cohort_week,
         CAST(date_diff('day', cohort_week, event_week) // 7 AS BIGINT) AS week_n,
         SUM(cents) AS rev_cents
  FROM cw GROUP BY 1, 2),
sizes AS (
  SELECT cohort_week, COUNT(DISTINCT user_id) AS n_cohort_users FROM cw GROUP BY 1),
run AS (
  SELECT *,
         SUM(rev_cents) OVER (PARTITION BY cohort_week ORDER BY week_n
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
  FROM cells)
SELECT r.cohort_week, r.week_n,
       CAST(s.n_cohort_users AS BIGINT) AS n_cohort_users,
       CAST(r.rev_cents AS DOUBLE) / 100.0 AS revenue,
       CAST(r.cum_cents AS DOUBLE) / 100.0 AS cum_revenue,
       CAST((r.cum_cents * 200 + s.n_cohort_users) // (2 * s.n_cohort_users) AS DOUBLE)
         / 100.0 AS cum_ltv_per_user
FROM run r JOIN sizes s USING (cohort_week)
ORDER BY cohort_week, week_n
"""


# --- weekly growth accounting -------------------------------------------------


def weekly_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard growth-accounting decomposition per ISO week: every active
    user is exactly one of NEW (first-ever week), RETAINED (also active
    the previous week), or RESURRECTED (active before, but not last week);
    CHURNED counts last week's actives who went silent. The invariant
    active = new + retained + resurrected (and churn reconciles
    active_{w-1} = retained_w + churned_w) is the report's self-check —
    pinned in pytest.

    Scale: the fact table collapses to distinct (user, week) in one
    shuffle; first-week is a per-user min over that relation; the
    prev-week membership test is a self-equi-join on (user, week−1).
    Output is |weeks| rows. Weeks are integer epoch-day div 7 (no
    locale/timezone surface; epoch-aligned, so boundaries fall on
    Thursdays) displayed as the week's start day — identical arithmetic
    both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    uw = (
        ev.select(
            "user_id",
            F.expr("CAST(to_unix_timestamp(CAST(ts AS DATE)) div 86400 AS BIGINT) div 7").alias("week"),
        )
        .distinct()
        .cache()
    )
    uw = _register_cache(uw)
    first = uw.groupBy("user_id").agg(F.min("week").alias("first_week"))
    prev = uw.select("user_id", (F.col("week") + 1).alias("week"), F.lit(1).alias("active_prev"))
    classified = (
        uw.join(first, "user_id")
        .join(prev, ["user_id", "week"], "left")
        .select(
            "week",
            F.when(F.col("week") == F.col("first_week"), "new")
            .when(F.col("active_prev").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("stage"),
        )
    )
    counts = (
        classified.groupBy("week")
        .pivot("stage", ["new", "retained", "resurrected"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["new", "retained", "resurrected"])
    )
    active = uw.groupBy("week").agg(F.count(F.lit(1)).alias("n_active"))
    churn = (
        active.select((F.col("week") + 1).alias("week"), F.col("n_active").alias("prev_active"))
        .join(counts.select("week", "retained"), "week", "left")
        .select(
            "week",
            (F.col("prev_active") - F.coalesce(F.col("retained"), F.lit(0))).alias("n_churned"),
        )
    )
    return (
        active.join(counts, "week", "left")
        .join(churn, "week", "left")
        .select(
            F.date_add(F.to_date(F.lit("1970-01-01")), (F.col("week") * 7).cast("int")).alias(
                "week_start"
            ),
            "n_active",
            F.col("new").cast("long").alias("n_new"),
            F.col("retained").cast("long").alias("n_retained"),
            F.col("resurrected").cast("long").alias("n_resurrected"),
            F.coalesce(F.col("n_churned"), F.lit(0)).cast("long").alias("n_churned"),
        )
        .orderBy("week_start")
    )


_GROWTH_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         (epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP)) // 86400000000) // 7 AS week
  FROM events),
first AS (SELECT user_id, MIN(week) AS first_week FROM uw GROUP BY user_id),
classified AS (
  SELECT u.week,
         CASE WHEN u.week = f.first_week THEN 'new'
              WHEN p.user_id IS NOT NULL THEN 'retained'
              ELSE 'resurrected' END AS stage
  FROM uw u
  JOIN first f USING (user_id)
  LEFT JOIN uw p ON p.user_id = u.user_id AND p.week = u.week - 1),
counts AS (
  SELECT week,
         SUM(CASE WHEN stage = 'new' THEN 1 ELSE 0 END) AS n_new,
         SUM(CASE WHEN stage = 'retained' THEN 1 ELSE 0 END) AS n_retained,
         SUM(CASE WHEN stage = 'resurrected' THEN 1 ELSE 0 END) AS n_resurrected
  FROM classified GROUP BY week),
active AS (SELECT week, COUNT(*) AS n_active FROM uw GROUP BY week),
churn AS (
  SELECT a.week + 1 AS week, a.n_active - COALESCE(c.n_retained, 0) AS n_churned
  FROM active a LEFT JOIN counts c ON c.week = a.week + 1)
SELECT DATE '1970-01-01' + CAST(a.week * 7 AS INTEGER) AS week_start,
       CAST(a.n_active AS BIGINT) AS n_active,
       CAST(c.n_new AS BIGINT) AS n_new,
       CAST(c.n_retained AS BIGINT) AS n_retained,
       CAST(c.n_resurrected AS BIGINT) AS n_resurrected,
       CAST(COALESCE(ch.n_churned, 0) AS BIGINT) AS n_churned
FROM active a
LEFT JOIN counts c USING (week)
LEFT JOIN churn ch ON ch.week = a.week
ORDER BY week_start
"""


# --- year-over-year growth ---------------------------------------------------


def orders_monthly_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with the same-month-last-year comparison and growth
    ratio — the standard BI YoY readout. Computed as a self-join of the
    monthly cells on (month = month+12) rather than a lag window: the cell
    frame is calendar-bounded, the join is a broadcast-sized equi-join, and
    no global ordering is ever materialized.

    Revenue sums are exact int64 cents; the growth ratio divides two exact
    integers (one IEEE division + rounding, identical both engines).
    Months with no prior-year counterpart report NULLs — visible, not
    dropped.
    """
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(F.trunc("o_orderdate", "MM").alias("month")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    prev = monthly.select(
        F.add_months("month", 12).alias("month"), F.col("cents").alias("prev_cents")
    )
    growth = round_half_up(
        F.col("cents").cast("double") / F.col("prev_cents").cast("double") - F.lit(1.0),
        4,
    )
    return (
        monthly.join(prev, "month", "left")
        .select(
            "month",
            (F.col("cents").cast("double") / F.lit(100.0)).alias("revenue"),
            (F.col("prev_cents").cast("double") / F.lit(100.0)).alias("revenue_prev_year"),
            F.when(F.col("prev_cents").isNotNull(), growth).alias("yoy_growth"),
        )
        .orderBy("month")
    )


_YOY_SQL = f"""
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY 1)
SELECT m.month,
       CAST(m.cents AS DOUBLE) / 100.0 AS revenue,
       CAST(p.cents AS DOUBLE) / 100.0 AS revenue_prev_year,
       CASE WHEN p.cents IS NOT NULL THEN
         {sql_round_half_up("CAST(m.cents AS DOUBLE) / CAST(p.cents AS DOUBLE) - 1.0", 4)}
       END AS yoy_growth
FROM monthly m
LEFT JOIN monthly p ON CAST(p.month + INTERVAL 12 MONTH AS DATE) = m.month
ORDER BY m.month
"""


# --- recursive-CTE month spine ----------------------------------------------


def monthly_order_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free monthly order counts via Spark 4's WITH RECURSIVE — the
    SQL-surface twin of the `sequence+explode` spine in `user_missing_days`.
    The recursive CTE generates every month between the corpus min and max
    (zero-order months included, which a plain GROUP BY silently drops),
    then left-joins the per-month counts.

    Scale: recursion depth = number of months (calendar-bounded, ~tens),
    each step a one-row frame; the fact table contributes one
    partial-aggregated GROUP BY on a calendar-bounded key. The recursion is
    driver-plan-bounded, never data-sized — the safe recursive-CTE shape
    (contrast `near_dup_clusters`, where data-sized recursion is done with
    an explicit iterative loop + localCheckpoint instead).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__spine_orders")
    # the anchor row carries the upper bound so each recursive step is a
    # one-row select — a per-step scalar subquery would re-scan orders
    # every iteration (measured ~3× slower at sf0.01)
    return spark.sql("""
WITH RECURSIVE months(m, hi) AS (
  SELECT MIN(trunc(o_orderdate, 'MM')), MAX(trunc(o_orderdate, 'MM'))
  FROM __spine_orders
  UNION ALL
  SELECT add_months(m, 1), hi FROM months WHERE m < hi
)
SELECT m AS month, COALESCE(c.n, CAST(0 AS BIGINT)) AS n_orders
FROM months
LEFT JOIN (SELECT trunc(o_orderdate, 'MM') AS mm, COUNT(*) AS n
           FROM __spine_orders GROUP BY 1) c ON c.mm = m
ORDER BY month
""")


_MONTH_SPINE_SQL = """
WITH RECURSIVE months(m, hi) AS (
  SELECT CAST(MIN(date_trunc('month', o_orderdate)) AS DATE),
         CAST(MAX(date_trunc('month', o_orderdate)) AS DATE)
  FROM orders
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi FROM months WHERE m < hi
)
SELECT m AS month, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_orders
FROM months
LEFT JOIN (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mm, COUNT(*) AS n
           FROM orders GROUP BY 1) c ON c.mm = m
ORDER BY month
"""


# --- Kaplan–Meier cohort survival --------------------------------------------

KM_VALUE_THRESHOLD = 80.0  # a "premium" purchase = the event under study


def cohort_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier time-to-conversion curve per weekly signup cohort:
    the event under study is the user's first premium purchase (value >
    KM_VALUE_THRESHOLD); users who never convert are right-censored at
    their last observed day. KM handles that censoring correctly, which
    the naive "% converted by day N" number cannot (it counts users who
    simply haven't had a chance to convert yet as non-converters).

    Per user: duration = days from first event to conversion (or to last
    activity if censored). Per (cohort, duration): deaths d_t, censored
    c_t, at-risk n_t = cohort size minus everyone who left earlier;
    S(t) = Π_{s≤t} (1 − d_s/n_s), with the standard same-time convention
    (censored-at-t still count in n_t).

    Exactness: each factor's ln is rounded to 1e-9 fixed point and summed
    as int64 (order-independent); S = exp(cum/1e9) rounded to 1e-6. A
    cohort absorbed at t (d_t = n_t) gets survival exactly 0 from the
    flag, never ln(0).

    Scale: the fact table collapses to one row per user in the first
    aggregation; every window is partitioned by cohort over per-day cells
    (≤ calendar-days rows per cohort). Nothing global, nothing driver-side.
    """
    ev = load_table(spark, sf_dir, "events")
    hit_day = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("value") > KM_VALUE_THRESHOLD),
            F.to_date("ts"),
        )
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
        hit_day.alias("hit_day"),
    )
    tagged = per_user.select(
        F.to_date(F.date_trunc("week", F.col("first_day"))).alias("cohort_week"),
        F.datediff(
            F.coalesce(F.col("hit_day"), F.col("last_day")), F.col("first_day")
        )
        .cast("long")
        .alias("duration"),
        F.when(F.col("hit_day").isNotNull(), 1).otherwise(0).alias("observed"),
    )
    cells = tagged.groupBy("cohort_week", "duration").agg(
        F.sum("observed").alias("d"),
        F.sum(F.lit(1) - F.col("observed")).alias("c"),
    )
    per_cohort = Window.partitionBy("cohort_week")
    ordered = per_cohort.orderBy("duration")
    upto = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prior = ordered.rowsBetween(Window.unboundedPreceding, -1)
    n_at_risk = (
        F.sum(F.col("d") + F.col("c")).over(per_cohort)
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(prior), F.lit(0))
    )
    with_risk = cells.withColumn("n_at_risk", n_at_risk)
    term_e9 = F.when(
        F.col("d") < F.col("n_at_risk"),
        F.floor(
            F.log(
                (F.col("n_at_risk") - F.col("d")).cast("double")
                / F.col("n_at_risk").cast("double")
            )
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0))
    absorbed = F.max(
        F.when(F.col("d") >= F.col("n_at_risk"), 1).otherwise(0)
    ).over(upto)
    cum_e9 = F.sum(term_e9).over(upto)
    survival = F.when(absorbed == 1, F.lit(0.0)).otherwise(
        round_half_up(F.exp(cum_e9.cast("double") / F.lit(1e9)), 6)
    )
    return (
        with_risk.select(
            "cohort_week",
            "duration",
            "n_at_risk",
            F.col("d").alias("n_deaths"),
            F.col("c").alias("n_censored"),
            survival.alias("survival"),
        )
        .orderBy("cohort_week", "duration")
    )


_KM_SQL = f"""
WITH per_user AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day,
         MAX(CAST(ts AS DATE)) AS last_day,
         MIN(CASE WHEN event_type = 'purchase' AND value > {KM_VALUE_THRESHOLD}
                  THEN CAST(ts AS DATE) END) AS hit_day
  FROM events GROUP BY user_id),
tagged AS (
  SELECT CAST(date_trunc('week', first_day) AS DATE) AS cohort_week,
         date_diff('day', first_day, COALESCE(hit_day, last_day)) AS duration,
         CASE WHEN hit_day IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM per_user),
cells AS (
  SELECT cohort_week, duration,
         SUM(observed) AS d, SUM(1 - observed) AS c
  FROM tagged GROUP BY 1, 2),
risk AS (
  SELECT cohort_week, duration, d, c,
         SUM(d + c) OVER (PARTITION BY cohort_week)
         - COALESCE(SUM(d + c) OVER (PARTITION BY cohort_week ORDER BY duration
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_at_risk
  FROM cells),
terms AS (
  SELECT cohort_week, duration, d, c, n_at_risk,
         CASE WHEN d < n_at_risk
              THEN CAST(FLOOR(ln(CAST(n_at_risk - d AS DOUBLE)
                                 / CAST(n_at_risk AS DOUBLE)) * 1000000000.0 + 0.5)
                        AS BIGINT)
              ELSE 0 END AS term_e9,
         CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END AS dead
  FROM risk)
SELECT cohort_week, CAST(duration AS BIGINT) AS duration,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_deaths, CAST(c AS BIGINT) AS n_censored,
       CASE WHEN MAX(dead) OVER (PARTITION BY cohort_week ORDER BY duration
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
            THEN 0.0
            ELSE {sql_round_half_up(
                "exp(CAST(SUM(term_e9) OVER (PARTITION BY cohort_week ORDER BY duration "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1000000000.0)",
                6,
            )} END AS survival
FROM terms
ORDER BY cohort_week, duration
"""


# --- forecast backtest --------------------------------------------------------

BACKTEST_DAYS = 7  # held-out evaluation window (the trailing week)


def forecast_backtest_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: per event type, each held-out
    day's count is predicted by the mean count of the SAME ISO weekday in
    the training window (everything before the trailing BACKTEST_DAYS),
    and the report is MAPE and WAPE per event type over the held-out week
    — the sanity baseline every fancier forecaster must beat, and the
    drift alarm when yesterday's model stops fitting.

    Exactness: prediction = train_sum/train_n stays a rational; each
    absolute percentage error is the integer |a·n − s| · 1e6 DIV (a·n)
    and WAPE numerators |a·n − s| · 1e6 DIV n, so both metrics are exact
    integer arithmetic until the final display division. The holdout is
    DENSIFIED to the full |types|×BACKTEST_DAYS grid (r4 ADVICE): a day
    with zero events for a type is a real test row with actual 0, so it
    contributes to WAPE's numerator and is counted in n_zero_days while
    staying excluded from MAPE (the standard zero-actual convention) —
    without the grid, missing days silently vanish from the holdout and
    MAPE/WAPE overstate forecast quality for sparse types.

    Scale: the fact table collapses to (type, day) cells in one map-side
    combined pass; the densification grid is |types|×7 rows built from a
    broadcast 1-row horizon; everything after runs on ≤ |types|·days rows.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            (F.expr("weekday(ts)") + F.lit(1)).cast("long").alias("dow_iso"),
        )
        .groupBy("event_type", "day", "dow_iso")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    horizon = daily.agg(F.max("day").alias("hmax"))
    tagged = daily.crossJoin(F.broadcast(horizon)).withColumn(
        "is_test", (F.datediff(F.col("hmax"), F.col("day")) < BACKTEST_DAYS)
    )
    train = (
        tagged.filter(~F.col("is_test"))
        .groupBy("event_type", "dow_iso")
        .agg(F.sum("n").alias("s"), F.count(F.lit(1)).alias("cnt"))
    )
    # dense holdout grid: every (type, day) cell of the trailing week, with
    # actual 0 where the type logged nothing that day
    hold_days = horizon.select(
        F.explode(
            F.sequence(
                F.date_sub(F.col("hmax"), BACKTEST_DAYS - 1), F.col("hmax")
            )
        ).alias("day")
    ).select("day", (F.expr("weekday(day)") + F.lit(1)).cast("long").alias("dow_iso"))
    grid = daily.select("event_type").distinct().crossJoin(F.broadcast(hold_days))
    test = (
        grid.join(daily.select("event_type", "day", "n"), ["event_type", "day"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .join(F.broadcast(train), ["event_type", "dow_iso"])
    )
    err = F.abs(F.col("n") * F.col("cnt") - F.col("s"))
    ape_e6 = F.expr("(err * 1000000) DIV (n * cnt)")
    abs_e6 = F.expr("(err * 1000000) DIV cnt")
    scored = test.withColumn("err", err).select(
        "event_type",
        "n",
        F.when(F.col("n") > 0, ape_e6).alias("ape_e6"),
        abs_e6.alias("abs_e6"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test_days"),
            F.sum(F.when(F.col("n") == 0, 1).otherwise(0)).alias("n_zero_days"),
            F.expr("SUM(ape_e6) DIV COUNT(ape_e6)").alias("_mape_e6"),
            F.expr("CASE WHEN SUM(n) > 0 THEN SUM(abs_e6) DIV SUM(n) END").alias(
                "_wape_e6"
            ),
        )
        .select(
            "event_type",
            "n_test_days",
            "n_zero_days",
            (F.col("_mape_e6").cast("double") / F.lit(1e6)).alias("mape"),
            (F.col("_wape_e6").cast("double") / F.lit(1e6)).alias("wape"),
        )
        .orderBy("event_type")
    )


_BACKTEST_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, isodow(ts) AS dow_iso,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3),
horizon AS (SELECT MAX(day) AS hmax FROM daily),
tagged AS (
  SELECT d.*, date_diff('day', day, hmax) < {BACKTEST_DAYS} AS is_test
  FROM daily d CROSS JOIN horizon),
train AS (
  SELECT event_type, dow_iso, SUM(n) AS s, COUNT(*) AS cnt
  FROM tagged WHERE NOT is_test GROUP BY 1, 2),
hold_days AS (
  SELECT CAST(hmax AS DATE) - CAST({BACKTEST_DAYS} - 1 - i.range AS INTEGER) AS day,
         isodow(CAST(hmax AS DATE) - CAST({BACKTEST_DAYS} - 1 - i.range AS INTEGER))
           AS dow_iso
  FROM horizon CROSS JOIN range({BACKTEST_DAYS}) i),
grid AS (
  SELECT t.event_type, h.day, h.dow_iso
  FROM (SELECT DISTINCT event_type FROM daily) t CROSS JOIN hold_days h),
test AS (
  SELECT g.event_type, g.dow_iso, COALESCE(d.n, 0) AS n
  FROM grid g LEFT JOIN daily d
    ON d.event_type = g.event_type AND d.day = g.day),
scored AS (
  SELECT t.event_type, t.n,
         CASE WHEN t.n > 0
              THEN (abs(t.n * tr.cnt - tr.s) * 1000000) // (t.n * tr.cnt) END AS ape_e6,
         (abs(t.n * tr.cnt - tr.s) * 1000000) // tr.cnt AS abs_e6
  FROM test t JOIN train tr USING (event_type, dow_iso))
SELECT event_type,
       COUNT(*) AS n_test_days,
       CAST(SUM(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_days,
       CAST((SUM(ape_e6) // COUNT(ape_e6)) AS DOUBLE) / 1000000.0 AS mape,
       CASE WHEN SUM(n) > 0
            THEN CAST((SUM(abs_e6) // SUM(n)) AS DOUBLE) / 1000000.0 END AS wape
FROM scored
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "daily_peak_concurrency": daily_peak_concurrency,
    "cohort_survival_km": cohort_survival_km,
    "forecast_backtest_mape": forecast_backtest_mape,
    "monthly_order_spine": monthly_order_spine,
    "orders_monthly_yoy": orders_monthly_yoy,
    "weekly_growth_accounting": weekly_growth_accounting,
    "cohort_ltv": cohort_ltv,
    "monthly_stickiness": monthly_stickiness,
    "hourly_event_ewma": hourly_event_ewma,
    "event_seasonality": event_seasonality,
    "inter_purchase_gaps": inter_purchase_gaps,
    "user_missing_days": user_missing_days,
    "cohort_retention": cohort_retention,
    "rolling_7d_active_users": rolling_7d_active_users,
    "hourly_gapfill_locf": hourly_gapfill_locf,
    "hourly_gapfill_interpolate": hourly_gapfill_interpolate,
    "daily_fleet_rollup": daily_fleet_rollup,
    "time_weighted_avg": time_weighted_avg,
    "counter_rate": counter_rate,
    "hourly_ohlc": hourly_ohlc,
}

ORACLES = {
    "daily_peak_concurrency": _PEAK_CONC_SQL,
    "cohort_survival_km": _KM_SQL,
    "forecast_backtest_mape": _BACKTEST_SQL,
    "monthly_order_spine": _MONTH_SPINE_SQL,
    "orders_monthly_yoy": _YOY_SQL,
    "weekly_growth_accounting": _GROWTH_SQL,
    "cohort_ltv": _COHORT_LTV_SQL,
    "monthly_stickiness": _STICKINESS_SQL,
    "hourly_event_ewma": _EWMA_SQL,
    "event_seasonality": _SEASONALITY_SQL,
    "inter_purchase_gaps": _INTER_PURCHASE_SQL,
    "user_missing_days": _MISSING_DAYS_SQL,
    "cohort_retention": _COHORT_SQL,
    "rolling_7d_active_users": _ROLLING_7D_SQL,
    "hourly_gapfill_locf": _GAPFILL_SQL,
    "hourly_gapfill_interpolate": _GAPFILL_INTERP_SQL,
    "daily_fleet_rollup": _DAILY_ROLLUP_SQL,
    "time_weighted_avg": _TWA_SQL,
    "counter_rate": _COUNTER_RATE_SQL,
    "hourly_ohlc": _OHLC_SQL,
}
