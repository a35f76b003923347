"""OLAP extensions beyond the reference's operator set: pivot, rollup/cube,
exact-moment statistics, percentiles, approximate aggregates.

The reference has no grouping sets, no distinct aggregates, no statistics
beyond COUNT/MAX/MIN/SUM (SURVEY.md §2.4) — these are the standard
capabilities a fleet-analytics user reaches for next, each expressed as a
single declarative plan.

Determinism: stddev/corr are NOT computed with Spark's built-in
stddev/corr (whose internal float accumulation is partition-order-
dependent); they are derived from exact scaled-integer moment sums
(n, Σx, Σx², Σxy), making the final doubles bit-identical on any cluster
size and equal to the ANSI twin. Approximate aggregates (HLL/quantile
sketches) are engine-specific by design → rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import round_half_up, sql_round_half_up

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


# --- pivot -----------------------------------------------------------------


def user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per user pivoted into one column per event type.

    Explicit pivot values → single-pass pivot (no extra distinct scan);
    equivalent to conditional aggregation, which is the ANSI twin.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("user_id")
    )


_PIVOT_SQL = f"""
SELECT user_id,
       {", ".join(f"CAST(COALESCE(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END), 0) AS BIGINT) AS {t}" for t in EVENT_TYPES)}
FROM events
GROUP BY user_id
ORDER BY user_id
"""


# --- rollup ----------------------------------------------------------------


def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts + exact total price by (status, priority) with subtotal
    and grand-total rows (ROLLUP grouping sets)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")).cast("double")
                / 100.0
            ).alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping sets — per-pair,
    per-status, per-priority, grand total. Physically one pass: Spark's
    Expand operator replicates each input row once per grouping set before
    a single hash aggregation (no re-scan per set)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")).cast("double")
                / 100.0
            ).alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# --- JSON extraction --------------------------------------------------------


def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON `props` column and aggregate its `k` field per event
    type — covers the reference's JSONB metadata column (sql/01_schema.sql:67,
    declared but never queried; this is the query its schema anticipates).
    JSON path extraction is JVM-side (`get_json_object`), never a UDF."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


def props_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON schema-drift profiler for the open-schema `props` column: every
    top-level key with its row coverage and a numeric-vs-string type vote —
    the report that catches a producer silently adding keys or changing a
    field's type (the operational failure mode of schemaless columns).
    Key discovery is `json_object_keys` (JVM-side), typed votes use
    `get_json_object` re-extraction per discovered key occurrence.

    Scale: explode is bounded by keys-per-row (small by construction of any
    sane event schema); aggregation key = key name (tiny); one fact scan.
    """
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.explode(F.json_object_keys(F.col("props"))).alias("key"), "props"
    )
    val = F.expr("get_json_object(props, concat('$.', key))")
    typed = keyed.select(
        "key",
        val.alias("v"),
    ).select(
        "key",
        F.when(F.col("v").rlike(r"^-?[0-9]+(\.[0-9]+)?$"), 1).otherwise(0).alias("numeric"),
    )
    n_rows = ev.select(F.count(F.lit(1)).alias("n_rows"))
    return (
        typed.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.sum("numeric").alias("n_numeric"),
        )
        .crossJoin(F.broadcast(n_rows))
        .select(
            "key",
            "n_present",
            "n_numeric",
            (F.col("n_present") - F.col("n_numeric")).alias("n_non_numeric"),
            F.expr("(n_present * 20000 + n_rows) div (2 * n_rows)").cast("double")
            .alias("coverage_e4"),
        )
        .withColumn("coverage", F.col("coverage_e4") / F.lit(10000.0))
        .drop("coverage_e4")
        .orderBy("key")
    )


_PROPS_KEYS_SQL = """
WITH keyed AS (
  SELECT unnest(json_keys(props)) AS key, props FROM events),
typed AS (
  SELECT key,
         CASE WHEN regexp_matches(json_extract_string(props, '$.' || key),
                                  '^-?[0-9]+(\\.[0-9]+)?$')
              THEN 1 ELSE 0 END AS numeric
  FROM keyed),
n AS (SELECT COUNT(*) AS n_rows FROM events)
SELECT key,
       CAST(COUNT(*) AS BIGINT) AS n_present,
       CAST(SUM(numeric) AS BIGINT) AS n_numeric,
       CAST(COUNT(*) - SUM(numeric) AS BIGINT) AS n_non_numeric,
       CAST((COUNT(*) * 20000 + MIN(n_rows)) // (2 * MIN(n_rows)) AS DOUBLE) / 10000.0
         AS coverage
FROM typed CROSS JOIN n
GROUP BY key
ORDER BY key
"""


def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 VariantType path over the same JSONB-surrogate column:
    `parse_json` shreds props to a binary variant ONCE, `try_variant_get`
    extracts a typed field without re-parsing text per access — the
    semi-structured layout that replaces per-query string parsing
    (`props_json_stats` is the classic `get_json_object` twin). At 100 TB
    the variant parse is paid once per row scan instead of once per
    extracted path, and open-schema columns stay queryable without
    migrations. Output: per type, parse coverage, distinct k, exact mean k.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("k").alias("n_with_k"),
            F.countDistinct("k").alias("n_distinct_k"),
            round_half_up(
                F.sum("k").cast("double") / F.count("k").cast("double"), 4
            ).alias("mean_k"),
        )
        .orderBy("event_type")
    )


_PROPS_VARIANT_SQL = f"""
SELECT event_type,
       COUNT(*) AS n_rows,
       COUNT(k) AS n_with_k,
       COUNT(DISTINCT k) AS n_distinct_k,
       {sql_round_half_up("CAST(SUM(k) AS DOUBLE) / CAST(COUNT(k) AS DOUBLE)", 4)} AS mean_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events) t
GROUP BY event_type
ORDER BY event_type
"""


_PROPS_JSON_SQL = """
SELECT event_type,
       COUNT(k) AS n_with_k, MIN(k) AS min_k, MAX(k) AS max_k, CAST(SUM(k) AS BIGINT) AS sum_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events) t
GROUP BY event_type
ORDER BY event_type
"""


# --- histogram binning ------------------------------------------------------

_BIN_W = 50.0
_N_BINS = 10


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of `value` (10 bins of 50, clamped): binning is
    floor(value/width) clamped to [0, bins-1] — a portable width_bucket
    (DuckDB has no width_bucket builtin)."""
    ev = load_table(spark, sf_dir, "events")
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / F.lit(_BIN_W)).cast("int"), F.lit(0)),
        F.lit(_N_BINS - 1),
    )
    return (
        ev.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn("lo", F.col("bin").cast("double") * _BIN_W)
        .select("bin", "lo", "n_events")
        .orderBy("bin")
    )


_HISTOGRAM_SQL = f"""
SELECT bin, CAST(bin AS DOUBLE) * {_BIN_W} AS lo, COUNT(*) AS n_events
FROM (
  SELECT LEAST(GREATEST(CAST(FLOOR(value / {_BIN_W}) AS INT), 0), {_N_BINS - 1}) AS bin
  FROM events) t
GROUP BY bin
ORDER BY bin
"""


# --- set operations ----------------------------------------------------------


def retained_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users active in both the first and the last week of the data —
    INTERSECT of two filtered projections (dedupes like the ANSI operator).
    Physically a left-semi join after per-side distinct."""
    ev = load_table(spark, sf_dir, "events")
    first_week = ev.filter(
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp")
    ).select("user_id")
    last_week = ev.filter(
        F.col("ts") >= F.lit("2024-01-24 00:00:00").cast("timestamp")
    ).select("user_id")
    return first_week.intersect(last_week).orderBy("user_id")


_RETAINED_SQL = """
SELECT user_id FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
INTERSECT
SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-24 00:00:00'
ORDER BY user_id
"""


def churned_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who purchased in the first week but not in the last — EXCEPT
    (anti-join after distinct). Scoped to purchases: the any-event variant
    is empty at every SF (every synthetic user stays active)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    first_week = ev.filter(
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp")
    ).select("user_id")
    last_week = ev.filter(
        F.col("ts") >= F.lit("2024-01-24 00:00:00").cast("timestamp")
    ).select("user_id")
    return first_week.subtract(last_week).orderBy("user_id")


_CHURNED_SQL = """
SELECT user_id FROM events
WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-08 00:00:00'
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-24 00:00:00'
ORDER BY user_id
"""


# --- exact-moment statistics ----------------------------------------------


def event_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type mean / sample stddev / min / max of `value`, with the
    variance derived from exact integer moment sums:
        var = (n·Σx² − (Σx)²) / (n·(n−1))   over x in cents.
    Every intermediate is int64 (exact) until the final double divisions."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("sx"),
        F.sum(cents * cents).alias("sxx"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    var_cents2 = (F.col("n").cast("double") * sxx - sx * sx) / (n * (n - F.lit(1.0)))
    return agg.select(
        "event_type",
        "n",
        round_half_up(sx / n / F.lit(100.0), 4).alias("mean_value"),
        round_half_up(F.sqrt(var_cents2) / F.lit(100.0), 4).alias("stddev_value"),
        "min_value",
        "max_value",
    ).orderBy("event_type")


_STATS_SQL = f"""
WITH m AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS sx,
         SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
             * CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS sxx,
         MIN(value) AS min_value,
         MAX(value) AS max_value
  FROM events GROUP BY event_type)
SELECT event_type, n,
       {sql_round_half_up("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0", 4)} AS mean_value,
       {sql_round_half_up(
           "sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
           " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 100.0", 4)} AS stddev_value,
       min_value, max_value
FROM m
ORDER BY event_type
"""


def value_k_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between `value` and the JSON `k` field, per
    event type, from exact integer moment sums:
        r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))
    Spark's builtin corr accumulates floats partition-order-dependently;
    this formulation is bit-identical on any cluster size and equal to the
    ANSI twin (x in cents, y integer)."""
    ev = load_table(spark, sf_dir, "events")
    x = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    y = F.get_json_object(F.col("props"), "$.k").cast("long")
    agg = ev.filter(y.isNotNull()).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    r = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return agg.select(
        "event_type", "n", round_half_up(r, 6).alias("pearson_r")
    ).orderBy("event_type")


_CORR_SQL = f"""
WITH m AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM (
    SELECT event_type,
           CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS x,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
    FROM events) t
  WHERE y IS NOT NULL
  GROUP BY event_type)
SELECT event_type, n,
       {sql_round_half_up(
           "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
           " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))", 6)}
         AS pearson_r
FROM m
ORDER BY event_type
"""


# --- exact percentiles -----------------------------------------------------

_PCTS = (0.5, 0.9, 0.99)


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles of `value` per event type (linear
    interpolation, ≡ DuckDB `quantile_cont` through the shared rounding).

    Scale: NOT `F.percentile` — that buffers every group value in one
    aggregation buffer (billions of rows per popular type at 100 TB).
    The cent-priced `value` domain is bounded, so facts collapse to
    (type, value, count) cells first and the exact order statistics come
    from the cell CDF (`functions.quantiles.quantiles_from_cells`,
    bit-identical to `F.percentile`'s interpolation; equality pinned in
    tests/test_scalars.py)."""
    from ..functions.quantiles import quantiles_from_cells

    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("cnt"))
    names = [f"p{int(p * 100)}" for p in _PCTS]
    q = quantiles_from_cells(cells, ["event_type"], "value", "cnt", _PCTS, names)
    return q.select(
        "event_type", *[round_half_up(F.col(nm), 4).alias(nm) for nm in names]
    ).orderBy("event_type")


_PCT_SQL = f"""
SELECT event_type,
       {", ".join(sql_round_half_up(f"quantile_cont(value, {p})", 4) + f" AS p{int(p * 100)}" for p in _PCTS)}
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --- approximate aggregates (rows-only: sketch impls differ by engine) -----


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user estimate per event type, with relative
    error vs the exact count. Rows-only check: DuckDB's approx_count_distinct
    uses a different sketch, so only our own exact-count comparison is
    meaningful."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .withColumn(
            "rel_error",
            round_half_up(
                F.abs(F.col("approx_users") - F.col("exact_users")).cast("double")
                / F.col("exact_users").cast("double"),
                4,
            ),
        )
        .orderBy("event_type")
    )


def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles per event type (`approx_percentile`, the
    KLL/GK-family single-pass estimator) next to the exact answers, with the
    worst absolute relative error across the three quantiles. Rows-only
    check, like `approx_distinct_users`: DuckDB's approx sketch differs, so
    the in-row exact comparison is the meaningful bound. At 100 TB this is
    the only viable percentile path — the sketch merges associatively in a
    partial+final hash agg; the exact twin (value_percentiles) exists to
    bound its error at test scale."""
    ev = load_table(spark, sf_dir, "events")
    out = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("approx"),
        F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("exact"),
    )
    rel_err = F.array_max(
        F.zip_with(
            F.col("approx"),
            F.col("exact"),
            lambda a, e: F.abs(a.cast("double") - e) / e,
        )
    )
    return out.select(
        "event_type",
        F.col("approx")[0].cast("double").alias("approx_p50"),
        F.col("approx")[1].cast("double").alias("approx_p90"),
        F.col("approx")[2].cast("double").alias("approx_p99"),
        round_half_up(F.col("exact")[0], 4).alias("exact_p50"),
        round_half_up(F.col("exact")[1], 4).alias("exact_p90"),
        round_half_up(F.col("exact")[2], 4).alias("exact_p99"),
        round_half_up(rel_err, 4).alias("max_rel_error"),
    ).orderBy("event_type")


_DECILES = [i / 10.0 for i in range(1, 10)]


def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile segmentation of customers by total order spend — the
    at-scale substitute for NTILE: a global NTILE needs a single-partition
    window over every customer, while this shape computes the nine exact
    percentile BOUNDARIES on the per-customer aggregate (tiny frame), then
    assigns deciles with a broadcast compare — fully parallel at any
    cardinality. Bucket rule: decile = 1 + #{boundaries < spend}, ties land
    in the lower bucket; boundaries are linear-interpolated percentiles, so
    bucket populations may differ by ±1-ish from a rank-based NTILE at tied
    values — the standard boundary-bucketing semantics, identical in both
    engines.

    Spend is exact (int64 cents); the report per decile is count + exact
    min/max/total spend.
    """
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    bounds = spend.agg(
        *[
            F.percentile(F.col("cents"), F.lit(p)).alias(f"b{int(p * 10)}")
            for p in _DECILES
        ]
    )
    decile = (
        F.lit(1)
        + sum(
            F.when(F.col("cents").cast("double") > F.col(f"b{int(p * 10)}"), 1).otherwise(0)
            for p in _DECILES
        )
    ).cast("long")
    return (
        spend.crossJoin(F.broadcast(bounds))
        .select("o_custkey", "cents", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.min("cents").cast("double") / F.lit(100.0)).alias("spend_min"),
            (F.max("cents").cast("double") / F.lit(100.0)).alias("spend_max"),
            (F.sum("cents").cast("double") / F.lit(100.0)).alias("spend_total"),
        )
        .orderBy("decile")
    )


_DECILE_SQL = f"""
WITH spend AS (
  SELECT o_custkey,
         SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey),
bounds AS (
  SELECT {", ".join(f"quantile_cont(cents, {p}) AS b{int(p * 10)}" for p in _DECILES)}
  FROM spend),
assigned AS (
  SELECT o_custkey, cents,
         CAST(1 + {" + ".join(f"CASE WHEN CAST(cents AS DOUBLE) > b{int(p * 10)} THEN 1 ELSE 0 END" for p in _DECILES)} AS BIGINT) AS decile
  FROM spend CROSS JOIN bounds)
SELECT decile,
       COUNT(*) AS n_customers,
       CAST(MIN(cents) AS DOUBLE) / 100.0 AS spend_min,
       CAST(MAX(cents) AS DOUBLE) / 100.0 AS spend_max,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS spend_total
FROM assigned
GROUP BY decile
ORDER BY decile
"""


def hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-sketch COUNT DISTINCT — the re-aggregatable path that
    `caggs.py` uses for sums, extended to distincts: per-day Datasketches
    HLL sketches (`hll_sketch_agg`) are the stored rollup, and ANY coarser
    window is `hll_union_agg` over the daily sketches — no raw rescan. At
    100 TB the nightly job stores |types|·|days| kilobyte sketches; every
    dashboard window is a union over them. Rows-only check (sketch binaries
    are engine-specific); the in-row invariants carry the proof: the
    union-of-daily estimate must equal the direct whole-range estimate
    (mergeability), both within HLL error of the exact count.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    unioned = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_direct"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return (
        unioned.join(direct, "event_type")
        .select(
            "event_type",
            "exact_users",
            "est_direct",
            "est_union",
            (F.col("est_union") == F.col("est_direct")).alias("union_equals_direct"),
        )
        .orderBy("event_type")
    )


def theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA — the capability HLL lacks: per event-type pair,
    Datasketches Theta sketches of the user sets support estimated
    intersection and difference, the audience-overlap / retargeting
    primitive ("how many viewers also purchased?") computable from stored
    kilobyte sketches with NO re-scan of either side. Every pair row
    carries the exact counts alongside the estimates, so the audit is
    in-row (same pattern as `hll_mergeable_distinct` / `cms_token_counts`).

    Rows-only check by design: sketch binaries/estimates are
    engine-specific. The exactness of the exact columns and the estimate
    error bounds are pinned by pytest instead.

    Scale: one sketch per (type) — mergeable across partitions/days; the
    pairwise algebra runs on |types|² kilobyte sketches at the driver-side
    of the plan (broadcast scale), never on user rows.
    """
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_n"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"), F.col("exact_n").alias("exact_a")
    )
    b = sk.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"), F.col("exact_n").alias("exact_b")
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    exact_inter = (
        ev.select("event_type", "user_id")
        .distinct()
        .alias("x")
        .join(
            ev.select(
                F.col("event_type").alias("type_b"), F.col("user_id").alias("ub")
            ).distinct().alias("y"),
            (F.col("x.user_id") == F.col("y.ub")) & (F.col("x.event_type") < F.col("y.type_b")),
        )
        .groupBy(F.col("x.event_type").alias("type_a"), "type_b")
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    return (
        pairs.withColumn(
            "est_overlap",
            F.round(F.theta_sketch_estimate(F.theta_intersection("sk_a", "sk_b"))).cast("long"),
        )
        .withColumn(
            "est_only_a",
            F.round(F.theta_sketch_estimate(F.theta_difference("sk_a", "sk_b"))).cast("long"),
        )
        .join(exact_inter, ["type_a", "type_b"], "left")
        .withColumn("exact_overlap", F.coalesce(F.col("exact_overlap"), F.lit(0)))
        .select(
            "type_a",
            "type_b",
            "exact_a",
            "exact_b",
            "exact_overlap",
            "est_overlap",
            "est_only_a",
            (F.col("exact_a") - F.col("exact_overlap")).alias("exact_only_a"),
        )
        .orderBy("type_a", "type_b")
    )


def distinct_users_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISTINCT-aggregate twin (expand + two-phase agg in Spark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


_DISTINCT_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --- explicit GROUPING SETS (neither ROLLUP nor CUBE) -----------------------


def status_priority_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts by status-only and by priority-only in one pass —
    GROUPING SETS ((o_orderstatus), (o_orderpriority)), the general form the
    reference's PostgreSQL engine offers but its queries never use
    (SURVEY.md §2.4: "no grouping sets").

    Spark 4 DataFrame API `groupingSets` → one Expand + one hash aggregate,
    same physical shape as CUBE/ROLLUP: each input row is replicated once
    per set, so the scan happens exactly once regardless of set count.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")).cast("double")
                / 100.0
            ).alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# --- unpivot (wide metrics back to long form) -------------------------------


def user_metric_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user wide aggregate (one count column per event type) unpivoted
    to long (user_id, metric, n) form — `DataFrame.unpivot`, the inverse of
    the pivot in `user_event_pivot`.

    Physically: one scan + hash aggregate builds the wide row, then Expand
    emits one output row per metric column — no shuffle beyond the
    aggregation's own, no re-scan per metric. Long form is the shape feature
    stores and metric sinks ingest at scale.
    """
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
            for t in EVENT_TYPES
        ]
    )
    return (
        wide.unpivot(
            ids=["user_id"],
            values=[f"n_{t}" for t in EVENT_TYPES],
            variableColumnName="metric",
            valueColumnName="n",
        )
        .filter(F.col("n") > 0)
        .orderBy("user_id", "metric")
    )


_UNPIVOT_SQL = f"""
WITH wide AS (
  SELECT user_id,
         {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in EVENT_TYPES)}
  FROM events GROUP BY user_id
)
SELECT user_id, metric, n
FROM wide UNPIVOT INCLUDE NULLS (n FOR metric IN ({", ".join(f"n_{t}" for t in EVENT_TYPES)}))
WHERE n > 0
ORDER BY user_id, metric
"""


# --- full outer join (segment users by which side they appear on) ----------


def viewers_vs_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-user view counts against per-user purchase
    counts, segmenting every user as view_only / purchase_only / both.
    Completes the engine's join-type matrix (inner/left/semi/anti/cross are
    exercised elsewhere; SURVEY.md §2.3: reference uses LEFT only).

    Both inputs are post-aggregation (≈1 row per user), so the full-outer
    shuffle is over already-reduced data — the same key-partitioned exchange
    a 1000-executor run would want; no broadcast (full outer cannot
    broadcast either side in Spark).
    """
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.count(F.lit(1)).alias("n_views"))
    )
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    joined = views.join(buys, "user_id", "full_outer")
    return joined.select(
        "user_id",
        F.coalesce("n_views", F.lit(0)).alias("n_views"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.when(F.col("n_views").isNull(), F.lit("purchase_only"))
        .when(F.col("n_purchases").isNull(), F.lit("view_only"))
        .otherwise(F.lit("both"))
        .alias("segment"),
    ).orderBy("user_id")


_FULL_OUTER_SQL = """
WITH views AS (
  SELECT user_id, COUNT(*) AS n_views FROM events WHERE event_type = 'view' GROUP BY user_id
), buys AS (
  SELECT user_id, COUNT(*) AS n_purchases FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT COALESCE(v.user_id, b.user_id) AS user_id,
       COALESCE(v.n_views, 0) AS n_views,
       COALESCE(b.n_purchases, 0) AS n_purchases,
       CASE WHEN v.user_id IS NULL THEN 'purchase_only'
            WHEN b.user_id IS NULL THEN 'view_only'
            ELSE 'both' END AS segment
FROM views v FULL OUTER JOIN buys b ON v.user_id = b.user_id
ORDER BY user_id
"""


def value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 3-sigma anomaly detection: events whose value deviates from
    the user's mean by more than 3 population standard deviations. The
    telemetry QA pass behind every fleet-health dashboard (the reference's
    alert rules — src/processing/consumer.py:90-124 — are fixed-threshold;
    this is the per-entity adaptive-threshold upgrade).

    Determinism contract: moments come from exact scaled-int64 sums
    (n, Σx, Σx²) so mean/std are bit-identical to the oracle; the z-test
    compares raw values against those thresholds with a mirrored IEEE
    expression chain — no floats are emitted, only matched rows. Plan:
    one hash-aggregate over the fact, joined back (AQE broadcasts the
    per-user stats side when small; at 100 TB both sides hash-partition on
    user_id and the aggregate side is |users| rows, far below the fact)."""
    ev = load_table(spark, sf_dir, "events")
    scaled = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    m = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(scaled).alias("s1"),
        F.sum(scaled * scaled).alias("s2"),
    )
    mean_v = (F.col("s1").cast("double") / F.lit(100.0)) / F.col("n").cast("double")
    var_v = (F.col("s2").cast("double") / F.lit(10000.0)) / F.col("n").cast(
        "double"
    ) - mean_v * mean_v
    stats = m.select(
        "user_id",
        F.col("n"),
        mean_v.alias("mean_v"),
        F.sqrt(F.greatest(var_v, F.lit(0.0))).alias("std_v"),
    )
    return (
        ev.join(stats, "user_id")
        .filter(
            (F.col("n") >= 2)
            & (F.col("std_v") > 0)
            & (F.abs(F.col("value") - F.col("mean_v")) > F.lit(3.0) * F.col("std_v"))
        )
        .select("user_id", "event_id", "value")
        .orderBy("user_id", "event_id")
    )


_OUTLIERS_SQL = """
WITH m AS (
    SELECT user_id, COUNT(*) AS n,
           SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS s1,
           SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
               * CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS s2
    FROM events GROUP BY user_id
), s AS (
    SELECT user_id, n,
           (CAST(s1 AS DOUBLE) / 100.0) / CAST(n AS DOUBLE) AS mean_v,
           sqrt(GREATEST(
               (CAST(s2 AS DOUBLE) / 10000.0) / CAST(n AS DOUBLE)
               - ((CAST(s1 AS DOUBLE) / 100.0) / CAST(n AS DOUBLE))
                 * ((CAST(s1 AS DOUBLE) / 100.0) / CAST(n AS DOUBLE)),
               0.0)) AS std_v
    FROM m
)
SELECT e.user_id, e.event_id, e.value
FROM events e JOIN s USING (user_id)
WHERE s.n >= 2 AND s.std_v > 0 AND abs(e.value - s.mean_v) > 3.0 * s.std_v
ORDER BY e.user_id, e.event_id
"""


# association-rule thresholds, enforced by integer cross-multiplication
RULE_MIN_SUPPORT_PCT = 1  # n_ab / n_baskets ≥ 1%
RULE_MIN_CONF_PCT = 10  # n_ab / n_antecedent ≥ 10%


def basket_affinity_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules over (user, day) baskets: for every
    ordered pair antecedent → consequent passing the support and
    confidence thresholds, the exact support, confidence, and lift — the
    actionable form of `event_cooccurrence` (A→B and B→A differ exactly
    when the antecedent frequencies differ, which is what a targeting rule
    cares about).

    Thresholds are integer cross-multiplied (n_ab·100 ≥ s·n_baskets,
    n_ab·100 ≥ c·n_antecedent) so rule membership is exact; the reported
    ratios are int-div 4dp. Plan shape is `event_cooccurrence`'s:
    basket-dedup first, equi-self-join on the basket key, broadcast
    singles — pair cardinality ≤ |types|², never data-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.select("user_id", F.to_date("ts").alias("day"), "event_type").distinct()
    pairs = (
        b.alias("x")
        .join(b.alias("y"), ["user_id", "day"])
        .filter(F.col("x.event_type") != F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("antecedent"),
            F.col("y.event_type").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    singles = b.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    n_baskets = b.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    out = (
        pairs.join(
            F.broadcast(
                singles.select(F.col("event_type").alias("antecedent"), F.col("n").alias("n_a"))
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                singles.select(F.col("event_type").alias("consequent"), F.col("n").alias("n_b"))
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n_baskets))
        .filter(F.col("n_ab") * 100 >= F.lit(RULE_MIN_SUPPORT_PCT) * F.col("n_baskets"))
        .filter(F.col("n_ab") * 100 >= F.lit(RULE_MIN_CONF_PCT) * F.col("n_a"))
    )
    support = F.expr("(n_ab * 20000 + n_baskets) div (2 * n_baskets)").cast("double") / F.lit(10000.0)
    conf = F.expr("(n_ab * 20000 + n_a) div (2 * n_a)").cast("double") / F.lit(10000.0)
    lift = (F.col("n_ab").cast("double") * F.col("n_baskets").cast("double")) / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    return out.select(
        "antecedent",
        "consequent",
        "n_ab",
        support.alias("support"),
        conf.alias("confidence"),
        round_half_up(lift, 4).alias("lift"),
    ).orderBy("antecedent", "consequent")


_AFFINITY_SQL = f"""
WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
pairs AS (
  SELECT x.event_type AS antecedent, y.event_type AS consequent, COUNT(*) AS n_ab
  FROM b x JOIN b y ON x.user_id = y.user_id AND x.day = y.day
                    AND x.event_type <> y.event_type
  GROUP BY 1, 2),
singles AS (SELECT event_type, COUNT(*) AS n FROM b GROUP BY event_type),
nb AS (SELECT COUNT(*) AS n_baskets FROM (SELECT DISTINCT user_id, day FROM b) t)
SELECT antecedent, consequent, n_ab,
       CAST((n_ab * 20000 + n_baskets) // (2 * n_baskets) AS DOUBLE) / 10000.0 AS support,
       CAST((n_ab * 20000 + sa.n) // (2 * sa.n) AS DOUBLE) / 10000.0 AS confidence,
       {sql_round_half_up("CAST(n_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE) / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE))", 4)} AS lift
FROM pairs
JOIN singles sa ON sa.event_type = antecedent
JOIN singles sb ON sb.event_type = consequent
CROSS JOIN nb
WHERE n_ab * 100 >= {RULE_MIN_SUPPORT_PCT} * n_baskets
  AND n_ab * 100 >= {RULE_MIN_CONF_PCT} * sa.n
ORDER BY antecedent, consequent
"""


def event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over event types: for each unordered pair
    of event types, how many (user, day) baskets contain both, and the
    lift vs independence — the "which behaviors travel together" analysis
    (e.g. do interventions co-occur with hard brakes?) that no single
    aggregate in the reference's query set can answer.

    Plan: dedup to (user, day, type) baskets FIRST (the fact table shrinks
    to ≤|types| rows per basket before any join), pair via an equi-self-join
    on the basket key (never cartesian: ≤ C(5,2)=10 pairs per basket), then
    two broadcast joins against the tiny per-type totals. Lift arithmetic
    is integer-exact into IEEE doubles, mirrored in the oracle."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).distinct()
    pairs = (
        b.alias("x")
        .join(b.alias("y"), ["user_id", "day"])
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("item_a"),
            F.col("y.event_type").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    singles = b.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    n_baskets = b.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    lift = (F.col("n_ab").cast("double") * F.col("n_baskets").cast("double")) / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    return (
        pairs.join(
            F.broadcast(singles.select(F.col("event_type").alias("item_a"), F.col("n").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(singles.select(F.col("event_type").alias("item_b"), F.col("n").alias("n_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select("item_a", "item_b", "n_ab", lift.alias("lift"))
        .orderBy("item_a", "item_b")
    )


_COOCCUR_SQL = """
WITH b AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events
), s AS (
    SELECT event_type, COUNT(*) AS n FROM b GROUP BY event_type
), nb AS (
    SELECT COUNT(*) AS n_baskets FROM (SELECT DISTINCT user_id, day FROM b)
), p AS (
    SELECT x.event_type AS item_a, y.event_type AS item_b, COUNT(*) AS n_ab
    FROM b x JOIN b y
      ON x.user_id = y.user_id AND x.day = y.day
     AND x.event_type < y.event_type
    GROUP BY 1, 2
)
SELECT item_a, item_b, n_ab,
       (CAST(n_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE))
       / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)) AS lift
FROM p
JOIN s sa ON p.item_a = sa.event_type
JOIN s sb ON p.item_b = sb.event_type
CROSS JOIN nb
ORDER BY item_a, item_b
"""


# --- chi-square contingency (lang × source independence) -------------------


def lang_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test of document language vs source,
    plus Cramér's V — the standard drift/bias check before mixing corpus
    shards into a training run.

    Plan shape: one hash-agg for the observed contingency table (cells =
    |lang|·|source|, tiny), then the marginals re-aggregate the CELLS, not
    the corpus — the raw table is scanned exactly once regardless of size.
    Marginals broadcast back onto the cells. The cell-sum Σ(O−E)²/E uses the
    scaled-int64 exact-sum so the statistic is bit-identical to the twin.
    """
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("lang").agg(F.sum("o").alias("row_tot"))
    ct = obs.groupBy("source").agg(F.sum("o").alias("col_tot"))
    tot = obs.agg(
        F.sum("o").alias("n"),
        F.countDistinct("lang").alias("r"),
        F.countDistinct("source").alias("c"),
    )
    cells = (
        obs.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "e",
            F.col("row_tot").cast("double")
            * F.col("col_tot").cast("double")
            / F.col("n").cast("double"),
        )
        .withColumn(
            "contrib",
            (F.col("o").cast("double") - F.col("e")) * (F.col("o").cast("double") - F.col("e")) / F.col("e"),
        )
    )
    chi2 = (
        F.sum(F.floor(F.col("contrib") * F.lit(1e6) + F.lit(0.5)).cast("long")).cast("double")
        / F.lit(1e6)
    )
    return (
        cells.groupBy("n", "r", "c")
        .agg(F.count(F.lit(1)).alias("n_cells"), chi2.alias("chi2_e6"))
        .select(
            F.col("n_cells"),
            ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
            round_half_up(F.col("chi2_e6"), 4).alias("chi2"),
            round_half_up(
                F.sqrt(
                    F.col("chi2_e6")
                    / (F.col("n").cast("double") * F.least(F.col("r") - 1, F.col("c") - 1).cast("double"))
                ),
                4,
            ).alias("cramers_v"),
        )
    )


_CHI2_SQL = f"""
WITH obs AS (
  SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source),
rt AS (SELECT lang, SUM(o) AS row_tot FROM obs GROUP BY lang),
ct AS (SELECT source, SUM(o) AS col_tot FROM obs GROUP BY source),
tot AS (SELECT SUM(o) AS n, COUNT(DISTINCT lang) AS r, COUNT(DISTINCT source) AS c FROM obs),
cells AS (
  SELECT obs.o, tot.n, tot.r, tot.c,
         CAST(rt.row_tot AS DOUBLE) * CAST(ct.col_tot AS DOUBLE) / CAST(tot.n AS DOUBLE) AS e
  FROM obs JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN tot),
agg AS (
  SELECT n, r, c, COUNT(*) AS n_cells,
         CAST(SUM(CAST(FLOOR(((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e)
              * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS chi2_e6
  FROM cells GROUP BY n, r, c)
SELECT n_cells, (r - 1) * (c - 1) AS dof,
       {sql_round_half_up("chi2_e6", 4)} AS chi2,
       {sql_round_half_up("sqrt(chi2_e6 / (CAST(n AS DOUBLE) * CAST(LEAST(r - 1, c - 1) AS DOUBLE)))", 4)} AS cramers_v
FROM agg
"""


def conversion_lift_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation view→purchase conversion vs the rest of the fleet, with a
    two-proportion z-test — the experimentation primitive (A/B segment
    readout) the chi-square drift check doesn't give: a signed, per-segment
    effect size with significance.

    z = (p̂₁ − p̂₂) / √(p̂(1−p̂)(1/n₁ + 1/n₂)), pooled p̂, where group 1 is
    the nation and group 2 is everyone else. Trial = a view event;
    conversion = that view followed by a same-user purchase within 1 hour
    (the batch twin of `streaming_unconverted_views`' attribution window)
    — so conversions ⊆ trials by construction, which keeps the pooled
    variance non-negative (event-count ratios don't: purchases can exceed
    views, DuckDB hard-errors on the sqrt, Spark silently NaNs; and
    user-lifetime funnels degenerate to 100% on long-lived users).

    Plan shape: views get their converted flag from ONE user-keyed range
    semi-join (left semi, equi on user + time band — never a fan-out),
    broadcast-joined to the customer dim, one hash-agg to |nations|
    cells; the complement (rest-of-fleet) counts are global scalars
    broadcast back onto the cells (J2 pattern). Counts are exact int64;
    the z formula is the only float arithmetic, mirrored verbatim in the
    twin. Degenerate splits (a nation holding every view, pooled rate 0
    or 1) are filtered identically on both sides.
    """
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), F.col("event_id").alias("view_id")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_uid"), F.col("ts").alias("bts")
    )
    converted = views.join(
        buys,
        (F.col("user_id") == F.col("b_uid"))
        & (F.col("bts") >= F.col("vts"))
        & (F.col("bts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    ).select("view_id")
    flagged = views.join(
        converted.withColumn("converted", F.lit(1)), "view_id", "left"
    ).select("user_id", F.coalesce("converted", F.lit(0)).alias("converted"))
    cells = (
        flagged.join(F.broadcast(cust), "user_id")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.sum("converted").cast("long").alias("n_converted"),
        )
    )
    tot = cells.agg(
        F.sum("n_views").alias("tv"), F.sum("n_converted").alias("tp")
    )
    d = F.col("n_views").cast("double")
    p1 = F.col("n_converted").cast("double") / d
    rest_v = (F.col("tv") - F.col("n_views")).cast("double")
    p2 = (F.col("tp") - F.col("n_converted")).cast("double") / rest_v
    pooled = F.col("tp").cast("double") / F.col("tv").cast("double")
    se = F.sqrt(pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / d + F.lit(1.0) / rest_v))
    return (
        cells.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("tv") > F.col("n_views"))
            & (F.col("tp") > 0)
            & (F.col("tp") < F.col("tv"))
        )
        .select(
            "c_nationkey",
            "n_views",
            "n_converted",
            round_half_up(p1, 4).alias("cvr"),
            round_half_up(p1 - p2, 4).alias("lift_vs_rest"),
            round_half_up((p1 - p2) / se, 4).alias("z_score"),
        )
        .orderBy("c_nationkey")
    )


_CONVERSION_LIFT_SQL = f"""
WITH flagged AS (
  SELECT v.user_id,
         CASE WHEN EXISTS (
             SELECT 1 FROM events p
             WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
               AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR)
         THEN 1 ELSE 0 END AS converted
  FROM events v
  WHERE v.event_type = 'view'),
cells AS (
  SELECT c.c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_views,
         CAST(SUM(f.converted) AS BIGINT) AS n_converted
  FROM flagged f
  JOIN customer c ON c.c_custkey = f.user_id
  GROUP BY c.c_nationkey),
tot AS (SELECT CAST(SUM(n_views) AS BIGINT) AS tv, CAST(SUM(n_converted) AS BIGINT) AS tp FROM cells)
SELECT c_nationkey, n_views, n_converted,
       {sql_round_half_up("CAST(n_converted AS DOUBLE) / CAST(n_views AS DOUBLE)", 4)} AS cvr,
       {sql_round_half_up("CAST(n_converted AS DOUBLE) / CAST(n_views AS DOUBLE) - CAST(tp - n_converted AS DOUBLE) / CAST(tv - n_views AS DOUBLE)", 4)} AS lift_vs_rest,
       {sql_round_half_up("(CAST(n_converted AS DOUBLE) / CAST(n_views AS DOUBLE) - CAST(tp - n_converted AS DOUBLE) / CAST(tv - n_views AS DOUBLE)) / sqrt((CAST(tp AS DOUBLE) / CAST(tv AS DOUBLE)) * (1.0 - CAST(tp AS DOUBLE) / CAST(tv AS DOUBLE)) * (1.0 / CAST(n_views AS DOUBLE) + 1.0 / CAST(tv - n_views AS DOUBLE)))", 4)} AS z_score
FROM cells CROSS JOIN tot
WHERE tv > n_views AND tp > 0 AND tp < tv
ORDER BY c_nationkey
"""


# --- account-balance band activity ---------------------------------------------


def acctbal_band_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer activity by account-balance quintile: per band, customer
    count, how many ever ordered, order volume, and orders per active
    customer — Q22's "wealthy but idle customers" question generalized
    from one threshold to the full distribution.

    Shape: quintile boundaries via `percentile` on the customer dim
    (broadcast-assign, the `customer_spend_deciles` pattern), orders
    pre-aggregated per customer before the join so the fact table is
    touched once; 5-row output.
    """
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    bounds = customer.agg(
        *[F.percentile(F.col("c_acctbal"), F.lit(q)).alias(f"b{int(q * 10)}") for q in _RFM_QS]
    )
    band = (
        F.lit(1)
        + sum(
            F.when(F.col("c_acctbal").cast("double") > F.col(f"b{int(q * 10)}"), 1).otherwise(0)
            for q in _RFM_QS
        )
    ).cast("long")
    return (
        customer.crossJoin(F.broadcast(bounds))
        .select("c_custkey", band.alias("balance_band"))
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("balance_band")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.when(F.col("n_orders").isNotNull(), 1).otherwise(0)).alias("n_active"),
            F.sum(F.coalesce(F.col("n_orders"), F.lit(0))).alias("n_orders"),
        )
        .withColumn(
            "orders_per_active",
            F.when(
                F.col("n_active") > 0,
                F.expr("(n_orders * 20000 + n_active) div (2 * n_active)").cast("double")
                / F.lit(10000.0),
            ),
        )
        .orderBy("balance_band")
    )


def _sql_acctbal_bands() -> str:
    bq = ", ".join(f"quantile_cont(c_acctbal, {q}) AS b{int(q * 10)}" for q in _RFM_QS)
    band = " + ".join(
        f"CASE WHEN CAST(c_acctbal AS DOUBLE) > b{int(q * 10)} THEN 1 ELSE 0 END"
        for q in _RFM_QS
    )
    return f"""
WITH bounds AS (SELECT {bq} FROM customer),
per_cust AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey),
banded AS (
  SELECT c_custkey, CAST(1 + {band} AS BIGINT) AS balance_band
  FROM customer CROSS JOIN bounds)
SELECT balance_band,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN p.n_orders IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
       CAST(SUM(COALESCE(p.n_orders, 0)) AS BIGINT) AS n_orders,
       CASE WHEN SUM(CASE WHEN p.n_orders IS NOT NULL THEN 1 ELSE 0 END) > 0 THEN
         CAST((SUM(COALESCE(p.n_orders, 0)) * 20000
               + SUM(CASE WHEN p.n_orders IS NOT NULL THEN 1 ELSE 0 END))
              // (2 * SUM(CASE WHEN p.n_orders IS NOT NULL THEN 1 ELSE 0 END)) AS DOUBLE)
           / 10000.0
       END AS orders_per_active
FROM banded b LEFT JOIN per_cust p ON p.o_custkey = b.c_custkey
GROUP BY balance_band
ORDER BY balance_band
"""


# --- segment × priority revenue matrix ----------------------------------------


def segment_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order count and exact revenue per (market segment, order priority)
    cell, with each cell's share of its segment's revenue — the 5×5 mix
    matrix behind Q3's single-segment slice (which segments' urgent orders
    drive revenue?).

    Scale: one orders scan, broadcast customer dim, 25-cell agg key; the
    per-segment share comes from a window over the 25 cells, not the fact
    table.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("long")
            ).alias("cents"),
        )
    )
    seg = Window.partitionBy("c_mktsegment")
    return (
        cells.withColumn("seg_cents", F.sum("cents").over(seg))
        .select(
            "c_mktsegment",
            "o_orderpriority",
            "n_orders",
            (F.col("cents").cast("double") / F.lit(100.0)).alias("revenue"),
            (
                F.expr("(cents * 20000 + seg_cents) div (2 * seg_cents)").cast("double")
                / F.lit(10000.0)
            ).alias("segment_share"),
        )
        .orderBy("c_mktsegment", "o_orderpriority")
    )


_SEG_PRIO_SQL = """
WITH cells AS (
  SELECT c_mktsegment, o_orderpriority,
         COUNT(*) AS n_orders,
         SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY 1, 2),
w AS (
  SELECT *, SUM(cents) OVER (PARTITION BY c_mktsegment) AS seg_cents FROM cells)
SELECT c_mktsegment, o_orderpriority,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(cents AS DOUBLE) / 100.0 AS revenue,
       CAST((cents * 20000 + seg_cents) // (2 * seg_cents) AS DOUBLE) / 10000.0
         AS segment_share
FROM w
ORDER BY c_mktsegment, o_orderpriority
"""


# --- RFM segmentation --------------------------------------------------------

_RFM_QS = (0.2, 0.4, 0.6, 0.8)


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation rollup: every
    customer scored 1–5 on each axis by quintile boundaries over the
    per-customer aggregates (5 = most recent / most orders / most spend),
    then counted per (r, f, m) cell — the classic CRM segmentation, ≤125
    output cells.

    Scale shape: same two-pass boundary/broadcast pattern as
    `customer_spend_deciles` — per-customer aggregate (one fact shuffle),
    12 quantile scalars on that aggregate, broadcast compare to assign
    scores, bounded-key rollup. No window anywhere. The as-of date is the
    corpus max order date, computed in-plan as a broadcast scalar
    (fleet_summary's J2 pattern), so the query stays deterministic with no
    wall-clock dependence.
    """
    orders = load_table(spark, sf_dir, "orders")
    asof = orders.agg(F.max("o_orderdate").alias("asof"))
    rfm = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("long")
            ).alias("cents"),
        )
        .crossJoin(F.broadcast(asof))
        .withColumn("rec", F.datediff(F.col("asof"), F.col("last_d")).cast("long"))
    )
    bounds = rfm.agg(
        *[F.percentile(F.col("rec"), F.lit(q)).alias(f"br{int(q * 10)}") for q in _RFM_QS],
        *[F.percentile(F.col("freq"), F.lit(q)).alias(f"bf{int(q * 10)}") for q in _RFM_QS],
        *[F.percentile(F.col("cents"), F.lit(q)).alias(f"bm{int(q * 10)}") for q in _RFM_QS],
    )
    r_raw = F.lit(1) + sum(
        F.when(F.col("rec").cast("double") > F.col(f"br{int(q * 10)}"), 1).otherwise(0)
        for q in _RFM_QS
    )
    f_sc = F.lit(1) + sum(
        F.when(F.col("freq").cast("double") > F.col(f"bf{int(q * 10)}"), 1).otherwise(0)
        for q in _RFM_QS
    )
    m_sc = F.lit(1) + sum(
        F.when(F.col("cents").cast("double") > F.col(f"bm{int(q * 10)}"), 1).otherwise(0)
        for q in _RFM_QS
    )
    return (
        rfm.crossJoin(F.broadcast(bounds))
        .select(
            (F.lit(6) - r_raw).cast("long").alias("r_score"),
            f_sc.cast("long").alias("f_score"),
            m_sc.cast("long").alias("m_score"),
            "cents",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum("cents").cast("double") / F.lit(100.0)).alias("monetary_total"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


def _sql_rfm() -> str:
    br = ", ".join(f"quantile_cont(rec, {q}) AS br{int(q * 10)}" for q in _RFM_QS)
    bf = ", ".join(f"quantile_cont(freq, {q}) AS bf{int(q * 10)}" for q in _RFM_QS)
    bm = ", ".join(f"quantile_cont(cents, {q}) AS bm{int(q * 10)}" for q in _RFM_QS)
    r_raw = " + ".join(
        f"CASE WHEN CAST(rec AS DOUBLE) > br{int(q * 10)} THEN 1 ELSE 0 END" for q in _RFM_QS
    )
    f_sc = " + ".join(
        f"CASE WHEN CAST(freq AS DOUBLE) > bf{int(q * 10)} THEN 1 ELSE 0 END" for q in _RFM_QS
    )
    m_sc = " + ".join(
        f"CASE WHEN CAST(cents AS DOUBLE) > bm{int(q * 10)} THEN 1 ELSE 0 END" for q in _RFM_QS
    )
    return f"""
WITH rfm AS (
  SELECT o_custkey,
         datediff('day', MAX(o_orderdate), (SELECT MAX(o_orderdate) FROM orders)) AS rec,
         COUNT(*) AS freq,
         SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey),
bounds AS (SELECT {br}, {bf}, {bm} FROM rfm),
scored AS (
  SELECT CAST(6 - (1 + {r_raw}) AS BIGINT) AS r_score,
         CAST(1 + {f_sc} AS BIGINT) AS f_score,
         CAST(1 + {m_sc} AS BIGINT) AS m_score,
         cents
  FROM rfm CROSS JOIN bounds)
SELECT r_score, f_score, m_score,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS monetary_total
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
"""


# --- revenue concentration (Pareto 80/20) ------------------------------------

PARETO_PCT = 80
# $100 spend buckets: the concentration curve is computed on bounded cells
# (max spend / $100), never on per-customer rows — a per-region window over
# raw spends would be the single-partition-window anti-pattern at scale
PARETO_BUCKET_E2 = 10_000


def region_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region revenue concentration: how many top customers (counted at
    $100 spend-bucket granularity) cover ≥80% of the region's order
    revenue, with the spend threshold that cut achieves — the 80/20 report
    behind key-account planning and the skew early-warning for
    customer-keyed joins.

    Exactness: spends are int64 cents; the descending CDF runs over
    (region, $100-bucket) cells; the 80% test cross-multiplies integers
    (running·10 ≥ 8·total). Bucket granularity is part of the contract
    (documented, identical in the oracle): all customers in the boundary
    bucket are included, so `top80_share` ≥ 0.80 exactly.

    Scale: cells per region ≤ max_spend/$100 — domain-bounded, not
    row-bounded; everything else is broadcast dims and one fact shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    with_region = (
        spend.join(F.broadcast(customer), spend.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("r_name").alias("region"), "cents")
    )
    cells = (
        with_region.withColumn("b", F.expr(f"cents div {PARETO_BUCKET_E2}"))
        .groupBy("region", "b")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("sum_cents"))
    )
    per_region = Window.partitionBy("region")
    run = (
        Window.partitionBy("region")
        .orderBy(F.desc("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cdf = (
        cells.withColumn("total_cents", F.sum("sum_cents").over(per_region))
        .withColumn("total_cust", F.sum("n_cust").over(per_region))
        .withColumn("run_cents", F.sum("sum_cents").over(run))
        .withColumn("run_cust", F.sum("n_cust").over(run))
        .withColumn(
            "qual", F.col("run_cents") * F.lit(10) >= F.lit(PARETO_PCT // 10) * F.col("total_cents")
        )
    )
    return (
        cdf.groupBy("region")
        .agg(
            F.min("total_cust").alias("n_customers"),
            (F.min("total_cents").cast("double") / F.lit(100.0)).alias("revenue_total"),
            F.min(F.when(F.col("qual"), F.col("run_cust"))).alias("n_top80"),
            (
                F.max(F.when(F.col("qual"), F.col("b"))) * F.lit(PARETO_BUCKET_E2 // 100)
            ).cast("double").alias("threshold_spend"),
            (
                F.expr(
                    "(min(CASE WHEN qual THEN run_cents END) * 20000 + min(total_cents))"
                    " div (2 * min(total_cents))"
                ).cast("double")
                / F.lit(10000.0)
            ).alias("top80_share"),
        )
        .orderBy("region")
    )


_PARETO_SQL = f"""
WITH spend AS (
  SELECT o_custkey,
         SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey),
with_region AS (
  SELECT r.r_name AS region, s.cents
  FROM spend s
  JOIN customer c ON c.c_custkey = s.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey),
cells AS (
  SELECT region, cents // {PARETO_BUCKET_E2} AS b,
         COUNT(*) AS n_cust, SUM(cents) AS sum_cents
  FROM with_region GROUP BY 1, 2),
cdf AS (
  SELECT *,
         SUM(sum_cents) OVER (PARTITION BY region) AS total_cents,
         SUM(n_cust) OVER (PARTITION BY region) AS total_cust,
         SUM(sum_cents) OVER (PARTITION BY region ORDER BY b DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cents,
         SUM(n_cust) OVER (PARTITION BY region ORDER BY b DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cust
  FROM cells),
q AS (SELECT *, run_cents * 10 >= {PARETO_PCT // 10} * total_cents AS qual FROM cdf)
SELECT region,
       CAST(MIN(total_cust) AS BIGINT) AS n_customers,
       CAST(MIN(total_cents) AS DOUBLE) / 100.0 AS revenue_total,
       CAST(MIN(CASE WHEN qual THEN run_cust END) AS BIGINT) AS n_top80,
       CAST(MAX(CASE WHEN qual THEN b END) * {PARETO_BUCKET_E2 // 100} AS DOUBLE)
         AS threshold_spend,
       CAST((MIN(CASE WHEN qual THEN run_cents END) * 20000 + MIN(total_cents))
            // (2 * MIN(total_cents)) AS DOUBLE) / 10000.0 AS top80_share
FROM q
GROUP BY region
ORDER BY region
"""


QUERIES = {
    "customer_rfm_segments": customer_rfm_segments,
    "segment_priority_matrix": segment_priority_matrix,
    "acctbal_band_activity": acctbal_band_activity,
    "region_revenue_pareto": region_revenue_pareto,
    "value_outliers": value_outliers,
    "conversion_lift_by_nation": conversion_lift_by_nation,
    "event_cooccurrence": event_cooccurrence,
    "basket_affinity_rules": basket_affinity_rules,
    "user_event_pivot": user_event_pivot,
    "orders_rollup": orders_rollup,
    "orders_cube": orders_cube,
    "props_json_stats": props_json_stats,
    "props_key_profile": props_key_profile,
    "props_variant_stats": props_variant_stats,
    "value_histogram": value_histogram,
    "value_k_correlation": value_k_correlation,
    "retained_users": retained_users,
    "churned_users": churned_users,
    "event_value_stats": event_value_stats,
    "value_percentiles": value_percentiles,
    "approx_distinct_users": approx_distinct_users,
    "approx_value_percentiles": approx_value_percentiles,
    "customer_spend_deciles": customer_spend_deciles,
    "hll_mergeable_distinct": hll_mergeable_distinct,
    "theta_audience_overlap": theta_audience_overlap,
    "distinct_users_exact": distinct_users_exact,
    "status_priority_grouping_sets": status_priority_grouping_sets,
    "user_metric_unpivot": user_metric_unpivot,
    "viewers_vs_buyers": viewers_vs_buyers,
    "lang_source_chi2": lang_source_chi2,
}

ORACLES = {
    "customer_rfm_segments": _sql_rfm(),
    "segment_priority_matrix": _SEG_PRIO_SQL,
    "acctbal_band_activity": _sql_acctbal_bands(),
    "region_revenue_pareto": _PARETO_SQL,
    "value_outliers": _OUTLIERS_SQL,
    "conversion_lift_by_nation": _CONVERSION_LIFT_SQL,
    "event_cooccurrence": _COOCCUR_SQL,
    "basket_affinity_rules": _AFFINITY_SQL,
    "user_event_pivot": _PIVOT_SQL,
    "orders_rollup": _ROLLUP_SQL,
    "orders_cube": _CUBE_SQL,
    "lang_source_chi2": _CHI2_SQL,
    "props_json_stats": _PROPS_JSON_SQL,
    "props_key_profile": _PROPS_KEYS_SQL,
    "props_variant_stats": _PROPS_VARIANT_SQL,
    "value_histogram": _HISTOGRAM_SQL,
    "value_k_correlation": _CORR_SQL,
    "retained_users": _RETAINED_SQL,
    "churned_users": _CHURNED_SQL,
    "event_value_stats": _STATS_SQL,
    "value_percentiles": _PCT_SQL,
    # approx_distinct_users / approx_value_percentiles: rows-only by design
    # (sketch implementations differ per engine)
    "customer_spend_deciles": _DECILE_SQL,
    "distinct_users_exact": _DISTINCT_SQL,
    "status_priority_grouping_sets": _GROUPING_SETS_SQL,
    "user_metric_unpivot": _UNPIVOT_SQL,
    "viewers_vs_buyers": _FULL_OUTER_SQL,
}
