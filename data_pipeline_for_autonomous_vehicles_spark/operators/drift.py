"""Distribution-drift monitoring (Population Stability Index) — the gate a
training pipeline runs before trusting a new data batch against the
distribution its model was trained on.

Baseline = week 1 of the events stream, current = everything after; the
`value` column is histogrammed into fixed-width bins and compared with
    PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b)
with Laplace smoothing ((cnt+1)/(n+B)) so empty bins stay finite. PSI < 0.1
is conventionally "no shift", > 0.25 "significant shift".

Determinism: bin ids are floor(value/width) with a top clamp — one double
divide + floor, identical in both engines; shares and ln terms are scalar
IEEE expressions mirrored token-for-token; the only order-dependent sum
(total PSI over bins) goes through the scaled-int64 exact-sum pattern.

Scale shape: ONE scan of the fact table into a B-group hash aggregate
(partial map-side, B = 9 groups shuffled); the n_base/n_curr scalars
re-aggregate the tiny per-bin relation (runtime-reused exchange, same
pattern as operators/frequency.py); everything after the first shuffle is
O(B) rows. The drift report for 100 TB costs one pass, no sample needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import round_half_up, sql_round_half_up

BIN_WIDTH = 25.0
N_BINS = 9  # bins 0..7 cover [0, 200); bin 8 = overflow
BASELINE_END = "2024-01-08 00:00:00"


def _binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bin_id = F.least(
        F.lit(N_BINS - 1), F.floor(F.col("value") / F.lit(BIN_WIDTH))
    ).cast("long")
    is_base = F.col("ts") < F.lit(BASELINE_END).cast("timestamp")
    counts = (
        ev.select(bin_id.alias("bin_id"), is_base.alias("is_base"))
        .groupBy("bin_id")
        .agg(
            F.sum(F.when(F.col("is_base"), 1).otherwise(0)).alias("n_base"),
            F.sum(F.when(~F.col("is_base"), 1).otherwise(0)).alias("n_curr"),
        )
    )
    scalars = counts.agg(
        F.sum("n_base").alias("tot_base"), F.sum("n_curr").alias("tot_curr")
    )
    smoothed_p = (F.col("n_base").cast("double") + F.lit(1.0)) / (
        F.col("tot_base").cast("double") + F.lit(float(N_BINS))
    )
    smoothed_q = (F.col("n_curr").cast("double") + F.lit(1.0)) / (
        F.col("tot_curr").cast("double") + F.lit(float(N_BINS))
    )
    return (
        counts.crossJoin(F.broadcast(scalars))
        .withColumn("base_share", round_half_up(smoothed_p, 6))
        .withColumn("curr_share", round_half_up(smoothed_q, 6))
        .withColumn(
            "psi_term_e8",
            F.floor(
                (smoothed_p - smoothed_q)
                * F.log(smoothed_p / smoothed_q)
                * F.lit(100_000_000.0)
                + F.lit(0.5)
            ).cast("long"),
        )
    )


def value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin drift report: counts, smoothed shares, PSI contribution."""
    return (
        _binned(spark, sf_dir)
        .select(
            "bin_id",
            "n_base",
            "n_curr",
            "base_share",
            "curr_share",
            (F.col("psi_term_e8").cast("double") / F.lit(100_000_000.0)).alias(
                "psi_term"
            ),
        )
        .orderBy("bin_id")
    )


def drift_psi_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar gate: total PSI plus the conventional verdict band."""
    total = (
        F.sum("psi_term_e8").cast("double") / F.lit(100_000_000.0)
    ).alias("psi")
    out = _binned(spark, sf_dir).agg(total)
    return out.select(
        "psi",
        F.when(F.col("psi") < 0.1, "stable")
        .when(F.col("psi") < 0.25, "moderate_shift")
        .otherwise("significant_shift")
        .alias("verdict"),
    )


_BINNED_CTE = f"""
counts AS (
  SELECT LEAST({N_BINS - 1}, CAST(FLOOR(value / {BIN_WIDTH!r}) AS BIGINT)) AS bin_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{BASELINE_END}' THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{BASELINE_END}' THEN 0 ELSE 1 END) AS BIGINT) AS n_curr
  FROM events
  GROUP BY 1),
scalars AS (
  SELECT SUM(n_base) AS tot_base, SUM(n_curr) AS tot_curr FROM counts),
terms AS (
  SELECT bin_id, n_base, n_curr,
         (CAST(n_base AS DOUBLE) + 1.0) / (CAST(tot_base AS DOUBLE) + {float(N_BINS)!r}) AS p,
         (CAST(n_curr AS DOUBLE) + 1.0) / (CAST(tot_curr AS DOUBLE) + {float(N_BINS)!r}) AS q
  FROM counts CROSS JOIN scalars)
"""


def _sql_psi() -> str:
    return f"""
WITH {_BINNED_CTE}
SELECT bin_id, n_base, n_curr,
       {sql_round_half_up("p", 6)} AS base_share,
       {sql_round_half_up("q", 6)} AS curr_share,
       CAST(CAST(FLOOR((p - q) * ln(p / q) * 100000000.0 + 0.5) AS BIGINT) AS DOUBLE)
         / 100000000.0 AS psi_term
FROM terms
ORDER BY bin_id
"""


def _sql_psi_total() -> str:
    return f"""
WITH {_BINNED_CTE}
SELECT psi,
       CASE WHEN psi < 0.1 THEN 'stable'
            WHEN psi < 0.25 THEN 'moderate_shift'
            ELSE 'significant_shift' END AS verdict
FROM (
  SELECT CAST(SUM(CAST(FLOOR((p - q) * ln(p / q) * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / 100000000.0 AS psi
  FROM terms) t
"""


# --- two-sample distribution tests on the shared value-cell frame ---------
#
# Both tests compare the `value` distribution of purchase events vs view
# events from ONE (value, ca, cb) distinct-value cell frame, with prefix
# sums (empirical CDFs) built WITHOUT an unpartitioned window: bucket =
# floor(value) is order-aligned with value, per-bucket offsets come from a
# bounded conditional self-join over bucket totals (the _tie_aware_running
# offs pattern, but deterministic by construction — buckets derive from the
# DATA, not from partition ids, so no checkpoint pinning is needed), and the
# within-bucket running sums use a bucket-PARTITIONED window. The twin keeps
# DuckDB's plain unpartitioned window (the oracle has no scale obligations).
#
# Overflow honesty (SCALE.md §5 headroom rule): the internal moments are
# carried in 128-bit integers — Spark DECIMAL(38,0), DuckDB HUGEINT — since
# the int64 bound is real at target scale: cum·n products overflow int64
# once both samples exceed ~3·10⁹ rows, and the Mann-Whitney tie cube
# (t³−t) wraps at t > ~2.09·10⁶ rows on one distinct value. DECIMAL(38,0)
# holds t ≤ 10¹² (t³ ≤ 10³⁶); only the final display expressions drop to
# DOUBLE, mirrored verbatim in both engines.

_VALUE_CELLS_SQL = """
  SELECT value,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM events
  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
  GROUP BY value"""

_VALUE_CUM_SQL = """
  SELECT ca, cb,
         CAST(SUM(ca) OVER w AS BIGINT) AS cum_a,
         CAST(SUM(cb) OVER w AS BIGINT) AS cum_b
  FROM cells
  WINDOW w AS (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""


def _value_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(value, ca, cb) distinct-value cells for the purchase/view samples.
    NULL values are excluded on both sides (Spark ASC sorts NULL first,
    DuckDB last — and a NULL cell is statistically meaningless here)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            F.col("event_type").isin("purchase", "view")
            & F.col("value").isNotNull()
        )
        .groupBy("value")
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("long")).alias("ca"),
            F.sum((F.col("event_type") == "view").cast("long")).alias("cb"),
        )
    )


def _cells_with_cum(cells: DataFrame) -> DataFrame:
    """Add exact value-ordered prefix sums cum_a/cum_b to the cell frame
    using the two-level bucket decomposition described in the section
    comment — every window in the result partitions by a key."""
    from pyspark.sql import Window

    b = cells.withColumn("_b", F.floor(F.col("value")).cast("long"))
    seg = b.groupBy("_b").agg(F.sum("ca").alias("_ta"), F.sum("cb").alias("_tb"))
    offs = (
        seg.alias("x")
        .join(seg.alias("y"), F.col("y._b") < F.col("x._b"), "left")
        .groupBy(F.col("x._b").alias("_b"))
        .agg(
            F.coalesce(F.sum("y._ta"), F.lit(0)).alias("_offa"),
            F.coalesce(F.sum("y._tb"), F.lit(0)).alias("_offb"),
        )
    )
    w = (
        Window.partitionBy("_b")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        b.join(F.broadcast(offs), "_b")
        .withColumn("cum_a", F.col("_offa") + F.sum("ca").over(w))
        .withColumn("cum_b", F.col("_offb") + F.sum("cb").over(w))
        .drop("_b", "_offa", "_offb")
    )


_D38 = "decimal(38,0)"


def value_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov test: does the `value`
    distribution of purchase events match that of view events? The
    nonparametric companion to the binned PSI gate — KS needs no bin
    choice and is sensitive to any CDF divergence.

    Exactness: with sample sizes n_a, n_b and per-value counts, the
    statistic is D = max |cdf_a − cdf_b| = max |cum_a·n_b − cum_b·n_a| /
    (n_a·n_b) — the numerator is an exact 128-bit integer max over cells
    (see the section comment), so D is exact; the scaled statistic
    √(n_a·n_b/(n_a+n_b))·D (vs the Kolmogorov critical value 1.358 for
    α=0.05) is the single float expression, mirrored verbatim.

    Scale shape: one scan to cells (domain-bounded like
    `value_percentiles`), the keyed two-level CDF, one max-aggregate —
    no unpartitioned window anywhere (pinned in tests/test_plans.py).
    """
    cum = _cells_with_cum(_value_cells(spark, sf_dir))
    top = cum.agg(
        F.max(F.col("cum_a")).alias("n_a"),
        F.max(F.col("cum_b")).alias("n_b"),
    )
    d_num = (
        cum.crossJoin(F.broadcast(top))
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a").cast(_D38) * F.col("n_b").cast(_D38)
                    - F.col("cum_b").cast(_D38) * F.col("n_a").cast(_D38)
                )
            ).alias("d_num"),
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
        )
    )
    nanb = F.col("n_a").cast("double") * F.col("n_b").cast("double")
    d = F.col("d_num").cast("double") / nanb
    stat = F.sqrt(nanb / (F.col("n_a") + F.col("n_b")).cast("double")) * d
    return d_num.select(
        "n_a",
        "n_b",
        round_half_up(d, 6).alias("ks_d"),
        round_half_up(stat, 4).alias("ks_stat"),
        (stat > F.lit(1.358)).alias("reject_at_5pct"),
    )


_KS_SQL = f"""
WITH cells AS ({_VALUE_CELLS_SQL}),
cum AS ({_VALUE_CUM_SQL}),
top AS (SELECT MAX(cum_a) AS n_a, MAX(cum_b) AS n_b FROM cum),
dmax AS (
  SELECT MAX(ABS(CAST(cum_a AS HUGEINT) * CAST(n_b AS HUGEINT)
              - CAST(cum_b AS HUGEINT) * CAST(n_a AS HUGEINT))) AS d_num,
         MAX(n_a) AS n_a, MAX(n_b) AS n_b
  FROM cum CROSS JOIN top)
SELECT n_a, n_b,
       {sql_round_half_up("CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))", 6)} AS ks_d,
       {sql_round_half_up("sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) * (CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))", 4)} AS ks_stat,
       sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) * (CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) > 1.358 AS reject_at_5pct
FROM dmax
"""


def value_mannwhitney_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test on `value`, purchases vs
    views — the location-shift companion to `value_ks_test` (KS sees any
    CDF divergence; U asks specifically "does one sample stochastically
    dominate?").

    Exact construction on the shared cell frame:
        2U = Σ_cells ca·(2·cum_b − cb)        (ties count ½ each)
    and the tie-corrected variance uses Σ(t³−t) over cell total counts —
    both carried in 128-bit integers (section comment), exact on any
    partitioning; z = (U − n_a·n_b/2)/σ is the single float expression,
    mirrored verbatim. Same scale shape as the KS test.
    """
    cum = _cells_with_cum(_value_cells(spark, sf_dir))
    t = (F.col("ca") + F.col("cb")).cast(_D38)
    agg = cum.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(
            F.col("ca").cast(_D38)
            * (F.lit(2).cast(_D38) * F.col("cum_b").cast(_D38) - F.col("cb").cast(_D38))
        ).alias("u2"),
        F.sum(t * t * t - t).alias("tie3"),
    )
    n = F.col("n_a") + F.col("n_b")
    u = F.col("u2").cast("double") / F.lit(2.0)
    nanb = F.col("n_a").cast("double") * F.col("n_b").cast("double")
    mean_u = nanb / F.lit(2.0)
    var_u = nanb / F.lit(12.0) * (
        (n + 1).cast("double")
        - F.col("tie3").cast("double")
        / (n.cast("double") * (n - 1).cast("double"))
    )
    z = (u - mean_u) / F.sqrt(var_u)
    return agg.select(
        "n_a",
        "n_b",
        round_half_up(u, 1).alias("u_stat"),
        round_half_up(z, 4).alias("z_score"),
        (F.abs(z) > F.lit(1.96)).alias("reject_at_5pct"),
    )


_MWU_SQL = f"""
WITH cells AS ({_VALUE_CELLS_SQL}),
cum AS ({_VALUE_CUM_SQL}),
agg AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         CAST(SUM(cb) AS BIGINT) AS n_b,
         SUM(CAST(ca AS HUGEINT) * (CAST(2 AS HUGEINT) * CAST(cum_b AS HUGEINT) - CAST(cb AS HUGEINT))) AS u2,
         SUM(CAST(ca + cb AS HUGEINT) * CAST(ca + cb AS HUGEINT) * CAST(ca + cb AS HUGEINT) - CAST(ca + cb AS HUGEINT)) AS tie3
  FROM cum)
SELECT n_a, n_b,
       {sql_round_half_up("CAST(u2 AS DOUBLE) / 2.0", 1)} AS u_stat,
       {sql_round_half_up("(CAST(u2 AS DOUBLE) / 2.0 - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0) / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 * (CAST(n_a + n_b + 1 AS DOUBLE) - CAST(tie3 AS DOUBLE) / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE))))", 4)} AS z_score,
       ABS((CAST(u2 AS DOUBLE) / 2.0 - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0) / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 * (CAST(n_a + n_b + 1 AS DOUBLE) - CAST(tie3 AS DOUBLE) / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE))))) > 1.96 AS reject_at_5pct
FROM agg
"""


QUERIES = {
    "value_drift_psi": value_drift_psi,
    "drift_psi_total": drift_psi_total,
    "value_ks_test": value_ks_test,
    "value_mannwhitney_test": value_mannwhitney_test,
}

ORACLES = {
    "value_drift_psi": _sql_psi(),
    "drift_psi_total": _sql_psi_total(),
    "value_ks_test": _KS_SQL,
    "value_mannwhitney_test": _MWU_SQL,
}
