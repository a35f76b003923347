"""Dashboard snapshot API — the reference's refresh cycle as one engine call.

The reference dashboard fires 9 independent SQL queries per 5-second
refresh, each opening a fresh connection and re-scanning storage
(src/visualization/dashboard.py:60-68, src/metrics/queries.py:16-24). The
engine equivalent computes the same snapshot against ONE cached windowed
scan: the time-window filter is applied once, the filtered frame is cached,
and all metric plans read the cache — storage is touched once per refresh
instead of nine times. `.toPandas()` belongs to the caller (the viz edge),
matching SURVEY.md §3.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import load_table
from .operators import metrics


def dashboard_snapshot(
    spark: SparkSession,
    sf_dir: str,
    hours: int = metrics.DEFAULT_HOURS,
    as_of: str = metrics.AS_OF,
    vehicle_id: int | None = None,
) -> dict[str, DataFrame]:
    """All nine reference metrics for one refresh, sharing one cached scan
    of the windowed events table. Returns name → DataFrame; call
    `.toPandas()` per frame at the render edge.

    The cache is per-snapshot: call `release(snapshot)` (or let Spark's LRU
    evict) when the refresh cycle is done.
    """
    win = dict(hours=hours, as_of=as_of)
    winv = dict(hours=hours, as_of=as_of, vehicle_id=vehicle_id)
    # cache the windowed slice all metrics share; each metric function
    # re-derives it, and Spark plan-matches the cached fragment
    windowed = metrics._win(load_table(spark, sf_dir, "events"), hours, as_of)
    windowed.cache().count()
    return {
        "driving_event_counts": metrics.driving_event_counts(spark, sf_dir, **winv),
        "recent_alerts": metrics.recent_alerts(
            spark, sf_dir, vehicle_id=vehicle_id, **win
        ),
        "vehicle_list": metrics.vehicle_list(spark, sf_dir),
        "latest_telemetry": metrics.latest_telemetry(spark, sf_dir, vehicle_id=vehicle_id),
        "km_per_intervention": metrics.km_per_intervention(spark, sf_dir, **winv),
        "intervention_rate": metrics.intervention_rate(spark, sf_dir, **win),
        "disengagement_rate": metrics.disengagement_rate(spark, sf_dir, **win),
        "perception_summary": metrics.perception_summary(spark, sf_dir, **winv),
        "fleet_summary": metrics.fleet_summary(spark, sf_dir, **win),
        "autopilot_engagement": metrics.autopilot_engagement(spark, sf_dir, **winv),
    }


def release(spark: SparkSession) -> None:
    """Drop snapshot caches (call between refresh cycles if memory matters)."""
    spark.catalog.clearCache()
