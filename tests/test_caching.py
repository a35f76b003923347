"""Scoped lifecycle for operator-internal plan caches (caching.py).

Composing queries lazily cache small intermediates (distinct-key tables,
shingle/signature frames). A long-lived session must be able to return to
its pre-query cache footprint without the blunt session-wide clearCache().
"""

from __future__ import annotations

from data_pipeline_for_autonomous_vehicles_spark import caching


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


def test_release_plan_caches_restores_catalog_baseline(spark, sf_dir):
    """After a composing query's action, every cache it pinned is released
    by release_plan_caches(): the Spark cache manager returns to empty
    (= the pre-query baseline established here)."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import dedup, windows

    cm = _cache_manager(spark)
    spark.catalog.clearCache()
    caching.release_plan_caches()  # drop stale registrations from other tests
    assert cm.isEmpty()

    # two composing queries from different families, both of which cache
    windows.supplier_revenue_ranks(spark, sf_dir).collect()
    dedup.near_dup_detector_agreement(spark, sf_dir).collect()
    assert not cm.isEmpty(), "expected operator-internal caches to be pinned"

    released = caching.release_plan_caches(blocking=True)
    assert released >= 2
    assert cm.isEmpty(), "release_plan_caches must restore the baseline"


def test_release_is_idempotent_and_safe_mid_lineage(spark, sf_dir):
    """Releasing twice is a no-op, and a DataFrame built over a released
    cache still evaluates correctly (recompute from lineage)."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import windows

    df = windows.customer_balance_quartiles(spark, sf_dir)
    first = df.collect()
    caching.release_plan_caches(blocking=True)
    assert caching.release_plan_caches() == 0
    try:
        assert df.collect() == first  # recompute re-pins the lazy cache...
    finally:
        spark.catalog.clearCache()  # ...so leave no plan-cache residue
        caching.release_plan_caches(blocking=True)
