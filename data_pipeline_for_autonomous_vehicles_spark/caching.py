"""Scoped lifecycle for intra-query plan caches.

Several composing operators lazily ``cache()`` a small intermediate that
feeds multiple plan branches (distinct-key tables in the tie-aware ranking
family, shingle/signature frames in the dedup family). The cache is a pure
recompute-avoidance: correctness never depends on it. But ``cache()`` pins
executor storage until ``unpersist()``, so a long-lived session composing
many such queries would accumulate stale cached relations.

Policy: every operator-internal ``cache()`` goes through
``register_plan_cache`` and a session host calls ``release_plan_caches()``
between logical query executions (the bench/sweep harnesses do; tests
assert the catalog returns to its pre-query cache footprint). Unpersist is
non-blocking by default — Spark drops the blocks asynchronously and any
in-flight job simply recomputes from lineage, which is always valid here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PLAN_CACHES: list[DataFrame] = []


def register_plan_cache(df: DataFrame) -> DataFrame:
    """Record an operator-internal cached DataFrame for scoped release."""
    _PLAN_CACHES.append(df)
    return df


def release_plan_caches(blocking: bool = False) -> int:
    """Unpersist every registered intra-query cache. Returns how many were
    released. Safe to call at any time: unpersisting a never-materialized
    or already-released cache is a no-op, and later re-execution of a plan
    that referenced the cache recomputes from lineage."""
    n = 0
    while _PLAN_CACHES:
        df = _PLAN_CACHES.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:
            pass  # session already stopped — nothing left to release
    return n
