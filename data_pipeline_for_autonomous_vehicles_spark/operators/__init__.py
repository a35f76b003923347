"""Operator library.

Each module exposes two registries:
    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLES: dict[str, str]   # ANSI-SQL twins runnable by DuckDB

`all_queries()` / `all_oracles()` merge them for the driver contract
(__spark_entry__.py). A query present in QUERIES but absent from ORACLES is
deliberately rows-only (non-SQL-expressible semantics).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from ..streaming import aggregates as streaming_aggregates
    from ..streaming import joins as streaming_joins
    from ..streaming import novelty as streaming_novelty
    from ..streaming import online as streaming_online
    from ..streaming import stateful as streaming_stateful
    from . import (
        anomaly,
        asof,
        assembly,
        corpus,
        dedup,
        drift,
        frequency,
        fuzzy,
        graph,
        history,
        ingest,
        metrics,
        multimodal,
        olap,
        quality,
        ranking,
        readiness,
        sampling,
        sequences,
        similarity,
        spatial,
        temporal,
        text,
        timeseries,
        tpch,
        tpch_ext,
        windows,
    )

    return (
        anomaly,
        assembly,
        corpus,
        tpch,
        tpch_ext,
        metrics,
        windows,
        olap,
        asof,
        dedup,
        drift,
        frequency,
        fuzzy,
        graph,
        ingest,
        quality,
        ranking,
        readiness,
        sampling,
        sequences,
        similarity,
        spatial,
        temporal,
        text,
        timeseries,
        multimodal,
        history,
        streaming_aggregates,
        streaming_joins,
        streaming_novelty,
        streaming_online,
        streaming_stateful,
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLES)
    return merged
