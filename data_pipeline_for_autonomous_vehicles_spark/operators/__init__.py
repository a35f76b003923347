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


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import dedup, metrics, similarity, text, tpch, windows

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (tpch, metrics, windows, dedup, similarity, text):
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    from . import dedup, metrics, similarity, text, tpch, windows

    merged: dict[str, str] = {}
    for mod in (tpch, metrics, windows, dedup, similarity, text):
        merged.update(mod.ORACLES)
    return merged
