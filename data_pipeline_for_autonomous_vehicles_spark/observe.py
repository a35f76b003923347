"""Runtime row-accounting via Spark's Observation API — free metrics on the
data actually written, collected during the job itself.

A 100 TB pipeline cannot afford a second pass to audit what a write
produced; `df.observe` piggybacks named aggregate expressions on the
existing job (they ride the same tasks, merged on the driver), so the sink
gets its row counts / null counts / checksums for zero extra scans. This is
the engine-side analog of the reference's insert-time bookkeeping
(`src/processing/consumer.py:133-149` counts buffered rows in Python) and
the mechanism a scheduler wires into alerting next to `operators/quality.py`
constraint checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed_write(
    df: DataFrame, path: str, metrics: dict[str, Column], fmt: str = "parquet"
) -> dict[str, object]:
    """Write `df` to `path`, returning the observed metric values computed
    on exactly the rows written — one job, no second scan."""
    obs = Observation()
    audited = df.observe(obs, *[col.alias(name) for name, col in metrics.items()])
    audited.write.format(fmt).mode("overwrite").save(path)
    return obs.get
