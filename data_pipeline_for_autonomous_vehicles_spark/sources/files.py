"""File-replay sources: CSV / JSONL telemetry readers with the reference's
schema-on-read coercion semantics.

Reference: src/ingestion/waymo_replay.py — canonical column list with
per-column defaults (:25-40), type coercion (:41-58), and extension dispatch
(:83-92). Re-expressed as explicit-schema reads plus a `normalize_telemetry`
projection of pure column expressions (no inferSchema, no Python row loop —
the reference coerces row-at-a-time in Python; here the same rules are
whole-stage-codegen'd column expressions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalars import truthy_bool

# canonical telemetry columns + defaults (waymo_replay.py:25-40)
TELEMETRY_DEFAULTS: dict[str, object] = {
    "time": None,  # defaulted downstream (db.py:132-141 parses/uses now-UTC)
    "vehicle_id": 0,
    "current_speed_kmh": 0.0,
    "speed_limit_violation": False,
    "latitude": 0.0,
    "longitude": 0.0,
    "battery_level_pct": 100.0,
    "remaining_range_km": 0.0,
    "autopilot_engaged": True,
    "odometer_km": 0.0,
    "start_location": "",
    "destination": "",
}

_RAW_SCHEMA = T.StructType(
    [T.StructField(name, T.StringType(), True) for name in TELEMETRY_DEFAULTS]
)


def _num(col: str, default: float) -> F.Column:
    """float(v) with default on empty/invalid (waymo_replay.py:50-51):
    try_cast returns NULL on garbage instead of raising, like the reference's
    try/except ValueError."""
    c = F.trim(F.col(col))
    return F.coalesce(
        F.when(c == "", None).otherwise(c).try_cast("double"), F.lit(default)
    )


def normalize_telemetry(raw: DataFrame) -> DataFrame:
    """Apply the canonical-column + coercion contract to a string-typed frame.

    - missing column → default column (waymo_replay.py:46-47)
    - vehicle_id: int via float ("3.0" → 3, waymo_replay.py:49)
    - numerics: float with default (:50-51)
    - speed_limit_violation: truthy-set {"true","1","yes"} (:53)
    - autopilot_engaged: falsy-set {"false","0","no"} (:55)
    - time: best-effort timestamp parse, NULL if absent (consumer defaults it)
    """
    present = set(raw.columns)
    cols = []
    for name, default in TELEMETRY_DEFAULTS.items():
        if name not in present:
            if name == "time":
                cols.append(F.lit(None).cast("timestamp").alias(name))
            elif isinstance(default, bool):
                cols.append(F.lit(default).alias(name))
            elif isinstance(default, (int, float)):
                cols.append(F.lit(default).cast("double" if isinstance(default, float) else "int").alias(name))
            else:
                cols.append(F.lit(default).alias(name))
            continue
        if name == "time":
            cols.append(F.to_timestamp(F.trim(F.col(name))).alias(name))
        elif name == "vehicle_id":
            cols.append(
                F.coalesce(
                    F.trim(F.col(name)).try_cast("double").cast("int"), F.lit(0)
                ).alias(name)
            )
        elif name == "speed_limit_violation":
            cols.append(truthy_bool(F.col(name), default=False).alias(name))
        elif name == "autopilot_engaged":
            cols.append(truthy_bool(F.col(name), default=True).alias(name))
        elif isinstance(default, float):
            cols.append(_num(name, default).alias(name))
        else:  # strings
            cols.append(F.coalesce(F.col(name), F.lit(default)).alias(name))
    return raw.select(*cols)


def read_telemetry_csv(spark: SparkSession, path: str) -> DataFrame:
    """S4: header CSV read, all-string schema, then normalize (no inference)."""
    raw = spark.read.option("header", True).csv(path)
    return normalize_telemetry(raw.select([F.col(c).cast("string") for c in raw.columns]))


def read_telemetry_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S5: one JSON object per line; blank lines are skipped by the reader."""
    raw = spark.read.schema(_RAW_SCHEMA).json(path)
    return normalize_telemetry(raw)


def read_telemetry_auto(spark: SparkSession, path: str) -> DataFrame:
    """S6: extension dispatch (.csv vs .jsonl/.ndjson vs error),
    waymo_replay.py:83-92."""
    lower = path.lower()
    if lower.endswith(".csv"):
        return read_telemetry_csv(spark, path)
    if lower.endswith((".jsonl", ".ndjson")):
        return read_telemetry_jsonl(spark, path)
    raise ValueError(f"unsupported replay file type: {path} (expect .csv/.jsonl/.ndjson)")
