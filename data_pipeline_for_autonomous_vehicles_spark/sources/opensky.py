"""OpenSky-style aircraft-state normalization + proximity self-join.

Reference: src/ingestion/opensky_source.py —
  raw state vector → telemetry record (:51-99): stable vehicle_id from
  icao24 hex (:37-42), m/s→km/h (:80), callsign/origin defaults (:82-97),
  epoch→UTC string timestamps (:45-48), null-position drop (:72-78);
  nearby-aircraft perception events (:101-143): pairwise equirectangular
  distance (:125-127), 50 km cutoff (:128-129), self-exclusion (:118),
  ≤3 matches per aircraft (:141-142).

Spark-first: normalization is a pure column projection. The proximity join
is the one operator in the reference that is O(n²) — re-expressed as a
geo-cell bucketed equi-join: each aircraft lands in its ~0.5°×0.5° cell,
candidates join on the 3×3 neighborhood cells, then the exact distance
filter + per-left top-3 run on the (tiny) per-cell cross product. At fleet
scale this is shuffle-on-cell instead of a full cross join.

The live REST poll (S3, opensky_source.py:146-177) is network-bound and
driver-side by nature; `poll_states` is gated behind an import-try so tests
and offline runs use recorded fixtures (`states_from_rows`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalars import coalesce_str, equirect_distance_m

NEARBY_RADIUS_M = 50_000.0  # opensky_source.py:128
MAX_NEARBY = 3  # opensky_source.py:141-142
MS_TO_KMH = 3.6  # opensky_source.py:80
CELL_DEG = 0.5  # ~55 km at the equator: one cell ring covers the 50 km radius

# OpenSky /states/all vector layout (subset used by the reference, :69-99)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("icao24", T.StringType(), False),
        T.StructField("callsign", T.StringType(), True),
        T.StructField("origin_country", T.StringType(), True),
        T.StructField("time_position", T.LongType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("velocity_ms", T.DoubleType(), True),  # m/s
        T.StructField("baro_altitude_m", T.DoubleType(), True),
    ]
)


def states_from_rows(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Recorded-fixture source: raw state tuples → typed frame."""
    return spark.createDataFrame(rows, STATE_SCHEMA)


def vehicle_id_from_icao24(col: F.Column) -> F.Column:
    """(int(icao24, 16) & 0x7FFFFFFF) % 9999 + 1 (opensky_source.py:37-42).
    icao24 is 6 hex digits (< 2^31) so conv() cannot overflow."""
    return (
        (F.conv(col, 16, 10).cast("long").bitwiseAND(F.lit(0x7FFFFFFF)) % 9999) + 1
    ).cast("int")


def normalize_states(states: DataFrame) -> DataFrame:
    """Raw state vectors → telemetry records (opensky_source.py:51-99):
    null-position drop, unit conversion, string defaults, epoch timestamps."""
    kmh = F.col("velocity_ms") * MS_TO_KMH
    return (
        states.filter(F.col("latitude").isNotNull() & F.col("longitude").isNotNull())
        .select(
            F.to_timestamp(F.from_unixtime(F.coalesce(F.col("time_position"), F.lit(0)))).alias(
                "time"
            ),
            vehicle_id_from_icao24(F.col("icao24")).alias("vehicle_id"),
            F.col("icao24"),
            F.coalesce(kmh, F.lit(0.0)).alias("current_speed_kmh"),
            (F.coalesce(kmh, F.lit(0.0)) > 65.0).alias("speed_limit_violation"),
            F.col("latitude"),
            F.col("longitude"),
            F.lit(100.0).alias("battery_level_pct"),
            F.lit(100.0 * 5.2).alias("remaining_range_km"),
            F.lit(True).alias("autopilot_engaged"),
            F.lit(0.0).alias("odometer_km"),
            coalesce_str(F.col("origin_country")).alias("start_location"),
            coalesce_str(F.col("callsign")).alias("destination"),
        )
    )


def _with_cell(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "cell_x", F.floor(F.col("longitude") / CELL_DEG).cast("long")
    ).withColumn("cell_y", F.floor(F.col("latitude") / CELL_DEG).cast("long"))


def nearby_aircraft(states: DataFrame) -> DataFrame:
    """J3: for each aircraft, up to MAX_NEARBY others within 50 km, ordered by
    distance (deterministic improvement over the reference's poll order).

    Plan: explode each left row into its 3×3 neighbor cells → equi-join on
    cell → exact equirect distance filter → row_number ≤ 3. The join key is
    (cell_x, cell_y): per-cell candidate sets only — the full cross product
    never materializes.
    """
    norm = normalize_states(states).select(
        "time", "vehicle_id", "icao24", "latitude", "longitude", "current_speed_kmh"
    )
    right = _with_cell(norm).select(
        F.col("vehicle_id").alias("other_vehicle_id"),
        F.col("icao24").alias("other_icao24"),
        F.col("latitude").alias("other_lat"),
        F.col("longitude").alias("other_lon"),
        F.col("current_speed_kmh").alias("object_speed_kmh"),
        "cell_x",
        "cell_y",
    )
    offsets = F.array(*[F.lit(i) for i in (-1, 0, 1)])
    left = (
        _with_cell(norm)
        .withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .select(
            "time",
            "vehicle_id",
            "icao24",
            "latitude",
            "longitude",
            (F.col("cell_x") + F.col("dx")).alias("cell_x"),
            (F.col("cell_y") + F.col("dy")).alias("cell_y"),
        )
    )
    dist = equirect_distance_m(
        F.col("latitude"), F.col("longitude"), F.col("other_lat"), F.col("other_lon")
    )
    pairs = (
        left.join(right, ["cell_x", "cell_y"])
        .filter(F.col("icao24") != F.col("other_icao24"))  # self-exclusion (:118)
        .withColumn("object_distance_m", dist)
        .filter(F.col("object_distance_m") <= NEARBY_RADIUS_M)
    )
    w = Window.partitionBy("icao24").orderBy("object_distance_m", "other_icao24")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MAX_NEARBY)
        .select(
            "time",
            "vehicle_id",
            F.lit("aircraft").alias("object_class"),  # opensky_source.py:134
            "object_distance_m",
            "object_speed_kmh",
            F.lit("ahead").alias("object_relative_direction"),
            F.lit(0.95).alias("confidence"),
            "icao24",
            "other_icao24",
        )
    )


def poll_states(spark: SparkSession, bbox: tuple | None = None, timeout_s: int = 15):
    """S3 live REST poll — optional, network-gated (opensky_source.py:51-67).
    Returns a DataFrame of the current poll or None when offline."""
    try:
        import json
        import urllib.request

        url = "https://opensky-network.org/api/states/all"
        if bbox:
            lamin, lamax, lomin, lomax = bbox
            url += f"?lamin={lamin}&lamax={lamax}&lomin={lomin}&lomax={lomax}"
        with urllib.request.urlopen(url, timeout=timeout_s) as resp:
            payload = json.load(resp)
    except Exception:
        return None  # swallow-and-retry semantics (opensky_source.py:160-166)
    rows = []
    for s in payload.get("states") or []:
        rows.append(
            (
                s[0],
                s[1],
                s[2],
                int(s[3]) if s[3] is not None else None,
                float(s[5]) if s[5] is not None else None,
                float(s[6]) if s[6] is not None else None,
                float(s[9]) if s[9] is not None else None,
                float(s[13]) if s[13] is not None else None,
            )
        )
    return states_from_rows(spark, rows)
