"""Event-sequence pattern matching over per-user journeys — the
MATCH_RECOGNIZE / ClickHouse-`sequenceMatch` capability expressed as ordinary
DataFrame ops.

Each user's events are totally ordered by (ts, event_id) and compressed to a
journey string of one-char codes (first letter of event_type — unique across
the domain {click, error, purchase, signup, view}); sequence predicates are
then plain regexes evaluated JVM-side with `rlike`. The reference keeps no
ordered per-entity history at all (its queries are window aggregates,
`src/metrics/queries.py:29-223`), so this is a north-star extension in the
behavioral-analytics family next to `event_transitions` / `user_sessions`.

Scale shape: ONE shuffle, keyed by user. `collect_list` runs as a partial
(map-side) aggregate, so the shuffle carries each user's events once; the
per-key payload is bounded by a single user's activity (thousands of events,
bytes per event), far under executor memory even when the table is 100 TB —
journeys are per-entity small even when the corpus is huge. The regex flags
are whole-stage-codegen'd string ops on the already-aggregated (one row per
user) relation; pattern counts re-aggregate that tiny relation without
touching the fact table again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

# portable Java-regex ∩ RE2 subset: literals, '.*', '^' anchors only
PATTERNS = {
    "funnel_vcp": "v.*c.*p",  # view → click → purchase, any gaps
    "purchase_after_error": "e.*p",  # recovered after an error
    "starts_with_signup": "^s",  # first-ever event is the signup
}


def _journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    coded = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("code"),
    )
    # array_sort on (ts, event_id, code) structs = total order: event_id is
    # unique, so ties on ts are broken deterministically in both engines
    journey = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "code"))),
            lambda x: x["code"],
        ),
        "",
    )
    return coded.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), journey.alias("journey")
    )


def user_journey_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: event count plus one boolean per sequence pattern."""
    j = _journeys(spark, sf_dir)
    for name, pat in PATTERNS.items():
        j = j.withColumn(name, F.col("journey").rlike(pat))
    return j.select("user_id", "n_events", *PATTERNS).orderBy("user_id")


def journey_pattern_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleet rollup: how many users match each sequence pattern."""
    j = _journeys(spark, sf_dir)
    arms = [
        F.struct(
            F.lit(name).alias("pattern"),
            F.sum(F.when(F.col("journey").rlike(pat), 1).otherwise(0)).alias(
                "n_users"
            ),
        )
        for name, pat in PATTERNS.items()
    ]
    return (
        j.agg(F.explode(F.array(*arms)).alias("a"))
        .select("a.pattern", "a.n_users")
        .orderBy("pattern")
    )


_JOURNEY_CTE = """
journeys AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         STRING_AGG(SUBSTRING(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS journey
  FROM events
  GROUP BY user_id)
"""


def _sql_patterns() -> str:
    flags = ",\n       ".join(
        f"REGEXP_MATCHES(journey, '{pat}') AS {name}"
        for name, pat in PATTERNS.items()
    )
    return f"""
WITH {_JOURNEY_CTE}
SELECT user_id, n_events,
       {flags}
FROM journeys
ORDER BY user_id
"""


def _sql_pattern_counts() -> str:
    arms = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS pattern, "
        f"CAST(SUM(CASE WHEN REGEXP_MATCHES(journey, '{pat}') THEN 1 ELSE 0 END) AS BIGINT) AS n_users "
        "FROM journeys"
        for name, pat in PATTERNS.items()
    )
    return f"""
WITH {_JOURNEY_CTE}
{arms}
ORDER BY pattern
"""


PREFIX_LEN = 12
TOP_JOURNEYS = 10


def top_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-pattern mining lite: the TOP_JOURNEYS most common journey
    PREFIXES (first PREFIX_LEN events) with user counts and share. Prefixes
    keep the group key bounded no matter how active a user is; the regroup
    runs on the one-row-per-user journey frame, and top-k is a
    TakeOrderedAndProject. Tie-break: prefix ascending."""
    j = _journeys(spark, sf_dir)
    prefixes = j.select(F.substring("journey", 1, PREFIX_LEN).alias("journey_prefix"))
    counts = prefixes.groupBy("journey_prefix").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    total = counts.agg(F.sum("n_users").alias("n_total"))
    from ..functions.scalars import round_half_up

    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "journey_prefix",
            "n_users",
            round_half_up(
                F.col("n_users").cast("double") / F.col("n_total").cast("double"), 4
            ).alias("user_share"),
        )
        .orderBy(F.desc("n_users"), F.asc("journey_prefix"))
        .limit(TOP_JOURNEYS)
    )


def _sql_top_journeys() -> str:
    return f"""
WITH {_JOURNEY_CTE},
prefixes AS (
  SELECT SUBSTRING(journey, 1, {PREFIX_LEN}) AS journey_prefix FROM journeys),
counts AS (
  SELECT journey_prefix, COUNT(*) AS n_users FROM prefixes GROUP BY journey_prefix)
SELECT journey_prefix, n_users,
       CAST(FLOOR((CAST(n_users AS DOUBLE)
             / CAST((SELECT SUM(n_users) FROM counts) AS DOUBLE)) * 10000.0 + 0.5)
            AS DOUBLE) / 10000.0 AS user_share
FROM counts
ORDER BY n_users DESC, journey_prefix ASC
LIMIT {TOP_JOURNEYS}
"""


QUERIES = {
    "user_journey_patterns": user_journey_patterns,
    "journey_pattern_counts": journey_pattern_counts,
    "top_journeys": top_journeys,
}

ORACLES = {
    "user_journey_patterns": _sql_patterns(),
    "journey_pattern_counts": _sql_pattern_counts(),
    "top_journeys": _sql_top_journeys(),
}
