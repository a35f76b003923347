"""Weighted reservoir sampling (Efraimidis–Spirakis A-ES) with deterministic
pseudo-randomness — importance sampling a training-data curator can REPLAY.

Each doc draws u ∈ (0,1] from a portable hash of its id (not `rand()`: the
sample must be identical across engines, runs, and cluster sizes — the same
argument as `deterministic_sample` in operators/text.py) and gets the A-ES
log-priority ln(u)/w; the top-K priorities are a weighted-without-
replacement sample where P(selected) scales with the weight (here: document
length — longer docs carry more tokens, the usual budget-weighted choice).

Determinism: ln and one divide are scalar IEEE ops (same pattern as tfidf's
ln — mirrored token-for-token in the oracle); priorities are rounded to e9
before ranking, so a last-ulp libm difference cannot flip an order, and
doc_id breaks exact ties totally.

Scale shape: priority is a per-row map expression (no shuffle), and the
selection is `orderBy(...).limit(K)` → TakeOrderedAndProject: per-partition
heaps of K, merged on the driver — a 100 TB corpus is sampled in one scan
with zero data shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import portable_hash, round_half_up, sql_portable_hash

SAMPLE_K = 20
_SALT = "wsample:"
_U_DENOM = 4294967296.0  # 2^32 — portable_hash range is [0, 2^32)


def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K length-weighted deterministic sample of the documents table."""
    docs = load_table(spark, sf_dir, "documents")
    w = (F.length("text") + F.lit(1)).cast("double")
    u = (
        portable_hash(F.concat(F.lit(_SALT), F.col("doc_id").cast("string")))
        + F.lit(1)
    ).cast("double") / F.lit(_U_DENOM)
    pri = round_half_up(F.log(u) / w, 9)
    return (
        docs.select(
            "doc_id",
            (F.length("text") + F.lit(1)).cast("long").alias("weight"),
            pri.alias("log_priority"),
        )
        .orderBy(F.desc("log_priority"), F.asc("doc_id"))
        .limit(SAMPLE_K)
    )


def _sql_weighted_sample() -> str:
    h = sql_portable_hash(f"'{_SALT}' || CAST(doc_id AS VARCHAR)")
    r9 = (
        f"CAST(FLOOR((ln((CAST({h} AS DOUBLE) + 1) / {_U_DENOM!r})"
        f" / CAST(length(text) + 1 AS DOUBLE)) * 1000000000.0 + 0.5) AS DOUBLE)"
        " / 1000000000.0"
    )
    return f"""
SELECT doc_id,
       CAST(length(text) + 1 AS BIGINT) AS weight,
       {r9} AS log_priority
FROM documents
ORDER BY log_priority DESC, doc_id ASC
LIMIT {SAMPLE_K}
"""


QUERIES = {"weighted_sample_topk": weighted_sample_topk}
ORACLES = {"weighted_sample_topk": _sql_weighted_sample()}
