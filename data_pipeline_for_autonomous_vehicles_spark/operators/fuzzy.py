"""Blocked fuzzy matching (entity resolution) over the `part` dimension.

The classic record-linkage shape a training-data pipeline needs for entity
dedup: candidate generation by BLOCKING KEY, then an edit-distance
comparator only within blocks. Naive fuzzy join is O(n²) comparisons; with
blocking it is Σ_b |block_b|², and the comparator (levenshtein) runs
JVM-side as a codegen'd expression — no Python in the loop.

Scale notes (100 TB):
- Exact-duplicate names are collapsed FIRST (groupBy name → min key), so
  the quadratic stage runs on the distinct-name dictionary, which is
  orders of magnitude smaller than the fact table and bounded by the
  vocabulary, not the row count.
- The self-join key is the blocking token, so each block's cross product
  is local to one shuffle partition; skewed blocks (a stopword noun) are
  the hazard — blocks above MAX_BLOCK names are dropped, the same cap
  strategy as MinHash-LSH bucket capping (dedup.MAX_BUCKET).
- `p_partkey < p_partkey` ordering emits each unordered pair once.

Reference parity note: the reference has no fuzzy matching; this extends
its exact equi-join surface (SURVEY.md §2.3) with the similarity-join
family expected of a corpus-curation engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

MAX_EDIT_DISTANCE = 4
MAX_BLOCK = 200  # drop blocking keys shared by more distinct names than this


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part-name pairs within edit distance MAX_EDIT_DISTANCE,
    blocked on the last name token (the head noun), each pair once."""
    part = load_table(spark, sf_dir, "part")
    names = (
        part.groupBy("p_name")
        .agg(F.min("p_partkey").alias("pk"))
        .withColumn("block", F.element_at(F.split(F.col("p_name"), " "), -1))
    )
    block_sizes = names.groupBy("block").agg(F.count(F.lit(1)).alias("n"))
    kept = names.join(
        F.broadcast(block_sizes.filter(F.col("n") <= MAX_BLOCK).select("block")), "block"
    )
    a = kept.select(F.col("pk").alias("pk_a"), F.col("p_name").alias("name_a"), "block")
    b = kept.select(F.col("pk").alias("pk_b"), F.col("p_name").alias("name_b"), "block")
    return (
        a.join(b, "block")
        .filter(F.col("pk_a") < F.col("pk_b"))
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_distance") <= MAX_EDIT_DISTANCE)
        .select("name_a", "name_b", "edit_distance")
        .orderBy("name_a", "name_b")
    )


_FUZZY_PAIRS_SQL = f"""
WITH names AS (
  SELECT p_name, MIN(p_partkey) AS pk,
         string_split(p_name, ' ')[-1] AS block
  FROM part GROUP BY p_name),
kept AS (
  SELECT * FROM names WHERE block IN (
    SELECT block FROM names GROUP BY block HAVING COUNT(*) <= {MAX_BLOCK}))
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS edit_distance
FROM kept a JOIN kept b ON a.block = b.block AND a.pk < b.pk
WHERE levenshtein(a.p_name, b.p_name) <= {MAX_EDIT_DISTANCE}
ORDER BY name_a, name_b
"""


def fuzzy_match_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization rollup: every part name mapped to the lexicographically
    smallest name within edit distance in its block (one hop — the
    candidate-pair graph's min-neighbor, the cheap first pass of entity
    canonicalization before full transitive closure via near_dup_clusters'
    iterative scheme). Output: canonical name → member count."""
    part = load_table(spark, sf_dir, "part")
    names = (
        part.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("block", F.element_at(F.split(F.col("p_name"), " "), -1))
    )
    a = names.select(F.col("p_name").alias("name"), "block", "n_parts")
    b = names.select(F.col("p_name").alias("cand"), "block")
    joined = (
        a.join(b, "block")
        .filter(F.levenshtein("name", "cand") <= MAX_EDIT_DISTANCE)
        .groupBy("name", "n_parts")
        .agg(F.min("cand").alias("canonical"))
    )
    return (
        joined.groupBy("canonical")
        .agg(
            F.count(F.lit(1)).alias("n_names"),
            F.sum("n_parts").alias("n_parts"),
        )
        .orderBy("canonical")
    )


_FUZZY_GROUPS_SQL = f"""
WITH names AS (
  SELECT p_name, COUNT(*) AS n_parts,
         string_split(p_name, ' ')[-1] AS block
  FROM part GROUP BY p_name),
mapped AS (
  SELECT a.p_name AS name, a.n_parts, MIN(b.p_name) AS canonical
  FROM names a JOIN names b ON a.block = b.block
  WHERE levenshtein(a.p_name, b.p_name) <= {MAX_EDIT_DISTANCE}
  GROUP BY a.p_name, a.n_parts)
SELECT canonical, COUNT(*) AS n_names, CAST(SUM(n_parts) AS BIGINT) AS n_parts
FROM mapped
GROUP BY canonical
ORDER BY canonical
"""


QUERIES = {
    "fuzzy_name_pairs": fuzzy_name_pairs,
    "fuzzy_match_groups": fuzzy_match_groups,
}

ORACLES = {
    "fuzzy_name_pairs": _FUZZY_PAIRS_SQL,
    "fuzzy_match_groups": _FUZZY_GROUPS_SQL,
}
