"""BM25 full-text ranking over the documents table — the length-normalized
upgrade of `tfidf_top_terms` (operators/text.py) and the lexical leg that
`hybrid_search_rrf` (operators/similarity.py) approximates with integer IDF.

Okapi BM25 with the standard k1/b parameters: per query term
    idf(t)  = ln(1 + (N − df + 0.5) / (df + 0.5))
    norm(d) = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
summed over the query. Per-(doc, term) arithmetic is scalar IEEE — identical
in Spark and DuckDB when the expression tree is written identically (both
sides below mirror token-for-token); the only order-dependent step, the
per-doc sum over query terms, goes through the scaled-int64 exact-sum
pattern (functions/scalars.py rationale).

Scale shape: one (doc, term) hash agg builds tf; doc length and the corpus
scalars (N, avgdl) derive from tf without rescanning text; the query-term
filter lands BEFORE the scoring join, so everything downstream of the first
shuffle is |Q|·(matching docs) rows; df and the scalar row are broadcast;
the final top-k is a TakeOrderedAndProject (no global sort). Document
bodies never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def rank_of_topk(top: DataFrame, score_desc: str, tiebreak_asc: str) -> DataFrame:
    """Display rank 1..K for an already-top-k'd relation WITHOUT a window:
    rank(r) = 1 + |rows strictly before r| via a broadcast self-join over
    the K survivors (K² pairs, K ≤ tens). A row_number window here would
    be an unpartitioned WindowExec — harmless on K rows but it puts a
    single-partition window operator in the plan, which the plan audit
    (`plans.unpartitioned_windows`) bans outright so that the invariant
    "no window ever runs pre-limit on data-sized input" stays machine-
    checkable with zero exceptions."""
    a, b = top.alias("a"), top.alias("b")
    before = (F.col(f"b.{score_desc}") > F.col(f"a.{score_desc}")) | (
        (F.col(f"b.{score_desc}") == F.col(f"a.{score_desc}"))
        & (F.col(f"b.{tiebreak_asc}") < F.col(f"a.{tiebreak_asc}"))
    )
    return (
        a.join(F.broadcast(b), before, "left")
        .groupBy(*[F.col(f"a.{c}").alias(c) for c in top.columns])
        .agg((F.count(F.col(f"b.{tiebreak_asc}")) + 1).cast("long").alias("topk_pos"))
    )


QUERY_TERMS = ("vector", "merge", "stream")
TOP_K = 10
K1 = 1.2
B = 0.75
_K1P1 = K1 + 1.0  # literalized in Python so both engines parse one constant
_OMB = 1.0 - B


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K documents for QUERY_TERMS by BM25, tie-broken by doc_id.

    QUERY_TERMS is a plan-time constant, so tf/dl per query term are
    per-document ARRAY EXPRESSIONS over the tokenized text — there is no
    (doc, term) shuffle anywhere: pass 1 is a map-side reduce to the 1-row
    corpus stats (n_docs, avgdl, per-term df), pass 2 re-scans docs,
    broadcasts the stats row, scores each doc in closed form, and finishes
    with a TakeOrderedAndProject. The previous form re-derived a corpus-
    sized (doc, term) hash aggregate in four plan branches (14 exchanges);
    this one has two scans and the stats singleton. Per-(doc, term)
    arithmetic is written token-for-token like the oracle, and contributions
    are exact int64 (floor(x·1e6+0.5)) before the per-doc sum, so results
    are bit-identical."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    nq = len(QUERY_TERMS)

    def _tf(term: str) -> F.Column:
        # NB: a single-arg lambda — a 2-arg lambda would bind PySpark's
        # (element, index) higher-order convention, not a Python closure
        return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("long")

    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(QUERY_TERMS)],
    ).cache()  # (doc_id, 4 longs): tokenize once, both passes read this
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(nq)
        ],
    ).select(
        "n_docs",
        (F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")).alias(
            "avgdl"
        ),
        *[F.col(f"df_{i}") for i in range(nq)],
    )

    def _contrib_e6(i: int) -> F.Column:
        tf = F.col(f"tf_{i}").cast("double")
        dfi = F.col(f"df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - dfi + F.lit(0.5)) / (dfi + F.lit(0.5))
        )
        norm = (tf * F.lit(_K1P1)) / (
            tf
            + F.lit(K1)
            * (F.lit(_OMB) + F.lit(B) * F.col("dl").cast("double") / F.col("avgdl"))
        )
        return F.when(
            F.col(f"tf_{i}") > 0,
            F.floor(idf * norm * F.lit(1_000_000.0) + F.lit(0.5)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    n_matched = sum((F.col(f"tf_{i}") > 0).cast("long") for i in range(nq))
    bm25 = sum(_contrib_e6(i) for i in range(nq)).cast("double") / F.lit(1_000_000.0)
    scored = (
        base.crossJoin(F.broadcast(stats))
        .filter(n_matched >= 1)
        .select("doc_id", n_matched.alias("n_matched_terms"), bm25.alias("bm25"))
    )
    # top-k first (TakeOrderedAndProject over the per-doc relation); the
    # display rank over the K survivors comes from rank_of_topk's broadcast
    # self-join — zero WindowExec anywhere in this plan.
    top = scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(TOP_K)
    return rank_of_topk(top, "bm25", "doc_id").select(
        F.col("topk_pos").alias("rank"), "doc_id", "n_matched_terms", "bm25"
    )


def _sql_bm25() -> str:
    in_list = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    return f"""
WITH terms AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM terms WHERE term <> ''
  GROUP BY doc_id, term),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
tfq AS (SELECT * FROM tf WHERE term IN ({in_list})),
df AS (SELECT term, COUNT(*) AS df FROM tfq GROUP BY term),
scalars AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         CAST((SELECT SUM(tf) FROM tf) AS DOUBLE)
           / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS avgdl),
scored AS (
  SELECT tfq.doc_id,
         COUNT(*) AS n_matched_terms,
         CAST(SUM(CAST(FLOOR(
           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
                     / (CAST(df.df AS DOUBLE) + 0.5))
           * ((CAST(tfq.tf AS DOUBLE) * {_K1P1!r})
              / (CAST(tfq.tf AS DOUBLE)
                 + {K1!r} * ({_OMB!r}
                             + {B!r} * CAST(dl.dl AS DOUBLE) / s.avgdl)))
           * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS bm25
  FROM tfq
  JOIN dl ON tfq.doc_id = dl.doc_id
  JOIN df ON tfq.term = df.term
  CROSS JOIN scalars s
  GROUP BY tfq.doc_id)
SELECT rank, doc_id, n_matched_terms, bm25 FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS rank
  FROM scored) t
WHERE rank <= {TOP_K}
ORDER BY rank
"""


POSTINGS_CAP = 10


def term_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the batch job whose output BM25-style serving
    reads: per term, document frequency, total term frequency, and the first
    POSTINGS_CAP doc ids of the (sorted) posting list.

    Scale shape: one (doc, term) hash agg (the same single fact shuffle as
    bm25_topk — an index build IS that aggregate plus a term-keyed regroup),
    then a term-keyed `collect_list` whose payload is bounded ids, never
    text. The posting arrays here are capped for the driver check; the
    production writer would range-partition by term and spill full lists to
    per-term parquet row groups — same plan, unbounded sink.
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.slice(
                F.array_sort(F.collect_list("doc_id")), 1, POSTINGS_CAP
            ).alias("top_doc_ids"),
        )
        .orderBy("term")
    )


_POSTINGS_SQL = f"""
WITH terms AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM terms WHERE term <> ''
  GROUP BY doc_id, term)
SELECT term,
       COUNT(*) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       list_sort(list(doc_id))[1:{POSTINGS_CAP}] AS top_doc_ids
FROM tf
GROUP BY term
ORDER BY term
"""


QUERIES = {"bm25_topk": bm25_topk, "term_postings": term_postings}
ORACLES = {"bm25_topk": _sql_bm25(), "term_postings": _POSTINGS_SQL}
