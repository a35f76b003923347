"""Training-run assembly operators over the `documents` table.

The curation ladder (corpus.py / dedup.py) decides WHAT goes into the
corpus; these operators grade HOW the surviving corpus is assembled into an
actual training run: context-length truncation waste, packing-order
strategy, curriculum phasing, and shard read-order mixing. They are the
audits a 100 TB corpus build runs after curation and before the first
training step — each one answers a serving decision (which context length,
which packing order, which curriculum bands, is the shard writer's order
reader-safe).

North-star extensions (no reference counterpart — the reference's analytics
stop at fleet metrics, `/root/reference/src/metrics/queries.py:29-223`);
they follow the same contract as every other operator here: pure column
expressions, literal ANSI twins for the DuckDB oracle, no Python UDFs.

Scale notes: `context_truncation_report` and `curriculum_phases` are one
map pass + a tiny hash-agg (cells = |sources|x|lens| and |phases|);
`packing_strategy_compare` and `shard_interleaving_audit` use windows
partitioned by the pack/shard key only — at 100 TB the shard key widens to
(lang, hash % n_shards) exactly as `token_budget_bins` documents, so each
partition's sort stays one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import (
    portable_hash,
    round_half_up,
    sql_portable_hash,
    sql_round_half_up,
)
from .text import (
    _SQL_N_TOK,
    N_SHARDS,
    PACK_BUDGET_CHARS,
    _n_tok,
    _quality_score_col,
    pack_bin_col,
    sql_pack_bins,
)

# Context lengths to grade truncation at. Driver docs run 10-99 whitespace
# tokens, so every rung truncates a real share of the corpus at test scale;
# on a production corpus these become the candidate model context lengths.
CONTEXT_LENS: tuple[int, ...] = (16, 32, 64, 96)

# Curriculum bands on the heuristic quality score (text.quality_scores):
# phase 1 = cleanest documents (trained first), phase 4 = the tail. Edges
# chosen at the observed quartiles of the driver corpus so all four phases
# are populated at every test scale.
PHASE_EDGES: tuple[float, ...] = (0.72, 0.64, 0.52)


def _phase_col(q: F.Column) -> F.Column:
    """Curriculum phase from a quality-score column — the ONE banding both
    `curriculum_phases` and `curriculum_read_order` apply."""
    return (
        F.when(q >= PHASE_EDGES[0], F.lit(1))
        .when(q >= PHASE_EDGES[1], F.lit(2))
        .when(q >= PHASE_EDGES[2], F.lit(3))
        .otherwise(F.lit(4))
    )


def _sql_phase(score_expr: str) -> str:
    """DuckDB twin of `_phase_col` over an already-computed score column."""
    return (
        f"CASE WHEN {score_expr} >= {PHASE_EDGES[0]} THEN 1"
        f" WHEN {score_expr} >= {PHASE_EDGES[1]} THEN 2"
        f" WHEN {score_expr} >= {PHASE_EDGES[2]} THEN 3"
        f" ELSE 4 END"
    )


# --- context-length truncation waste ---------------------------------------


def context_truncation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token loss at each candidate context length, per source: if every
    document is truncated to its first `context_len` whitespace tokens, how
    many documents are cut and what share of each source's token mass is
    thrown away. The "which context length do we serve" number — the dual
    of `token_budget_bins` (which packs; this one measures what truncation
    destroys instead).

    Scale: one map pass computes per-doc token counts; the per-source agg
    carries one (kept, truncated) pair per context length as plain columns
    (fully map-side-combined); only the |sources| aggregated rows are
    exploded into (context_len, source) cells. Nothing row-sized crosses a
    shuffle except the token-count integers."""
    docs = load_table(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("total_tokens")]
    for ln in CONTEXT_LENS:
        aggs.append(F.sum(F.least(F.col("n_tok"), F.lit(ln))).alias(f"kept_{ln}"))
        aggs.append(F.sum((F.col("n_tok") > ln).cast("long")).alias(f"trunc_{ln}"))
    per_source = (
        docs.select("source", _n_tok().alias("n_tok")).groupBy("source").agg(*aggs)
    )
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(ln).alias("context_len"),
                    F.col(f"kept_{ln}").alias("tokens_kept"),
                    F.col(f"trunc_{ln}").alias("n_truncated"),
                )
                for ln in CONTEXT_LENS
            ]
        )
    )
    lost = F.col("total_tokens") - F.col("c.tokens_kept")
    denom = F.when(F.col("total_tokens") == 0, F.lit(None)).otherwise(
        F.col("total_tokens")
    )
    return (
        per_source.select("source", "n_docs", "total_tokens", cells.alias("c"))
        .select(
            F.col("c.context_len").alias("context_len"),
            "source",
            "n_docs",
            F.col("c.n_truncated").alias("n_truncated"),
            F.col("c.tokens_kept").alias("tokens_kept"),
            lost.alias("tokens_lost"),
            round_half_up(
                lost.cast("double") / denom.cast("double"), 6
            ).alias("loss_pct"),
        )
        .orderBy("context_len", "source")
    )


_LENS_LIST = "[" + ", ".join(str(ln) for ln in CONTEXT_LENS) + "]"
_TRUNC_SQL = f"""
WITH d AS (
  SELECT source, {_SQL_N_TOK} AS n_tok FROM documents),
lens AS (SELECT unnest({_LENS_LIST}) AS context_len)
SELECT CAST(context_len AS INTEGER) AS context_len, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_tok > context_len THEN 1 ELSE 0 END) AS BIGINT)
         AS n_truncated,
       CAST(SUM(LEAST(n_tok, context_len)) AS BIGINT) AS tokens_kept,
       CAST(SUM(n_tok) - SUM(LEAST(n_tok, context_len)) AS BIGINT) AS tokens_lost,
       {sql_round_half_up(
           "(CAST(SUM(n_tok) AS DOUBLE) - CAST(SUM(LEAST(n_tok, context_len)) AS DOUBLE))"
           " / CAST(NULLIF(SUM(n_tok), 0) AS DOUBLE)", 6)} AS loss_pct
FROM d CROSS JOIN lens
GROUP BY context_len, source
ORDER BY context_len, source
"""


# --- packing-order strategy comparison --------------------------------------


def packing_strategy_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy concat-and-chunk packing (the `token_budget_bins` rule: bin =
    exclusive-running-total DIV budget, each bin may overrun by at most one
    document) evaluated under TWO document orders — corpus order (`doc_id`)
    vs length-sorted (`n_chars` DESC) — reporting per (strategy, lang) the
    bin count, total/overflow chars, and mean fill. Length-sorted packing
    is the standard padding-waste reducer; this report is the measurement
    that justifies (or rejects) the extra sort at 100 TB.

    Scale: two window passes partitioned by lang (the pack shard — widen to
    (lang, hash % n_shards) at scale, same note as `token_budget_bins`);
    the unioned output is 2x|lang| rows."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def _strategy(order_cols: list[F.Column], name: str) -> DataFrame:
        bins = (
            docs.withColumn("bin_id", pack_bin_col(*order_cols))
            .groupBy("lang", "bin_id")
            .agg(F.sum("n_chars").cast("long").alias("bin_chars"))
        )
        over = F.greatest(
            F.col("bin_chars") - F.lit(PACK_BUDGET_CHARS), F.lit(0)
        ).cast("long")
        return bins.groupBy("lang").agg(
            F.lit(name).alias("strategy"),
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("bin_chars").alias("total_chars"),
            F.sum(over).alias("overflow_chars"),
        )

    doc_order = _strategy([F.col("doc_id")], "doc_order")
    by_length = _strategy(
        [F.col("n_chars").desc(), F.col("doc_id")], "length_sorted"
    )
    fill = F.col("total_chars").cast("double") / (
        F.col("n_bins") * F.lit(PACK_BUDGET_CHARS)
    ).cast("double")
    return (
        doc_order.unionByName(by_length)
        .select(
            "strategy",
            "lang",
            "n_bins",
            "total_chars",
            "overflow_chars",
            round_half_up(fill, 4).alias("mean_fill"),
        )
        .orderBy("strategy", "lang")
    )


def _sql_packing_compare() -> str:
    def _arm(order_by: str, name: str) -> str:
        return f"""
SELECT '{name}' AS strategy, lang,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(bin_chars) AS BIGINT) AS total_chars,
       CAST(SUM(GREATEST(bin_chars - {PACK_BUDGET_CHARS}, 0)) AS BIGINT)
         AS overflow_chars,
       {sql_round_half_up(
           f"CAST(SUM(bin_chars) AS DOUBLE)"
           f" / (CAST(COUNT(*) AS DOUBLE) * {PACK_BUDGET_CHARS}.0)", 4)} AS mean_fill
FROM ({sql_pack_bins(order_by)}) bins
GROUP BY lang"""

    return (
        "SELECT * FROM ("
        + _arm("doc_id", "doc_order")
        + " UNION ALL "
        + _arm("n_chars DESC, doc_id", "length_sorted")
        + ") u ORDER BY strategy, lang"
    )


# --- curriculum phasing ------------------------------------------------------


def curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule over the heuristic quality score: fixed bands
    (PHASE_EDGES) assign every document a training phase — 1 = cleanest,
    trained first — and the report gives each phase's composition (docs,
    tokens, languages, mean quality, doc/token share of the corpus). The
    curriculum twin of `curation_threshold_matrix`: thresholds there decide
    keep/drop, bands here decide WHEN a kept document is seen.

    Exactness: the per-doc score is already 1e-4 fixed point
    (`text._quality_score_col`), so the phase mean is a ratio of exact
    integers — no order-dependent double accumulation.

    Scale: pure per-row phase expression + one hash-agg on |phases| cells,
    then a 1-row broadcast for the shares."""
    docs = load_table(spark, sf_dir, "documents")
    q = _quality_score_col()
    q4 = F.floor(q * F.lit(10000.0) + F.lit(0.5)).cast("long")
    per_phase = (
        docs.select(
            _phase_col(q).alias("phase"),
            _n_tok().alias("n_tok"),
            q4.alias("q4"),
            "lang",
        )
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("q4").alias("sum_q4"),
        )
    )
    totals = per_phase.agg(
        F.sum("n_docs").alias("_tot_docs"), F.sum("n_tokens").alias("_tot_tokens")
    )
    mean_q = F.col("sum_q4").cast("double") / (
        F.col("n_docs") * F.lit(10000)
    ).cast("double")
    return (
        per_phase.crossJoin(F.broadcast(totals))
        .select(
            "phase",
            "n_docs",
            "n_tokens",
            "n_langs",
            round_half_up(mean_q, 6).alias("mean_quality"),
            round_half_up(
                F.col("n_docs").cast("double") / F.col("_tot_docs").cast("double"), 6
            ).alias("doc_share"),
            round_half_up(
                F.col("n_tokens").cast("double") / F.col("_tot_tokens").cast("double"),
                6,
            ).alias("token_share"),
        )
        .orderBy("phase")
    )


def _sql_curriculum() -> str:
    # the score comes from text._QUALITY_SQL itself — the same join-the-
    # quality-frame pattern every other funnel oracle uses, so the
    # heuristic has exactly one SQL spelling repo-wide
    from .text import _QUALITY_SQL

    return f"""
WITH q AS (SELECT doc_id, quality_score FROM ({_QUALITY_SQL}) x),
scored AS (
  SELECT {_sql_phase("q.quality_score")} AS phase,
         {_SQL_N_TOK} AS n_tok,
         CAST(FLOOR(q.quality_score * 10000.0 + 0.5) AS BIGINT) AS q4,
         d.lang
  FROM documents d JOIN q ON q.doc_id = d.doc_id),
per_phase AS (
  SELECT phase, COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens,
         COUNT(DISTINCT lang) AS n_langs, SUM(q4) AS sum_q4
  FROM scored GROUP BY phase),
totals AS (SELECT SUM(n_docs) AS tot_docs, SUM(n_tokens) AS tot_tokens FROM per_phase)
SELECT CAST(phase AS INTEGER) AS phase,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_langs AS BIGINT) AS n_langs,
       {sql_round_half_up(
           "CAST(sum_q4 AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 10000.0)", 6)}
         AS mean_quality,
       {sql_round_half_up(
           "CAST(n_docs AS DOUBLE) / CAST(tot_docs AS DOUBLE)", 6)} AS doc_share,
       {sql_round_half_up(
           "CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE)", 6)} AS token_share
FROM per_phase CROSS JOIN totals
ORDER BY phase
"""


# --- shard read-order mixing audit ------------------------------------------


def shard_interleaving_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixing audit of the `training_shards` writer contract: within
    each hash shard, documents in hash read order are scanned for RUNS of
    consecutive same-source docs. A reader consuming a shard sequentially
    sees gradient batches dominated by one source whenever runs are long —
    `interleave_ratio` (runs/docs; 1.0 = perfectly alternating) and
    `max_run_len` are the numbers that say whether the hash order is a
    sufficient shuffle or an explicit interleaver is needed.

    Scale: windows partitioned by shard only (widen the shard count so each
    partition is one task's worth — the shard is by definition the unit one
    reader consumes). Run detection is a lag + running sum in ONE window
    spec; everything after is |shards|-sized."""
    docs = load_table(spark, sf_dir, "documents")
    h = portable_hash(F.col("doc_id").cast("string"))
    base = docs.select(
        "doc_id", "source", h.alias("h"), (h % N_SHARDS).alias("shard")
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    prev = F.lag("source").over(w)
    new_run = (prev.isNull() | (prev != F.col("source"))).cast("long")
    run_id = F.sum(new_run).over(w.rowsBetween(Window.unboundedPreceding, 0))
    # `source` is constant within a run, so the run rollup can carry it
    # (min == the value) and the per-shard distinct-source count rides the
    # SAME windowed pass — one corpus scan, no second scan + join
    runs = (
        base.withColumn("run_id", run_id)
        .groupBy("shard", "run_id")
        .agg(F.count(F.lit(1)).alias("run_len"), F.min("source").alias("source"))
    )
    return (
        runs.groupBy("shard")
        .agg(
            F.sum("run_len").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_runs"),
            F.max("run_len").alias("max_run_len"),
        )
        .select(
            "shard",
            "n_docs",
            "n_sources",
            "n_runs",
            "max_run_len",
            round_half_up(
                F.col("n_runs").cast("double") / F.col("n_docs").cast("double"), 4
            ).alias("interleave_ratio"),
        )
        .orderBy("shard")
    )


def _sql_interleaving() -> str:
    h = sql_portable_hash("CAST(doc_id AS VARCHAR)")
    return f"""
WITH base AS (
  SELECT doc_id, source, {h} AS h, {h} % {N_SHARDS} AS shard FROM documents),
marked AS (
  SELECT shard, source, h, doc_id,
         CASE WHEN lag(source) OVER w IS NULL
                OR lag(source) OVER w <> source THEN 1 ELSE 0 END AS new_run
  FROM base
  WINDOW w AS (PARTITION BY shard ORDER BY h, doc_id)),
numbered AS (
  SELECT shard, source,
         SUM(new_run) OVER (PARTITION BY shard ORDER BY h, doc_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
  FROM marked),
runs AS (
  SELECT shard, run_id, COUNT(*) AS run_len, MIN(source) AS source
  FROM numbered GROUP BY 1, 2)
SELECT shard,
       CAST(SUM(run_len) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(MAX(run_len) AS BIGINT) AS max_run_len,
       {sql_round_half_up(
           "CAST(COUNT(*) AS DOUBLE) / CAST(SUM(run_len) AS DOUBLE)", 4)}
         AS interleave_ratio
FROM runs GROUP BY shard
ORDER BY shard
"""


# --- curriculum-ordered shard read order --------------------------------------


def curriculum_read_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTING composition of curriculum and sharding: the per-document
    read-order manifest a curriculum-aware trainer consumes. Every doc gets
    its hash shard (the `training_shards` writer contract), its curriculum
    phase (the `curriculum_phases` bands), and `read_pos` — its 1-based
    position within the shard when the shard is read phase-major
    (cleanest phase first) and hash-shuffled within each phase. Writing
    shards sorted by this key IS the curriculum schedule; no trainer-side
    sort remains.

    Scale: one per-row expression pass + one window partitioned by shard
    (the unit a reader consumes — widen the shard count at 100 TB exactly
    as `training_shards` documents). Output is one row per doc — the same
    manifest weight as `curation_kept_docs`."""
    docs = load_table(spark, sf_dir, "documents")
    h = portable_hash(F.col("doc_id").cast("string"))
    base = docs.select(
        "doc_id",
        h.alias("h"),
        (h % N_SHARDS).alias("shard"),
        _phase_col(_quality_score_col()).alias("phase"),
    )
    w = Window.partitionBy("shard").orderBy("phase", "h", "doc_id")
    return (
        base.select(
            "doc_id",
            "shard",
            "phase",
            F.row_number().over(w).cast("long").alias("read_pos"),
        )
        # no final orderBy: read_pos carries the order; scaling output (guide §2.4)
    )


def _sql_read_order() -> str:
    from .text import _QUALITY_SQL

    h = sql_portable_hash("CAST(d.doc_id AS VARCHAR)")
    return f"""
WITH q AS (SELECT doc_id, quality_score FROM ({_QUALITY_SQL}) x),
base AS (
  SELECT d.doc_id, {h} AS h, {h} % {N_SHARDS} AS shard,
         {_sql_phase("q.quality_score")} AS phase
  FROM documents d JOIN q ON q.doc_id = d.doc_id)
SELECT doc_id, shard, CAST(phase AS INTEGER) AS phase,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY phase, h, doc_id)
            AS BIGINT) AS read_pos
FROM base
ORDER BY doc_id
"""


QUERIES = {
    "context_truncation_report": context_truncation_report,
    "curriculum_read_order": curriculum_read_order,
    "packing_strategy_compare": packing_strategy_compare,
    "curriculum_phases": curriculum_phases,
    "shard_interleaving_audit": shard_interleaving_audit,
}

ORACLES = {
    "context_truncation_report": _TRUNC_SQL,
    "curriculum_read_order": _sql_read_order(),
    "packing_strategy_compare": _sql_packing_compare(),
    "curriculum_phases": _sql_curriculum(),
    "shard_interleaving_audit": _sql_interleaving(),
}
