"""Streaming incremental dedup: novelty admission on a document stream.

The batch `operators.dedup.minhash_delta_probe` answers "is this new batch
near-dup of the corpus" for a batch at rest; this is the same admission
decision made ON THE STREAM — the shape a live crawl ingest runs, where
documents arrive continuously and each must be admitted or dropped against
the corpus built so far. It upgrades the reference's consumer loop (buffer
→ batch INSERT, `/root/reference/src/processing/consumer.py:133-149`),
which admits everything unconditionally.

Design (stream-static probe via foreachBatch):
  - the corpus band INDEX is built once, batch-side, and eagerly
    materialized (`localCheckpoint`) before the stream starts — at 100 TB
    this is the persisted band table bucketed by (band_id, band_hash);
  - each micro-batch runs the exact batch probe machinery
    (`dedup.probe_band_index`: signatures → band postings → index
    equi-join → per-doc verdict) — stream state stays EMPTY (no watermark,
    no aggregation state): all cross-batch knowledge lives in the index,
    so any micro-batch chunking yields the same per-doc verdicts
    (proven by the stream≡batch pytest and the shared DuckDB oracle);
  - per-batch verdicts land through the sink callback; the default driver
    accumulation here stands in for the parquet/alert sink a production
    run would use (verdicts are one narrow row per delta doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.dedup import _is_delta, corpus_band_index, probe_band_index

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

VERDICT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_corpus_matches", LongType()),
        StructField("first_match_doc", LongType()),
        StructField("is_novel", LongType()),
    ]
)


def stream_documents(
    spark: SparkSession, path: str, glob: str = "documents.parquet"
) -> DataFrame:
    """readStream over a documents parquet directory (explicit schema, as
    the file streaming source requires). The default glob picks the single
    `documents.parquet` out of an sf_dir; tests pass `*.parquet` with a
    dir of split files to force genuine multi-batch runs."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def run_novelty_probe(
    doc_stream: DataFrame,
    index: DataFrame,
    sink,
) -> None:
    """Run the AvailableNow probe: for every micro-batch of documents,
    compute verdicts against `index` and hand the batch's verdict FRAME to
    `sink(batch_verdicts_df, batch_id)`. The index must already be
    materialized (checkpointed/persisted) — otherwise every micro-batch
    would rebuild it, the exact per-iteration re-read the component loop
    also guards against."""

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(probe_band_index(batch_df, index), batch_id)

    q = (
        doc_stream.writeStream.foreachBatch(_probe)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_novelty_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registry form: stream the delta slice of `documents` (the
    doc_id % DELTA_MOD == DELTA_MOD-1 "new crawl" docs) through the
    micro-batch probe against the static corpus index; verdicts are
    identical to the batch `minhash_delta_probe` — same columns, same
    values, same DuckDB oracle."""
    import atexit
    import shutil
    import tempfile

    index = corpus_band_index(spark, sf_dir).localCheckpoint(eager=True)
    stream = stream_documents(spark, sf_dir).where(_is_delta())
    # Verdicts append to a scratch parquet dir inside each micro-batch —
    # executor-side writes, nothing funnels through the driver (r4 verdict
    # task 3 removed the collect() this adapter used to do). At 100 TB this
    # IS the production sink shape: append to the verdict table, then read
    # it back for downstream admission joins. The scratch dir must outlive
    # this call (the returned DataFrame reads it lazily), so cleanup is
    # process-exit scoped — repeated sweeps in one process don't pile up
    # dirs past the process lifetime.
    out_dir = tempfile.mkdtemp(prefix="novelty_verdicts_")
    atexit.register(shutil.rmtree, out_dir, ignore_errors=True)

    def _sink(verdicts: DataFrame, batch_id: int) -> None:
        verdicts.write.mode("append").parquet(out_dir)

    run_novelty_probe(stream, index, _sink)
    out = spark.read.schema(VERDICT_SCHEMA).parquet(out_dir)
    return out.select(
        "doc_id",
        "n_corpus_matches",
        "first_match_doc",
        F.col("is_novel").cast("int").alias("is_novel"),
    ).orderBy("doc_id")


QUERIES = {
    "streaming_novelty_probe": streaming_novelty_probe,
}


def _oracles():
    from ..operators.dedup import _sql_delta_probe

    return {"streaming_novelty_probe": _sql_delta_probe()}


ORACLES = _oracles()
