"""Degenerate-corpus differential sweep: every documents-only oracle pair
must agree on pathological input the curated sf data never exercises —
empty docs, whitespace-only, 1–2-token docs (the Spark `sequence(1, 0)`
descending trap), unicode, exact duplicates straddling the corpus/delta
split, degenerate repetition. This is the cross-engine twin of the
hypothesis property tests: the sf sweeps prove parity on healthy data,
this proves nobody crashes or diverges on the tail a real crawl contains.

Scoped exclusions, each deliberate:
  * media_* / phash family — the oracle shingles CHARACTERS while the
    decoder shingles UTF-8 BYTES; parity is ASCII-scoped by design
    (documented at operators/multimodal.py, PHASH comment) and this corpus
    is deliberately non-ASCII.
  * streaming_* / stateful_* — the file-stream source globs the flat
    `documents.parquet` file layout the driver writes; this corpus uses a
    Spark directory layout (their batch twins DO run here).
"""

from __future__ import annotations

import re

import pytest

OTHER_TABLES = re.compile(
    r"\b(region|nation|customer|supplier|part|orders|lineitem|events|embeddings)\b"
)
EXCLUDE = re.compile(r"^(media_|streaming_|stateful_)")

DOCS = [
    (0, ""),  # empty
    (1, "   "),  # whitespace-only
    (2, "hello"),  # 1 token (no bigrams, no shingles)
    (3, "hello world"),  # 2 tokens (no 3-shingles)
    (4, "the quick brown fox jumps over the lazy dog again and again"),
    (5, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 4
    (6, "uni code éé 中文 tokens mixed with ascii stuff here ok"),  # non-ASCII
    (7, "a a a a a a a a a a a a a a a a"),  # degenerate repetition
    (8, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"),
    (9, "the quick brown fox jumps over the lazy dog again and again"),  # delta dup
    (10, "short"),
    (11, "x y"),
    (12, "mixed CASE Tokens MIXED case tokens"),
    (13, "tab\tseparated and  double  spaced tokens"),
    (14, "unique delta doc with plenty of fresh tokens to maybe admit here fine"),
]
LANGS = ["en", "en", "en", "en", "en", "en", "fr", "en", "en", "en", "de", "de", "en", "en", "en"]


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("degen"))
    rows = [
        (i, t, LANGS[i], f"s{i % 5}", len(t)) for i, t in DOCS
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    return d


def test_documents_only_registry_differential_on_degenerate_corpus(spark, degen_dir):
    import duckdb

    import __spark_entry__ as em
    from data_pipeline_for_autonomous_vehicles_spark.caching import (
        release_plan_caches,
    )
    from tools.check_oracle import _duckdb_typed_rows, _norm_rows

    qs, oracles = em.queries(), em.oracle_sql()
    targets = sorted(
        name
        for name, sql in oracles.items()
        if not OTHER_TABLES.search(sql) and not EXCLUDE.match(name)
    )
    assert len(targets) > 80, targets  # the documents family is large

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{degen_dir}/documents.parquet/*.parquet'"
    )
    problems = []
    for name in targets:
        try:
            sdf = qs[name](spark, degen_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            release_plan_caches()
            spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001 — collecting a report
            problems.append(f"{name}: spark error: {str(e).splitlines()[0][:160]}")
            continue
        try:
            dcols, drows, _dec = _duckdb_typed_rows(con, oracles[name])
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: duckdb error: {str(e).splitlines()[0][:160]}")
            continue
        if len(srows) != len(drows) or sorted(scols) != sorted(dcols):
            problems.append(
                f"{name}: shape spark={len(srows)}x{sorted(scols)} "
                f"duckdb={len(drows)}x{sorted(dcols)}"
            )
        elif _norm_rows(scols, srows) != _norm_rows(dcols, drows):
            problems.append(f"{name}: typed values differ")
    assert not problems, "\n".join(problems)
