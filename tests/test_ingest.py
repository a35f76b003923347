"""Incremental ingest admission: gates fire, append ≡ rebuild, balance sheet.

The central claim (module docstring of `operators/ingest.py`) is one-sided
equivalence: every doc the incremental gates ADMIT gets a manifest row
byte-identical to the full-rebuild `curated_shard_manifest` row — pinned
here on the driver data (both scales' natural verdict mix) and on a
constructed corpus where every one of the five gates demonstrably fires.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row

from data_pipeline_for_autonomous_vehicles_spark.operators.ingest import (
    _GATES,
    incremental_admission_manifest,
    incremental_shard_update,
)


def _clf_weight(t: str) -> int:
    """Pure-python twin of the hashed-classifier token weight (text.py)."""
    b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 4096
    return (b * 2654435761 + 40503) % 1001 - 500


def _gate_corpus(spark, tmp_path) -> str:
    """A corpus where each admission gate fires on exactly one delta doc
    (delta = doc_id % 5 == 4): 4 admitted, 9 boilerplate, 14 fluency,
    19 classifier, 24 quality, 29 novelty-vs-corpus, 34+39 in-batch twins.
    Token pools are weight-sign-selected so the classifier gate is the
    only negative-margin doc."""
    pos = [t for t in (f"tokpos{i}xxxxxxxxxxxx" for i in range(2000)) if _clf_weight(t) > 0]
    neg = [t for t in (f"tokneg{i}xxxxxxxxxxxx" for i in range(2000)) if _clf_weight(t) < 0]
    X = [f"boilx{i}xxxxxxxx" for i in range(8)]
    Y = [f"boily{i}xxxxxxxx" for i in range(8)]
    docs, k = [], 0

    def add(i, toks):
        t = " ".join(toks)
        docs.append(Row(doc_id=i, text=t, lang="en", source="s0", n_chars=len(t)))

    for i in (0, 1, 2):  # three hosts make segment X known boilerplate
        add(i, X + pos[k : k + 24]); k += 24
    for i in (5, 6, 7):  # three hosts for segment Y
        add(i, Y + pos[k : k + 24]); k += 24
    twin = pos[k : k + 20]; k += 20
    add(10, twin)  # novelty target
    for i in (11, 12, 15, 16, 17, 20):  # plain corpus filler
        add(i, pos[k : k + 20]); k += 20
    # delta docs:
    add(4, ["the", "and", "of"] + [pos[k], pos[k + 1]] * 6 + pos[k + 2 : k + 7]); k += 7
    add(9, X + Y + pos[k : k + 8]); k += 8  # 16/24 tokens boilerplate >= 1/2
    add(14, pos[k : k + 25]); k += 25  # all-unique bigrams: mean count 1 < floor
    add(19, neg[:30])  # negative classifier margin, quality-passing
    add(24, ["zz"] * 50)  # degenerate ttr + short: quality < cutoff
    add(29, twin)  # exact copy of corpus doc 10
    pair = pos[k : k + 20]; k += 20
    add(34, pair)  # in-batch twins: BOTH must be rejected
    add(39, pair)
    d = str(tmp_path / "gates")
    spark.createDataFrame(docs).coalesce(1).write.parquet(d + "/documents.parquet")
    return d


EXPECTED_GATE_VERDICTS = {
    4: "admitted",
    9: "rejected_boilerplate",
    14: "rejected_fluency",
    19: "rejected_classifier",
    24: "rejected_quality",
    29: "rejected_novelty",
    34: "rejected_novelty",
    39: "rejected_novelty",
}


def test_every_gate_fires_on_constructed_corpus(spark, tmp_path):
    d = _gate_corpus(spark, tmp_path)
    rows = {r["doc_id"]: r for r in incremental_admission_manifest(spark, d).collect()}
    assert {i: r["verdict"] for i, r in rows.items()} == EXPECTED_GATE_VERDICTS
    # rejected docs carry zeroed payload (audit-trail rows, nothing to append)
    for i, r in rows.items():
        if r["verdict"] != "admitted":
            assert (r["n_tokens"], r["n_bytes"], r["kept_text"]) == (0, 0, "")
    # the admitted doc keeps its full normalized text (nothing span-cut here)
    adm = rows[4]
    assert adm["n_tokens"] == 20 and adm["kept_text"].startswith("the and of")
    assert adm["n_bytes"] == len(adm["kept_text"])


def _assert_admitted_equals_rebuild(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators.corpus import (
        curated_shard_manifest,
    )

    man = incremental_admission_manifest(spark, sf_dir).collect()
    admitted = [r for r in man if r["verdict"] == "admitted"]
    rebuild = {r["doc_id"]: r for r in curated_shard_manifest(spark, sf_dir).collect()}
    assert admitted, "no admitted docs — the equivalence claim is vacuous"
    for r in admitted:
        f = rebuild.get(r["doc_id"])
        assert f is not None, f"admitted doc {r['doc_id']} not kept by rebuild"
        assert (r["shard"], r["n_tokens"], r["n_bytes"], r["kept_text"]) == (
            f["shard"], f["n_tokens"], f["n_bytes"], f["kept_text"],
        )
    return man


def test_append_equals_rebuild_on_driver_data(spark, sf_dir):
    """On sf0.001 the natural verdict mix includes admissions plus novelty
    and quality rejections; every admitted row must match the full-rebuild
    manifest byte-for-byte (shard, counts, span-cut text)."""
    man = _assert_admitted_equals_rebuild(spark, sf_dir)
    verdicts = {r["verdict"] for r in man}
    assert {"admitted", "rejected_novelty", "rejected_quality"} <= verdicts


def test_append_equals_rebuild_on_constructed_corpus(spark, tmp_path):
    d = _gate_corpus(spark, tmp_path)
    _assert_admitted_equals_rebuild(spark, d)


def test_shard_compaction_heals_append_files_preserving_rows(spark, sf_dir):
    """The append batch degrades the shard layout to 2 files (base + append)
    on every shard that received admissions; `compact_partitions` wired to
    the shard layout bin-packs them back to one file per shard while every
    manifest row survives byte-identical."""
    from data_pipeline_for_autonomous_vehicles_spark.maintenance import (
        compact_partitions,
        list_partitions,
    )
    from data_pipeline_for_autonomous_vehicles_spark.operators.ingest import (
        _shard_layout_dir,
        shard_file_audit,
    )

    audit = {r["shard"]: r for r in shard_file_audit(spark, sf_dir).collect()}
    path = _shard_layout_dir(sf_dir)
    assert any(r["n_files"] == 2 for r in audit.values())
    assert any(r["n_small_files"] >= 1 for r in audit.values())
    # the audit's file counts are the real directory listing's
    stats = list_partitions(spark, path, partition_col="shard")
    assert {int(k): v["files"] for k, v in stats.items()} == {
        s: r["n_files"] for s, r in audit.items()
    }
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    files_before = sum(v["files"] for v in stats.values())

    plan = compact_partitions(
        spark, path, target_file_bytes=1 << 30,
        sort_cols=("doc_id",), partition_col="shard",
    )
    assert plan, "no shard was rewritten although multi-file shards exist"
    after_stats = list_partitions(spark, path, partition_col="shard")
    assert all(v["files"] == 1 for v in after_stats.values())
    assert sum(v["files"] for v in after_stats.values()) < files_before
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before


def test_pipeline_run_report_matches_direct_aggregation(spark, sf_dir):
    """The observed-write metrics equal a direct aggregation of the manifest
    — the write path drops or duplicates nothing."""
    from data_pipeline_for_autonomous_vehicles_spark.operators.corpus import (
        curated_shard_manifest,
    )
    from data_pipeline_for_autonomous_vehicles_spark.operators.ingest import (
        pipeline_run_report,
    )

    rep = pipeline_run_report(spark, sf_dir).collect()[0]
    man = curated_shard_manifest(spark, sf_dir).collect()
    assert rep["n_docs"] == len(man)
    assert rep["n_tokens"] == sum(r["n_tokens"] for r in man)
    assert rep["n_bytes"] == sum(r["n_bytes"] for r in man)
    assert rep["n_empty_docs"] == sum(1 for r in man if r["kept_text"] == "")


def test_shard_update_accounting(spark, sf_dir):
    """The rollup row balances: every count column totals the shard rows,
    verdicts partition the batch, and the share columns are exact."""
    rows = incremental_shard_update(spark, sf_dir).collect()
    total = next(r for r in rows if r["shard"] == -1)
    shards = [r for r in rows if r["shard"] != -1]
    counts = ["n_delta_docs", "n_admitted", "n_tokens_appended", "n_bytes_appended"] + [
        f"n_rej_{k}" for k in _GATES
    ]
    for c in counts:
        assert total[c] == sum(r[c] for r in shards), c
    for r in rows:
        assert r["n_admitted"] + sum(r[f"n_rej_{k}"] for k in _GATES) == r["n_delta_docs"]
    # shares: per-shard token share of the append, NULL on the rollup row
    assert total["append_tok_share"] is None and total["share_dev"] is None
    tot_tok = total["n_tokens_appended"]
    assert tot_tok > 0
    assert abs(sum(r["append_tok_share"] for r in shards) - 1.0) < 1e-4
    for r in shards:
        assert r["append_tok_share"] == pytest.approx(
            r["n_tokens_appended"] / tot_tok, abs=1e-6
        )
        assert r["share_dev"] == pytest.approx(
            r["n_tokens_appended"] / tot_tok - 1.0 / 16, abs=1e-6
        )
