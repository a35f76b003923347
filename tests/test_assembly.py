"""Training-run assembly operators — brute-force Python twins on driver data
plus invariants tying them to their sibling operators."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

from data_pipeline_for_autonomous_vehicles_spark.operators.assembly import (
    CONTEXT_LENS,
    PHASE_EDGES,
    context_truncation_report,
    curriculum_phases,
    packing_strategy_compare,
    shard_interleaving_audit,
)
from data_pipeline_for_autonomous_vehicles_spark.operators.text import (
    N_SHARDS,
    PACK_BUDGET_CHARS,
    quality_scores,
)


def _docs(sf_dir):
    con = duckdb.connect()
    return con.sql(
        f"SELECT doc_id, text, lang, source, n_chars "
        f"FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def _ntok(text: str) -> int:
    t = text.strip().lower()
    return 0 if t == "" else len(t.split())


def _r(x: float, scale: int) -> float:
    import math

    m = float(10**scale)
    return math.floor(x * m + 0.5) / m


def test_context_truncation_matches_bruteforce(spark, sf_dir):
    rows = _docs(sf_dir)
    exp = {}
    per_src = defaultdict(list)
    for _, text, _, source, _ in rows:
        per_src[source].append(_ntok(text))
    for source, toks in per_src.items():
        total = sum(toks)
        for ln in CONTEXT_LENS:
            kept = sum(min(t, ln) for t in toks)
            exp[(ln, source)] = (
                len(toks),
                sum(1 for t in toks if t > ln),
                kept,
                total - kept,
                _r((total - kept) / total, 6) if total else None,
            )
    got = context_truncation_report(spark, sf_dir).collect()
    assert len(got) == len(exp)
    for r in got:
        e = exp[(r.context_len, r.source)]
        assert (r.n_docs, r.n_truncated, r.tokens_kept, r.tokens_lost) == e[:4]
        assert r.loss_pct == e[4]


def test_packing_strategy_compare_matches_bruteforce(spark, sf_dir):
    rows = _docs(sf_dir)
    by_lang = defaultdict(list)
    for doc_id, _, lang, _, n_chars in rows:
        by_lang[lang].append((doc_id, n_chars))

    def pack(docs_sorted):
        bins = defaultdict(int)
        cum = 0
        for _, n_chars in docs_sorted:
            bins[cum // PACK_BUDGET_CHARS] += n_chars
            cum += n_chars
        sizes = list(bins.values())
        return (
            len(sizes),
            sum(sizes),
            sum(max(s - PACK_BUDGET_CHARS, 0) for s in sizes),
            _r(sum(sizes) / (len(sizes) * PACK_BUDGET_CHARS), 4),
        )

    exp = {}
    for lang, docs in by_lang.items():
        exp[("doc_order", lang)] = pack(sorted(docs))
        exp[("length_sorted", lang)] = pack(
            sorted(docs, key=lambda d: (-d[1], d[0]))
        )
    got = packing_strategy_compare(spark, sf_dir).collect()
    assert len(got) == len(exp)
    for r in got:
        assert (r.n_bins, r.total_chars, r.overflow_chars, r.mean_fill) == exp[
            (r.strategy, r.lang)
        ]
    # the length-sorted arm must repack the SAME corpus (identical mass)
    mass = defaultdict(set)
    for r in got:
        mass[r.lang].add(r.total_chars)
    assert all(len(v) == 1 for v in mass.values())


def test_shard_interleaving_matches_bruteforce(spark, sf_dir):
    rows = _docs(sf_dir)
    shards = defaultdict(list)
    for doc_id, _, _, source, _ in rows:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        shards[h % N_SHARDS].append((h, doc_id, source))
    exp = {}
    for shard, docs in shards.items():
        docs.sort()
        run_lens, prev = [], None
        for _, _, source in docs:
            if source != prev:
                run_lens.append(1)
                prev = source
            else:
                run_lens[-1] += 1
        exp[shard] = (
            len(docs),
            len({s for _, _, s in docs}),
            len(run_lens),
            max(run_lens),
            _r(len(run_lens) / len(docs), 4),
        )
    got = shard_interleaving_audit(spark, sf_dir).collect()
    assert len(got) == len(exp)
    for r in got:
        assert (
            r.n_docs,
            r.n_sources,
            r.n_runs,
            r.max_run_len,
            r.interleave_ratio,
        ) == exp[r.shard]


def test_curriculum_phases_partition_corpus_and_match_quality(spark, sf_dir):
    got = {r.phase: r for r in curriculum_phases(spark, sf_dir).collect()}
    q = quality_scores(spark, sf_dir).collect()
    # brute-force the banding from the already-tested quality scores
    exp_counts = defaultdict(int)
    for r in q:
        s = r.quality_score
        if s >= PHASE_EDGES[0]:
            exp_counts[1] += 1
        elif s >= PHASE_EDGES[1]:
            exp_counts[2] += 1
        elif s >= PHASE_EDGES[2]:
            exp_counts[3] += 1
        else:
            exp_counts[4] += 1
    assert {p: r.n_docs for p, r in got.items()} == dict(exp_counts)
    # every phase populated on driver data, shares partition the corpus
    assert set(got) == {1, 2, 3, 4}
    assert sum(r.n_docs for r in got.values()) == len(q)
    assert abs(sum(r.doc_share for r in got.values()) - 1.0) < 1e-4
    assert abs(sum(r.token_share for r in got.values()) - 1.0) < 1e-4
    # phase means are ordered cleanest-first and sit inside their bands
    means = [got[p].mean_quality for p in (1, 2, 3, 4)]
    assert means == sorted(means, reverse=True)
    assert means[0] >= PHASE_EDGES[0]
    assert PHASE_EDGES[1] <= means[1] < PHASE_EDGES[0]
    assert PHASE_EDGES[2] <= means[2] < PHASE_EDGES[1]
    assert means[3] < PHASE_EDGES[2]


def test_curriculum_read_order_matches_recomposition(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators.assembly import (
        curriculum_read_order,
    )

    # recompose from the already-tested quality banding + the md5 shard hash
    phase_of = {}
    for r in quality_scores(spark, sf_dir).collect():
        s = r.quality_score
        phase_of[r.doc_id] = (
            1 if s >= PHASE_EDGES[0] else 2 if s >= PHASE_EDGES[1] else
            3 if s >= PHASE_EDGES[2] else 4
        )
    shards = defaultdict(list)
    for doc_id, phase in phase_of.items():
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        shards[h % N_SHARDS].append((phase, h, doc_id))
    exp = {}
    for shard, docs in shards.items():
        for pos, (phase, _, doc_id) in enumerate(sorted(docs), start=1):
            exp[doc_id] = (shard, phase, pos)
    got = curriculum_read_order(spark, sf_dir).collect()
    assert len(got) == len(exp)
    for r in got:
        assert (r.shard, r.phase, r.read_pos) == exp[r.doc_id]
    # read_pos is a permutation of 1..n within every shard
    per_shard = defaultdict(list)
    for r in got:
        per_shard[r.shard].append(r.read_pos)
    for shard, poss in per_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_vocab_coverage_curve_matches_bruteforce(spark, sf_dir):
    from collections import Counter

    from data_pipeline_for_autonomous_vehicles_spark.operators.text import (
        VOCAB_GRID,
        vocab_coverage_curve,
    )

    freqs = Counter()
    for _, text, _, _, _ in _docs(sf_dir):
        t = text.strip().lower()
        if t:
            freqs.update(t.split())
    ordered = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freqs.values())
    got = {r.vocab_budget: r for r in vocab_coverage_curve(spark, sf_dir).collect()}
    assert set(got) == set(VOCAB_GRID)
    for g in VOCAB_GRID:
        head = ordered[:g]
        mass = sum(n for _, n in head)
        r = got[g]
        assert (r.tokens_covered, r.mass_covered, r.total_token_mass) == (
            len(head),
            mass,
            total,
        )
        assert r.vocab_size == len(ordered)
        assert r.coverage_pct == _r(mass / total, 6)
    # the curve is monotone and saturates once the budget exceeds the vocab
    masses = [got[g].mass_covered for g in VOCAB_GRID]
    assert masses == sorted(masses)
    if max(VOCAB_GRID) >= len(ordered):
        top = got[max(VOCAB_GRID)]
        assert top.coverage_pct == 1.0
        assert top.tokens_covered == len(ordered)


def test_vocab_coverage_curve_empty_corpus_matches_oracle(spark, tmp_path):
    """All-blank corpus: BOTH engines must emit 0 rows (the Spark global
    aggregate would otherwise manufacture an all-NULL grid the oracle's
    GROUP BY never produces)."""
    from pyspark.sql import Row

    from data_pipeline_for_autonomous_vehicles_spark.operators.text import (
        _sql_vocab_coverage,
        vocab_coverage_curve,
    )

    d = str(tmp_path / "empty")
    spark.createDataFrame(
        [Row(doc_id=0, text="   ", lang="en", source="s", n_chars=3)]
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    assert vocab_coverage_curve(spark, d).collect() == []
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    assert len(con.sql(_sql_vocab_coverage()).fetchall()) == 0


def test_packed_sequences_manifest_matches_bruteforce_and_rollup(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators.text import (
        packed_sequences_manifest,
        token_budget_bins,
    )

    rows = _docs(sf_dir)
    by_lang = defaultdict(list)
    for doc_id, _, lang, _, n_chars in rows:
        by_lang[lang].append((doc_id, n_chars))
    exp = {}
    for lang, docs in by_lang.items():
        cum = 0
        for doc_id, n_chars in sorted(docs):
            exp[doc_id] = (
                lang,
                cum // PACK_BUDGET_CHARS,
                cum - (cum // PACK_BUDGET_CHARS) * PACK_BUDGET_CHARS,
                n_chars,
            )
            cum += n_chars
    got = packed_sequences_manifest(spark, sf_dir).collect()
    assert len(got) == len(exp)
    for r in got:
        assert (r.lang, r.bin_id, r.offset_chars, r.n_chars) == exp[r.doc_id]
    # the manifest must aggregate to EXACTLY the token_budget_bins rollup
    rollup = {
        (r.lang, r.bin_id): (r.n_docs, r.bin_chars)
        for r in token_budget_bins(spark, sf_dir).collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for r in got:
        cell = agg[(r.lang, r.bin_id)]
        cell[0] += 1
        cell[1] += r.n_chars
    assert {k: tuple(v) for k, v in agg.items()} == rollup


def test_split_leakage_compare_bruteforce_and_zero_by_construction(spark, sf_dir):
    from data_pipeline_for_autonomous_vehicles_spark.operators.dedup import (
        TRAIN_PCT,
        minhash_lsh_pairs,
        near_dup_clusters,
        split_leakage_compare,
    )

    got = {r.policy: r for r in split_leakage_compare(spark, sf_dir).collect()}
    pairs = [
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(spark, sf_dir).collect()
    ]
    reps = {
        r.doc_id
        for r in near_dup_clusters(spark, sf_dir).collect()
        if r.doc_id == r.cluster_id
    }

    def split(doc_id):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        return "train" if h % 100 < TRAIN_PCT else "holdout"

    cross_all = sum(1 for a, b in pairs if split(a) != split(b))
    live_rep = sum(1 for a, b in pairs if a in reps and b in reps)
    naive = got["naive_hash"]
    assert (naive.n_pairs, naive.n_pairs_live, naive.n_cross_split) == (
        len(pairs),
        len(pairs),
        cross_all,
    )
    if pairs:
        assert naive.leaked_pct == _r(cross_all / len(pairs), 6)
        # driver data has near-dup pairs, so the naive policy MUST leak
        assert naive.n_cross_split > 0
    rep = got["cluster_representative"]
    # one representative per cluster -> no pair can keep both endpoints
    assert live_rep == 0
    assert (rep.n_pairs_live, rep.n_cross_split, rep.leaked_pct) == (0, 0, None)
