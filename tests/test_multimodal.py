"""Multimodal near-dup + BPE induction twins: brute-force / literal-Python
reference implementations checked against the distributed operators."""

from __future__ import annotations

from collections import Counter

from data_pipeline_for_autonomous_vehicles_spark.catalog import load_table
from data_pipeline_for_autonomous_vehicles_spark.operators import multimodal, text


def _ph(payload: bytes) -> int:
    """Literal re-statement of the stub perceptual hash."""
    counts = [0] * multimodal.PHASH_BITS
    for i in range(len(payload) - 3):
        w = (
            (payload[i] << 24)
            | (payload[i + 1] << 16)
            | (payload[i + 2] << 8)
            | payload[i + 3]
        )
        counts[((w * multimodal._PHASH_KNUTH) % 4294967296) >> 27] += 1
    v = 0
    for j in range(multimodal.PHASH_BITS):
        if counts[j] > counts[(j + 1) % multimodal.PHASH_BITS]:
            v |= 1 << j
    return v


def test_media_near_dups_matches_bruteforce(spark, sf_dir):
    """Banded-LSH pair set == all-pairs Hamming scan over driver-computed
    fingerprints (recall is exact for Hamming ≤ PHASH_HAMMING_MAX by the
    pigeonhole band argument; precision is exact by the verify step)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    fp = {}
    for r in docs:
        mt = ("image/png", "audio/wav", "video/mp4")[r["doc_id"] % 3]
        fp[r["doc_id"]] = (mt, _ph(r["text"].encode("utf-8")))
    ids = sorted(fp)
    expect = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if fp[a][0] != fp[b][0]:
                continue
            h = bin(fp[a][1] ^ fp[b][1]).count("1")
            if h <= multimodal.PHASH_HAMMING_MAX:
                expect.add((fp[a][0], a, b, h))
    got = {
        (r["media_type"], r["media_a"], r["media_b"], r["hamming"])
        for r in multimodal.media_near_dups(spark, sf_dir).collect()
    }
    # LSH may only lose pairs to the MAX_BUCKET cap; on this data no
    # bucket overflows, so the sets must be identical.
    assert got == expect
    assert got  # the gate actually finds near-dups on the driver data


def test_media_phash_empty_and_short_payloads(spark):
    """Payloads shorter than one 4-byte shingle hash to 0 (no bits set)."""
    df = spark.createDataFrame(
        [(1, bytearray(b""), "image/png"), (2, bytearray(b"abc"), "image/png")],
        "media_id long, payload binary, media_type string",
    )
    out = {r["media_id"]: r["phash"] for r in multimodal.media_phash(df).collect()}
    assert out == {1: 0, 2: 0}


def _bpe_reference(docs: list[str], rounds: int) -> list[tuple[int, str, str, int]]:
    """Literal BPE trainer (Sennrich 2016): word-frequency table, K rounds
    of count-best-merge with leftmost-greedy application."""
    vocab = Counter()
    for t in docs:
        for w in t.strip().lower().split():
            if w:
                vocab[w] += 1
    reps = {w: list(w) for w in vocab}
    out = []
    for r in range(1, rounds + 1):
        pairs = Counter()
        for w, syms in reps.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((r, a, b, n))
        for w, syms in reps.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            reps[w] = merged
    return out


def test_bpe_merge_rounds_matches_reference(spark, sf_dir):
    docs = [r["text"] for r in load_table(spark, sf_dir, "documents").select("text").collect()]
    expect = _bpe_reference(docs, text.BPE_INDUCT_ROUNDS)
    got = [
        (r["round"], r["left_sym"], r["right_sym"], r["n"])
        for r in text.bpe_merge_rounds(spark, sf_dir).collect()
    ]
    assert got == expect
    # merge table invariant: the merged token is the concatenation and the
    # first round agrees with the single-round candidate statistic
    first = text.bpe_merge_candidates(spark, sf_dir).collect()[0]
    assert expect[0][1] + expect[0][2] == first["pair"]
    assert expect[0][3] == first["n"]


def test_bpe_compression_matches_reference(spark, sf_dir):
    """Per-language compression under the induced vocab equals a literal
    re-application of the reference trainer's final merge state."""
    rows = load_table(spark, sf_dir, "documents").select("lang", "text").collect()
    vocab = Counter()
    for r in rows:
        for w in r["text"].strip().lower().split():
            if w:
                vocab[w] += 1
    reps = {w: list(w) for w in vocab}
    for _ in range(text.BPE_INDUCT_ROUNDS):
        pairs = Counter()
        for w, syms in reps.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        if not pairs:
            break
        (a, b), _n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in reps.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            reps[w] = merged
    expect = {}
    for r in rows:
        lang = r["lang"]
        for w in r["text"].strip().lower().split():
            if not w:
                continue
            n_words, n_chars, n_syms = expect.get(lang, (0, 0, 0))
            expect[lang] = (n_words + 1, n_chars + len(w), n_syms + len(reps[w]))
    got = {
        r["lang"]: (r["n_words"], r["n_chars"], r["n_symbols"])
        for r in text.bpe_compression_by_lang(spark, sf_dir).collect()
    }
    assert got == expect
    # the merges must actually compress: fewer symbols than characters
    assert all(g[2] < g[1] for g in got.values())


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    return d


def _duck_docs(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    return con


def test_bpe_dry_round_keeps_vocab(spark, tmp_path):
    """Round-5 ADVICE: a round whose pair table is empty (all words fully
    merged / single-char) must keep the prior vocab — like the reference
    trainer's break — not crossJoin it away to nothing. The corpus dries
    after ONE merge ('aa' -> 1 symbol), well before BPE_INDUCT_ROUNDS."""
    d = _write_docs(
        spark,
        tmp_path,
        [(0, "aa aa b c", "en", "s", 9), (1, "aa d e", "en", "s", 6)],
    )
    merges = text.bpe_merge_rounds(spark, d).collect()
    assert [(r["round"], r["merged"], r["n"]) for r in merges] == [(1, "aa", 3)]
    comp = {r["lang"]: r for r in text.bpe_compression_by_lang(spark, d).collect()}
    # vocab survived the dry rounds: 7 words, 'aa' x3 is 1 symbol each
    assert comp["en"]["n_words"] == 7
    assert comp["en"]["n_chars"] == 10
    assert comp["en"]["n_symbols"] == 7
    # the oracle CTE chain (LEFT JOIN fallback) agrees on the same data
    con = _duck_docs(d)
    assert con.execute(text._sql_bpe_merge_rounds()).fetchall() == [
        (1, "a", "a", "aa", 3)
    ]
    got = con.execute(text._sql_bpe_compression()).fetchall()
    assert [(r[0], r[1], r[2], r[3]) for r in got] == [("en", 7, 10, 7)]


def test_bpe_dry_from_round_one(spark, tmp_path):
    """All single-char words: zero merges, and compression reduces to the
    identity tokenization (one symbol per char) instead of zero rows."""
    d = _write_docs(spark, tmp_path, [(0, "a b c a", "en", "s", 7)])
    assert text.bpe_merge_rounds(spark, d).collect() == []
    comp = text.bpe_compression_by_lang(spark, d).collect()
    assert [(r["lang"], r["n_words"], r["n_chars"], r["n_symbols"]) for r in comp] == [
        ("en", 4, 4, 4)
    ]
    con = _duck_docs(d)
    assert con.execute(text._sql_bpe_merge_rounds()).fetchall() == []
    got = con.execute(text._sql_bpe_compression()).fetchall()
    assert [(r[0], r[1], r[2], r[3]) for r in got] == [("en", 4, 4, 4)]


def test_media_text_pair_dedup_matches_bruteforce(spark, sf_dir):
    """Pair-level dedup ≡ a literal Python union-find over the same edge
    lists: component labels per modality, pair-group sizes, and canonical
    election (max quality, min doc_id tiebreak)."""
    from data_pipeline_for_autonomous_vehicles_spark.operators import multimodal
    from data_pipeline_for_autonomous_vehicles_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from data_pipeline_for_autonomous_vehicles_spark.operators.text import quality_scores

    docs = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]

    def components(edges: list[tuple[int, int]]) -> dict[int, int]:
        parent = {d: d for d in docs}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {d: find(d) for d in docs}

    img_edges = [
        (r["media_a"], r["media_b"])
        for r in multimodal.media_near_dups(spark, sf_dir).collect()
    ]
    txt_edges = [
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(spark, sf_dir).collect()
    ]
    img, txt = components(img_edges), components(txt_edges)
    quality = {
        r["doc_id"]: r["quality_score"] for r in quality_scores(spark, sf_dir).collect()
    }
    groups: dict[tuple[int, int], list[int]] = {}
    for d in docs:
        groups.setdefault((img[d], txt[d]), []).append(d)
    expect = {}
    for key, members in groups.items():
        keeper = max(members, key=lambda d: (quality[d], -d))
        for d in members:
            expect[d] = (key[0], key[1], len(members), int(d == keeper))

    got = {
        r["doc_id"]: (r["img_group"], r["txt_group"], r["pair_size"], r["is_canonical"])
        for r in multimodal.media_text_pair_dedup(spark, sf_dir).collect()
    }
    assert got == expect
    # the pair grain is non-trivial on driver data: at least one image
    # component spans >1 caption component or vice versa
    savings = multimodal.media_text_pair_savings(spark, sf_dir).collect()[0]
    assert savings["n_pairs"] == len(docs)
    assert savings["n_pair_groups"] >= max(
        savings["n_image_groups"], savings["n_caption_groups"]
    )
    assert savings["removed_pair_level"] <= min(
        savings["removed_image_only"], savings["removed_caption_only"]
    )
    assert savings["removed_pair_level"] == len(docs) - len(groups)
