"""Property-based tests (hypothesis): the engine-wide invariants.

1. exact_sum is partition-count invariant — the property that makes every
   oracle-checked aggregate safe on any cluster size (SCALE.md §5).
2. asof_join equals the per-row brute-force definition on arbitrary data.

Examples are capped small: each case runs a real Spark job.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_pipeline_for_autonomous_vehicles_spark.functions.scalars import exact_sum
from data_pipeline_for_autonomous_vehicles_spark.operators.asof import asof_join

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

cents = st.integers(min_value=-10_000_00, max_value=10_000_00).map(lambda c: c / 100.0)


@settings(**_SETTINGS)
@given(
    vals=st.lists(cents, min_size=1, max_size=50),
    parts=st.integers(min_value=1, max_value=7),
)
def test_exact_sum_partition_invariant(spark, vals, parts):
    df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(parts)
    got = df.agg(exact_sum("v", 2).alias("s")).collect()[0]["s"]
    expected = sum(round(v * 100) for v in vals) / 100.0
    assert got == expected  # bit-exact, not approx


@settings(**_SETTINGS)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 3600)), min_size=1, max_size=20
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 3600), cents),
        min_size=0,
        max_size=20,
    ),
)
def test_asof_join_matches_bruteforce(spark, left, right):
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (k, base + dt.timedelta(seconds=s), 1_000_000 + i)
        for i, (k, s) in enumerate(left)
    ]
    rrows = [
        (k, base + dt.timedelta(seconds=s), 2_000_000 + i, v)
        for i, (k, s, v) in enumerate(right)
    ]
    ldf = spark.createDataFrame(lrows, "k int, t timestamp, tie_id long")
    rdf = spark.createDataFrame(
        rrows or [(None, None, None, None)], "k int, t timestamp, tie_id long, v double"
    ).filter(F.col("tie_id").isNotNull())
    out = asof_join(
        ldf, rdf, on="k", left_time="t", right_time="t", value_cols=["v"], tie="tie_id"
    )
    got = {r["tie_id"]: r["asof_v"] for r in out.collect()}

    expected = {}
    for lk, lt, lid in lrows:
        best = None  # latest (t, tie) <= (lt, ... left after right at ties)
        for rk, rt, rid, rv in rrows:
            if rk == lk and rt <= lt:
                if best is None or (rt, rid) > (best[0], best[1]):
                    best = (rt, rid, rv)
        expected[lid] = best[2] if best else None
    assert got == expected


@settings(**_SETTINGS)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=60),
    parts=st.integers(min_value=1, max_value=9),
)
def test_tie_aware_running_matches_global_window(spark, vals, parts):
    """The two-pass `_tie_aware_running` (windows.py — the scale-safe
    replacement for global rank windows) must reproduce Spark's own
    rank()/dense_rank() for ANY tie distribution and ANY range-partition
    count. The value domain [0, 5] forces heavy ties; a global window is a
    fine oracle at 60 rows."""
    from pyspark.sql import Window

    from data_pipeline_for_autonomous_vehicles_spark.operators.windows import (
        _tie_aware_running,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    dist = df.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    got = {
        r["v"]: (r["rows_before"] + 1, r["keys_before"] + 1)
        for r in _tie_aware_running(
            dist, [], "v", ascending=True, n_parts=parts
        ).collect()
    }
    w = Window.orderBy("v")
    expected = {
        r["v"]: (r["rnk"], r["drnk"])
        for r in dist.select(
            "v", F.rank().over(w).alias("rnk"), F.dense_rank().over(w).alias("drnk")
        ).collect()
    }
    # dist has one row per key, so rank over it counts KEYS before; compare
    # rows_before against the expanded row rank instead
    w_rows = Window.orderBy("v")
    row_rank = {
        r["v"]: r["rnk"]
        for r in df.select("v", F.rank().over(w_rows).alias("rnk")).distinct().collect()
    }
    for v, (rnk, drnk) in got.items():
        assert rnk == row_rank[v], f"rank mismatch at v={v}"
        assert drnk == expected[v][1], f"dense_rank mismatch at v={v}"


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_portable_hash_cross_engine(spark, texts):
    """The md5-based portable hash — the primitive every dedup/sampling/
    sketch twin leans on — agrees bit-for-bit between Spark and DuckDB for
    arbitrary printable strings."""
    import duckdb

    from data_pipeline_for_autonomous_vehicles_spark.functions.scalars import (
        portable_hash,
        sql_portable_hash,
    )

    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got_spark = {
        r["s"]: r["h"] for r in df.select("s", portable_hash("s").alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in texts])
    got_duck = dict(con.execute(f"SELECT s, {sql_portable_hash('s')} FROM t").fetchall())
    assert got_spark == got_duck


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.integers(min_value=-10**9, max_value=10**9).map(lambda c: c / 10_000.0),
        min_size=1,
        max_size=20,
        unique=True,
    ),
    scale=st.integers(min_value=0, max_value=6),
)
def test_round_half_up_cross_engine(spark, vals, scale):
    """round_half_up (the display-rounding primitive) agrees bit-for-bit
    between Spark and DuckDB for arbitrary 1e-4-grid doubles and scales."""
    import duckdb

    from data_pipeline_for_autonomous_vehicles_spark.functions.scalars import (
        round_half_up,
        sql_round_half_up,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got_spark = {
        r["v"]: r["r"]
        for r in df.select("v", round_half_up(F.col("v"), scale).alias("r")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    got_duck = dict(
        con.execute(f"SELECT v, {sql_round_half_up('v', scale)} FROM t").fetchall()
    )
    assert got_spark == got_duck


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # part group
            st.one_of(  # value domain mixes dense ties with huge outliers
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=10**15, max_value=10**15 + 3),
                st.integers(min_value=-(10**18), max_value=-(10**18) + 1),
            ),
        ),
        min_size=1,
        max_size=60,
    ),
    parts=st.integers(min_value=1, max_value=9),
)
def test_tie_aware_running_desc_grouped_extreme_domains(spark, rows, parts):
    """`_tie_aware_running` under DESCENDING order, WITH part_cols, on value
    domains spanning 33 orders of magnitude (dense tie clusters + huge
    outliers — the heavy-tail class that collapsed the round-3 equal-width
    bins). Counts must equal Spark's own per-group global windows for any
    partition count."""
    from pyspark.sql import Window

    from data_pipeline_for_autonomous_vehicles_spark.operators.windows import (
        _tie_aware_running,
    )

    df = spark.createDataFrame(rows, "g int, v long")
    dist = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cnt"))
    got = {
        (r["g"], r["v"]): (r["rows_before"], r["keys_before"])
        for r in _tie_aware_running(
            dist, ["g"], "v", ascending=False, n_parts=parts
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(F.desc("v"))
    expected_rank = {
        (r["g"], r["v"]): r["rnk"]
        for r in df.select(
            "g", "v", F.rank().over(w).alias("rnk")
        ).distinct().collect()
    }
    expected_dense = {
        (r["g"], r["v"]): r["drnk"]
        for r in dist.select(
            "g", "v", F.dense_rank().over(w).alias("drnk")
        ).collect()
    }
    assert set(got) == set(expected_rank)
    for key, (rows_before, keys_before) in got.items():
        assert rows_before + 1 == expected_rank[key], key
        assert keys_before + 1 == expected_dense[key], key


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=20),
        min_size=1,
        max_size=8,
    ),
)
def test_segment_rows_partition_and_boiler_rule(spark, docs):
    """On arbitrary corpora: non-overlapping segments partition each doc's
    tokens exactly (every token in exactly one segment, ntok sums back to
    the doc length, trailing partial included), digests equal md5 of the
    space-joined slice, and _boiler_digests implements df >= BOILERPLATE_DF
    over distinct docs — the invariants the whole boilerplate family
    (removal / audit / delta probe / streaming gate) rests on."""
    import hashlib
    import math

    from data_pipeline_for_autonomous_vehicles_spark.operators.corpus import (
        BOILERPLATE_DF,
        PASSAGE_TOKENS as W,
        _boiler_digests,
        _segment_rows,
    )

    base = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(docs)], "doc_id long, toks array<string>"
    )
    segs = _segment_rows(base).collect()

    by_doc: dict[int, list] = {}
    for r in segs:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(len(docs)))
    seg_docs: dict[str, set[int]] = {}
    for i, toks in enumerate(docs):
        rows = sorted(by_doc[i], key=lambda r: r["pos"])
        assert [r["pos"] for r in rows] == list(range(1, math.ceil(len(toks) / W) + 1))
        assert sum(r["ntok"] for r in rows) == len(toks)
        for r in rows:
            piece = toks[(r["pos"] - 1) * W : (r["pos"] - 1) * W + W]
            assert r["ntok"] == len(piece)
            expect_digest = hashlib.md5(" ".join(piece).encode()).hexdigest()
            assert r["digest"] == expect_digest
            seg_docs.setdefault(r["digest"], set()).add(i)

    got_boiler = {r["digest"] for r in _boiler_digests(_segment_rows(base)).collect()}
    expect_boiler = {d for d, s in seg_docs.items() if len(s) >= BOILERPLATE_DF}
    assert got_boiler == expect_boiler


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]),
            min_size=0,
            max_size=30,
        ),
        min_size=5,
        max_size=12,
    ),
)
def test_incremental_admission_one_sided_vs_rebuild(spark, docs, tmp_path_factory):
    """On ARBITRARY corpora (tiny alphabet ⇒ heavy shared shingles, band
    collisions, duplicated windows, minted boilerplate): every doc the
    incremental gates ADMIT must (a) be kept by a full
    `curated_shard_manifest` rebuild and (b) carry a byte-identical
    manifest row (shard, token/byte counts, span-cut text) — the
    one-sidedness contract `operators/ingest.py` claims by construction,
    checked here against adversarial inputs instead of curated ones."""
    from data_pipeline_for_autonomous_vehicles_spark.operators.corpus import (
        curated_shard_manifest,
    )
    from data_pipeline_for_autonomous_vehicles_spark.operators.ingest import (
        incremental_admission_manifest,
    )

    d = str(tmp_path_factory.mktemp("propcorpus"))
    rows = []
    for i, toks in enumerate(docs):
        t = " ".join(toks)
        rows.append((i, t, "en", "s0", len(t)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")

    man = incremental_admission_manifest(spark, d).collect()
    assert {r["doc_id"] for r in man} == {i for i in range(len(docs)) if i % 5 == 4}
    admitted = [r for r in man if r["verdict"] == "admitted"]
    for r in man:
        if r["verdict"] != "admitted":
            assert (r["n_tokens"], r["n_bytes"], r["kept_text"]) == (0, 0, "")
    if not admitted:
        return
    rebuild = {r["doc_id"]: r for r in curated_shard_manifest(spark, d).collect()}
    for r in admitted:
        f = rebuild.get(r["doc_id"])
        assert f is not None, f"admitted doc {r['doc_id']} dropped by rebuild"
        assert (r["shard"], r["n_tokens"], r["n_bytes"], r["kept_text"]) == (
            f["shard"], f["n_tokens"], f["n_bytes"], f["kept_text"],
        )
