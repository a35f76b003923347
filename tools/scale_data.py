"""Scale-stress data generator: replicate a driver SF directory K× with
FK-consistent key offsets, so the bench can be run at ~sf1 (or beyond)
without synthesizing new distributions.

Each replica i shifts every entity key by i * stride(table key): orderkey,
custkey, suppkey, partkey, event_id, user_id, doc_id, vec_id all stay
internally consistent, so every join in the engine fans out exactly as it
would on truly larger data — K× facts over K× dimensions, same per-key
cardinalities, same value distributions (no artificial hot keys beyond the
source's own). region/nation are genuinely global dimensions and are NOT
replicated (their keys are referenced by replicated rows unchanged), which
matches how a real deployment scales: facts grow, enums don't.

Timestamps are kept as-is: K× replicas densify every time window K×, the
same growth pattern a busier fleet produces.

Reading dedup-family results at K×: replication makes every document
K-fold duplicated ACROSS replicas on content (keys differ, text doesn't),
so content-keyed operators legitimately super-linearize — exact-dup
groups grow K×, and pair-producing operators (minhash_lsh_pairs,
ngram_jaccard_pairs) emit ≈ K² · P₁ + K · C(K,2) · D pairs, where P₁ =
source pair count and D = source docs that collide with their own
replicas (every replica pair of the same doc is a certain collision).
A ~K² pair-count growth at K× is therefore the EXPECTED artifact of
replicated text, not a plan regression — check wall-clock against the
candidate-join input sizes, not against the output row count.

Usage:
    python tools/scale_data.py [K] [src_dir] [dst_dir]
Defaults: K=10, src=/root/testdata/sf0.1, dst=/tmp/sf_scaled_{K}x
"""

from __future__ import annotations

import os
import sys

import duckdb

# per-table key columns that must be offset, with the stride source
# (stride = 1 + max(key) over the source table, computed per key column)
OFFSET_KEYS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key column -> (owning table, owning column) used to share one stride per
# logical entity across fact and dimension tables
STRIDE_OF = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    # vec_id and doc_id share one logical id space (hybrid RRF joins
    # embeddings.vec_id to documents.doc_id), so both must use the SAME
    # stride — an independent embeddings-derived stride would attach
    # replica i's vectors to other replicas' documents.
    "vec_id": ("documents", "doc_id"),
}
COPY_TABLES = ("region", "nation")


def scale(k: int, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    strides: dict[tuple[str, str], int] = {}
    for key, (tbl, col) in STRIDE_OF.items():
        if (tbl, col) not in strides:
            m = con.execute(
                f"SELECT MAX({col}) FROM '{src}/{tbl}.parquet'"
            ).fetchone()[0]
            strides[(tbl, col)] = int(m) + 1

    for t in COPY_TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, keys in OFFSET_KEYS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        arms = []
        for i in range(k):
            sel = []
            for c in cols:
                if c in keys:
                    stride = strides[STRIDE_OF[c]]
                    sel.append(f"{c} + {i * stride} AS {c}")
                else:
                    sel.append(c)
            arms.append(f"SELECT {', '.join(sel)} FROM '{src}/{t}.parquet'")
        union = "\nUNION ALL\n".join(arms)
        con.execute(f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sf_scaled_{k}x"
    scale(k, src, dst)
    print(f"wrote {dst}")
