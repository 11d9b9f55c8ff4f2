#!/usr/bin/env python
"""Generate a builder-side sf1 dataset (10x sf0.1) for the scale sweep.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md); the sf0.1->sf1
scaling exponent per query is the best local proxy for the 100x claim
(VERDICT r2 directive #8). This scales sf0.1 by replicating each table
10x with key offsets so that:

- foreign keys stay consistent (orders.o_custkey lands in the same
  replica's customer key range, etc.);
- entity NAMES are regenerated from the new key (Customer#%09d), so
  name-keyed operators (fuzzy matching) see 10x distinct names, not
  10 copies of each name (which would quadratically inflate duplicate
  groups and measure an artifact, not scaling);
- document TEXT is token-shuffled per replica (seeded by replica,
  doc_id): token/char/language distributions are bit-identical per
  replica, but shingle k-grams are destroyed across replicas, so the
  near-duplicate RATE stays that of the original corpus instead of
  every doc gaining 9 synthetic 0.9-Jaccard twins;
- embeddings get small deterministic Gaussian noise per replica
  (seeded), so ANN queries see 10x distinct vectors with the same
  cluster structure rather than 10 exact copies of each point.

Output: /root/repo/.scale/sf1/*.parquet (gitignored, ~180 MB).
Deterministic: same output on every run.

r4: REPLICAS is env-overridable so the same generator produces a THIRD
scale point — two points fit any straight line, three distinguish a
true exponent from a crossover (VERDICT r3 #5):

    SPARK_GRAFT_REPLICAS=30 SPARK_GRAFT_SF1=$REPO/.scale/sf3 \
        python scripts/make_sf1.py     # sf3 = 30x sf0.1, ~540 MB
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
DST = os.environ.get(
    "SPARK_GRAFT_SF1",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"),
)
REPLICAS = int(os.environ.get("SPARK_GRAFT_REPLICAS", "10"))

# (table, key stride per replica) — strides = sf0.1 cardinalities so
# offset keys stay contiguous and FK-consistent across replicas.
N_CUST, N_SUPP, N_PART, N_ORD, N_EVT, N_DOC, N_VEC, N_USER = (
    15_000, 1_000, 20_000, 150_000, 100_000, 5_000, 2_000, 1_500,
)


def copy_table(con: duckdb.DuckDBPyConnection, name: str) -> None:
    con.sql(f"COPY (SELECT * FROM '{SRC}/{name}.parquet') TO '{DST}/{name}.parquet' (FORMAT PARQUET)")


def replicated(con: duckdb.DuckDBPyConnection, name: str, select_tpl: str) -> None:
    """Union of REPLICAS copies; {i} in the template is the replica index."""
    parts = [
        f"SELECT {select_tpl.format(i=i)} FROM '{SRC}/{name}.parquet'"
        for i in range(REPLICAS)
    ]
    union = " UNION ALL ".join(parts)
    con.sql(
        f"COPY ({union}) TO '{DST}/{name}.parquet' "
        f"(FORMAT PARQUET, ROW_GROUP_SIZE 122880)"
    )


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # REPLICAS=1000 (sf100) builds a 1000-branch UNION ALL, past
    # DuckDB's default 1000 expression-depth guard
    con.sql("SET max_expression_depth TO 25000")

    copy_table(con, "region")
    copy_table(con, "nation")

    replicated(
        con, "customer",
        f"(c_custkey + {{i}} * {N_CUST})::BIGINT AS c_custkey, "
        f"printf('Customer#%09d', (c_custkey + {{i}} * {N_CUST})::INT) AS c_name, "
        "c_nationkey, c_acctbal, c_mktsegment",
    )
    replicated(
        con, "supplier",
        f"(s_suppkey + {{i}} * {N_SUPP})::BIGINT AS s_suppkey, "
        f"printf('Supplier#%09d', (s_suppkey + {{i}} * {N_SUPP})::INT) AS s_name, "
        "s_nationkey, s_acctbal",
    )
    replicated(
        con, "part",
        f"(p_partkey + {{i}} * {N_PART})::BIGINT AS p_partkey, "
        "p_name, p_brand, p_type, p_size, p_retailprice",
    )
    replicated(
        con, "orders",
        f"(o_orderkey + {{i}} * {N_ORD})::BIGINT AS o_orderkey, "
        f"(o_custkey + {{i}} * {N_CUST})::BIGINT AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )
    replicated(
        con, "lineitem",
        f"(l_orderkey + {{i}} * {N_ORD})::BIGINT AS l_orderkey, "
        f"(l_partkey + {{i}} * {N_PART})::BIGINT AS l_partkey, "
        f"(l_suppkey + {{i}} * {N_SUPP})::BIGINT AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate",
    )
    replicated(
        con, "events",
        f"(event_id + {{i}} * {N_EVT})::BIGINT AS event_id, ts, "
        f"(user_id + {{i}} * {N_USER})::BIGINT AS user_id, "
        "event_type, value, props",
    )

    # documents: replica 0 verbatim; replicas 1..9 shuffle tokens with a
    # per-(replica, doc) seed — same token bag, different shingles.
    docs = con.sql(f"SELECT * FROM '{SRC}/documents.parquet' ORDER BY doc_id").df()
    frames = []
    for i in range(REPLICAS):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + i * N_DOC
        if i > 0:
            texts = []
            for did, txt in zip(d["doc_id"], d["text"]):
                toks = txt.split(" ")
                rng = np.random.default_rng(1_000_003 * i + int(did))
                rng.shuffle(toks)
                texts.append(" ".join(toks))
            d["text"] = texts
        frames.append(d)
    import pandas as pd

    all_docs = pd.concat(frames, ignore_index=True)
    con.register("all_docs", all_docs)
    con.sql(f"COPY (SELECT doc_id, text, lang, source, n_chars FROM all_docs) TO '{DST}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 10000)")

    # embeddings: replica 0 verbatim; replicas 1..9 add seeded Gaussian
    # noise at 10% of the per-dimension std — same cluster structure,
    # distinct vectors.
    emb_tbl = con.sql(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' ORDER BY vec_id"
    ).fetch_arrow_table()
    vec_ids = emb_tbl["vec_id"].to_numpy()
    labels = emb_tbl["label"].to_numpy()
    mat = np.array(emb_tbl["embedding"].to_pylist(), dtype=np.float32)
    dim = mat.shape[1]
    sigma = mat.std(axis=0, keepdims=True) * 0.10
    out_ids, out_labels, out_vecs = [], [], []
    for i in range(REPLICAS):
        ids = vec_ids + i * N_VEC
        if i == 0:
            vecs = mat
        else:
            rng = np.random.default_rng(7_000_003 + i)
            vecs = (mat + rng.standard_normal(mat.shape).astype(np.float32) * sigma).astype(np.float32)
        out_ids.append(ids)
        out_labels.append(labels)
        out_vecs.append(vecs)
    ids_all = np.concatenate(out_ids)
    labels_all = np.concatenate(out_labels)
    vecs_all = np.concatenate(out_vecs)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs_all.reshape(-1), type=pa.float32()), dim
    ).cast(pa.list_(pa.float32()))
    out = pa.table(
        {
            "vec_id": pa.array(ids_all, type=pa.int64()),
            "embedding": arr,
            "label": pa.array(labels_all, type=pa.int32()),
        }
    )
    pq.write_table(out, f"{DST}/embeddings.parquet", row_group_size=4000)

    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
