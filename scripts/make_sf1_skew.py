#!/usr/bin/env python
"""Derive a ZIPF-SKEWED variant of the builder-side sf1 dataset.

The uniform sf1 replicas (scripts/make_sf1.py) are key-offset: every
join key keeps sf0.1's near-uniform frequency. Real 100 TB key
distributions are zipfian — a handful of customers/suppliers/users own
a large share of the fact rows — and that is exactly the regime where
a shuffle join's heaviest reducer partition becomes the straggler.
The salted-aggregate and AQE skew-join code paths (operators/skew.py,
session.py AQE conf) had never been exercised under ACTUAL skew; this
dataset makes the skew-stress timing honest (VERDICT r5 #6).

Construction: read .scale/sf1 and REMAP the fact-side foreign keys
with a deterministic power transform

    k' = 1 + floor((k - 1)^3 / n^2)        (k uniform on [1, n])

which sends a uniform key to a cubic-density one (count per key
~ y^(-2/3), a zipf-class head): the hottest key alone absorbs
n^(-1/3) of ALL fact rows — ~4.6% of 6M lineitem rows on ONE supplier
(n=10k), ~460x its uniform share — while the upper half of the key
range keeps a long uniform-ish tail. Properties that matter:

- referential integrity holds: k' stays inside [lo, lo+n), and every
  dimension key still exists (dimensions are copied verbatim);
- deterministic (pure integer arithmetic, no RNG);
- the HEAVY HITTER is known: key `lo` (custkey/suppkey/partkey/user 0
  ranges) — easy to assert against in tests;
- row counts, payload columns, and non-FK distributions are
  bit-identical to uniform sf1, so any wall-time delta is the skew.

Skewed columns: lineitem.l_suppkey + l_partkey, orders.o_custkey,
events.user_id. Keys that are PRIMARY (o_orderkey, l_orderkey chains)
stay untouched — skewing those would break key-uniqueness invariants,
which is a different failure class than join skew.

Output: /root/repo/.scale/sf1zipf/*.parquet (gitignored).
"""

from __future__ import annotations

import os

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF1", os.path.join(REPO, ".scale", "sf1"))
DST = os.environ.get(
    "SPARK_GRAFT_SF1ZIPF", os.path.join(REPO, ".scale", "sf1zipf")
)

# sf1 key cardinalities (10 replicas x sf0.1 strides, see make_sf1.py)
N_CUST, N_SUPP, N_PART, N_USER = 150_000, 10_000, 200_000, 15_000


def power_remap(col: str, n: int) -> str:
    """Cubic-density remap of a 1-based key on [1, n] (HUGEINT
    intermediate: (2e5)^3 fits int64, but stay safe for any n)."""
    c = f"(({col})::HUGEINT - 1)"
    return (
        f"(1 + ({c} * {c} * {c}) // ({n}::HUGEINT * {n}))::BIGINT"
        f" AS {col}"
    )


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    for name in (
        "region nation customer supplier part documents embeddings"
    ).split():
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{name}.parquet') TO "
            f"'{DST}/{name}.parquet' (FORMAT PARQUET)"
        )

    con.sql(
        f"""COPY (SELECT o_orderkey,
                   {power_remap('o_custkey', N_CUST)},
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM '{SRC}/orders.parquet')
            TO '{DST}/orders.parquet'
            (FORMAT PARQUET, ROW_GROUP_SIZE 122880)"""
    )
    con.sql(
        f"""COPY (SELECT l_orderkey,
                   {power_remap('l_partkey', N_PART)},
                   {power_remap('l_suppkey', N_SUPP)},
                   l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus,
                   l_shipdate
            FROM '{SRC}/lineitem.parquet')
            TO '{DST}/lineitem.parquet'
            (FORMAT PARQUET, ROW_GROUP_SIZE 122880)"""
    )
    con.sql(
        f"""COPY (SELECT event_id, ts,
                   {power_remap('user_id', N_USER)},
                   event_type, value, props
            FROM '{SRC}/events.parquet')
            TO '{DST}/events.parquet'
            (FORMAT PARQUET, ROW_GROUP_SIZE 122880)"""
    )

    # report the realized skew so SCALE.md can quote it
    for tbl, col in (
        ("lineitem", "l_suppkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
    ):
        top = con.sql(
            f"""SELECT {col}, COUNT(*) AS c
                FROM '{DST}/{tbl}.parquet'
                GROUP BY 1 ORDER BY c DESC LIMIT 3"""
        ).fetchall()
        tot = con.sql(
            f"SELECT COUNT(*) FROM '{DST}/{tbl}.parquet'"
        ).fetchone()[0]
        print(
            f"{tbl}.{col}: total={tot} top3="
            + ", ".join(f"{k}:{c} ({100 * c / tot:.1f}%)" for k, c in top)
        )


if __name__ == "__main__":
    main()
