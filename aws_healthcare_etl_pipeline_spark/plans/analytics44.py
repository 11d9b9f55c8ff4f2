"""Wave-70 (round 5): storage prefix compression + cache simulation.

* ``layout_prefix_compression_audit`` — adjacent-pair longest-common-
  prefix statistics over sort-ordered part names within each brand:
  the number a columnar format's prefix/delta string encoding
  actually saves, measured exactly (sum/max LCP chars and the
  permille of total chars elided). LCP is computed portably as the
  largest k with equal k-prefixes (a bounded in-row scan over string
  length — no engine-specific LCP function).
* ``cache_lru_hit_rate`` — LRU cache simulation over per-(supplier,
  month) part-access streams: hit iff the key is among the C most
  recently used. The eviction state is order-sensitive (a genuine
  stateful scan — stack distances depend on every prior access), so
  execution rides ``keyed_pandas_scan`` and the DuckDB oracle replays
  the recurrence with a RECURSIVE CTE carrying the MRU list — the
  repo's stateful-family proof pattern, here with LIST state and
  eviction.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.keyscan import keyed_pandas_scan
from ..sources.tables import load_table
from .registry import query

# -------------------------------------------- prefix compression audit


@query(
    "layout_prefix_compression_audit",
    oracle="""
        WITH seq AS (
            SELECT p_brand, p_name,
                   LAG(p_name) OVER (PARTITION BY p_brand ORDER BY p_name)
                       AS prev
            FROM part
        ), lcps AS (
            SELECT p_brand,
                   CAST(length(p_name) AS BIGINT) AS len,
                   CAST(COALESCE(list_max(list_transform(
                       range(1, LEAST(length(prev), length(p_name)) + 1),
                       k -> CASE WHEN substr(prev, 1, CAST(k AS INT))
                                      = substr(p_name, 1, CAST(k AS INT))
                            THEN k ELSE 0 END)), 0) AS BIGINT) AS lcp
            FROM seq
        )
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_names,
               CAST(SUM(len) AS BIGINT) AS total_chars,
               CAST(SUM(lcp) AS BIGINT) AS prefix_chars_elided,
               CAST(MAX(lcp) AS BIGINT) AS max_lcp,
               CAST((SUM(lcp) * 1000) // SUM(len) AS BIGINT)
                   AS elided_permille
        FROM lcps GROUP BY p_brand ORDER BY p_brand
    """,
    description="Prefix-compression effectiveness audit: within each "
    "brand, part names are sort-ordered and the longest common prefix "
    "of each adjacent pair is measured exactly (largest k with equal "
    "k-prefixes — a bounded in-row scan, portable to any engine), "
    "reporting total/max elided characters and the permille of bytes "
    "a columnar prefix/delta string encoding would save under that "
    "sort key — the measurement behind choosing a table's sort "
    "order for string-heavy columns. At 100 TB: the lag window is "
    "partitioned per brand (bounded groups), LCP work is O(string "
    "length) per row inside the projection, and the rollup is one "
    "partial-agg shuffle.",
)
def layout_prefix_compression_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_name")
    seq = part.select(
        "p_brand", "p_name", F.lag("p_name").over(w).alias("prev")
    )
    lcps = seq.select(
        "p_brand",
        F.length("p_name").cast("long").alias("len"),
        F.coalesce(
            F.expr(
                "array_max(transform("
                "sequence(1, least(length(prev), length(p_name))), "
                "k -> CASE WHEN substring(prev, 1, k) "
                "= substring(p_name, 1, k) THEN k ELSE 0 END))"
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("lcp"),
    )
    return (
        lcps.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_names"),
            F.sum("len").cast("long").alias("total_chars"),
            F.sum("lcp").cast("long").alias("prefix_chars_elided"),
            F.max("lcp").cast("long").alias("max_lcp"),
            F.expr("(sum(lcp) * 1000) div sum(len)")
            .cast("long")
            .alias("elided_permille"),
        )
        .orderBy("p_brand")
    )


# ------------------------------------------------ LRU hit-rate simulation

_LRU_CAP = 8  # cache slots per (supplier, month) session


@query(
    "cache_lru_hit_rate",
    oracle=f"""
        WITH RECURSIVE acc AS (
            SELECT l_suppkey AS sk,
                   strftime(l_shipdate, '%Y-%m') AS mon,
                   l_partkey AS pk,
                   ROW_NUMBER() OVER (
                       PARTITION BY l_suppkey, strftime(l_shipdate, '%Y-%m')
                       ORDER BY l_shipdate, l_orderkey, l_linenumber) AS i,
                   COUNT(*) OVER (
                       PARTITION BY l_suppkey, strftime(l_shipdate, '%Y-%m'))
                       AS n
            FROM lineitem
        ), sim(sk, mon, i, mru, hits) AS (
            SELECT sk, mon, CAST(0 AS BIGINT), CAST([] AS BIGINT[]),
                   CAST(0 AS BIGINT)
            FROM (SELECT DISTINCT sk, mon FROM acc)
            UNION ALL
            SELECT s.sk, s.mon, s.i + 1,
                   list_slice(
                       list_prepend(a.pk,
                           list_filter(s.mru, x -> x <> a.pk)),
                       1, {_LRU_CAP}),
                   s.hits + CASE WHEN list_contains(s.mru, a.pk)
                                 THEN 1 ELSE 0 END
            FROM sim s JOIN acc a
              ON a.sk = s.sk AND a.mon = s.mon AND a.i = s.i + 1
        ), done AS (
            SELECT s.sk, m.n, s.hits
            FROM sim s JOIN (SELECT sk, mon, MAX(n) AS n FROM acc
                             GROUP BY sk, mon) m
              ON m.sk = s.sk AND m.mon = s.mon AND s.i = m.n
        )
        SELECT sk AS s_suppkey,
               CAST(SUM(n) AS BIGINT) AS n_accesses,
               CAST(SUM(hits) AS BIGINT) AS n_hits,
               CAST((SUM(hits) * 1000) // SUM(n) AS BIGINT)
                   AS hit_permille
        FROM done GROUP BY sk ORDER BY s_suppkey
    """,
    description=f"LRU cache simulation (capacity {_LRU_CAP}) over per-"
    "(supplier, month) part-access streams ordered by ship date: an "
    "access hits iff its part is among the most-recently-used slots, "
    "and the eviction state makes the scan order-sensitive — stack "
    "distances depend on the entire access prefix, so this is the "
    "stateful family's cache-modeling member (the working-set "
    "analysis behind buffer-pool and shard-cache sizing). Execution "
    "rides keyed_pandas_scan (partition-wise Arrow scan, parallel "
    "across thousands of month-sessions); the DuckDB oracle replays "
    "the exact recurrence with a RECURSIVE CTE carrying the MRU list, "
    "so the hash match proves every hit/evict decision. At 100 TB: "
    "one shuffle on the session key, bounded per-session sequences, "
    "metadata-sized supplier rollup.",
)
def cache_lru_hit_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem").select(
        F.concat_ws(
            ":",
            F.col("l_suppkey").cast("string"),
            F.date_format("l_shipdate", "yyyy-MM"),
        ).alias("grp"),
        F.col("l_suppkey").alias("sk"),
        F.col("l_partkey").alias("pk"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    cap = _LRU_CAP

    def lru_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        # self-contained closure: pandas + stdlib only; rows arrive
        # pre-sorted by (shipdate, orderkey, linenumber)
        mru: list = []
        hits = 0
        for pk in pdf["pk"].tolist():
            if pk in mru:
                hits += 1
                mru.remove(pk)
            mru.insert(0, pk)
            del mru[cap:]
        return pd.DataFrame(
            {
                "sk": [int(pdf["sk"].iloc[0])],
                "n": [len(pdf)],
                "hits": [hits],
            }
        )

    per_sess = keyed_pandas_scan(
        line,
        "grp",
        ["l_shipdate", "l_orderkey", "l_linenumber"],
        lru_scan,
        "sk long, n long, hits long",
    )
    return (
        per_sess.groupBy(F.col("sk").alias("s_suppkey"))
        .agg(
            F.sum("n").cast("long").alias("n_accesses"),
            F.sum("hits").cast("long").alias("n_hits"),
            F.expr("(sum(hits) * 1000) div sum(n)")
            .cast("long")
            .alias("hit_permille"),
        )
        .orderBy("s_suppkey")
    )
