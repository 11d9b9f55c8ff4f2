"""Wave-64 (round 5): DP optimization + corpus lexical statistics.

* ``scheduling_weighted_interval_dp`` — weighted interval scheduling,
  the textbook DP (CLRS 15/16): per nation, choose non-overlapping
  order intervals maximizing total value; opt(i) = max(opt(i-1),
  v_i + opt(p(i))) needs random access to earlier DP states, so it is
  provably not a window function — the third member of the repo's
  order-sensitive stateful family (FFD packing, capped balance). The
  Spark side is an applyInPandas per-key DP scan; the DuckDB oracle
  replays the recurrence with a RECURSIVE CTE that carries the DP
  table as a growing LIST, so the hash match proves every step.
* ``text_hapax_ratio_by_lang`` — hapax legomena share per language:
  vocabulary size, once-occurring types, hapax permille, and token
  count — the classic lexical-richness diagnostic (a high hapax share
  flags OCR noise or tokenizer misfits before BPE training).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.keyscan import keyed_pandas_scan
from ..sources.tables import load_table
from .registry import query

# -------------------------------------------- weighted interval DP

_WIS_MAX_SPAN = 14  # interval length = (o_orderkey % span) + 1 days


@query(
    "scheduling_weighted_interval_dp",
    oracle=f"""
        WITH RECURSIVE iv AS (
            SELECT o.o_custkey AS ck,
                   o.o_orderdate AS s,
                   o.o_orderdate
                       + INTERVAL ((o.o_orderkey % {_WIS_MAX_SPAN}) + 1) DAY
                       AS e,
                   CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v,
                   o.o_orderkey AS ok
            FROM orders o
        ), seq AS (
            SELECT ck, s, e, v,
                   ROW_NUMBER() OVER (PARTITION BY ck ORDER BY e, ok)
                       AS i,
                   COUNT(*) OVER (PARTITION BY ck) AS n
            FROM iv
        ), ecount AS (
            SELECT ck, e, MAX(i) AS mi FROM seq GROUP BY ck, e
        ), withp AS (
            SELECT a.ck, a.i, a.v, a.n,
                   CAST(COALESCE(ec.mi, 0) AS BIGINT) AS p
            FROM seq a ASOF LEFT JOIN ecount ec
              ON a.ck = ec.ck AND a.s >= ec.e
        ), dp(ck, i, opts) AS (
            SELECT ck, CAST(0 AS BIGINT), [CAST(0 AS BIGINT)]
            FROM (SELECT DISTINCT ck FROM withp)
            UNION ALL
            SELECT d.ck, d.i + 1,
                   list_append(d.opts,
                       GREATEST(d.opts[CAST(d.i + 1 AS INT)],
                                w.v + d.opts[CAST(w.p + 1 AS INT)]))
            FROM dp d JOIN withp w ON w.ck = d.ck AND w.i = d.i + 1
        ), percust AS (
            SELECT d.ck, m.n AS n_intervals,
                   d.opts[CAST(d.i + 1 AS INT)] AS opt
            FROM dp d JOIN (SELECT ck, MAX(n) AS n FROM withp GROUP BY ck) m
              ON m.ck = d.ck AND d.i = m.n
        )
        SELECT c.c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(p.n_intervals) AS BIGINT) AS n_intervals,
               CAST(SUM(p.opt) AS BIGINT) AS opt_value_cents
        FROM percust p JOIN customer c ON c.c_custkey = p.ck
        GROUP BY 1 ORDER BY c_nationkey
    """,
    description="Weighted interval scheduling per customer, rolled up "
    "to nation: each order is an interval [orderdate, orderdate + "
    "(orderkey mod 14) + 1 days] worth its exact cents, and the DP "
    "opt(i) = max(opt(i-1), v_i + opt(p(i))) selects each customer's "
    "maximum-value non-overlapping order set. The recurrence random-"
    "accesses earlier states (opt(p(i))), so unlike FIFO matching it "
    "provably cannot be a prefix sum or window — execution is an "
    "Arrow-batched applyInPandas DP scan per customer (parallel "
    "ACROSS thousands of keys, sequential only within one — the "
    "information-theoretic minimum), and the DuckDB oracle replays "
    "it with a RECURSIVE CTE carrying each customer's DP table as a "
    "growing list, proving every step bit-for-bit. At 100 TB: one "
    "shuffle on customer key, per-key sequences bounded by order "
    "history; p(i) is an as-of max-index join in the oracle and a "
    "binary search in the scan; the nation rollup is metadata-"
    "scale.",
)
def scheduling_weighted_interval_dp(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    iv = orders.select(
        F.col("o_custkey").alias("ck"),
        # integer epoch days: keeps the Arrow batch numeric for bisect
        F.datediff("o_orderdate", F.lit("1990-01-01").cast("date")).alias(
            "s"
        ),
        (
            F.datediff("o_orderdate", F.lit("1990-01-01").cast("date"))
            + F.expr(f"cast((o_orderkey % {_WIS_MAX_SPAN}) + 1 as int)")
        ).alias("e"),
        (F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("v"),
        F.col("o_orderkey").alias("ok"),
    )

    def wis_dp(pdf: pd.DataFrame) -> pd.DataFrame:
        # self-contained closure: stdlib bisect + pandas only
        import bisect

        # rows arrive pre-sorted by (e, ok) (keyed_pandas_scan contract)
        ends = pdf["e"].tolist()
        starts = pdf["s"].tolist()
        vals = pdf["v"].tolist()
        n = len(pdf)
        opt = [0] * (n + 1)
        for i in range(1, n + 1):
            # p(i): count of intervals with end <= start_i
            p = bisect.bisect_right(ends, starts[i - 1])
            cand = vals[i - 1] + opt[p]
            opt[i] = cand if cand > opt[i - 1] else opt[i - 1]
        return pd.DataFrame(
            {
                "ck": [int(pdf["ck"].iloc[0])],
                "n_intervals": [n],
                "opt": [opt[n]],
            }
        )

    out_schema = "ck long, n_intervals long, opt long"
    percust = keyed_pandas_scan(iv, "ck", ["e", "ok"], wis_dp, out_schema)
    return (
        percust.join(
            F.broadcast(cust), cust["c_custkey"] == percust["ck"]
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("n_intervals").cast("long").alias("n_intervals"),
            F.sum("opt").cast("long").alias("opt_value_cents"),
        )
        .orderBy("c_nationkey")
    )


# ------------------------------------------------ hapax legomena ratio


@query(
    "text_hapax_ratio_by_lang",
    oracle="""
        WITH tok AS (
            SELECT lang, unnest(string_split(text, ' ')) AS term
            FROM documents
        ), tf AS (
            SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS f
            FROM tok WHERE term <> '' GROUP BY 1, 2
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS vocab_size,
               CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax_count,
               CAST((SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) * 1000)
                    // COUNT(*) AS BIGINT) AS hapax_permille,
               CAST(SUM(f) AS BIGINT) AS token_count
        FROM tf GROUP BY lang ORDER BY lang
    """,
    description="Hapax legomena share per language: vocabulary size, "
    "once-occurring types, their integer-permille share, and total "
    "tokens — the lexical-richness diagnostic that flags OCR noise, "
    "boilerplate stripping failures, or tokenizer-corpus mismatch "
    "before BPE training (a healthy natural-language corpus runs "
    "40-60% hapax; spikes mean garbage types). At 100 TB: one "
    "explode, one partial-agg shuffle on (lang, term), and a "
    "metadata-sized per-language rollup — the term-frequency table "
    "is the same intermediate the tokenizer trainer needs anyway, "
    "so the audit is free on its scan.",
)
def text_hapax_ratio_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "lang", F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    return (
        tf.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax_count"),
            F.expr(
                "(sum(case when f = 1 then 1 else 0 end) * 1000)"
                " div count(*)"
            )
            .cast("long")
            .alias("hapax_permille"),
            F.sum("f").cast("long").alias("token_count"),
        )
        .orderBy("lang")
    )
