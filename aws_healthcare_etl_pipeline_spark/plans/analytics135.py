"""Wave-161 (round 5): exact inequality measures + corpus concordance.

* ``inequality_gini_lorenz`` — the exact Gini coefficient and Lorenz-
  curve deciles of customer revenue, computed WITHOUT a global sort:
  global ranks and cumulative revenue ride the repo's two-level
  distributed running-total operator (value-range buckets carry
  exclusive prefix sums; within-bucket windows are partitioned), and
  Gini falls out of the closed form G = (2*Σ rank*x - (n+1)*Σx) /
  (n*Σx) — pure integer cents, permille output. The DuckDB oracle is
  the textbook global-window version, so the hash match PROVES the
  decomposition (the repo's running-total/sweepline pattern).

* ``text_kwic_concordance`` — the classic Key-Word-In-Context
  concordance at corpus scale: per-document positional tokens, ±2
  token contexts via partitioned lag/lead with boundary sentinels,
  then the top-5 most frequent contexts per query term. Context
  assembly never carries the document text — only four neighbor
  tokens per match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.cumsum import distributed_running_total
from ..sources.tables import load_table
from .registry import query

_GL_BUCKET = 1 << 22  # revenue-cents bucket width for the carry spine


@query(
    "inequality_gini_lorenz",
    oracle="""
        WITH rev AS (
            SELECT o_custkey AS ck,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS r
            FROM orders GROUP BY 1
        ), seq AS (
            SELECT r,
                   ROW_NUMBER() OVER (ORDER BY r, ck) AS rk,
                   CAST(SUM(r) OVER (ORDER BY r, ck ROWS BETWEEN
                        UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cumr
            FROM rev
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(r) AS BIGINT) AS s,
                   CAST(SUM(CAST(rk AS HUGEINT) * r) AS HUGEINT) AS w
            FROM seq
        ), gini AS (
            SELECT 'gini_permille' AS metric,
                   CAST((2 * w - (CAST(n AS HUGEINT) + 1) * s) * 1000
                        // (CAST(n AS HUGEINT) * s) AS BIGINT)
                       AS permille
            FROM tot
        ), lorenz AS (
            SELECT concat('lorenz_d', CASE WHEN d < 10
                          THEN concat('0', CAST(d AS VARCHAR))
                          ELSE CAST(d AS VARCHAR) END) AS metric,
                   CAST(seq.cumr * 1000 // t.s AS BIGINT) AS permille
            FROM (SELECT UNNEST(range(1, 11)) AS d) spine
            CROSS JOIN tot t
            JOIN seq ON seq.rk = (d * t.n) // 10
        )
        SELECT metric, permille FROM gini
        UNION ALL
        SELECT metric, permille FROM lorenz
        ORDER BY metric
    """,
    description="Exact Gini coefficient + Lorenz deciles of customer "
    "revenue with NO global sort: global ranks and cumulative revenue "
    "come from the two-level distributed running-total operator "
    "(revenue-range buckets carry exclusive prefix sums, within-"
    "bucket windows are partitioned), and Gini is the closed form "
    "(2*SUM(rank*x) - (n+1)*SUM(x)) * 1000 div (n*SUM(x)) in integer "
    "cents (rank*x products ride DECIMAL(38)/HUGEINT). The oracle is "
    "the textbook global-window version — the hash match proves the "
    "decomposition. 100 TB shape: one groupBy to customer grain, one "
    "bounded carry spine (~1200 revenue buckets), partitioned "
    "windows, a 10-row broadcast for the decile lookups; the "
    "concentration audit every marketplace and ad platform runs on "
    "its revenue ledger without ever single-tasking the sort.",
)
def inequality_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100)"
            " AS BIGINT)"
        ).alias("r")
    )
    bucketed = rev.withColumn("vb", F.expr(f"r div {_GL_BUCKET}"))
    ranked = distributed_running_total(
        bucketed,
        F.lit(1).cast("bigint"),
        "vb",
        ["r", "ck"],
        out_col="rk",
        zero=F.lit(0).cast("bigint"),
    )
    seq = distributed_running_total(
        ranked,
        F.col("r"),
        "vb",
        ["r", "ck"],
        out_col="cumr",
        zero=F.lit(0).cast("bigint"),
    ).select("r", "rk", "cumr").localCheckpoint(eager=False)
    tot = seq.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("s"),
        F.expr("SUM(CAST(rk AS DECIMAL(38,0)) * r)").alias("w"),
    )
    gini = tot.select(
        F.lit("gini_permille").alias("metric"),
        F.expr(
            "CAST((2 * w - (CAST(n AS DECIMAL(38,0)) + 1) * s) * 1000"
            " div (CAST(n AS DECIMAL(38,0)) * s) AS BIGINT)"
        ).alias("permille"),
    )
    spine = spark.range(1, 11).select(F.col("id").alias("d"))
    targets = spine.crossJoin(F.broadcast(tot)).select(
        "d", F.expr("(d * n) div 10").alias("target"), "s"
    )
    lorenz = seq.join(
        F.broadcast(targets), F.col("rk") == F.col("target")
    ).select(
        F.concat(
            F.lit("lorenz_d"), F.lpad(F.col("d").cast("string"), 2, "0")
        ).alias("metric"),
        F.expr("CAST(cumr * 1000 div s AS BIGINT)").alias("permille"),
    )
    return gini.unionAll(lorenz).orderBy("metric")


_KWIC_TERMS = ("spark", "join", "merge")
_KWIC_TOPK = 5


@query(
    "text_kwic_concordance",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, len(arr) + 1),
                          i -> {{'pos': i, 'tok': arr[i]}}),
                          recursive := true)
            FROM (SELECT doc_id,
                         regexp_split_to_array(trim(text), '\s+') AS arr
                  FROM documents)
        ), ctx AS (
            SELECT doc_id, pos, tok,
                   concat(
                       COALESCE(LAG(tok, 2) OVER w, '^'), ' ',
                       COALESCE(LAG(tok, 1) OVER w, '^'), ' _ ',
                       COALESCE(LEAD(tok, 1) OVER w, '$'), ' ',
                       COALESCE(LEAD(tok, 2) OVER w, '$')
                   ) AS context
            FROM toks
            WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ), hits AS (
            SELECT tok AS term, context,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM ctx
            WHERE tok IN ('spark', 'join', 'merge')
            GROUP BY 1, 2
        ), ranked AS (
            SELECT term, context, n,
                   CAST(ROW_NUMBER() OVER (PARTITION BY term
                        ORDER BY n DESC, context) AS BIGINT) AS rnk
            FROM hits
        )
        SELECT term, context, n, rnk
        FROM ranked WHERE rnk <= {_KWIC_TOPK}
        ORDER BY term, rnk
    """,
    description="Key-Word-In-Context concordance at corpus scale: "
    "positional tokens via posexplode, +/-2-token contexts from "
    "partitioned lag/lead with '^'/'$' boundary sentinels, then the "
    "top-5 most frequent contexts per query term (count DESC, "
    "context ASC tie-break -> WindowGroupLimit prefilter). The "
    "context string is assembled from FOUR neighbor tokens per "
    "position — the document text itself is never carried past the "
    "explode, so the shuffle payload is O(tokens), not O(docs x "
    "doclen). 100 TB shape: one explode, per-document partitioned "
    "windows (no global sort), one count shuffle on (term, context) "
    "keys, and a per-term top-k that the planner prefilters map-"
    "side; the linguist's concordance and the prompt-engineer's "
    "template-leak hunt are this exact query.",
)
def text_kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    ctx = toks.select(
        "tok",
        F.concat(
            F.coalesce(F.lag("tok", 2).over(w), F.lit("^")),
            F.lit(" "),
            F.coalesce(F.lag("tok", 1).over(w), F.lit("^")),
            F.lit(" _ "),
            F.coalesce(F.lead("tok", 1).over(w), F.lit("$")),
            F.lit(" "),
            F.coalesce(F.lead("tok", 2).over(w), F.lit("$")),
        ).alias("context"),
    )
    hits = (
        ctx.where(F.col("tok").isin(*_KWIC_TERMS))
        .groupBy(F.col("tok").alias("term"), "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    rw = Window.partitionBy("term").orderBy(
        F.col("n").desc(), F.col("context")
    )
    return (
        hits.withColumn("rnk", F.row_number().over(rw).cast("long"))
        .where(F.col("rnk") <= _KWIC_TOPK)
        .orderBy("term", "rnk")
    )
