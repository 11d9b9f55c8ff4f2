"""Wave-63 (round 5): robust trend estimation + corpus drift watch.

* ``trend_theil_sen_slope`` — the Theil-Sen estimator (median of all
  pairwise slopes), the robust replacement for OLS trend: slopes stay
  exact rationals (cent-delta numerator, month-delta denominator);
  the median is selected by ordering on the IEEE double num/den —
  int64/int64 division is correctly rounded, hence identical across
  engines — with (num, den) tiebreak, and the RESULT is reported as
  the exact fraction, never a float. Pairs are enumerated on the
  bounded month spine, so the quadratic is over ~tens of rows no
  matter the data volume.
* ``corpus_drift_idf_shift`` — vocabulary drift monitor between two
  interleaved corpus halves (doc_id parity): per-half document
  frequency ranks of the top terms, joined, with absent terms pinned
  to rank N+1 — the training-data freshness check that catches a
  topic shift before it poisons a tokenizer or mixture weighting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ Theil-Sen slope


@query(
    "trend_theil_sen_slope",
    oracle="""
        WITH monthly AS (
            SELECT (EXTRACT(year FROM o_orderdate) * 12
                    + EXTRACT(month FROM o_orderdate)) AS mi,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ), pairs AS (
            SELECT b.cents - a.cents AS num,
                   CAST(b.mi - a.mi AS BIGINT) AS den
            FROM monthly a JOIN monthly b ON b.mi > a.mi
        ), ranked AS (
            SELECT num, den,
                   ROW_NUMBER() OVER (
                       ORDER BY CAST(num AS DOUBLE) / den, num, den) AS rk,
                   COUNT(*) OVER () AS n_pairs
            FROM pairs
        )
        SELECT CAST((SELECT COUNT(*) FROM monthly) AS BIGINT) AS n_months,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               num AS slope_num_cents,
               den AS slope_den_months,
               CAST((num * 1000) // den AS BIGINT) AS slope_millicents
        FROM ranked WHERE rk = (n_pairs + 1) // 2
    """,
    description="Theil-Sen robust trend slope of monthly revenue: the "
    "median of all pairwise slopes, with each slope kept as an exact "
    "rational (cent delta / month delta) — the median is selected by "
    "sorting on the IEEE-correctly-rounded double num/den (identical "
    "across engines for int64 operands) with (num, den) tiebreak, and "
    "reported as the exact fraction plus a floor-division millicents-"
    "per-month figure, so no float ever reaches the output. The 29% "
    "breakdown point makes this THE trend statistic for dirty data. "
    "At 100 TB the only data-scale pass is the month rollup; the "
    "O(m^2) pair join runs on the bounded month spine (~tens of "
    "rows), which is the standard way Theil-Sen is deployed on "
    "aggregated series.",
)
def trend_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mi")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    pairs = a.join(b, F.col("b.mi") > F.col("a.mi")).select(
        (F.col("b.cents") - F.col("a.cents")).alias("num"),
        (F.col("b.mi") - F.col("a.mi")).cast("long").alias("den"),
    )
    ranked = pairs.select(
        "num",
        "den",
        F.row_number()
        .over(
            Window.orderBy(
                F.col("num").cast("double") / F.col("den"), "num", "den"
            )
        )
        .alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_pairs"),
    )
    n_months = monthly.agg(
        F.count(F.lit(1)).cast("long").alias("n_months")
    )
    return (
        ranked.filter(F.col("rk") == F.expr("(n_pairs + 1) div 2"))
        .crossJoin(F.broadcast(n_months))
        .select(
            "n_months",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("num").alias("slope_num_cents"),
            F.col("den").alias("slope_den_months"),
            F.expr("(num * 1000) div den")
            .cast("long")
            .alias("slope_millicents"),
        )
    )


# ------------------------------------------------ corpus drift monitor

_DRIFT_TOP = 50  # per-half document-frequency rank window
_DRIFT_OUT = 20  # top movers reported


@query(
    "corpus_drift_idf_shift",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id % 2 AS half, doc_id, unnest(string_split(text, ' '))
                       AS term
            FROM documents
        ), df AS (
            SELECT half, term,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM tok WHERE term <> '' GROUP BY 1, 2
        ), ranked AS (
            SELECT half, term, df,
                   ROW_NUMBER() OVER (PARTITION BY half
                                      ORDER BY df DESC, term) AS rk
            FROM df
        ), top AS (
            SELECT * FROM ranked WHERE rk <= {_DRIFT_TOP}
        ), joined AS (
            SELECT COALESCE(a.term, b.term) AS term,
                   COALESCE(a.rk, {_DRIFT_TOP} + 1) AS rank_even,
                   COALESCE(b.rk, {_DRIFT_TOP} + 1) AS rank_odd
            FROM (SELECT term, rk FROM top WHERE half = 0) a
            FULL OUTER JOIN (SELECT term, rk FROM top WHERE half = 1) b
              ON b.term = a.term
        )
        SELECT term,
               CAST(rank_even AS BIGINT) AS rank_even,
               CAST(rank_odd AS BIGINT) AS rank_odd,
               CAST(ABS(rank_even - rank_odd) AS BIGINT) AS rank_shift
        FROM joined
        ORDER BY rank_shift DESC, term
        LIMIT {_DRIFT_OUT}
    """,
    description="Corpus vocabulary-drift monitor: document-frequency "
    "ranks of the top-50 terms in two interleaved halves of the "
    "corpus (doc_id parity), full-outer-joined with absent terms "
    "pinned to rank 51, reporting the 20 largest rank shifts — the "
    "freshness check a training-data pipeline runs between snapshot "
    "ingests to catch topic drift before it skews tokenizer merges "
    "or source mixture weights. All ranks are exact integers "
    "(COUNT DISTINCT doc per term). At 100 TB: tokenize + distinct "
    "is one explode and one partial-agg shuffle on (half, term); the "
    "per-half rank window is a WindowGroupLimit top-50 (map-side "
    "prefilter), and the join touches <= 100 rows.",
)
def corpus_drift_idf_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        (F.col("doc_id") % 2).alias("half"),
        "doc_id",
        F.explode(F.split(F.col("text"), " ")).alias("term"),
    ).filter(F.col("term") != "")
    df = tok.groupBy("half", "term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    w = Window.partitionBy("half").orderBy(F.desc("df"), "term")
    top = df.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _DRIFT_TOP
    )
    even = top.filter(F.col("half") == 0).select(
        "term", F.col("rk").alias("rk_e")
    )
    odd = top.filter(F.col("half") == 1).select(
        "term", F.col("rk").alias("rk_o")
    )
    joined = even.join(odd, "term", "full_outer").select(
        "term",
        F.coalesce(F.col("rk_e"), F.lit(_DRIFT_TOP + 1))
        .cast("long")
        .alias("rank_even"),
        F.coalesce(F.col("rk_o"), F.lit(_DRIFT_TOP + 1))
        .cast("long")
        .alias("rank_odd"),
    )
    return (
        joined.withColumn(
            "rank_shift", F.abs(F.col("rank_even") - F.col("rank_odd"))
        )
        .orderBy(F.desc("rank_shift"), "term")
        .limit(_DRIFT_OUT)
    )
