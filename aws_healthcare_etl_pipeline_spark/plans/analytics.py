"""Wave-5 analytics: cohort retention, regression-by-moments, robust
outliers, data profiling, collocation mining, quantile bucketing.

Shapes not yet covered by earlier waves — each is a standard
analytics-engine workload re-expressed scale-first:

  events_cohort_retention   weekly cohort x offset retention matrix
  regr_price_trend_by_brand per-group least-squares slope from EXACT
                            integer/decimal moments (no regr_slope —
                            its double accumulation is order-sensitive)
  outliers_mad_orders       median/MAD robust outlier counts
  profile_orders_audit      one-scan column profiler (operators/profile)
  text_pmi_bigrams          collocations by rational PMI lift
  quality_decile_buckets    decile bucketing via exact percentile
                            cutpoints (broadcast), NOT a global ntile
                            sort — the 100 TB-safe design

Oracle conventions follow plans/registry.py: exact DECIMAL/integer
aggregation, transcendental-free scores, ONE double division at the
end, identical expression order on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.profile import profile_columns
from ..sources.tables import load_table
from .registry import dec, query


@query(
    "events_cohort_retention",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY user_id
        ), active AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS event_week
            FROM events
        ), sizes AS (
            SELECT cohort_week, COUNT(*) AS cohort_size
            FROM firsts GROUP BY cohort_week
        )
        SELECT CAST(f.cohort_week AS VARCHAR) AS cohort_week,
               date_diff('day', f.cohort_week, a.event_week) // 7
                   AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_active,
               round(CAST(COUNT(DISTINCT a.user_id) AS DOUBLE)
                     / s.cohort_size, 6) AS retention
        FROM active a
        JOIN firsts f USING (user_id)
        JOIN sizes  s ON f.cohort_week = s.cohort_week
        GROUP BY f.cohort_week, week_offset, s.cohort_size
        ORDER BY cohort_week, week_offset
    """,
    description="Weekly cohort retention matrix over the events stream: "
    "users cohorted by first-activity week; per (cohort, week-offset) "
    "the distinct active users and the retention ratio. Shape at "
    "scale: two aggregations over events plus a user-keyed join — the "
    "firsts/active frames shuffle on user_id once and the retention "
    "ratio is one exact int division.",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("event_week")
    ).distinct()
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    joined = (
        active.join(firsts, "user_id")
        .withColumn(
            "week_offset",
            F.expr("CAST(datediff(event_week, cohort_week) DIV 7 AS BIGINT)"),
        )
        .join(F.broadcast(sizes), "cohort_week")
    )
    return (
        joined.groupBy("cohort_week", "week_offset", "cohort_size")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            "week_offset",
            "n_active",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# least-squares slope/intercept from exact moments. Every moment is an
# exact integer/decimal sum cast to double; the closed form is then a
# fixed sequence of IEEE double ops — identical on any engine. The
# built-in regr_slope is NOT used: it accumulates doubles in partial-
# aggregation order, which differs run to run.
@query(
    "regr_price_trend_by_brand",
    oracle="""
        WITH m AS (
            SELECT p_brand,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(date_diff('day', DATE '1995-01-01',
                                      CAST(l_shipdate AS DATE)))
                        AS DOUBLE) AS sx,
                   CAST(SUM(date_diff('day', DATE '1995-01-01',
                                      CAST(l_shipdate AS DATE))
                            * date_diff('day', DATE '1995-01-01',
                                        CAST(l_shipdate AS DATE)))
                        AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)))
                        AS DOUBLE) AS sy,
                   CAST(SUM(CAST(date_diff('day', DATE '1995-01-01',
                                           CAST(l_shipdate AS DATE))
                                 AS DECIMAL(10,0))
                            * CAST(l_extendedprice AS DECIMAL(15,2)))
                        AS DOUBLE) AS sxy
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        )
        SELECT p_brand, CAST(n AS BIGINT) AS n_items,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                   AS slope_per_day,
               round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                          * sx) / n, 6) AS intercept
        FROM m
        ORDER BY p_brand
    """,
    description="Per-brand least-squares price trend (slope per day, "
    "intercept at 1995-01-01) from exact moments: integer day offsets "
    "and DECIMAL(15,2) prices summed exactly, closed-form slope "
    "evaluated in a fixed double-op order. One fact-table aggregation "
    "after a broadcast part join; no window, no second pass.",
)
def regr_price_trend_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    x = F.datediff(F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date"))
    m = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(x * x).cast("double").alias("sxx"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sy"),
            F.sum(x.cast("decimal(10,0)") * dec("l_extendedprice"))
            .cast("double")
            .alias("sxy"),
        )
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "p_brand",
        F.col("n").cast("bigint").alias("n_items"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    ).orderBy("p_brand")


@query(
    "outliers_mad_orders",
    oracle="""
        WITH med AS (
            SELECT o_orderpriority,
                   quantile_cont(o_totalprice, 0.5) AS med
            FROM orders GROUP BY o_orderpriority
        ), dev AS (
            SELECT o.o_orderpriority, m.med,
                   abs(o.o_totalprice - m.med) AS dev
            FROM orders o JOIN med m USING (o_orderpriority)
        ), mad AS (
            SELECT o_orderpriority, quantile_cont(dev, 0.5) AS mad
            FROM dev GROUP BY o_orderpriority
        )
        SELECT d.o_orderpriority,
               COUNT(*) AS n_orders,
               round(MIN(d.med), 6) AS median_price,
               round(MIN(a.mad), 6) AS mad,
               CAST(SUM(CASE WHEN d.dev > 3 * a.mad THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM dev d JOIN mad a USING (o_orderpriority)
        GROUP BY d.o_orderpriority
        ORDER BY d.o_orderpriority
    """,
    description="Robust outlier detection per order priority: median "
    "and MAD (median absolute deviation) via exact interpolated "
    "percentiles, outlier = deviation > 3*MAD. Three passes with the "
    "tiny per-group medians broadcast back — deviations are exact "
    "double subtractions, so the flags are engine-identical.",
)
def outliers_mad_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    med = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    dev = orders.join(F.broadcast(med), "o_orderpriority").withColumn(
        "dev", F.abs(F.col("o_totalprice") - F.col("med"))
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("med"), 6).alias("median_price"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "profile_orders_audit",
    oracle="""
        SELECT * FROM (
            SELECT 'o_custkey' AS "column", COUNT(*) AS n_rows,
                   COUNT(*) FILTER (o_custkey IS NULL) AS n_nulls,
                   COUNT(DISTINCT o_custkey) AS n_distinct,
                   CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
                   CAST(MAX(o_custkey) AS VARCHAR) AS max_value
            FROM orders
            UNION ALL
            SELECT 'o_orderdate', COUNT(*),
                   COUNT(*) FILTER (o_orderdate IS NULL),
                   COUNT(DISTINCT o_orderdate),
                   strftime(MIN(o_orderdate), '%Y-%m-%d'),
                   strftime(MAX(o_orderdate), '%Y-%m-%d')
            FROM orders
            UNION ALL
            SELECT 'o_orderpriority', COUNT(*),
                   COUNT(*) FILTER (o_orderpriority IS NULL),
                   COUNT(DISTINCT o_orderpriority),
                   MIN(o_orderpriority), MAX(o_orderpriority)
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', COUNT(*),
                   COUNT(*) FILTER (o_orderstatus IS NULL),
                   COUNT(DISTINCT o_orderstatus),
                   MIN(o_orderstatus), MAX(o_orderstatus)
            FROM orders
            UNION ALL
            SELECT 'o_totalprice', COUNT(*),
                   COUNT(*) FILTER (o_totalprice IS NULL),
                   COUNT(DISTINCT o_totalprice),
                   CAST(CAST(MIN(o_totalprice) AS DECIMAL(15,2)) AS VARCHAR),
                   CAST(CAST(MAX(o_totalprice) AS DECIMAL(15,2)) AS VARCHAR)
            FROM orders
        ) ORDER BY "column"
    """,
    description="One-scan column profiler over orders "
    "(operators/profile.py): per column the row/null/distinct counts "
    "and min/max rendered as engine-portable strings (doubles via "
    "DECIMAL(15,2), timestamps at date precision). The audit pass a "
    "training-data pipeline runs before and after heavy transforms.",
)
def profile_orders_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(
        orders,
        ["o_custkey", "o_orderdate", "o_orderpriority", "o_orderstatus", "o_totalprice"],
    )


@query(
    "text_pmi_bigrams",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS t
            FROM documents
        ), bi AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(t) - 1),
                       i -> struct_pack(w1 := t[i], w2 := t[i + 1])
                   )) AS b
            FROM toks
        ), bigrams AS (
            SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*) AS n_xy
            FROM bi GROUP BY 1, 2
        ), uni AS (
            SELECT u.tok AS w, COUNT(*) AS n_w
            FROM toks, unnest(t) AS u(tok)
            GROUP BY 1
        ), total AS (
            SELECT CAST(SUM(n_w) AS BIGINT) AS n_total FROM uni
        )
        SELECT w1, w2, n_xy,
               round(CAST(n_xy * n_total AS DOUBLE)
                     / CAST(ua.n_w * ub.n_w AS DOUBLE), 6) AS lift
        FROM bigrams
        JOIN uni ua ON w1 = ua.w
        JOIN uni ub ON w2 = ub.w
        CROSS JOIN total
        WHERE n_xy >= 5
        ORDER BY lift DESC, w1, w2
        LIMIT 15
    """,
    description="Bigram collocations by rational PMI lift "
    "n_xy*N/(n_x*n_y) — the exact integer inside of pointwise mutual "
    "information (the log is monotone, so the ranking is PMI's; "
    "transcendentals stay out of oracle arithmetic). Shape at scale: "
    "one tokenize pass feeding bigram and unigram aggregations, two "
    "vocabulary-keyed joins, a 1-row total broadcast, global top-15.",
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
    )
    # bigram structs from the materialized token array (attribute
    # reference only inside the lambda — see shingles_from_tokens's
    # performance contract). sequence(1, 0) would DESCEND in Spark, so
    # short docs are guarded to an empty array.
    bi = toks.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i).alias("w1"),
                        F.element_at(F.col("t"), i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("b")
    )
    bigrams = bi.groupBy(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")).agg(
        F.count(F.lit(1)).alias("n_xy")
    )
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    total = uni.agg(F.sum("n_w").cast("bigint").alias("n_total"))
    ua = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    ub = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    return (
        bigrams.filter(F.col("n_xy") >= 5)
        .join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_xy",
            F.round(
                (F.col("n_xy") * F.col("n_total")).cast("double")
                / (F.col("n_w1") * F.col("n_w2")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(15)
    )


@query(
    "quality_decile_buckets",
    oracle="""
        WITH cuts AS (
            SELECT quantile_cont(n_chars, [0.1, 0.2, 0.3, 0.4, 0.5,
                                           0.6, 0.7, 0.8, 0.9]) AS c
            FROM documents
        )
        SELECT len(list_filter(c, x -> d.n_chars > x)) + 1 AS decile,
               COUNT(*) AS n_docs,
               MIN(d.n_chars) AS min_chars,
               MAX(d.n_chars) AS max_chars,
               round(CAST(SUM(d.n_chars) AS DOUBLE) / COUNT(*), 6)
                   AS avg_chars,
               COUNT(DISTINCT d.lang) AS n_langs
        FROM documents d CROSS JOIN cuts
        GROUP BY decile
        ORDER BY decile
    """,
    description="Length-decile bucketing of the document corpus via "
    "exact percentile CUTPOINTS broadcast to every row — not a global "
    "ntile() (whose single-partition sort is the thing that dies at "
    "100 TB). Buckets are boundary-inclusive on the left (strictly-"
    "greater comparison against each cutpoint), identical in both "
    "engines; per-decile doc counts, char ranges, exact avg, and "
    "language spread.",
)
def quality_decile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cuts = docs.agg(
        F.expr(
            "percentile(n_chars, array(0.1D,0.2D,0.3D,0.4D,0.5D,"
            "0.6D,0.7D,0.8D,0.9D))"
        ).alias("c")
    )
    decile = (
        F.size(F.filter(F.col("c"), lambda x: F.col("n_chars") > x)) + 1
    ).alias("decile")
    return (
        docs.crossJoin(F.broadcast(cuts))
        .groupBy(decile)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("decile")
    )
