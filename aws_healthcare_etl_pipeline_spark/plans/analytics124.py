"""Wave-150 (round 5): relational division + ISO-week semantics.

* ``sql_relational_division`` — the textbook FOR-ALL operator:
  suppliers that have shipped EVERY one of the divisor set (the
  three most-shipped parts of Brand#13, deterministically ranked).
  The oracle is the classic double-NOT-EXISTS formulation; the
  Spark side is the scalable count-matching rewrite (semi-join to
  the broadcast divisor, distinct coverage count == divisor
  cardinality — taken from the divisor itself, not a literal, so
  thin fixtures degrade gracefully).  The hash match PROVES the
  count rewrite equivalent to the universal quantifier.
* ``time_iso_week_battery`` — ISO-8601 week/year semantics pinned
  across engines on a bounded 14-year day spine: ISO year vs
  calendar year boundary days (the early-January / late-December
  rows that belong to the other ISO year), Monday counts through
  the ISO day-of-week mapping, and the max-week column that must
  read 53 exactly for the 53-week ISO years in range (1992, 1998,
  2004) — calendar facts both engines must reproduce from their
  own date machinery (Spark extract(YEAROFWEEK/DAYOFWEEK_ISO) +
  weekofyear vs DuckDB isoyear/week/isodow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ relational division

_RD_BRAND = "Brand#13"
_RD_K = 3


@query(
    "sql_relational_division",
    oracle=f"""
        WITH divisor AS MATERIALIZED (
            SELECT p.p_partkey
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand = '{_RD_BRAND}'
            GROUP BY p.p_partkey
            ORDER BY COUNT(*) DESC, p.p_partkey
            LIMIT {_RD_K}
        )
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        WHERE NOT EXISTS (
            SELECT 1 FROM divisor d
            WHERE NOT EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_suppkey = s.s_suppkey
                  AND l.l_partkey = d.p_partkey))
        ORDER BY s.s_suppkey
    """,
    description="Relational division (the FOR-ALL operator): "
    "suppliers that shipped EVERY part in the divisor set — the "
    "three most-shipped Brand#13 parts, deterministically ranked. "
    "The oracle is the textbook double NOT EXISTS; the Spark side "
    "is the scalable count-matching rewrite (distinct coverage "
    "count equals the divisor cardinality, read from the divisor "
    "itself so thin fixtures degrade gracefully) — the hash match "
    "proves the rewrite implements the universal quantifier. "
    "100 TB shape: the divisor is broadcast (K rows), the fact scan "
    "reduces via a semi-join before the distinct, and the coverage "
    "count is one co-partitioned aggregation — no correlated "
    "subquery ever executes per row.",
)
def sql_relational_division(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.desc("cnt"), F.asc("p_partkey"))
    divisor = (
        lineitem.join(
            F.broadcast(part.where(F.col("p_brand") == _RD_BRAND)),
            part.p_partkey == lineitem.l_partkey,
        )
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _RD_K)
        .select("p_partkey")
        .localCheckpoint(eager=False)  # K-row divisor, reused twice
    )
    dcount = divisor.agg(F.count(F.lit(1)).alias("need"))
    coverage = (
        lineitem.join(
            F.broadcast(divisor),
            divisor.p_partkey == lineitem.l_partkey,
        )
        .select("l_suppkey", "l_partkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("got"))
    )
    return (
        coverage.crossJoin(F.broadcast(dcount))
        .where(F.col("got") == F.col("need"))
        .join(
            supplier, supplier.s_suppkey == F.col("l_suppkey")
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ------------------------------------------------ ISO week battery

_ISO_START = "1992-01-01"
_ISO_END = "2005-12-31"


@query(
    "time_iso_week_battery",
    oracle=f"""
        WITH spine AS (
            SELECT UNNEST(generate_series(DATE '{_ISO_START}',
                          DATE '{_ISO_END}',
                          INTERVAL 1 DAY))::DATE AS d
        ), feat AS (
            SELECT d,
                   isoyear(d) AS iso_year,
                   week(d) AS iso_week,
                   isodow(d) AS iso_dow,
                   EXTRACT(year FROM d) AS cal_year
            FROM spine
        )
        SELECT CAST(iso_year AS BIGINT) AS iso_year,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(MAX(iso_week) AS BIGINT) AS n_weeks,
               CAST(SUM(CASE WHEN iso_dow = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_mondays,
               CAST(SUM(CASE WHEN iso_year != cal_year
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_boundary_days,
               MIN(CASE WHEN iso_year != cal_year
                   THEN strftime(d, '%Y-%m-%d') END)
                   AS first_boundary_day
        FROM feat
        GROUP BY iso_year
        ORDER BY iso_year
    """,
    description="ISO-8601 week/year semantics battery on a bounded "
    "14-year day spine: per ISO year the day count, the max week "
    "number (which must read 53 exactly for 1992/1998/2004 — the "
    "53-week ISO years in range), Monday counts through the ISO "
    "day-of-week mapping, and the calendar-vs-ISO boundary-day "
    "census with the first boundary date — the early-January and "
    "late-December rows that belong to the OTHER ISO year, the "
    "classic off-by-a-week reporting bug. Both engines must derive "
    "the same calendar facts from their own date machinery (Spark "
    "extract(YEAROFWEEK / DAYOFWEEK_ISO) + weekofyear vs DuckDB "
    "isoyear/week/isodow). 100 TB shape: a generated constant "
    "spine; at scale the same expressions run scan-side on event "
    "dates with this battery as the semantics pin.",
)
def time_iso_week_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(_ISO_START).cast("date"),
                F.lit(_ISO_END).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("d")
    )
    feat = spine.select(
        "d",
        F.expr("extract(YEAROFWEEK FROM d)").alias("iso_year"),
        F.weekofyear("d").alias("iso_week"),
        F.expr("extract(DAYOFWEEK_ISO FROM d)").alias("iso_dow"),
        F.year("d").alias("cal_year"),
    )
    return (
        feat.groupBy("iso_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.max("iso_week").cast("long").alias("n_weeks"),
            F.sum(F.when(F.col("iso_dow") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_mondays"),
            F.sum(
                F.when(
                    F.col("iso_year") != F.col("cal_year"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_boundary_days"),
            F.min(
                F.when(
                    F.col("iso_year") != F.col("cal_year"),
                    F.date_format("d", "yyyy-MM-dd"),
                )
            ).alias("first_boundary_day"),
        )
        .select(
            F.col("iso_year").cast("long").alias("iso_year"),
            "n_days",
            "n_weeks",
            "n_mondays",
            "n_boundary_days",
            "first_boundary_day",
        )
        .orderBy("iso_year")
    )
