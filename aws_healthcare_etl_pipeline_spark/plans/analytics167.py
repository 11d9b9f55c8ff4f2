"""Wave-193 (round 5): counting-sort quantiles + explode semantics.

* ``inventory_demand_quantiles_counting`` — per-part demand
  quantiles WITHOUT any sort: daily demand lands in a bounded value
  domain (capped at 100 units), so per-part p50/p95 are exact
  counting-sort quantiles — a (part, quantity) count table plus a
  per-part cumulative over <= 100 rows. This is THE pattern for
  grouped quantiles at 100 TB whenever the value domain is bounded
  (ratings, quantities, latencies in ms buckets): no per-group
  sort, no sketch, exact answers. Output: the p95 histogram across
  parts.

* ``sql_explode_outer_battery`` — explode vs explode_outer on a
  three-way planted mix (empty array / NULL array / real tokens):
  Spark runs the real operators; the oracle states the closed-form
  row arithmetic (inner = sum of lengths; outer = empty and NULL
  each contribute ONE null-payload row). The hash match pins the
  lateral-join semantics both engines promise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import query

_IDQ_CAP = 100


@query(
    "inventory_demand_quantiles_counting",
    oracle=f"""
        WITH daily AS (
            SELECT l_partkey AS pk,
                   LEAST(CAST(SUM(CAST(l_quantity AS BIGINT))
                              AS BIGINT), {_IDQ_CAP}) AS q
            FROM lineitem
            GROUP BY l_partkey, CAST(l_shipdate AS DATE)
        ), counts AS (
            SELECT pk, q, CAST(COUNT(*) AS BIGINT) AS c
            FROM daily GROUP BY pk, q
        ), cum AS (
            SELECT pk, q, c,
                   SUM(c) OVER (PARTITION BY pk ORDER BY q
                       ROWS BETWEEN UNBOUNDED PRECEDING AND
                       CURRENT ROW) AS cc,
                   SUM(c) OVER (PARTITION BY pk) AS n
            FROM counts
        ), quants AS (
            SELECT pk,
                   MIN(CASE WHEN cc >= (n + 1) // 2 THEN q END)
                       AS p50,
                   MIN(CASE WHEN cc >= (95 * n) // 100 + 1 THEN q
                       END) AS p95
            FROM cum GROUP BY pk
        )
        SELECT CAST(COALESCE(p95, {_IDQ_CAP}) AS BIGINT)
                   AS p95_demand,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(p50) AS BIGINT) AS p50_mass
        FROM quants
        GROUP BY 1
        ORDER BY 1
    """,
    description="Per-part demand quantiles with NO sort anywhere: "
    "daily demand is capped into a bounded value domain (<= 100 "
    "units, the cap documented), so exact p50/p95 per part are "
    "counting-sort quantiles — a (part, quantity) count table plus "
    "a per-part cumulative over at most 100 rows and a rank rule "
    "(min q with cumcount >= target). THE grouped-quantile pattern "
    "for 100 TB whenever values are bounded (ratings, quantities, "
    "bucketed latencies): per-group sorts and sketches both lose to "
    "counting. Output: p95 histogram across parts with p50 mass. "
    "100 TB shape: two partial-agg shuffles on (part, day) then "
    "(part, q), partitioned mini-windows, bounded output.",
)
def inventory_demand_quantiles_counting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.col("l_shipdate").cast("date").alias("d"),
    ).agg(
        F.expr(
            f"LEAST(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT),"
            f" {_IDQ_CAP})"
        ).alias("q")
    )
    counts = daily.groupBy("pk", "q").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wq = Window.partitionBy("pk").orderBy("q")
    cum = counts.select(
        "pk",
        "q",
        F.sum("c")
        .over(wq.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cc"),
        F.sum("c").over(Window.partitionBy("pk")).alias("n"),
    )
    quants = cum.groupBy("pk").agg(
        F.min(
            F.when(F.expr("cc >= (n + 1) div 2"), F.col("q"))
        ).alias("p50"),
        F.min(
            F.when(F.expr("cc >= (95 * n) div 100 + 1"), F.col("q"))
        ).alias("p95"),
    )
    return (
        quants.groupBy(
            F.expr(
                f"CAST(COALESCE(p95, {_IDQ_CAP}) AS BIGINT)"
            ).alias("p95_demand")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("p50").cast("long").alias("p50_mass"),
        )
        .orderBy("p95_demand")
    )


@query(
    "sql_explode_outer_battery",
    oracle=r"""
        WITH arrs AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0
                        THEN CAST([] AS VARCHAR[])
                        WHEN doc_id % 3 = 1 THEN NULL
                        ELSE regexp_split_to_array(trim(text), '\s+')
                        END AS arr
            FROM documents
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN arr IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS null_arrays,
               CAST(SUM(CASE WHEN arr IS NOT NULL AND len(arr) = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS empty_arrays,
               CAST(SUM(COALESCE(len(arr), 0)) AS BIGINT)
                   AS inner_rows,
               CAST(SUM(CASE WHEN arr IS NULL OR len(arr) = 0
                        THEN 1 ELSE len(arr) END) AS BIGINT)
                   AS outer_rows,
               CAST(SUM(CASE WHEN arr IS NULL OR len(arr) = 0
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS null_payload_rows
        FROM arrs
    """,
    description="explode vs explode_outer, pinned on a planted "
    "three-way mix (every third document's token array is emptied, "
    "every third-plus-one is NULLed, the rest keep their tokens): "
    "the Spark side runs the REAL operators and counts their output "
    "rows; the oracle states the closed-form lateral-join law — "
    "inner explode drops empty and NULL arrays entirely, outer "
    "explode emits exactly one null-payload row for each. The hash "
    "match is the cross-engine proof of the semantics every "
    "flatten-the-JSON pipeline silently relies on. 100 TB shape: "
    "one narrow pass; the battery exists so the law is tested, not "
    "remembered.",
)
def sql_explode_outer_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    arrs = docs.selectExpr(
        "doc_id",
        "CASE WHEN doc_id % 3 = 0 THEN array()"
        " WHEN doc_id % 3 = 1 THEN NULL"
        " ELSE split(trim(text), '\\\\s+') END AS arr",
    ).localCheckpoint(eager=False)  # stats + two explode lanes
    stats = arrs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("arr").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_arrays"),
        F.sum(
            F.when(
                F.col("arr").isNotNull() & (F.size("arr") == 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("empty_arrays"),
    )
    inner = arrs.select(
        F.explode("arr").alias("x")
    ).agg(F.count(F.lit(1)).cast("long").alias("inner_rows"))
    outer = arrs.select(
        F.explode_outer("arr").alias("x")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("outer_rows"),
        F.sum(F.when(F.col("x").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_payload_rows"),
    )
    return (
        stats.crossJoin(F.broadcast(inner))
        .crossJoin(F.broadcast(outer))
        .select(
            "n_docs",
            "null_arrays",
            "empty_arrays",
            "inner_rows",
            "outer_rows",
            "null_payload_rows",
        )
    )
