"""Wave-71 (round 5): declarative data contracts + changelog compaction.

* ``quality_expectation_suite`` — a Deequ-style expectation battery
  evaluated in ONE conditional-aggregation pass per table: range,
  enum, non-null, uniqueness, and referential rules each report
  checked/violation counts and a pass verdict. The data-contract
  gate a pipeline runs before promoting a batch.
* ``cdc_log_compaction`` — Kafka-style log compaction of a change
  stream (insert/update/delete ops synthesized deterministically from
  orders): keep each key's latest operation, drop tombstoned keys,
  and report survivor/tombstone/superseded counts plus the exact
  surviving-value checksum — the compaction semantics every
  log-structured table (and deltalite's MERGE) rests on.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ expectation suite


@query(
    "quality_expectation_suite",
    oracle="""
        SELECT 'orders.o_orderdate_in_range' AS rule,
               CAST(COUNT(*) AS BIGINT) AS n_checked,
               CAST(SUM(CASE WHEN o_orderdate < DATE '1992-01-01'
                              OR o_orderdate > DATE '1998-12-31'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
               SUM(CASE WHEN o_orderdate < DATE '1992-01-01'
                         OR o_orderdate > DATE '1998-12-31'
                        THEN 1 ELSE 0 END) = 0 AS passed
        FROM orders
        UNION ALL
        SELECT 'orders.o_orderkey_unique',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
               COUNT(*) = COUNT(DISTINCT o_orderkey)
        FROM orders
        UNION ALL
        SELECT 'orders.o_orderpriority_enum',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderpriority NOT IN
                       ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED',
                        '5-LOW') THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN o_orderpriority NOT IN
                       ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED',
                        '5-LOW') THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'orders.o_totalprice_positive',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN CAST(o_totalprice AS DECIMAL(15,2)) <= 0
                             THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN CAST(o_totalprice AS DECIMAL(15,2)) <= 0
                        THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'orders.o_custkey_referential',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) = 0
        FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
        UNION ALL
        SELECT 'lineitem.l_quantity_in_1_50',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN CAST(l_quantity AS BIGINT) < 1
                              OR CAST(l_quantity AS BIGINT) > 50
                             THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN CAST(l_quantity AS BIGINT) < 1
                         OR CAST(l_quantity AS BIGINT) > 50
                        THEN 1 ELSE 0 END) = 0
        FROM lineitem
        ORDER BY rule
    """,
    description="Declarative data-contract expectation suite (the "
    "Deequ/Great-Expectations gate): date-range, key-uniqueness, "
    "enum-membership, positivity, referential-integrity, and "
    "numeric-range rules, each reporting checked/violation counts "
    "and a pass verdict — evaluated as conditional aggregations so "
    "ALL same-table rules share one scan (uniqueness is the COUNT vs "
    "COUNT DISTINCT identity, referential is one broadcast left "
    "join). The batch-promotion gate in front of every warehouse "
    "load. At 100 TB: two fact scans + one dim broadcast total; the "
    "report is rule-count rows of metadata.",
)
def quality_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    line = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")

    def rule(df, name, viol_col, checked=None):
        return df.agg(
            F.lit(name).alias("rule"),
            (checked if checked is not None else F.count(F.lit(1)))
            .cast("long")
            .alias("n_checked"),
            viol_col.cast("long").alias("n_violations"),
            (viol_col == 0).alias("passed"),
        )

    lo, hi = F.lit("1992-01-01").cast("date"), F.lit("1998-12-31").cast("date")
    rules = [
        rule(
            orders,
            "orders.o_orderdate_in_range",
            F.sum(
                F.when(
                    (F.col("o_orderdate") < lo) | (F.col("o_orderdate") > hi),
                    1,
                ).otherwise(0)
            ),
        ),
        rule(
            orders,
            "orders.o_orderkey_unique",
            F.count(F.lit(1)) - F.countDistinct("o_orderkey"),
        ),
        rule(
            orders,
            "orders.o_orderpriority_enum",
            F.sum(
                F.when(
                    ~F.col("o_orderpriority").isin(
                        "1-URGENT",
                        "2-HIGH",
                        "3-MEDIUM",
                        "4-NOT SPECIFIED",
                        "5-LOW",
                    ),
                    1,
                ).otherwise(0)
            ),
        ),
        rule(
            orders,
            "orders.o_totalprice_positive",
            F.sum(
                F.when(
                    F.col("o_totalprice").cast("decimal(15,2)") <= 0, 1
                ).otherwise(0)
            ),
        ),
        rule(
            orders.join(
                F.broadcast(cust),
                cust["c_custkey"] == orders["o_custkey"],
                "left",
            ),
            "orders.o_custkey_referential",
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)),
        ),
        rule(
            line,
            "lineitem.l_quantity_in_1_50",
            F.sum(
                F.when(
                    (F.col("l_quantity").cast("long") < 1)
                    | (F.col("l_quantity").cast("long") > 50),
                    1,
                ).otherwise(0)
            ),
        ),
    ]
    return reduce(DataFrame.unionByName, rules).orderBy("rule")


# ------------------------------------------------ changelog compaction

# deterministic op synthesis: orderkey mod 10 -> 0 = delete tombstone,
# 1-3 = update (the change stream's final op wins per key)


@query(
    "cdc_log_compaction",
    oracle="""
        WITH log AS (
            SELECT o_custkey AS k,
                   o_orderdate AS d, o_orderkey AS ok,
                   CASE WHEN o_orderkey % 10 = 0 THEN 'delete'
                        WHEN o_orderkey % 10 IN (1, 2, 3) THEN 'update'
                        ELSE 'insert' END AS op,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v
            FROM orders
        ), latest AS (
            SELECT k, op, v FROM (
                SELECT k, op, v,
                       ROW_NUMBER() OVER (PARTITION BY k
                           ORDER BY d DESC, ok DESC) AS rk
                FROM log
            ) WHERE rk = 1
        )
        SELECT CAST((SELECT COUNT(*) FROM log) AS BIGINT) AS log_records,
               CAST(COUNT(*) AS BIGINT) AS distinct_keys,
               CAST(SUM(CASE WHEN op <> 'delete' THEN 1 ELSE 0 END)
                    AS BIGINT) AS survivors,
               CAST(SUM(CASE WHEN op = 'delete' THEN 1 ELSE 0 END)
                    AS BIGINT) AS tombstoned,
               CAST((SELECT COUNT(*) FROM log) - COUNT(*) AS BIGINT)
                   AS superseded,
               CAST(SUM(CASE WHEN op <> 'delete' THEN v ELSE 0 END)
                    AS BIGINT) AS surviving_value_cents
        FROM latest
    """,
    description="Kafka-style changelog compaction: a deterministic "
    "change stream (op = insert/update/delete from order-key "
    "residues, sequenced per customer by date then key) is compacted to each key's LATEST "
    "operation, tombstoned keys drop out, and the report carries "
    "survivor/tombstone/superseded counts plus the exact surviving-"
    "value cents checksum — the semantics every log-structured table "
    "(and deltalite's MERGE/CDC lanes) is built on — keyed per "
    "customer so keys genuinely carry histories — as a one-pass "
    "query: latest-per-key is a per-key window (bounded "
    "group sizes), everything else conditional aggregation. At "
    "100 TB compaction is exactly this shape executed per partition "
    "of the key space — one shuffle on key, no global order.",
)
def cdc_log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    log = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("ok"),
        F.when(F.col("o_orderkey") % 10 == 0, "delete")
        .when((F.col("o_orderkey") % 10).isin(1, 2, 3), "update")
        .otherwise("insert")
        .alias("op"),
        (F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("v"),
    )
    latest = (
        log.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("k").orderBy(F.desc("d"), F.desc("ok"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select("k", "op", "v")
    )
    total = log.agg(F.count(F.lit(1)).cast("long").alias("log_records"))
    return (
        latest.agg(
            F.count(F.lit(1)).cast("long").alias("distinct_keys"),
            F.sum(F.when(F.col("op") != "delete", 1).otherwise(0))
            .cast("long")
            .alias("survivors"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0))
            .cast("long")
            .alias("tombstoned"),
            F.sum(F.when(F.col("op") != "delete", F.col("v")).otherwise(0))
            .cast("long")
            .alias("surviving_value_cents"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "log_records",
            "distinct_keys",
            "survivors",
            "tombstoned",
            (F.col("log_records") - F.col("distinct_keys"))
            .cast("long")
            .alias("superseded"),
            "surviving_value_cents",
        )
    )
