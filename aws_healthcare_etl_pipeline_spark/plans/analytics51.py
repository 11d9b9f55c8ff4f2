"""Wave-77 (round 5): rank statistics without global sorts + market
concentration.

* ``stat_kruskal_wallis_ranksums`` — the Kruskal-Wallis sufficient
  statistics (per-group midrank sums over the pooled sample) computed
  WITHOUT a global sort: quantize to cents, build the value histogram
  once, and apply the midrank identity 2*R_j = sum_v h_j(v) *
  (2*C(v-1) + h(v) + 1) — doubled rank sums are exact integers, and
  the deviation from the null expectation n_j*(N+1) is reported by
  integer cross-multiplication. The nonparametric ANOVA's engine
  room, reduced to two partial-agg shuffles.
* ``market_concentration_cr4`` — CR4 concentration ratio per part
  type: the top-4 suppliers' revenue share in integer permille, with
  supplier count and a >50% concentration flag — the antitrust-style
  sibling of the repo's HHI query, exercising per-group top-k via
  WindowGroupLimit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.cumsum import distributed_running_total
from ..sources.tables import load_table
from .registry import query

# ------------------------------------------- Kruskal-Wallis rank sums


@query(
    "stat_kruskal_wallis_ranksums",
    oracle="""
        WITH x AS (
            SELECT l_returnflag AS g,
                   CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v
            FROM lineitem
        ), hist AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS h FROM x GROUP BY v
        ), cum AS (
            SELECT v, h,
                   CAST(COALESCE(SUM(h) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS c_before
            FROM hist
        ), gh AS (
            SELECT g, v, CAST(COUNT(*) AS BIGINT) AS hj
            FROM x GROUP BY g, v
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM x
        )
        SELECT gh.g AS grp,
               CAST(SUM(gh.hj) AS BIGINT) AS n_j,
               CAST(SUM(gh.hj * (2 * c.c_before + c.h + 1)) AS BIGINT)
                   AS rank_sum_x2,
               CAST(SUM(gh.hj) * (t.n + 1) AS BIGINT) AS expected_x2,
               CAST(SUM(gh.hj * (2 * c.c_before + c.h + 1))
                    - SUM(gh.hj) * (t.n + 1) AS BIGINT) AS deviation_x2
        FROM gh JOIN cum c ON c.v = gh.v CROSS JOIN tot t
        GROUP BY gh.g, t.n ORDER BY grp
    """,
    description="Kruskal-Wallis sufficient statistics without a "
    "global sort: prices quantize to cents, ONE value histogram is "
    "built (groupBy value — a partial-agg shuffle, not a sort), and "
    "per-group doubled midrank sums come from the identity 2*R_j = "
    "sum_v h_j(v)*(2*C(v-1) + h(v) + 1), exact integers including "
    "ties; the null deviation vs n_j*(N+1) is integer too. This is "
    "how you run the nonparametric ANOVA on 100 TB: the pooled "
    "ranking that textbooks describe as 'sort everything together' "
    "becomes histogram algebra — the spine prefix uses the two-level "
    "carry decomposition (no unpartitioned window even over the "
    "distinct-value spine), and every fact-scale pass is a partial "
    "aggregation.",
)
def stat_kruskal_wallis_ranksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        (F.col("l_extendedprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("v"),
    )
    hist = line.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("h"))
    # prefix over the distinct-value spine via the two-level carry
    # decomposition (the spine grows with the price domain, so no
    # unpartitioned window here)
    cum = distributed_running_total(
        hist.withColumn("vb", F.expr("v div 1048576")),
        F.col("h"),
        "vb",
        ["v"],
        out_col="c_incl",
        zero=F.lit(0).cast("bigint"),
    ).withColumn("c_before", (F.col("c_incl") - F.col("h")).cast("long"))
    gh = line.groupBy("g", "v").agg(
        F.count(F.lit(1)).cast("long").alias("hj")
    )
    tot = line.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        gh.join(cum, "v")
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("g").alias("grp"), "n")
        .agg(
            F.sum("hj").cast("long").alias("n_j"),
            F.sum(
                F.col("hj") * (2 * F.col("c_before") + F.col("h") + 1)
            )
            .cast("long")
            .alias("rank_sum_x2"),
        )
        .select(
            "grp",
            "n_j",
            "rank_sum_x2",
            (F.col("n_j") * (F.col("n") + 1))
            .cast("long")
            .alias("expected_x2"),
            (F.col("rank_sum_x2") - F.col("n_j") * (F.col("n") + 1))
            .cast("long")
            .alias("deviation_x2"),
        )
        .orderBy("grp")
    )


# ------------------------------------------------ CR4 concentration


@query(
    "market_concentration_cr4",
    oracle="""
        WITH rev AS (
            SELECT p.p_type AS t, l.l_suppkey AS s,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS cents
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1, 2
        ), ranked AS (
            SELECT t, cents,
                   ROW_NUMBER() OVER (PARTITION BY t
                       ORDER BY cents DESC, s) AS rk
            FROM rev
        )
        SELECT t AS part_type,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(SUM(CASE WHEN rk <= 4 THEN cents ELSE 0 END) AS BIGINT)
                   AS top4_cents,
               CAST((SUM(CASE WHEN rk <= 4 THEN cents ELSE 0 END) * 1000)
                    // SUM(cents) AS BIGINT) AS cr4_permille,
               (2 * SUM(CASE WHEN rk <= 4 THEN cents ELSE 0 END))
                   > SUM(cents) AS concentrated
        FROM ranked GROUP BY t ORDER BY part_type
    """,
    description="CR4 market-concentration ratio per part type: the "
    "top-4 suppliers' revenue share in integer permille (exact cents, "
    "deterministic rank tie-break) with a >50% concentration flag via "
    "integer cross-multiplication — the antitrust/supply-risk sibling "
    "of the HHI query. At 100 TB: one partial-agg shuffle to "
    "(type, supplier) revenue, and the per-type rank is a "
    "WindowGroupLimit-prefilterable top-k over bounded supplier "
    "groups — no global ordering.",
)
def market_concentration_cr4(spark: SparkSession, sf_dir: str) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        line.join(F.broadcast(part), part["p_partkey"] == line["l_partkey"])
        .groupBy(F.col("p_type").alias("t"), F.col("l_suppkey").alias("s"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(15,2)") * 100)
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("t").orderBy(F.desc("cents"), "s")
    ranked = rev.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy(F.col("t").alias("part_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.sum(F.when(F.col("rk") <= 4, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("top4_cents"),
        )
        .select(
            "part_type",
            "n_suppliers",
            "total_cents",
            "top4_cents",
            F.expr("(top4_cents * 1000) div total_cents")
            .cast("long")
            .alias("cr4_permille"),
            (2 * F.col("top4_cents") > F.col("total_cents")).alias(
                "concentrated"
            ),
        )
        .orderBy("part_type")
    )
