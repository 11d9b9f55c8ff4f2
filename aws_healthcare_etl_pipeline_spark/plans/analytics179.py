"""Wave-205 (round 5): CvM two-sample test + quantile effects.

* ``stats_cramer_von_mises_exact`` — the Cramer-von-Mises companion
  to the repo's exact KS: instead of the max ECDF gap, the SUM of
  squared cross-scaled gaps weighted by pooled multiplicity —
  integer-exact end to end (gaps at scale n1*n2, squares in
  DECIMAL(38)/HUGEINT), with the same two-level running-total
  decomposition on the Spark side and the textbook global window in
  the oracle. CvM sees distribution-body shifts KS's single max
  misses; having both makes the drift gate two-eyed.

* ``causal_quantile_treatment_effect`` — effects that averages hide:
  exact p50 and p90 of order value for two market segments via the
  multi-rank selection operator, with the per-quantile differences —
  the quantile treatment effect that shows WHERE in the distribution
  a segment differs, not just by how much on average.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cumsum import distributed_running_total
from ..operators.selection import kth_smallest_multi
from ..sources.tables import load_table
from .registry import query

_CVM_A = "1-URGENT"
_CVM_B = "5-LOW"
_CVM_BAND = 1_000_000


@query(
    "stats_cramer_von_mises_exact",
    oracle=f"""
        WITH pts AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v,
                   CASE WHEN o_orderpriority = '{_CVM_A}'
                        THEN 1 ELSE 0 END AS in1,
                   CASE WHEN o_orderpriority = '{_CVM_B}'
                        THEN 1 ELSE 0 END AS in2
            FROM orders
            WHERE o_orderpriority IN ('{_CVM_A}', '{_CVM_B}')
        ), grid AS (
            SELECT v, CAST(SUM(in1) AS BIGINT) AS c1,
                   CAST(SUM(in2) AS BIGINT) AS c2
            FROM pts GROUP BY v
        ), cum AS (
            SELECT v, c1, c2,
                   CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS f1,
                   CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS f2
            FROM grid
        ), tot AS (
            SELECT CAST(SUM(in1) AS BIGINT) AS n1,
                   CAST(SUM(in2) AS BIGINT) AS n2
            FROM pts
        ), stat AS (
            SELECT t.n1, t.n2,
                   CAST(SUM(CAST(c1 + c2 AS HUGEINT)
                        * (f1 * t.n2 - f2 * t.n1)
                        * (f1 * t.n2 - f2 * t.n1)) AS HUGEINT)
                       AS t_scaled
            FROM cum CROSS JOIN tot t
            GROUP BY t.n1, t.n2
        )
        SELECT n1, n2,
               CAST(t_scaled AS VARCHAR) AS t_scaled,
               CAST(t_scaled * 1000
                    // (CAST(n1 AS HUGEINT) * n2
                        * (n1 + n2) * (n1 + n2)) AS BIGINT)
                   AS cvm_t_milli
        FROM stat
    """,
    description="Exact two-sample Cramer-von-Mises: at every pooled "
    "distinct order value, the cross-scaled ECDF gap f1*n2 - f2*n1 "
    "is SQUARED and weighted by the pooled multiplicity, summed in "
    "HUGEINT/DECIMAL(38) (products ~1e27 at sf1, under headroom), "
    "and normalized once to the classic T = sum(w*gap^2) / "
    "(n1*n2*N^2) in milli-units. The Spark ECDFs are the two-level "
    "distributed running totals over $10k value bands (the exact-KS "
    "machinery reused); the oracle keeps the textbook global "
    "window, so the hash match re-proves the decomposition under a "
    "new statistic. CvM integrates gaps over the whole body where "
    "KS takes one max — a drift gate needs both eyes. 100 TB "
    "shape: one value-grain agg, bounded-band carries, one "
    "weighted-sum rollup.",
)
def stats_cramer_von_mises_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.filter(
        F.col("o_orderpriority").isin(_CVM_A, _CVM_B)
    ).select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100"
            " AS BIGINT)"
        ).alias("v"),
        (F.col("o_orderpriority") == _CVM_A).cast("int").alias("in1"),
        (F.col("o_orderpriority") == _CVM_B).cast("int").alias("in2"),
    ).localCheckpoint(eager=False)  # grid + totals
    grid = pts.groupBy("v").agg(
        F.sum("in1").cast("bigint").alias("c1"),
        F.sum("in2").cast("bigint").alias("c2"),
    )
    banded = grid.withColumn("band", F.expr(f"v div {_CVM_BAND}"))
    zero = F.lit(0).cast("bigint")
    cum = distributed_running_total(
        banded, F.col("c1"), "band", ["v"], "f1", zero=zero
    )
    cum = distributed_running_total(
        cum, F.col("c2"), "band", ["v"], "f2", zero=zero
    )
    tot = pts.agg(
        F.sum("in1").cast("bigint").alias("n1"),
        F.sum("in2").cast("bigint").alias("n2"),
    )
    stat = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.expr(
                "CAST(SUM(CAST(c1 + c2 AS DECIMAL(38,0))"
                " * (f1 * n2 - f2 * n1)"
                " * (f1 * n2 - f2 * n1)) AS DECIMAL(38,0))"
            ).alias("t_scaled")
        )
    )
    return stat.selectExpr(
        "n1",
        "n2",
        "CAST(t_scaled AS STRING) AS t_scaled",
        "CAST(t_scaled * 1000"
        " div (CAST(n1 AS DECIMAL(38,0)) * n2"
        " * (n1 + n2) * (n1 + n2)) AS BIGINT) AS cvm_t_milli",
    )


_QTE_A = "BUILDING"
_QTE_B = "MACHINERY"


@query(
    "causal_quantile_treatment_effect",
    oracle=f"""
        WITH vals AS (
            SELECT c.c_mktsegment AS seg,
                   CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE c.c_mktsegment IN ('{_QTE_A}', '{_QTE_B}')
        ), ranked AS (
            SELECT seg, v,
                   ROW_NUMBER() OVER (PARTITION BY seg ORDER BY v)
                       AS rnk,
                   COUNT(*) OVER (PARTITION BY seg) AS n
            FROM vals
        ), quants AS (
            SELECT seg,
                   MAX(CASE WHEN rnk = (n + 1) // 2 THEN v END)
                       AS p50,
                   MAX(CASE WHEN rnk = (9 * n) // 10 + 1 THEN v END)
                       AS p90
            FROM ranked GROUP BY seg
        )
        SELECT a.p50 AS p50_{_QTE_A.lower()},
               b.p50 AS p50_{_QTE_B.lower()},
               a.p90 AS p90_{_QTE_A.lower()},
               b.p90 AS p90_{_QTE_B.lower()},
               CAST(b.p50 - a.p50 AS BIGINT) AS qte_p50_cents,
               CAST(b.p90 - a.p90 AS BIGINT) AS qte_p90_cents
        FROM (SELECT * FROM quants WHERE seg = '{_QTE_A}') a
        CROSS JOIN (SELECT * FROM quants WHERE seg = '{_QTE_B}') b
    """,
    description="Quantile treatment effects — the distributional "
    "difference averages hide: exact p50 and p90 of order value for "
    "two market segments via the multi-rank histogram-refinement "
    "selection (both quantiles per segment share the same bounded "
    "refinement passes; no global sort), with per-quantile "
    "differences in cents. A zero median gap with a large p90 gap "
    "means the segments differ only in their tails — precisely what "
    "a mean comparison cannot say. The oracle is the textbook "
    "partitioned window-rank form. 100 TB shape: a handful of "
    "filtered histogram aggs per segment, driver state bounded, "
    "one-row output.",
)
def causal_quantile_treatment_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    vals = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        customer.c_custkey == orders.o_custkey,
    ).selectExpr(
        "c_mktsegment AS seg",
        "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        " AS v",
    )
    out = {}
    for seg in (_QTE_A, _QTE_B):
        sub = vals.where(F.col("seg") == seg).localCheckpoint(
            eager=False
        )
        n = sub.count()
        ks = {(n + 1) // 2, (9 * n) // 10 + 1}
        got = kth_smallest_multi(sub, "v", sorted(ks))
        out[seg] = (got[(n + 1) // 2], got[(9 * n) // 10 + 1])
    a50, a90 = out[_QTE_A]
    b50, b90 = out[_QTE_B]
    return vals.sparkSession.createDataFrame(
        [(a50, b50, a90, b90, b50 - a50, b90 - a90)],
        f"p50_{_QTE_A.lower()} long, p50_{_QTE_B.lower()} long,"
        f" p90_{_QTE_A.lower()} long, p90_{_QTE_B.lower()} long,"
        f" qte_p50_cents long, qte_p90_cents long",
    )
