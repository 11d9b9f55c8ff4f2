"""Wave-158 (round 5): the decision-science capstone.

``ml_capstone_nb_threshold_fairness`` chains three proven lanes
under ONE oracle:

1. TRAIN the float-free Naive Bayes of wave 146 (temporal split,
   Laplace smoothing) — but emit the cross-multiplied posterior
   MARGIN lhs - rhs as an integer score per test row, scaled by
   div 1e15 so the ~1e30 DECIMAL(38) products land in BIGINT
   (threshold 0 recovers the wave-146 argmax up to quantization).
2. SWEEP the cost-optimal threshold of wave 142 over every distinct
   score (FN costs 5x FP): label-split histogram, exclusive prefix
   sums via the two-level running-total operator, the portable
   min-cost / min-threshold argmin.
3. AUDIT equalized odds of wave 141 at the CHOSEN threshold: per
   market segment TPR/FPR in permille, max-minus-min gaps emitted.

The capstone is the deployment decision every ML system actually
makes — model, operating point, fairness check — computed bit-exact
end to end, with the oracle replaying all three stages in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cumsum import distributed_running_total
from ..sources.tables import load_table
from .registry import query

_CAP_SPLIT = "1998-01-01"
_CAP_URGENT = "1-URGENT"
_CAP_C_FP = 1
_CAP_C_FN = 5
_CAP_SCALE = 10**15  # margin div: keeps ~1e30 products in BIGINT


@query(
    "ml_capstone_nb_threshold_fairness",
    oracle=f"""
        WITH rows_all AS (
            SELECT CASE WHEN o.o_orderpriority = '{_CAP_URGENT}'
                        THEN 1 ELSE 0 END AS y,
                   c.c_mktsegment AS f1,
                   EXTRACT(month FROM o.o_orderdate) AS f2,
                   CASE WHEN o.o_orderdate < DATE '{_CAP_SPLIT}'
                        THEN 1 ELSE 0 END AS is_train
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
        ), cls AS (
            SELECT CAST(SUM(y) AS BIGINT) AS n1,
                   CAST(SUM(1 - y) AS BIGINT) AS n0
            FROM rows_all WHERE is_train = 1
        ), vf AS (
            SELECT CAST(COUNT(DISTINCT f1) AS BIGINT) AS v1,
                   CAST(COUNT(DISTINCT f2) AS BIGINT) AS v2
            FROM rows_all WHERE is_train = 1
        ), cf1 AS (
            SELECT f1, CAST(SUM(y) AS BIGINT) AS a1,
                   CAST(SUM(1 - y) AS BIGINT) AS a0
            FROM rows_all WHERE is_train = 1 GROUP BY f1
        ), cf2 AS (
            SELECT f2, CAST(SUM(y) AS BIGINT) AS b1,
                   CAST(SUM(1 - y) AS BIGINT) AS b0
            FROM rows_all WHERE is_train = 1 GROUP BY f2
        ), scored AS (
            SELECT t.y, t.f1 AS seg,
                   CAST((CAST(c.n1 AS HUGEINT)
                        * (COALESCE(cf1.a1, 0) + 1)
                        * (COALESCE(cf2.b1, 0) + 1)
                        * (c.n0 + v.v1) * (c.n0 + v.v2)
                        - CAST(c.n0 AS HUGEINT)
                        * (COALESCE(cf1.a0, 0) + 1)
                        * (COALESCE(cf2.b0, 0) + 1)
                        * (c.n1 + v.v1) * (c.n1 + v.v2))
                        // {_CAP_SCALE} AS BIGINT) AS score
            FROM rows_all t
            CROSS JOIN cls c CROSS JOIN vf v
            LEFT JOIN cf1 ON cf1.f1 = t.f1
            LEFT JOIN cf2 ON cf2.f2 = t.f2
            WHERE t.is_train = 0
        ), hist AS (
            SELECT score AS v,
                   CAST(SUM(y) AS BIGINT) AS p_v,
                   CAST(SUM(1 - y) AS BIGINT) AS n_v
            FROM scored GROUP BY score
        ), cum AS (
            SELECT v, p_v, n_v,
                   CAST(SUM(p_v) OVER w - p_v AS BIGINT) AS cp_excl,
                   CAST(SUM(n_v) OVER w - n_v AS BIGINT) AS cn_excl
            FROM hist
            WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ), tot AS (
            SELECT CAST(SUM(p_v) AS BIGINT) AS p,
                   CAST(SUM(n_v) AS BIGINT) AS n FROM hist
        ), costs AS (
            SELECT c.v,
                   CAST({_CAP_C_FP} * (t.n - c.cn_excl)
                        + {_CAP_C_FN} * c.cp_excl AS BIGINT) AS cost
            FROM cum c CROSS JOIN tot t
        ), best AS (
            SELECT MIN(cost) AS min_cost FROM costs
        ), thr AS (
            SELECT (SELECT MIN(v) FROM costs, best
                    WHERE cost = min_cost) AS tstar,
                   b.min_cost
            FROM best b
        ), conf AS (
            SELECT CAST(SUM(CASE WHEN score >= tstar AND y = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN score >= tstar AND y = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                   CAST(SUM(CASE WHEN score < tstar AND y = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS tn,
                   CAST(SUM(CASE WHEN score < tstar AND y = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS fn
            FROM scored, thr
        ), per_seg AS (
            SELECT seg,
                   SUM(CASE WHEN score >= tstar AND y = 1
                       THEN 1 ELSE 0 END) AS tp,
                   SUM(CASE WHEN score < tstar AND y = 1
                       THEN 1 ELSE 0 END) AS fn,
                   SUM(CASE WHEN score >= tstar AND y = 0
                       THEN 1 ELSE 0 END) AS fp,
                   SUM(CASE WHEN score < tstar AND y = 0
                       THEN 1 ELSE 0 END) AS tn
            FROM scored, thr GROUP BY seg
        ), rates AS (
            SELECT seg,
                   CASE WHEN tp + fn > 0
                        THEN tp * 1000 // (tp + fn) END AS tpr,
                   CASE WHEN fp + tn > 0
                        THEN fp * 1000 // (fp + tn) END AS fpr
            FROM per_seg
        ), gaps AS (
            SELECT CAST(MAX(tpr) - MIN(tpr) AS BIGINT)
                       AS tpr_gap_permille,
                   CAST(MAX(fpr) - MIN(fpr) AS BIGINT)
                       AS fpr_gap_permille,
                   CAST(COUNT(*) AS BIGINT) AS n_segments
            FROM rates
        )
        SELECT t.tstar AS threshold_scaled,
               CAST(t.min_cost AS BIGINT) AS total_cost,
               c.tp, c.fp, c.tn, c.fn,
               g.tpr_gap_permille, g.fpr_gap_permille, g.n_segments
        FROM thr t CROSS JOIN conf c CROSS JOIN gaps g
    """,
    description="The deployment decision end to end, bit-exact: "
    "(1) train the float-free Naive Bayes (wave-146 machinery) and "
    "emit each test row's cross-multiplied posterior MARGIN as an "
    "integer score (div 1e15 keeps the ~1e30 DECIMAL(38) products "
    "in BIGINT; threshold 0 recovers the argmax); (2) sweep the "
    "cost-optimal threshold (FN = 5x FP) over every distinct score "
    "with the label-split histogram and two-level exclusive prefix "
    "sums; (3) audit equalized odds at the CHOSEN threshold — per-"
    "segment TPR/FPR permille, max-minus-min gaps. Model, operating "
    "point, fairness check: the three stages every ML deployment "
    "runs, composed under ONE oracle. 100 TB shape: one orders x "
    "customer join feeds train counts (broadcast model tables), "
    "one scoring pass, one histogram shuffle with bounded-spine "
    "carries, two bounded aggregations at the threshold.",
)
def ml_capstone_nb_threshold_fairness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rows_all = (
        orders.join(customer, customer.c_custkey == orders.o_custkey)
        .select(
            F.when(F.col("o_orderpriority") == _CAP_URGENT, 1)
            .otherwise(0)
            .alias("y"),
            F.col("c_mktsegment").alias("f1"),
            F.month("o_orderdate").alias("f2"),
            F.when(
                F.col("o_orderdate") < F.lit(_CAP_SPLIT).cast("date"),
                1,
            )
            .otherwise(0)
            .alias("is_train"),
        )
        .localCheckpoint(eager=False)  # feeds 4 model aggs + scoring
    )
    train = rows_all.where(F.col("is_train") == 1)
    cls = train.agg(
        F.sum("y").cast("long").alias("n1"),
        F.sum(1 - F.col("y")).cast("long").alias("n0"),
    )
    vf = train.agg(
        F.countDistinct("f1").cast("long").alias("v1"),
        F.countDistinct("f2").cast("long").alias("v2"),
    )
    cf1 = train.groupBy("f1").agg(
        F.sum("y").cast("long").alias("a1"),
        F.sum(1 - F.col("y")).cast("long").alias("a0"),
    )
    cf2 = train.groupBy("f2").agg(
        F.sum("y").cast("long").alias("b1"),
        F.sum(1 - F.col("y")).cast("long").alias("b0"),
    )
    scored = (
        rows_all.where(F.col("is_train") == 0)
        .crossJoin(F.broadcast(cls))
        .crossJoin(F.broadcast(vf))
        .join(F.broadcast(cf1), "f1", "left")
        .join(F.broadcast(cf2), "f2", "left")
        .select(
            "y",
            F.col("f1").alias("seg"),
            F.expr(
                f"CAST((CAST(n1 AS DECIMAL(38,0))"
                f" * (COALESCE(a1, 0) + 1)"
                f" * (COALESCE(b1, 0) + 1)"
                f" * (n0 + v1) * (n0 + v2)"
                f" - CAST(n0 AS DECIMAL(38,0))"
                f" * (COALESCE(a0, 0) + 1)"
                f" * (COALESCE(b0, 0) + 1)"
                f" * (n1 + v1) * (n1 + v2))"
                f" div {_CAP_SCALE} AS BIGINT)"
            ).alias("score"),
        )
        .localCheckpoint(eager=False)  # feeds hist + conf + per_seg
    )
    hist = scored.groupBy(F.col("score").alias("v")).agg(
        F.sum("y").cast("long").alias("p_v"),
        F.sum(1 - F.col("y")).cast("long").alias("n_v"),
    )
    cum0 = distributed_running_total(
        hist.withColumn("vb", F.expr("v div 1048576")),
        F.col("p_v"),
        "vb",
        ["v"],
        out_col="cp_incl",
        zero=F.lit(0).cast("bigint"),
    )
    cum = distributed_running_total(
        cum0,
        F.col("n_v"),
        "vb",
        ["v"],
        out_col="cn_incl",
        zero=F.lit(0).cast("bigint"),
    ).select(
        "v",
        (F.col("cp_incl") - F.col("p_v")).alias("cp_excl"),
        (F.col("cn_incl") - F.col("n_v")).alias("cn_excl"),
    )
    tot = hist.agg(
        F.sum("p_v").cast("long").alias("p"),
        F.sum("n_v").cast("long").alias("n"),
    )
    costs = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        (
            _CAP_C_FP * (F.col("n") - F.col("cn_excl"))
            + _CAP_C_FN * F.col("cp_excl")
        )
        .cast("long")
        .alias("cost"),
    )
    best = costs.agg(F.min("cost").alias("min_cost"))
    thr = (
        costs.crossJoin(F.broadcast(best))
        .where(F.col("cost") == F.col("min_cost"))
        .agg(
            F.min("v").alias("tstar"),
            F.min("min_cost").alias("min_cost"),
        )
    )
    at = scored.crossJoin(F.broadcast(thr))
    conf = at.agg(
        F.sum(
            F.when((F.col("score") >= F.col("tstar")) & (F.col("y") == 1), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("tp"),
        F.sum(
            F.when((F.col("score") >= F.col("tstar")) & (F.col("y") == 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("fp"),
        F.sum(
            F.when((F.col("score") < F.col("tstar")) & (F.col("y") == 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("tn"),
        F.sum(
            F.when((F.col("score") < F.col("tstar")) & (F.col("y") == 1), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("fn"),
    )
    per_seg = at.groupBy("seg").agg(
        F.sum(
            F.when((F.col("score") >= F.col("tstar")) & (F.col("y") == 1), 1)
            .otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when((F.col("score") < F.col("tstar")) & (F.col("y") == 1), 1)
            .otherwise(0)
        ).alias("fn"),
        F.sum(
            F.when((F.col("score") >= F.col("tstar")) & (F.col("y") == 0), 1)
            .otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when((F.col("score") < F.col("tstar")) & (F.col("y") == 0), 1)
            .otherwise(0)
        ).alias("tn"),
    )
    rates = per_seg.select(
        F.expr(
            "CASE WHEN tp + fn > 0 THEN tp * 1000 div (tp + fn) END"
        ).alias("tpr"),
        F.expr(
            "CASE WHEN fp + tn > 0 THEN fp * 1000 div (fp + tn) END"
        ).alias("fpr"),
    )
    gaps = rates.agg(
        (F.max("tpr") - F.min("tpr"))
        .cast("long")
        .alias("tpr_gap_permille"),
        (F.max("fpr") - F.min("fpr"))
        .cast("long")
        .alias("fpr_gap_permille"),
        F.count(F.lit(1)).cast("long").alias("n_segments"),
    )
    return (
        thr.crossJoin(F.broadcast(conf))
        .crossJoin(F.broadcast(gaps))
        .select(
            F.col("tstar").alias("threshold_scaled"),
            F.col("min_cost").cast("long").alias("total_cost"),
            "tp",
            "fp",
            "tn",
            "fn",
            "tpr_gap_permille",
            "fpr_gap_permille",
            "n_segments",
        )
    )
