"""Wave-203 (round 5): leakage detection + quarter-end concentration.

* ``ml_leakage_detector_audit`` — the train-time tripwire for
  target leakage: every candidate feature's association with the
  label is scored the same way (point-biserial numerator via exact
  integer moments, quantized permille), and a PLANTED leaky feature
  (constructed from the label itself plus deterministic noise) must
  light up while the legitimate features stay low — the audit
  proves the detector fires, not merely that features exist.

* ``sales_quarter_hockey_stick`` — the quarter-end pull-forward
  index: the share of each quarter's revenue landing in its final
  14 days vs the uniform-time expectation, in permille, per quarter
  and summarized — the sales-ops number that quantifies end-of-
  quarter discount pressure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# feature name -> integer expression over the joined row
_LK_FEATURES = {
    "month_legit": "CAST(month(o_orderdate) AS BIGINT)",
    "value_legit":
        "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        " div 1000000",
    "leaky_planted": "CAST(y * 10 + o_custkey % 7 AS BIGINT)",
}
_LK_FEATURES_DUCK = {
    "month_legit":
        "CAST(EXTRACT(month FROM o_orderdate) AS BIGINT)",
    "value_legit":
        "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        " // 1000000",
    "leaky_planted": "CAST(y * 10 + o_custkey % 7 AS BIGINT)",
}


def _lk_lanes(feats: dict, div: str) -> str:
    lanes = []
    for name, expr in feats.items():
        lanes.append(f"""
            SELECT '{name}' AS feature,
                   CAST(n * sxy - sx * sy AS VARCHAR) AS cov_num,
                   CAST((n * sxy - sx * sy) * 1000 {div}
                        (CAST(FLOOR(SQRT(CAST(n * sxx - sx * sx
                             AS DOUBLE))) AS {{big}})
                       * CAST(FLOOR(SQRT(CAST(n * syy - sy * sy
                             AS DOUBLE))) AS {{big}}))
                       AS BIGINT) AS assoc_permille
            FROM (
                SELECT CAST(COUNT(*) AS {{big}}) AS n,
                       CAST(SUM(x) AS {{big}}) AS sx,
                       CAST(SUM(y) AS {{big}}) AS sy,
                       CAST(SUM(CAST(x AS {{big}}) * y) AS {{big}})
                           AS sxy,
                       CAST(SUM(CAST(x AS {{big}}) * x) AS {{big}})
                           AS sxx,
                       CAST(SUM(CAST(y AS {{big}}) * y) AS {{big}})
                           AS syy
                FROM (SELECT {expr} AS x, y FROM base)
            )
        """)
    return " UNION ALL ".join(lanes)


@query(
    "ml_leakage_detector_audit",
    oracle=f"""
        WITH base AS MATERIALIZED (
            SELECT o_orderdate, o_totalprice, o_custkey,
                   CASE WHEN o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END AS y
            FROM orders
        )
        SELECT feature, cov_num, assoc_permille,
               ABS(assoc_permille) >= 500 AS leak_flag
        FROM ({_lk_lanes(_LK_FEATURES_DUCK, "//").format(
            big="HUGEINT")})
        ORDER BY feature
    """,
    description="Target-leakage tripwire with a planted positive "
    "control: each candidate feature's association with the urgent-"
    "order label is the point-biserial Pearson from exact integer "
    "moments (covariance numerator kept as VARCHAR, one floor-sqrt "
    "quantization), and features flag as leaks at |r| >= 0.5. The "
    "PLANTED leaky feature is constructed from the label itself "
    "plus deterministic noise, so the detector MUST fire on it "
    "while the legitimate month/value features stay near zero — "
    "the audit validates the detector, not just the features. 100 "
    "TB shape: one scan per feature lane over a shared materialized "
    "base (moments are parallel sums), bounded output — the check "
    "every feature-store merge request should run.",
)
def ml_leakage_detector_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.selectExpr(
        "o_orderdate",
        "o_totalprice",
        "o_custkey",
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END"
        " AS y",
    ).localCheckpoint(eager=False)  # one lane per feature
    lanes = []
    for name, expr in _LK_FEATURES.items():
        xy = base.selectExpr(f"{expr} AS x", "y")
        m = xy.agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum("x").cast("decimal(38,0)").alias("sx"),
            F.sum("y").cast("decimal(38,0)").alias("sy"),
            F.expr("SUM(CAST(x AS DECIMAL(38,0)) * y)").alias("sxy"),
            F.expr("SUM(CAST(x AS DECIMAL(38,0)) * x)").alias("sxx"),
            F.expr("SUM(CAST(y AS DECIMAL(38,0)) * y)").alias("syy"),
        )
        lanes.append(
            m.selectExpr(
                f"'{name}' AS feature",
                "CAST(n * sxy - sx * sy AS STRING) AS cov_num",
                "CAST((n * sxy - sx * sy) * 1000"
                " div (CAST(FLOOR(SQRT(CAST(n * sxx - sx * sx"
                " AS DOUBLE))) AS DECIMAL(38,0))"
                " * CAST(FLOOR(SQRT(CAST(n * syy - sy * sy"
                " AS DOUBLE))) AS DECIMAL(38,0))) AS BIGINT)"
                " AS assoc_permille",
            )
        )
    out = lanes[0]
    for ln in lanes[1:]:
        out = out.unionAll(ln)
    return out.selectExpr(
        "feature",
        "cov_num",
        "assoc_permille",
        "ABS(assoc_permille) >= 500 AS leak_flag",
    ).orderBy("feature")


_HS_WINDOW = 14  # final days of quarter


@query(
    "sales_quarter_hockey_stick",
    oracle=f"""
        WITH q AS (
            SELECT EXTRACT(year FROM o_orderdate) * 10
                   + EXTRACT(quarter FROM o_orderdate) AS yq,
                   o_orderdate AS d,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v
            FROM orders
        ), bounds AS (
            SELECT yq, MAX(d) AS qend,
                   CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days,
                   CAST(SUM(v) AS BIGINT) AS rev
            FROM q GROUP BY yq
        ), tails AS (
            SELECT q.yq,
                   CAST(SUM(CASE WHEN date_diff('day', q.d, b.qend)
                        < {_HS_WINDOW} THEN q.v ELSE 0 END)
                        AS BIGINT) AS tail_rev
            FROM q JOIN bounds b ON b.yq = q.yq
            GROUP BY q.yq
        )
        SELECT b.yq AS year_quarter, b.n_days, b.rev,
               t.tail_rev,
               CAST(t.tail_rev * 1000 // b.rev AS BIGINT)
                   AS tail_share_permille,
               CAST({_HS_WINDOW} * 1000 // b.n_days AS BIGINT)
                   AS uniform_share_permille,
               CAST(t.tail_rev * b.n_days * 1000
                    // (b.rev * {_HS_WINDOW}) AS BIGINT)
                   AS hockey_index_permille
        FROM bounds b JOIN tails t ON t.yq = b.yq
        ORDER BY year_quarter
    """,
    description="The quarter-end hockey stick, indexed: per "
    "quarter, the revenue share landing in the final 14 days vs "
    "the uniform-time expectation (14/active-days), with the ratio "
    "as the pull-forward index — index > 1000 means quarter-end "
    "pressure is real, and its trend across quarters is the sales-"
    "ops health metric. All truncating integer shares, day "
    "arithmetic portable. 100 TB shape: one partial agg to quarter "
    "bounds, one flagged re-aggregation joined on the bounded "
    "quarter key; the fiscal-pressure diagnostic for any revenue "
    "ledger.",
)
def sales_quarter_hockey_stick(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    q = orders.selectExpr(
        "year(o_orderdate) * 10 + quarter(o_orderdate) AS yq",
        "o_orderdate AS d",
        "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        " AS v",
    ).localCheckpoint(eager=False)  # bounds + tail lanes
    bounds = q.groupBy("yq").agg(
        F.max("d").alias("qend"),
        F.countDistinct("d").cast("long").alias("n_days"),
        F.sum("v").cast("long").alias("rev"),
    )
    tails = (
        q.join(F.broadcast(bounds.select("yq", "qend")), "yq")
        .groupBy("yq")
        .agg(
            F.sum(
                F.when(
                    F.expr(f"datediff(qend, d) < {_HS_WINDOW}"),
                    F.col("v"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("tail_rev")
        )
    )
    return (
        bounds.join(tails, "yq")
        .selectExpr(
            "yq AS year_quarter",
            "n_days",
            "rev",
            "tail_rev",
            "CAST(tail_rev * 1000 div rev AS BIGINT)"
            " AS tail_share_permille",
            f"CAST({_HS_WINDOW} * 1000 div n_days AS BIGINT)"
            " AS uniform_share_permille",
            f"CAST(tail_rev * n_days * 1000 div (rev * {_HS_WINDOW})"
            " AS BIGINT) AS hockey_index_permille",
        )
        .orderBy("year_quarter")
    )
