"""Wave-181 (round 5): intermittent-demand segmentation.

* ``inventory_intermittency_quadrants`` — the Syntetos-Boylan
  classification that decides WHICH forecaster applies per SKU
  (pairing the repo's existing ``forecast_croston_intermittent``):
  each part's average demand interval (ADI) and squared coefficient
  of variation of demand sizes (CV^2), both exact permille integers,
  cut at the textbook 1.32 / 0.49 thresholds into smooth /
  intermittent / erratic / lumpy quadrants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_SB_ADI_CUT = 1320  # ADI threshold 1.32 in permille
_SB_CV2_CUT = 490  # CV^2 threshold 0.49 in permille


@query(
    "inventory_intermittency_quadrants",
    oracle=f"""
        WITH daily AS (
            SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS d,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS q
            FROM lineitem GROUP BY 1, 2
        ), per_part AS (
            SELECT pk,
                   CAST(COUNT(*) AS BIGINT) AS n_occ,
                   CAST(date_diff('day', MIN(d), MAX(d)) AS BIGINT)
                       AS span_days,
                   CAST(SUM(q) AS BIGINT) AS sq,
                   CAST(SUM(q * q) AS BIGINT) AS sq2
            FROM daily GROUP BY pk
            HAVING COUNT(*) >= 2
        ), graded AS (
            SELECT pk,
                   span_days * 1000 // (n_occ - 1) AS adi_pm,
                   (n_occ * sq2 - sq * sq) * 1000
                       // (sq * sq) AS cv2_pm
            FROM per_part
        )
        SELECT CASE
                 WHEN adi_pm < {_SB_ADI_CUT}
                      AND cv2_pm < {_SB_CV2_CUT} THEN 'smooth'
                 WHEN adi_pm >= {_SB_ADI_CUT}
                      AND cv2_pm < {_SB_CV2_CUT} THEN 'intermittent'
                 WHEN adi_pm < {_SB_ADI_CUT} THEN 'erratic'
                 ELSE 'lumpy' END AS quadrant,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(MIN(adi_pm) AS BIGINT) AS min_adi_pm,
               CAST(MAX(adi_pm) AS BIGINT) AS max_adi_pm,
               CAST(MAX(cv2_pm) AS BIGINT) AS max_cv2_pm
        FROM graded
        GROUP BY 1
        ORDER BY 1
    """,
    description="The Syntetos-Boylan demand classification that "
    "decides WHICH forecaster applies per SKU: average demand "
    "interval ADI = span div (occurrences - 1) and the squared "
    "coefficient of variation CV^2 = (n*SUM(q^2) - SUM(q)^2) div "
    "SUM(q)^2 of demand sizes — both exact permille integers — cut "
    "at the textbook 1.32 / 0.49 thresholds into smooth (use EWMA), "
    "intermittent (use Croston), erratic, and lumpy quadrants. "
    "Quadrant counts plus ADI/CV^2 extrema per cell. 100 TB shape: "
    "one (part, day) pre-agg, one part-grain partial agg, bounded "
    "output — the planner segmentation every supply chain runs "
    "before picking forecast models.",
)
def inventory_intermittency_quadrants(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.col("l_shipdate").cast("date").alias("d"),
    ).agg(
        F.expr("CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)").alias(
            "q"
        )
    )
    per_part = (
        daily.groupBy("pk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.expr("CAST(datediff(MAX(d), MIN(d)) AS BIGINT)").alias(
                "span_days"
            ),
            F.sum("q").cast("long").alias("sq"),
            F.expr("SUM(q * q)").cast("long").alias("sq2"),
        )
        .where(F.col("n_occ") >= 2)
    )
    graded = per_part.selectExpr(
        "pk",
        "span_days * 1000 div (n_occ - 1) AS adi_pm",
        "(n_occ * sq2 - sq * sq) * 1000 div (sq * sq) AS cv2_pm",
    )
    quad = graded.selectExpr(
        f"CASE WHEN adi_pm < {_SB_ADI_CUT}"
        f" AND cv2_pm < {_SB_CV2_CUT} THEN 'smooth'"
        f" WHEN adi_pm >= {_SB_ADI_CUT}"
        f" AND cv2_pm < {_SB_CV2_CUT} THEN 'intermittent'"
        f" WHEN adi_pm < {_SB_ADI_CUT} THEN 'erratic'"
        f" ELSE 'lumpy' END AS quadrant",
        "adi_pm",
        "cv2_pm",
    )
    return (
        quad.groupBy("quadrant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.min("adi_pm").cast("long").alias("min_adi_pm"),
            F.max("adi_pm").cast("long").alias("max_adi_pm"),
            F.max("cv2_pm").cast("long").alias("max_cv2_pm"),
        )
        .orderBy("quadrant")
    )
