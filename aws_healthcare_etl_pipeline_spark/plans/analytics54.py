"""Wave-80 (round 5): ML evaluation + feature-engineering audits.

* ``ml_auc_feature_screen`` — EXACT per-dimension AUC (Mann-Whitney)
  for the first 8 embedding dimensions against a binary label, with
  no global sort: quantize each dimension to a fixed 1/65536 lattice
  (multiplication by a power of two is exact in binary floating
  point, so the quantization is bit-portable), build one value
  histogram per dimension, and apply the midrank identity
  ``2*R_pos = sum_v pos(v) * (2*C(v-1) + h(v) + 1)`` — the same
  histogram algebra as the Kruskal-Wallis query, repurposed as
  univariate feature screening (which dims separate the classes).
* ``ml_target_encoding_loo`` — leave-one-out target encoding of
  customer market segment against order value, with the leakage
  audit done EXACTLY: the LOO identity ``sum_i (S - x_i) =
  (n-1) * S`` must hold per segment (catching the classic bug of
  encoding a row with its own label), plus the min/max encoded
  values in integer micros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------- exact AUC feature screen

_AUC_DIMS = 8  # screen the first 8 of the 64 dims
_AUC_Q = 65536.0  # 2^16: power-of-two scaling is exact in FP


@query(
    "ml_auc_feature_screen",
    oracle=f"""
        WITH x AS (
            SELECT CAST(t.dim AS BIGINT) AS dim,
                   CAST(floor(CAST(embedding[CAST(t.dim AS INT)] AS DOUBLE)
                              * {_AUC_Q}) AS BIGINT) AS v,
                   CASE WHEN label < 5 THEN 1 ELSE 0 END AS is_pos
            FROM embeddings, range(1, {_AUC_DIMS + 1}) t(dim)
        ), hist AS (
            SELECT dim, v,
                   CAST(COUNT(*) AS BIGINT) AS h,
                   CAST(SUM(is_pos) AS BIGINT) AS hp
            FROM x GROUP BY dim, v
        ), cum AS (
            SELECT dim, v, h, hp,
                   CAST(COALESCE(SUM(h) OVER (PARTITION BY dim ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS c_before
            FROM hist
        ), agg AS (
            SELECT dim,
                   CAST(SUM(hp) AS BIGINT) AS n_pos,
                   CAST(SUM(h - hp) AS BIGINT) AS n_neg,
                   CAST(SUM(hp * (2 * c_before + h + 1)) AS BIGINT)
                       AS rank_sum_x2
            FROM cum GROUP BY dim
        )
        SELECT dim, n_pos, n_neg, rank_sum_x2,
               CAST(((rank_sum_x2 - n_pos * (n_pos + 1)) * 1000000)
                    // (2 * n_pos * n_neg) AS BIGINT) AS auc_micros
        FROM agg ORDER BY dim
    """,
    description="Exact per-dimension AUC (Mann-Whitney U with midrank "
    "tie handling) screening the first 8 embedding dimensions against "
    "a binary label — univariate feature selection done as rank "
    "statistics, NOT via a global sort: each dimension is quantized "
    "onto a fixed 1/65536 lattice (power-of-two scaling is exact in "
    "IEEE754, so Spark and DuckDB quantize bit-identically), the "
    "per-dim value histogram is built in one map-side-combined pass, "
    "and the midrank identity 2*R_pos = sum_v pos(v)*(2*C(v-1)+h(v)+1) "
    "turns the rank sum into histogram algebra. At 100 TB the window "
    "runs over the HISTOGRAM (per-dim cardinality <= 2*65536 by "
    "construction, independent of row count), so the only data-sized "
    "work is two partial-agg shuffles on (dim, value).",
)
def ml_auc_feature_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        F.explode(F.sequence(F.lit(1), F.lit(_AUC_DIMS))).alias("dim"),
        F.col("embedding"),
        (F.col("label") < 5).cast("long").alias("is_pos"),
    ).select(
        F.col("dim").cast("long").alias("dim"),
        F.floor(
            F.element_at("embedding", F.col("dim").cast("int")).cast("double")
            * F.lit(_AUC_Q)
        )
        .cast("long")
        .alias("v"),
        "is_pos",
    )
    hist = x.groupBy("dim", "v").agg(
        F.count(F.lit(1)).cast("long").alias("h"),
        F.sum("is_pos").cast("long").alias("hp"),
    )
    w = (
        Window.partitionBy("dim")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.withColumn(
        "c_before", F.coalesce(F.sum("h").over(w), F.lit(0)).cast("long")
    )
    agg = cum.groupBy("dim").agg(
        F.sum("hp").cast("long").alias("n_pos"),
        F.sum(F.col("h") - F.col("hp")).cast("long").alias("n_neg"),
        F.sum(F.col("hp") * (2 * F.col("c_before") + F.col("h") + 1))
        .cast("long")
        .alias("rank_sum_x2"),
    )
    return agg.select(
        "dim",
        "n_pos",
        "n_neg",
        "rank_sum_x2",
        F.expr(
            "((rank_sum_x2 - n_pos * (n_pos + 1)) * 1000000)"
            " div (2 * n_pos * n_neg)"
        )
        .cast("long")
        .alias("auc_micros"),
    ).orderBy("dim")


# ------------------------------------------ LOO target encoding audit


@query(
    "ml_target_encoding_loo",
    oracle="""
        WITH x AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ), seg AS (
            SELECT segment,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents
            FROM x GROUP BY segment
        ), loo AS (
            SELECT x.segment, s.n_orders, s.sum_cents,
                   s.sum_cents - x.cents AS loo_num
            FROM x JOIN seg s ON x.segment = s.segment
        )
        SELECT segment, n_orders, sum_cents,
               CAST(CASE WHEN CAST(SUM(loo_num) AS BIGINT)
                              = (n_orders - 1) * sum_cents
                         THEN 1 ELSE 0 END AS BIGINT) AS loo_identity_ok,
               CAST(MIN((loo_num * 1000000) // (n_orders - 1))
                    AS BIGINT) AS min_loo_micros,
               CAST(MAX((loo_num * 1000000) // (n_orders - 1))
                    AS BIGINT) AS max_loo_micros
        FROM loo
        GROUP BY segment, n_orders, sum_cents
        ORDER BY segment
    """,
    description="Leave-one-out target encoding of customer market "
    "segment against order value (cents-exact), with the leakage "
    "audit done as an EXACT integer identity: per segment, the LOO "
    "numerators must satisfy sum_i (S - x_i) = (n-1)*S — the "
    "classic target-encoding bug (scoring a row with its own label "
    "included) breaks this identity immediately, and min/max encoded "
    "values in integer micros bound the encoding's spread. Scale "
    "shape: one big-big equi-join (orders x customer), one map-side-"
    "combined segment aggregate, then the 5-row segment stats "
    "broadcast back onto the fact stream — the canonical two-pass "
    "encode that never shuffles the fact table twice.",
)
def ml_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    x = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "segment", "cents"
    )
    seg = x.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    loo = x.join(F.broadcast(seg), "segment").select(
        "segment",
        "n_orders",
        "sum_cents",
        (F.col("sum_cents") - F.col("cents")).alias("loo_num"),
    )
    return (
        loo.groupBy("segment", "n_orders", "sum_cents")
        .agg(
            (
                F.sum("loo_num").cast("long")
                == (F.col("n_orders") - 1) * F.col("sum_cents")
            )
            .cast("long")
            .alias("loo_identity_ok"),
            F.min(F.expr("(loo_num * 1000000) div (n_orders - 1)"))
            .cast("long")
            .alias("min_loo_micros"),
            F.max(F.expr("(loo_num * 1000000) div (n_orders - 1)"))
            .cast("long")
            .alias("max_loo_micros"),
        )
        .orderBy("segment")
    )
