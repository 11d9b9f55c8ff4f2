"""Wave-102 (round 5): billing forensics + class-separation screening.

* ``audit_duplicate_invoice_candidates`` — duplicate-billing
  forensics: order pairs from the same customer within 7 days whose
  amounts agree within 10% (integer cross-multiplication, no float
  ratios) — the double-submit / re-key signature. The pair join is
  a per-customer self-join whose fan-out is bounded by order
  velocity inside the day band. Per-segment rollup with the
  tightest repeat.
* ``emb_fisher_separation_ratio`` — Fisher-style class-separation
  screening per embedding dimension: between-class scatter over
  within-class scatter on md5-balanced panels (every class
  contributes the SAME panel size m = min class count, which makes
  the scatter algebra exact-integer: between = sum_c (C*S_c - S)^2
  and within = sum_c (m*Q_c - S_c^2) on the 1/1024 lattice), the
  variance-based complement to the rank-based AUC screen — the two
  together are the standard univariate feature-selection toolkit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# -------------------------------------- duplicate invoice candidates

_DUP_DAYS = 7
_DUP_PCT = 10  # amounts within 10% (integer cross-multiplication)


@query(
    "audit_duplicate_invoice_candidates",
    oracle=f"""
        WITH inv AS (
            SELECT o_orderkey, o_custkey,
                   CAST(o_orderdate AS DATE) AS dy,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS cents
            FROM orders
        ), pairs AS (
            SELECT a.o_custkey,
                   GREATEST(a.cents, b.cents) AS cents,
                   CAST(abs(date_diff('day', a.dy, b.dy)) AS BIGINT)
                       AS gap_days
            FROM inv a JOIN inv b
              ON b.o_custkey = a.o_custkey
             AND a.o_orderkey < b.o_orderkey
             AND b.dy >= a.dy - {_DUP_DAYS}
             AND b.dy <= a.dy + {_DUP_DAYS}
             AND abs(a.cents - b.cents) * 100
                 < GREATEST(a.cents, b.cents) * {_DUP_PCT}
        ), attributed AS (
            SELECT c.c_mktsegment AS segment, p.cents, p.gap_days
            FROM pairs p JOIN customer c ON c.c_custkey = p.o_custkey
        )
        SELECT segment,
               CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
               CAST(MIN(gap_days) AS BIGINT) AS min_gap_days,
               CAST(MAX(cents) AS BIGINT) AS max_amount_cents
        FROM attributed
        GROUP BY segment
        ORDER BY segment
    """,
    description="Duplicate-billing forensics: order pairs from the "
    "same customer within 7 days whose amounts agree within 10% "
    "(integer cross-multiplication |a-b|*100 < max*10 — no float "
    "ratios) — the double-submit / re-key signature AP audits "
    "hunt. The pair join is a per-customer self-join (equi on "
    "custkey) whose fan-out is bounded by per-customer order "
    "velocity inside the day band, never all-pairs; a<b on order "
    "keys dedups. Per-segment rollup with the tightest gap and "
    "largest flagged amount. At 100 TB this shuffles once on "
    "custkey — and a (customer, week-bucket) composite key shards "
    "pathological mega-customers if velocity ever makes the band "
    "heavy.",
)
def audit_duplicate_invoice_candidates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    inv = orders.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("dy"),
        (F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("cents"),
    ).localCheckpoint(eager=False)  # both sides of the pair join
    a = inv.alias("a")
    b = inv.alias("b")
    pairs = a.join(
        b,
        (F.col("b.o_custkey") == F.col("a.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.col("b.dy") >= F.date_sub(F.col("a.dy"), _DUP_DAYS))
        & (F.col("b.dy") <= F.date_add(F.col("a.dy"), _DUP_DAYS))
        & (
            F.abs(F.col("a.cents") - F.col("b.cents")) * 100
            < F.greatest(F.col("a.cents"), F.col("b.cents")) * _DUP_PCT
        ),
    ).select(
        F.col("a.o_custkey").alias("o_custkey"),
        F.greatest(F.col("a.cents"), F.col("b.cents")).alias("cents"),
        F.abs(F.datediff(F.col("b.dy"), F.col("a.dy"))).alias("gap_days"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    return (
        pairs.join(F.broadcast(cust), pairs.o_custkey == cust.c_custkey)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
            F.min("gap_days").cast("long").alias("min_gap_days"),
            F.max("cents").cast("long").alias("max_amount_cents"),
        )
        .orderBy("segment")
    )


# ------------------------------------- Fisher separation screening

_FS_DIMS = 8
_FS_Q = 1024.0


@query(
    "emb_fisher_separation_ratio",
    oracle=f"""
        WITH sized AS (
            SELECT CAST(MIN(cnt) AS BIGINT) AS m FROM (
                SELECT label, COUNT(*) AS cnt FROM embeddings
                GROUP BY label
            )
        ), panel AS (
            SELECT label, vec_id, embedding FROM (
                SELECT label, vec_id, embedding,
                       ROW_NUMBER() OVER (
                           PARTITION BY label
                           ORDER BY md5('f:' || CAST(vec_id AS VARCHAR)),
                                    vec_id) AS rk
                FROM embeddings
            ) t, sized s WHERE rk <= s.m
        ), q AS (
            SELECT p.label, t.dim,
                   CAST(floor(CAST(p.embedding[CAST(t.dim AS INT)]
                                   AS DOUBLE) * {_FS_Q}) AS BIGINT) AS x
            FROM panel p, range(1, {_FS_DIMS + 1}) t(dim)
        ), per_class AS (
            SELECT dim, label,
                   CAST(SUM(x) AS BIGINT) AS s_c,
                   CAST(SUM(x * x) AS BIGINT) AS q_c,
                   CAST(COUNT(*) AS BIGINT) AS m
            FROM q GROUP BY dim, label
        ), tot AS (
            SELECT dim,
                   CAST(SUM(s_c) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n_classes
            FROM per_class GROUP BY dim
        )
        SELECT p.dim,
               t.n_classes,
               MAX(p.m) AS panel_per_class,
               CAST(SUM((t.n_classes * p.s_c - t.s)
                        * (t.n_classes * p.s_c - t.s)) AS BIGINT)
                   AS between_num,
               CAST(SUM(p.m * p.q_c - p.s_c * p.s_c) AS BIGINT)
                   AS within_num,
               CAST((SUM((t.n_classes * p.s_c - t.s)
                         * (t.n_classes * p.s_c - t.s)) * 1000)
                    // NULLIF(SUM(p.m * p.q_c - p.s_c * p.s_c)
                              * t.n_classes * t.n_classes, 0)
                    AS BIGINT) AS fisher_permille
        FROM per_class p JOIN tot t ON t.dim = p.dim
        GROUP BY p.dim, t.n_classes
        ORDER BY p.dim
    """,
    description="Fisher-style class-separation screening for the "
    "first 8 embedding dimensions: md5-balanced panels (every class "
    "contributes m = min class count vectors, making the scatter "
    "algebra exact) quantize to the 1/1024 lattice, and per "
    "dimension the between-class scatter numerator sum_c (C*S_c - "
    "S)^2 divides the within-class numerator sum_c (m*Q_c - S_c^2) "
    "— integer end-to-end with the C^2 normalization folded into "
    "the final permille cross-multiplication. The variance-based "
    "complement to the rank-based AUC screen; a dimension scoring "
    "high on both is a real feature, high-AUC/low-Fisher flags "
    "heavy tails. Scale: panels are per-class WindowGroupLimit, "
    "per-(dim, class) sums are map-side combined, and the ratio "
    "algebra runs on dims x classes rows.",
)
def emb_fisher_separation_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sized = emb.groupBy("label").agg(F.count(F.lit(1)).alias("cnt")).agg(
        F.min("cnt").cast("long").alias("m")
    )
    wp = Window.partitionBy("label").orderBy(
        F.md5(F.concat(F.lit("f:"), F.col("vec_id").cast("string"))),
        "vec_id",
    )
    panel = (
        emb.withColumn("rk", F.row_number().over(wp))
        .crossJoin(F.broadcast(sized))
        .filter(F.col("rk") <= F.col("m"))
        .select("label", "vec_id", "embedding")
    )
    q = panel.select(
        "label",
        F.explode(F.sequence(F.lit(1), F.lit(_FS_DIMS))).alias("dim"),
        "embedding",
    ).select(
        "label",
        "dim",
        F.floor(
            F.element_at("embedding", F.col("dim").cast("int")).cast("double")
            * F.lit(_FS_Q)
        )
        .cast("long")
        .alias("x"),
    )
    per_class = q.groupBy("dim", "label").agg(
        F.sum("x").cast("long").alias("s_c"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q_c"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    tot = per_class.groupBy("dim").agg(
        F.sum("s_c").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
    )
    joined = per_class.join(F.broadcast(tot), "dim")
    bterm = (F.col("n_classes") * F.col("s_c") - F.col("s")) * (
        F.col("n_classes") * F.col("s_c") - F.col("s")
    )
    wterm = F.col("m") * F.col("q_c") - F.col("s_c") * F.col("s_c")
    return (
        joined.groupBy("dim", "n_classes")
        .agg(
            F.max("m").alias("panel_per_class"),
            F.sum(bterm).cast("long").alias("between_num"),
            F.sum(wterm).cast("long").alias("within_num"),
        )
        .select(
            "dim",
            "n_classes",
            "panel_per_class",
            "between_num",
            "within_num",
            F.expr(
                "(between_num * 1000) div nullif(within_num"
                " * n_classes * n_classes, 0)"
            )
            .cast("long")
            .alias("fisher_permille"),
        )
        .orderBy("dim")
    )
