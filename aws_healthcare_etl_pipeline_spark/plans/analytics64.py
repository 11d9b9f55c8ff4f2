"""Wave-90 (round 5): position-based attribution + exact centroid
classification.

* ``attribution_position_based`` — U-shaped multi-touch attribution
  (40% first touch, 40% last, 20% split across middles) with EXACT
  cent conservation: per purchase the weights are integer numerators
  over the common denominator 5*(n-2) (degenerating to 1/1 and 1/2
  for 1- and 2-click paths), floors are taken per click, and the
  remainder cents go to the earliest clicks — so every purchase's
  credit sums to its value to the cent, the property float-weighted
  attribution silently loses.
* ``emb_nearest_centroid_accuracy`` — nearest-class-centroid
  classification with EXACT integer geometry: embeddings quantize to
  a 1/1024 lattice (power-of-two scaling, bit-portable), per-class
  centroids from a fixed-size md5-selected train panel are carried
  as (sum, count) WITHOUT division, and the squared distance to a
  rational centroid uses the identity
  dist2 * n^2 = sum_d (n*x_d - s_d)^2 — the cross-class argmin
  orders by the single-division double D/n^2 (identical expression
  both engines) with label tiebreaks. The one-pass linear classifier
  baseline every embedding pipeline should report before reaching
  for kNN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_ATTR_WINDOW_DAYS = 3

# ------------------------------------------ position-based attribution


@query(
    "attribution_position_based",
    oracle=f"""
        WITH purchases AS (
            SELECT event_id AS p_id, user_id, ts AS p_ts,
                   CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT)
                       AS cents
            FROM events WHERE event_type = 'purchase'
        ), clicks AS (
            SELECT event_id AS c_id, user_id, ts AS c_ts
            FROM events WHERE event_type = 'click'
        ), touched AS (
            SELECT p.p_id, p.user_id, p.cents, c.c_id,
                   row_number() OVER (PARTITION BY p.p_id
                                      ORDER BY c.c_ts, c.c_id)
                       AS click_rank,
                   COUNT(*) OVER (PARTITION BY p.p_id) AS n_clicks
            FROM purchases p
            JOIN clicks c
              ON c.user_id = p.user_id
             AND c.c_ts <= p.p_ts
             AND c.c_ts > p.p_ts - INTERVAL {_ATTR_WINDOW_DAYS} DAY
        ), weighted AS (
            SELECT *,
                   CASE WHEN n_clicks = 1 THEN 1
                        WHEN n_clicks = 2 THEN 1
                        WHEN click_rank = 1 THEN 2 * (n_clicks - 2)
                        WHEN click_rank = n_clicks THEN 2 * (n_clicks - 2)
                        ELSE 1 END AS num,
                   CASE WHEN n_clicks = 1 THEN 1
                        WHEN n_clicks = 2 THEN 2
                        ELSE 5 * (n_clicks - 2) END AS den
            FROM touched
        ), floored AS (
            SELECT *,
                   (cents * num) // den AS floor_cents,
                   cents - SUM((cents * num) // den)
                       OVER (PARTITION BY p_id) AS rem
            FROM weighted
        ), credited AS (
            SELECT user_id, p_id, c_id, click_rank,
                   floor_cents + CASE WHEN click_rank <= rem
                                      THEN 1 ELSE 0 END AS credit_cents
            FROM floored
        )
        SELECT user_id,
               CAST(COUNT(DISTINCT p_id) AS BIGINT)
                   AS n_attributed_purchases,
               CAST(COUNT(*) AS BIGINT) AS n_credited_clicks,
               CAST(SUM(credit_cents) AS BIGINT) AS total_credit_cents,
               CAST(SUM(CASE WHEN click_rank = 1 THEN credit_cents
                             ELSE 0 END) AS BIGINT)
                   AS first_touch_cents,
               CAST(MAX(credit_cents) AS BIGINT) AS max_click_credit_cents
        FROM credited
        GROUP BY user_id
        ORDER BY user_id
    """,
    description="U-shaped (position-based) multi-touch attribution: "
    "40% of each purchase's cents to the first click, 40% to the "
    "last, 20% split across middles — expressed as integer "
    "numerators over the common denominator 5*(n-2) (1-click and "
    "2-click paths degenerate to 1/1 and 1/2), floored per click "
    "with remainder cents to the earliest clicks, so per-purchase "
    "credit conserves the total EXACTLY — the property float-"
    "weighted attribution loses a cent at a time. Same per-user "
    "range-join shape as the linear variant: both event streams "
    "hash-partition on user_id, the 3-day window bounds fan-out, "
    "and the position weights are window functions over per-"
    "purchase click runs.",
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        (F.col("value").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    touched = purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.col("c_ts")
            > F.col("p_ts") - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAY")
        ),
    ).select("p_id", "user_id", "cents", "c_id", "c_ts")
    wp = Window.partitionBy("p_id")
    ranked = touched.select(
        "p_id",
        "user_id",
        "cents",
        "c_id",
        F.row_number().over(wp.orderBy("c_ts", "c_id")).alias("click_rank"),
        F.count(F.lit(1)).over(wp).alias("n_clicks"),
    )
    num = (
        F.when(F.col("n_clicks") <= 2, 1)
        .when(F.col("click_rank") == 1, 2 * (F.col("n_clicks") - 2))
        .when(
            F.col("click_rank") == F.col("n_clicks"),
            2 * (F.col("n_clicks") - 2),
        )
        .otherwise(1)
    )
    den = (
        F.when(F.col("n_clicks") == 1, 1)
        .when(F.col("n_clicks") == 2, 2)
        .otherwise(5 * (F.col("n_clicks") - 2))
    )
    weighted = ranked.withColumn("num", num).withColumn("den", den)
    floored = weighted.withColumn(
        "floor_cents", F.expr("(cents * num) div den")
    ).withColumn(
        "rem",
        F.col("cents") - F.sum(F.expr("(cents * num) div den")).over(wp),
    )
    credited = floored.select(
        "user_id",
        "p_id",
        "c_id",
        "click_rank",
        (
            F.col("floor_cents")
            + (F.col("click_rank") <= F.col("rem")).cast("long")
        ).alias("credit_cents"),
    )
    return (
        credited.groupBy("user_id")
        .agg(
            F.countDistinct("p_id").cast("long").alias(
                "n_attributed_purchases"
            ),
            F.count(F.lit(1)).cast("long").alias("n_credited_clicks"),
            F.sum("credit_cents").cast("long").alias("total_credit_cents"),
            F.sum(
                F.when(F.col("click_rank") == 1, F.col("credit_cents"))
                .otherwise(0)
            )
            .cast("long")
            .alias("first_touch_cents"),
            F.max("credit_cents").cast("long").alias(
                "max_click_credit_cents"
            ),
        )
        .orderBy("user_id")
    )


# -------------------------------------- nearest-centroid classification

_NC_DIM = 64
_NC_Q = 1024.0  # 2^10 lattice: exact quantization, bounded products
_NC_PANEL = 64  # per-class train/eval panel caps


@query(
    "emb_nearest_centroid_accuracy",
    oracle=f"""
        WITH halves AS (
            SELECT vec_id, label, embedding,
                   (strpos('0123456789abcdef',
                           substr(md5('p:' || CAST(vec_id AS VARCHAR)),
                                  1, 1)) - 1) % 2 AS half,
                   ROW_NUMBER() OVER (
                       PARTITION BY label,
                           (strpos('0123456789abcdef',
                                   substr(md5('p:' ||
                                          CAST(vec_id AS VARCHAR)),
                                          1, 1)) - 1) % 2
                       ORDER BY md5('r:' || CAST(vec_id AS VARCHAR)),
                                vec_id) AS prk
            FROM embeddings
        ), train_q AS (
            SELECT h.label, t.dim,
                   CAST(floor(CAST(h.embedding[CAST(t.dim AS INT)]
                                   AS DOUBLE) * {_NC_Q}) AS BIGINT) AS q
            FROM halves h, range(1, {_NC_DIM + 1}) t(dim)
            WHERE h.half = 0 AND h.prk <= {_NC_PANEL}
        ), centroid AS (
            SELECT label, dim,
                   CAST(SUM(q) AS BIGINT) AS s
            FROM train_q GROUP BY label, dim
        ), csize AS (
            SELECT label, CAST(COUNT(*) AS BIGINT) AS n
            FROM halves WHERE half = 0 AND prk <= {_NC_PANEL}
            GROUP BY label
        ), eval_q AS (
            SELECT h.vec_id, h.label AS true_label, t.dim,
                   CAST(floor(CAST(h.embedding[CAST(t.dim AS INT)]
                                   AS DOUBLE) * {_NC_Q}) AS BIGINT) AS q
            FROM halves h, range(1, {_NC_DIM + 1}) t(dim)
            WHERE h.half = 1 AND h.prk <= {_NC_PANEL}
        ), dists AS (
            SELECT e.vec_id, e.true_label, c.label AS cand_label,
                   cs.n,
                   CAST(SUM((cs.n * e.q - c.s) * (cs.n * e.q - c.s))
                        AS BIGINT) AS d2n2
            FROM eval_q e
            JOIN centroid c ON c.dim = e.dim
            JOIN csize cs ON cs.label = c.label
            GROUP BY e.vec_id, e.true_label, c.label, cs.n
        ), pred AS (
            SELECT vec_id, true_label, cand_label,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id
                       ORDER BY CAST(d2n2 AS DOUBLE)
                                / CAST(n * n AS DOUBLE),
                                cand_label) AS rk
            FROM dists
        )
        SELECT true_label,
               CAST(COUNT(*) AS BIGINT) AS n_eval,
               CAST(SUM(CASE WHEN cand_label = true_label
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               CAST((SUM(CASE WHEN cand_label = true_label
                              THEN 1 ELSE 0 END) * 1000)
                    // COUNT(*) AS BIGINT) AS accuracy_permille
        FROM pred WHERE rk = 1
        GROUP BY true_label
        ORDER BY true_label
    """,
    description="Nearest-class-centroid classification with exact "
    "integer geometry: embeddings quantize to the 1/1024 lattice "
    "(power-of-two scaling — bit-portable), per-class centroids "
    "from md5-selected fixed-size train panels are carried as "
    "(sum, count) with NO division, and squared distance to the "
    "rational centroid uses dist2*n^2 = sum_d (n*x_d - s_d)^2 — "
    "all integer, overflow-bounded by the panel cap; the cross-"
    "class argmin sorts by the single-division double d2n2/n^2 "
    "(identical expression trees, deterministic) with label "
    "tiebreaks, and per-class accuracy lands in integer permille. "
    "The one-pass baseline to report before kNN. Scale: the "
    "centroid table is classes x dims (broadcast-tiny); the eval "
    "stream fans out by classes only — never by corpus size — and "
    "panel selection is a per-class WindowGroupLimit.",
)
def emb_nearest_centroid_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    half = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("p:"), F.col("vec_id").cast("string"))),
                1,
                1,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    wp = Window.partitionBy("label", "half").orderBy(
        F.md5(F.concat(F.lit("r:"), F.col("vec_id").cast("string"))),
        "vec_id",
    )
    halves = (
        emb.withColumn("half", half)
        .withColumn("prk", F.row_number().over(wp))
        .filter(F.col("prk") <= _NC_PANEL)
        .localCheckpoint(eager=False)  # panel-sized; feeds both halves
    )
    dim = F.explode(F.sequence(F.lit(1), F.lit(_NC_DIM))).alias("dim")
    q = (
        F.floor(
            F.element_at("embedding", F.col("dim").cast("int")).cast("double")
            * F.lit(_NC_Q)
        )
        .cast("long")
        .alias("q")
    )
    train_q = (
        halves.filter(F.col("half") == 0)
        .select("label", "embedding", dim)
        .select("label", "dim", q)
    )
    centroid = train_q.groupBy("label", "dim").agg(
        F.sum("q").cast("long").alias("s")
    )
    csize = (
        halves.filter(F.col("half") == 0)
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    eval_q = (
        halves.filter(F.col("half") == 1)
        .select(
            "vec_id", F.col("label").alias("true_label"), "embedding", dim
        )
        .select("vec_id", "true_label", "dim", q)
    )
    cen = centroid.join(F.broadcast(csize), "label").select(
        F.col("label").alias("cand_label"), "dim", "s", "n"
    )
    dists = (
        eval_q.join(F.broadcast(cen), "dim")
        .groupBy("vec_id", "true_label", "cand_label", "n")
        .agg(
            F.sum(
                (F.col("n") * F.col("q") - F.col("s"))
                * (F.col("n") * F.col("q") - F.col("s"))
            )
            .cast("long")
            .alias("d2n2")
        )
    )
    wr = Window.partitionBy("vec_id").orderBy(
        F.col("d2n2").cast("double") / (F.col("n") * F.col("n")).cast("double"),
        "cand_label",
    )
    pred = dists.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") == 1
    )
    return (
        pred.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum((F.col("cand_label") == F.col("true_label")).cast("long"))
            .cast("long")
            .alias("n_correct"),
        )
        .select(
            "true_label",
            "n_eval",
            "n_correct",
            F.expr("(n_correct * 1000) div n_eval")
            .cast("long")
            .alias("accuracy_permille"),
        )
        .orderBy("true_label")
    )
