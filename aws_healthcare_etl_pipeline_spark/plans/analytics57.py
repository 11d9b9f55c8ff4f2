"""Wave-83 (round 5): contrastive-training data prep + price forensics.

* ``ml_negative_sampling_audit`` — shared-panel negative sampling for
  contrastive training, audited exactly: a GLOBAL panel of 16
  negatives is drawn by md5 order (deterministic, engine-portable),
  broadcast, and every anchor pairs with the panel minus itself; the
  audit counts FALSE negatives (panel members sharing the anchor's
  label — the pairs that would push apart same-class points) per
  anchor label. The shared-negatives design is the one that scales:
  negatives ship once per batch, not once per anchor, so the pair
  stream is a bounded x16 multiplier on the anchor count instead of
  a quadratic sample.
* ``audit_price_round_number_bias`` — round-number forensics on
  order totals: the distribution of cents-within-dollar (price*100
  mod 100), each bucket's deviation from the uniform expectation in
  integer permille — the Benford-style sibling for detecting
  hand-entered or synthetic prices (spikes at .00/.99).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------- negative sampling audit

_NEG_PANEL = 16  # shared negatives per batch


@query(
    "ml_negative_sampling_audit",
    oracle=f"""
        WITH panel AS (
            SELECT vec_id, label FROM (
                SELECT vec_id, label,
                       ROW_NUMBER() OVER (
                           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                       ) AS rk
                FROM embeddings
            ) t WHERE rk <= {_NEG_PANEL}
        )
        SELECT a.label AS anchor_label,
               CAST(COUNT(DISTINCT a.vec_id) AS BIGINT) AS n_anchors,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN p.label = a.label THEN 1 ELSE 0 END)
                    AS BIGINT) AS false_neg_pairs,
               CAST((SUM(CASE WHEN p.label = a.label THEN 1 ELSE 0 END)
                     * 1000) // COUNT(*) AS BIGINT)
                   AS false_neg_permille,
               CAST(COUNT(DISTINCT CASE WHEN p.label <> a.label
                                        THEN p.label END) AS BIGINT)
                   AS distinct_neg_labels
        FROM embeddings a
        JOIN panel p ON p.vec_id <> a.vec_id
        GROUP BY a.label
        ORDER BY a.label
    """,
    description="Shared-panel negative sampling audit for contrastive "
    "training: 16 global negatives are drawn by md5(vec_id) order "
    "(md5 is the one cross-engine hash, so the draw is deterministic "
    "and portable), broadcast, and each anchor pairs with the panel "
    "minus itself; per anchor label the audit reports the FALSE-"
    "negative rate (panel members sharing the label — the pairs "
    "contrastive loss would wrongly push apart) in integer permille "
    "plus negative-label coverage. Scale shape: the panel is "
    "fixed-size and broadcast, so the pair stream is anchors x 16 — "
    "a bounded multiplier, never an all-pairs sample; the per-label "
    "report is one map-side-combined aggregate.",
)
def ml_negative_sampling_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    w = Window.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
    # the global window ranks a 2-column stream and only the first 16
    # survive — panel selection is top-k by hash, bounded by construction
    panel = (
        emb.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _NEG_PANEL)
        .select(
            F.col("vec_id").alias("p_vec_id"), F.col("label").alias("p_label")
        )
    )
    pairs = emb.join(
        F.broadcast(panel), F.col("p_vec_id") != F.col("vec_id")
    )
    return (
        pairs.groupBy(F.col("label").alias("anchor_label"))
        .agg(
            F.countDistinct("vec_id").cast("long").alias("n_anchors"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum((F.col("p_label") == F.col("label")).cast("long"))
            .cast("long")
            .alias("false_neg_pairs"),
            F.countDistinct(
                F.when(
                    F.col("p_label") != F.col("label"), F.col("p_label")
                )
            )
            .cast("long")
            .alias("distinct_neg_labels"),
        )
        .select(
            "anchor_label",
            "n_anchors",
            "n_pairs",
            "false_neg_pairs",
            F.expr("(false_neg_pairs * 1000) div n_pairs")
            .cast("long")
            .alias("false_neg_permille"),
            "distinct_neg_labels",
        )
        .orderBy("anchor_label")
    )


# ---------------------------------------------- round-number bias audit


@query(
    "audit_price_round_number_bias",
    oracle="""
        WITH cents AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) % 100 AS cent_bucket
            FROM orders
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cents
        )
        SELECT cent_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST((COUNT(*) * 100000) // t.n - 1000 AS BIGINT)
                   AS uniform_dev_permille
        FROM cents CROSS JOIN tot t
        GROUP BY cent_bucket, t.n
        ORDER BY n_orders DESC, cent_bucket
        LIMIT 10
    """,
    description="Round-number price forensics: the cents-within-"
    "dollar distribution of order totals (price*100 mod 100, exact "
    "via DECIMAL cents), each bucket's deviation from the uniform "
    "1/100 expectation in integer permille, top-10 buckets by mass "
    "— the audit that flags hand-entered (.00/.99 spikes) or "
    "naively synthesized prices before they poison a model. One "
    "narrow projection, a 100-bucket map-side-combined aggregate, "
    "and a TakeOrdered(10); report size is constant at any corpus "
    "scale.",
)
def audit_price_round_number_bias(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = orders.select(
        (
            (F.col("o_totalprice").cast("decimal(15,2)") * 100).cast("long")
            % 100
        ).alias("cent_bucket")
    )
    tot = cents.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        cents.groupBy("cent_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .select(
            "cent_bucket",
            "n_orders",
            (F.expr("(n_orders * 100000) div n") - 1000)
            .cast("long")
            .alias("uniform_dev_permille"),
        )
        .orderBy(F.col("n_orders").desc(), "cent_bucket")
        .limit(10)
    )
