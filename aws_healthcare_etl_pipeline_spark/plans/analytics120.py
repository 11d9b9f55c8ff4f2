"""Wave-146 (round 5): item-item collaborative filtering + exact NB.

* ``cf_item_item_topk`` — item-item collaborative filtering over
  order baskets at brand grain: binary-basket cosine similarity
  cos(a,b) = c_ab / sqrt(c_a * c_b) is irrational, so the ranking
  key is the EXACT squared cosine in permille,
  c_ab^2 * 1000 div (c_a * c_b) — a monotone transform, so the
  top-k neighbor lists are identical to ranking by cosine.  Pairs
  come from the canonical a<b self-join co-partitioned on the order
  key (fan-out bounded by basket size), then both orientations are
  materialized for the per-item top-3 window over the bounded
  25x25 brand grid.
* ``ml_naive_bayes_exact_argmax`` — a Naive Bayes classifier with
  NO floating point and NO logarithms: binary target (order is
  1-URGENT), two categorical features (customer market segment,
  order month), Laplace +1 smoothing, temporal train/test split
  (train < 1998, test >= 1998).  The posterior comparison
  S1 > S0 is decided by cross-multiplying the two products of
  integer counts — five factors each, ~1e30 at sf1, carried in
  DECIMAL(38,0) on the Spark side and HUGEINT in the oracle — so
  the argmax is bit-exact in both engines.  Emits the confusion
  matrix, accuracy, and the majority-class baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ item-item CF

_CF_TOPK = 3


@query(
    "cf_item_item_topk",
    oracle=f"""
        WITH ob AS (
            SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        ), singles AS (
            SELECT b, CAST(COUNT(*) AS BIGINT) AS c
            FROM ob GROUP BY b
        ), pairs AS (
            SELECT a.b AS ba, b.b AS bb,
                   CAST(COUNT(*) AS BIGINT) AS c_ab
            FROM ob a JOIN ob b ON b.ok = a.ok AND b.b > a.b
            GROUP BY 1, 2
        ), sym AS (
            SELECT ba AS item, bb AS neighbor, c_ab FROM pairs
            UNION ALL
            SELECT bb AS item, ba AS neighbor, c_ab FROM pairs
        ), scored AS (
            SELECT s.item, s.neighbor, s.c_ab,
                   CAST(s.c_ab * s.c_ab * 1000 // (si.c * sn.c)
                        AS BIGINT) AS cos2_permille
            FROM sym s
            JOIN singles si ON si.b = s.item
            JOIN singles sn ON sn.b = s.neighbor
        ), ranked AS (
            SELECT item, neighbor, c_ab, cos2_permille,
                   ROW_NUMBER() OVER (PARTITION BY item
                       ORDER BY cos2_permille DESC, c_ab DESC,
                                neighbor) AS rnk
            FROM scored
        )
        SELECT item, neighbor, c_ab, cos2_permille,
               CAST(rnk AS BIGINT) AS rnk
        FROM ranked WHERE rnk <= {_CF_TOPK}
        ORDER BY item, rnk
    """,
    description="Item-item collaborative filtering over order "
    "baskets at brand grain: binary-basket cosine is irrational, so "
    "neighbors are ranked by the EXACT squared cosine in permille "
    "(c_ab^2 * 1000 div (c_a*c_b)) — a monotone transform, so the "
    "top-3 lists equal cosine ranking, with deterministic "
    "(count, name) tie-breaks. 100 TB shape: the pair counts come "
    "from a canonical a<b self-join co-partitioned on the order key "
    "with fan-out bounded by basket size; everything after is a "
    "bounded 25x25 brand grid with per-item windows — the classic "
    "'shuffle the facts once, rank the model table' CF layout.",
)
def cf_item_item_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        lineitem.join(
            F.broadcast(part), part.p_partkey == lineitem.l_partkey
        )
        .select(
            F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=False)  # reused by singles + both sides
    )
    singles = ob.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    a = ob.select("ok", F.col("b").alias("ba"))
    bb = ob.select("ok", F.col("b").alias("bb"))
    pairs = (
        a.join(bb, "ok")
        .where(F.col("bb") > F.col("ba"))
        .groupBy("ba", "bb")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    )
    sym = pairs.select(
        F.col("ba").alias("item"),
        F.col("bb").alias("neighbor"),
        "c_ab",
    ).unionByName(
        pairs.select(
            F.col("bb").alias("item"),
            F.col("ba").alias("neighbor"),
            "c_ab",
        )
    )
    si = singles.select(F.col("b").alias("item"), F.col("c").alias("ci"))
    sn = singles.select(
        F.col("b").alias("neighbor"), F.col("c").alias("cn")
    )
    scored = (
        sym.join(F.broadcast(si), "item")
        .join(F.broadcast(sn), "neighbor")
        .select(
            "item",
            "neighbor",
            "c_ab",
            F.expr("c_ab * c_ab * 1000 div (ci * cn)")
            .cast("long")
            .alias("cos2_permille"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("cos2_permille"), F.desc("c_ab"), F.asc("neighbor")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _CF_TOPK)
        .select(
            "item",
            "neighbor",
            "c_ab",
            "cos2_permille",
            F.col("rnk").cast("long").alias("rnk"),
        )
        .orderBy("item", "rnk")
    )


# ------------------------------------------------ exact Naive Bayes

_NB_SPLIT = "1998-01-01"
_NB_URGENT = "1-URGENT"


@query(
    "ml_naive_bayes_exact_argmax",
    oracle=f"""
        WITH rows_all AS (
            SELECT CASE WHEN o.o_orderpriority = '{_NB_URGENT}'
                        THEN 1 ELSE 0 END AS y,
                   c.c_mktsegment AS f1,
                   EXTRACT(month FROM o.o_orderdate) AS f2,
                   CASE WHEN o.o_orderdate < DATE '{_NB_SPLIT}'
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
            SELECT t.y,
                   CASE WHEN
                        CAST(c.n1 AS HUGEINT)
                        * (COALESCE(cf1.a1, 0) + 1)
                        * (COALESCE(cf2.b1, 0) + 1)
                        * (c.n0 + v.v1) * (c.n0 + v.v2)
                        >
                        CAST(c.n0 AS HUGEINT)
                        * (COALESCE(cf1.a0, 0) + 1)
                        * (COALESCE(cf2.b0, 0) + 1)
                        * (c.n1 + v.v1) * (c.n1 + v.v2)
                   THEN 1 ELSE 0 END AS yhat
            FROM rows_all t
            CROSS JOIN cls c CROSS JOIN vf v
            LEFT JOIN cf1 ON cf1.f1 = t.f1
            LEFT JOIN cf2 ON cf2.f2 = t.f2
            WHERE t.is_train = 0
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(y * yhat) AS BIGINT) AS tp,
               CAST(SUM((1 - y) * yhat) AS BIGINT) AS fp,
               CAST(SUM((1 - y) * (1 - yhat)) AS BIGINT) AS tn,
               CAST(SUM(y * (1 - yhat)) AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN y = yhat THEN 1 ELSE 0 END) * 1000
                    // COUNT(*) AS BIGINT) AS accuracy_permille,
               CAST(GREATEST(SUM(y), SUM(1 - y)) * 1000 // COUNT(*)
                    AS BIGINT) AS majority_baseline_permille
        FROM scored
    """,
    description="Naive Bayes with NO floats and NO logs: binary "
    "target (1-URGENT order), categorical features (market segment, "
    "order month), Laplace +1 smoothing, temporal train/test split "
    "at 1998. The posterior argmax S1 > S0 is decided by cross-"
    "multiplying the two five-factor integer-count products (the "
    "denominators N and the per-feature normalizers move to the "
    "other side), carried in DECIMAL(38,0)/HUGEINT since the "
    "products reach ~1e30 at sf1 — so train, score, and the "
    "confusion matrix are bit-exact across engines. 100 TB shape: "
    "one orders x customer join feeds both phases; the model is "
    "three bounded count tables broadcast to a single scoring pass; "
    "unseen test categories fall back to the smoothed zero count "
    "via COALESCE.",
)
def ml_naive_bayes_exact_argmax(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rows_all = (
        orders.join(customer, customer.c_custkey == orders.o_custkey)
        .select(
            F.when(F.col("o_orderpriority") == _NB_URGENT, 1)
            .otherwise(0)
            .alias("y"),
            F.col("c_mktsegment").alias("f1"),
            F.month("o_orderdate").alias("f2"),
            F.when(
                F.col("o_orderdate") < F.lit(_NB_SPLIT).cast("date"), 1
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
            F.expr(
                "CASE WHEN"
                " CAST(n1 AS DECIMAL(38,0))"
                " * (COALESCE(a1, 0) + 1)"
                " * (COALESCE(b1, 0) + 1)"
                " * (n0 + v1) * (n0 + v2)"
                " >"
                " CAST(n0 AS DECIMAL(38,0))"
                " * (COALESCE(a0, 0) + 1)"
                " * (COALESCE(b0, 0) + 1)"
                " * (n1 + v1) * (n1 + v2)"
                " THEN 1 ELSE 0 END"
            ).alias("yhat"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.col("y") * F.col("yhat")).cast("long").alias("tp"),
        F.sum((1 - F.col("y")) * F.col("yhat"))
        .cast("long")
        .alias("fp"),
        F.sum((1 - F.col("y")) * (1 - F.col("yhat")))
        .cast("long")
        .alias("tn"),
        F.sum(F.col("y") * (1 - F.col("yhat")))
        .cast("long")
        .alias("fn"),
        F.expr(
            "CAST(SUM(CASE WHEN y = yhat THEN 1 ELSE 0 END) * 1000"
            " div COUNT(*) AS BIGINT)"
        ).alias("accuracy_permille"),
        F.expr(
            "CAST(GREATEST(SUM(y), SUM(1 - y)) * 1000"
            " div COUNT(*) AS BIGINT)"
        ).alias("majority_baseline_permille"),
    )
