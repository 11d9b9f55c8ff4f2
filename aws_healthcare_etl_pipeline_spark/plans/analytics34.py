"""Wave-60 (round 5): survival analysis + frequent-itemset mining.

* ``survival_km_hazard_table`` — the Kaplan-Meier life table over
  user activity spans: per duration t, the at-risk count (spans >=
  t), event count (churned at t), censored count, and the discrete
  hazard d_t/n_t as an integer-division permille. The classic KM
  survival PRODUCT is irrational (engines' float products diverge),
  but the life table itself — the thing the product is built from —
  is pure integers, so the driver hash-checks it exactly.
* ``basket_apriori_triples`` — frequent 3-itemsets of part brands per
  order, mined Apriori-style: frequent pairs -> candidate triples by
  prefix join -> subset-pruning (every 2-subset must be frequent) ->
  exact support count of the surviving candidates. The oracle counts
  ALL triples textbook-style and filters by support; the hash match
  PROVES the Apriori pruning lossless (support(T) <= support(any
  subset) — the downward-closure property). The support threshold is
  a ratio of basket count (portable-knob rule), not a constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ KM hazard life table

_KM_CENSOR_GAP_DAYS = 3  # inactive for > this before horizon => churned


@query(
    "survival_km_hazard_table",
    oracle=f"""
        WITH horizon AS (
            SELECT MAX(CAST(ts AS DATE)) AS hmax FROM events
        ), spans AS (
            SELECT user_id,
                   date_diff('day', MIN(CAST(ts AS DATE)),
                             MAX(CAST(ts AS DATE))) AS dur,
                   MAX(CAST(ts AS DATE)) AS last_day
            FROM events GROUP BY user_id
        ), labeled AS (
            SELECT s.dur,
                   CASE WHEN date_diff('day', s.last_day, h.hmax)
                             > {_KM_CENSOR_GAP_DAYS}
                        THEN 1 ELSE 0 END AS churned
            FROM spans s, horizon h
        ), per_t AS (
            SELECT dur AS t,
                   CAST(COUNT(*) AS BIGINT) AS leaving,
                   CAST(SUM(churned) AS BIGINT) AS d,
                   CAST(SUM(1 - churned) AS BIGINT) AS censored
            FROM labeled GROUP BY dur
        ), risk AS (
            SELECT t, d, censored,
                   CAST(SUM(leaving) OVER (ORDER BY t DESC)
                        AS BIGINT) AS n_risk
            FROM per_t
        )
        SELECT CAST(t AS BIGINT) AS t_days, n_risk, d AS n_events,
               censored AS n_censored,
               CAST((d * 1000) // n_risk AS BIGINT) AS hazard_permille
        FROM risk ORDER BY t_days
    """,
    description="Kaplan-Meier life table over user activity spans "
    "(first event .. last event, churned when inactive beyond the "
    "censor gap before the observation horizon): per duration t the "
    "at-risk count n_t (computed as a reverse cumulative sum over the "
    "bounded duration spine — no per-user window), event and censored "
    "counts, and the discrete hazard d_t/n_t as an integer permille. "
    "The KM survival curve's float PRODUCT is deliberately left to "
    "the consumer: the life table is the sufficient statistic and is "
    "bit-exact in integers. At 100 TB the only data-scale pass is the "
    "per-user min/max aggregation (one shuffle on user_id); the spine "
    "is bounded by the day-span of the observation window, so the "
    "reverse-cumsum window touches tens of rows.",
)
def survival_km_hazard_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    spans = events.groupBy("user_id").agg(
        F.datediff(
            F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))
        ).alias("dur"),
        F.max(F.col("ts").cast("date")).alias("last_day"),
    )
    horizon = events.agg(F.max(F.col("ts").cast("date")).alias("hmax"))
    labeled = spans.crossJoin(F.broadcast(horizon)).select(
        "dur",
        F.when(
            F.datediff("hmax", "last_day") > _KM_CENSOR_GAP_DAYS, 1
        )
        .otherwise(0)
        .alias("churned"),
    )
    per_t = labeled.groupBy(F.col("dur").alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("leaving"),
        F.sum("churned").cast("long").alias("d"),
        F.sum(1 - F.col("churned")).cast("long").alias("censored"),
    )
    # reverse running sum over the bounded duration spine
    w = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per_t.withColumn("n_risk", F.sum("leaving").over(w))
    return risk.select(
        F.col("t").cast("long").alias("t_days"),
        "n_risk",
        F.col("d").alias("n_events"),
        F.col("censored").alias("n_censored"),
        F.expr("(d * 1000) div n_risk").cast("long").alias("hazard_permille"),
    ).orderBy("t_days")


# ------------------------------------------- Apriori frequent triples

# support threshold = max(2, n_baskets // _APRIORI_DIV): ratio-of-corpus
# knob (portable across scale factors)
_APRIORI_DIV = 400


@query(
    "basket_apriori_triples",
    oracle=f"""
        WITH ob AS (
            SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        ), thr AS (
            SELECT GREATEST(2, COUNT(DISTINCT ok) // {_APRIORI_DIV}) AS s
            FROM ob
        ), triples AS (
            SELECT a.b AS brand_a, b.b AS brand_b, c.b AS brand_c,
                   CAST(COUNT(*) AS BIGINT) AS support
            FROM ob a JOIN ob b ON b.ok = a.ok AND b.b > a.b
                      JOIN ob c ON c.ok = a.ok AND c.b > b.b
            GROUP BY 1, 2, 3
        )
        SELECT t.brand_a, t.brand_b, t.brand_c, t.support
        FROM triples t, thr
        WHERE t.support >= thr.s
        ORDER BY t.support DESC, t.brand_a, t.brand_b, t.brand_c
    """,
    description="Apriori frequent 3-itemsets (brands co-purchased in "
    "an order): the Spark side mines them the scalable way — frequent "
    "pairs first, candidate triples by prefix join of pairs sharing "
    "their first item, subset pruning (the (b,c) pair must also be "
    "frequent), and only then exact support counting of the bounded "
    "candidate set — while the oracle counts ALL triples textbook-"
    "style, so the hash match PROVES downward-closure pruning is "
    "lossless. The support threshold is a ratio of basket count "
    "(portable-knob rule). At 100 TB this is the shape that survives "
    "a large item domain: the all-triples enumeration the oracle does "
    "is exactly what you cannot run at scale, and the L2 semi-joins "
    "bound every intermediate by the frequent-pair list (broadcast-"
    "size by construction).",
)
def basket_apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        line.join(F.broadcast(part), line["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
    )
    thr = ob.agg(
        F.greatest(
            F.lit(2).cast("long"),
            F.expr(f"count(distinct ok) div {_APRIORI_DIV}"),
        ).alias("s")
    )
    # L2: frequent pairs. The in-order pair stream is needed TWICE
    # (L2 support counting here, the candidate-restricted extension
    # below) — checkpoint it once instead of re-running the self-join
    # per consumer.
    a, b2 = ob.alias("a"), ob.alias("b")
    pair_stream = (
        a.join(
            b2,
            (F.col("b.ok") == F.col("a.ok")) & (F.col("b.b") > F.col("a.b")),
        )
        .select(
            F.col("a.ok").alias("pok"),
            F.col("a.b").alias("ba"),
            F.col("b.b").alias("bb"),
        )
        .localCheckpoint(eager=False)
    )
    pairs = (
        pair_stream.groupBy(F.col("ba").alias("x"), F.col("bb").alias("y"))
        .agg(F.count(F.lit(1)).alias("sup2"))
        .crossJoin(F.broadcast(thr))
        .filter(F.col("sup2") >= F.col("s"))
        .select("x", "y")
    )
    l2 = pairs.cache()
    # C3: candidates from L2 prefix join + subset prune on (y, z)
    p1, p2 = l2.alias("p1"), l2.alias("p2")
    cand = (
        p1.join(
            p2,
            (F.col("p2.x") == F.col("p1.x")) & (F.col("p2.y") > F.col("p1.y")),
        )
        .select(
            F.col("p1.x").alias("ca"),
            F.col("p1.y").alias("cb"),
            F.col("p2.y").alias("cc"),
        )
        .join(
            l2,
            (F.col("x") == F.col("cb")) & (F.col("y") == F.col("cc")),
            "left_semi",
        )
    )
    # count support of candidates only: in-order pairs restricted to L2,
    # extended by a third item, restricted to C3
    op = pair_stream.join(
        l2,
        (F.col("x") == F.col("ba")) & (F.col("y") == F.col("bb")),
        "left_semi",
    )
    c3 = ob.alias("c")
    trip = (
        op.join(
            c3,
            (F.col("c.ok") == F.col("pok")) & (F.col("c.b") > F.col("bb")),
        )
        .select("pok", "ba", "bb", F.col("c.b").alias("bc"))
        .join(
            F.broadcast(cand),
            (F.col("ca") == F.col("ba"))
            & (F.col("cb") == F.col("bb"))
            & (F.col("cc") == F.col("bc")),
            "left_semi",
        )
        .groupBy(
            F.col("ba").alias("brand_a"),
            F.col("bb").alias("brand_b"),
            F.col("bc").alias("brand_c"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .crossJoin(F.broadcast(thr))
        .filter(F.col("support") >= F.col("s"))
        .select("brand_a", "brand_b", "brand_c", "support")
    )
    return trip.orderBy(
        F.desc("support"), "brand_a", "brand_b", "brand_c"
    )
