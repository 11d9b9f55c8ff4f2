"""Wave-99 (round 5): the canonical DP + embedding outlier mining.

* ``scheduling_knapsack_exact`` — 0/1 knapsack per customer (weights
  from order keys, values exact cents, capacity 25), rolled up to
  nation: THE canonical dynamic program, executed as an Arrow-
  batched keyed scan carrying the capacity-indexed DP array
  (parallel across customers, sequential within — the information-
  theoretic minimum for a recurrence whose state is the whole
  dp[0..W] vector), and proven step-exactly by a DuckDB RECURSIVE
  CTE carrying the same dp array as a growing-free fixed-width
  LIST (the weighted-interval precedent, applied to the textbook
  problem).
* ``emb_knn_distance_outliers`` — distance-based outlier mining for
  embedding cleaning: every vector of an md5-chosen panel is scored
  by its 5th-nearest-neighbor squared distance over the FULL corpus
  on the 1/1024 integer lattice (quantization by a power of two is
  exact, so d2 is a pure integer and the ranking engine-portable),
  and the 10 most isolated vectors surface — the 'these points are
  probably garbage or mislabeled' report that precedes embedding-
  space training.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.keyscan import keyed_pandas_scan
from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------------- 0/1 knapsack

_KS_CAP = 25  # capacity per customer
_KS_WMOD = 10  # item weight: (o_orderkey % 10) + 1


@query(
    "scheduling_knapsack_exact",
    oracle=f"""
        WITH RECURSIVE items AS (
            SELECT o_custkey AS ck,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderkey) AS i,
                   CAST((o_orderkey % {_KS_WMOD}) + 1 AS BIGINT) AS w,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v
            FROM orders
        ), span AS (
            SELECT ck, MAX(i) AS n_items FROM items GROUP BY ck
        ), dp(ck, i, arr) AS (
            SELECT ck, CAST(0 AS BIGINT),
                   list_transform(range(0, {_KS_CAP + 1}),
                                  c -> CAST(0 AS BIGINT))
            FROM span
            UNION ALL
            SELECT d.ck, d.i + 1,
                   list_transform(range(0, {_KS_CAP + 1}), c ->
                       CASE WHEN c >= it.w
                            THEN GREATEST(
                                d.arr[CAST(c + 1 AS INT)],
                                it.v + d.arr[CAST(c - it.w + 1 AS INT)])
                            ELSE d.arr[CAST(c + 1 AS INT)] END)
            FROM dp d JOIN items it
              ON it.ck = d.ck AND it.i = d.i + 1
        ), percust AS (
            SELECT d.ck, s.n_items,
                   d.arr[{_KS_CAP + 1}] AS opt
            FROM dp d JOIN span s ON s.ck = d.ck AND d.i = s.n_items
        )
        SELECT c.c_nationkey AS nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(p.n_items) AS BIGINT) AS n_items,
               CAST(SUM(p.opt) AS BIGINT) AS opt_value_cents
        FROM percust p JOIN customer c ON c.c_custkey = p.ck
        GROUP BY c.c_nationkey
        ORDER BY nationkey
    """,
    description="0/1 knapsack per customer — THE canonical DP: items "
    "are the customer's orders (weight (orderkey mod 10) + 1, value "
    "exact cents, capacity 25), optimum value rolled up to nation. "
    "The recurrence's state is the entire dp[0..25] vector (random "
    "access at c - w), provably not a window/prefix shape, so "
    "execution is the Arrow-batched keyed scan — parallel ACROSS "
    "customers, sequential within — and the DuckDB RECURSIVE CTE "
    "carries the same fixed-width dp LIST per step; the hash match "
    "proves every relaxation. At 100 TB: one shuffle on customer "
    "key, per-key item counts bounded by order history, dp width a "
    "constant — the per-entity-optimization shape (budget "
    "allocation, shelf packing) warehouses push to app code.",
)
def scheduling_knapsack_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    items = orders.select(
        F.col("o_custkey").alias("ck"),
        "o_orderkey",
        ((F.col("o_orderkey") % _KS_WMOD) + 1).cast("long").alias("w"),
        (F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("v"),
    )
    cap = _KS_CAP

    def knap(pdf: pd.DataFrame) -> pd.DataFrame:
        # self-contained closure; rows pre-sorted by o_orderkey
        dp = [0] * (cap + 1)
        for w, v in zip(pdf["w"].tolist(), pdf["v"].tolist()):
            w, v = int(w), int(v)
            for c in range(cap, w - 1, -1):
                cand = v + dp[c - w]
                if cand > dp[c]:
                    dp[c] = cand
        return pd.DataFrame(
            {
                "ck": [int(pdf["ck"].iloc[0])],
                "n_items": [len(pdf)],
                "opt": [dp[cap]],
            }
        )

    percust = keyed_pandas_scan(
        items, "ck", ["o_orderkey"], knap, "ck long, n_items long, opt long"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    return (
        percust.join(cust, percust.ck == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("n_items").cast("long").alias("n_items"),
            F.sum("opt").cast("long").alias("opt_value_cents"),
        )
        .orderBy("nationkey")
    )


# ------------------------------------------- kNN-distance outliers

_OUT_PANEL = 128
_OUT_K = 5
_OUT_TOP = 10
_OUT_DIM = 64
_OUT_Q = 1024.0


@query(
    "emb_knn_distance_outliers",
    oracle=f"""
        WITH panel AS (
            SELECT vec_id, embedding FROM (
                SELECT vec_id, embedding,
                       ROW_NUMBER() OVER (
                           ORDER BY md5('o:' || CAST(vec_id AS VARCHAR)),
                                    vec_id) AS rk
                FROM embeddings
            ) t WHERE rk <= {_OUT_PANEL}
        ), pq AS (
            SELECT p.vec_id, t.dim,
                   CAST(floor(CAST(p.embedding[CAST(t.dim AS INT)]
                                   AS DOUBLE) * {_OUT_Q}) AS BIGINT) AS q
            FROM panel p, range(1, {_OUT_DIM + 1}) t(dim)
        ), cq AS (
            SELECT e.vec_id, t.dim,
                   CAST(floor(CAST(e.embedding[CAST(t.dim AS INT)]
                                   AS DOUBLE) * {_OUT_Q}) AS BIGINT) AS q
            FROM embeddings e, range(1, {_OUT_DIM + 1}) t(dim)
        ), dists AS (
            SELECT p.vec_id AS panel_id, c.vec_id AS other_id,
                   CAST(SUM((p.q - c.q) * (p.q - c.q)) AS BIGINT) AS d2
            FROM pq p JOIN cq c ON c.dim = p.dim
            WHERE p.vec_id <> c.vec_id
            GROUP BY p.vec_id, c.vec_id
        ), knn AS (
            SELECT panel_id, d2,
                   ROW_NUMBER() OVER (PARTITION BY panel_id
                                      ORDER BY d2, other_id) AS rk
            FROM dists
        )
        SELECT panel_id AS vec_id, d2 AS knn_d2
        FROM knn WHERE rk = {_OUT_K}
        ORDER BY knn_d2 DESC, vec_id
        LIMIT {_OUT_TOP}
    """,
    description="Distance-based embedding outlier mining: every "
    "vector of a 128-strong md5-chosen panel is scored by its 5th-"
    "nearest-neighbor SQUARED distance over the full corpus on the "
    "1/1024 integer lattice (power-of-two quantization is exact in "
    "FP, so d2 is a pure integer and the isolation ranking engine-"
    "portable, deterministic ties by neighbor id), and the 10 most "
    "isolated vectors surface — the garbage/mislabel sweep that "
    "precedes embedding-space training. Scale: the panel is fixed-"
    "size and broadcast, so scoring is one corpus scan x 128 (a "
    "bounded multiplier, never all-pairs); per-panel-vector kNN is "
    "a WindowGroupLimit, and the report is top-10.",
)
def emb_knn_distance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    wp = Window.orderBy(
        F.md5(F.concat(F.lit("o:"), F.col("vec_id").cast("string"))),
        "vec_id",
    )
    panel = (
        emb.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= _OUT_PANEL)
        .select(
            F.col("vec_id").alias("panel_id"),
            F.col("embedding").alias("p_emb"),
        )
    )
    def qarr(col: str) -> F.Column:
        # per-element power-of-two quantization: exact in FP, so the
        # integer arrays (and every d2 below) are engine-portable
        return F.transform(
            F.col(col),
            lambda x: F.floor(x.cast("double") * F.lit(_OUT_Q)).cast("long"),
        )

    pq = panel.select("panel_id", qarr("p_emb").alias("pa"))
    cq = emb.select("vec_id", qarr("embedding").alias("qa"))
    # pair stream = corpus x broadcast panel (bounded x128 multiplier);
    # d2 is a JVM-side zip_with/aggregate integer fold per pair — no
    # dim-exploded shuffle (that form moves 64x more rows)
    dists = (
        cq.crossJoin(F.broadcast(pq))
        .filter(F.col("panel_id") != F.col("vec_id"))
        .select(
            "panel_id",
            F.col("vec_id").alias("other_id"),
            F.aggregate(
                F.zip_with(
                    F.col("qa"),
                    F.col("pa"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
    )
    wk = Window.partitionBy("panel_id").orderBy("d2", "other_id")
    return (
        dists.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") == _OUT_K)
        .select(F.col("panel_id").alias("vec_id"), F.col("d2").alias("knn_d2"))
        .orderBy(F.col("knn_d2").desc(), "vec_id")
        .limit(_OUT_TOP)
    )
