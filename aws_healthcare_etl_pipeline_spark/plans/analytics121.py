"""Wave-147 (round 5): exact KNN-Shapley data valuation + Kendall tau.

* ``data_shapley_knn_exact`` — per-training-point data valuation by
  the EXACT KNN-Shapley formula (Jia et al., PVLDB'19): for a test
  point, sort the corpus by similarity and apply the backward
  recursion s_j = s_{j+1} + (1[y_j=y] - 1[y_{j+1}=y]) *
  min(K,j)/(K*j).  The recursion telescopes into a REVERSE CUMSUM of
  per-rank deltas — so the whole valuation is two window passes, no
  sequential scan.  Each delta is quantized to integer micros by
  truncating division (negatives included — the verified
  DECIMAL(38) div <-> HUGEINT // trunc idiom), so both engines agree
  bit-for-bit; the emitted sum_s checksum approximates the full-set
  utility (fraction of the K nearest with a matching label) within
  N micros.  Cosine ranks reuse the bit-identical left-to-right
  fold parity the KNN-accuracy harness established.
* ``rank_kendall_tau_nations`` — Kendall's tau between nation
  revenue rankings in 1997 vs 1998: concordant/discordant pair
  counts over the bounded 25-nation table with exact DECIMAL cent
  revenue (ties counted in neither), tau_a emitted as a truncated
  permille alongside the raw C/D/tie counts — the rank-stability
  sibling of the existing Spearman and RBO queries, computed without
  any square root.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot, l2_norm
from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ exact KNN-Shapley

_DS_QUERIES = 8
_DS_K = 5


@query(
    "data_shapley_knn_exact",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id,
                   CAST(embedding AS DOUBLE[]) AS qv,
                   label AS true_label
            FROM embeddings WHERE vec_id < {_DS_QUERIES}
        ), c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv, label
            FROM embeddings
        ), scored AS (
            SELECT query_id, true_label, vec_id, c.label,
                   list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(cv, cv))) AS cosine
            FROM q, c WHERE vec_id <> query_id
        ), ranked AS (
            SELECT query_id, true_label, vec_id,
                   CASE WHEN label = true_label THEN 1 ELSE 0 END
                       AS ind,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, vec_id) AS j,
                   COUNT(*) OVER (PARTITION BY query_id) AS n
            FROM scored
        ), deltas AS (
            SELECT query_id, true_label, vec_id, ind, j, n,
                   COALESCE(
                       CAST((ind - LEAD(ind) OVER w)
                            * LEAST({_DS_K}, j) AS HUGEINT)
                       * 1000000 // ({_DS_K} * j), 0) AS delta
            FROM ranked
            WINDOW w AS (PARTITION BY query_id ORDER BY j)
        ), vals AS (
            SELECT query_id, true_label, vec_id,
                   CAST(FIRST_VALUE(ind) OVER wfull AS HUGEINT)
                       * 1000000 // n
                   + SUM(delta) OVER wrev AS s_micro
            FROM deltas
            WINDOW wfull AS (PARTITION BY query_id ORDER BY j DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING),
                   wrev AS (PARTITION BY query_id ORDER BY j DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)
        ), top AS (
            SELECT query_id, true_label, vec_id, s_micro,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY s_micro DESC, vec_id) AS rn
            FROM vals
        )
        SELECT query_id, true_label,
               CAST(COUNT(*) AS BIGINT) AS n_train,
               CAST(SUM(s_micro) AS BIGINT) AS sum_s_micro,
               CAST(SUM(CASE WHEN s_micro > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_positive,
               CAST(SUM(CASE WHEN s_micro < 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_negative,
               CAST(MAX(CASE WHEN rn = 1 THEN vec_id END)
                    AS BIGINT) AS top_vec_id,
               CAST(MAX(CASE WHEN rn = 1 THEN s_micro END)
                    AS BIGINT) AS top_s_micro
        FROM top
        GROUP BY query_id, true_label
        ORDER BY query_id
    """,
    description="Per-training-point data valuation by the EXACT "
    "KNN-Shapley formula: the backward recursion s_j = s_{{j+1}} + "
    "(1[y_j=y]-1[y_{{j+1}}=y])*min(K,j)/(K*j) telescopes into a "
    "reverse cumulative sum of per-rank deltas, so the whole "
    "valuation is two window passes over per-query ranked "
    "candidates — no sequential scan, no subset enumeration. Each "
    "delta is quantized to integer micros with truncating division "
    "(negatives verified under the DECIMAL(38) div / HUGEINT // "
    "idiom); the sum_s checksum equals the full-set KNN utility "
    "within N micros. 100 TB shape: the 8-query panel broadcasts, "
    "the corpus is scanned once (bit-identical fold cosine), and "
    "the per-query full ranking is the honest price of exactness — "
    "the description of record for swapping in an ANN-truncated "
    "variant. Ref parity: reuses the KNN-accuracy harness' "
    "ordering so valuations are consistent with the eval lane.",
)
def data_shapley_knn_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _DS_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("true_label"),
    )
    q = F.broadcast(
        queries_df.withColumn("q_norm", l2_norm(F.col("query_vec")))
    )
    c = emb.select("vec_id", "embedding", "label").withColumn(
        "c_norm", l2_norm(F.col("embedding"))
    )
    scored = (
        c.crossJoin(q)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "true_label",
            "vec_id",
            F.when(F.col("label") == F.col("true_label"), 1)
            .otherwise(0)
            .alias("ind"),
            (
                dot(F.col("query_vec"), F.col("embedding"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine"),
        )
    )
    wrank = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    wpart = Window.partitionBy("query_id")
    ranked = scored.select(
        "query_id",
        "true_label",
        "vec_id",
        "ind",
        F.row_number().over(wrank).alias("j"),
        F.count(F.lit(1)).over(wpart).alias("n"),
    )
    deltas = ranked.withColumn(
        "delta",
        F.coalesce(
            F.expr(
                f"CAST((ind - LEAD(ind) OVER (PARTITION BY query_id"
                f" ORDER BY j)) * LEAST({_DS_K}, j) AS DECIMAL(38,0))"
                f" * 1000000 div ({_DS_K} * j)"
            ),
            F.lit(0),
        ).cast("long"),
    )
    wfull = Window.partitionBy("query_id").orderBy(F.desc("j")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wrev = Window.partitionBy("query_id").orderBy(F.desc("j")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    vals = deltas.select(
        "query_id",
        "true_label",
        "vec_id",
        "n",
        F.first("ind").over(wfull).alias("ind_last"),
        F.sum("delta").over(wrev).alias("cum"),
    ).select(
        "query_id",
        "true_label",
        "vec_id",
        (
            F.expr(
                "CAST(CAST(ind_last AS DECIMAL(38,0)) * 1000000"
                " div n AS BIGINT)"
            )
            + F.col("cum")
        ).alias("s_micro"),
    )
    wtop = Window.partitionBy("query_id").orderBy(
        F.desc("s_micro"), F.asc("vec_id")
    )
    top = vals.withColumn("rn", F.row_number().over(wtop))
    return (
        top.groupBy("query_id", "true_label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train"),
            F.sum("s_micro").cast("long").alias("sum_s_micro"),
            F.sum(F.when(F.col("s_micro") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_positive"),
            F.sum(F.when(F.col("s_micro") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_negative"),
            F.max(F.when(F.col("rn") == 1, F.col("vec_id")))
            .cast("long")
            .alias("top_vec_id"),
            F.max(F.when(F.col("rn") == 1, F.col("s_micro")))
            .cast("long")
            .alias("top_s_micro"),
        )
        .orderBy("query_id")
    )


# ------------------------------------------------ Kendall tau


@query(
    "rank_kendall_tau_nations",
    oracle="""
        WITH rev AS (
            SELECT n.n_name,
                   SUM(CASE WHEN EXTRACT(year FROM o.o_orderdate)
                            = 1997 THEN
                       CAST(l.l_extendedprice AS DECIMAL(15,2))
                       * (1 - CAST(l.l_discount AS DECIMAL(15,2)))
                       ELSE 0 END) AS x,
                   SUM(CASE WHEN EXTRACT(year FROM o.o_orderdate)
                            = 1998 THEN
                       CAST(l.l_extendedprice AS DECIMAL(15,2))
                       * (1 - CAST(l.l_discount AS DECIMAL(15,2)))
                       ELSE 0 END) AS y
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY n.n_name
        ), pairs AS (
            SELECT CASE WHEN (a.x < b.x AND a.y < b.y)
                          OR (a.x > b.x AND a.y > b.y)
                        THEN 1 ELSE 0 END AS conc,
                   CASE WHEN (a.x < b.x AND a.y > b.y)
                          OR (a.x > b.x AND a.y < b.y)
                        THEN 1 ELSE 0 END AS disc,
                   CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tie_x,
                   CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS tie_y
            FROM rev a JOIN rev b ON a.n_name < b.n_name
        )
        SELECT CAST(SUM(conc) AS BIGINT) AS concordant,
               CAST(SUM(disc) AS BIGINT) AS discordant,
               CAST(SUM(tie_x) AS BIGINT) AS ties_x,
               CAST(SUM(tie_y) AS BIGINT) AS ties_y,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST((SUM(conc) - SUM(disc)) * 1000 // COUNT(*)
                    AS BIGINT) AS tau_a_permille
        FROM pairs
    """,
    description="Kendall's tau between nation revenue rankings in "
    "1997 vs 1998: concordant/discordant pair counts over the "
    "bounded 25-nation table with exact DECIMAL cent revenue (ties "
    "in neither bucket), tau_a as a truncated permille next to the "
    "raw C/D/tie counts — the rank-stability sibling of Spearman "
    "and RBO, computed with no square root so it is bit-exact. "
    "100 TB shape: one fact-side aggregation with conditional "
    "year sums (single shuffle to 25 rows), then an all-pairs "
    "comparison on the bounded dimension table — the pair join "
    "never touches fact-grain data.",
)
def rank_kendall_tau_nations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    net = (
        F.col("l_extendedprice").cast("decimal(15,2)")
        * (1 - F.col("l_discount").cast("decimal(15,2)"))
    )
    rev = (
        lineitem.join(
            orders, orders.o_orderkey == lineitem.l_orderkey
        )
        .join(customer, customer.c_custkey == orders.o_custkey)
        .join(
            F.broadcast(nation),
            nation.n_nationkey == customer.c_nationkey,
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                F.when(F.year("o_orderdate") == 1997, net).otherwise(
                    F.lit(0)
                )
            ).alias("x"),
            F.sum(
                F.when(F.year("o_orderdate") == 1998, net).otherwise(
                    F.lit(0)
                )
            ).alias("y"),
        )
    )
    a = rev.select(
        F.col("n_name").alias("na"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = rev.select(
        F.col("n_name").alias("nb"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    pairs = a.join(F.broadcast(b), F.col("na") < F.col("nb")).select(
        F.when(
            ((F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")))
            | (
                (F.col("xa") > F.col("xb"))
                & (F.col("ya") > F.col("yb"))
            ),
            1,
        )
        .otherwise(0)
        .alias("conc"),
        F.when(
            ((F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")))
            | (
                (F.col("xa") > F.col("xb"))
                & (F.col("ya") < F.col("yb"))
            ),
            1,
        )
        .otherwise(0)
        .alias("disc"),
        F.when(F.col("xa") == F.col("xb"), 1).otherwise(0).alias(
            "tie_x"
        ),
        F.when(F.col("ya") == F.col("yb"), 1).otherwise(0).alias(
            "tie_y"
        ),
    )
    return pairs.agg(
        F.sum("conc").cast("long").alias("concordant"),
        F.sum("disc").cast("long").alias("discordant"),
        F.sum("tie_x").cast("long").alias("ties_x"),
        F.sum("tie_y").cast("long").alias("ties_y"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr(
            "CAST((SUM(conc) - SUM(disc)) * 1000 div COUNT(*)"
            " AS BIGINT)"
        ).alias("tau_a_permille"),
    )
