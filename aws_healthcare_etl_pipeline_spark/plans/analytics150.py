"""Wave-176 (round 5): decorrelation equivalence + embedding
class separation.

* ``sql_decorrelation_equivalence`` — the same question ("customers
  above their nation's average balance") asked through a CORRELATED
  scalar subquery and through the manual join+groupBy rewrite, with
  the per-nation equality of both counts emitted. Catalyst and
  DuckDB both decorrelate internally — this battery proves the
  rewrite they promise, per group, as data.

* ``emb_fisher_label_separation`` — Fisher-style class separation on
  the labeled embeddings: within-class scatter via the exact integer
  identity n*sum(|x|^2) - |sum(x)|^2 (never a float mean), between-
  class scatter as the total-minus-within remainder, and the
  separation ratio in permille. The lattice quantization makes every
  scatter an exact integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


@query(
    "sql_decorrelation_equivalence",
    oracle="""
        WITH via_corr AS (
            SELECT c_nationkey AS nk,
                   CAST(COUNT(*) AS BIGINT) AS n_above_corr
            FROM customer c1
            WHERE CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
                       AS BIGINT)
                  > (SELECT CAST(SUM(CAST(c2.c_acctbal
                             AS DECIMAL(12,2)) * 100) AS BIGINT)
                             // COUNT(*)
                     FROM customer c2
                     WHERE c2.c_nationkey = c1.c_nationkey)
            GROUP BY c_nationkey
        ), means AS (
            SELECT c_nationkey AS nk,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * 100)
                        AS BIGINT) // COUNT(*) AS mean_cents
            FROM customer GROUP BY c_nationkey
        ), via_join AS (
            SELECT c.c_nationkey AS nk,
                   CAST(COUNT(*) AS BIGINT) AS n_above_join
            FROM customer c JOIN means m ON m.nk = c.c_nationkey
            WHERE CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100
                       AS BIGINT) > m.mean_cents
            GROUP BY c.c_nationkey
        )
        SELECT j.nk AS nationkey, j.n_above_join,
               COALESCE(c.n_above_corr, 0) AS n_above_corr,
               j.n_above_join = COALESCE(c.n_above_corr, 0)
                   AS rewrites_agree
        FROM via_join j LEFT JOIN via_corr c ON c.nk = j.nk
        ORDER BY nationkey
    """,
    description="Decorrelation equivalence, proven per group: "
    "'customers above their nation's average balance' asked through "
    "a CORRELATED scalar subquery (the form analysts write) and "
    "through the manual join+groupBy rewrite (the form engines "
    "execute after decorrelation), with per-nation equality flags "
    "in the result. The mean is the truncated integer-cents mean in "
    "both lanes so the comparison is quantization-identical. 100 TB "
    "shape: the rewrite lane is the scale path — one partial agg to "
    "25 nation means, broadcast back over the fact; the correlated "
    "lane exists to prove Catalyst's RewriteCorrelatedScalarSubquery "
    "produces exactly that plan — the optimizer trust-but-verify "
    "battery.",
)
def sql_decorrelation_equivalence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("sde_customer")
    via_corr = spark.sql(
        """
        SELECT c_nationkey AS nk,
               CAST(COUNT(*) AS BIGINT) AS n_above_corr
        FROM sde_customer c1
        WHERE CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
              > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))
                         * 100) AS BIGINT) div COUNT(*)
                 FROM sde_customer c2
                 WHERE c2.c_nationkey = c1.c_nationkey)
        GROUP BY c_nationkey
        """
    )
    means = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.expr(
            "CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * 100)"
            " AS BIGINT) div COUNT(*)"
        ).alias("mean_cents")
    )
    via_join = (
        cust.join(F.broadcast(means), means.nk == cust.c_nationkey)
        .where(
            F.expr(
                "CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100"
                " AS BIGINT) > mean_cents"
            )
        )
        .groupBy(F.col("c_nationkey").alias("jnk"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_above_join"))
    )
    return (
        via_join.join(
            via_corr, via_corr.nk == F.col("jnk"), "left"
        )
        .selectExpr(
            "jnk AS nationkey",
            "n_above_join",
            "COALESCE(n_above_corr, 0) AS n_above_corr",
            "n_above_join = COALESCE(n_above_corr, 0)"
            " AS rewrites_agree",
        )
        .orderBy("nationkey")
    )


_FL_LATTICE = 1 << 10
_FL_DIM = 64

_FL_DUCK_SUMS = ", ".join(
    f"CAST(SUM(v[{i + 1}]) AS HUGEINT) AS s{i}" for i in range(_FL_DIM)
)
_FL_DUCK_TSUMS = ", ".join(
    f"CAST(SUM(s{i}) AS HUGEINT) AS t{i}" for i in range(_FL_DIM)
)
_FL_SV_SQ = " + ".join(f"s{i} * s{i}" for i in range(_FL_DIM))
_FL_TV_SQ = " + ".join(f"t{i} * t{i}" for i in range(_FL_DIM))


@query(
    "emb_fisher_label_separation",
    oracle=f"""
        WITH q AS (
            SELECT label,
                   list_transform(embedding,
                       e -> CAST(FLOOR(CAST(e AS DOUBLE)
                                       * {_FL_LATTICE}.0) AS BIGINT))
                       AS v
            FROM embeddings
        ), per_label AS (
            SELECT label,
                   CAST(COUNT(*) AS HUGEINT) AS n_l,
                   CAST(SUM(list_sum(list_transform(v, x -> x * x)))
                        AS HUGEINT) AS ss_l,
                   {_FL_DUCK_SUMS}
            FROM q GROUP BY label
        ), scat AS (
            SELECT label, CAST(n_l AS BIGINT) AS n_l,
                   CAST((n_l * ss_l - ({_FL_SV_SQ}))
                        // n_l AS BIGINT) AS within_l
            FROM per_label
        ), tot AS (
            SELECT CAST(SUM(n_l) AS HUGEINT) AS n,
                   CAST(SUM(ss_l) AS HUGEINT) AS ss,
                   {_FL_DUCK_TSUMS}
            FROM per_label
        ), tots AS (
            SELECT CAST(n AS BIGINT) AS n,
                   CAST((n * ss - ({_FL_TV_SQ}))
                        // n AS BIGINT) AS total_scatter
            FROM tot
        ), agg AS (
            SELECT CAST(SUM(within_l) AS BIGINT) AS within_total,
                   CAST(COUNT(*) AS BIGINT) AS n_labels
            FROM scat
        )
        SELECT t.n AS n_vectors, a.n_labels, t.total_scatter,
               a.within_total,
               CAST(t.total_scatter - a.within_total AS BIGINT)
                   AS between_scatter,
               CAST((t.total_scatter - a.within_total) * 1000
                    // GREATEST(a.within_total, 1) AS BIGINT)
                   AS fisher_permille
        FROM tots t CROSS JOIN agg a
    """,
    description="Fisher-style class separation on the labeled "
    "embedding corpus, all exact integers: within-class scatter via "
    "the identity (n*sum|x|^2 - |sum x|^2) div n per label (no "
    "float mean ever formed), total scatter the same way globally, "
    "between-class scatter as the exact remainder, and the "
    "between/within ratio in permille — the one-number answer to "
    "'are these labels separable in this embedding space?'. Lattice "
    "quantization (2^10) keeps every squared sum in HUGEINT/"
    "DECIMAL(38) headroom at any corpus size. 100 TB shape: one "
    "narrow pass per vector into a per-label partial agg (64 "
    "dimension sums + one sum-of-squares, all map-side "
    "combinable), then bounded-label arithmetic — the embedding-"
    "quality gate before anyone trains a probe.",
)
def emb_fisher_label_separation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.selectExpr(
        "label",
        f"transform(embedding, e -> CAST(FLOOR(CAST(e AS DOUBLE)"
        f" * {_FL_LATTICE}.0) AS BIGINT)) AS v",
    )
    per_label = q.groupBy("label").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_l"),
        F.expr(
            "SUM(aggregate(v, CAST(0 AS BIGINT),"
            " (acc, x) -> acc + x * x))"
        )
        .cast("decimal(38,0)")
        .alias("ss_l"),
        *[
            F.expr(f"SUM(v[{i}])").cast("decimal(38,0)").alias(f"s{i}")
            for i in range(64)
        ],
    ).localCheckpoint(eager=False)  # bounded label table, 2 consumers
    sv_sq = " + ".join(f"s{i} * s{i}" for i in range(64))
    scat = per_label.selectExpr(
        "label",
        "CAST(n_l AS BIGINT) AS n_l",
        f"CAST((n_l * ss_l - ({sv_sq})) div n_l AS BIGINT)"
        " AS within_l",
    )
    tot = per_label.agg(
        F.sum("n_l").cast("decimal(38,0)").alias("n"),
        F.sum("ss_l").cast("decimal(38,0)").alias("ss"),
        *[
            F.sum(f"s{i}").cast("decimal(38,0)").alias(f"t{i}")
            for i in range(64)
        ],
    )
    tv_sq = " + ".join(f"t{i} * t{i}" for i in range(64))
    tots = tot.selectExpr(
        "CAST(n AS BIGINT) AS n",
        f"CAST((n * ss - ({tv_sq})) div n AS BIGINT)"
        " AS total_scatter",
    )
    agg = scat.agg(
        F.sum("within_l").cast("long").alias("within_total"),
        F.count(F.lit(1)).cast("long").alias("n_labels"),
    )
    return tots.crossJoin(F.broadcast(agg)).selectExpr(
        "n AS n_vectors",
        "n_labels",
        "total_scatter",
        "within_total",
        "CAST(total_scatter - within_total AS BIGINT)"
        " AS between_scatter",
        "CAST((total_scatter - within_total) * 1000"
        " div GREATEST(within_total, 1) AS BIGINT)"
        " AS fisher_permille",
    )
