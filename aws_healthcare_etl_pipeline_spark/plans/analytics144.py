"""Wave-170 (round 5): snapshot reconciliation + embedding
quantization economics.

* ``lakehouse_snapshot_diff_audit`` — the table-diff every CDC
  validation and blue/green migration runs: two deterministic
  snapshots of orders (v2 plants +5%-repriced rows, drops a keyed
  slice, and gains a date slice), reconciled by ONE full-outer join
  on the primary key into added / deleted / modified / unchanged
  counts plus the net revenue delta.

* ``emb_int8_quantization_error`` — the int8 quantization bake-off
  (symmetric absmax vs asymmetric min/max zero-point) on lattice-
  quantized embeddings, with per-vector relative reconstruction
  error in permille and the error histogram per scheme. Truncating
  division on negatives rides the DECIMAL(38)/HUGEINT pair (the
  repo's verified trunc-division idiom) so both engines round
  identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_DIFF_CUT = "1998-01-01"
_DIFF_ADD_END = "1998-07-01"


@query(
    "lakehouse_snapshot_diff_audit",
    oracle=f"""
        WITH v1 AS (
            SELECT o_orderkey AS k,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS cents
            FROM orders WHERE o_orderdate < DATE '{_DIFF_CUT}'
        ), v2 AS (
            SELECT o_orderkey AS k,
                   CASE WHEN o_custkey % 97 = 0
                        THEN CAST(CAST(o_totalprice AS DECIMAL(15,2))
                             * 100 AS BIGINT) * 105 // 100
                        ELSE CAST(CAST(o_totalprice AS DECIMAL(15,2))
                             * 100 AS BIGINT) END AS cents
            FROM orders
            WHERE o_orderdate < DATE '{_DIFF_ADD_END}'
              AND o_orderkey % 89 <> 0
        ), joined AS (
            SELECT v1.k AS k1, v2.k AS k2,
                   v1.cents AS c1, v2.cents AS c2
            FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
        )
        SELECT CAST(SUM(CASE WHEN k1 IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_added,
               CAST(SUM(CASE WHEN k2 IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_deleted,
               CAST(SUM(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL
                        AND c1 <> c2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_modified,
               CAST(SUM(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL
                        AND c1 = c2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unchanged,
               CAST(SUM(COALESCE(c2, 0)) - SUM(COALESCE(c1, 0))
                   AS BIGINT) AS revenue_delta_cents
        FROM joined
    """,
    description="Snapshot reconciliation, the CDC-validation query: "
    "two deterministic orders snapshots (v2 reprices custkey % 97 "
    "rows by +5% with truncating cents, drops orderkey % 89 rows, "
    "gains a 1998H1 date slice) diffed by ONE full-outer join on "
    "the primary key into added/deleted/modified/unchanged counts "
    "and the net revenue delta — the numbers a migration sign-off "
    "needs before cutover. 100 TB shape: a single PK full-outer "
    "join (co-partitioned shuffle, AQE-splittable) + map-side "
    "partial agg to one row; no window, no sort, no second pass. "
    "The same plan validates a Delta/Iceberg time-travel pair or a "
    "blue/green table swap.",
)
def lakehouse_snapshot_diff_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").localCheckpoint(
        eager=False
    )  # both snapshots derive from one scan
    cents = "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
    v1 = orders.where(
        F.col("o_orderdate") < F.lit(_DIFF_CUT).cast("date")
    ).selectExpr("o_orderkey AS k1", f"{cents} AS c1")
    v2 = (
        orders.where(
            (F.col("o_orderdate") < F.lit(_DIFF_ADD_END).cast("date"))
            & (F.col("o_orderkey") % 89 != 0)
        )
        .selectExpr(
            "o_orderkey AS k2",
            f"CASE WHEN o_custkey % 97 = 0"
            f" THEN {cents} * 105 div 100 ELSE {cents} END AS c2",
        )
    )
    joined = v1.join(v2, v1.k1 == v2.k2, "full_outer")
    return joined.agg(
        F.sum(F.when(F.col("k1").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_added"),
        F.sum(F.when(F.col("k2").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_deleted"),
        F.sum(
            F.when(
                F.col("k1").isNotNull()
                & F.col("k2").isNotNull()
                & (F.col("c1") != F.col("c2")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_modified"),
        F.sum(
            F.when(
                F.col("k1").isNotNull()
                & F.col("k2").isNotNull()
                & (F.col("c1") == F.col("c2")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_unchanged"),
        (
            F.sum(F.coalesce(F.col("c2"), F.lit(0)))
            - F.sum(F.coalesce(F.col("c1"), F.lit(0)))
        )
        .cast("long")
        .alias("revenue_delta_cents"),
    )


_EQ_LATTICE = 1 << 10  # float -> integer lattice for exactness


@query(
    "emb_int8_quantization_error",
    oracle=f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                       e -> CAST(FLOOR(CAST(e AS DOUBLE)
                                       * {_EQ_LATTICE}.0) AS BIGINT))
                       AS v
            FROM embeddings
        ), stats AS (
            SELECT vec_id, v,
                   GREATEST(list_max(list_transform(v, x -> ABS(x))), 1)
                       AS s,
                   list_min(v) AS lo,
                   GREATEST(list_max(v) - list_min(v), 1) AS rng
            FROM q
        ), errs AS (
            SELECT vec_id,
                   list_sum(list_transform(v, x -> ABS(x))) AS mass,
                   list_sum(list_transform(v, x -> ABS(x
                       - CAST(CAST(CAST(x AS HUGEINT) * 127 // s
                              AS HUGEINT) * s // 127 AS BIGINT))))
                       AS err_sym,
                   list_sum(list_transform(v, x -> ABS(x
                       - CAST(lo + CAST(CAST(CAST(x - lo AS HUGEINT)
                              * 255 // rng AS HUGEINT) * rng // 255
                              AS BIGINT) AS BIGINT))))
                       AS err_asym
            FROM stats
        ), graded AS (
            SELECT 'symmetric_absmax' AS scheme,
                   CAST(err_sym * 1000 // GREATEST(mass, 1) AS BIGINT)
                       AS err_permille
            FROM errs
            UNION ALL
            SELECT 'asymmetric_minmax',
                   CAST(err_asym * 1000 // GREATEST(mass, 1) AS BIGINT)
            FROM errs
        )
        SELECT scheme,
               CAST(err_permille // 2 AS BIGINT) AS err_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_vectors
        FROM graded
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    description="int8 quantization bake-off on lattice-quantized "
    "embeddings: symmetric absmax (q = x*127 div s, dequant q*s div "
    "127) vs asymmetric min/max zero-point (q = (x-lo)*255 div "
    "range), per-vector relative reconstruction error in permille "
    "of the vector's L1 mass, histogrammed per scheme (2-permille "
    "buckets). Negative-value truncation rides the verified "
    "DECIMAL(38)/HUGEINT trunc-division pair so both engines round "
    "identically; all arithmetic is JVM-side higher-order array "
    "functions (transform/aggregate), no UDF. 100 TB shape: one "
    "narrow pass per vector, no shuffle until the bucket rollup — "
    "the storage-vs-recall decision every vector database makes, "
    "measured on this corpus.",
)
def emb_int8_quantization_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.selectExpr(
        "vec_id",
        f"transform(embedding, e -> CAST(FLOOR(CAST(e AS DOUBLE)"
        f" * {_EQ_LATTICE}.0) AS BIGINT)) AS v",
    )
    stats = q.selectExpr(
        "vec_id",
        "v",
        "GREATEST(array_max(transform(v, x -> ABS(x))), 1) AS s",
        "array_min(v) AS lo",
        "GREATEST(array_max(v) - array_min(v), 1) AS rng",
    )
    errs = stats.selectExpr(
        "vec_id",
        "aggregate(v, CAST(0 AS BIGINT), (acc, x) -> acc + ABS(x))"
        " AS mass",
        "aggregate(v, CAST(0 AS BIGINT), (acc, x) -> acc + ABS(x"
        " - CAST(CAST(CAST(x AS DECIMAL(38,0)) * 127 div s"
        " AS DECIMAL(38,0)) * s div 127 AS BIGINT))) AS err_sym",
        "aggregate(v, CAST(0 AS BIGINT), (acc, x) -> acc + ABS(x"
        " - CAST(lo + CAST(CAST(CAST(x - lo AS DECIMAL(38,0))"
        " * 255 div rng AS DECIMAL(38,0)) * rng div 255"
        " AS BIGINT) AS BIGINT))) AS err_asym",
    )
    graded = errs.selectExpr(
        "stack(2,"
        " 'symmetric_absmax',"
        " CAST(err_sym * 1000 div GREATEST(mass, 1) AS BIGINT),"
        " 'asymmetric_minmax',"
        " CAST(err_asym * 1000 div GREATEST(mass, 1) AS BIGINT)"
        ") AS (scheme, err_permille)"
    )
    return (
        graded.groupBy(
            "scheme",
            F.expr("CAST(err_permille div 2 AS BIGINT)").alias(
                "err_bucket"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("scheme", "err_bucket")
    )
