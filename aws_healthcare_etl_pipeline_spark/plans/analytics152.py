"""Wave-178 (round 5): payments forensics + privacy generalization.

* ``audit_duplicate_payment_detector`` — the accounts-payable
  forensic classic: order pairs from the same customer with the
  IDENTICAL cent amount within 3 days. Blocking is the exact
  equi-join on (customer, amount) — the pair enumeration that stays
  linear because real amount collisions are rare — then the date
  band filters. Emits pair count, affected customers, and the
  distinct orders implicated.

* ``privacy_generalization_ladder`` — the minimal-generalization
  search behind every k-anonymity release: four quasi-identifier
  grains from finest (nation, segment, fine balance bucket) to
  coarsest (segment only), each graded by its minimum group size
  and the row mass sitting in groups below k = 5. The first rung
  whose k_min clears the bar is the release grain — found by
  grading all rungs at once, not by trial-and-error re-scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_DUP_DAYS = 3


@query(
    "audit_duplicate_payment_detector",
    oracle=f"""
        WITH pays AS MATERIALIZED (
            SELECT o_orderkey AS k, o_custkey AS ck, o_orderdate AS d,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS cents
            FROM orders
        ), pairs AS MATERIALIZED (
            SELECT a.ck, a.k AS k1, b.k AS k2
            FROM pays a JOIN pays b
              ON a.ck = b.ck AND a.cents = b.cents AND a.k < b.k
            WHERE ABS(date_diff('day', a.d, b.d)) <= {_DUP_DAYS}
        ), involved AS (
            SELECT k1 AS k FROM pairs
            UNION
            SELECT k2 FROM pairs
        )
        SELECT CAST((SELECT COUNT(*) FROM pairs) AS BIGINT)
                   AS n_pairs,
               CAST((SELECT COUNT(DISTINCT ck) FROM pairs) AS BIGINT)
                   AS n_customers,
               CAST((SELECT COUNT(*) FROM involved) AS BIGINT)
                   AS n_orders_involved
    """,
    description="Duplicate-payment forensics: order pairs from the "
    "same customer with the IDENTICAL cent amount within 3 days — "
    "the accounts-payable double-pay sweep. The pair enumeration is "
    "an exact equi-join on (customer, amount-cents), which is the "
    "correct blocking key: real amount collisions within a payer "
    "are rare, so the join output is near-linear while catching "
    "every candidate; the +/-3-day band then filters. Emits pair "
    "count, affected customers, distinct orders implicated. 100 TB "
    "shape: one shuffle on the compound blocking key, no windows, "
    "no cross join — the fraud-ops query that runs nightly on "
    "every payment ledger.",
)
def audit_duplicate_payment_detector(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pays = orders.selectExpr(
        "o_orderkey AS k",
        "o_custkey AS ck",
        "o_orderdate AS d",
        "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        " AS cents",
    ).localCheckpoint(eager=False)  # both join sides
    b = pays.selectExpr(
        "k AS k2", "ck AS ck2", "d AS d2", "cents AS cents2"
    )
    pairs = (
        pays.join(
            b,
            (F.col("ck") == F.col("ck2"))
            & (F.col("cents") == F.col("cents2"))
            & (F.col("k") < F.col("k2")),
        )
        .where(F.expr(f"ABS(datediff(d, d2)) <= {_DUP_DAYS}"))
        .select("ck", F.col("k").alias("k1"), "k2")
        .localCheckpoint(eager=False)  # feeds 3 aggregates
    )
    stats = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.countDistinct("ck").cast("long").alias("n_customers"),
    )
    involved = (
        pairs.select(F.col("k1").alias("k"))
        .unionAll(pairs.select(F.col("k2").alias("k")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders_involved"))
    )
    return stats.crossJoin(F.broadcast(involved))


_LADDER_K = 5

# (level name, grouping key expr list from customer); the balance
# bucket uses the portable truncating div on exact cents
_BAL = "CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
_LADDER: list[tuple[str, list[str]]] = [
    ("L0_nation_seg_bal10k",
     ["c_nationkey", "c_mktsegment", f"{_BAL} div 1000000"]),
    ("L1_nation_seg_bal100k",
     ["c_nationkey", "c_mktsegment", f"{_BAL} div 10000000"]),
    ("L2_nation_seg", ["c_nationkey", "c_mktsegment"]),
    ("L3_seg_only", ["c_mktsegment"]),
]


def _ladder_sql() -> str:
    rungs = []
    for name, keys in _LADDER:
        rungs.append(f"""
            SELECT '{name}' AS level,
                   CAST(MIN(gn) AS BIGINT) AS k_min,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(CASE WHEN gn < {_LADDER_K} THEN gn
                        ELSE 0 END) AS BIGINT) AS rows_below_k,
                   MIN(gn) >= {_LADDER_K} AS releasable
            FROM (SELECT COUNT(*) AS gn FROM customer
                  GROUP BY {", ".join(
                      k.replace(" div ", " // ") for k in keys)})
        """)
    return " UNION ALL ".join(rungs)


@query(
    "privacy_generalization_ladder",
    oracle=f"""
        SELECT level, k_min, n_groups, rows_below_k, releasable
        FROM ({_ladder_sql()})
        ORDER BY level
    """,
    description="The minimal-generalization search behind every "
    "k-anonymity release: four quasi-identifier grains from finest "
    "(nation, segment, $10k balance buckets) to coarsest (segment "
    "only), each graded by its minimum equivalence-class size, the "
    "row mass in classes below k=5 (the re-identification exposure), "
    "and a releasable flag — the first releasable rung is the grain "
    "a privacy office actually publishes. All rungs are graded in "
    "one query instead of trial-and-error re-scans. 100 TB shape: "
    "each rung is one partial-agg groupBy on a small key domain; "
    "rung outputs are bounded; generalization ladders over "
    "billion-row person tables are exactly this plan.",
)
def privacy_generalization_ladder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").localCheckpoint(
        eager=False
    )  # four rung group-bys over one scan
    rungs = []
    for name, keys in _LADDER:
        gn = cust.groupBy(
            *[F.expr(k) for k in keys]
        ).agg(F.count(F.lit(1)).alias("gn"))
        rungs.append(
            gn.agg(
                F.min("gn").cast("long").alias("k_min"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum(
                    F.when(
                        F.col("gn") < _LADDER_K, F.col("gn")
                    ).otherwise(0)
                )
                .cast("long")
                .alias("rows_below_k"),
                (F.min("gn") >= _LADDER_K).alias("releasable"),
            ).select(
                F.lit(name).alias("level"),
                "k_min",
                "n_groups",
                "rows_below_k",
                "releasable",
            )
        )
    out = rungs[0]
    for r in rungs[1:]:
        out = out.unionAll(r)
    return out.orderBy("level")
