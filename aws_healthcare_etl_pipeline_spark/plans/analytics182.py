"""Wave-208 (round 5): the three-way totals reconciliation.

``finance_order_total_reconciliation`` — the accounts-payable
control that catches both data bugs and contract drift: each order's
header total is recomputed from its lines as
sum(extendedprice * (1 - discount) * (1 + tax)) in EXACT decimal
arithmetic (the TPC-H construction rule), and the header-vs-detail
difference is audited per order status — match counts, total
absolute drift in cents, and the worst single order. A nonzero
drift row is either an ingest bug or a business rule the schema
doesn't document; either way the control's job is to say so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# exact decimal recomputation of a line's contribution, in cents x 1
# (ext has 2dp, disc/tax 2dp -> product has 6dp; x100 cents keeps 4dp
# which round-trips exactly in DECIMAL)
_LINE_CENTS = (
    "CAST(l_extendedprice AS DECIMAL(15,2))"
    " * (1 - CAST(l_discount AS DECIMAL(3,2)))"
    " * (1 + CAST(l_tax AS DECIMAL(3,2))) * 100"
)


@query(
    "finance_order_total_reconciliation",
    oracle=f"""
        WITH detail AS (
            SELECT l_orderkey AS k,
                   CAST(SUM({_LINE_CENTS}) AS DECIMAL(38,4))
                       AS recomputed
            FROM lineitem GROUP BY 1
        ), recon AS (
            SELECT o.o_orderstatus AS status,
                   CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                        AS DECIMAL(38,4)) AS header,
                   d.recomputed
            FROM orders o JOIN detail d ON d.k = o.o_orderkey
        )
        SELECT status,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN ABS(header - recomputed) < 1
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_within_one_cent,
               CAST(FLOOR(SUM(CAST(ABS(header - recomputed) AS
                        DECIMAL(38,4)))) AS BIGINT)
                   AS total_drift_cents,
               CAST(FLOOR(MAX(ABS(header - recomputed))) AS BIGINT)
                   AS worst_drift_cents
        FROM recon
        GROUP BY status
        ORDER BY status
    """,
    description="Header-vs-detail totals reconciliation, the AP "
    "control: each order's header total is recomputed from its "
    "lines as sum(ext * (1 - disc) * (1 + tax)) in EXACT decimal "
    "(2dp x 2dp x 2dp = 6dp products, no float ever), and the "
    "per-status audit reports orders within one cent, total "
    "absolute drift, and the worst single order. Whether the "
    "fixture generator applied the TPC-H rule exactly is itself "
    "DISCOVERED by this query, not assumed — the drift columns are "
    "the finding. 100 TB shape: one orderkey-local detail "
    "aggregation co-shuffled with the header join, one bounded "
    "status rollup — the reconciliation every ledger pair (events "
    "vs billing, raw vs mart) should run nightly.",
)
def finance_order_total_reconciliation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    detail = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.expr(
            f"CAST(SUM({_LINE_CENTS}) AS DECIMAL(38,4))"
        ).alias("recomputed")
    )
    recon = orders.join(detail, detail.k == orders.o_orderkey).select(
        F.col("o_orderstatus").alias("status"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100"
            " AS DECIMAL(38,4))"
        ).alias("header"),
        "recomputed",
    )
    return (
        recon.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(
                F.when(
                    F.abs(F.col("header") - F.col("recomputed")) < 1, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_within_one_cent"),
            F.expr(
                "CAST(FLOOR(SUM(CAST(ABS(header - recomputed) AS"
                " DECIMAL(38,4)))) AS BIGINT)"
            ).alias("total_drift_cents"),
            F.expr(
                "CAST(FLOOR(MAX(ABS(header - recomputed))) AS BIGINT)"
            ).alias("worst_drift_cents"),
        )
        .orderBy("status")
    )
