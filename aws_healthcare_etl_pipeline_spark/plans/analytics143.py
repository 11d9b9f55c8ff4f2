"""Wave-169 (round 5): as-was BI semantics + growth accounting.

* ``scd_aswas_vs_asis_revenue`` — the classic slowly-changing-
  dimension restatement trap made measurable: a deterministic subset
  of customers changes segment on 1997-01-01 (md5-free rotation on
  custkey % 5), and revenue is attributed BOTH ways — as-is (today's
  segment applied retroactively, what a naive dim join reports) and
  as-was (the segment in effect at order time, what SCD2 preserves).
  The output is the full (aswas, asis) restatement matrix; off-
  diagonal rows are exactly the revenue a type-1 overwrite would
  silently move between segments.

* ``events_dau_mau_stickiness`` — DAU/MAU28 per day, EXACT: distinct
  user-days explode into the 28 trailing windows they serve (a
  constant x28 fan-out, not a per-day rescan), dedup to (user,
  window-day), and the stickiness ratio lands in permille. Day
  indexes are relative to the corpus min date so the query is
  vintage-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_SCD_CHANGE_DATE = "1997-01-01"

# deterministic segment rotation for the movers (custkey % 5 = 0)
_SEG_ROTATE = (
    "CASE c_mktsegment"
    " WHEN 'AUTOMOBILE' THEN 'BUILDING'"
    " WHEN 'BUILDING' THEN 'FURNITURE'"
    " WHEN 'FURNITURE' THEN 'HOUSEHOLD'"
    " WHEN 'HOUSEHOLD' THEN 'MACHINERY'"
    " ELSE 'AUTOMOBILE' END"
)


@query(
    "scd_aswas_vs_asis_revenue",
    oracle=f"""
        WITH dim AS (
            SELECT c_custkey,
                   c_mktsegment AS seg_v1,
                   CASE WHEN c_custkey % 5 = 0
                        THEN {_SEG_ROTATE}
                        ELSE c_mktsegment END AS seg_v2
            FROM customer
        ), attributed AS (
            SELECT CASE WHEN o.o_orderdate < DATE '{_SCD_CHANGE_DATE}'
                        THEN d.seg_v1 ELSE d.seg_v2 END AS aswas_seg,
                   d.seg_v2 AS asis_seg,
                   CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS cents
            FROM orders o JOIN dim d ON d.c_custkey = o.o_custkey
        )
        SELECT aswas_seg, asis_seg,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM attributed
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    description="The slowly-changing-dimension restatement trap, "
    "measured: customers with custkey % 5 = 0 rotate market segment "
    "on 1997-01-01, and revenue is attributed both as-is (today's "
    "segment applied retroactively — the naive dim join) and as-was "
    "(the segment in effect at order time — what SCD2 point-in-time "
    "joins preserve). The (aswas, asis) matrix puts every cent a "
    "type-1 overwrite would silently move between segments on an "
    "off-diagonal row — the BI-correctness argument as a query "
    "result. 100 TB shape: one fact-dim equi-join (dim broadcast-"
    "able), attribution is a per-row CASE, one partial-agg shuffle "
    "to the <= 25-cell matrix.",
)
def scd_aswas_vs_asis_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    dim = customer.selectExpr(
        "c_custkey",
        "c_mktsegment AS seg_v1",
        f"CASE WHEN c_custkey % 5 = 0 THEN {_SEG_ROTATE}"
        f" ELSE c_mktsegment END AS seg_v2",
    )
    attributed = orders.join(
        F.broadcast(dim), dim.c_custkey == orders.o_custkey
    ).selectExpr(
        f"CASE WHEN o_orderdate < DATE '{_SCD_CHANGE_DATE}'"
        f" THEN seg_v1 ELSE seg_v2 END AS aswas_seg",
        "seg_v2 AS asis_seg",
        "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        " AS cents",
    )
    return (
        attributed.groupBy("aswas_seg", "asis_seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("aswas_seg", "asis_seg")
    )


_MAU_WINDOW = 28


@query(
    "events_dau_mau_stickiness",
    oracle=f"""
        WITH user_days AS MATERIALIZED (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
            FROM events
        ), anchor AS (
            SELECT MIN(d) AS d0 FROM user_days
        ), pairs AS (
            SELECT u.user_id,
                   date_diff('day', a.d0, u.d) AS di
            FROM user_days u CROSS JOIN anchor a
        ), spine AS (
            SELECT DISTINCT di FROM pairs
        ), dau AS (
            SELECT di, CAST(COUNT(*) AS BIGINT) AS dau
            FROM pairs GROUP BY di
        ), contrib AS (
            SELECT DISTINCT p.user_id, p.di + i.i AS ti
            FROM pairs p,
                 (SELECT UNNEST(range(0, {_MAU_WINDOW})) AS i) i
        ), mau AS (
            SELECT c.ti AS di, CAST(COUNT(*) AS BIGINT) AS mau
            FROM contrib c JOIN spine s ON s.di = c.ti
            GROUP BY c.ti
        )
        SELECT d.di AS day_idx, d.dau, m.mau,
               CAST(d.dau * 1000 // m.mau AS BIGINT)
                   AS stickiness_permille
        FROM dau d JOIN mau m ON m.di = d.di
        ORDER BY day_idx
    """,
    description="DAU/MAU28 stickiness per day, EXACT sliding "
    "distinct with no per-day rescan: distinct user-days explode "
    "into the 28 trailing window-days they serve (a CONSTANT x28 "
    "fan-out — the explode-by-constant trick that beats re-scanning "
    "28 days of data per report day), dedup to (user, window-day), "
    "count, and join back to the observed-day spine. Day indexes "
    "are relative to the corpus min date, so the query is events-"
    "vintage-agnostic. 100 TB shape: two dedup shuffles (user-day, "
    "then user-window-day) and one bounded-spine join — the "
    "engagement ratio every growth team tracks, exact at any "
    "scale.",
)
def events_dau_mau_stickiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    user_days = (
        events.select(
            "user_id", F.col("ts").cast("date").alias("d")
        )
        .distinct()
        .localCheckpoint(eager=False)  # feeds anchor + pairs
    )
    anchor = user_days.agg(F.min("d").alias("d0"))
    pairs = (
        user_days.crossJoin(F.broadcast(anchor))
        .select(
            "user_id", F.expr("datediff(d, d0)").alias("di")
        )
        .localCheckpoint(eager=False)  # feeds dau + contrib + spine
    )
    spine = pairs.select("di").distinct()
    dau = pairs.groupBy("di").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    contrib = (
        pairs.select(
            "user_id",
            F.explode(
                F.sequence(F.col("di"), F.col("di") + (_MAU_WINDOW - 1))
            ).alias("ti"),
        )
        .distinct()
    )
    mau = (
        contrib.join(spine, contrib.ti == spine.di)
        .groupBy("ti")
        .agg(F.count(F.lit(1)).cast("long").alias("mau"))
    )
    return (
        dau.join(mau, dau.di == F.col("ti"))
        .selectExpr(
            "di AS day_idx",
            "dau",
            "mau",
            "CAST(dau * 1000 div mau AS BIGINT) AS stickiness_permille",
        )
        .orderBy("day_idx")
    )
