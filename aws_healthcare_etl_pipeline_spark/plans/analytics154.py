"""Wave-180 (round 5): SRE retry hygiene + weighting diagnostics.

* ``ops_backoff_conformance_audit`` — do clients actually back off?
  Retry chains are maximal runs of consecutive 'error' events in a
  user's stream (gaps-and-islands on a partitioned running count of
  non-errors); a chain of length >= 3 is conformant iff every
  inter-retry gap at least DOUBLES (g_{{i+1}} >= 2 * g_i, exact
  microsecond integers). The retry-storm detector every API team
  wants after an incident review.

* ``stats_effective_sample_size`` — Kish's effective sample size
  (sum w)^2 / (sum w^2) for quantity-weighted lineitems, overall and
  per returnflag, in exact permille of the raw row count — the one
  number that says how much information a weighted dataset really
  carries (importance sampling, survey weighting, IPW all read it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import query


@query(
    "ops_backoff_conformance_audit",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, epoch_us(ts) AS t,
                   CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                       AS is_err,
                   SUM(CASE WHEN event_type = 'error' THEN 0 ELSE 1
                       END) OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                       ROW) AS chain_id
            FROM events
        ), errs0 AS (
            SELECT user_id, chain_id, t, event_id,
                   t - LAG(t) OVER (PARTITION BY user_id, chain_id
                       ORDER BY t, event_id) AS gap
            FROM seq WHERE is_err = 1
        ), errs AS (
            SELECT user_id, chain_id, gap,
                   LAG(gap) OVER (PARTITION BY user_id, chain_id
                       ORDER BY t, event_id) AS prev_gap
            FROM errs0
        ), chains AS (
            SELECT user_id, chain_id,
                   CAST(COUNT(*) AS BIGINT) AS len,
                   CAST(SUM(CASE WHEN prev_gap IS NOT NULL
                        AND gap < 2 * prev_gap THEN 1 ELSE 0 END)
                        AS BIGINT) AS violations
            FROM errs GROUP BY user_id, chain_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_chains,
               CAST(SUM(CASE WHEN violations = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_conformant,
               CAST(SUM(CASE WHEN violations = 0 THEN 1 ELSE 0 END)
                    * 1000 // COUNT(*) AS BIGINT)
                   AS conformance_permille,
               CAST(MAX(len) AS BIGINT) AS max_chain_len,
               CAST(SUM(violations) AS BIGINT) AS total_violations
        FROM chains
        WHERE len >= 3
    """,
    description="Retry-backoff conformance: retry chains are maximal "
    "runs of consecutive 'error' events per user (gaps-and-islands "
    "via a partitioned running count of non-errors — no global "
    "window), and a chain of length >= 3 is conformant iff every "
    "inter-retry gap at least DOUBLES (g_next >= 2*g_prev in exact "
    "microseconds, a lag-of-lag within the chain). Emits chain "
    "counts, conformance permille, the longest chain, and total "
    "violations — the retry-storm detector that separates polite "
    "exponential-backoff clients from the ones that DDoS you during "
    "an outage. 100 TB shape: two partitioned window passes on the "
    "user shuffle, one chain-grain partial agg; runs on the raw "
    "event log with no sessionization precompute.",
)
def ops_backoff_conformance_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("t", "event_id")
    seq = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t"),
        F.when(F.col("event_type") == "error", 1)
        .otherwise(0)
        .alias("is_err"),
    ).withColumn(
        "chain_id",
        F.sum(F.when(F.col("is_err") == 1, 0).otherwise(1))
        .over(wu.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    wc = Window.partitionBy("user_id", "chain_id").orderBy(
        "t", "event_id"
    )
    errs = (
        seq.where(F.col("is_err") == 1)
        .withColumn("gap", F.col("t") - F.lag("t").over(wc))
        .withColumn("prev_gap", F.lag("gap").over(wc))
    )
    chains = errs.groupBy("user_id", "chain_id").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.sum(
            F.when(
                F.col("prev_gap").isNotNull()
                & (F.col("gap") < 2 * F.col("prev_gap")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("violations"),
    )
    return (
        chains.where(F.col("len") >= 3)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chains"),
            F.sum(F.when(F.col("violations") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_conformant"),
            F.expr(
                "CAST(SUM(CASE WHEN violations = 0 THEN 1 ELSE 0 END)"
                " * 1000 div COUNT(*) AS BIGINT)"
            ).alias("conformance_permille"),
            F.max("len").cast("long").alias("max_chain_len"),
            F.sum("violations").cast("long").alias("total_violations"),
        )
    )


@query(
    "stats_effective_sample_size",
    oracle="""
        WITH w AS (
            SELECT l_returnflag AS rf,
                   CAST(l_quantity AS BIGINT) AS wt
            FROM lineitem
        ), per_flag AS (
            SELECT rf,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(wt) AS HUGEINT) AS sw,
                   CAST(SUM(wt * wt) AS HUGEINT) AS sw2
            FROM w GROUP BY rf
            UNION ALL
            SELECT 'ALL',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(wt) AS HUGEINT),
                   CAST(SUM(wt * wt) AS HUGEINT)
            FROM w
        )
        SELECT rf AS scope, n,
               CAST(sw * sw // sw2 AS BIGINT) AS ess_rows,
               CAST(sw * sw * 1000 // (sw2 * n) AS BIGINT)
                   AS ess_permille_of_n
        FROM per_flag
        ORDER BY scope
    """,
    description="Kish's effective sample size (sum w)^2 / sum(w^2) "
    "for quantity-weighted lineitems, per returnflag and overall — "
    "the one number that says how much information a weighted "
    "dataset actually carries (importance sampling, survey "
    "weighting, and IPW all read it; ESS << n means a few heavy "
    "rows dominate). Exact integer arithmetic: (sum w)^2 rides "
    "DECIMAL(38)/HUGEINT (~1e17 at sf1000 squared = 1e34, under "
    "headroom), one truncating div. 100 TB shape: three SUMs per "
    "group, all map-side combinable, bounded output — the "
    "diagnostic every weighted estimator should publish next to "
    "its point estimate.",
)
def stats_effective_sample_size(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = li.selectExpr(
        "l_returnflag AS rf", "CAST(l_quantity AS BIGINT) AS wt"
    ).localCheckpoint(eager=False)  # per-flag + overall lanes
    per_flag = w.groupBy("rf").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("wt").cast("decimal(38,0)").alias("sw"),
        F.expr("SUM(wt * wt)").cast("decimal(38,0)").alias("sw2"),
    )
    overall = w.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("wt").cast("decimal(38,0)").alias("sw"),
        F.expr("SUM(wt * wt)").cast("decimal(38,0)").alias("sw2"),
    ).select(F.lit("ALL").alias("rf"), "n", "sw", "sw2")
    return (
        per_flag.unionAll(overall)
        .selectExpr(
            "rf AS scope",
            "n",
            "CAST(sw * sw div sw2 AS BIGINT) AS ess_rows",
            "CAST(sw * sw * 1000 div (sw2 * n) AS BIGINT)"
            " AS ess_permille_of_n",
        )
        .orderBy("scope")
    )
