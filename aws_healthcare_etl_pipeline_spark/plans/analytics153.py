"""Wave-179 (round 5): window-frame semantics + MDM survivorship.

* ``sql_range_vs_rows_frames`` — the tie trap in running totals:
  RANGE frames include ALL peer rows of the current order key, ROWS
  frames cut mid-tie — so a cumulative sum over a non-unique key
  differs between them exactly at duplicated keys. Graded on the
  fixed-size panel with per-row divergence counts and checksums;
  teams that "fix" a running total by switching frame types are
  measuring this difference.

* ``mdm_survivorship_policy_battery`` — master-data survivorship:
  duplicate groups (user, event type, day) resolved by three
  policies (earliest timestamp, highest value, lowest id), with
  pairwise disagreement counts — the measurement that tells an MDM
  team whether their merge-rule choice actually matters on their
  data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import query

_RVR_PANEL = 500


@query(
    "sql_range_vs_rows_frames",
    oracle=f"""
        WITH sized AS (
            SELECT o_orderkey AS k, o_orderdate AS d,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v,
                   GREATEST(1, (SELECT COUNT(*) FROM orders)
                               // {_RVR_PANEL}) AS m
            FROM orders
        ), panel AS (
            SELECT k, d, v FROM sized WHERE k % m = 0
        ), framed AS (
            SELECT k, d, v,
                   CAST(SUM(v) OVER (ORDER BY d, k ROWS BETWEEN
                        UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_rows,
                   CAST(SUM(v) OVER (ORDER BY d RANGE BETWEEN
                        UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_range,
                   CAST(COUNT(*) OVER (PARTITION BY d) AS BIGINT)
                       AS peers
            FROM panel
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN peers > 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_tied_rows,
               CAST(SUM(CASE WHEN cum_rows <> cum_range
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_divergent,
               CAST(SUM(cum_range - cum_rows) AS BIGINT)
                   AS divergence_mass_cents,
               CAST(MAX(cum_range - cum_rows) AS BIGINT)
                   AS max_divergence_cents
        FROM framed
    """,
    description="The running-total tie trap, measured: over a non-"
    "unique ORDER BY key (order date), a RANGE frame includes ALL "
    "peer rows of the current key while ROWS cuts mid-tie — the two "
    "'cumulative sums' differ exactly at duplicated keys, and the "
    "ROWS lane therefore carries the repo's standard key tiebreak "
    "(d, k) so its cumulative sum is total-order deterministic in "
    "both engines, while the RANGE lane orders by the date alone "
    "and absorbs all peers. Emits "
    "tied-row and divergent-row counts plus the divergence mass — "
    "the number that explains a finance dashboard discrepancy in "
    "one query. 100 TB shape: the only unpartitioned windows run "
    "on the fixed ~500-row panel (mod = greatest(1, n div 500)); "
    "panel selection is one broadcast-count filter.",
)
def sql_range_vs_rows_frames(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    tot = orders.agg(
        F.expr(f"GREATEST(1, COUNT(*) div {_RVR_PANEL})").alias("m")
    )
    panel = (
        orders.crossJoin(F.broadcast(tot))
        .where(F.expr("o_orderkey % m = 0"))
        .selectExpr(
            "o_orderkey AS k",
            "o_orderdate AS d",
            "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100"
            " AS BIGINT) AS v",
        )
    )
    wrows = Window.orderBy("d", "k").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wrange = Window.orderBy("d").rangeBetween(
        Window.unboundedPreceding, 0
    )
    framed = panel.select(
        "v",
        F.sum("v").over(wrows).cast("long").alias("cum_rows"),
        F.sum("v").over(wrange).cast("long").alias("cum_range"),
        F.count(F.lit(1))
        .over(Window.partitionBy("d"))
        .cast("long")
        .alias("peers"),
    )
    return framed.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("peers") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_tied_rows"),
        F.sum(
            F.when(F.col("cum_rows") != F.col("cum_range"), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_divergent"),
        F.sum(F.col("cum_range") - F.col("cum_rows"))
        .cast("long")
        .alias("divergence_mass_cents"),
        F.max(F.col("cum_range") - F.col("cum_rows"))
        .cast("long")
        .alias("max_divergence_cents"),
    )


@query(
    "mdm_survivorship_policy_battery",
    oracle="""
        WITH recs AS (
            SELECT user_id, event_type, CAST(ts AS DATE) AS d,
                   event_id, epoch_us(ts) AS t,
                   CAST(FLOOR(CAST(value AS DOUBLE) * 100) AS BIGINT)
                       AS v_cents
            FROM events
        ), ranked AS (
            SELECT user_id, event_type, d, event_id,
                   COUNT(*) OVER w AS grp_n,
                   ROW_NUMBER() OVER (PARTITION BY user_id,
                       event_type, d ORDER BY t, event_id)
                       AS rn_early,
                   ROW_NUMBER() OVER (PARTITION BY user_id,
                       event_type, d ORDER BY v_cents DESC, event_id)
                       AS rn_value,
                   ROW_NUMBER() OVER (PARTITION BY user_id,
                       event_type, d ORDER BY event_id) AS rn_minid
            FROM recs
            WINDOW w AS (PARTITION BY user_id, event_type, d)
        ), survivors AS (
            SELECT user_id, event_type, d,
                   MAX(grp_n) AS grp_n,
                   MAX(CASE WHEN rn_early = 1 THEN event_id END)
                       AS s_early,
                   MAX(CASE WHEN rn_value = 1 THEN event_id END)
                       AS s_value,
                   MAX(CASE WHEN rn_minid = 1 THEN event_id END)
                       AS s_minid
            FROM ranked GROUP BY user_id, event_type, d
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN grp_n > 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_multi_groups,
               CAST(SUM(CASE WHEN s_early <> s_value
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS early_vs_value_disagree,
               CAST(SUM(CASE WHEN s_early <> s_minid
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS early_vs_minid_disagree,
               CAST(SUM(CASE WHEN s_value <> s_minid
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS value_vs_minid_disagree
        FROM survivors
    """,
    description="Master-data survivorship battery: duplicate groups "
    "(user, event type, day) resolved by three textbook merge "
    "policies — earliest timestamp, highest value, lowest id — each "
    "a deterministic ROW_NUMBER over the group with an id tiebreak, "
    "then pairwise disagreement counts over the multi-member "
    "groups. A high disagreement rate means the merge-rule choice "
    "materially changes the golden record; near-zero means the "
    "debate is moot ON THIS DATA — either way, it's now a number. "
    "Values quantize to cents via floor (identical both engines). "
    "100 TB shape: one shuffle on the group key feeds all three "
    "partitioned rankings and the rollup; no global window, no "
    "self-join — the MDM merge-preview every entity-resolution "
    "pipeline should ship.",
)
def mdm_survivorship_policy_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    recs = events.select(
        "user_id",
        "event_type",
        F.col("ts").cast("date").alias("d"),
        "event_id",
        F.unix_micros("ts").alias("t"),
        F.expr(
            "CAST(FLOOR(CAST(value AS DOUBLE) * 100) AS BIGINT)"
        ).alias("v_cents"),
    )
    grp = ["user_id", "event_type", "d"]
    wg = Window.partitionBy(*grp)
    ranked = recs.select(
        *grp,
        "event_id",
        F.count(F.lit(1)).over(wg).alias("grp_n"),
        F.row_number()
        .over(Window.partitionBy(*grp).orderBy("t", "event_id"))
        .alias("rn_early"),
        F.row_number()
        .over(
            Window.partitionBy(*grp).orderBy(
                F.col("v_cents").desc(), "event_id"
            )
        )
        .alias("rn_value"),
        F.row_number()
        .over(Window.partitionBy(*grp).orderBy("event_id"))
        .alias("rn_minid"),
    )
    survivors = ranked.groupBy(*grp).agg(
        F.max("grp_n").alias("grp_n"),
        F.max(
            F.when(F.col("rn_early") == 1, F.col("event_id"))
        ).alias("s_early"),
        F.max(
            F.when(F.col("rn_value") == 1, F.col("event_id"))
        ).alias("s_value"),
        F.max(
            F.when(F.col("rn_minid") == 1, F.col("event_id"))
        ).alias("s_minid"),
    )
    return survivors.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("grp_n") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_multi_groups"),
        F.sum(
            F.when(F.col("s_early") != F.col("s_value"), 1).otherwise(0)
        )
        .cast("long")
        .alias("early_vs_value_disagree"),
        F.sum(
            F.when(F.col("s_early") != F.col("s_minid"), 1).otherwise(0)
        )
        .cast("long")
        .alias("early_vs_minid_disagree"),
        F.sum(
            F.when(F.col("s_value") != F.col("s_minid"), 1).otherwise(0)
        )
        .cast("long")
        .alias("value_vs_minid_disagree"),
    )
