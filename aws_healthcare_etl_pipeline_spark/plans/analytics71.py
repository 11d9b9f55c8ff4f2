"""Wave-97 (round 5): supply-chain variance amplification + queueing
identity audit.

* ``supply_bullwhip_variance_ratio`` — the bullwhip index per month:
  variance of daily shipped quantity (upstream) over variance of
  daily order arrivals (downstream), with every variance carried as
  the EXACT integer numerator n*Sum(x^2) - Sum(x)^2 (both series
  share the month's day count, so the n^2 factors cancel in the
  ratio) — the demand-amplification diagnostic computed without a
  single float until the final permille.
* ``queueing_littles_law_audit`` — Little's law L = lambda * W as an
  EXACT integer identity: over a fixed observation window, the
  time-integral of concurrency (computed by the day-grain sweepline)
  must equal the sum of in-window interval days (computed directly
  from the intervals) — a theorem when measured consistently, so
  the audit flag is a hard invariant: any disagreement is a
  bookkeeping bug in one of the two pipelines. Reports lambda
  (arrivals), W (total duration days), and the integral from both
  sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------- bullwhip index


@query(
    "supply_bullwhip_variance_ratio",
    oracle="""
        WITH down AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   CAST(o_orderdate AS DATE) AS dy,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM orders GROUP BY 1, 2
        ), up AS (
            SELECT strftime(l_shipdate, '%Y-%m') AS month,
                   CAST(l_shipdate AS DATE) AS dy,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x
            FROM lineitem GROUP BY 1, 2
        ), dstat AS (
            SELECT month, CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT)
                       AS var_num
            FROM down GROUP BY month
        ), ustat AS (
            SELECT month, CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT)
                       AS var_num
            FROM up GROUP BY month
        )
        SELECT d.month,
               d.n_days AS down_days, u.n_days AS up_days,
               d.var_num AS down_var_num,
               u.var_num AS up_var_num,
               CAST(CASE WHEN d.var_num > 0
                         THEN (u.var_num * d.n_days * d.n_days * 1000)
                              // (d.var_num * u.n_days * u.n_days)
                         ELSE NULL END AS BIGINT) AS bullwhip_permille
        FROM dstat d JOIN ustat u ON u.month = d.month
        WHERE d.n_days >= 20 AND u.n_days >= 20
        ORDER BY d.month
        LIMIT 24
    """,
    description="Bullwhip index per month: variance of daily shipped "
    "quantity (upstream) over variance of daily order arrivals "
    "(downstream), every variance carried as the exact integer "
    "numerator n*Sum(x^2) - Sum(x)^2 and the ratio normalized by "
    "the two series' day counts via cross-multiplication — demand-"
    "amplification (the >1000-permille months are where the supply "
    "chain overreacts) with no float until the final permille. "
    "Months with under 20 observed days are excluded (partial "
    "months make variance ratios lie); first 24 months pinned. "
    "Scale: two map-side-combined day-grain aggregates, month-grain "
    "variance algebra, and a month-keyed join of tiny aggregates.",
)
def supply_bullwhip_variance_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    down = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_orderdate").cast("date").alias("dy"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    up = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        F.col("l_shipdate").cast("date").alias("dy"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("x"))

    def stat(df: DataFrame) -> DataFrame:
        return df.groupBy("month").agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            (
                F.count(F.lit(1)) * F.sum(F.col("x") * F.col("x"))
                - F.sum("x") * F.sum("x")
            )
            .cast("long")
            .alias("var_num"),
        )

    dstat = stat(down).select(
        "month",
        F.col("n_days").alias("down_days"),
        F.col("var_num").alias("down_var_num"),
    )
    ustat = stat(up).select(
        "month",
        F.col("n_days").alias("up_days"),
        F.col("var_num").alias("up_var_num"),
    )
    return (
        dstat.join(ustat, "month")
        .filter((F.col("down_days") >= 20) & (F.col("up_days") >= 20))
        .select(
            "month",
            "down_days",
            "up_days",
            "down_var_num",
            "up_var_num",
            F.when(
                F.col("down_var_num") > 0,
                F.expr(
                    "(up_var_num * down_days * down_days * 1000)"
                    " div (down_var_num * up_days * up_days)"
                ),
            )
            .otherwise(F.lit(None))
            .cast("long")
            .alias("bullwhip_permille"),
        )
        .orderBy("month")
        .limit(24)
    )


# ---------------------------------------------- Little's law audit

_LL_START = "1996-01-01"
_LL_END = "1996-12-30"  # inclusive observation window
_LL_SPAN_MOD = 14  # interval length: (orderkey % 14) + 1 days


@query(
    "queueing_littles_law_audit",
    oracle=f"""
        WITH iv AS (
            SELECT CAST(o_orderdate AS DATE) AS s,
                   CAST(o_orderdate
                        + INTERVAL ((o_orderkey % {_LL_SPAN_MOD}) + 1) DAY
                        AS DATE) AS e
            FROM orders
        ), clipped AS (
            SELECT GREATEST(s, DATE '{_LL_START}') AS cs,
                   LEAST(e, DATE '{_LL_END}' + INTERVAL 1 DAY) AS ce,
                   s, e
            FROM iv
            WHERE s <= DATE '{_LL_END}'
              AND e > DATE '{_LL_START}'
        ), direct AS (
            SELECT CAST(SUM(date_diff('day', cs, ce)) AS BIGINT)
                       AS integral_direct,
                   CAST(COUNT(*) AS BIGINT) AS n_intervals,
                   CAST(SUM(CASE WHEN s >= DATE '{_LL_START}'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_arrivals_in_window
            FROM clipped
        ), deltas AS (
            SELECT cs AS dy, 1 AS d FROM clipped
            UNION ALL
            SELECT ce AS dy, -1 AS d FROM clipped
        ), days AS (
            SELECT CAST(unnest(generate_series(DATE '{_LL_START}',
                                               DATE '{_LL_END}',
                                               INTERVAL 1 DAY)) AS DATE)
                       AS dy
        ), conc AS (
            SELECT d2.dy,
                   CAST(COALESCE(SUM(dl.d), 0) AS BIGINT) AS concurrency
            FROM days d2 LEFT JOIN deltas dl ON dl.dy <= d2.dy
            GROUP BY d2.dy
        ), sweep AS (
            SELECT CAST(SUM(concurrency) AS BIGINT) AS integral_sweep,
                   CAST(COUNT(*) AS BIGINT) AS window_days
            FROM conc
        )
        SELECT d.n_intervals, d.n_arrivals_in_window,
               d.integral_direct, s.integral_sweep, s.window_days,
               CAST(CASE WHEN d.integral_direct = s.integral_sweep
                         THEN 1 ELSE 0 END AS BIGINT) AS identity_ok,
               CAST((s.integral_sweep * 1000) // s.window_days
                    AS BIGINT) AS avg_concurrency_permille
        FROM direct d CROSS JOIN sweep s
    """,
    description="Little's law (L = lambda*W) as a HARD integer "
    "invariant over a one-year 1996 window: the day-grain sweepline "
    "integral of concurrency must EQUAL the directly-summed "
    "window-clipped interval days — a theorem when both sides are "
    "measured consistently, so identity_ok = 0 can only mean a "
    "bookkeeping bug in one of the two pipelines (clip rules, "
    "boundary conventions, off-by-one on interval ends). Reports "
    "arrivals (lambda numerator), total in-window interval days (W "
    "numerator), both integrals, and average concurrency in "
    "permille. Scale: the direct side is one map-side aggregate; "
    "the sweep side is delta events against a 365-day spine — both "
    "sides stay day-grain regardless of order volume.",
)
def queueing_littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    iv = orders.select(
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(
            F.col("o_orderdate"),
            (F.col("o_orderkey") % _LL_SPAN_MOD + 1).cast("int"),
        ).alias("e"),
    )
    start = F.lit(_LL_START).cast("date")
    end_excl = F.date_add(F.lit(_LL_END).cast("date"), 1)
    clipped = iv.filter(
        (F.col("s") <= F.lit(_LL_END).cast("date"))
        & (F.col("e") > start)
    ).select(
        F.greatest(F.col("s"), start).alias("cs"),
        F.least(F.col("e"), end_excl).alias("ce"),
        "s",
        "e",
    ).localCheckpoint(eager=False)  # feeds the direct sum and the deltas
    direct = clipped.agg(
        F.sum(F.datediff("ce", "cs")).cast("long").alias("integral_direct"),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum((F.col("s") >= start).cast("long"))
        .cast("long")
        .alias("n_arrivals_in_window"),
    )
    deltas = clipped.select(
        F.col("cs").alias("dy"), F.lit(1).alias("d")
    ).unionByName(clipped.select(F.col("ce").alias("dy"), F.lit(-1).alias("d")))
    # collapse deltas to day grain first so the spine join is tiny
    day_deltas = deltas.groupBy("dy").agg(F.sum("d").alias("d"))
    days = spark.range(0, 365).select(
        F.date_add(start, F.col("id").cast("int")).alias("dy2")
    )
    conc = (
        days.join(
            F.broadcast(day_deltas), F.col("dy") <= F.col("dy2"), "left"
        )
        .groupBy("dy2")
        .agg(F.coalesce(F.sum("d"), F.lit(0)).cast("long").alias("concurrency"))
    )
    sweep = conc.agg(
        F.sum("concurrency").cast("long").alias("integral_sweep"),
        F.count(F.lit(1)).cast("long").alias("window_days"),
    )
    return direct.crossJoin(F.broadcast(sweep)).select(
        "n_intervals",
        "n_arrivals_in_window",
        "integral_direct",
        "integral_sweep",
        "window_days",
        (F.col("integral_direct") == F.col("integral_sweep"))
        .cast("long")
        .alias("identity_ok"),
        F.expr("(integral_sweep * 1000) div window_days")
        .cast("long")
        .alias("avg_concurrency_permille"),
    )
