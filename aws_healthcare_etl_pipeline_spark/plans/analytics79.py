"""Wave-105 (round 5): least-squares changepoints + sampling design.

* ``timeseries_best_split_changepoint`` — the binary-segmentation
  step: per event type, the split day that maximizes the two-
  segment least-squares gain. Because the total sum of squares
  cancels, the objective reduces to f(k) = S_L^2/n_L + S_R^2/n_R
  over PREFIX SUMS only; each prefix sum casts to double BEFORE
  squaring (S^2 would overflow int64 at large scale — caught by
  the sf1 sweep), and since cast/multiply/divide are each single
  IEEE roundings with identical expression trees, the argmax sort
  key is bit-portable (ties to the earliest day). The structural-
  break locator that CUSUM's drift detector complements.
* ``sampling_design_error_comparison`` — estimator bake-off on a
  known ground truth: md5-Bernoulli (1-in-8 by hash) vs systematic
  (every 8th by revenue-ranked position) samples both estimate
  total order revenue x8, and the report gives each design's exact
  signed error in integer permille — systematic sampling's
  variance win over Bernoulli on ordered frames, measured not
  asserted. Both samples are deterministic, so the 'random' error
  is reproducible and hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ---------------------------------------- best-split changepoint

_BS_MIN_SEG = 5  # minimum days per segment


@query(
    "timeseries_best_split_changepoint",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS dy,
                   CAST(SUM(CAST(floor(value * 1000) AS BIGINT))
                        AS BIGINT) AS v
            FROM events GROUP BY 1, 2
        ), pre AS (
            SELECT event_type, dy, v,
                   ROW_NUMBER() OVER w AS k,
                   CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY dy
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS s_l,
                   CAST(COUNT(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n,
                   CAST(SUM(v) OVER (PARTITION BY event_type)
                        AS BIGINT) AS s
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY dy)
        ), scored AS (
            SELECT event_type, dy, k, n, s_l, s - s_l AS s_r,
                   n - k AS n_r,
                   CAST(s_l AS DOUBLE) * CAST(s_l AS DOUBLE)
                       / CAST(k AS DOUBLE)
                   + CAST(s - s_l AS DOUBLE) * CAST(s - s_l AS DOUBLE)
                     / CAST(n - k AS DOUBLE) AS f
            FROM pre
            WHERE k >= {_BS_MIN_SEG} AND n - k >= {_BS_MIN_SEG}
        ), best AS (
            SELECT event_type, dy, k, n, s_l, s_r,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY f DESC, dy) AS rk
            FROM scored
        )
        SELECT event_type,
               strftime(dy, '%Y-%m-%d') AS split_day,
               CAST(k AS BIGINT) AS n_left,
               CAST(n - k AS BIGINT) AS n_right,
               s_l AS sum_left_millis,
               s_r AS sum_right_millis
        FROM best WHERE rk = 1
        ORDER BY event_type
    """,
    description="Least-squares changepoint (the binary-segmentation "
    "step) per event type: the split maximizing the two-segment "
    "SSE gain, which reduces to f(k) = S_L^2/k + S_R^2/(n-k) over "
    "prefix sums alone (the sum-of-squares term cancels) — prefix "
    "sums cast to double BEFORE squaring (int64 S^2 overflows at "
    "sf1, a sweep-caught bug) and cast/multiply/divide are single "
    "IEEE roundings with identical expression trees, so the "
    "argmax key is bit-portable, ties to the earliest day. The "
    "structural-break locator complementing the CUSUM drift "
    "detector. Scale: events collapse to day grain map-side; "
    "prefix sums and the argmax run per series over calendar-"
    "bounded rows, so candidate evaluation is spine-sized.",
)
def timeseries_best_split_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("dy")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("dy")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wp = Window.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        "dy",
        F.row_number().over(w).alias("k"),
        F.sum("v").over(wc).cast("long").alias("s_l"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
        F.sum("v").over(wp).cast("long").alias("s"),
    )
    scored = pre.filter(
        (F.col("k") >= _BS_MIN_SEG) & (F.col("n") - F.col("k") >= _BS_MIN_SEG)
    ).select(
        "event_type",
        "dy",
        "k",
        "n",
        "s_l",
        (F.col("s") - F.col("s_l")).alias("s_r"),
        (
            F.col("s_l").cast("double")
            * F.col("s_l").cast("double")
            / F.col("k").cast("double")
            + (F.col("s") - F.col("s_l")).cast("double")
            * (F.col("s") - F.col("s_l")).cast("double")
            / (F.col("n") - F.col("k")).cast("double")
        ).alias("f"),
    )
    wb = Window.partitionBy("event_type").orderBy(F.col("f").desc(), "dy")
    return (
        scored.withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.date_format("dy", "yyyy-MM-dd").alias("split_day"),
            F.col("k").cast("long").alias("n_left"),
            (F.col("n") - F.col("k")).cast("long").alias("n_right"),
            F.col("s_l").alias("sum_left_millis"),
            F.col("s_r").alias("sum_right_millis"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------- sampling design bake-off

_SD_RATE = 8  # 1-in-8 sampling for both designs


@query(
    "sampling_design_error_comparison",
    oracle=f"""
        WITH base AS (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS cents,
                   (strpos('0123456789abcdef',
                           substr(md5('s:' || CAST(o_orderkey
                                                   AS VARCHAR)), 1, 1))
                    - 1) % {_SD_RATE} AS bucket,
                   ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey)
                       AS rk
            FROM orders
        ), truth AS (
            SELECT CAST(SUM(cents) AS BIGINT) AS total FROM base
        ), est AS (
            SELECT 'bernoulli_md5' AS design,
                   CAST(SUM(CASE WHEN bucket = 0 THEN cents ELSE 0 END)
                        * {_SD_RATE} AS BIGINT) AS estimate,
                   CAST(SUM(CASE WHEN bucket = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_sampled
            FROM base
            UNION ALL
            SELECT 'systematic_ranked' AS design,
                   CAST(SUM(CASE WHEN rk % {_SD_RATE} = 1
                                 THEN cents ELSE 0 END) * {_SD_RATE}
                        AS BIGINT) AS estimate,
                   CAST(SUM(CASE WHEN rk % {_SD_RATE} = 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_sampled
            FROM base
        )
        SELECT e.design, e.n_sampled, e.estimate, t.total,
               CAST(CASE WHEN e.estimate >= t.total
                         THEN ((e.estimate - t.total) * 1000) // t.total
                         ELSE -(((t.total - e.estimate) * 1000)
                                // t.total) END AS BIGINT)
                   AS signed_error_permille
        FROM est e CROSS JOIN truth t
        ORDER BY e.design
    """,
    description="Sampling-design bake-off on known ground truth: an "
    "md5-Bernoulli 1-in-8 sample and a systematic every-8th sample "
    "over the revenue-ranked frame both estimate total order "
    "revenue x8, and each design's SIGNED error lands in integer "
    "permille (negate-divide-negate keeps truncation symmetric "
    "across engines) — systematic sampling's variance advantage on "
    "ordered frames, measured rather than asserted, with both "
    "samples deterministic and therefore hash-checkable. Scale: "
    "one pass computes both estimators as conditional aggregates; "
    "the rank for the systematic frame is the oracle's textbook "
    "form — production uses the repo's distributed-cutpoint "
    "ranking.",
)
def sampling_design_error_comparison(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_totalprice",
        (F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("cents"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("s:"), F.col("o_orderkey").cast("string")
                        )
                    ),
                    1,
                    1,
                ),
                16,
                10,
            ).cast("long")
            % _SD_RATE
        ).alias("bucket"),
        F.row_number()
        .over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("rk"),
    ).localCheckpoint(eager=False)  # feeds truth + both estimators
    truth = base.agg(F.sum("cents").cast("long").alias("total"))
    bern = base.agg(
        (
            F.sum(F.when(F.col("bucket") == 0, F.col("cents")).otherwise(0))
            * _SD_RATE
        )
        .cast("long")
        .alias("estimate"),
        F.sum((F.col("bucket") == 0).cast("long"))
        .cast("long")
        .alias("n_sampled"),
    ).select(
        F.lit("bernoulli_md5").alias("design"), "estimate", "n_sampled"
    )
    syst = base.agg(
        (
            F.sum(
                F.when(F.col("rk") % _SD_RATE == 1, F.col("cents")).otherwise(
                    0
                )
            )
            * _SD_RATE
        )
        .cast("long")
        .alias("estimate"),
        F.sum((F.col("rk") % _SD_RATE == 1).cast("long"))
        .cast("long")
        .alias("n_sampled"),
    ).select(
        F.lit("systematic_ranked").alias("design"), "estimate", "n_sampled"
    )
    est = bern.unionByName(syst)
    return (
        est.crossJoin(F.broadcast(truth))
        .select(
            "design",
            "n_sampled",
            "estimate",
            "total",
            F.expr(
                "CASE WHEN estimate >= total"
                " THEN ((estimate - total) * 1000) div total"
                " ELSE -(((total - estimate) * 1000) div total) END"
            )
            .cast("long")
            .alias("signed_error_permille"),
        )
        .orderBy("design")
    )
