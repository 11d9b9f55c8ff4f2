"""Wave-72 (round 5): game-theoretic attribution + seasonality profile.

* ``attribution_shapley_exact`` — EXACT Shapley-value marketing
  attribution over the 4 non-purchase channels: each user's
  pre-conversion channel set becomes a 4-bit mask, the characteristic
  function v(S) = converted users whose channel set is a subset of S
  (a zeta transform over the 16-subset lattice), and Shapley values
  are computed with the textbook permutation weights cleared of
  denominators (x 4! = 24) so every phi is an exact integer. The
  fair-division answer to "which channel caused the conversion" —
  normally Monte-Carlo'd, here exact because the lattice is tiny.
* ``events_weekday_hour_heatmap`` — the weekday x hour activity
  heatmap with per-cell share permille: the seasonality profile that
  drives batch-window placement and on-call staffing.
"""

from __future__ import annotations

from math import factorial

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ exact Shapley values

_CHANNELS = ["click", "error", "signup", "view"]  # bit i = _CHANNELS[i]
_K = len(_CHANNELS)
# Shapley weight x k!: |S|! * (k - |S| - 1)!
_W24 = {s: factorial(s) * factorial(_K - s - 1) for s in range(_K)}


def _shapley_oracle() -> str:
    ch_case = " ".join(
        f"WHEN event_type = '{c}' THEN {1 << i}"
        for i, c in enumerate(_CHANNELS)
    )
    # phi_c x 24 = sum over S not containing c of w(|S|) * (v(S|c) - v(S))
    terms = []
    for i, c in enumerate(_CHANNELS):
        bit = 1 << i
        rows = []
        for s_mask in range(1 << _K):
            if s_mask & bit:
                continue
            popc = bin(s_mask).count("1")
            rows.append(
                f"SELECT {_W24[popc]} AS w, {s_mask | bit} AS with_c, "
                f"{s_mask} AS wo_c"
            )
        terms.append(
            f"""
        SELECT '{c}' AS channel,
               CAST(SUM(t.w * (va.v - vb.v)) AS BIGINT) AS shapley_x24
        FROM ({" UNION ALL ".join(rows)}) t
        JOIN zeta va ON va.s = t.with_c
        JOIN zeta vb ON vb.s = t.wo_c"""
        )
    return f"""
        WITH marks AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS conv_ts
            FROM events GROUP BY user_id
        ), masks AS (
            SELECT e.user_id,
                   CAST(SUM(DISTINCT CASE {ch_case} ELSE 0 END) AS BIGINT)
                       AS mask,
                   MAX(m.conv_ts IS NOT NULL) AS converted
            FROM events e JOIN marks m ON m.user_id = e.user_id
            WHERE e.event_type <> 'purchase'
              AND (m.conv_ts IS NULL OR e.ts < m.conv_ts)
            GROUP BY e.user_id
        ), mcnt AS (
            SELECT mask, CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END)
                              AS BIGINT) AS conv
            FROM masks GROUP BY mask
        ), subsets AS (
            SELECT UNNEST(range(0, {1 << _K})) AS s
        ), zeta AS (
            SELECT sub.s,
                   CAST(COALESCE(SUM(CASE WHEN (m.mask & ~sub.s) = 0
                                          THEN m.conv ELSE 0 END), 0)
                        AS BIGINT) AS v
            FROM subsets sub LEFT JOIN mcnt m ON TRUE
            GROUP BY sub.s
        )
        SELECT * FROM ({" UNION ALL ".join(terms)}) ORDER BY channel
    """


@query(
    "attribution_shapley_exact",
    oracle=_shapley_oracle(),
    description="Exact Shapley-value attribution over the four non-"
    "purchase channels: each user's pre-conversion activity becomes a "
    "4-bit channel mask, the characteristic function v(S) = converted "
    "users whose mask is a subset of S (a zeta transform over the 16-"
    "subset lattice), and phi_channel is the textbook permutation-"
    "weighted marginal sum with weights cleared of denominators "
    "(x 4! = 24) — the game-theoretically fair split of conversions "
    "that industry approximates by Monte Carlo, computed EXACTLY here "
    "because the channel lattice is tiny. At 100 TB: one shuffle to "
    "per-user masks (conditional aggregation over the event scan), a "
    "16-row mask histogram, and the entire Shapley algebra runs on "
    "that metadata-sized lattice.",
)
def attribution_shapley_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    marks = events.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("conv_ts")
    )
    ch_bit = F.lit(0)
    for i, c in enumerate(_CHANNELS):
        ch_bit = F.when(F.col("event_type") == c, F.lit(1 << i)).otherwise(
            ch_bit
        )
    masks = (
        events.join(F.broadcast(marks), "user_id")
        .filter(
            (F.col("event_type") != "purchase")
            & (F.col("conv_ts").isNull() | (F.col("ts") < F.col("conv_ts")))
        )
        .select("user_id", ch_bit.alias("b"), F.col("conv_ts").isNotNull().alias("cv"))
        .groupBy("user_id")
        .agg(
            F.sum_distinct(F.col("b")).cast("long").alias("mask"),
            F.max("cv").alias("converted"),
        )
    )
    mcnt = masks.groupBy("mask").agg(
        F.sum(F.when(F.col("converted"), 1).otherwise(0))
        .cast("long")
        .alias("conv")
    )
    subsets = spark.range(1 << _K).select(F.col("id").alias("s"))
    zeta = (
        subsets.crossJoin(F.broadcast(mcnt))
        .groupBy("s")
        .agg(
            F.coalesce(
                F.sum(
                    # SQL ~ is bitwise here; Python ~Column would be NOT
                    F.when(
                        F.expr("(mask & ~s) = 0"),
                        F.col("conv"),
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("v")
        )
    )
    term_rows = []
    for i, c in enumerate(_CHANNELS):
        bit = 1 << i
        for s_mask in range(1 << _K):
            if s_mask & bit:
                continue
            popc = bin(s_mask).count("1")
            term_rows.append((c, _W24[popc], s_mask | bit, s_mask))
    terms = spark.createDataFrame(
        term_rows, schema="channel string, w long, with_c long, wo_c long"
    )
    va = zeta.select(F.col("s").alias("with_c"), F.col("v").alias("v_with"))
    vb = zeta.select(F.col("s").alias("wo_c"), F.col("v").alias("v_wo"))
    return (
        terms.join(F.broadcast(va), "with_c")
        .join(F.broadcast(vb), "wo_c")
        .groupBy("channel")
        .agg(
            F.sum(F.col("w") * (F.col("v_with") - F.col("v_wo")))
            .cast("long")
            .alias("shapley_x24")
        )
        .orderBy("channel")
    )


# ------------------------------------------------ weekday-hour heatmap


@query(
    "events_weekday_hour_heatmap",
    oracle="""
        WITH cells AS (
            SELECT CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow,
                   CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT dow, hr, n,
               CAST((n * 1000) // (SELECT SUM(n) FROM cells) AS BIGINT)
                   AS share_permille
        FROM cells ORDER BY dow, hr
    """,
    description="Weekday x hour activity heatmap with per-cell share "
    "permille: the seasonality profile that places batch windows, "
    "staffs on-call, and calibrates anomaly baselines per cell "
    "instead of globally. One conditional-aggregation shuffle to the "
    "bounded 7x24 grid; the share denominator is a broadcast 1-row "
    "total. (DuckDB dayofweek is 0=Sunday; Spark dayofweek is "
    "1=Sunday — the query aligns them explicitly, pinning a classic "
    "cross-engine calendar divergence.)",
)
def events_weekday_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        (F.dayofweek(F.col("ts").cast("date")) - 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hr"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cells.agg(F.sum("n").alias("t"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "hr",
            "n",
            F.expr("(n * 1000) div t").cast("long").alias("share_permille"),
        )
        .orderBy("dow", "hr")
    )
