"""Wave-164 (round 5): exact boosting + calendar settlement battery.

* ``ml_adaboost_two_round_stumps`` — two rounds of AdaBoost over a
  fixed panel of decision stumps (month / order-value / segment
  thresholds, both polarities), kept EXACT end to end: round-2
  weights use the integer-proportional update (misclassified rows
  x (W-e), correct rows x e — exactly the (1-eps)/eps odds ratio up
  to global scale, which is all AdaBoost needs), and the final
  disagreement vote compares alpha_1 vs alpha_2 by CROSS-MULTIPLIED
  odds ((W1-e1)*e2 vs (W2-e2)*e1) so no log or float ever appears.
  Every stump's weighted error is ONE aggregate expression, so each
  boosting round is a single scan with k parallel SUMs — the
  scale-correct shape for boosting simple hypotheses on 100 TB.

* ``time_t2_settlement_battery`` — T+2 business-day settlement over
  the weekend-aware closed form (epoch-Monday modulo arithmetic,
  sign-safe in both engines), with the self-verifying invariant that
  no settlement lands on a weekend visible in the output.

The stump panel and all error expressions are GENERATED from one
Python list and pasted into both the Spark plan and the DuckDB
oracle — the shared-generated-SQL pattern the repo established for
the Hilbert/Z-order audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import query

# (id, portable SQL condition over columns mon / cents / seg)
_STUMPS: list[tuple[int, str]] = [
    (1, "mon <= 3"),
    (2, "mon <= 6"),
    (3, "mon <= 9"),
    (4, "cents <= 5000000"),
    (5, "cents <= 10000000"),
    (6, "cents <= 15000000"),
    (7, "cents <= 20000000"),
    (8, "seg = 'BUILDING'"),
    (9, "seg = 'MACHINERY'"),
    (10, "seg = 'AUTOMOBILE'"),
]


def _h(cond: str, pol: int) -> str:
    return f"(CASE WHEN {cond} THEN {pol} ELSE {-pol} END)"


def _err_exprs(wexpr: str, tp: str) -> str:
    """k parallel weighted-error SUMs, one per (stump, polarity)."""
    parts = []
    for j, cond in _STUMPS:
        for pol in (1, -1):
            tag = f"{tp}{j}_{'p' if pol == 1 else 'n'}"
            parts.append(
                f"SUM(CASE WHEN {_h(cond, pol)} <> y THEN {wexpr}"
                f" ELSE 0 END) AS {tag}"
            )
    return ", ".join(parts)


def _unpivot_rows(tp: str, src: str) -> str:
    """UNION ALL rows (jid, pol, err) out of the k error columns."""
    rows = []
    for j, _ in _STUMPS:
        for pol, s in ((1, "p"), (-1, "n")):
            rows.append(
                f"SELECT {j} AS jid, {pol} AS pol,"
                f" {tp}{j}_{s} AS err FROM {src}"
            )
    return " UNION ALL ".join(rows)


def _h_star(jid_col: str, pol_col: str) -> str:
    """h_{jid}(x) * pol as a nested CASE keyed by the chosen stump."""
    branches = " ".join(
        f"WHEN {jid_col} = {j} THEN {_h(cond, 1)}" for j, cond in _STUMPS
    )
    return f"((CASE {branches} END) * {pol_col})"


_ADA_ROWS_SQL = """
    SELECT CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE -1 END
               AS y,
           EXTRACT(month FROM o.o_orderdate) AS mon,
           CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)
               AS cents,
           c.c_mktsegment AS seg
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
"""


def _ada_oracle() -> str:
    return f"""
        WITH rows_all AS MATERIALIZED ({_ADA_ROWS_SQL}),
        aggr AS MATERIALIZED (
            SELECT CAST(COUNT(*) AS BIGINT) AS w1,
                   {_err_exprs("1", "re_")}
            FROM rows_all
        ),
        cand1 AS ({_unpivot_rows("re_", "aggr")}),
        best1 AS (
            SELECT c.jid AS j1, c.pol AS pol1,
                   CAST(c.err AS BIGINT) AS e1,
                   (SELECT w1 FROM aggr) AS w1
            FROM cand1 c
            ORDER BY c.err, c.jid, c.pol DESC LIMIT 1
        ),
        guards AS (
            SELECT j1, pol1, e1, w1,
                   GREATEST(1, LEAST(e1, w1 - 1)) AS e1g
            FROM best1
        ),
        aggw AS MATERIALIZED (
            SELECT CAST(SUM(CASE WHEN {_h_star("g.j1", "g.pol1")} = r.y
                       THEN g.e1g ELSE g.w1 - g.e1g END) AS HUGEINT)
                       AS w2,
                   {_err_exprs("(CASE WHEN " + _h_star("g.j1", "g.pol1")
                               + " = r.y THEN g.e1g"
                               + " ELSE g.w1 - g.e1g END)", "we_")}
            FROM rows_all r CROSS JOIN guards g
        ),
        cand2 AS ({_unpivot_rows("we_", "aggw")}),
        best2 AS (
            SELECT c.jid AS j2, c.pol AS pol2,
                   CAST(c.err AS HUGEINT) AS e2,
                   (SELECT w2 FROM aggw) AS w2
            FROM cand2 c
            WHERE c.jid <> (SELECT j1 FROM guards)
            ORDER BY c.err, c.jid, c.pol DESC LIMIT 1
        ),
        scal AS (
            SELECT g.j1, g.pol1, g.e1, g.w1, g.e1g,
                   b.j2, b.pol2, b.e2, b.w2,
                   (CAST(g.w1 - g.e1g AS HUGEINT) * b.e2
                    > (b.w2 - b.e2) * g.e1g) AS a1_wins
            FROM guards g CROSS JOIN best2 b
        ),
        votes AS (
            SELECT CAST(SUM(CASE WHEN (
                       CASE WHEN {_h_star("s.j1", "s.pol1")}
                                 = {_h_star("s.j2", "s.pol2")}
                            THEN {_h_star("s.j1", "s.pol1")}
                            WHEN s.a1_wins
                            THEN {_h_star("s.j1", "s.pol1")}
                            ELSE {_h_star("s.j2", "s.pol2")} END) = r.y
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM rows_all r CROSS JOIN scal s
        )
        SELECT s.j1, s.pol1, CAST(s.e1 AS BIGINT) AS e1,
               CAST(s.w1 AS BIGINT) AS w1,
               s.j2, s.pol2, CAST(s.e2 AS VARCHAR) AS e2,
               CAST(s.w2 AS VARCHAR) AS w2,
               s.a1_wins,
               CAST(v.n_correct * 1000 // v.n AS BIGINT)
                   AS ensemble_acc_permille
        FROM scal s CROSS JOIN votes v
    """


@query(
    "ml_adaboost_two_round_stumps",
    oracle=_ada_oracle(),
    description="Two exact AdaBoost rounds over a 10-stump x 2-"
    "polarity panel (month / order-value / market-segment "
    "thresholds): round-2 weights use the integer-proportional "
    "update (misclassified x (W-e), correct x e — the exact "
    "(1-eps)/eps odds ratio up to global scale, which is all "
    "AdaBoost's argmin needs), and the disagreement vote compares "
    "alpha_1 vs alpha_2 by cross-multiplied odds (W1-e1)*e2 vs "
    "(W2-e2)*e1 in DECIMAL(38)/HUGEINT — no log, no float, no "
    "epsilon anywhere. Each round computes ALL 20 weighted stump "
    "errors as parallel SUM expressions in ONE scan (map-side "
    "partial agg), the argmin runs on the 20-row unpivot, and the "
    "chosen stump is re-applied via a broadcast scalar — 3 scans "
    "total regardless of panel size. 100 TB shape: boosting simple "
    "hypotheses = k conditional sums per round; no per-row state, "
    "no iteration over rows, weights never materialized as a "
    "column store write. The from-scratch ensemble that shows the "
    "engine can train, not just score.",
)
def ml_adaboost_two_round_stumps(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rows_all = (
        orders.join(customer, customer.c_custkey == orders.o_custkey)
        .selectExpr(
            "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE -1 END"
            " AS y",
            "month(o_orderdate) AS mon",
            "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
            " AS cents",
            "c_mktsegment AS seg",
        )
        .localCheckpoint(eager=False)  # feeds 3 boosting scans
    )
    aggr = rows_all.selectExpr(
        "y", "mon", "cents", "seg"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("w1"),
        *[
            F.expr(
                f"SUM(CASE WHEN {_h(cond, pol)} <> y THEN 1 ELSE 0 END)"
            )
            .cast("long")
            .alias(f"re_{j}_{'p' if pol == 1 else 'n'}")
            for j, cond in _STUMPS
            for pol in (1, -1)
        ],
    )
    cand1 = aggr.selectExpr(
        "w1",
        "stack("
        + str(len(_STUMPS) * 2)
        + ", "
        + ", ".join(
            f"{j}, {pol}, re_{j}_{'p' if pol == 1 else 'n'}"
            for j, _ in _STUMPS
            for pol in (1, -1)
        )
        + ") AS (jid, pol, err)",
    )
    w1w = Window.orderBy("err", "jid", F.col("pol").desc())
    best1 = (
        cand1.withColumn("rn", F.row_number().over(w1w))
        .where(F.col("rn") == 1)
        .selectExpr(
            "jid AS j1",
            "pol AS pol1",
            "CAST(err AS BIGINT) AS e1",
            "w1",
            "GREATEST(1, LEAST(err, w1 - 1)) AS e1g",
        )
    )
    wexpr = (
        f"(CASE WHEN {_h_star('j1', 'pol1')} = y THEN e1g"
        f" ELSE w1 - e1g END)"
    )
    aggw = rows_all.crossJoin(F.broadcast(best1)).agg(
        F.expr(f"SUM(CAST({wexpr} AS DECIMAL(38,0)))").alias("w2"),
        *[
            F.expr(
                f"SUM(CASE WHEN {_h(cond, pol)} <> y THEN"
                f" CAST({wexpr} AS DECIMAL(38,0)) ELSE 0 END)"
            ).alias(f"we_{j}_{'p' if pol == 1 else 'n'}")
            for j, cond in _STUMPS
            for pol in (1, -1)
        ],
        F.first("j1").alias("j1x"),
    )
    cand2 = aggw.selectExpr(
        "w2",
        "j1x",
        "stack("
        + str(len(_STUMPS) * 2)
        + ", "
        + ", ".join(
            f"{j}, {pol}, we_{j}_{'p' if pol == 1 else 'n'}"
            for j, _ in _STUMPS
            for pol in (1, -1)
        )
        + ") AS (jid, pol, err)",
    ).where(F.col("jid") != F.col("j1x"))
    w2w = Window.orderBy("err", "jid", F.col("pol").desc())
    best2 = (
        cand2.withColumn("rn", F.row_number().over(w2w))
        .where(F.col("rn") == 1)
        .selectExpr("jid AS j2", "pol AS pol2", "err AS e2", "w2")
    )
    scal = (
        best1.crossJoin(F.broadcast(best2))
        .withColumn(
            "a1_wins",
            F.expr(
                "CAST(w1 - e1g AS DECIMAL(38,0)) * e2"
                " > (w2 - e2) * CAST(e1g AS DECIMAL(38,0))"
            ),
        )
        .localCheckpoint(eager=False)  # scalar feeds vote + output
    )
    pred = (
        f"(CASE WHEN {_h_star('j1', 'pol1')} = {_h_star('j2', 'pol2')}"
        f" THEN {_h_star('j1', 'pol1')}"
        f" WHEN a1_wins THEN {_h_star('j1', 'pol1')}"
        f" ELSE {_h_star('j2', 'pol2')} END)"
    )
    votes = rows_all.crossJoin(F.broadcast(scal)).agg(
        F.expr(
            f"SUM(CASE WHEN {pred} = y THEN 1 ELSE 0 END)"
        )
        .cast("long")
        .alias("n_correct"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return scal.crossJoin(F.broadcast(votes)).selectExpr(
        "j1",
        "pol1",
        "CAST(e1 AS BIGINT) AS e1",
        "CAST(w1 AS BIGINT) AS w1",
        "j2",
        "pol2",
        "CAST(e2 AS STRING) AS e2",
        "CAST(w2 AS STRING) AS w2",
        "a1_wins",
        "CAST(n_correct * 1000 div n AS BIGINT)"
        " AS ensemble_acc_permille",
    )


@query(
    "time_t2_settlement_battery",
    oracle="""
        WITH base AS (
            SELECT ((date_diff('day', DATE '1995-01-02', o_orderdate)
                     % 7) + 7) % 7 AS wd
            FROM orders
        ), lagged AS (
            SELECT wd,
                   CASE WHEN wd <= 2 THEN 2
                        WHEN wd <= 4 THEN 4
                        WHEN wd = 5 THEN 3
                        ELSE 2 END AS lag_days
            FROM base
        )
        SELECT CAST(lag_days AS BIGINT) AS lag_days,
               CAST((wd + lag_days) % 7 AS BIGINT) AS settle_weekday,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM lagged
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    description="T+2 business-day settlement battery: weekday from "
    "sign-safe epoch-Monday modulo arithmetic (((datediff from "
    "1995-01-02) % 7) + 7) % 7 — identical integer semantics in both "
    "engines, no locale-dependent dayofweek() anywhere — then the "
    "weekend-aware closed form (Mon-Wed +2, Thu-Fri +4, Sat +3, Sun "
    "+2). The output grain (lag_days, settle_weekday) makes the "
    "invariant VISIBLE: settle_weekday never equals 5 or 6, so a "
    "calendar regression shows up as a new row, not a silent shift. "
    "100 TB shape: pure per-row integer arithmetic folded into one "
    "map-side partial agg on a <= 8-row group domain — the "
    "settlement-date engine every trade/payment ledger runs.",
)
def time_t2_settlement_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.selectExpr(
        "((datediff(o_orderdate, DATE '1995-01-02') % 7) + 7) % 7 AS wd"
    )
    lagged = base.selectExpr(
        "wd",
        "CASE WHEN wd <= 2 THEN 2 WHEN wd <= 4 THEN 4"
        " WHEN wd = 5 THEN 3 ELSE 2 END AS lag_days",
    )
    return (
        lagged.groupBy(
            F.col("lag_days").cast("long").alias("lag_days"),
            F.expr("CAST((wd + lag_days) % 7 AS BIGINT)").alias(
                "settle_weekday"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy("lag_days", "settle_weekday")
    )
