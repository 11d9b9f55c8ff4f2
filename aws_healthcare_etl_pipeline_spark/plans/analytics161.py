"""Wave-187 (round 5): Good-Turing mass + discounted cash flow.

* ``text_good_turing_mass`` — the Good-Turing missing-mass estimate
  p0 = n1/N (the probability the NEXT token is unseen) per document
  source, from the frequency-of-frequencies table: hapax and dis
  legomena counts, vocabulary, token mass, and p0 in exact permille
  — the smoothing quantity every n-gram LM and coverage estimator
  needs, computed as two nested aggregations.

* ``finance_npv_irr_rate_grid`` — NPV across a monthly discount-rate
  grid with IRR bracketing: the discount factors (1000/(1000+r))^t
  are precomputed EXACTLY in Python bigints (floored to ppm) and
  embedded as the same literal table in both engines — no float
  pow, no engine math library — so NPV per rate is one broadcast
  join over the bounded month spine and the IRR is the grid bracket
  where NPV crosses zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import query


@query(
    "text_good_turing_mass",
    oracle=r"""
        WITH toks AS (
            SELECT source,
                   UNNEST(regexp_split_to_array(trim(text), '\s+'))
                       AS tok
            FROM documents
        ), freqs AS (
            SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS f
            FROM toks GROUP BY source, tok
        )
        SELECT source,
               CAST(SUM(f) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax_n1,
               CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dis_n2,
               CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) * 1000
                    // SUM(f) AS BIGINT) AS gt_missing_mass_permille
        FROM freqs
        GROUP BY source
        ORDER BY source
    """,
    description="Good-Turing missing mass per document source: from "
    "the frequency-of-frequencies table, the probability that the "
    "NEXT token drawn is previously unseen is p0 = n1/N (hapax count "
    "over token mass) — emitted in exact permille alongside vocab, "
    "hapax, and dis-legomena counts. This is the smoothing quantity "
    "under every n-gram LM and the coverage stopping rule for "
    "corpus collection ('how much tail am I still missing?'). 100 "
    "TB shape: explode, (source, token) partial-agg count, then a "
    "source-grain rollup — two shuffles, both combiner-friendly, "
    "output bounded by source count.",
)
def text_good_turing_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    )
    freqs = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    return (
        freqs.groupBy("source")
        .agg(
            F.sum("f").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax_n1"),
            F.sum(F.when(F.col("f") == 2, 1).otherwise(0))
            .cast("long")
            .alias("dis_n2"),
            F.expr(
                "CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) * 1000"
                " div SUM(f) AS BIGINT)"
            ).alias("gt_missing_mass_permille"),
        )
        .orderBy("source")
    )


_NPV_RATES = list(range(10, 151, 10))  # monthly rates in permille
_NPV_MAX_T = 90  # months


def _df_table() -> list[tuple[int, int, int]]:
    """(rate_pm, t, df_ppm) with df = floor(1e6 * (1000/(1000+r))^t),
    computed in exact Python bigints."""
    rows = []
    for r in _NPV_RATES:
        num, den = 1, 1
        for t in range(_NPV_MAX_T + 1):
            if t > 0:
                num *= 1000
                den *= 1000 + r
            rows.append((r, t, (10**6 * num) // den))
    return rows


_DF_ROWS = _df_table()


@query(
    "finance_npv_irr_rate_grid",
    oracle=f"""
        WITH df(rate_pm, t, df_ppm) AS (
            VALUES {", ".join(f"({r}, {t}, {d})"
                              for r, t, d in _DF_ROWS)}
        ), monthly AS (
            SELECT (EXTRACT(year FROM o_orderdate)
                    - (SELECT MIN(EXTRACT(year FROM o_orderdate))
                       FROM orders)) * 12
                   + EXTRACT(month FROM o_orderdate)
                   - (SELECT MIN(EXTRACT(month FROM o_orderdate))
                      FROM orders
                      WHERE EXTRACT(year FROM o_orderdate) =
                        (SELECT MIN(EXTRACT(year FROM o_orderdate))
                         FROM orders)) AS t,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS rev
            FROM orders GROUP BY 1
        ), cost AS (
            SELECT CAST(SUM(rev) * 3 // 10 AS BIGINT) AS c0
            FROM monthly
        ), npv AS (
            SELECT d.rate_pm,
                   CAST(SUM(CAST(m.rev AS HUGEINT) * d.df_ppm
                        // 1000000) - MAX(c.c0) AS BIGINT)
                       AS npv_cents
            FROM monthly m
            JOIN df d ON d.t = m.t
            CROSS JOIN cost c
            GROUP BY d.rate_pm
        )
        SELECT rate_pm, npv_cents,
               npv_cents < 0 AND COALESCE(LAG(npv_cents)
                   OVER (ORDER BY rate_pm) >= 0, TRUE)
                   AS irr_bracket
        FROM npv
        ORDER BY rate_pm
    """,
    description="NPV across a monthly discount-rate grid (10-150 "
    "permille) with IRR bracketing, float-free: the discount factors "
    "(1000/(1000+r))^t are computed EXACTLY in Python bigints, "
    "floored to ppm, and embedded as the identical literal table in "
    "both engines — no pow(), no exp/ln, no engine math-library "
    "divergence possible. Monthly revenue is the project's inflow "
    "stream, 30% of total revenue is the t=0 cost, and NPV per rate "
    "is one broadcast join over the bounded month spine; the first "
    "grid rate where NPV turns negative brackets the IRR (NPV is "
    "monotone in r). 100 TB shape: one partial agg to ~84 month "
    "rows, a 1300-row broadcast table, a 15-row window — the "
    "capital-allocation query finance runs on any revenue stream.",
)
def finance_npv_irr_rate_grid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(
        F.min(F.expr("year(o_orderdate) * 12 + month(o_orderdate)"))
        .alias("m0")
    )
    monthly = (
        orders.crossJoin(F.broadcast(anchor))
        .selectExpr(
            "year(o_orderdate) * 12 + month(o_orderdate) - m0 AS t",
            "CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS cents",
        )
        .groupBy("t")
        .agg(F.expr("CAST(SUM(cents) AS BIGINT)").alias("rev"))
        .localCheckpoint(eager=False)  # feeds cost + npv lanes
    )
    cost = monthly.agg(
        F.expr("CAST(SUM(rev) * 3 div 10 AS BIGINT)").alias("c0")
    )
    df_rows = spark.createDataFrame(
        _DF_ROWS, "rate_pm int, t int, df_ppm long"
    )
    npv = (
        monthly.join(F.broadcast(df_rows), "t")
        .crossJoin(F.broadcast(cost))
        .groupBy("rate_pm")
        .agg(
            F.expr(
                "CAST(SUM(CAST(rev AS DECIMAL(38,0)) * df_ppm"
                " div 1000000) - MAX(c0) AS BIGINT)"
            ).alias("npv_cents")
        )
    )
    w = Window.orderBy("rate_pm")
    return npv.select(
        "rate_pm",
        "npv_cents",
        (
            (F.col("npv_cents") < 0)
            & F.coalesce(
                F.lag("npv_cents").over(w) >= 0, F.lit(True)
            )
        ).alias("irr_bracket"),
    ).orderBy("rate_pm")
