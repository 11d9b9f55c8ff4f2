"""Wave-154 (round 5): Little's law identity + IPF raking.

* ``ops_littles_law_identity`` — Little's law on real data as an
  EXACT integer identity: over a one-year window, the order-days
  area computed per-entity (sum of clamped [orderdate, last-ship)
  overlaps) must equal the same area computed by the completely
  different sweepline route (clamped +1/-1 events, prefix sum over
  the bounded day spine, summed backlog).  Both integers are
  emitted and the hash match proves the sweepline decomposition
  equals the per-entity integral — the finite-window form
  L_bar * T = sum-of-time-in-system that Little's law rests on.
  L, W and lambda follow as quantized millis.
* ``stats_ipf_raking`` — iterative proportional fitting (raking) of
  the 5x5 market-segment x region contingency table to planted
  equal-share margins (largest-remainder split of the real total):
  8 alternating row/column scalings with every ratio quantized to
  integer micros.  The 25-cell table is bounded BY CONSTRUCTION, so
  the iteration runs on the driver (the wave-149/152 lesson: tiny-
  table DataFrame loops hit geometric AQE recompilation); the
  oracle unrolls the same 16 scaling steps as generated MATERIALIZED
  CTEs, so the hash match cross-checks the driver arithmetic
  against pure SQL.  Emits the final max margin deviation, so
  convergence is measured, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ Little's law

_LL_T1 = "1996-01-01"
_LL_T2 = "1997-01-01"


@query(
    "ops_littles_law_identity",
    oracle=f"""
        WITH fin AS (
            SELECT l_orderkey, MAX(l_shipdate) AS mx
            FROM lineitem GROUP BY l_orderkey
        ), iv AS (
            SELECT LEAST(o.o_orderdate, f.mx) AS s,
                   GREATEST(o.o_orderdate, f.mx) AS e
            FROM orders o JOIN fin f ON f.l_orderkey = o.o_orderkey
        ), win AS (
            SELECT DATE '{_LL_T1}' AS t1, DATE '{_LL_T2}' AS t2
        ), per_entity AS (
            SELECT CAST(SUM(GREATEST(0,
                       date_diff('day', GREATEST(s, t1),
                                 LEAST(e, t2)))) AS BIGINT) AS area_a,
                   CAST(SUM(CASE WHEN s < t2 AND e > t1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_present
            FROM iv, win
        ), ev AS (
            SELECT date_diff('day', t1, GREATEST(s, t1)) AS d,
                   CAST(1 AS BIGINT) AS delta
            FROM iv, win WHERE s < t2 AND e > t1
            UNION ALL
            SELECT date_diff('day', t1, LEAST(e, t2)), -1
            FROM iv, win WHERE s < t2 AND e > t1
        ), per_day AS (
            SELECT d, SUM(delta) AS net FROM ev GROUP BY d
        ), spine AS (
            SELECT UNNEST(generate_series(0,
                date_diff('day', DATE '{_LL_T1}',
                          DATE '{_LL_T2}') - 1)) AS d
        ), backlog AS (
            SELECT sp.d,
                   SUM(COALESCE(pd.net, 0)) OVER (
                       ORDER BY sp.d
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS q
            FROM spine sp LEFT JOIN per_day pd ON pd.d = sp.d
        ), sweep AS (
            SELECT CAST(SUM(q) AS BIGINT) AS area_b,
                   CAST(COUNT(*) AS BIGINT) AS t_days
            FROM backlog
        )
        SELECT p.area_a, s.area_b,
               CAST(CASE WHEN p.area_a = s.area_b THEN 1 ELSE 0 END
                    AS BIGINT) AS identity_holds,
               s.t_days, p.n_present,
               CAST(s.area_b * 1000 // s.t_days AS BIGINT)
                   AS l_avg_millis,
               CAST(p.area_a * 1000 // p.n_present AS BIGINT)
                   AS w_avg_millis,
               CAST(p.n_present * 1000 // s.t_days AS BIGINT)
                   AS lambda_millis
        FROM per_entity p CROSS JOIN sweep s
    """,
    description="Little's law on real data as an EXACT integer "
    "identity: the order-days area over a one-year window computed "
    "per-entity (clamped [orderdate, last-ship) overlaps summed in "
    "one scan) must equal the area computed by the completely "
    "different sweepline route (clamped +1/-1 events, prefix sum "
    "over the bounded 365-day spine, backlog summed) — both "
    "integers emitted with the equality flag, so the hash match "
    "PROVES the sweepline decomposition equals the per-entity "
    "integral: the finite-window L_bar*T = sum-of-time-in-system "
    "that Little's law rests on, with L, W, lambda following as "
    "quantized millis. 100 TB shape: side A is one scan-side sum; "
    "side B aggregates events per day then runs one window over "
    "the bounded spine — no entity-grain window anywhere.",
)
def ops_littles_law_identity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fin = lineitem.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("mx")
    )
    t1 = F.lit(_LL_T1).cast("date")
    t2 = F.lit(_LL_T2).cast("date")
    iv = (
        orders.join(fin, fin.l_orderkey == orders.o_orderkey)
        .select(
            F.least("o_orderdate", "mx").alias("s"),
            F.greatest("o_orderdate", "mx").alias("e"),
        )
        .localCheckpoint(eager=False)  # feeds both sides of the identity
    )
    per_entity = iv.select(
        F.greatest(
            F.lit(0),
            F.datediff(F.least("e", t2), F.greatest("s", t1)),
        )
        .cast("long")
        .alias("ov"),
        F.when((F.col("s") < t2) & (F.col("e") > t1), 1)
        .otherwise(0)
        .alias("present"),
    ).agg(
        F.sum("ov").cast("long").alias("area_a"),
        F.sum("present").cast("long").alias("n_present"),
    )
    inwin = iv.where((F.col("s") < t2) & (F.col("e") > t1))
    ev = inwin.select(
        F.datediff(F.greatest("s", t1), t1).alias("d"),
        F.lit(1).cast("long").alias("delta"),
    ).unionByName(
        inwin.select(
            F.datediff(F.least("e", t2), t1).alias("d"),
            F.lit(-1).cast("long").alias("delta"),
        )
    )
    per_day = ev.groupBy("d").agg(F.sum("delta").alias("net"))
    n_days = 366  # 1996 is a leap year: days in [T1, T2)
    spine = spark.range(n_days).select(F.col("id").alias("d"))
    wspine = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    backlog = (
        spine.join(F.broadcast(per_day), "d", "left")
        .select("d", F.coalesce("net", F.lit(0)).alias("net"))
        .withColumn("q", F.sum("net").over(wspine))
    )
    sweep = backlog.agg(
        F.sum("q").cast("long").alias("area_b"),
        F.count(F.lit(1)).cast("long").alias("t_days"),
    )
    return per_entity.crossJoin(F.broadcast(sweep)).select(
        "area_a",
        "area_b",
        F.when(F.col("area_a") == F.col("area_b"), 1)
        .otherwise(0)
        .cast("long")
        .alias("identity_holds"),
        "t_days",
        "n_present",
        F.expr("area_b * 1000 div t_days")
        .cast("long")
        .alias("l_avg_millis"),
        F.expr("area_a * 1000 div n_present")
        .cast("long")
        .alias("w_avg_millis"),
        F.expr("n_present * 1000 div t_days")
        .cast("long")
        .alias("lambda_millis"),
    )


# ------------------------------------------------ IPF raking

_IPF_ROUNDS = 8  # alternating row/col scalings => 16 steps


def _ipf_oracle() -> str:
    levels = []
    for k in range(1, _IPF_ROUNDS + 1):
        p = f"w{2 * k - 2}"
        levels.append(
            f"""rs{k} AS MATERIALIZED (
            SELECT seg, CAST(SUM(w) AS HUGEINT) AS s
            FROM {p} GROUP BY seg
        ), w{2 * k - 1} AS MATERIALIZED (
            SELECT c.seg, c.reg, c.n,
                   CAST(CAST(c.w AS HUGEINT) * rt.t * 1000000
                        // rs{k}.s AS BIGINT) AS w
            FROM {p} c
            JOIN rs{k} ON rs{k}.seg = c.seg
            JOIN rowt rt ON rt.seg = c.seg
        ), cs{k} AS MATERIALIZED (
            SELECT reg, CAST(SUM(w) AS HUGEINT) AS s
            FROM w{2 * k - 1} GROUP BY reg
        ), w{2 * k} AS MATERIALIZED (
            SELECT c.seg, c.reg, c.n,
                   CAST(CAST(c.w AS HUGEINT) * ct.t * 1000000
                        // cs{k}.s AS BIGINT) AS w
            FROM w{2 * k - 1} c
            JOIN cs{k} ON cs{k}.reg = c.reg
            JOIN colt ct ON ct.reg = c.reg
        )"""
        )
    return f"""
        WITH cells AS MATERIALIZED (
            SELECT c.c_mktsegment AS seg, r.r_name AS reg,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM customer c
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY 1, 2
        ), tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells
        ), segs AS (
            SELECT seg, ROW_NUMBER() OVER (ORDER BY seg) - 1 AS i,
                   COUNT(*) OVER () AS k
            FROM (SELECT DISTINCT seg FROM cells)
        ), rowt AS MATERIALIZED (
            SELECT seg, CAST(total // k
                   + CASE WHEN i < total % k THEN 1 ELSE 0 END
                   AS BIGINT) AS t
            FROM segs, tot
        ), regs AS (
            SELECT reg, ROW_NUMBER() OVER (ORDER BY reg) - 1 AS i,
                   COUNT(*) OVER () AS k
            FROM (SELECT DISTINCT reg FROM cells)
        ), colt AS MATERIALIZED (
            SELECT reg, CAST(total // k
                   + CASE WHEN i < total % k THEN 1 ELSE 0 END
                   AS BIGINT) AS t
            FROM regs, tot
        ), w0 AS MATERIALIZED (
            SELECT seg, reg, n, CAST(n * 1000000 AS BIGINT) AS w
            FROM cells
        ), {", ".join(levels)}, fin AS (
            SELECT * FROM w{2 * _IPF_ROUNDS}
        ), dev AS (
            SELECT CAST(MAX(ABS(rs.s - rt.t * 1000000)) AS BIGINT)
                       AS max_row_dev_micro
            FROM (SELECT seg, CAST(SUM(w) AS HUGEINT) AS s
                  FROM fin GROUP BY seg) rs
            JOIN rowt rt ON rt.seg = rs.seg
        )
        SELECT f.seg, f.reg, f.n, f.w AS w_micro,
               d.max_row_dev_micro
        FROM fin f CROSS JOIN dev d
        ORDER BY f.seg, f.reg
    """


@query(
    "stats_ipf_raking",
    oracle=_ipf_oracle(),
    description="Iterative proportional fitting (survey raking) of "
    "the 5x5 segment x region contingency table to equal-share "
    "margins (largest-remainder split of the real total — planted, "
    "deterministic targets): 8 alternating row/column scalings with "
    "every ratio quantized to integer micros in HUGEINT/"
    "DECIMAL(38)-free driver arithmetic (all values positive, so "
    "Python // equals SQL trunc). The 25-cell table is bounded BY "
    "CONSTRUCTION, so the iteration runs on the driver per the "
    "wave-149/152 small-table AQE lesson; the oracle unrolls the "
    "same 16 scaling steps as generated MATERIALIZED CTEs, so the "
    "hash match cross-checks the driver loop against pure SQL. The "
    "final max row-margin deviation is EMITTED — convergence is "
    "measured, not assumed. 100 TB shape: one data-scale "
    "aggregation to the bounded grid; the raking itself is "
    "model-table work.",
)
def stats_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cells_df = (
        customer.join(
            F.broadcast(nation),
            nation.n_nationkey == customer.c_nationkey,
        )
        .join(
            F.broadcast(region),
            region.r_regionkey == nation.n_regionkey,
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("r_name").alias("reg"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    # bounded 5x5 grid by construction -> driver-side iteration
    cells = [(r["seg"], r["reg"], r["n"]) for r in cells_df.collect()]
    total = sum(n for _, _, n in cells)
    segs = sorted({s for s, _, _ in cells})
    regs = sorted({r for _, r, _ in cells})
    rowt = {
        s: total // len(segs) + (1 if i < total % len(segs) else 0)
        for i, s in enumerate(segs)
    }
    colt = {
        r: total // len(regs) + (1 if i < total % len(regs) else 0)
        for i, r in enumerate(regs)
    }
    w = {(s, r): n * 1000000 for s, r, n in cells}
    for _ in range(_IPF_ROUNDS):
        rs = {s: 0 for s in segs}
        for (s, r), v in w.items():
            rs[s] += v
        w = {
            (s, r): v * rowt[s] * 1000000 // rs[s]
            for (s, r), v in w.items()
        }
        cs = {r: 0 for r in regs}
        for (s, r), v in w.items():
            cs[r] += v
        w = {
            (s, r): v * colt[r] * 1000000 // cs[r]
            for (s, r), v in w.items()
        }
    rs_fin = {s: 0 for s in segs}
    for (s, r), v in w.items():
        rs_fin[s] += v
    max_dev = max(
        abs(rs_fin[s] - rowt[s] * 1000000) for s in segs
    )
    rows = [
        (s, r, int(n), int(w[(s, r)]), int(max_dev))
        for s, r, n in sorted(cells)
    ]
    return spark.createDataFrame(
        rows,
        "seg: string, reg: string, n: long, w_micro: long,"
        " max_row_dev_micro: long",
    ).orderBy("seg", "reg")
