"""Wave-152 (round 5): functional-graph cycles + exact OLS.

* ``graph_functional_cycle_structure`` — rho-structure analysis of
  the Pollard iteration f(x) = (x^2 + 1) mod N over the dense
  customer key space: every node's trajectory ends in a cycle, and
  the query finds EVERY cycle, its length, and its basin size with
  POINTER DOUBLING — f^(2^j) tables built by 18 self-joins (2^18
  exceeds any tail at the swept scales) with an eager barrier per
  level (each references the previous twice — the plan-duplication
  trap), then the cycle-node image (rho theory: ~sqrt(pi*N/2)
  nodes, the bounded-collect contract) is labeled on the driver —
  the per-level DataFrame variant of that second phase measured
  the same geometric AQE blowup as the wave-149 matching loop.
  The oracle runs BOTH phases as generated MATERIALIZED doubling
  CTE levels, so the hash match also cross-checks the driver walk
  against pure-SQL (reach, min)-carry doubling.
* ``regression_ols_exact`` — plain OLS of order totalprice (cents)
  on order date (days), float-free: slope and intercept from the
  closed-form integer sums, and R^2 in permille via TWO-STEP
  quantization — num^2/(den_x*den_y) overflows 38 digits at sf1
  (the numerator alone passes 1e22), so the slope ratio is
  quantized to micros first and multiplied back, keeping every
  intermediate under 1e34.  Cauchy-Schwarz bounds the numerator by
  sqrt(den_x*den_y), which is the documented overflow headroom
  argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------- functional-graph cycles

_FC_LEVELS = 18  # 2^18 = 262144 > N at every swept scale (sf1: 150k)


def _fc_oracle() -> str:
    p1 = []
    for j in range(1, _FC_LEVELS + 1):
        p1.append(
            f"""m{j} AS MATERIALIZED (
            SELECT a.k, b.nxt
            FROM m{j - 1} a JOIN m{j - 1} b ON b.k = a.nxt
        )"""
        )
    p2 = []
    for j in range(1, _FC_LEVELS + 1):
        p2.append(
            f"""p{j} AS MATERIALIZED (
            SELECT a.c, b.reach AS reach,
                   LEAST(a.mn, b.mn) AS mn
            FROM p{j - 1} a JOIN p{j - 1} b ON b.c = a.reach
        )"""
        )
    return f"""
        WITH nn AS MATERIALIZED (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer
        ), m0 AS MATERIALIZED (
            SELECT c_custkey AS k,
                   (c_custkey * c_custkey + 1) % n AS nxt
            FROM customer, nn
        ), {", ".join(p1)}, cyc_nodes AS MATERIALIZED (
            SELECT DISTINCT nxt AS c FROM m{_FC_LEVELS}
        ), p0 AS MATERIALIZED (
            SELECT cn.c, m0.nxt AS reach, cn.c AS mn
            FROM cyc_nodes cn JOIN m0 ON m0.k = cn.c
        ), {", ".join(p2)}, reps AS MATERIALIZED (
            SELECT c, mn AS rep FROM p{_FC_LEVELS}
        ), cyc AS (
            SELECT rep, CAST(COUNT(*) AS BIGINT) AS cycle_len
            FROM reps GROUP BY rep
        ), basins AS (
            SELECT r.rep, CAST(COUNT(*) AS BIGINT) AS basin_size
            FROM m{_FC_LEVELS} g JOIN reps r ON r.c = g.nxt
            GROUP BY r.rep
        )
        SELECT CAST(c.rep AS BIGINT) AS rep, c.cycle_len,
               b.basin_size
        FROM cyc c JOIN basins b ON b.rep = c.rep
        ORDER BY rep
    """


@query(
    "graph_functional_cycle_structure",
    oracle=_fc_oracle(),
    description="Rho-structure analysis of the Pollard iteration "
    "f(x) = (x^2+1) mod N over the dense customer key space: every "
    "cycle, its length, and its basin size, found by POINTER "
    "DOUBLING — 18 self-joins build f^(2^18) (past any tail at the "
    "swept scales), then the cycle-node image (rho theory: "
    "~sqrt(pi*N/2) rows — "
    "the bounded-collect contract) is cycle-labeled on the driver "
    "and rejoined broadcast. Distributed cycle detection: "
    "O(N log N) work in log-rounds of co-partitioned joins with an "
    "eager barrier per level, NO sequential walk over the "
    "data-scale table — the shape that survives a 100 TB key space "
    "where any walk takes N steps. The oracle runs BOTH phases as "
    "MATERIALIZED doubling CTEs, so the hash match cross-checks "
    "the driver walk against pure-SQL min-carry doubling. "
    "Precondition: dense 0..N-1 keys (a fixture fact the PK "
    "audits pin).",
)
def graph_functional_cycle_structure(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nn = customer.agg(F.count(F.lit(1)).alias("n"))
    m = (
        customer.crossJoin(F.broadcast(nn))
        .select(
            F.col("c_custkey").alias("k"),
            ((F.col("c_custkey") * F.col("c_custkey") + 1) % F.col("n"))
            .alias("nxt"),
        )
        .localCheckpoint()
    )
    m0 = m
    # r12: checkpoint every SECOND doubling level instead of every
    # level. Each level references m twice (lookup of lookup), so two
    # unchecked levels put 4 copies of the previous checkpoint's scan
    # in the plan — bounded and exchange-reusable, unlike the
    # unbounded 2^rounds growth that motivated per-level checkpoints.
    # 18 materialization round trips -> 9 for identical arithmetic.
    for lvl in range(_FC_LEVELS):
        b = m.select(F.col("k").alias("bk"), F.col("nxt").alias("bnxt"))
        m = m.join(b, m.nxt == F.col("bk")).select(
            "k", F.col("bnxt").alias("nxt")
        )
        if lvl % 2 == 1 or lvl == _FC_LEVELS - 1:
            m = m.localCheckpoint()
    cyc_nodes = m.select(F.col("nxt").alias("c")).distinct()
    # Phase 2 — cycle labeling. The cycle-node set is the image of
    # f^(2^18): rho theory puts its expected size at sqrt(pi*N/2)
    # (~485 at sf1; measured 6 at sf0.01), so it falls under the
    # bounded-collect contract. Doing this phase with per-level
    # DataFrame doubling measured the SAME geometric AQE
    # recompilation blowup as the wave-149 matching loop (tiny
    # broadcast-sized tables; 0.7 -> 55 s by level 5 despite eager
    # checkpoints), while phase 1 on the data-scale table is flat —
    # so the small set walks on the driver and the reps rejoin as a
    # broadcast table.
    csucc = (
        cyc_nodes.join(m0, m0.k == cyc_nodes.c)
        .select("c", F.col("nxt").alias("reach"))
        .collect()
    )
    succ = {r["c"]: r["reach"] for r in csucc}
    rep_of: dict = {}
    for start in succ:
        if start in rep_of:
            continue
        cycle = [start]
        cur = succ[start]
        while cur != start:
            cycle.append(cur)
            cur = succ[cur]
        rep = min(cycle)
        for node in cycle:
            rep_of[node] = rep
    reps = spark.createDataFrame(
        [(int(c), int(r)) for c, r in sorted(rep_of.items())],
        "c: long, rep: long",
    )
    cyc = reps.groupBy("rep").agg(
        F.count(F.lit(1)).cast("long").alias("cycle_len")
    )
    basins = (
        m.join(reps, reps.c == m.nxt)
        .groupBy("rep")
        .agg(F.count(F.lit(1)).cast("long").alias("basin_size"))
    )
    return (
        cyc.join(basins, "rep")
        .select(
            F.col("rep").cast("long").alias("rep"),
            "cycle_len",
            "basin_size",
        )
        .orderBy("rep")
    )


# ------------------------------------------------ exact OLS

_OLS_EPOCH = "1995-01-01"


@query(
    "regression_ols_exact",
    oracle=f"""
        WITH pts AS (
            SELECT CAST(date_diff('day', DATE '{_OLS_EPOCH}',
                        o_orderdate) AS BIGINT) AS x,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS y
            FROM orders
        ), sums AS (
            SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(x) AS HUGEINT) AS sx,
                   CAST(SUM(y) AS HUGEINT) AS sy,
                   CAST(SUM(x * y) AS HUGEINT) AS sxy,
                   CAST(SUM(x * x) AS HUGEINT) AS sxx,
                   CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT)
                       AS syy
            FROM pts
        ), alg AS (
            SELECT n,
                   n * sxy - sx * sy AS num,
                   n * sxx - sx * sx AS den_x,
                   n * syy - sy * sy AS den_y,
                   sx, sy, sxx, sxy
            FROM sums
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(num * 1000000 // den_x AS BIGINT)
                   AS slope_microcents_per_day,
               CAST((sy * sxx - sx * sxy) // den_x AS BIGINT)
                   AS intercept_cents,
               CAST((num * 1000000 // den_x) * num * 1000
                    // (den_y * 1000000) AS BIGINT) AS r2_permille
        FROM alg
    """,
    description="Plain OLS of order value (cents) on order date "
    "(days), float-free: slope and intercept from the closed-form "
    "integer sums, R^2 in permille via TWO-STEP quantization — "
    "num^2/(den_x*den_y) would pass 1e44 at sf1 (the numerator "
    "alone exceeds 1e22, and Cauchy-Schwarz bounds it by "
    "sqrt(den_x*den_y), the documented headroom argument), so the "
    "slope ratio quantizes to micros first and multiplies back, "
    "keeping every intermediate under ~1e34 in HUGEINT/"
    "DECIMAL(38). Completes the regression lane next to Theil-Sen "
    "(robust), RANSAC (deterministic), and isotonic (monotone). "
    "100 TB shape: one scan, five partial-aggregated sums, scalar "
    "algebra.",
)
def regression_ols_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        F.datediff(
            "o_orderdate", F.lit(_OLS_EPOCH).cast("date")
        )
        .cast("long")
        .alias("x"),
        (F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("y"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("x") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    alg = sums.select(
        "n",
        F.expr("n * sxy - sx * sy").alias("num"),
        F.expr("n * sxx - sx * sx").alias("den_x"),
        F.expr("n * syy - sy * sy").alias("den_y"),
        "sx",
        "sy",
        "sxx",
        "sxy",
    )
    return alg.select(
        F.col("n").cast("long").alias("n"),
        F.expr("CAST(num * 1000000 div den_x AS BIGINT)").alias(
            "slope_microcents_per_day"
        ),
        F.expr(
            "CAST((sy * sxx - sx * sxy) div den_x AS BIGINT)"
        ).alias("intercept_cents"),
        F.expr(
            "CAST((num * 1000000 div den_x) * num * 1000"
            " div (den_y * 1000000) AS BIGINT)"
        ).alias("r2_permille"),
    )
