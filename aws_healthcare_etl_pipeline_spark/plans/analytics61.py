"""Wave-87 (round 5): fair-share allocation + space-filling-curve
locality.

* ``alloc_maxmin_fair_share`` — max-min fair (water-filling)
  allocation of a scarce capacity across nation-level demands,
  entirely in integer arithmetic: the satisfied set is found by the
  exact cross-multiplied water-level test d_k * (n-k+1) <=
  C - P_(k-1), the unsatisfied tail splits the residue by integer
  division, and the remainder cents go to the lexicographically
  first nations (largest-remainder precedent). The quota scheduler's
  core computation, reduced to a ranked prefix-sum over the demand
  spine.
* ``layout_hilbert_vs_zorder_locality`` — which curve keeps a 2-D
  box query contiguous? Occupied cells inside a box are indexed by
  BOTH the Morton (Z-order) interleave and the Hilbert distance —
  the Hilbert transform is the 8-round rotate/flip recurrence
  unrolled into arithmetic CASE steps (no bitwise XOR: the
  (3*rx) xor ry table is the arithmetic CASE ry / 3 - ry), with
  THE SAME generated SQL strings executed by both engines — and the
  audit counts contiguous index runs and span per curve: fewer runs
  = fewer range reads for the same data. The measurement behind
  choosing a clustering curve for 100 TB layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------- max-min fair share


@query(
    "alloc_maxmin_fair_share",
    oracle="""
        WITH demand AS (
            SELECT n.n_name AS nation,
                   CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(15,2))
                                 * 100 AS BIGINT)) AS BIGINT) AS d
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        ), cap AS (
            SELECT CAST(SUM(d) // 2 AS BIGINT) AS c,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM demand
        ), ranked AS (
            SELECT nation, d,
                   ROW_NUMBER() OVER (ORDER BY d, nation) AS k,
                   CAST(COALESCE(SUM(d) OVER (ORDER BY d, nation
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS p_before
            FROM demand
        ), marked AS (
            SELECT r.*, cap.c, cap.n,
                   CASE WHEN r.d * (cap.n - r.k + 1) <= cap.c - r.p_before
                        THEN 1 ELSE 0 END AS satisfied
            FROM ranked r CROSS JOIN cap
        ), cut AS (
            SELECT COALESCE(MAX(k), 0) AS k_star,
                   COALESCE(MAX(CASE WHEN satisfied = 1
                                     THEN p_before + d END), 0) AS p_star
            FROM marked WHERE satisfied = 1
        )
        SELECT m.nation,
               m.d AS demand_cents,
               CAST(CASE WHEN m.satisfied = 1 THEN m.d
                    ELSE (m.c - ct.p_star) // (m.n - ct.k_star)
                         + CASE WHEN ROW_NUMBER() OVER (
                                    PARTITION BY m.satisfied
                                    ORDER BY m.nation)
                                <= (m.c - ct.p_star) % (m.n - ct.k_star)
                                AND m.satisfied = 0
                                THEN 1 ELSE 0 END
                    END AS BIGINT) AS allocated_cents,
               CAST(m.satisfied AS BIGINT) AS fully_satisfied
        FROM marked m CROSS JOIN cut ct
        ORDER BY m.nation
    """,
    description="Max-min fair (water-filling) allocation of scarce "
    "capacity (half of total demand, exact cents) across nation "
    "demands: the satisfied prefix is found by the integer cross-"
    "multiplication d_k * (n-k+1) <= C - P_(k-1) over the demand-"
    "ranked spine, the unsatisfied tail splits the residue by "
    "integer division, and remainder cents go to lexicographically "
    "first nations — the largest-remainder discipline, so the "
    "allocation sums to C EXACTLY. The quota-scheduler core as a "
    "ranked prefix sum. Scale: the fact stream collapses to one "
    "demand row per entity first (map-side combined); the water-"
    "level logic runs on the entity spine (bounded), and the "
    "capacity row broadcasts.",
)
def alloc_maxmin_fair_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    demand = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("cents").cast("long").alias("d"))
    )
    cap = demand.agg(
        F.expr("sum(d) div 2").cast("long").alias("c"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    w = Window.orderBy("d", "nation")
    ranked = demand.select(
        "nation",
        "d",
        F.row_number().over(w).alias("k"),
        F.coalesce(
            F.sum("d").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("long")
        .alias("p_before"),
    )
    marked = ranked.crossJoin(F.broadcast(cap)).withColumn(
        "satisfied",
        (
            F.col("d") * (F.col("n") - F.col("k") + 1)
            <= F.col("c") - F.col("p_before")
        ).cast("long"),
    )
    cut = marked.filter(F.col("satisfied") == 1).agg(
        F.coalesce(F.max("k"), F.lit(0)).alias("k_star"),
        F.coalesce(F.max(F.col("p_before") + F.col("d")), F.lit(0)).alias(
            "p_star"
        ),
    )
    wrem = Window.partitionBy("satisfied").orderBy("nation")
    return (
        marked.crossJoin(F.broadcast(cut))
        .withColumn("rem_rank", F.row_number().over(wrem))
        .select(
            "nation",
            F.col("d").alias("demand_cents"),
            F.when(F.col("satisfied") == 1, F.col("d"))
            .otherwise(
                F.expr("(c - p_star) div (n - k_star)")
                + F.when(
                    (F.col("satisfied") == 0)
                    & (
                        F.col("rem_rank")
                        <= F.expr("(c - p_star) % (n - k_star)")
                    ),
                    1,
                )
                .otherwise(0)
            )
            .cast("long")
            .alias("allocated_cents"),
            F.col("satisfied").cast("long").alias("fully_satisfied"),
        )
        .orderBy("nation")
    )


# ------------------------------------- Hilbert vs Z-order locality

_CURVE_BITS = 8  # 256 x 256 cell grid
_BOX = (64, 191, 64, 191)  # cx_lo, cx_hi, cy_lo, cy_hi


def _zorder_expr(x: str, y: str) -> str:
    """Morton interleave of two 8-bit coords — pure integer terms
    (bit i of x lands at 2i, of y at 2i+1); identical SQL for both
    engines (divisions are by powers of two, exact in FP)."""
    terms = []
    for i in range(_CURVE_BITS):
        terms.append(
            f"(CAST(floor({x} / {1 << i}.0) AS BIGINT) % 2) * {1 << (2 * i)}"
        )
        terms.append(
            f"(CAST(floor({y} / {1 << i}.0) AS BIGINT) % 2) "
            f"* {1 << (2 * i + 1)}"
        )
    return "(" + " + ".join(terms) + ")"


def _hilbert_steps() -> list[tuple[str, str, str]]:
    """The xy2d rotate/flip recurrence unrolled: one (x', y', d')
    expression triple per power-of-two s, referencing columns x, y, d.
    (3*rx) xor ry over rx, ry in {0,1} is the arithmetic CASE
    ry / 3 - ry, so no engine-specific bitwise ops appear."""
    steps = []
    for s in (1 << b for b in range(_CURVE_BITS - 1, -1, -1)):
        rx = f"(CAST(floor(x / {s}.0) AS BIGINT) % 2)"
        ry = f"(CAST(floor(y / {s}.0) AS BIGINT) % 2)"
        t = f"(CASE WHEN {rx} = 0 THEN {ry} ELSE 3 - {ry} END)"
        d_next = f"(d + {s * s} * {t})"
        x_next = (
            f"(CASE WHEN {ry} = 1 THEN x "
            f"ELSE CASE WHEN {rx} = 1 THEN {s - 1} - y ELSE y END END)"
        )
        y_next = (
            f"(CASE WHEN {ry} = 1 THEN y "
            f"ELSE CASE WHEN {rx} = 1 THEN {s - 1} - x ELSE x END END)"
        )
        steps.append((x_next, y_next, d_next))
    return steps


def _curve_oracle() -> str:
    hsteps = _hilbert_steps()
    ctes = ["h0 AS (SELECT cell, cx AS x, cy AS y, 0 AS d FROM cells)"]
    for i, (xn, yn, dn) in enumerate(hsteps):
        ctes.append(
            f"h{i + 1} AS (SELECT cell, {xn} AS x, {yn} AS y, "
            f"{dn} AS d FROM h{i})"
        )
    hil = ",\n        ".join(ctes)
    z = _zorder_expr("cx", "cy")
    lo_x, hi_x, lo_y, hi_y = _BOX
    return f"""
        WITH pts AS (
            SELECT ((((strpos('0123456789abcdef', substr(md5('x:' ||
                       CAST(c_custkey AS VARCHAR)), 1, 1)) - 1) * 16
                     + strpos('0123456789abcdef', substr(md5('x:' ||
                       CAST(c_custkey AS VARCHAR)), 2, 1)) - 1)) % 256)
                       AS cx,
                   ((((strpos('0123456789abcdef', substr(md5('y:' ||
                       CAST(c_custkey AS VARCHAR)), 1, 1)) - 1) * 16
                     + strpos('0123456789abcdef', substr(md5('y:' ||
                       CAST(c_custkey AS VARCHAR)), 2, 1)) - 1)) % 256)
                       AS cy
            FROM customer
        ), cells AS (
            SELECT DISTINCT cx, cy, cx * 256 + cy AS cell
            FROM pts
            WHERE cx BETWEEN {lo_x} AND {hi_x}
              AND cy BETWEEN {lo_y} AND {hi_y}
        ),
        {hil},
        idx AS (
            SELECT 'hilbert' AS curve, d AS ix FROM h{_CURVE_BITS}
            UNION ALL
            SELECT 'zorder' AS curve, {z} AS ix FROM cells
        ), runs AS (
            SELECT curve, ix,
                   CASE WHEN LAG(ix) OVER (PARTITION BY curve ORDER BY ix)
                             = ix - 1
                        THEN 0 ELSE 1 END AS run_start
            FROM idx
        )
        SELECT curve,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(run_start) AS BIGINT) AS n_runs,
               CAST(MAX(ix) - MIN(ix) + 1 AS BIGINT) AS index_span,
               CAST((SUM(run_start) * 1000) // COUNT(*) AS BIGINT)
                   AS runs_per_cell_permille
        FROM runs
        GROUP BY curve
        ORDER BY curve
    """


@query(
    "layout_hilbert_vs_zorder_locality",
    oracle=_curve_oracle(),
    description="Space-filling-curve locality bake-off for layout "
    "clustering: the occupied 256x256 cells inside a fixed 2-D box "
    "are indexed by BOTH the Morton (Z-order) interleave and the "
    "Hilbert distance — the Hilbert xy2d rotate/flip recurrence is "
    "unrolled into 8 arithmetic CASE steps (the (3*rx) xor ry "
    "table is CASE ry / 3-ry; every division is by a power of two, "
    "exact in FP), with THE SAME generated SQL strings run by both "
    "engines, portable by construction — and the audit counts "
    "contiguous index runs, total span, and runs-per-cell: fewer "
    "runs means fewer range reads to cover the same box, which is "
    "exactly what decides the clustering curve for a 100 TB table. "
    "Scale: cells are a bounded-domain DISTINCT (<= 64k rows no "
    "matter the point count), curve transforms are per-row "
    "arithmetic, and the run-count window partitions by curve over "
    "bounded cells.",
)
def layout_hilbert_vs_zorder_locality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")

    def hex2(prefix: str) -> F.Column:
        h = F.md5(F.concat(F.lit(prefix), F.col("c_custkey").cast("string")))
        return F.conv(F.substring(h, 1, 2), 16, 10).cast("long")

    lo_x, hi_x, lo_y, hi_y = _BOX
    cells = (
        cust.select(
            (hex2("x:") % 256).alias("cx"), (hex2("y:") % 256).alias("cy")
        )
        .filter(
            F.col("cx").between(lo_x, hi_x) & F.col("cy").between(lo_y, hi_y)
        )
        .distinct()
        .select("cx", "cy", (F.col("cx") * 256 + F.col("cy")).alias("cell"))
        .localCheckpoint(eager=False)  # feeds both curve branches
    )
    hdf = cells.selectExpr("cell", "cx AS x", "cy AS y", "CAST(0 AS BIGINT) AS d")
    for xn, yn, dn in _hilbert_steps():
        hdf = hdf.selectExpr(
            "cell", f"{xn} AS x", f"{yn} AS y", f"{dn} AS d"
        )
    hil = hdf.select(
        F.lit("hilbert").alias("curve"), F.col("d").cast("long").alias("ix")
    )
    zor = cells.selectExpr(
        "'zorder' AS curve",
        f"CAST({_zorder_expr('cx', 'cy')} AS BIGINT) AS ix",
    )
    idx = hil.unionByName(zor)
    w = Window.partitionBy("curve").orderBy("ix")
    runs = idx.select(
        "curve",
        "ix",
        F.when(F.lag("ix").over(w) == F.col("ix") - 1, 0)
        .otherwise(1)
        .alias("run_start"),
    )
    return (
        runs.groupBy("curve")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("run_start").cast("long").alias("n_runs"),
            (F.max("ix") - F.min("ix") + 1).cast("long").alias("index_span"),
        )
        .select(
            "curve",
            "n_cells",
            "n_runs",
            "index_span",
            F.expr("(n_runs * 1000) div n_cells")
            .cast("long")
            .alias("runs_per_cell_permille"),
        )
        .orderBy("curve")
    )
