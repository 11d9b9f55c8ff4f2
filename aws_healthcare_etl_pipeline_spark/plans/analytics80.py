"""Wave-106 (round 5): circular statistics + network assortativity.

* ``events_circular_hour_stats`` — hour-of-day statistics done
  CIRCULARLY (a 23h-and-1h pair must average to midnight, not
  noon): each event contributes a unit vector on a fixed 24-point
  cosine lattice quantized to 1/1024 — the trig lives in 48
  integer CONSTANTS shared verbatim by both engines, so no libm
  call ever executes — and per type the resultant vector, its
  squared length (the concentration statistic: R^2/n^2 -> 1 means
  a sharp daily peak), and the peak hour by integer-dot-product
  argmax come out exact.
* ``graph_degree_assortativity`` — degree assortativity of the
  co-supply graph: the Pearson correlation of endpoint degrees
  over (symmetrized) edges, with all five moment sums exact
  integers and the final r the usual bit-portable two-sqrt
  division — positive r: hubs buddy with hubs (resilient core),
  negative: hub-and-spoke (fragile). The one-number topology
  summary that decides which partitioning strategy a 100 TB graph
  job needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------- circular hour stats

_COS_1024 = (1024, 989, 887, 724, 512, 265, 0, -265, -512, -724, -887,
             -989, -1024, -989, -887, -724, -512, -265, 0, 265, 512,
             724, 887, 989)
_SIN_1024 = (0, 265, 512, 724, 887, 989, 1024, 989, 887, 724, 512, 265,
             0, -265, -512, -724, -887, -989, -1024, -989, -887, -724,
             -512, -265)


def _case_lut(expr: str, lut: tuple[int, ...]) -> str:
    whens = " ".join(f"WHEN {h} THEN {v}" for h, v in enumerate(lut))
    return f"(CASE {expr} {whens} END)"


def _circ_oracle() -> str:
    cos_e = _case_lut("hr", _COS_1024)
    sin_e = _case_lut("hr", _SIN_1024)
    peak_terms = " ".join(
        f"WHEN rx * {_COS_1024[h]} + ry * {_SIN_1024[h]} = best THEN {h}"
        for h in range(24)
    )
    dots = ", ".join(
        f"rx * {_COS_1024[h]} + ry * {_SIN_1024[h]}" for h in range(24)
    )
    return f"""
        WITH hrs AS (
            SELECT event_type, EXTRACT(hour FROM ts) AS hr FROM events
        ), vecs AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM({cos_e}) AS BIGINT) AS rx,
                   CAST(SUM({sin_e}) AS BIGINT) AS ry
            FROM hrs GROUP BY event_type
        ), dotted AS (
            SELECT event_type, n, rx, ry,
                   GREATEST({dots}) AS best
            FROM vecs
        )
        SELECT event_type, n, rx, ry,
               CAST(((rx * rx + ry * ry) * 1000)
                    // (n * n * {1024 * 1024}) AS BIGINT)
                   AS concentration_permille,
               CAST(CASE {peak_terms} END AS BIGINT) AS peak_hour
        FROM dotted
        ORDER BY event_type
    """


@query(
    "events_circular_hour_stats",
    oracle=_circ_oracle(),
    description="Circular hour-of-day statistics per event type: "
    "each event maps to a unit vector on a 24-point cosine lattice "
    "quantized to 1/1024 — the trig is 48 integer constants "
    "embedded identically in both engines, so NO libm call runs — "
    "and the report gives the exact integer resultant (rx, ry), "
    "the concentration R^2/(n^2) in permille (1000 = every event "
    "at one hour; 23h+1h correctly cancels instead of averaging "
    "to noon like a linear mean would), and the peak hour as the "
    "integer-dot-product argmax over the 24 directions (earliest "
    "hour on ties). Scale: one narrow projection with a CASE "
    "lookup, one map-side-combined aggregate per type; everything "
    "after runs on 5 rows.",
)
def events_circular_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hr = F.hour("ts")
    cos_expr = None
    sin_expr = None
    for h in range(24):
        cos_expr = (
            F.when(hr == h, F.lit(_COS_1024[h]))
            if cos_expr is None
            else cos_expr.when(hr == h, F.lit(_COS_1024[h]))
        )
        sin_expr = (
            F.when(hr == h, F.lit(_SIN_1024[h]))
            if sin_expr is None
            else sin_expr.when(hr == h, F.lit(_SIN_1024[h]))
        )
    vecs = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cos_expr).cast("long").alias("rx"),
        F.sum(sin_expr).cast("long").alias("ry"),
    )
    dots = [
        (F.col("rx") * _COS_1024[h] + F.col("ry") * _SIN_1024[h]).alias(
            f"d{h}"
        )
        for h in range(24)
    ]
    dotted = vecs.select("event_type", "n", "rx", "ry", *dots).withColumn(
        "best", F.greatest(*[F.col(f"d{h}") for h in range(24)])
    )
    peak = None
    for h in range(24):
        cond = F.col(f"d{h}") == F.col("best")
        peak = (
            F.when(cond, F.lit(h))
            if peak is None
            else peak.when(cond, F.lit(h))
        )
    return dotted.select(
        "event_type",
        "n",
        "rx",
        "ry",
        F.expr(
            f"((rx * rx + ry * ry) * 1000) div (n * n * {1024 * 1024})"
        )
        .cast("long")
        .alias("concentration_permille"),
        peak.cast("long").alias("peak_hour"),
    ).orderBy("event_type")


# ------------------------------------------- degree assortativity

_AS_PART_MOD = 8  # sparse graph: one edge per sampled part (the
# Katz-query construction) — the dense co-supply graph is complete at
# small SF, which makes every degree equal and assortativity undefined


@query(
    "graph_degree_assortativity",
    oracle=f"""
        WITH ps AS (
            SELECT DISTINCT l_partkey AS p, l_suppkey AS sp
            FROM lineitem WHERE l_partkey % {_AS_PART_MOD} = 0
        ), ab AS (
            SELECT p, MIN(sp) AS a FROM ps GROUP BY p
        ), b2 AS (
            SELECT ps.p, MIN(ps.sp) AS b
            FROM ps JOIN ab ON ab.p = ps.p AND ps.sp > ab.a
            GROUP BY ps.p
        ), co AS (
            SELECT DISTINCT a AS u, b AS v FROM ab JOIN b2 USING (p)
        ), deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT u AS node FROM co
                UNION ALL SELECT v AS node FROM co
            ) GROUP BY node
        ), ends AS (
            SELECT du.d AS dx, dv.d AS dy FROM co
            JOIN deg du ON du.node = co.u
            JOIN deg dv ON dv.node = co.v
            UNION ALL
            SELECT dv.d AS dx, du.d AS dy FROM co
            JOIN deg du ON du.node = co.u
            JOIN deg dv ON dv.node = co.v
        ), moments AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(dx) AS BIGINT) AS sx,
                   CAST(SUM(dy) AS BIGINT) AS sy,
                   CAST(SUM(dx * dx) AS BIGINT) AS sxx,
                   CAST(SUM(dy * dy) AS BIGINT) AS syy,
                   CAST(SUM(dx * dy) AS BIGINT) AS sxy
            FROM ends
        )
        SELECT m, sx, sxy,
               CAST(m * sxy - sx * sy AS BIGINT) AS cov_num,
               CAST(m * sxy - sx * sy AS DOUBLE)
                   / NULLIF(sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(m * syy - sy * sy AS DOUBLE)),
                            0.0) AS assortativity_r
        FROM moments
    """,
    description="Degree assortativity of the sparse co-supply "
    "graph (one min-supplier-pair edge per sampled part): Pearson correlation of endpoint degrees over "
    "symmetrized edges — all five moment sums exact integers (the "
    "covariance numerator reported raw), the final r one division "
    "by two IEEE-exact sqrts with identical expression trees, NULL "
    "if degenerate. Positive r means hubs connect to hubs (a "
    "resilient, skew-concentrated core — salt those keys); "
    "negative means hub-and-spoke. The one-number topology summary "
    "that picks a 100 TB graph-partitioning strategy. Scale: edge "
    "list built once, node-grain degree aggregate, two broadcast-"
    "able degree joins, one scalar moment row.",
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % _AS_PART_MOD == 0)
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("sp"))
        .distinct()
    )
    ab = ps.groupBy("p").agg(F.min("sp").alias("a"))
    b2 = (
        ps.join(ab, "p")
        .filter(F.col("sp") > F.col("a"))
        .groupBy("p")
        .agg(F.min("sp").alias("b"))
    )
    co = (
        ab.join(b2, "p")
        .select(F.col("a").alias("u"), F.col("b").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds degrees and the end join
    )
    deg = (
        co.select(F.col("u").alias("node"))
        .unionAll(co.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    du = deg.select(F.col("node").alias("un"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("vn"), F.col("d").alias("dv"))
    joined = co.join(F.broadcast(du), F.col("u") == F.col("un")).join(
        F.broadcast(dv), F.col("v") == F.col("vn")
    )
    ends = joined.select(
        F.col("du").alias("dx"), F.col("dv").alias("dy")
    ).unionAll(joined.select(F.col("dv").alias("dx"), F.col("du").alias("dy")))
    moments = ends.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("long")
    den = F.nullif(
        F.sqrt(
            (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        )
        * F.sqrt(
            (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                "double"
            )
        ),
        F.lit(0.0),
    )
    return moments.select(
        "m",
        "sx",
        "sxy",
        num.alias("cov_num"),
        (num.cast("double") / den).alias("assortativity_r"),
    )
