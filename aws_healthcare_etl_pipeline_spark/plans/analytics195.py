"""Wave-214 (round 10): seven oracle-backed queries.

New surface: Brown-Forsythe variance homogeneity, additive
Holt-Winters (bounded-panel fold vs recursive-CTE oracle), a rational
f-divergence drift audit (triangular discrimination — PSI-shaped but
with no transcendental in the hash path), interval-partitioning
depth (sweep line), T5-style span corruption accounting, and a recursive-CTE BOM cost rollup (Spark
4.1 WITH RECURSIVE exercised through SQL on both engines).

House rules observed: exact decimal/integer aggregation everywhere;
doubles only in identical-operand-identical-order expressions,
floor-quantized to integers before any cross-engine hash (the
chi2/ERR pattern — no decimal casts of doubles, no ln/exp); windows
are partitioned by bounded keys (doc, region, nation, query id) or
run on bounded spines only.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import dec, query

# --------------------------- Brown-Forsythe variance homogeneity


@query(
    "stats_brown_forsythe_variance",
    oracle="""
        WITH x AS (
            SELECT o_orderpriority AS pri,
                   CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 200
                        AS BIGINT) AS c2
            FROM orders
        ), med AS (
            SELECT pri, quantile_cont(c2, 0.5) AS med2
            FROM x GROUP BY pri
        ), d AS (
            SELECT x.pri, CAST(ABS(x.c2 - med.med2) AS BIGINT) AS dv
            FROM x JOIN med USING (pri)
        ), grp AS (
            SELECT pri,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(dv) AS BIGINT) AS s,
                   SUM(dv * dv) AS ss
            FROM d GROUP BY pri
        ), q AS (
            SELECT n, s,
                   CAST(FLOOR((CAST(ss AS DOUBLE)
                               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                 / CAST(n AS DOUBLE)) / 1e6)
                        AS BIGINT) AS gw_q,
                   CAST(FLOOR((CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                               / CAST(n AS DOUBLE)) / 1e6)
                        AS BIGINT) AS gb_q
            FROM grp
        ), tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_total,
                   CAST(SUM(s) AS BIGINT) AS s_tot,
                   CAST(SUM(gw_q) AS BIGINT) AS ssw_q,
                   CAST(SUM(gb_q) AS BIGINT) AS ssb1_q
            FROM q
        )
        SELECT n_total,
               CAST(4 AS BIGINT) AS df1,
               n_total - 5 AS df2,
               CAST(FLOOR(
                   (CAST(n_total - 5 AS DOUBLE)
                    * (CAST(ssb1_q AS DOUBLE) * 1e6
                       - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE)
                         / CAST(n_total AS DOUBLE)))
                   / (4.0 * (CAST(ssw_q AS DOUBLE) * 1e6)) * 1e6)
               AS BIGINT) AS w_micro
        FROM tot
    """,
    description="Brown-Forsythe test for homogeneity of variance of "
    "order totals across the 5 order priorities (Levene's test with "
    "the median center — robust to non-normality). All mass is "
    "exact integer: deviations are |2x - 2*median| (the doubled-cents "
    "trick makes the interpolated median integer-valued, so the "
    "deviation casts to BIGINT exactly); per-group sum/sum-of-squares "
    "are exact decimal; the two quadratic-form terms per group are "
    "identical-operand doubles floor-quantized at 1e6 before the "
    "5-element cross-group sum (bounded spine), and W is one shared "
    "double expression over those exact integers. Scale: one shuffle "
    "to the 5-group median, one to the 5-group moments; no windows.",
)
def stats_brown_forsythe_variance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    x = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        (dec("o_totalprice") * 200).cast("long").alias("c2"),
    )
    med = x.groupBy("pri").agg(F.expr("percentile(c2, 0.5D)").alias("med2"))
    d = x.join(F.broadcast(med), "pri").select(
        "pri", F.abs(F.col("c2") - F.col("med2")).cast("long").alias("dv")
    )
    dv_dec = F.col("dv").cast("decimal(18,0)")
    grp = d.groupBy("pri").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dv").cast("long").alias("s"),
        F.sum(dv_dec * dv_dec).alias("ss"),
    )
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    ss_d = F.col("ss").cast("double")
    q = grp.select(
        "n",
        "s",
        F.floor((ss_d - s_d * s_d / n_d) / F.lit(1e6))
        .cast("long")
        .alias("gw_q"),
        F.floor((s_d * s_d / n_d) / F.lit(1e6)).cast("long").alias("gb_q"),
    )
    tot = q.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.sum("s").cast("long").alias("s_tot"),
        F.sum("gw_q").cast("long").alias("ssw_q"),
        F.sum("gb_q").cast("long").alias("ssb1_q"),
    )
    nt_d = F.col("n_total").cast("double")
    st_d = F.col("s_tot").cast("double")
    ssb_d = F.col("ssb1_q").cast("double") * F.lit(1e6) - st_d * st_d / nt_d
    ssw_d = F.col("ssw_q").cast("double") * F.lit(1e6)
    w = ((F.col("n_total") - 5).cast("double") * ssb_d) / (
        F.lit(4.0) * ssw_d
    )
    return tot.select(
        "n_total",
        F.lit(4).cast("long").alias("df1"),
        (F.col("n_total") - 5).alias("df2"),
        F.floor(w * F.lit(1e6)).cast("long").alias("w_micro"),
    )


# ------------------------------------- additive Holt-Winters (m=12)


@query(
    "forecast_holt_winters_additive",
    oracle="""
        WITH RECURSIVE rev AS (
            SELECT r.r_name,
                   (EXTRACT(year FROM o.o_orderdate) - 1992) * 12
                       + EXTRACT(month FROM o.o_orderdate) - 1 AS m_idx,
                   CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(15,2))
                                 * 100) AS BIGINT) AS DOUBLE) AS y
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY 1, 2
        ), mx AS (
            SELECT CAST(MAX(m_idx) AS INT) AS mxi FROM rev
        ), spine AS (
            SELECT r_name, i AS m_idx
            FROM (SELECT DISTINCT r_name FROM rev) r
            CROSS JOIN (SELECT unnest(range(0, (SELECT mxi FROM mx) + 1))
                        AS i)
        ), filled AS (
            SELECT s.r_name, s.m_idx, COALESCE(rev.y, 0.0) AS y
            FROM spine s LEFT JOIN rev USING (r_name, m_idx)
        ), init AS (
            SELECT r_name,
                   list(y ORDER BY m_idx) AS ys,
                   SUM(y) FILTER (m_idx < 12) / 12.0 AS lvl0,
                   (SUM(y) FILTER (m_idx >= 12 AND m_idx < 24) / 12.0
                    - SUM(y) FILTER (m_idx < 12) / 12.0) / 12.0 AS tr0
            FROM filled GROUP BY r_name
        ), it AS (
            SELECT r_name, ys, 12 AS t, lvl0 AS lvl, tr0 AS tr,
                   list_transform(ys[1:12], v -> v - lvl0) AS s
            FROM init
            UNION ALL
            SELECT r_name, ys, t + 1,
                   0.3 * (ys[t+1] - s[1]) + 0.7 * (lvl + tr),
                   0.1 * ((0.3 * (ys[t+1] - s[1]) + 0.7 * (lvl + tr))
                          - lvl) + 0.9 * tr,
                   list_append(s[2:12],
                       0.2 * (ys[t+1]
                              - (0.3 * (ys[t+1] - s[1])
                                 + 0.7 * (lvl + tr)))
                       + 0.8 * s[1])
            FROM it WHERE t < len(ys)
        )
        SELECT r_name,
               CAST(len(ys) AS BIGINT) AS months,
               CAST(FLOOR(lvl) AS BIGINT) AS level_cents,
               CAST(FLOOR(tr) AS BIGINT) AS trend_cents,
               CAST(FLOOR(lvl + tr + s[1]) AS BIGINT) AS forecast_cents
        FROM it WHERE t = len(ys)
        ORDER BY r_name
    """,
    description="Additive Holt-Winters (alpha=0.3, beta=0.1, "
    "gamma=0.2, season m=12) over the monthly revenue series of each "
    "of the 5 regions: classic level/trend/seasonal triple smoothing, "
    "initialized from the first two seasons and replayed over the "
    "~80-month series. Spark runs the recursion as an F.aggregate "
    "fold over the per-region month array (bounded panel — the DTW "
    "pattern, plans/.. timeseries_dtw_monthly); the oracle is a "
    "DuckDB recursive CTE carrying (level, trend, 12-seasonal list) "
    "with byte-identical arithmetic (same literals, same inlined "
    "subexpressions, rolling seasonal list consumed at the head and "
    "appended at the tail on both engines). Monthly revenues are "
    "exact cents cast to double; outputs floor to whole cents. "
    "Scale: one distributed group-by to the (region x month) panel; "
    "the fold touches 5 rows.",
)
def forecast_holt_winters_additive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        orders.join(
            customer, orders.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            "r_name",
            (
                (F.year("o_orderdate") - 1992) * 12
                + F.month("o_orderdate")
                - 1
            ).alias("m_idx"),
        )
        .agg(
            F.sum(dec("o_totalprice") * 100)
            .cast("long")
            .cast("double")
            .alias("y")
        )
    )
    mx = rev.agg(F.max("m_idx").cast("int").alias("mxi"))
    spine = (
        rev.select("r_name")
        .distinct()
        .crossJoin(F.broadcast(mx))
        .select("r_name", F.explode(F.sequence(F.lit(0), F.col("mxi"))).alias("m_idx"))
    )
    filled = spine.join(rev, ["r_name", "m_idx"], "left").select(
        "r_name", "m_idx", F.coalesce("y", F.lit(0.0)).alias("y")
    )
    init = filled.groupBy("r_name").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("m_idx", "y"))),
            lambda s: s.getField("y"),
        ).alias("ys"),
        (F.sum(F.when(F.col("m_idx") < 12, F.col("y"))) / F.lit(12.0)).alias(
            "lvl0"
        ),
        (
            (
                F.sum(
                    F.when(
                        (F.col("m_idx") >= 12) & (F.col("m_idx") < 24),
                        F.col("y"),
                    )
                )
                / F.lit(12.0)
                - F.sum(F.when(F.col("m_idx") < 12, F.col("y")))
                / F.lit(12.0)
            )
            / F.lit(12.0)
        ).alias("tr0"),
    )

    def step(acc, t):
        y = F.element_at(F.col("ys"), t.cast("int"))
        s1 = F.element_at(acc.getField("s"), 1)
        lvl_new = F.lit(0.3) * (y - s1) + F.lit(0.7) * (
            acc.getField("lvl") + acc.getField("tr")
        )
        tr_new = F.lit(0.1) * (
            (
                F.lit(0.3) * (y - s1)
                + F.lit(0.7) * (acc.getField("lvl") + acc.getField("tr"))
            )
            - acc.getField("lvl")
        ) + F.lit(0.9) * acc.getField("tr")
        s_new = F.concat(
            F.slice(acc.getField("s"), 2, 11),
            F.array(
                F.lit(0.2)
                * (
                    y
                    - (
                        F.lit(0.3) * (y - s1)
                        + F.lit(0.7)
                        * (acc.getField("lvl") + acc.getField("tr"))
                    )
                )
                + F.lit(0.8) * s1
            ),
        )
        return F.struct(
            lvl_new.alias("lvl"), tr_new.alias("tr"), s_new.alias("s")
        )

    state0 = F.struct(
        F.col("lvl0").alias("lvl"),
        F.col("tr0").alias("tr"),
        F.transform(
            F.slice("ys", 1, 12), lambda v: v - F.col("lvl0")
        ).alias("s"),
    )
    # Guard the fold: F.sequence(13, size) defaults to step -1 when
    # size < 13 (a DESCENDING sequence), which would iterate the fold
    # backwards/out-of-range instead of skipping it. On a <13-month
    # series the oracle's recursive CTE never recurses past the init
    # row, so the Spark side must return state0 unchanged too.
    final = init.select(
        "r_name",
        F.size("ys").cast("long").alias("months"),
        F.when(
            F.size("ys") >= 13,
            F.aggregate(F.sequence(F.lit(13), F.size("ys")), state0, step),
        )
        .otherwise(state0)
        .alias("st"),
    )
    return final.select(
        "r_name",
        "months",
        F.floor(F.col("st.lvl")).cast("long").alias("level_cents"),
        F.floor(F.col("st.tr")).cast("long").alias("trend_cents"),
        F.floor(
            F.col("st.lvl")
            + F.col("st.tr")
            + F.element_at(F.col("st.s"), 1)
        )
        .cast("long")
        .alias("forecast_cents"),
    ).orderBy("r_name")


# ---------------------- drift audit: triangular discrimination


@query(
    "quality_drift_triangular_divergence",
    oracle="""
        WITH base AS (
            SELECT c.c_mktsegment AS segment,
                   LEAST(CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                              AS BIGINT) // 7000000, 7) AS bin,
                   EXTRACT(year FROM o.o_orderdate) AS yr
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE EXTRACT(year FROM o.o_orderdate) IN (1995, 1996)
        ), cell AS (
            SELECT segment, bin,
                   CAST(COUNT(*) FILTER (yr = 1995) AS BIGINT) AS a,
                   CAST(COUNT(*) FILTER (yr = 1996) AS BIGINT) AS b
            FROM base GROUP BY segment, bin
        ), seg AS (
            SELECT segment,
                   CAST(SUM(a) AS BIGINT) AS ta,
                   CAST(SUM(b) AS BIGINT) AS tb
            FROM cell GROUP BY segment
        )
        SELECT segment, ta AS n_1995, tb AS n_1996,
               CAST(SUM(CAST(FLOOR(
                   1e12
                   * ((CAST(a AS DOUBLE) * CAST(tb AS DOUBLE)
                       - CAST(b AS DOUBLE) * CAST(ta AS DOUBLE))
                      * (CAST(a AS DOUBLE) * CAST(tb AS DOUBLE)
                         - CAST(b AS DOUBLE) * CAST(ta AS DOUBLE)))
                   / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)
                      * (CAST(a AS DOUBLE) * CAST(tb AS DOUBLE)
                         + CAST(b AS DOUBLE) * CAST(ta AS DOUBLE))))
               AS BIGINT)) AS BIGINT) AS tri_pico
        FROM cell JOIN seg USING (segment)
        WHERE ta > 0 AND tb > 0
        GROUP BY segment, ta, tb
        ORDER BY segment
    """,
    description="Distribution-drift audit per market segment: "
    "triangular discrimination Delta(P,Q) = sum (p-q)^2/(p+q) between "
    "the 1995 and 1996 order-price histograms (8 fixed $70k bins). "
    "PSI-shaped gate but with a RATIONAL f-divergence: every bin term "
    "is (a*B - b*A)^2 / (A*B*(a*B + b*A)) over exact counts — no "
    "ln(), so no cross-engine libm risk (the repo's chi2 rule); terms "
    "floor at 1e12 and sum as integers. Bounded [0,2] like TV^2; "
    "complements audit_tv_distance_drift (L1) with a quadratic-"
    "sensitivity gate. Scale: one group-by to (segment, bin), 40-row "
    "panel after.",
)
def quality_drift_triangular_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    base = (
        orders.where(F.year("o_orderdate").isin(1995, 1996))
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.least(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100"
                    " AS BIGINT) DIV 7000000"
                ),
                F.lit(7).cast("long"),
            ).alias("bin"),
            F.year("o_orderdate").alias("yr"),
        )
    )
    cell = base.groupBy("segment", "bin").agg(
        F.sum(F.when(F.col("yr") == 1995, 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("yr") == 1996, 1).otherwise(0))
        .cast("long")
        .alias("b"),
    )
    # ta/tb = 0 (a segment with no orders in one of the two years) would
    # make every bin term x/0.0 -> Inf/NaN, where FLOOR/cast-to-long can
    # diverge between engines; drop such segments (mirrored in the
    # oracle's WHERE ta > 0 AND tb > 0). Unreachable on TPC-H data.
    seg = cell.groupBy("segment").agg(
        F.sum("a").cast("long").alias("ta"),
        F.sum("b").cast("long").alias("tb"),
    ).where((F.col("ta") > 0) & (F.col("tb") > 0))
    a_d, b_d = F.col("a").cast("double"), F.col("b").cast("double")
    ta_d, tb_d = F.col("ta").cast("double"), F.col("tb").cast("double")
    diff = a_d * tb_d - b_d * ta_d
    term = (
        F.lit(1e12)
        * (diff * diff)
        / (ta_d * tb_d * (a_d * tb_d + b_d * ta_d))
    )
    return (
        cell.join(F.broadcast(seg), "segment")
        .groupBy("segment", "ta", "tb")
        .agg(F.sum(F.floor(term).cast("long")).cast("long").alias("tri_pico"))
        .select(
            "segment",
            F.col("ta").alias("n_1995"),
            F.col("tb").alias("n_1996"),
            "tri_pico",
        )
        .orderBy("segment")
    )


# ----------------------------- interval partitioning (sweep line)


@query(
    "sched_interval_partitioning_depth",
    oracle="""
        WITH iv AS (
            SELECT n.n_name,
                   date_diff('day', DATE '1992-01-01',
                             CAST(o.o_orderdate AS DATE)) AS s,
                   date_diff('day', DATE '1992-01-01',
                             CAST(o.o_orderdate AS DATE))
                       + 1 + o.o_orderkey % 14 AS e
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
        ), ev AS (
            SELECT n_name, s AS t, 1 AS delta FROM iv
            UNION ALL
            SELECT n_name, e AS t, -1 AS delta FROM iv
        ), run AS (
            SELECT n_name, t, delta,
                   SUM(delta) OVER (PARTITION BY n_name
                                    ORDER BY t, delta
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS depth
            FROM ev
        ), peak AS (
            SELECT n_name, t, depth,
                   MAX(depth) OVER (PARTITION BY n_name) AS md
            FROM run
        )
        SELECT n_name,
               CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals,
               CAST(MAX(md) AS BIGINT) AS max_depth,
               CAST(MIN(t) FILTER (depth = md) AS BIGINT)
                   AS first_peak_day
        FROM peak
        GROUP BY n_name
        ORDER BY n_name
    """,
    description="Interval partitioning / minimum-machines: per "
    "nation, orders become half-open day intervals [start, start+1+"
    "orderkey%14) and the sweep line (+1 at starts, -1 at ends, ends "
    "before starts at equal t for [s,e) semantics) yields the peak "
    "concurrency — the minimum number of parallel 'machines' any "
    "greedy assignment needs — plus the first day the peak is hit. "
    "Running depth within a tie-run of identical (t,delta) rows is "
    "order-dependent but monotonic, so max depth and its first day "
    "are deterministic (the invariant the test pins). Scale: the "
    "window is keyed by nation; event relation is 2x orders, one "
    "shuffle.",
)
def sched_interval_partitioning_depth(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    iv = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1992-01-01").cast("date"),
            ).alias("s"),
            (
                F.datediff(
                    F.col("o_orderdate").cast("date"),
                    F.lit("1992-01-01").cast("date"),
                )
                + 1
                + F.col("o_orderkey") % 14
            ).alias("e"),
        )
    )
    ev = iv.select(
        "n_name", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select("n_name", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = ev.withColumn("depth", F.sum("delta").over(w))
    peak = run.withColumn(
        "md", F.max("depth").over(Window.partitionBy("n_name"))
    )
    return (
        peak.groupBy("n_name")
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
            F.max("md").cast("long").alias("max_depth"),
            F.min(F.when(F.col("depth") == F.col("md"), F.col("t")))
            .cast("long")
            .alias("first_peak_day"),
        )
        .orderBy("n_name")
    )


# ---------------------------- T5-style span corruption accounting


@query(
    "pipeline_span_corruption_accounting",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(string_split(text, ' ')) AS tok,
                   unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
            FROM documents
        ), idxed AS (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY doc_id ORDER BY i)
                       AS idx
            FROM toks WHERE tok <> ''
        ), marked AS (
            SELECT doc_id, lang, idx,
                   CASE WHEN (idx * 2654435761) % 2147483647 % 17 = 0
                        THEN 1 ELSE 0 END AS is_start
            FROM idxed
        ), covered AS (
            SELECT doc_id, lang, is_start,
                   MAX(is_start) OVER (PARTITION BY doc_id ORDER BY idx
                                       ROWS BETWEEN 2 PRECEDING
                                       AND CURRENT ROW) AS cov
            FROM marked
        ), per_doc AS (
            SELECT doc_id, lang,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(is_start) AS BIGINT) AS n_spans,
                   CAST(SUM(cov) AS BIGINT) AS n_masked
            FROM covered GROUP BY doc_id, lang
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_spans) AS BIGINT) AS total_spans,
               CAST(SUM(n_masked) AS BIGINT) AS masked_tokens,
               CAST(SUM(n_masked) * 10000 // SUM(n_tokens) AS BIGINT)
                   AS mask_ratio_bp
        FROM per_doc
        GROUP BY lang
        ORDER BY lang
    """,
    description="T5-style span-corruption accounting: deterministic "
    "span starts (Knuth multiplicative hash of the token index mod "
    "17 — ~5.9% start rate), fixed span length 3, overlapping spans "
    "merged by a 2-PRECEDING window max, and the per-language mask "
    "budget (masked fraction in basis points) that a denoising "
    "pretraining mixture needs before sizing sentinel vocabulary. "
    "All integer arithmetic; the window is keyed by doc (bounded "
    "partitions). Scale: one explode + two doc-keyed windows + two "
    "group-bys; no data-dependent driver work.",
)
def pipeline_span_corruption_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    ).where(F.col("tok") != "")
    idxed = toks.select(
        "doc_id",
        "lang",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy("pos"))
        .alias("idx"),
    )
    marked = idxed.withColumn(
        "is_start",
        F.when(
            (F.col("idx") * F.lit(2654435761)) % 2147483647 % 17 == 0, 1
        ).otherwise(0),
    )
    cov_w = (
        Window.partitionBy("doc_id").orderBy("idx").rowsBetween(-2, 0)
    )
    covered = marked.withColumn("cov", F.max("is_start").over(cov_w))
    per_doc = covered.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("is_start").cast("long").alias("n_spans"),
        F.sum("cov").cast("long").alias("n_masked"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_spans").cast("long").alias("total_spans"),
            F.sum("n_masked").cast("long").alias("masked_tokens"),
            F.expr("CAST(SUM(n_masked) * 10000 DIV SUM(n_tokens) AS BIGINT)")
            .alias("mask_ratio_bp"),
        )
        .orderBy("lang")
    )


# ------------------------------------ recursive-CTE BOM cost rollup

_BOM_ROOTS = 8
_BOM_DEPTH = 10


@query(
    "sql_recursive_bom_cost_rollup",
    oracle=f"""
        WITH RECURSIVE bom(root, node, depth, path_qty) AS (
            SELECT p_partkey, p_partkey, 0, CAST(1 AS BIGINT)
            FROM part WHERE p_partkey BETWEEN 1 AND {_BOM_ROOTS}
            UNION ALL
            SELECT b.root, c.p_partkey, b.depth + 1,
                   b.path_qty * (1 + c.p_partkey % 2)
            FROM bom b JOIN part c ON c.p_partkey // 2 = b.node
            WHERE b.depth < {_BOM_DEPTH}
        )
        SELECT CAST(root AS BIGINT) AS root,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(MAX(depth) AS BIGINT) AS max_depth,
               CAST(SUM(path_qty
                        * CAST(CAST(p.p_retailprice AS DECIMAL(15,2))
                               * 100 AS BIGINT)) AS BIGINT)
                   AS total_cost_cents
        FROM bom JOIN part p ON p.p_partkey = bom.node
        GROUP BY root ORDER BY root
    """,
    description="Bill-of-materials cost rollup through Spark 4.1 "
    "WITH RECURSIVE (UnionLoop), the SQL-surface recursion the month "
    "spine (sql_recursive_month_spine) doesn't exercise: a join in "
    "the recursive arm plus multiplicative path state. The BOM is a "
    "binary containment heap derived from partkeys (children 2p and "
    f"2p+1, qty 1 + child%2, roots 1..{_BOM_ROOTS}, depth cap "
    f"{_BOM_DEPTH}); rolled-up cost multiplies path quantity into "
    "exact retail-price cents. The depth cap bounds the frontier at "
    f"{_BOM_ROOTS}*2^{_BOM_DEPTH} nodes regardless of scale factor, "
    "and the recursive join is an equi-join on the derived child//2 "
    "key (shuffle-partitionable, no broadcast of a growing "
    "frontier). Identical SQL runs on DuckDB (// for DIV).",
)
def sql_recursive_bom_cost_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    view = f"part_bom_{uuid.uuid4().hex[:8]}"
    part.select("p_partkey", "p_retailprice").createOrReplaceTempView(view)
    df = spark.sql(
        f"""
        WITH RECURSIVE bom(root, node, depth, path_qty) AS (
            SELECT p_partkey, p_partkey, 0, CAST(1 AS BIGINT)
            FROM {view} WHERE p_partkey BETWEEN 1 AND {_BOM_ROOTS}
            UNION ALL
            SELECT b.root, c.p_partkey, b.depth + 1,
                   b.path_qty * (1 + c.p_partkey % 2)
            FROM bom b JOIN {view} c ON c.p_partkey DIV 2 = b.node
            WHERE b.depth < {_BOM_DEPTH}
        )
        SELECT CAST(root AS BIGINT) AS root,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(MAX(depth) AS BIGINT) AS max_depth,
               CAST(SUM(path_qty
                        * CAST(CAST(p.p_retailprice AS DECIMAL(15,2))
                               * 100 AS BIGINT)) AS BIGINT)
                   AS total_cost_cents
        FROM bom JOIN {view} p ON p.p_partkey = bom.node
        GROUP BY root ORDER BY root
        """
    )
    # The returned plan is already resolved; drop the uniquely-named
    # temp view so repeated bench/driver-sim invocations don't
    # accumulate catalog entries in the long-lived shared session.
    spark.catalog.dropTempView(view)
    return df
