"""Wave-213 (round 9, part 2): percentile semantics, water-filling
allocation, LIFO-vs-FIFO valuation, array-zip padding semantics, and
a wash-sale repurchase detector.

Same discipline as part 1 ([EXT]; the reference's only query is
README.md:98-101): fact-scale work is keyed shuffles and
high-cardinality-partitioned windows; panels are bounded; every
floating-point result is either dyadic-exact or DECIMAL-accumulated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import dec, query

# -------------------------- percentile_cont / percentile_disc battery

# Dyadic quantiles only: (n-1)*p and n*p are exact in binary floating
# point, so the interpolation arithmetic cannot diverge across engines.
_PCTL_PS = (0.25, 0.5, 0.75, 0.875)


@query(
    "sql_percentile_cont_disc_battery",
    oracle=f"""
        WITH vals AS (
            SELECT l_returnflag AS flag, l_quantity AS v,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_quantity) AS rn
            FROM lineitem
        ), meta AS (
            SELECT flag, CAST(COUNT(*) AS BIGINT) AS n
            FROM vals GROUP BY 1
        ), ps AS (
            SELECT * FROM (VALUES {", ".join(f"({p})" for p in _PCTL_PS)})
                   t(p)
        )
        SELECT v.flag AS flag,
               CAST(p AS DOUBLE) AS p,
               MAX(CASE WHEN rn = CAST(floor((n - 1) * p) AS BIGINT) + 1
                        THEN v END)
               + (MAX(CASE WHEN rn = least(
                            CAST(floor((n - 1) * p) AS BIGINT) + 2, n)
                           THEN v END)
                  - MAX(CASE WHEN rn =
                            CAST(floor((n - 1) * p) AS BIGINT) + 1
                            THEN v END))
                 * ((n - 1) * p - floor((n - 1) * p)) AS cont_v,
               CAST(MIN(CASE WHEN rn >= CAST(ceil(n * p) AS BIGINT)
                             THEN v END) AS BIGINT) AS disc_v
        FROM vals v JOIN meta m ON m.flag = v.flag
        CROSS JOIN ps
        GROUP BY v.flag, p, m.n
        ORDER BY flag, p
    """,
    description="PERCENTILE_CONT vs PERCENTILE_DISC semantics battery "
    "over l_quantity per return flag at the dyadic quantiles "
    f"{_PCTL_PS}: Spark evaluates its native inverse-distribution "
    "aggregates (percentile_cont interpolates at index (n-1)p; "
    "percentile_disc returns the first value whose cume_dist >= p), "
    "while the oracle re-derives BOTH from raw order statistics — "
    "row-number arithmetic, no quantile builtin — so the battery pins "
    "Spark's aggregate semantics to the ANSI definition rather than "
    "to another engine's implementation. Dyadic p makes every "
    "intermediate float exact. Scale: one partitioned sort per flag.",
)
def sql_percentile_cont_disc_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for i, p in enumerate(_PCTL_PS):
        aggs.append(
            F.expr(
                f"percentile_cont({p}) within group (order by l_quantity)"
            ).alias(f"cont_{i}")
        )
        aggs.append(
            F.expr(
                f"percentile_disc({p}) within group (order by l_quantity)"
            ).cast("long").alias(f"disc_{i}")
        )
    wide = li.groupBy(F.col("l_returnflag").alias("flag")).agg(*aggs)
    stack = ", ".join(
        f"cast({p} as double), cont_{i}, disc_{i}"
        for i, p in enumerate(_PCTL_PS)
    )
    return (
        wide.selectExpr(
            "flag",
            f"stack({len(_PCTL_PS)}, {stack}) AS (p, cont_v, disc_v)",
        )
        .orderBy("flag", "p")
    )


# ------------------------------------------ water-filling allocation


@query(
    "alloc_water_filling_levels",
    oracle="""
        WITH d AS MATERIALIZED (
            SELECT n.n_name, n.n_nationkey,
                   CAST(SUM(l.l_quantity) AS BIGINT) AS demand
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            GROUP BY 1, 2
        ), cap AS (
            SELECT CAST(SUM(demand) * 6 // 10 AS BIGINT) AS c,
                   CAST(COUNT(*) AS BIGINT) AS n FROM d
        ), ranked AS (
            SELECT n_nationkey, demand,
                   ROW_NUMBER() OVER (ORDER BY demand, n_nationkey) AS r,
                   SUM(demand) OVER (ORDER BY demand, n_nationkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prefix_prev
            FROM d
        ), cands AS (
            SELECT demand AS cand FROM d
            UNION
            SELECT (c - COALESCE(prefix_prev, 0)) // (n - r + 1)
            FROM ranked CROSS JOIN cap
        ), usage AS (
            SELECT cand,
                   CAST(SUM(least(demand, cand)) AS BIGINT) AS used
            FROM cands CROSS JOIN d
            WHERE cand >= 0
            GROUP BY cand
        ), level AS (
            SELECT CAST(MAX(cand) AS BIGINT) AS lvl
            FROM usage CROSS JOIN cap WHERE used <= c
        )
        SELECT n_name,
               demand,
               CAST(least(demand, lvl) AS BIGINT) AS alloc,
               CAST(CASE WHEN demand > lvl THEN 1 ELSE 0 END AS BIGINT)
                   AS saturated,
               lvl AS level,
               CAST(c - (SELECT SUM(least(demand, lvl))
                         FROM d CROSS JOIN level) AS BIGINT) AS slack
        FROM d CROSS JOIN level CROSS JOIN cap
        ORDER BY n_name
    """,
    description="Integer water-filling: nations demand their total "
    "shipped quantity, capacity is 60% of the total, and the water "
    "level L* is the largest integer with sum(min(d_i, L)) <= C — "
    "channels below the level are fully served, the rest are capped "
    "at L*. Exact integer search: the optimum lies in the candidate "
    "set {d_i} union {(C - prefix_{r-1}) div (n-r+1)} (the closed-form "
    "level if exactly r-1 channels saturate), so a bounded 50x25 "
    "candidate-by-demand evaluation finds it without iteration. "
    "Scale: one fact-scale aggregation feeds a 25-row panel; the "
    "candidate search is constant-size.",
)
def alloc_water_filling_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    d = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", "n_nationkey")
        .agg(F.sum("l_quantity").cast("long").alias("demand"))
        .localCheckpoint(eager=False)  # bounded 25-row panel, 4 consumers
    )
    cap = d.agg(
        F.expr("sum(demand) * 6 div 10").cast("long").alias("c"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    w = Window.orderBy("demand", "n_nationkey")
    ranked = d.select(
        "demand",
        F.row_number().over(w).alias("r"),
        F.sum("demand")
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prefix_prev"),
    )
    cands = (
        d.select(F.col("demand").alias("cand"))
        .union(
            ranked.crossJoin(F.broadcast(cap)).select(
                F.expr(
                    "(c - coalesce(prefix_prev, 0)) div (n - r + 1)"
                ).alias("cand")
            )
        )
        .distinct()
        .where(F.col("cand") >= 0)
    )
    usage = (
        cands.crossJoin(F.broadcast(d))
        .groupBy("cand")
        .agg(F.sum(F.least("demand", "cand")).cast("long").alias("used"))
    )
    level = (
        usage.crossJoin(F.broadcast(cap))
        .where(F.col("used") <= F.col("c"))
        .agg(F.max("cand").cast("long").alias("lvl"))
    )
    slack = (
        d.crossJoin(F.broadcast(level))
        .agg(F.sum(F.least("demand", "lvl")).alias("served"))
        .crossJoin(F.broadcast(cap))
        .select((F.col("c") - F.col("served")).cast("long").alias("slack"))
    )
    return (
        d.crossJoin(F.broadcast(level))
        .crossJoin(F.broadcast(slack))
        .select(
            "n_name",
            "demand",
            F.least("demand", "lvl").cast("long").alias("alloc"),
            F.when(F.col("demand") > F.col("lvl"), 1)
            .otherwise(0)
            .cast("long")
            .alias("saturated"),
            F.col("lvl").alias("level"),
            "slack",
        )
        .orderBy("n_name")
    )


# ------------------------------------- LIFO vs FIFO lot valuation


@query(
    "inventory_lifo_vs_fifo_valuation",
    oracle="""
        WITH lots AS (
            SELECT l_partkey AS pk, CAST(l_quantity AS BIGINT) AS qty,
                   CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS epc,
                   SUM(CAST(l_quantity AS BIGINT)) OVER (
                       PARTITION BY l_partkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                l_quantity, l_extendedprice
                       ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(CAST(l_quantity AS BIGINT))
                       OVER (PARTITION BY l_partkey) AS t
            FROM lineitem
        ), kept AS (
            SELECT pk, qty, epc,
                   greatest(0, least(qty, cum - (t * 6 // 10)))
                       AS fifo_keep,
                   greatest(0, least(qty, (t - t * 6 // 10) - cum + qty))
                       AS lifo_keep
            FROM lots
        ), per_part AS (
            SELECT pk,
                   CAST(SUM(fifo_keep * epc // qty) AS BIGINT) AS fifo_c,
                   CAST(SUM(lifo_keep * epc // qty) AS BIGINT) AS lifo_c
            FROM kept GROUP BY 1
        )
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(fifo_c) AS BIGINT) AS fifo_value_cents,
               CAST(SUM(lifo_c) AS BIGINT) AS lifo_value_cents,
               CAST(SUM(fifo_c) - SUM(lifo_c) AS BIGINT) AS delta_cents
        FROM per_part JOIN part ON p_partkey = pk
        GROUP BY 1 ORDER BY p_brand
    """,
    description="LIFO-vs-FIFO ending-inventory valuation: per part the "
    "shipment lots (date-ordered, fully tie-broken so duplicate rows "
    "are fungible) accumulate; 60% of total units are deemed sold, and "
    "the remaining 40% are valued under FIFO (survivors are the LAST "
    "lots: clamp(cum - sold, 0, qty)) and LIFO (survivors are the "
    "FIRST lots: clamp(remaining - cum + qty, 0, qty)), each at the "
    "lot's own unit cents (integer-division pro-rata). The per-brand "
    "delta is the classic inflation-exposure number. Scale: windows "
    "partition on l_partkey (high cardinality), one join to part for "
    "the brand rollup; all integer/DECIMAL arithmetic.",
)
def inventory_lifo_vs_fifo_valuation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice",
    )
    qcol = F.col("l_quantity").cast("long")
    lots = li.select(
        F.col("l_partkey").alias("pk"),
        qcol.alias("qty"),
        (dec("l_extendedprice") * 100).cast("long").alias("epc"),
        F.sum(qcol)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum(qcol).over(Window.partitionBy("l_partkey")).alias("t"),
    )
    kept = lots.select(
        "pk",
        "qty",
        "epc",
        F.greatest(
            F.lit(0), F.least("qty", F.expr("cum - (t * 6 div 10)"))
        ).alias("fifo_keep"),
        F.greatest(
            F.lit(0),
            F.least("qty", F.expr("(t - t * 6 div 10) - cum + qty")),
        ).alias("lifo_keep"),
    )
    per_part = kept.groupBy("pk").agg(
        F.sum(F.expr("fifo_keep * epc div qty")).cast("long").alias("fifo_c"),
        F.sum(F.expr("lifo_keep * epc div qty")).cast("long").alias("lifo_c"),
    )
    return (
        per_part.join(part, per_part.pk == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("fifo_c").cast("long").alias("fifo_value_cents"),
            F.sum("lifo_c").cast("long").alias("lifo_value_cents"),
            (F.sum("fifo_c") - F.sum("lifo_c"))
            .cast("long")
            .alias("delta_cents"),
        )
        .orderBy("p_brand")
    )


# ----------------------------------- arrays_zip padding semantics


@query(
    "sql_arrays_zip_semantics_battery",
    oracle="""
        WITH lens AS (
            SELECT lang,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n,
                   greatest(len(regexp_split_to_array(trim(text),
                                                      '\\s+')) - 2,
                            1) AS nb
            FROM documents
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS sum_len_a,
               CAST(SUM(nb) AS BIGINT) AS sum_len_b,
               CAST(SUM(n) AS BIGINT) AS sum_zip_len,
               CAST(SUM(n - nb) AS BIGINT) AS sum_null_pads,
               CAST(SUM(nb) AS BIGINT) AS sum_zw_nonnull,
               CAST(COUNT(*) AS BIGINT) AS n_oob_null
        FROM lens GROUP BY 1 ORDER BY lang
    """,
    description="arrays_zip / zip_with / element_at edge-semantics "
    "battery on unequal-length arrays (tokens vs the 2-shorter "
    "slice): arrays_zip pads the shorter side with NULL so the zipped "
    "length equals the LONGER input; zip_with's lambda sees the NULL "
    "pad (concat propagates it, so non-null results = shorter "
    "length); try_element_at one past the end returns NULL (plain "
    "element_at THROWS under Spark-4 ANSI mode — the trap this "
    "battery documents). The oracle derives every measure from "
    "the two lengths — Spark's array semantics are checked against "
    "the definition, not against another implementation. Scale: "
    "per-row higher-order functions, one group-by; no explode.",
)
def sql_arrays_zip_semantics_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    a = F.split(F.trim(F.col("text")), r"\s+")
    rows = docs.select(
        "lang",
        a.alias("a"),
        F.slice(a, 1, F.greatest(F.size(a) - 2, F.lit(1))).alias("b"),
    ).select(
        "lang",
        F.size("a").alias("n"),
        F.size("b").alias("nb"),
        F.size(F.arrays_zip("a", "b")).alias("zip_len"),
        F.size(
            F.filter(
                F.zip_with("a", "b", lambda x, y: F.concat(x, y)),
                lambda e: e.isNull(),
            )
        ).alias("n_null_pads"),
        F.size(
            F.filter(
                F.zip_with("a", "b", lambda x, y: F.concat(x, y)),
                lambda e: e.isNotNull(),
            )
        ).alias("n_zw_nonnull"),
        F.try_element_at("a", F.size("a") + 1)
        .isNull()
        .cast("int")
        .alias("oob_null"),
    )
    return (
        rows.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("sum_len_a"),
            F.sum("nb").cast("long").alias("sum_len_b"),
            F.sum("zip_len").cast("long").alias("sum_zip_len"),
            F.sum("n_null_pads").cast("long").alias("sum_null_pads"),
            F.sum("n_zw_nonnull").cast("long").alias("sum_zw_nonnull"),
            F.sum("oob_null").cast("long").alias("n_oob_null"),
        )
        .orderBy("lang")
    )


# ------------------------------------------- wash-sale detector

_WASH_WINDOW_DAYS = 30
_WASH_DISCOUNT = "0.08"


@query(
    "finance_wash_sale_detector",
    oracle=f"""
        WITH sales AS MATERIALIZED (
            SELECT o.o_custkey AS ck, l.l_partkey AS pk,
                   o.o_orderdate AS d, l.l_orderkey AS ok,
                   l.l_linenumber AS ln
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE CAST(l.l_discount AS DECIMAL(4,2)) >= {_WASH_DISCOUNT}
        ), buys AS MATERIALIZED (
            SELECT o.o_custkey AS ck, l.l_partkey AS pk,
                   o.o_orderdate AS d, l.l_orderkey AS ok
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        ), flagged AS (
            SELECT s.*, EXISTS (
                SELECT 1 FROM buys b
                WHERE b.ck = s.ck AND b.pk = s.pk
                  AND b.d > s.d
                  AND b.d <= s.d + INTERVAL {_WASH_WINDOW_DAYS} DAY
                  AND b.ok <> s.ok
            ) AS wash
            FROM sales s
        )
        SELECT CAST(EXTRACT(year FROM d) AS BIGINT) AS yr,
               CAST(COUNT(*) AS BIGINT) AS n_loss_sales,
               CAST(SUM(CASE WHEN wash THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_wash_sales,
               CAST(SUM(CASE WHEN wash THEN 1 ELSE 0 END) * 1000
                    // COUNT(*) AS BIGINT) AS wash_permille
        FROM flagged
        GROUP BY 1 ORDER BY yr
    """,
    description="Wash-sale detector: a deep-discount sale (discount "
    f">= {_WASH_DISCOUNT}) is 'washed' when the same customer buys the "
    f"same part within {_WASH_WINDOW_DAYS} days afterwards on a "
    "different order — the repurchase-window pattern behind tax "
    "wash-sale rules and promotion-abuse screens. Spark runs it as a "
    "LEFT SEMI join keyed on (custkey, partkey) with the date window "
    "as a residual predicate — the equi-keys keep the join "
    "hash-partitioned and scale-safe (no interval cross product); the "
    "oracle is the equivalent EXISTS. Discount compares as "
    "DECIMAL(4,2) so the 0.08 boundary is exact in both engines.",
)
def finance_wash_sale_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    sales = (
        li.where(dec("l_discount", "decimal(4,2)") >= _WASH_DISCOUNT)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("ck"),
            F.col("l_partkey").alias("pk"),
            F.col("o_orderdate").alias("d"),
            F.col("l_orderkey").alias("ok"),
            F.col("l_linenumber").alias("ln"),
        )
    )
    buys = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("bck"),
        F.col("l_partkey").alias("bpk"),
        F.col("o_orderdate").alias("bd"),
        F.col("l_orderkey").alias("bok"),
    )
    washed = sales.join(
        buys,
        (F.col("ck") == F.col("bck"))
        & (F.col("pk") == F.col("bpk"))
        & (F.col("bd") > F.col("d"))
        & (
            F.col("bd")
            <= F.col("d") + F.expr(f"INTERVAL {_WASH_WINDOW_DAYS} DAYS")
        )
        & (F.col("bok") != F.col("ok")),
        "left_semi",
    )
    per_year = sales.groupBy(F.year("d").cast("long").alias("yr")).agg(
        F.count(F.lit(1)).cast("long").alias("n_loss_sales")
    )
    washed_year = washed.groupBy(
        F.year("d").cast("long").alias("wyr")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_wash_sales"))
    return (
        per_year.join(
            washed_year, per_year.yr == washed_year.wyr, "left"
        )
        .select(
            "yr",
            "n_loss_sales",
            F.coalesce("n_wash_sales", F.lit(0))
            .cast("long")
            .alias("n_wash_sales"),
            F.expr(
                "coalesce(n_wash_sales, 0) * 1000 div n_loss_sales"
            ).cast("long").alias("wash_permille"),
        )
        .orderBy("yr")
    )
