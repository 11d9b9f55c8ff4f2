"""Wave-212 (round 8, part 2): series / index-number / routing / text
operators — an integer SAD matrix profile, chain-ladder reserving,
Laspeyres/Paasche/Fisher price indices, longest-prefix-match routing,
LSM write-amplification economics, integer-surprisal document scoring,
two-point unicity re-identification risk, WAND top-k pruning
economics, and moving-average type-token lexical diversity.

All [EXT] per SURVEY.md §2.8 (the reference's only query is
README.md:98-101). Scale shapes: fact-scale work is always one or two
pushed-down scans + shuffles on natural keys (doc_id / word / user /
month); bounded panels (month spine, term panel, route table) ride
broadcast joins; float-free integer scoring everywhere except the two
places IEEE arithmetic is deterministic by fixed evaluation order
(chain-ladder factor products, Fisher's sqrt), mirrored expression-
for-expression in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import dec, query

# ------------------------------------------ SAD matrix profile

_MP_M = 6  # subsequence length (months)

_MP_SPINE_SQL = """
        rev AS MATERIALIZED (
            SELECT year(CAST(l_shipdate AS DATE)) * 100
                       + month(CAST(l_shipdate AS DATE)) AS ym,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS r
            FROM lineitem GROUP BY 1
        ), spine AS MATERIALIZED (
            SELECT ym, r, ROW_NUMBER() OVER (ORDER BY ym) AS i,
                   COUNT(*) OVER () AS n
            FROM rev
        )
"""


@query(
    "timeseries_sad_matrix_profile",
    oracle=f"""
        WITH {_MP_SPINE_SQL}, sub AS MATERIALIZED (
            SELECT i, ym, n,
                   r AS r0,
                   LEAD(r, 1) OVER (ORDER BY i) AS r1,
                   LEAD(r, 2) OVER (ORDER BY i) AS r2,
                   LEAD(r, 3) OVER (ORDER BY i) AS r3,
                   LEAD(r, 4) OVER (ORDER BY i) AS r4,
                   LEAD(r, 5) OVER (ORDER BY i) AS r5
            FROM spine
        ), valid AS MATERIALIZED (
            SELECT * FROM sub WHERE i <= n - {_MP_M - 1}
        ), dists AS (
            SELECT a.i, a.ym,
                   ABS(a.r0 - b.r0) + ABS(a.r1 - b.r1) + ABS(a.r2 - b.r2)
                 + ABS(a.r3 - b.r3) + ABS(a.r4 - b.r4) + ABS(a.r5 - b.r5)
                       AS sad,
                   b.i AS j, b.ym AS jym
            FROM valid a JOIN valid b
              ON b.i >= a.i + {_MP_M} OR b.i <= a.i - {_MP_M}
        ), ranked AS (
            SELECT i, ym, sad, jym,
                   ROW_NUMBER() OVER (PARTITION BY i ORDER BY sad, j) AS rk
            FROM dists
        )
        SELECT CAST(ym AS BIGINT) AS ym,
               CAST(sad AS BIGINT) AS profile_sad_cents,
               CAST(jym AS BIGINT) AS nn_ym
        FROM ranked WHERE rk = 1 ORDER BY ym
    """,
    description="Integer SAD matrix profile of the monthly revenue "
    f"series (subsequence length m={_MP_M}, trivial-match exclusion "
    "zone |i-j| >= m): for every month-anchored window, the distance "
    "to its nearest non-overlapping neighbor window and that "
    "neighbor's month. Low profile values are MOTIFS (repeated "
    "seasonal shapes), the maximum is the DISCORD (anomalous window) "
    "— the matrix-profile primitive with sum-of-absolute-differences "
    "instead of z-normalized Euclidean so everything stays in exact "
    "cents. The series is the bounded ~84-month spine, so the "
    "all-pairs join is constant-size; fact cost is one monthly "
    "aggregation at any SF.",
)
def timeseries_sad_matrix_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    sd = F.col("l_shipdate").cast("date")
    rev = (
        line.groupBy((F.year(sd) * 100 + F.month(sd)).alias("ym"))
        .agg(F.sum(dec("l_extendedprice") * 100).cast("long").alias("r"))
    )
    wi = Window.orderBy("ym")
    spine = rev.select(
        "ym",
        "r",
        F.row_number().over(wi).alias("i"),
        F.count(F.lit(1))
        .over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    sub = spine.select(
        "i",
        "ym",
        "n",
        F.col("r").alias("r0"),
        *[
            F.lead("r", k).over(Window.orderBy("i")).alias(f"r{k}")
            for k in range(1, _MP_M)
        ],
    )
    valid = sub.where(F.col("i") <= F.col("n") - (_MP_M - 1)).localCheckpoint(
        eager=False
    )
    a = valid.select(
        F.col("i").alias("ai"),
        F.col("ym").alias("aym"),
        *[F.col(f"r{k}").alias(f"a{k}") for k in range(_MP_M)],
    )
    b = valid.select(
        F.col("i").alias("bi"),
        F.col("ym").alias("bym"),
        *[F.col(f"r{k}").alias(f"b{k}") for k in range(_MP_M)],
    )
    sad = sum(
        F.abs(F.col(f"a{k}") - F.col(f"b{k}")) for k in range(_MP_M)
    )
    dists = a.join(
        F.broadcast(b),
        (F.col("bi") >= F.col("ai") + _MP_M)
        | (F.col("bi") <= F.col("ai") - _MP_M),
    ).select(
        "ai", "aym", sad.alias("sad"), F.col("bi").alias("j"),
        F.col("bym").alias("jym"),
    )
    ranked = dists.withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("ai").orderBy("sad", "j")),
    )
    return (
        ranked.where(F.col("rk") == 1)
        .select(
            F.col("aym").cast("long").alias("ym"),
            F.col("sad").cast("long").alias("profile_sad_cents"),
            F.col("jym").cast("long").alias("nn_ym"),
        )
        .orderBy("ym")
    )


# ------------------------------------------ chain-ladder reserving

_CL_YEAR = 1997
_CL_MAXDEV = 6


def _cl_factor_sql(d: int) -> str:
    """ATA factor f_d (d -> d+1) over origins with both columns observed
    (o <= 11 - d), as a deterministic double division of exact sums."""
    return f"""(
        SELECT CASE WHEN SUM(CASE WHEN d = {d} THEN c END) IS NULL
                      OR SUM(CASE WHEN d = {d} THEN c END) = 0 THEN 1.0
               ELSE CAST(SUM(CASE WHEN d = {d + 1} THEN c END) AS DOUBLE)
                    / CAST(SUM(CASE WHEN d = {d} THEN c END) AS DOUBLE)
               END
        FROM cum WHERE o <= {11 - d} AND d IN ({d}, {d + 1})
    )"""


@query(
    "actuarial_chain_ladder_projection",
    oracle=f"""
        WITH inc AS MATERIALIZED (
            SELECT month(CAST(o.o_orderdate AS DATE)) AS o,
                   (year(CAST(l.l_shipdate AS DATE)) * 12
                    + month(CAST(l.l_shipdate AS DATE)))
                 - (year(CAST(o.o_orderdate AS DATE)) * 12
                    + month(CAST(o.o_orderdate AS DATE))) AS d,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS paid
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE year(CAST(o.o_orderdate AS DATE)) = {_CL_YEAR}
              AND year(CAST(l.l_shipdate AS DATE)) = {_CL_YEAR}
            GROUP BY 1, 2
        ), cum AS MATERIALIZED (
            -- full origin x dev spine (observed cells o + d <= 12),
            -- cumulative paid per origin
            SELECT s.o, s.d,
                   CAST(SUM(COALESCE(i.paid, 0)) OVER (
                       PARTITION BY s.o ORDER BY s.d) AS BIGINT) AS c
            FROM (SELECT oo.range AS o, dd.range AS d
                  FROM range(1, 13) oo CROSS JOIN range(0, {_CL_MAXDEV + 1}) dd
                  WHERE oo.range + dd.range <= 12) s
            LEFT JOIN inc i ON i.o = s.o AND i.d = s.d
        ), fx AS MATERIALIZED (
            SELECT {_cl_factor_sql(0)} AS f0, {_cl_factor_sql(1)} AS f1,
                   {_cl_factor_sql(2)} AS f2, {_cl_factor_sql(3)} AS f3,
                   {_cl_factor_sql(4)} AS f4, {_cl_factor_sql(5)} AS f5
        ), gx AS MATERIALIZED (
            -- right products g_d = f_d * (f_(d+1) * ...) in FIXED order
            SELECT f5 AS g5, f4 * f5 AS g4, f3 * (f4 * f5) AS g3,
                   f2 * (f3 * (f4 * f5)) AS g2,
                   f1 * (f2 * (f3 * (f4 * f5))) AS g1,
                   f0 * (f1 * (f2 * (f3 * (f4 * f5)))) AS g0
            FROM fx
        ), latest AS (
            SELECT o, LEAST({_CL_MAXDEV}, 12 - o) AS dobs, c
            FROM cum WHERE d = LEAST({_CL_MAXDEV}, 12 - o)
        )
        SELECT CAST({_CL_YEAR} * 100 + l.o AS BIGINT) AS origin_ym,
               l.c AS latest_cents,
               CAST(l.c AS DOUBLE) * (CASE l.dobs
                   WHEN {_CL_MAXDEV} THEN 1.0
                   WHEN 5 THEN g.g5 WHEN 4 THEN g.g4 WHEN 3 THEN g.g3
                   WHEN 2 THEN g.g2 WHEN 1 THEN g.g1 ELSE g.g0 END)
                   AS ultimate,
               CAST(l.c AS DOUBLE) * (CASE l.dobs
                   WHEN {_CL_MAXDEV} THEN 1.0
                   WHEN 5 THEN g.g5 WHEN 4 THEN g.g4 WHEN 3 THEN g.g3
                   WHEN 2 THEN g.g2 WHEN 1 THEN g.g1 ELSE g.g0 END)
                 - CAST(l.c AS DOUBLE) AS ibnr
        FROM latest l CROSS JOIN gx g
        ORDER BY origin_ym
    """,
    description="Chain-ladder loss development on the "
    f"{_CL_YEAR} order cohort: origins are order months, development "
    "age is ship-lag in months, 'paid' is shipped cents, and the "
    "run-off triangle is cut off at year end so late origins are "
    "undeveloped. Volume-weighted age-to-age factors use only origins "
    "observed at both ages; each origin's ultimate multiplies its "
    "latest diagonal by the remaining factors in a FIXED "
    "right-associated order, so the double products are bit-identical "
    "across engines (factors themselves are single divisions of exact "
    "integer sums). Emits latest, ultimate, and IBNR per origin — the "
    "reserving triangle every finance team builds, as one fact join + "
    "a 12x7 bounded spine.",
)
def actuarial_chain_ladder_projection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    sd = F.col("l_shipdate").cast("date")
    inc = (
        line.join(orders, orders.o_orderkey == line.l_orderkey)
        .where((F.year(od) == _CL_YEAR) & (F.year(sd) == _CL_YEAR))
        .groupBy(
            F.month(od).alias("o"),
            (
                (F.year(sd) * 12 + F.month(sd))
                - (F.year(od) * 12 + F.month(od))
            ).alias("d"),
        )
        .agg(F.sum(dec("l_extendedprice") * 100).cast("long").alias("paid"))
    )
    oo = spark.range(1, 13).select(F.col("id").alias("o"))
    dd = spark.range(0, _CL_MAXDEV + 1).select(F.col("id").alias("d"))
    spine = oo.crossJoin(dd).where(F.col("o") + F.col("d") <= 12)
    cum = (
        spine.join(inc, ["o", "d"], "left")
        .select(
            "o",
            "d",
            F.sum(F.coalesce(F.col("paid"), F.lit(0)))
            .over(Window.partitionBy("o").orderBy("d"))
            .cast("long")
            .alias("c"),
        )
        .localCheckpoint(eager=False)
    )

    # ATA factors with the per-factor origin restriction o <= 11 - d,
    # via conditional sums inside one aggregation pass
    fx = cum.agg(
        *[
            F.when(
                F.sum(
                    F.when(
                        (F.col("d") == d) & (F.col("o") <= 11 - d),
                        F.col("c"),
                    )
                ).isNull()
                | (
                    F.sum(
                        F.when(
                            (F.col("d") == d) & (F.col("o") <= 11 - d),
                            F.col("c"),
                        )
                    )
                    == 0
                ),
                F.lit(1.0),
            )
            .otherwise(
                F.sum(
                    F.when(
                        (F.col("d") == d + 1) & (F.col("o") <= 11 - d),
                        F.col("c"),
                    )
                ).cast("double")
                / F.sum(
                    F.when(
                        (F.col("d") == d) & (F.col("o") <= 11 - d),
                        F.col("c"),
                    )
                ).cast("double")
            )
            .alias(f"f{d}")
            for d in range(_CL_MAXDEV)
        ]
    )
    gx = fx.select(
        F.col("f5").alias("g5"),
        (F.col("f4") * F.col("f5")).alias("g4"),
        (F.col("f3") * (F.col("f4") * F.col("f5"))).alias("g3"),
        (F.col("f2") * (F.col("f3") * (F.col("f4") * F.col("f5"))))
        .alias("g2"),
        (
            F.col("f1")
            * (F.col("f2") * (F.col("f3") * (F.col("f4") * F.col("f5"))))
        ).alias("g1"),
        (
            F.col("f0")
            * (
                F.col("f1")
                * (
                    F.col("f2")
                    * (F.col("f3") * (F.col("f4") * F.col("f5")))
                )
            )
        ).alias("g0"),
    )
    latest = cum.where(
        F.col("d") == F.least(F.lit(_CL_MAXDEV), F.lit(12) - F.col("o"))
    ).select("o", F.least(F.lit(_CL_MAXDEV), F.lit(12) - F.col("o")).alias("dobs"), "c")
    g = (
        F.when(F.col("dobs") == _CL_MAXDEV, F.lit(1.0))
        .when(F.col("dobs") == 5, F.col("g5"))
        .when(F.col("dobs") == 4, F.col("g4"))
        .when(F.col("dobs") == 3, F.col("g3"))
        .when(F.col("dobs") == 2, F.col("g2"))
        .when(F.col("dobs") == 1, F.col("g1"))
        .otherwise(F.col("g0"))
    )
    return (
        latest.crossJoin(F.broadcast(gx))
        .select(
            (F.lit(_CL_YEAR * 100) + F.col("o")).cast("long")
            .alias("origin_ym"),
            F.col("c").alias("latest_cents"),
            (F.col("c").cast("double") * g).alias("ultimate"),
            (F.col("c").cast("double") * g - F.col("c").cast("double"))
            .alias("ibnr"),
        )
        .orderBy("origin_ym")
    )


# ------------------------------------------ Laspeyres/Paasche/Fisher

_PI_BASE = 199601
_PI_YEAR = 1996


@query(
    "finance_price_index_lpf",
    oracle=f"""
        WITH bm AS MATERIALIZED (
            SELECT p.p_brand,
                   year(CAST(l.l_shipdate AS DATE)) * 100
                       + month(CAST(l.l_shipdate AS DATE)) AS ym,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS cents,
                   CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE year(CAST(l.l_shipdate AS DATE)) = {_PI_YEAR}
            GROUP BY 1, 2
        ), pr AS MATERIALIZED (
            SELECT p_brand, ym, cents * 1000 // qty AS p, qty AS q
            FROM bm WHERE qty > 0
        ), base AS MATERIALIZED (
            SELECT p_brand, p AS p0, q AS q0 FROM pr WHERE ym = {_PI_BASE}
        ), matched AS (
            SELECT t.ym, t.p_brand, t.p AS pt, t.q AS qt, b.p0, b.q0
            FROM pr t JOIN base b ON b.p_brand = t.p_brand
            WHERE t.ym > {_PI_BASE}
        ), agg AS (
            -- HUGEINT accumulation: sum(p*q) exceeds BIGINT from sf0.1
            -- up (price in millicents x basket quantities), mirrored by
            -- DECIMAL(38,0) sums on the Spark side
            SELECT ym, CAST(COUNT(*) AS BIGINT) AS n_brands,
                   CAST(SUM(CAST(pt AS HUGEINT) * q0) * 1000000
                        // SUM(CAST(p0 AS HUGEINT) * q0) AS BIGINT)
                       AS laspeyres_micro,
                   CAST(SUM(CAST(pt AS HUGEINT) * qt) * 1000000
                        // SUM(CAST(p0 AS HUGEINT) * qt) AS BIGINT)
                       AS paasche_micro
            FROM matched GROUP BY ym
        )
        SELECT CAST(ym AS BIGINT) AS ym, n_brands, laspeyres_micro,
               paasche_micro,
               CAST(FLOOR(SQRT(CAST(laspeyres_micro * paasche_micro
                                    AS DOUBLE))) AS BIGINT) AS fisher_micro
        FROM agg ORDER BY ym
    """,
    description="Index-number theory on the part-brand basket: monthly "
    f"Laspeyres (base-{_PI_BASE} quantities), Paasche (current "
    "quantities), and Fisher ideal (geometric mean) price indices in "
    "micro units, over brands present in both the base month and the "
    "comparison month (the matched basket). Unit values are integer "
    "millicents per unit (truncation division), index ratios are "
    "integer micro, and Fisher is floor(sqrt(L*P)) — the only double "
    "op, bit-identical across engines since L*P < 2^53. One pushed-"
    "down year scan + a bounded brand-month panel; the classic "
    "substitution-bias gap (L >= F >= P) becomes measurable data.",
)
def finance_price_index_lpf(spark: SparkSession, sf_dir: str) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sd = F.col("l_shipdate").cast("date")
    bm = (
        line.where(F.year(sd) == _PI_YEAR)
        .join(F.broadcast(part), part.p_partkey == line.l_partkey)
        .groupBy("p_brand", (F.year(sd) * 100 + F.month(sd)).alias("ym"))
        .agg(
            F.sum(dec("l_extendedprice") * 100).cast("long").alias("cents"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        )
    )
    pr = bm.where(F.col("qty") > 0).select(
        "p_brand", "ym", F.expr("cents * 1000 div qty").alias("p"),
        F.col("qty").alias("q"),
    ).localCheckpoint(eager=False)
    base = pr.where(F.col("ym") == _PI_BASE).select(
        F.col("p_brand").alias("bb"),
        F.col("p").alias("p0"),
        F.col("q").alias("q0"),
    )
    matched = pr.where(F.col("ym") > _PI_BASE).join(
        F.broadcast(base), F.col("bb") == F.col("p_brand")
    )
    # DECIMAL(38,0) accumulation (== the oracle's HUGEINT): the raw
    # long product p*q overflows from sf0.1 up — caught by the sweep
    agg = matched.groupBy("ym").agg(
        F.count(F.lit(1)).cast("long").alias("n_brands"),
        F.expr(
            "cast(sum(cast(p as decimal(38,0)) * q0) * 1000000"
            " div sum(cast(p0 as decimal(38,0)) * q0) as bigint)"
        ).alias("laspeyres_micro"),
        F.expr(
            "cast(sum(cast(p as decimal(38,0)) * q) * 1000000"
            " div sum(cast(p0 as decimal(38,0)) * q) as bigint)"
        ).alias("paasche_micro"),
    )
    return agg.select(
        F.col("ym").cast("long").alias("ym"),
        "n_brands",
        "laspeyres_micro",
        "paasche_micro",
        F.floor(
            F.sqrt(
                (F.col("laspeyres_micro") * F.col("paasche_micro"))
                .cast("double")
            )
        ).cast("long").alias("fisher_micro"),
    ).orderBy("ym")


# ------------------------------------------ longest-prefix match

_LPM_KNUTH = 2654435761
_LPM_MOD = 4294967296  # 2^32


@query(
    "net_longest_prefix_match",
    oracle=f"""
        WITH ips AS MATERIALIZED (
            SELECT event_id, user_id,
                   (user_id * {_LPM_KNUTH}) % {_LPM_MOD} AS ip
            FROM events
        ), routes0 AS (
            SELECT s_suppkey AS route_id,
                   CASE s_suppkey % 3 WHEN 0 THEN 8 WHEN 1 THEN 16
                        ELSE 24 END AS plen,
                   ((s_suppkey * {_LPM_KNUTH}) % {_LPM_MOD})
                       >> (32 - CASE s_suppkey % 3 WHEN 0 THEN 8
                                WHEN 1 THEN 16 ELSE 24 END) AS net
            FROM supplier WHERE s_suppkey BETWEEN 1 AND 64
        ), routes AS MATERIALIZED (
            -- dedup colliding prefixes deterministically; add default
            SELECT plen, net, MIN(route_id) AS route_id
            FROM routes0 GROUP BY 1, 2
            UNION ALL SELECT 0, 0, 0
        ), cand AS (
            -- equi-join candidates: one (plen, shifted-ip) per level
            SELECT i.event_id, i.user_id, r.route_id, r.plen
            FROM ips i CROSS JOIN (VALUES (0), (8), (16), (24)) lv(plen)
            JOIN routes r ON r.plen = lv.plen
               AND r.net = CASE lv.plen WHEN 0 THEN 0
                           ELSE i.ip >> (32 - lv.plen) END
        ), best AS (
            SELECT event_id, user_id, route_id, plen,
                   ROW_NUMBER() OVER (PARTITION BY event_id
                       ORDER BY plen DESC, route_id) AS rk
            FROM cand
        )
        SELECT CAST(route_id AS BIGINT) AS route_id,
               CAST(plen AS BIGINT) AS prefix_len,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM best WHERE rk = 1
        GROUP BY 1, 2 ORDER BY prefix_len DESC, route_id
    """,
    description="Longest-prefix-match routing as a JOIN pattern: "
    "synthetic 32-bit addresses from a Knuth multiplicative hash of "
    "the user key (pure arithmetic — engine hash functions differ, so "
    "determinism comes from integer multiply-mod), a 64-entry route "
    "table with /8, /16, /24 prefixes plus a /0 default, and the LPM "
    "winner per event by (longest prefix, lowest route id). The match "
    "is an EQUI join — each event emits one shifted key per prefix "
    "level and hash-joins the broadcast route table — never a "
    "nested-loop range probe, so the plan is map-side at any scale; "
    "per-route traffic and distinct-user counts close the audit.",
)
def net_longest_prefix_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    supplier = load_table(spark, sf_dir, "supplier")
    ips = events.select(
        "event_id",
        "user_id",
        ((F.col("user_id") * _LPM_KNUTH) % _LPM_MOD).alias("ip"),
    )
    plen = (
        F.when(F.col("s_suppkey") % 3 == 0, 8)
        .when(F.col("s_suppkey") % 3 == 1, 16)
        .otherwise(24)
    )
    routes0 = supplier.where(
        (F.col("s_suppkey") >= 1) & (F.col("s_suppkey") <= 64)
    ).select(
        F.col("s_suppkey").alias("route_id"),
        plen.alias("plen"),
        F.expr(
            f"shiftright((s_suppkey * {_LPM_KNUTH}) % {_LPM_MOD},"
            " 32 - (case s_suppkey % 3 when 0 then 8 when 1 then 16"
            " else 24 end))"
        ).alias("net"),
    )
    routes = (
        routes0.groupBy("plen", "net")
        .agg(F.min("route_id").alias("route_id"))
        .unionByName(
            routes0.sparkSession.range(1).select(
                F.lit(0).alias("plen"),
                F.lit(0).cast("long").alias("net"),
                F.lit(0).cast("long").alias("route_id"),
            )
        )
    )
    cand = (
        ips.select(
            "event_id",
            "user_id",
            "ip",
            F.explode(F.array(F.lit(0), F.lit(8), F.lit(16), F.lit(24)))
            .alias("lv"),
        )
        .select(
            "event_id",
            "user_id",
            "lv",
            F.expr(
                "case lv when 0 then cast(0 as bigint)"
                " else shiftright(ip, 32 - lv) end"
            ).alias("key"),
        )
        .join(
            F.broadcast(routes),
            (F.col("plen") == F.col("lv")) & (F.col("net") == F.col("key")),
        )
    )
    best = cand.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("event_id").orderBy(
                F.desc("plen"), "route_id"
            )
        ),
    ).where(F.col("rk") == 1)
    return (
        best.groupBy(
            F.col("route_id").cast("long").alias("route_id"),
            F.col("plen").cast("long").alias("prefix_len"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.desc("prefix_len"), "route_id")
    )


# ------------------------------------------ LSM write-amp economics

_LSM_FLUSH = 1000  # records per L0 file


@query(
    "layout_lsm_writeamp_economics",
    oracle=f"""
        WITH monthly AS MATERIALIZED (
            SELECT year(CAST(l_shipdate AS DATE)) * 100
                       + month(CAST(l_shipdate AS DATE)) AS ym,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1
        ), cumed AS (
            SELECT ym, n,
                   CAST(SUM(n) OVER (ORDER BY ym) AS BIGINT) AS cum,
                   (CAST(SUM(n) OVER (ORDER BY ym) AS BIGINT)
                    + {_LSM_FLUSH - 1}) // {_LSM_FLUSH} AS files
            FROM monthly
        )
        SELECT CAST(ym AS BIGINT) AS ym, n AS n_records, cum AS cum_records,
               files AS l0_files,
               CAST(LENGTH(CAST(files AS VARCHAR)) AS BIGINT)
                   AS leveled_levels,
               CAST((LENGTH(format('{{:b}}', files)) + 1) // 2 AS BIGINT)
                   AS tiered_levels,
               CAST(1 + 5 * LENGTH(CAST(files AS VARCHAR)) AS BIGINT)
                   AS leveled_write_amp,
               CAST(1 + (LENGTH(format('{{:b}}', files)) + 1) // 2 AS BIGINT)
                   AS tiered_write_amp,
               CAST(LENGTH(CAST(files AS VARCHAR)) AS BIGINT)
                   AS leveled_read_amp,
               CAST(4 * ((LENGTH(format('{{:b}}', files)) + 1) // 2)
                    AS BIGINT) AS tiered_read_amp
        FROM cumed ORDER BY ym
    """,
    description="LSM-tree compaction economics replayed over the "
    "monthly ingest curve: cumulative records -> L0 file count at "
    f"{_LSM_FLUSH} records/flush; leveled levels = base-10 digits of "
    "the file count (fanout 10, via VARCHAR length — an exact integer "
    "log in both engines), tiered levels = base-4 digits (4 runs per "
    "level, via binary-string length, bin() in Spark / format('{:b}') "
    "in DuckDB). Write amp: leveled pays ~fanout/2 rewrites per level "
    "(1 + 5L), tiered pays one write per level (1 + L); read amp is "
    "the inverse tradeoff (L sorted runs vs 4L). The standard "
    "leveled-vs-tiered decision table, derived from the actual ingest "
    "distribution in one monthly aggregation.",
)
def layout_lsm_writeamp_economics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    sd = F.col("l_shipdate").cast("date")
    monthly = line.groupBy(
        (F.year(sd) * 100 + F.month(sd)).alias("ym")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    cumed = monthly.select(
        "ym",
        "n",
        F.sum("n").over(Window.orderBy("ym")).cast("long").alias("cum"),
    ).select(
        "*",
        F.expr(f"(cum + {_LSM_FLUSH - 1}) div {_LSM_FLUSH}").alias("files"),
    )
    l10 = F.length(F.col("files").cast("string")).cast("long")
    l4 = F.expr("(length(bin(files)) + 1) div 2").cast("long")
    return cumed.select(
        F.col("ym").cast("long").alias("ym"),
        F.col("n").alias("n_records"),
        F.col("cum").alias("cum_records"),
        F.col("files").alias("l0_files"),
        l10.alias("leveled_levels"),
        l4.alias("tiered_levels"),
        (F.lit(1) + F.lit(5) * l10).cast("long").alias("leveled_write_amp"),
        (F.lit(1) + l4).cast("long").alias("tiered_write_amp"),
        l10.alias("leveled_read_amp"),
        (F.lit(4) * l4).cast("long").alias("tiered_read_amp"),
    ).orderBy("ym")


# ------------------------------------------ integer surprisal scores


@query(
    "text_integer_surprisal_scores",
    oracle="""
        WITH toks AS MATERIALIZED (
            SELECT doc_id, lang, t.word
            FROM (
                SELECT doc_id, lang, string_split(text, ' ') AS ws
                FROM documents
            ), UNNEST(ws) AS t(word)
            WHERE t.word <> ''
        ), vocab AS MATERIALIZED (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS nw FROM toks GROUP BY 1
        ), tot AS (SELECT CAST(SUM(nw) AS BIGINT) AS n FROM vocab),
        docsc AS MATERIALIZED (
            SELECT t.doc_id, t.lang,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(LENGTH(format('{:b}', tot.n // v.nw)) - 1)
                        AS BIGINT) AS score
            FROM toks t JOIN vocab v ON v.word = t.word CROSS JOIN tot
            GROUP BY 1, 2
        ), milli AS MATERIALIZED (
            SELECT doc_id, lang, n_tokens, score,
                   score * 1000 // n_tokens AS doc_milli,
                   ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY score * 1000 // n_tokens, doc_id) AS rk,
                   COUNT(*) OVER (PARTITION BY lang) AS nd
            FROM docsc
        )
        SELECT lang, CAST(MAX(nd) AS BIGINT) AS n_docs,
               CAST(SUM(score) * 1000 // SUM(n_tokens) AS BIGINT)
                   AS mean_surprisal_milli,
               CAST(MAX(CASE WHEN rk = (9 * nd + 9) // 10
                        THEN doc_milli END) AS BIGINT)
                   AS p90_surprisal_milli
        FROM milli GROUP BY lang ORDER BY lang
    """,
    description="Float-free perplexity-style document quality scoring: "
    "a corpus unigram model assigns each token the integer surprisal "
    "floor(log2(N / count(word))) — computed as the binary-string "
    "length of the truncated quotient, exact in both engines — and "
    "each document scores the sum over its tokens (normalized to "
    "milli-surprisal per token). High scores = rare-word-heavy docs "
    "(OCR junk, boilerplate-free jargon), low scores = repetitive "
    "text; per-language mean and exact p90 order statistic drive "
    "filter thresholds. This is the integer analogue of the "
    "perplexity filter every LLM data pipeline runs; two shuffles "
    "(vocab groupBy, token-vocab join) and a per-lang window, no "
    "Python UDFs anywhere.",
)
def text_integer_surprisal_scores(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # NOT checkpointed: the explode recomputes cheaper than the token
    # relation materializes (measured 1.41s vs 2.10s at sf1)
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.col("text"), " ")).alias("word"),
    ).where(F.col("word") != "")
    vocab = toks.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("nw")
    )
    tot = vocab.agg(F.sum("nw").cast("long").alias("n"))
    docsc = (
        toks.join(vocab, "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(
                F.length(F.bin(F.expr("n div nw"))) - 1
            ).cast("long").alias("score"),
        )
    )
    wl = Window.partitionBy("lang")
    milli = docsc.select(
        "lang",
        "n_tokens",
        "score",
        F.expr("score * 1000 div n_tokens").alias("doc_milli"),
        F.row_number()
        .over(wl.orderBy(F.expr("score * 1000 div n_tokens"), "doc_id"))
        .alias("rk"),
        F.count(F.lit(1)).over(wl).alias("nd"),
    )
    return (
        milli.groupBy("lang")
        .agg(
            F.max("nd").cast("long").alias("n_docs"),
            F.expr("sum(score) * 1000 div sum(n_tokens)").cast("long")
            .alias("mean_surprisal_milli"),
            F.max(
                F.when(
                    F.col("rk") == F.expr("(9 * nd + 9) div 10"),
                    F.col("doc_milli"),
                )
            ).cast("long").alias("p90_surprisal_milli"),
        )
        .orderBy("lang")
    )


# ------------------------------------------ two-point unicity


@query(
    "privacy_unicity_two_points",
    oracle="""
        WITH ranked AS MATERIALIZED (
            SELECT user_id,
                   event_type || '@' || CAST(EXTRACT(hour FROM ts) AS VARCHAR)
                       AS cell,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ), sigs AS MATERIALIZED (
            SELECT user_id,
                   MAX(CASE WHEN rn = 1 THEN cell END) AS sig1,
                   MAX(CASE WHEN rn = 1 THEN cell END) || '|'
                       || MAX(CASE WHEN rn = 2 THEN cell END) AS sig2
            FROM ranked WHERE rn <= 2
            GROUP BY user_id
            HAVING COUNT(*) = 2
        ), u1 AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS uniq FROM (
                SELECT sig1 FROM sigs GROUP BY sig1 HAVING COUNT(*) = 1
            )
        ), u2 AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS uniq FROM (
                SELECT sig2 FROM sigs GROUP BY sig2 HAVING COUNT(*) = 1
            )
        ), nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sigs)
        SELECT nu.n AS n_users,
               u1.uniq AS unique_one_point,
               CAST(u1.uniq * 1000 // nu.n AS BIGINT) AS unicity1_permille,
               u2.uniq AS unique_two_points,
               CAST(u2.uniq * 1000 // nu.n AS BIGINT) AS unicity2_permille
        FROM nu CROSS JOIN u1 CROSS JOIN u2
    """,
    description="Unicity re-identification risk (de Montjoye-style): "
    "how many users are UNIQUELY identified by just their first one "
    "or two (event-type, hour-of-day) cells? A user whose coarse "
    "two-point trace is unique is re-identifiable from any auxiliary "
    "dataset containing those two observations — the empirical "
    "counterpart to k-anonymity's worst-case guarantee "
    "(cf. privacy_k_anonymity_audit, which audits equivalence-class "
    "sizes; unicity audits trace uniqueness). One user-partitioned "
    "ranking window + two signature group-bys; every stage keys on "
    "user_id or the bounded signature space, shuffle-clean at any SF.",
)
def privacy_unicity_two_points(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ranked = events.select(
        "user_id",
        F.concat(
            F.col("event_type"),
            F.lit("@"),
            F.hour("ts").cast("string"),
        ).alias("cell"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    ).where(F.col("rn") <= 2)
    sigs = (
        ranked.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("cell"))).alias("sig1"),
            F.concat(
                F.max(F.when(F.col("rn") == 1, F.col("cell"))),
                F.lit("|"),
                F.max(F.when(F.col("rn") == 2, F.col("cell"))),
            ).alias("sig2"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .where(F.col("cnt") == 2)
        .localCheckpoint(eager=False)
    )
    u1 = (
        sigs.groupBy("sig1")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") == 1)
        .agg(F.count(F.lit(1)).cast("long").alias("uniq1"))
    )
    u2 = (
        sigs.groupBy("sig2")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") == 1)
        .agg(F.count(F.lit(1)).cast("long").alias("uniq2"))
    )
    nu = sigs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        nu.crossJoin(F.broadcast(u1))
        .crossJoin(F.broadcast(u2))
        .select(
            F.col("n").alias("n_users"),
            F.col("uniq1").alias("unique_one_point"),
            F.expr("uniq1 * 1000 div n").cast("long")
            .alias("unicity1_permille"),
            F.col("uniq2").alias("unique_two_points"),
            F.expr("uniq2 * 1000 div n").cast("long")
            .alias("unicity2_permille"),
        )
    )


# ------------------------------------------ WAND pruning economics

_WAND_TERMS = 10
_WAND_K = 10
# fixed query panel: 1-based indices into the frequency-ranked term panel
_WAND_QUERIES = (
    (1, (1, 2, 3)),
    (2, (4, 5, 6)),
    (3, (7, 8, 9)),
    (4, (1, 5, 9)),
    (5, (2, 6, 10)),
)


def _wand_query_sql() -> str:
    rows = ", ".join(
        f"({qid}, {a}), ({qid}, {b}), ({qid}, {c})"
        for qid, (a, b, c) in _WAND_QUERIES
    )
    return f"(VALUES {rows}) qt(qid, tp)"


@query(
    "search_wand_pruning_economics",
    oracle=f"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id, t.word
            FROM (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ), UNNEST(ws) AS t(word)
            WHERE LENGTH(t.word) >= 4
        ), panel AS MATERIALIZED (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS p
            FROM toks GROUP BY word
            ORDER BY cnt DESC, word LIMIT {_WAND_TERMS}
        ), postings AS MATERIALIZED (
            SELECT t.doc_id, pl.p, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks t JOIN panel pl ON pl.word = t.word
            GROUP BY 1, 2
        ), maxtf AS MATERIALIZED (
            SELECT p, CAST(MAX(tf) AS BIGINT) AS mtf FROM postings GROUP BY p
        ), qterms AS (SELECT qid, tp FROM {_wand_query_sql()}),
        scored AS MATERIALIZED (
            SELECT q.qid, po.doc_id,
                   CAST(SUM(po.tf) AS BIGINT) AS score,
                   CAST(SUM(m.mtf) AS BIGINT) AS ub
            FROM qterms q
            JOIN postings po ON po.p = q.tp
            JOIN maxtf m ON m.p = q.tp
            GROUP BY 1, 2
        ), theta AS MATERIALIZED (
            SELECT qid, score AS th FROM (
                SELECT qid, score, ROW_NUMBER() OVER (
                    PARTITION BY qid ORDER BY score DESC, doc_id) AS rk
                FROM scored
            ) WHERE rk = {_WAND_K}
        )
        SELECT CAST(s.qid AS BIGINT) AS query_id, t.th AS theta,
               CAST(COUNT(*) AS BIGINT) AS n_candidates,
               CAST(SUM(CASE WHEN s.ub < t.th THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_prunable,
               CAST(SUM(CASE WHEN s.ub < t.th THEN 1 ELSE 0 END) * 1000
                    // COUNT(*) AS BIGINT) AS prunable_permille
        FROM scored s JOIN theta t ON t.qid = s.qid
        GROUP BY 1, 2 ORDER BY query_id
    """,
    description="WAND top-k pruning economics on a real inverted "
    f"index: the {_WAND_TERMS} most frequent >=4-char words form the "
    "term panel, five fixed 3-term queries score documents by summed "
    "term frequency, and theta is the exact k-th best score "
    f"(k={_WAND_K}). A candidate document whose WAND upper bound — "
    "the sum of the PER-TERM maximum tf over the query terms it "
    "contains — falls below theta can be skipped without scoring; "
    "since ub >= score always, pruning is provably lossless, and the "
    "reported prunable permille is exactly the work a WAND/MaxScore "
    "engine saves over exhaustive DAAT evaluation. Postings build is "
    "one explode + two shuffles; the query panel is constant.",
)
def search_wand_pruning_economics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # NOT checkpointed (same tradeoff as the surprisal/MATTR token
    # relations: explode recompute < materialization)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).where(F.length("word") >= 4)
    panel = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(_WAND_TERMS)
        .select(
            "word",
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), "word"))
            .alias("p"),
        )
        .localCheckpoint(eager=False)
    )
    postings = (
        toks.join(F.broadcast(panel), "word")
        .groupBy("doc_id", "p")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    maxtf = postings.groupBy("p").agg(F.max("tf").cast("long").alias("mtf"))
    qrows = [
        (qid, tp) for qid, terms in _WAND_QUERIES for tp in terms
    ]
    qterms = spark.createDataFrame(qrows, "qid int, tp int")
    # Broadcast the CONSTANT panels (15-row qterms, <=_WAND_TERMS-row
    # maxtf) and keep the corpus-scale postings relation distributed —
    # the build side must never be the relation that grows with SF.
    scored = (
        postings.select(F.col("p").alias("pp"), "doc_id", "tf")
        .join(F.broadcast(qterms), F.col("pp") == F.col("tp"))
        .join(
            F.broadcast(
                maxtf.select(F.col("p").alias("mp"), "mtf")
            ),
            F.col("mp") == F.col("tp"),
        )
        .groupBy("qid", "doc_id")
        .agg(
            F.sum("tf").cast("long").alias("score"),
            F.sum("mtf").cast("long").alias("ub"),
        )
        .localCheckpoint(eager=False)
    )
    theta = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("score"), "doc_id")
            ),
        )
        .where(F.col("rk") == _WAND_K)
        .select(F.col("qid").alias("tq"), F.col("score").alias("th"))
    )
    return (
        scored.join(F.broadcast(theta), F.col("tq") == F.col("qid"))
        .groupBy(F.col("qid").cast("long").alias("query_id"), F.col("th").alias("theta"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(F.when(F.col("ub") < F.col("th"), 1).otherwise(0))
            .cast("long").alias("n_prunable"),
            F.expr(
                "sum(case when ub < th then 1 else 0 end) * 1000"
                " div count(*)"
            ).cast("long").alias("prunable_permille"),
        )
        .orderBy("query_id")
    )


# ------------------------------------------ MATTR lexical diversity

_MATTR_W = 50


@query(
    "text_mattr_lexical_diversity",
    oracle=f"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id, lang, t.pos, t.word
            FROM (
                SELECT doc_id, lang, string_split(text, ' ') AS ws
                FROM documents
            ), UNNEST(list_transform(range(len(ws)),
                      i -> {{'pos': i, 'word': ws[i + 1]}})) AS u(t)
            WHERE t.word <> ''
        ), wins AS MATERIALIZED (
            SELECT doc_id, lang, pos // {_MATTR_W} AS win,
                   CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(COUNT(DISTINCT word) AS BIGINT) AS dw
            FROM toks GROUP BY 1, 2, 3
        ), full_wins AS (
            SELECT lang, dw * 1000 // {_MATTR_W} AS ttr_permille
            FROM wins WHERE cnt = {_MATTR_W}
        ), per_lang AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_windows,
                   CAST(SUM(ttr_permille) // COUNT(*) AS BIGINT)
                       AS mattr_permille
            FROM full_wins GROUP BY lang
        ), gttr AS (
            SELECT lang,
                   CAST(COUNT(DISTINCT word) * 1000000 // COUNT(*)
                        AS BIGINT) AS global_ttr_permicro
            FROM toks GROUP BY lang
        )
        SELECT p.lang, p.n_windows, p.mattr_permille, g.global_ttr_permicro
        FROM per_lang p JOIN gttr g ON g.lang = p.lang
        ORDER BY p.lang
    """,
    description="Moving-average type-token ratio (MATTR, tumbling "
    f"variant, window={_MATTR_W} tokens): per-language mean TTR over "
    "complete fixed-size token windows versus the naive whole-corpus "
    "TTR. Global TTR shrinks mechanically with corpus size (Heaps' "
    "law), so cross-language or cross-snapshot diversity comparisons "
    "on raw TTR are artifacts; windowed TTR is length-invariant and "
    "is the number a data-quality dashboard should trend. Positions "
    "via posexplode, window census via one (doc, window) groupBy with "
    "a distinct count, everything integer permille/permicro.",
)
def text_mattr_lexical_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # NOT checkpointed: re-running the pushed-down scan + explode for
    # the second consumer is ~1.4x faster at sf1 than materializing the
    # ~30M-row token relation (measured; SCALE.md round-8 notes)
    toks = docs.select(
        "doc_id",
        "lang",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"),
    ).where(F.col("word") != "")
    wins = toks.groupBy(
        "doc_id", "lang", F.expr(f"pos div {_MATTR_W}").alias("win")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.countDistinct("word").cast("long").alias("dw"),
    )
    full_wins = wins.where(F.col("cnt") == _MATTR_W).select(
        "lang", F.expr(f"dw * 1000 div {_MATTR_W}").alias("ttr_permille")
    )
    per_lang = full_wins.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.expr("sum(ttr_permille) div count(*)").cast("long")
        .alias("mattr_permille"),
    )
    glob = toks.groupBy("lang").agg(
        F.expr("count(distinct word) * 1000000 div count(*)").cast("long")
        .alias("global_ttr_permicro")
    )
    return per_lang.join(glob, "lang").select(
        "lang", "n_windows", "mattr_permille", "global_ttr_permicro"
    ).orderBy("lang")
