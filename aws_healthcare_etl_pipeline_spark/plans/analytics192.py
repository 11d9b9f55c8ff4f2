"""Wave-213 (round 9, part 1): corpus drift, scheduling, storage
economics, exact distribution distance, skyline, interval coverage,
and forecast-quality operators.

Shared scale discipline ([EXT] per SURVEY.md §2.8 — none of these
exist in the reference, whose only query is README.md:98-101): the
fact-scale work is one or two pushed-down scans + keyed shuffles;
panels (vocab, job lists, monthly spines) are dimension-bounded and
reduced before any quadratic step; windows partition on high-
cardinality keys (custkey, partkey, block id) so no operator funnels
a growing relation into one task. Floating-point results follow the
registry convention: exact DECIMAL accumulation, double only for the
final deterministic division/sqrt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.tables import load_table
from .registry import dec, query

# ------------------------------------------ chi-square source drift

_CHI2_VOCAB = 40


@query(
    "text_source_divergence_chi2",
    oracle=f"""
        WITH toks AS (
            SELECT source, t.word
            FROM (
                SELECT source,
                       regexp_split_to_array(trim(text), '\\s+') AS ws
                FROM documents
            ), UNNEST(ws) AS t(word)
            WHERE t.word <> ''
        ), counts AS MATERIALIZED (
            SELECT word, source, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks GROUP BY 1, 2
        ), vocab AS MATERIALIZED (
            SELECT word FROM (
                SELECT word, SUM(c) AS tot FROM counts GROUP BY 1
                ORDER BY tot DESC, word LIMIT {_CHI2_VOCAB}
            )
        ), totals AS (
            SELECT source, CAST(SUM(c) AS BIGINT) AS t
            FROM counts JOIN vocab USING (word) GROUP BY 1
        ), grid AS (
            SELECT v.word, s.source, s.t,
                   COALESCE(c.c, 0) AS c
            FROM vocab v CROSS JOIN totals s
            LEFT JOIN counts c ON c.word = v.word AND c.source = s.source
        )
        SELECT a.source AS source_a, b.source AS source_b,
               a.t AS tokens_a, b.t AS tokens_b,
               CAST(SUM(CAST(floor(
                   CASE WHEN a.c = 0 AND b.c = 0 THEN 0.0
                        ELSE (a.c / CAST(a.t AS DOUBLE)
                              - b.c / CAST(b.t AS DOUBLE))
                             * (a.c / CAST(a.t AS DOUBLE)
                                - b.c / CAST(b.t AS DOUBLE))
                             / (a.c / CAST(a.t AS DOUBLE)
                                + b.c / CAST(b.t AS DOUBLE))
                   END * 1e12) AS BIGINT)) AS BIGINT) AS chi2_p12
        FROM grid a JOIN grid b
          ON a.word = b.word AND a.source < b.source
        GROUP BY 1, 2, 3, 4
        ORDER BY source_a, source_b
    """,
    description="Pairwise chi-square divergence between per-source "
    f"unigram distributions over the global top-{_CHI2_VOCAB} vocab "
    "(count-desc, word tie-break): the training-mix drift monitor that "
    "flags when one source's token distribution walks away from the "
    "rest. Log-free by design — the chi-square form is rational, so "
    "per-term doubles are bit-identical across engines; each term is "
    "floor-quantized to an integer at 1e-12 (floor of a double is "
    "unambiguous, unlike decimal-cast rounding modes) so the sum is "
    "exact and order-insensitive. Scale: "
    "two fact-scale shuffles (token counts, then vocab join); the "
    "20x20 source grid and 190-pair comparison are dimension-bounded.",
)
def text_source_divergence_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("word")
    ).where(F.col("word") != "")
    counts = toks.groupBy("word", "source").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    vocab = (
        counts.groupBy("word")
        .agg(F.sum("c").alias("tot"))
        .orderBy(F.desc("tot"), "word")
        .limit(_CHI2_VOCAB)
        .select("word")
    )
    totals = (
        counts.join(F.broadcast(vocab), "word")
        .groupBy("source")
        .agg(F.sum("c").cast("long").alias("t"))
    )
    grid = (
        vocab.crossJoin(F.broadcast(totals))
        .join(counts, ["word", "source"], "left")
        .select("word", "source", "t", F.coalesce("c", F.lit(0)).alias("c"))
        # bounded at vocab x sources (~800 rows) but fed by the
        # fact-scale token-count pipeline: materialize once so the
        # a/b self-join below doesn't recompute counts on both sides
        .localCheckpoint(eager=False)
    )
    a, b = grid.alias("a"), grid.alias("b")
    pa = F.col("a.c") / F.col("a.t").cast("double")
    pb = F.col("b.c") / F.col("b.t").cast("double")
    term = F.floor(
        F.when((F.col("a.c") == 0) & (F.col("b.c") == 0), F.lit(0.0))
        .otherwise((pa - pb) * (pa - pb) / (pa + pb))
        * F.lit(1e12)
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.t").alias("tokens_a"),
            F.col("b.t").alias("tokens_b"),
        )
        .agg(F.sum(term).cast("long").alias("chi2_p12"))
        .orderBy("source_a", "source_b")
    )


# --------------------------------- Johnson two-machine flow shop

_JOHNSON_JOBS = 20


@query(
    "sched_johnson_two_machine_makespan",
    oracle=f"""
        WITH jobs AS MATERIALIZED (
            SELECT l_suppkey,
                   CAST(SUM(l_quantity) AS BIGINT) AS m1,
                   CAST(COUNT(*) * 7 AS BIGINT) AS m2
            FROM lineitem GROUP BY 1
            ORDER BY m1 + m2 DESC, l_suppkey LIMIT {_JOHNSON_JOBS}
        ), seq AS (
            SELECT l_suppkey, m1, m2,
                   ROW_NUMBER() OVER (
                       ORDER BY CASE WHEN m1 < m2 THEN 0 ELSE 1 END,
                                CASE WHEN m1 < m2 THEN m1 ELSE -m2 END,
                                l_suppkey) AS pos
            FROM jobs
        ), pref AS (
            SELECT l_suppkey, m1, m2, pos,
                   SUM(m1) OVER (ORDER BY pos) AS c1,
                   SUM(m2) OVER (ORDER BY pos) AS s2,
                   SUM(m2) OVER (ORDER BY pos) - m2 AS s2_prev
            FROM seq
        )
        SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
               CAST(pos AS BIGINT) AS pos, m1, m2,
               CAST(c1 AS BIGINT) AS c1,
               CAST(s2 + MAX(c1 - s2_prev) OVER (ORDER BY pos)
                    AS BIGINT) AS c2
        FROM pref
        ORDER BY pos
    """,
    description="Johnson's rule for the 2-machine flow shop: the "
    f"{_JOHNSON_JOBS} busiest suppliers become jobs with machine times "
    "(total quantity, 7x line count); jobs with m1<m2 run first sorted "
    "by m1 asc, the rest sorted by m2 desc — the provably "
    "makespan-optimal order. The completion-time recurrence C2_j = "
    "max(C2_{j-1}, C1_j) + m2_j is replayed WITHOUT a sequential loop "
    "via the identity C2_j = S2_j + max_{i<=j}(C1_i - S2_{i-1}) — two "
    "running aggregates over the bounded job spine. Scale: one "
    "fact-scale group-by feeds a constant-size panel; integers "
    "throughout.",
)
def sched_johnson_two_machine_makespan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    jobs = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum("l_quantity").cast("long").alias("m1"),
            (F.count(F.lit(1)) * 7).cast("long").alias("m2"),
        )
        .orderBy(F.desc(F.col("m1") + F.col("m2")), "l_suppkey")
        .limit(_JOHNSON_JOBS)
    )
    seq = jobs.withColumn(
        "pos",
        F.row_number().over(
            Window.orderBy(
                F.when(F.col("m1") < F.col("m2"), 0).otherwise(1),
                F.when(F.col("m1") < F.col("m2"), F.col("m1")).otherwise(
                    -F.col("m2")
                ),
                "l_suppkey",
            )
        ),
    )
    w = Window.orderBy("pos")
    pref = seq.select(
        "l_suppkey",
        "m1",
        "m2",
        "pos",
        F.sum("m1").over(w).alias("c1"),
        F.sum("m2").over(w).alias("s2"),
        (F.sum("m2").over(w) - F.col("m2")).alias("s2_prev"),
    )
    return pref.select(
        F.col("l_suppkey").cast("long").alias("suppkey"),
        F.col("pos").cast("long").alias("pos"),
        "m1",
        "m2",
        F.col("c1").cast("long").alias("c1"),
        (F.col("s2") + F.max(F.col("c1") - F.col("s2_prev")).over(w))
        .cast("long")
        .alias("c2"),
    ).orderBy("pos")


# --------------------------- frame-of-reference bitpacking economics

_FOR_BLOCK = 512  # orderkeys per block


@query(
    "storage_for_bitpacking_economics",
    oracle=f"""
        WITH blocks AS MATERIALIZED (
            SELECT l_orderkey // {_FOR_BLOCK} AS blk,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MAX(l_partkey) - MIN(l_partkey) AS BIGINT)
                       AS d_part,
                   CAST(MAX(l_suppkey) - MIN(l_suppkey) AS BIGINT)
                       AS d_supp,
                   CAST(MAX(l_quantity) - MIN(l_quantity) AS BIGINT)
                       AS d_qty
            FROM lineitem GROUP BY 1
        ), per_col AS (
            SELECT 'l_partkey' AS col, n,
                   CASE WHEN d_part = 0 THEN 0
                        ELSE length(bin(d_part)) END AS bits
            FROM blocks
            UNION ALL
            SELECT 'l_suppkey', n,
                   CASE WHEN d_supp = 0 THEN 0
                        ELSE length(bin(d_supp)) END
            FROM blocks
            UNION ALL
            SELECT 'l_quantity', n,
                   CASE WHEN d_qty = 0 THEN 0
                        ELSE length(bin(d_qty)) END
            FROM blocks
        )
        SELECT col,
               CAST(COUNT(*) AS BIGINT) AS n_blocks,
               CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(SUM(n) * 8 AS BIGINT) AS raw_bytes,
               CAST(SUM((bits * n + 7) // 8 + 8) AS BIGINT) AS packed_bytes,
               CAST(SUM((bits * n + 7) // 8 + 8) * 1000
                    // (SUM(n) * 8) AS BIGINT) AS ratio_permille
        FROM per_col
        GROUP BY col
        ORDER BY col
    """,
    description="Frame-of-reference bitpacking cost model: lineitem is "
    f"blocked by l_orderkey div {_FOR_BLOCK} (data-correlated physical "
    "blocks — no global sort, fully distributed), and per block each "
    "column needs ceil(log2(range+1)) bits per value (computed "
    "integer-exactly as length(bin(delta)), zero for constant blocks) "
    "plus an 8-byte base reference. Reports packed vs 8-byte-raw bytes "
    "per column — the FOR/PFOR storage decision every columnar format "
    "makes per row group. Scale: one group-by on a derived block key; "
    "the per-column stacking happens on the bounded block relation.",
)
def storage_for_bitpacking_economics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    blocks = li.groupBy(
        F.expr(f"l_orderkey div {_FOR_BLOCK}").alias("blk")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.max("l_partkey") - F.min("l_partkey")).cast("long").alias("d_part"),
        (F.max("l_suppkey") - F.min("l_suppkey")).cast("long").alias("d_supp"),
        (F.max("l_quantity") - F.min("l_quantity")).cast("long").alias("d_qty"),
    )

    def bits(d):
        return F.when(F.col(d) == 0, F.lit(0)).otherwise(
            F.length(F.bin(F.col(d)))
        )

    per_col = blocks.select(
        "n",
        F.explode(
            F.array(
                F.struct(
                    F.lit("l_partkey").alias("col"),
                    bits("d_part").alias("bits"),
                ),
                F.struct(
                    F.lit("l_suppkey").alias("col"),
                    bits("d_supp").alias("bits"),
                ),
                F.struct(
                    F.lit("l_quantity").alias("col"),
                    bits("d_qty").alias("bits"),
                ),
            )
        ).alias("e"),
    ).select("n", F.col("e.col").alias("col"), F.col("e.bits").alias("bits"))
    return (
        per_col.groupBy("col")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum("n").cast("long").alias("n_rows"),
            (F.sum("n") * 8).cast("long").alias("raw_bytes"),
            F.sum(
                F.expr("(bits * n + 7) div 8 + 8")
            ).cast("long").alias("packed_bytes"),
        )
        .withColumn(
            "ratio_permille",
            F.expr("packed_bytes * 1000 div raw_bytes").cast("long"),
        )
        .orderBy("col")
    )


# ------------------------------------ exact 1-D Wasserstein distance


@query(
    "stat_wasserstein_1d_exact",
    oracle="""
        WITH pts AS (
            SELECT CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v,
                   l_returnflag AS f
            FROM lineitem WHERE l_returnflag IN ('R', 'A')
        ), vals AS MATERIALIZED (
            SELECT v,
                   CAST(COUNT(*) FILTER (WHERE f = 'R') AS BIGINT) AS cr,
                   CAST(COUNT(*) FILTER (WHERE f = 'A') AS BIGINT) AS ca
            FROM pts GROUP BY v
        ), tot AS (
            SELECT CAST(SUM(cr) AS BIGINT) AS nr,
                   CAST(SUM(ca) AS BIGINT) AS na FROM vals
        ), steps AS (
            SELECT v,
                   SUM(cr) OVER (ORDER BY v) AS cum_r,
                   SUM(ca) OVER (ORDER BY v) AS cum_a,
                   LEAD(v) OVER (ORDER BY v) - v AS gap
            FROM vals
        )
        SELECT nr, na,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(SUM(CAST(FLOOR(
                   abs(cum_r / CAST(nr AS DOUBLE)
                       - cum_a / CAST(na AS DOUBLE))
                   * CAST(gap AS DOUBLE) * 1e10) AS BIGINT)
               ) AS DOUBLE) / 1e10 AS w1_cents
        FROM steps CROSS JOIN tot
        WHERE gap IS NOT NULL
        GROUP BY nr, na
    """,
    description="Exact 1-D Wasserstein (earth mover's) distance "
    "between the extended-price distributions of returned (R) vs "
    "accepted (A) lineitems: W1 = integral |F_R - F_A| dv over the "
    "cents domain, computed as the sorted-merge sum of |ECDF gap| x "
    "value step. Per-step doubles are identical-operand-identical-"
    "order IEEE ops; each term is floor-quantized to an integer at "
    "1e-10 resolution (the chi2/ERR pattern — never round doubles "
    "through decimal casts cross-engine) so the sum is "
    "order-insensitive. Scale: one group-by on cents value, then a "
    "window over the DOMAIN-bounded value relation (price domain "
    "saturates — the bounded-spine window pattern).",
)
def stat_wasserstein_1d_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "A")
    )
    vals = (
        li.select(
            (dec("l_extendedprice") * 100).cast("long").alias("v"),
            "l_returnflag",
        )
        .groupBy("v")
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).cast("long").alias("cr"),
            F.sum(
                F.when(F.col("l_returnflag") == "A", 1).otherwise(0)
            ).cast("long").alias("ca"),
        )
    )
    tot = vals.agg(
        F.sum("cr").cast("long").alias("nr"),
        F.sum("ca").cast("long").alias("na"),
    )
    w = Window.orderBy("v")
    steps = (
        vals.select(
            "v",
            F.sum("cr").over(w).alias("cum_r"),
            F.sum("ca").over(w).alias("cum_a"),
            (F.lead("v").over(w) - F.col("v")).alias("gap"),
        )
        .where(F.col("gap").isNotNull())
        .crossJoin(F.broadcast(tot))
    )
    term = F.floor(
        F.abs(
            F.col("cum_r") / F.col("nr").cast("double")
            - F.col("cum_a") / F.col("na").cast("double")
        )
        * F.col("gap").cast("double")
        * F.lit(1e10)
    ).cast("long")
    return steps.groupBy(
        F.col("nr").cast("long").alias("nr"),
        F.col("na").cast("long").alias("na"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        (F.sum(term).cast("double") / F.lit(1e10)).alias("w1_cents"),
    )


# ---------------------------------------- skyline (Pareto frontier)


@query(
    "sql_skyline_pareto_frontier",
    oracle="""
        WITH pts AS MATERIALIZED (
            SELECT l_suppkey,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS revenue_cents,
                   CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
            FROM lineitem GROUP BY 1
        )
        SELECT CAST(a.l_suppkey AS BIGINT) AS suppkey,
               a.revenue_cents, a.n_parts
        FROM pts a
        WHERE NOT EXISTS (
            SELECT 1 FROM pts b
            WHERE b.revenue_cents >= a.revenue_cents
              AND b.n_parts >= a.n_parts
              AND (b.revenue_cents > a.revenue_cents
                   OR b.n_parts > a.n_parts)
        )
        ORDER BY revenue_cents DESC, suppkey
    """,
    description="Skyline / Pareto frontier of suppliers on (revenue, "
    "distinct parts), both maximized: a supplier survives iff no other "
    "weakly dominates it with at least one strict improvement. The "
    "oracle uses the quadratic NOT-EXISTS definition; the Spark plan "
    "uses an independent LINEAR formulation — reduce to max(n_parts) "
    "per distinct revenue, take an incremental ROWS-frame running max "
    "down the revenue order (= best n_parts among strictly higher "
    "revenues), and join back: dominated iff that running max >= own "
    "n_parts, or the same-revenue max > own. The running max is "
    "two-staged so no growing relation funnels into one task: a "
    "bucket-partitioned ROWS window plus a single-task carry window "
    "over the ~1000x-smaller bucket spine. Exact agreement (ties "
    "included) is the test. A RANGE frame with a moving bound was the "
    "first cut and measured O(n^2) (sf1->sf3 exp 1.36 — Spark "
    "re-aggregates a shrinking RANGE frame per row); the ROWS-frame "
    "running max is computed incrementally, restoring linearity. "
    "No self-join anywhere on the Spark side.",
)
def sql_skyline_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_extendedprice") * 100).cast("long").alias("revenue_cents"),
        F.count_distinct("l_partkey").cast("long").alias("n_parts"),
    )
    by_rev = pts.groupBy("revenue_cents").agg(
        F.max("n_parts").alias("y_at_rev")
    )
    # Two-stage running max so no growing relation funnels into one
    # task: stage 1 runs the ROWS-frame running max PARTITIONED by a
    # coarse revenue bucket (parallel, incremental); stage 2 computes
    # the carry-in from strictly-higher buckets on the bucket spine —
    # one row per bucket (domain/1e7 rows), the only single-task
    # window, ~1000x smaller than the distinct-revenue relation.
    _BUCKET = 10_000_000  # $100k of revenue per bucket
    by_rev = by_rev.withColumn(
        "bkt", F.floor(F.col("revenue_cents") / F.lit(_BUCKET))
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy(F.desc("revenue_cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lvl1 = by_rev.withColumn("y_in", F.max("y_at_rev").over(w_in))
    spine = by_rev.groupBy("bkt").agg(F.max("y_at_rev").alias("b_max"))
    w_b = Window.orderBy(F.desc("bkt")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    spine = spine.withColumn("carry", F.max("b_max").over(w_b)).select(
        "bkt", "carry"
    )
    lvl = lvl1.join(spine, "bkt").withColumn(
        "y_above", F.greatest(F.coalesce("y_in", F.lit(-1)),
                              F.coalesce("carry", F.lit(-1)))
    )
    dominated = (F.col("y_above") >= F.col("n_parts")) | (
        F.col("y_at_rev") > F.col("n_parts")
    )
    return (
        pts.join(lvl, "revenue_cents")
        .withColumn("_dom", dominated)
        .where(~F.col("_dom"))
        .select(
            F.col("l_suppkey").cast("long").alias("suppkey"),
            "revenue_cents",
            "n_parts",
        )
        .orderBy(F.desc("revenue_cents"), "suppkey")
    )


# ------------------------------------------ interval union coverage


@query(
    "interval_union_coverage",
    oracle="""
        WITH iv AS (
            SELECT o_custkey,
                   date_diff('day', DATE '1992-01-01', o_orderdate) AS s,
                   date_diff('day', DATE '1992-01-01', o_orderdate)
                       + 1 + o_orderkey % 14 AS e,
                   o_orderkey
            FROM orders
        ), flagged AS (
            SELECT o_custkey, s, e, o_orderkey,
                   CASE WHEN MAX(e) OVER (
                            PARTITION BY o_custkey ORDER BY s, e DESC,
                            o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) >= s
                        THEN 0 ELSE 1 END AS is_new
            FROM iv
        ), islands AS (
            SELECT o_custkey, s, e,
                   SUM(is_new) OVER (
                       PARTITION BY o_custkey ORDER BY s, e DESC,
                       o_orderkey
                       ROWS UNBOUNDED PRECEDING) AS island
            FROM flagged
        ), per_island AS (
            SELECT o_custkey, island,
                   CAST(COUNT(*) AS BIGINT) AS n_iv,
                   MAX(e) - MIN(s) AS covered
            FROM islands GROUP BY 1, 2
        )
        SELECT c_mktsegment,
               CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(covered) AS BIGINT) AS covered_days,
               CAST(MAX(covered) AS BIGINT) AS max_island_days
        FROM per_island
        JOIN customer ON c_custkey = o_custkey
        GROUP BY 1 ORDER BY 1
    """,
    description="Interval-union coverage (merge overlapping intervals "
    "-> islands): each order opens a validity interval [orderdate, "
    "orderdate + 1 + orderkey%14 days); per customer, touching or "
    "overlapping intervals merge via the classic running-max-end "
    "sweep (new island iff start exceeds the max end of all earlier "
    "intervals), then island spans roll up per market segment. Scale: "
    "the sweep windows partition on o_custkey (millions of small "
    "partitions — never a global sort), and the segment rollup is one "
    "keyed join + group-by. Integer epoch-day arithmetic throughout.",
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    iv = orders.select(
        "o_custkey",
        F.datediff("o_orderdate", F.lit("1992-01-01")).alias("s"),
        (
            F.datediff("o_orderdate", F.lit("1992-01-01"))
            + 1
            + F.col("o_orderkey") % 14
        ).alias("e"),
        "o_orderkey",
    )
    order_w = (
        Window.partitionBy("o_custkey")
        .orderBy("s", F.desc("e"), "o_orderkey")
    )
    prev_max = (
        F.max("e")
        .over(order_w.rowsBetween(Window.unboundedPreceding, -1))
    )
    flagged = iv.withColumn(
        "is_new",
        F.when(prev_max >= F.col("s"), 0).otherwise(1),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("is_new").over(
            Window.partitionBy("o_custkey")
            .orderBy("s", F.desc("e"), "o_orderkey")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_island = islands.groupBy("o_custkey", "island").agg(
        F.count(F.lit(1)).cast("long").alias("n_iv"),
        (F.max("e") - F.min("s")).alias("covered"),
    )
    return (
        per_island.join(
            cust.select("c_custkey", "c_mktsegment"),
            per_island.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_iv").cast("long").alias("n_intervals"),
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.sum("covered").cast("long").alias("covered_days"),
            F.max("covered").cast("long").alias("max_island_days"),
        )
        .orderBy("c_mktsegment")
    )


# ------------------------------------------- Theil's U forecast eval


@query(
    "stats_theil_u_forecast_eval",
    oracle="""
        WITH monthly AS MATERIALIZED (
            SELECT date_trunc('month', l_shipdate) AS m,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS rev
            FROM lineitem GROUP BY 1
        ), fc AS (
            SELECT m, rev,
                   LAG(rev) OVER (ORDER BY m) AS f
            FROM monthly
        )
        SELECT CAST(EXTRACT(year FROM m) AS BIGINT) AS yr,
               CAST(COUNT(*) AS BIGINT) AS n_months,
               CAST(SUM(abs(rev - f)) AS BIGINT) AS mae_cents,
               sqrt(CAST(SUM(CAST(rev - f AS DECIMAL(19,0))
                             * CAST(rev - f AS DECIMAL(19,0))) AS DOUBLE))
               / (sqrt(CAST(SUM(CAST(f AS DECIMAL(19,0))
                                 * CAST(f AS DECIMAL(19,0))) AS DOUBLE))
                  + sqrt(CAST(SUM(CAST(rev AS DECIMAL(19,0))
                                   * CAST(rev AS DECIMAL(19,0))) AS DOUBLE)))
               AS theil_u1
        FROM fc WHERE f IS NOT NULL
        GROUP BY 1 ORDER BY yr
    """,
    description="Theil's U1 forecast-quality statistic for the naive "
    "persistence forecast (next month = this month) on monthly revenue "
    "cents: U1 = sqrt(sum((a-f)^2)) / (sqrt(sum(f^2)) + "
    "sqrt(sum(a^2))) per year. Squares of ~1e10-cent months overflow "
    "int64, so squares multiply DECIMAL(19,0) operands (product fits "
    "both engines' 38-digit cap) and accumulate exactly; only the "
    "final sqrt/divide run in double (IEEE "
    "sqrt is correctly rounded, so cross-engine identical). Scale: "
    "one fact group-by to the bounded monthly spine; everything after "
    "is constant-size.",
)
def stats_theil_u_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(F.sum(dec("l_extendedprice") * 100).cast("long").alias("rev"))
    fc = monthly.select(
        "m", "rev", F.lag("rev").over(Window.orderBy("m")).alias("f")
    ).where(F.col("f").isNotNull())
    d19 = "decimal(19,0)"
    diff = (F.col("rev") - F.col("f")).cast(d19)
    return (
        fc.groupBy(F.year("m").cast("long").alias("yr"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_months"),
            F.sum(F.abs(F.col("rev") - F.col("f"))).cast("long").alias(
                "mae_cents"
            ),
            (
                F.sqrt(F.sum(diff * diff).cast("double"))
                / (
                    F.sqrt(
                        F.sum(F.col("f").cast(d19) * F.col("f").cast(d19))
                        .cast("double")
                    )
                    + F.sqrt(
                        F.sum(
                            F.col("rev").cast(d19) * F.col("rev").cast(d19)
                        ).cast("double")
                    )
                )
            ).alias("theil_u1"),
        )
        .orderBy("yr")
    )
