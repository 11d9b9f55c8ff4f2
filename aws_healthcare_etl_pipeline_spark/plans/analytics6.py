"""Wave-10 analytics: time-series gap-fill, concentration/statistics
tests, and data-quality auditing.

  timeseries_gapfill_ffill    calendar-spine densification + forward fill
  gini_customer_spend         Gini concentration of spend per segment
  welch_ttest_price_segments  Welch two-sample t-test between segments
  referential_integrity_audit orphan-key audit across the star schema
  table_diff_changelog        CDC-style snapshot diff (insert/update/delete)
  token_diversity_by_lang     Simpson diversity / TTR / hapax per language

Oracle conventions follow plans/registry.py: exact DECIMAL sums cast to
double, rational surrogates instead of transcendentals (Simpson's
1 - sum(p^2) instead of Shannon entropy), sqrt allowed (IEEE
correctly-rounded, engine-portable), and every derived double built
from the same expression tree on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import dec, dsum, query

GAPFILL_PRIORITY = "1-URGENT"
GAPFILL_MIN_PRICE = 300_000.0


@query(
    "timeseries_gapfill_ffill",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE)
                       AS revenue
            FROM orders
            WHERE o_orderpriority = '{GAPFILL_PRIORITY}'
              AND o_totalprice > {GAPFILL_MIN_PRICE}
            GROUP BY 1
        ), bounds AS (
            SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily
        ), spine AS (
            SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                               CAST(hi AS TIMESTAMP),
                                               INTERVAL 1 DAY)) AS DATE)
                       AS day
            FROM bounds
        )
        SELECT CAST(s.day AS VARCHAR) AS day,
               COALESCE(d.n_orders, 0) AS n_orders,
               d.revenue AS revenue,
               last_value(d.revenue IGNORE NULLS) OVER (
                   ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS revenue_ffill,
               d.revenue IS NULL AS is_gap
        FROM spine s LEFT JOIN daily d ON s.day = d.day
        ORDER BY day
    """,
    description="Time-series densification: aggregate sparse daily "
    "revenue, generate the full calendar spine with sequence(), left-"
    "join, and forward-fill gaps with last(ignorenulls) over an "
    "ordered running frame. The spine is date-cardinality (tiny at "
    "any data scale — 100 TB of facts is still ~10^4 days), so the "
    "single-partition ordered window is safe by construction; the "
    "heavy lifting stays in the partial-aggregated daily rollup.",
)
def timeseries_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderpriority") == GAPFILL_PRIORITY)
            & (F.col("o_totalprice") > GAPFILL_MIN_PRICE)
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(daily, "day", "left")
        .select(
            F.col("day").cast("string").alias("day"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            "revenue",
            F.last("revenue", ignorenulls=True).over(w).alias("revenue_ffill"),
            F.col("revenue").isNull().alias("is_gap"),
        )
        .orderBy("day")
    )


@query(
    "gini_customer_spend",
    oracle="""
        WITH spend AS (
            SELECT c_mktsegment, c_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS x
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        ), ranked AS (
            SELECT c_mktsegment, x,
                   row_number() OVER (
                       PARTITION BY c_mktsegment ORDER BY x, c_custkey
                   ) AS i
            FROM spend
        ), stats AS (
            SELECT c_mktsegment,
                   COUNT(*) AS n_customers,
                   CAST(SUM(x) AS DOUBLE) AS total_spend,
                   CAST(SUM(i * x) AS DOUBLE) AS weighted
            FROM ranked GROUP BY 1
        )
        SELECT c_mktsegment, n_customers, total_spend,
               round(2.0 * weighted
                         / (CAST(n_customers AS DOUBLE) * total_spend)
                     - (CAST(n_customers AS DOUBLE) + 1.0)
                         / CAST(n_customers AS DOUBLE),
                     6) AS gini
        FROM stats ORDER BY c_mktsegment
    """,
    description="Gini coefficient of customer spend concentration per "
    "market segment, via the rank formulation G = 2*sum(i*x_i)/(n*sum x)"
    " - (n+1)/n over spend sorted ascending (ties broken by custkey; "
    "sum(i*x) is tie-order invariant since tied x share the same "
    "position set). One aggregation, one per-segment sort window, one "
    "reduce — the rank weights make it a single pass instead of the "
    "O(n^2) pairwise |x_i - x_j| definition. All sums exact DECIMAL; "
    "the final expression is one deterministic double tree.",
)
def gini_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.sum(dec("o_totalprice")).alias("x"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("x", "c_custkey")
    ranked = spend.select("c_mktsegment", "x", F.row_number().over(w).alias("i"))
    n_d = F.col("n_customers").cast("double")
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("x").cast("double").alias("total_spend"),
            F.sum(F.col("i") * F.col("x")).cast("double").alias("weighted"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            "total_spend",
            F.round(
                F.lit(2.0) * F.col("weighted") / (n_d * F.col("total_spend"))
                - (n_d + F.lit(1.0)) / n_d,
                6,
            ).alias("gini"),
        )
        .orderBy("c_mktsegment")
    )


TTEST_SEG_A = "BUILDING"
TTEST_SEG_B = "MACHINERY"


@query(
    "welch_ttest_price_segments",
    oracle=f"""
        WITH j AS (
            SELECT c_mktsegment AS seg,
                   CAST(o_totalprice AS DECIMAL(15,2)) AS x
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment IN ('{TTEST_SEG_A}', '{TTEST_SEG_B}')
        ), s AS (
            SELECT seg,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(x) AS DOUBLE) AS sx,
                   CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx
            FROM j GROUP BY seg
        ), m AS (
            SELECT seg, n, sx / n AS mean,
                   (sxx - sx * sx / n) / (n - 1.0) AS var
            FROM s
        )
        SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
               round(a.mean, 6) AS mean_a, round(b.mean, 6) AS mean_b,
               round(a.var, 4) AS var_a, round(b.var, 4) AS var_b,
               round((a.mean - b.mean)
                     / sqrt(a.var / a.n + b.var / b.n), 6) AS t_stat,
               round((a.var / a.n + b.var / b.n)
                         * (a.var / a.n + b.var / b.n)
                     / ((a.var / a.n) * (a.var / a.n) / (a.n - 1.0)
                        + (b.var / b.n) * (b.var / b.n) / (b.n - 1.0)),
                     4) AS welch_df
        FROM (SELECT * FROM m WHERE seg = '{TTEST_SEG_A}') a
        CROSS JOIN (SELECT * FROM m WHERE seg = '{TTEST_SEG_B}') b
    """,
    description="Welch's unequal-variance two-sample t-test on order "
    "value between two customer segments: one distributed pass builds "
    "exact-DECIMAL (n, sum, sum-of-squares) per segment, the test "
    "statistic's sum-of-squares leaves DECIMAL via VARCHAR so DuckDB "
    "takes the correctly-rounded string->double path (its direct "
    "int128/10^scale cast double-rounds above 2^53 and drifted an ulp "
    "at sf0.1), the "
    "statistic and Welch-Satterthwaite df are a scalar epilogue on the "
    "2-row aggregate. Squares stay in DECIMAL (exact, order-"
    "insensitive); every double op afterwards is IEEE correctly-"
    "rounded (+,-,*,/,sqrt only — no libm transcendentals), so the "
    "value is engine-portable bit-for-bit before the final rounding.",
)
def welch_ttest_price_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    x = dec("o_totalprice")
    stats = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_mktsegment").isin(TTEST_SEG_A, TTEST_SEG_B))
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(x * x).cast("double").alias("sxx"),
        )
        .select(
            "seg",
            "n",
            (F.col("sx") / F.col("n")).alias("mean"),
            (
                (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                / (F.col("n") - F.lit(1.0))
            ).alias("var"),
        )
    )
    a = stats.filter(F.col("seg") == TTEST_SEG_A).select(
        F.col("n").alias("na"), F.col("mean").alias("ma"), F.col("var").alias("va")
    )
    b = stats.filter(F.col("seg") == TTEST_SEG_B).select(
        F.col("n").alias("nb"), F.col("mean").alias("mb"), F.col("var").alias("vb")
    )
    sea = F.col("va") / F.col("na")
    seb = F.col("vb") / F.col("nb")
    return a.crossJoin(b).select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round("ma", 6).alias("mean_a"),
        F.round("mb", 6).alias("mean_b"),
        F.round("va", 4).alias("var_a"),
        F.round("vb", 4).alias("var_b"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(sea + seb), 6).alias("t_stat"),
        F.round(
            (sea + seb) * (sea + seb)
            / (
                sea * sea / (F.col("na") - F.lit(1.0))
                + seb * seb / (F.col("nb") - F.lit(1.0))
            ),
            4,
        ).alias("welch_df"),
    )


# (relationship label, child table, child key, parent table, parent key)
_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
]


@query(
    "referential_integrity_audit",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{label}' AS relationship,
               (SELECT COUNT(*) FROM {child}) AS child_rows,
               (SELECT COUNT(*) FROM {child} c
                LEFT JOIN {parent} p ON c.{ck} = p.{pk}
                WHERE p.{pk} IS NULL) AS orphan_rows,
               (SELECT COUNT(DISTINCT c.{ck}) FROM {child} c
                LEFT JOIN {parent} p ON c.{ck} = p.{pk}
                WHERE p.{pk} IS NULL) AS orphan_keys
        """
        for label, child, ck, parent, pk in _FK_EDGES
    )
    + "\nORDER BY relationship",
    description="Referential-integrity audit across every foreign-key "
    "edge of the star schema: per relationship the child row count, "
    "orphaned child rows (left-anti against the parent key set), and "
    "distinct orphan keys. Each edge is one anti-join that Spark plans "
    "as broadcast (small parents) or shuffled hash; the parent side "
    "projects only its key column, so at 100 TB the probe carries "
    "8-byte keys, not rows. The pre-flight audit a pipeline runs "
    "before trusting joins downstream.",
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for label, child, ck, parent, pk in _FK_EDGES:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(pk)
        orphans = c.join(p, c[ck] == p[pk], "left_anti")
        row = c.agg(F.count(F.lit(1)).alias("child_rows")).crossJoin(
            orphans.agg(
                F.count(F.lit(1)).alias("orphan_rows"),
                F.countDistinct(ck).alias("orphan_keys"),
            )
        ).select(
            F.lit(label).alias("relationship"),
            "child_rows",
            "orphan_rows",
            "orphan_keys",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("relationship")


@query(
    "table_diff_changelog",
    oracle="""
        WITH v_old AS (
            SELECT o_orderkey AS k,
                   CAST(o_totalprice AS DECIMAL(15,2)) AS price
            FROM orders WHERE o_orderkey % 10 != 3
        ), v_new AS (
            SELECT o_orderkey AS k,
                   CASE WHEN o_orderkey % 10 = 5
                        THEN CAST(o_totalprice AS DECIMAL(15,2))
                             + CAST(100.00 AS DECIMAL(15,2))
                        ELSE CAST(o_totalprice AS DECIMAL(15,2)) END AS price
            FROM orders WHERE o_orderkey % 10 != 7
        )
        SELECT CASE WHEN o.k IS NULL THEN 'insert'
                    WHEN n.k IS NULL THEN 'delete'
                    WHEN o.price != n.price THEN 'update'
                    ELSE 'unchanged' END AS change_type,
               COUNT(*) AS n_rows,
               CAST(SUM(COALESCE(n.price, CAST(0 AS DECIMAL(15,2)))
                        - COALESCE(o.price, CAST(0 AS DECIMAL(15,2))))
                    AS DOUBLE) AS net_price_delta
        FROM v_old o FULL OUTER JOIN v_new n ON o.k = n.k
        GROUP BY 1 ORDER BY 1
    """,
    description="CDC-style snapshot diff: two versions of the orders "
    "table (simulated by deterministic key filters + a price bump) "
    "full-outer joined on the primary key and classified into insert/"
    "delete/update/unchanged with the exact net price delta per class. "
    "One shuffled full-outer hash join on the key, classification and "
    "delta map-side, then a 4-group aggregate — the changelog pass a "
    "lakehouse pipeline runs between table versions; at scale the join "
    "co-partitions both snapshots by key and nothing else shuffles.",
)
def table_diff_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    zero = F.lit(0).cast("decimal(15,2)")
    v_old = orders.filter(F.col("o_orderkey") % 10 != 3).select(
        F.col("o_orderkey").alias("k_old"), dec("o_totalprice").alias("price_old")
    )
    v_new = orders.filter(F.col("o_orderkey") % 10 != 7).select(
        F.col("o_orderkey").alias("k_new"),
        F.when(
            F.col("o_orderkey") % 10 == 5,
            dec("o_totalprice") + F.lit(100.00).cast("decimal(15,2)"),
        )
        .otherwise(dec("o_totalprice"))
        .alias("price_new"),
    )
    return (
        v_old.join(v_new, v_old.k_old == v_new.k_new, "full_outer")
        .select(
            F.when(F.col("k_old").isNull(), "insert")
            .when(F.col("k_new").isNull(), "delete")
            .when(F.col("price_old") != F.col("price_new"), "update")
            .otherwise("unchanged")
            .alias("change_type"),
            (
                F.coalesce("price_new", zero) - F.coalesce("price_old", zero)
            ).alias("delta"),
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("delta").cast("double").alias("net_price_delta"),
        )
        .orderBy("change_type")
    )


@query(
    "token_diversity_by_lang",
    oracle="""
        WITH tok AS (
            SELECT lang,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                       AS w
            FROM documents
        ), tf AS (
            SELECT lang, w, COUNT(*) AS n_w FROM tok GROUP BY 1, 2
        )
        SELECT lang,
               CAST(SUM(n_w) AS BIGINT) AS total_tokens,
               COUNT(*) AS vocab_size,
               CAST(SUM(CASE WHEN n_w = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax_count,
               round(CAST(COUNT(*) AS DOUBLE)
                     / CAST(SUM(n_w) AS DOUBLE), 6) AS type_token_ratio,
               round(1.0 - CAST(SUM(n_w * n_w) AS DOUBLE)
                           / (CAST(SUM(n_w) AS DOUBLE)
                              * CAST(SUM(n_w) AS DOUBLE)), 6)
                   AS simpson_diversity
        FROM tf GROUP BY lang ORDER BY lang
    """,
    description="Lexical-diversity profile per language: total tokens, "
    "vocabulary size, hapax legomena, type-token ratio, and Simpson "
    "diversity 1 - sum(p_w^2) — the rational diversity index (Shannon "
    "entropy's log is not engine-portable; Simpson's is exact integer "
    "arithmetic until one final division). Two map-side-combining "
    "aggregations — (lang, token) counts then per-lang moments — with "
    "only counts on the wire. The corpus-balance check run before "
    "sampling multilingual training data.",
)
def token_diversity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "lang",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
        )
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    n_d = F.sum("n_w").cast("double")
    return (
        tf.groupBy("lang")
        .agg(
            F.sum("n_w").cast("bigint").alias("total_tokens"),
            F.count(F.lit(1)).alias("vocab_size"),
            F.sum(F.when(F.col("n_w") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("hapax_count"),
            F.round(F.count(F.lit(1)).cast("double") / n_d, 6).alias(
                "type_token_ratio"
            ),
            F.round(
                F.lit(1.0)
                - F.sum(F.col("n_w") * F.col("n_w")).cast("double") / (n_d * n_d),
                6,
            ).alias("simpson_diversity"),
        )
        .orderBy("lang")
    )
