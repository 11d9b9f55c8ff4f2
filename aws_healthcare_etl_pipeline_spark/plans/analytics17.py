"""Wave-26: dataset-shift auditing and seasonal decomposition.

Both follow the no-libm-on-data rule: the drift statistic is the
triangular discrimination Σ (p-q)²/(p+q) (PSI's ln replaced by an
f-divergence that needs only +,-,*,/), and the seasonal component is
expressed through EXACT decimal numerators (7·rev − trailing-sum)
so no order-dependent double summation exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.selection import kth_smallest_multi
from ..sources.tables import load_table
from .registry import dec, query

N_BINS = 10


@query(
    "audit_distribution_drift",
    oracle=f"""
        WITH base AS (
            SELECT o_totalprice AS x,
                   CASE WHEN o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
                        THEN 'ref' ELSE 'cur' END AS era
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        ), edges AS (
            SELECT quantile_disc(x, [{", ".join(f"{i}/{N_BINS}.0" for i in range(1, N_BINS))}])
                       AS qs
            FROM base WHERE era = 'ref'
        ), binned AS (
            SELECT era,
                   1 + len(list_filter(qs, q -> x > q)) AS bin
            FROM base, edges
        ), counts AS (
            SELECT bin,
                   SUM(CASE WHEN era = 'ref' THEN 1 ELSE 0 END) AS n_ref,
                   SUM(CASE WHEN era = 'cur' THEN 1 ELSE 0 END) AS n_cur
            FROM binned GROUP BY bin
        ), tot AS (
            SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM counts
        )
        SELECT CAST(bin AS INT) AS bin,
               CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cur AS BIGINT) AS n_cur,
               (CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE)
                - CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE))
               * (CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE)
                  - CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE))
               / (CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE)
                  + CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE))
                   AS drift_term
        FROM counts, tot
        ORDER BY bin
    """,
    description="Dataset-shift audit (the PSI-style drift monitor "
    "every production feature pipeline runs): 1995 orders are the "
    "reference era, 1996 the current; bins come from the reference "
    "era's exact deciles (quantile_disc on actual values — "
    "engine-identical, no interpolation), and per-bin drift is the "
    "triangular-discrimination term (p-q)^2/(p+q) — an f-divergence "
    "that replaces PSI's ln with pure rational arithmetic, keeping "
    "the statistic bit-portable. Bin edges broadcast; one pass per "
    "era. Summing drift_term gives the scalar monitor value.",
)
def audit_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    base = orders.select(
        F.col("o_totalprice").alias("x"),
        F.when(
            F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"), "ref"
        )
        .otherwise("cur")
        .alias("era"),
    )
    ref = base.filter(F.col("era") == "ref")
    # exact discrete quantiles (no interpolation): the k/N-quantile is
    # the value at 1-based rank ceil(k*n/N) in sorted order — matches
    # DuckDB quantile_disc's definition on both engines. The ranks are
    # resolved by multi-rank histogram selection (one aggregation per
    # refinement level for ALL nine edges together) — never a global
    # row_number sort of the entity-grain frame. Prices are 2-decimal,
    # so the integer-cents domain is exact, and cents/100.0 is the
    # nearest double of the decimal = the stored parquet double.
    cents_df = ref.select(
        (F.col("x").cast("decimal(15,2)") * 100).cast("long").alias("__c")
    )
    n_ref = cents_df.count()
    cut_ranks = [-(-k * n_ref // N_BINS) for k in range(1, N_BINS)]  # ceil
    rank_vals = kth_smallest_multi(cents_df, "__c", cut_ranks)
    edges = [rank_vals[r] / 100.0 for r in cut_ranks]
    # dedupe while preserving rank association (duplicates possible on
    # repeated values — keep all N_BINS-1 edges as quantile_disc does)
    bin_expr = F.lit(1)
    for e in edges:
        bin_expr = bin_expr + (F.col("x") > F.lit(float(e))).cast("int")
    counts = (
        base.withColumn("bin", bin_expr)
        .groupBy("bin")
        .agg(
            F.sum((F.col("era") == "ref").cast("long")).alias("n_ref"),
            F.sum((F.col("era") == "cur").cast("long")).alias("n_cur"),
        )
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p = F.col("n_ref").cast("double") / F.col("t_ref").cast("double")
    q = F.col("n_cur").cast("double") / F.col("t_cur").cast("double")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("int").alias("bin"),
            "n_ref",
            "n_cur",
            ((p - q) * (p - q) / (p + q)).alias("drift_term"),
        )
        .orderBy("bin")
    )


@query(
    "timeseries_seasonal_decompose",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)))
                        AS DECIMAL(15,2)) AS rev
            FROM orders
            WHERE o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
            GROUP BY 1
        ), trended AS (
            SELECT d, rev,
                   SUM(CAST(rev AS DECIMAL(19,2))) OVER
                     (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                       AS t_sum,
                   COUNT(*) OVER
                     (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                       AS t_n
            FROM daily
        ), full_weeks AS (
            SELECT d, rev, t_sum, dayofweek(d) AS dow
            FROM trended WHERE t_n = 7
        )
        SELECT CAST(dow AS INT) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(CAST(SUM(7 * CAST(rev AS DECIMAL(19,2)) - t_sum)
                         AS VARCHAR) AS DOUBLE)
                   / (7.0 * COUNT(*)) AS seasonal_component
        FROM full_weeks
        GROUP BY dow
        ORDER BY dow
    """,
    description="Additive seasonal decomposition, day-of-week "
    "component: seasonal(dow) = mean over days of (rev - centered "
    "7-day trend). Expressed as the EXACT decimal numerator "
    "Σ(7·rev − trend_sum) divided once at the end — a naive "
    "mean-of-deviations would sum raw doubles in partition order. "
    "The numerator leaves DECIMAL via VARCHAR (the >2^53 rule from "
    "SCALE.md). Edge days without a full centered week are excluded "
    "(t_n = 7), matching both engines exactly.",
)
def timeseries_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp")
    )
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(dec("o_totalprice")).cast("decimal(15,2)").alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    trended = daily.select(
        "d",
        "rev",
        F.sum(F.col("rev").cast("decimal(19,2)")).over(w).alias("t_sum"),
        F.count(F.lit(1)).over(w).alias("t_n"),
    ).filter(F.col("t_n") == 7)
    # dow alignment: Spark dayofweek is 1-based (Sunday=1), DuckDB's
    # is 0-based (Sunday=0) — shift Spark down by one.
    return (
        trended.select(
            (F.dayofweek("d") - 1).alias("dow"),
            "rev",
            "t_sum",
        )
        .groupBy(F.col("dow").cast("int").alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            (
                F.sum(
                    F.lit(7) * F.col("rev").cast("decimal(19,2)") - F.col("t_sum")
                )
                .cast("string")
                .cast("double")
                / (F.lit(7.0) * F.count(F.lit(1)))
            ).alias("seasonal_component"),
        )
        .orderBy("dow")
    )


@query(
    "events_growth_accounting",
    oracle="""
        WITH um AS (
            SELECT DISTINCT user_id,
                   date_trunc('month', ts) AS m
            FROM events
        ), flagged AS (
            SELECT user_id, m,
                   lag(m) OVER (PARTITION BY user_id ORDER BY m) AS prev_m
            FROM um
        ), classified AS (
            SELECT m,
                   CASE WHEN prev_m IS NULL THEN 'new'
                        WHEN prev_m = m - INTERVAL 1 MONTH THEN 'retained'
                        ELSE 'resurrected' END AS state
            FROM flagged
        ), churn AS (
            SELECT m + INTERVAL 1 MONTH AS m, 'churned' AS state
            FROM flagged f
            WHERE NOT EXISTS (
                SELECT 1 FROM um u
                WHERE u.user_id = f.user_id
                  AND u.m = f.m + INTERVAL 1 MONTH)
              AND f.m + INTERVAL 1 MONTH <= (SELECT MAX(m) FROM um)
        )
        SELECT m AS month, state, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM (SELECT m, state FROM classified
              UNION ALL SELECT m, state FROM churn)
        GROUP BY m, state
        ORDER BY month, state
    """,
    description="Growth accounting (the canonical MAU decomposition): "
    "each active user-month classifies as new (first ever), retained "
    "(active previous month), or resurrected (returning after a gap); "
    "churned counts users active in month m-1 but not m, attributed "
    "to m and clipped at the observed horizon. One (user, month) "
    "dedup + one per-user lag window + an anti-join for churn — all "
    "partitioned on user_id, so the three shuffles collapse onto one "
    "key distribution at scale.",
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    um = events.select(
        "user_id", F.date_trunc("month", F.col("ts")).alias("m")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("m")
    flagged = um.withColumn("prev_m", F.lag("m").over(w))
    classified = flagged.select(
        "m",
        F.when(F.col("prev_m").isNull(), "new")
        .when(F.col("prev_m") == F.col("m") - F.expr("INTERVAL 1 MONTH"), "retained")
        .otherwise("resurrected")
        .alias("state"),
    )
    max_m = um.agg(F.max("m").alias("max_m"))
    next_m = (F.col("m") + F.expr("INTERVAL 1 MONTH")).alias("m_next")
    churn = (
        flagged.select("user_id", F.col("m"), next_m)
        .join(
            um.select("user_id", F.col("m").alias("m_next")),
            ["user_id", "m_next"],
            "left_anti",
        )
        .crossJoin(F.broadcast(max_m))
        .filter(F.col("m_next") <= F.col("max_m"))
        .select(F.col("m_next").alias("m"), F.lit("churned").alias("state"))
    )
    return (
        classified.unionByName(churn)
        .groupBy(F.col("m").alias("month"), "state")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("month", "state")
    )


BASKET_MIN_SUPPORT = 2


@query(
    "basket_association_rules",
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), n_baskets AS (
            SELECT COUNT(DISTINCT l_orderkey) AS nb FROM items
        ), item_counts AS (
            SELECT l_partkey, COUNT(*) AS n FROM items GROUP BY l_partkey
        ), pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   COUNT(*) AS support
            FROM items a
            JOIN items b ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
        )
        SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
               CAST(support AS DOUBLE) / CAST(ca.n AS DOUBLE)
                   AS confidence_a_to_b,
               CAST(support AS DOUBLE) * CAST(nb AS DOUBLE)
                   / (CAST(ca.n AS DOUBLE) * CAST(cb.n AS DOUBLE)) AS lift
        FROM pairs
        JOIN item_counts ca ON ca.l_partkey = part_a
        JOIN item_counts cb ON cb.l_partkey = part_b
        CROSS JOIN n_baskets
        ORDER BY lift DESC, part_a, part_b
        LIMIT 20
    """,
    description="Association rules on the co-occurrence pairs: "
    "confidence(a->b) = support/n_a and lift = support*N/(n_a*n_b), "
    "both exact-integer ratios evaluated as identical double "
    "divisions. Item counts and the basket total broadcast back onto "
    "the pair aggregation, so the only wide shuffle is still the pair "
    "groupBy; (lift, part_a, part_b) is a total order for the top-20. "
    "This is FP-growth's rule-generation pass expressed relationally.",
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    nb = items.agg(F.count_distinct("l_orderkey").alias("nb"))
    item_counts = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= BASKET_MIN_SUPPORT)
    )
    ca = item_counts.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a"))
    cb = item_counts.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "part_a",
            "part_b",
            "support",
            (F.col("support").cast("double") / F.col("n_a").cast("double")).alias(
                "confidence_a_to_b"
            ),
            (
                F.col("support").cast("double")
                * F.col("nb").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(20)
    )


@query(
    "exact_median_selection",
    oracle="""
        WITH c AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT) AS v
            FROM orders
        ), r AS (
            SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c
        ), n AS (SELECT COUNT(*) AS n FROM c)
        SELECT CAST(n AS BIGINT) AS n_rows,
               CAST(v AS BIGINT) AS median_cents,
               CAST(v AS DOUBLE) / 100.0 AS median_price
        FROM r, n WHERE rn = (n + 1) // 2
    """,
    description="Exact median WITHOUT a global sort "
    "(operators/selection.py): iterative histogram refinement on the "
    "integer-cents domain — each pass is one map-side-combined "
    "4096-bucket count (B counts per partition on the wire), and "
    "log_B(domain) passes pin the answer (2 passes here). The "
    "distributed-selection alternative to sorting 100 TB for one "
    "middle element; lower-median convention, pinned by the oracle's "
    "explicit rank (n+1)//2.",
)
def exact_median_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.selection import exact_median_cents

    orders = load_table(spark, sf_dir, "orders")
    n, cents, price = exact_median_cents(orders, dec("o_totalprice"))
    return spark.createDataFrame(
        [(n, cents, price)], "n_rows long, median_cents long, median_price double"
    )


@query(
    "setop_all_variants",
    oracle="""
        WITH a AS (SELECT o_custkey AS k FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                     AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
             b AS (SELECT o_custkey AS k FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                     AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
        SELECT 'except_all' AS op, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys
        FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
        UNION ALL
        SELECT 'intersect_all', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT k) AS BIGINT)
        FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
        UNION ALL
        SELECT 'union_all', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT k) AS BIGINT)
        FROM (SELECT k FROM a UNION ALL SELECT k FROM b)
        ORDER BY op
    """,
    description="Bag-semantics set operations (INTERSECT ALL / EXCEPT "
    "ALL / UNION ALL): multiplicity-aware variants — EXCEPT ALL keeps "
    "max(count_a - count_b, 0) copies per key, INTERSECT ALL keeps "
    "min(count_a, count_b) — which the earlier DISTINCT-set battery "
    "(setop_*) cannot express. Spark plans these as count-annotated "
    "aggregations + a generator, not row-by-row matching; counts per "
    "op plus distinct-key counts pin the multiplicities.",
)
def setop_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("k"))
    b = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("k"))

    def stats(df: DataFrame, op: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("k").alias("n_keys"),
        ).select(F.lit(op).alias("op"), "n_rows", "n_keys")

    return (
        stats(a.exceptAll(b), "except_all")
        .unionByName(stats(a.intersectAll(b), "intersect_all"))
        .unionByName(stats(a.unionAll(b), "union_all"))
        .orderBy("op")
    )


@query(
    "join_hint_shuffle_hash",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="Join-strategy control surface: the fact-fact join is "
    "hinted SHUFFLE_HASH, trading sort-merge's two sorts for hash "
    "tables — the right call when one side comfortably fits a "
    "partition's memory and spill risk is low (build-side OOM is the "
    "trade; AQE cannot convert an SMJ mid-flight the way it can for "
    "broadcast). tests/test_plans.py pins ShuffledHashJoin in the "
    "plan with broadcast disabled; results are hint-invariant, which "
    "is what the oracle certifies.",
)
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", dec("l_extendedprice").alias("price")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    return (
        li.join(orders.hint("SHUFFLE_HASH"), li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("price").cast("double").alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "generator_outer_edge_battery",
    oracle="""
        WITH src AS (
            SELECT o_orderkey AS k,
                   CASE WHEN o_orderkey % 3 = 0 THEN []
                        ELSE [o_orderkey % 7, o_orderkey % 5] END AS arr
            FROM orders WHERE o_orderkey < 3000
        ), exploded AS (
            SELECT k, UNNEST(CASE WHEN len(arr) = 0
                                  THEN [NULL]::BIGINT[] ELSE arr END) AS v
            FROM src
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(v) AS BIGINT) AS n_values,
               CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null_rows,
               CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys_survived,
               CAST(SUM(v) AS BIGINT) AS sum_values
        FROM exploded
    """,
    description="Outer-generator NULL semantics: explode_outer keeps "
    "a row (with NULL element) for EMPTY arrays where plain explode "
    "silently drops the parent — the difference between 'no tags' "
    "disappearing from a report and showing as an explicit null "
    "group. Every third key carries an empty array; the battery pins "
    "row counts, null rows, and key survival. DuckDB's UNNEST drops "
    "empties like inner explode, so the oracle models the outer "
    "contract with an explicit [NULL] substitution.",
)
def generator_outer_edge_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    src = orders.select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 3 == 0, F.array().cast("array<bigint>"))
        .otherwise(
            F.array(F.col("o_orderkey") % 7, F.col("o_orderkey") % 5).cast(
                "array<bigint>"
            )
        )
        .alias("arr"),
    )
    exploded = src.select("k", F.explode_outer("arr").alias("v"))
    return exploded.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_values"),
        F.sum(F.col("v").isNull().cast("long")).alias("n_null_rows"),
        F.count_distinct("k").alias("n_keys_survived"),
        F.sum("v").alias("sum_values"),
    )


@query(
    "join_null_safe_equality",
    oracle="""
        WITH a AS (
            SELECT CASE WHEN o_orderkey % 4 = 0 THEN NULL
                        ELSE o_orderkey % 50 END AS k
            FROM orders WHERE o_orderkey < 2000
        ), b AS (
            SELECT CASE WHEN o_orderkey % 6 = 0 THEN NULL
                        ELSE o_orderkey % 50 END AS k
            FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 4000
        )
        SELECT 'equi' AS join_kind,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM a JOIN b ON a.k = b.k
        UNION ALL
        SELECT 'null_safe',
               CAST(COUNT(*) AS BIGINT)
        FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        ORDER BY join_kind
    """,
    description="Null-safe equality (<=> / IS NOT DISTINCT FROM) vs "
    "plain = in join conditions: every 4th left key and 6th right key "
    "is NULL; the equi join silently drops them all, the null-safe "
    "join matches NULL-to-NULL — the difference between losing "
    "unknown-key rows and pairing them, a recurring CDC/merge-key "
    "bug. Both counts pinned. The null-safe form still plans as a "
    "hash join (null is just another key value under <=>), not a "
    "nested loop.",
)
def join_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") < 2000).select(
        F.when(F.col("o_orderkey") % 4 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_orderkey") % 50)
        .alias("ka")
    )
    b = orders.filter(
        (F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 4000)
    ).select(
        F.when(F.col("o_orderkey") % 6 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_orderkey") % 50)
        .alias("kb")
    )
    equi = a.join(b, F.col("ka") == F.col("kb")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    ).select(F.lit("equi").alias("join_kind"), "n_pairs")
    nsafe = a.join(b, F.col("ka").eqNullSafe(F.col("kb"))).agg(
        F.count(F.lit(1)).alias("n_pairs")
    ).select(F.lit("null_safe").alias("join_kind"), "n_pairs")
    return equi.unionByName(nsafe).orderBy("join_kind")


@query(
    "agg_listagg_ordered",
    oracle="""
        SELECT r_name,
               string_agg(n_name, '|' ORDER BY n_name) AS nations,
               CAST(COUNT(*) AS BIGINT) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name
    """,
    description="Ordered string aggregation (SQL:2023 LISTAGG ... "
    "WITHIN GROUP, Spark 4): nations concatenated per region in "
    "deterministic name order — the denormalized-label export shape. "
    "The WITHIN GROUP ordering is what makes the result stable "
    "regardless of partial-aggregation order; DuckDB's string_agg "
    "with ORDER BY is the same contract.",
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.expr("listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name)").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )


@query(
    "agg_bitwise_battery",
    oracle="""
        SELECT c_mktsegment,
               CAST(bit_and(c_custkey) AS BIGINT) AS and_all,
               CAST(bit_or(c_custkey) AS BIGINT) AS or_all,
               CAST(bit_xor(c_custkey) AS BIGINT) AS xor_all,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    description="Bitwise aggregate battery (bit_and / bit_or / "
    "bit_xor): associative, commutative, integer-exact — ideal "
    "partial-aggregation citizens (xor famously detects unpaired "
    "rows: xor of a self-cancelling multiset is the odd one out). "
    "Map-side combine shrinks every partition to three words per "
    "group before the shuffle.",
)
def agg_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.expr("bit_and(c_custkey)").alias("and_all"),
            F.expr("bit_or(c_custkey)").alias("or_all"),
            F.expr("bit_xor(c_custkey)").alias("xor_all"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_mktsegment")
    )
