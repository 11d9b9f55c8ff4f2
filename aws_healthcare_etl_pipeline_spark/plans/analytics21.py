"""Wave-40 (round 5): governance / statistics / join-strategy /
SQL-surface additions — k-anonymity audit, daily-count
autocorrelation, Mann-Kendall trend test, a salted-join equivalence
proof, the PIVOT relational operator, and distinct-over-window via
the first-occurrence decomposition.

Portability notes follow the registry grammar (plans/registry.py):
exact integer / decimal arithmetic wherever the hash is load-bearing;
doubles only through single divisions or identically-shaped
expression trees; sqrt is the one libm-class function used
(IEEE-mandated correct rounding); FLOOR over a double division is the
sign-safe portable bucketer (Spark's `div` truncates toward zero
while DuckDB's `//` floors, so raw integer division diverges on
negatives — floor-of-double agrees everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.multimodal import attach_binary_payload, perceptual_hash
from ..sources.tables import load_table
from .registry import dec, disc_price, query, sql_dsum

# ------------------------------------------------------- k-anonymity

KANON_THRESHOLDS = [2, 5, 10, 20]
KANON_BAL_BUCKET_CENTS = 100_000  # $1000 balance buckets


@query(
    "privacy_k_anonymity_audit",
    oracle=f"""
        WITH qi AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(FLOOR(CAST(CAST(c_acctbal AS DECIMAL(15,2)) * 100
                                   AS BIGINT)
                              / {KANON_BAL_BUCKET_CENTS}.0) AS BIGINT)
                       AS bal_bucket
            FROM customer
        ), sizes AS (
            SELECT c_nationkey, c_mktsegment, bal_bucket,
                   CAST(COUNT(*) AS BIGINT) AS grp_n
            FROM qi GROUP BY 1, 2, 3
        ), tot AS (
            SELECT CAST(SUM(grp_n) AS BIGINT) AS n_total FROM sizes
        ), ks AS (
            SELECT unnest([{", ".join(str(k) for k in KANON_THRESHOLDS)}]) AS k
        )
        SELECT k,
               CAST(COALESCE(SUM(CASE WHEN grp_n < k THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_groups_below,
               CAST(COALESCE(SUM(CASE WHEN grp_n < k THEN grp_n ELSE 0 END),
                             0) AS BIGINT) AS n_rows_below,
               CAST(COALESCE(SUM(CASE WHEN grp_n < k THEN grp_n ELSE 0 END),
                             0) AS DOUBLE)
                   / CAST((SELECT n_total FROM tot) AS DOUBLE)
                   AS risk_fraction
        FROM ks CROSS JOIN sizes
        GROUP BY k
        ORDER BY k
    """,
    description="k-anonymity audit over the quasi-identifier "
    "(nation, market segment, $1000 account-balance bucket): for "
    "re-identification thresholds k in {2,5,10,20}, how many QI "
    "groups and how many customers sit in groups smaller than k — "
    "the measurement privacy review runs before releasing a "
    "'pseudonymized' extract, because QI group size IS the "
    "re-identification risk. One shuffle reduces the customer table "
    "to QI-group grain; the 4 thresholds evaluate against that "
    "bounded aggregate via a broadcast values-join, so the heavy "
    "table is scanned exactly once at 100 TB. The balance bucket is "
    "FLOOR over a double division of exact cents — the sign-safe "
    "bucketer that agrees across engines on negative balances "
    "(truncating integer division would not).",
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(
            (dec("c_acctbal") * 100).cast("bigint")
            / F.lit(float(KANON_BAL_BUCKET_CENTS))
        )
        .cast("bigint")
        .alias("bal_bucket"),
    )
    sizes = qi.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("grp_n")
    )
    tot = sizes.agg(F.sum("grp_n").cast("bigint").alias("n_total"))
    ks = spark.createDataFrame([(k,) for k in KANON_THRESHOLDS], "k int")
    return (
        F.broadcast(ks)
        .crossJoin(sizes)
        .groupBy("k")
        .agg(
            F.coalesce(
                F.sum((F.col("grp_n") < F.col("k")).cast("bigint")), F.lit(0)
            )
            .cast("bigint")
            .alias("n_groups_below"),
            F.coalesce(
                F.sum(
                    F.when(F.col("grp_n") < F.col("k"), F.col("grp_n")).otherwise(
                        0
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_rows_below"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "n_groups_below",
            "n_rows_below",
            (
                F.col("n_rows_below").cast("double")
                / F.col("n_total").cast("double")
            ).alias("risk_fraction"),
        )
        .orderBy("k")
    )


# ------------------------------------------------- autocorrelation

ACF_MAX_LAG = 7


@query(
    "events_autocorrelation_daily",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ), lags AS (
            SELECT unnest(range(1, {ACF_MAX_LAG + 1})) AS lag_d
        ), pairs AS (
            SELECT l.lag_d, a.x AS x, b.x AS y
            FROM daily a
            CROSS JOIN lags l
            JOIN daily b ON b.day = a.day + CAST(l.lag_d AS INT)
        ), sums AS (
            SELECT lag_d,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy
            FROM pairs GROUP BY lag_d
        )
        SELECT CAST(lag_d AS BIGINT) AS lag_d, n,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                   AS acf
        FROM sums
        ORDER BY lag_d
    """,
    description="Daily event-count autocorrelation at lags 1..7 — the "
    "weekly-seasonality diagnostic run before choosing a forecasting "
    "or anomaly model. The heavy table reduces to the day grain in "
    "one partial-agg shuffle; the lagged self-alignment is a join of "
    "the BOUNDED daily spine against itself shifted by a 7-row "
    "broadcast lag table, so the pair stage touches O(days x 7) rows "
    "at any data scale. Pearson r per lag comes from exact integer "
    "sums (n, sum x, sum xy, sum x^2 fit int64 for daily counts up "
    "to ~3e9) combined in one identically-shaped double expression: "
    "a single division by the product of two IEEE-exact sqrts.",
)
def events_autocorrelation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag_d")
    )
    shifted = (
        daily.crossJoin(F.broadcast(lags))
        .select(
            "lag_d",
            F.expr("date_add(day, -lag_d)").alias("day"),
            F.col("x").alias("y"),
        )
    )
    pairs = daily.join(shifted, "day").select("lag_d", "x", "y")
    sums = pairs.groupBy("lag_d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return sums.select(
        F.col("lag_d").cast("bigint").alias("lag_d"),
        "n",
        (
            (n * sxy - sx * sy).cast("double")
            / (
                F.sqrt((n * sxx - sx * sx).cast("double"))
                * F.sqrt((n * syy - sy * sy).cast("double"))
            )
        ).alias("acf"),
    ).orderBy("lag_d")


# ------------------------------------------------- Mann-Kendall trend


@query(
    "trend_mann_kendall_monthly",
    oracle="""
        WITH monthly AS (
            SELECT date_trunc('month', o_orderdate) AS m,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) * 100
                        AS BIGINT) AS rev
            FROM orders GROUP BY 1
        ), s AS (
            SELECT CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                                 WHEN b.rev < a.rev THEN -1
                                 ELSE 0 END) AS BIGINT) AS s_stat
            FROM monthly a JOIN monthly b ON a.m < b.m
        ), nn AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM monthly
        ), ties AS (
            SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
                        AS BIGINT) AS tie_term
            FROM (
                SELECT CAST(COUNT(*) AS BIGINT) AS t
                FROM monthly GROUP BY rev HAVING COUNT(*) > 1
            )
        )
        SELECT n AS n_months, s_stat,
               n * (n - 1) * (2 * n + 5) - tie_term AS var18,
               CASE
                 WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
                      / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term
                                  AS DOUBLE) / 18.0)
                 WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
                      / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term
                                  AS DOUBLE) / 18.0)
                 ELSE CAST(0 AS DOUBLE)
               END AS z_stat
        FROM s, nn, ties
    """,
    description="Mann-Kendall monotone-trend test on monthly revenue "
    "— the nonparametric is-this-metric-drifting check that needs no "
    "distributional assumption. The fact table reduces to the "
    "month-grain series (bounded: ~10^3 months for any retention "
    "window) in one shuffle; the O(n^2) sign-pair sum then runs on "
    "that bounded spine — the sanctioned place for quadratic work, "
    "~10^6 pairs max regardless of fact volume. S and the "
    "tie-corrected variance numerator var18 = n(n-1)(2n+5) - sum "
    "t(t-1)(2t+5) are exact int64 on cent-exact revenues; the z "
    "statistic is the single double expression (S -/+ 1) / "
    "sqrt(var18/18).",
)
def trend_mann_kendall_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg((F.sum(dec("o_totalprice")) * 100).cast("bigint").alias("rev"))
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    s = (
        a.join(b, F.col("a.m") < F.col("b.m"))
        .agg(
            F.sum(
                F.when(F.col("b.rev") > F.col("a.rev"), 1)
                .when(F.col("b.rev") < F.col("a.rev"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    nn = monthly.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ties = (
        monthly.groupBy("rev")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    n, s_stat, tie = F.col("n"), F.col("s_stat"), F.col("tie_term")
    var18 = n * (n - 1) * (2 * n + 5) - tie
    denom = F.sqrt(var18.cast("double") / F.lit(18.0))
    return (
        s.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ties))
        .select(
            n.alias("n_months"),
            "s_stat",
            var18.alias("var18"),
            F.when(s_stat > 0, (s_stat - 1).cast("double") / denom)
            .when(s_stat < 0, (s_stat + 1).cast("double") / denom)
            .otherwise(F.lit(0.0))
            .alias("z_stat"),
        )
    )


# ------------------------------------------------- salted join proof

JOIN_SALT = 8


@query(
    "join_salted_skew_equivalence",
    oracle=f"""
        SELECT s.s_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               {sql_dsum("l_extendedprice")} AS revenue
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_nationkey
        ORDER BY s.s_nationkey
    """,
    description=f"Salted-join equivalence proof: the supplier build "
    f"side is replicated x{JOIN_SALT} with an explicit salt column, "
    f"the lineitem probe side tags each row with pmod(l_orderkey, "
    f"{JOIN_SALT}), and the join key becomes (suppkey, salt) — the "
    "standard manual defense when one join key dominates (a hub "
    "supplier) and a single shuffle partition would absorb the whole "
    "skew at 100 TB. AQE's skew-join split does this adaptively, but "
    "the explicit pattern is deterministic, engine-portable, and "
    "works when AQE cannot see the skew (first run, no stats). The "
    "oracle is the UNSALTED textbook join — the hash match proves "
    "the salted plan computes exactly the same relation. Aggregation "
    "is count + exact decimal revenue per supplier nation.",
)
def join_salted_skew_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.pmod(F.col("l_orderkey"), F.lit(JOIN_SALT)).alias("salt"),
        dec("l_extendedprice").alias("price"),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    salted_sup = sup.crossJoin(
        F.broadcast(
            spark.range(JOIN_SALT).select(F.col("id").alias("salt"))
        )
    )
    return (
        li.join(
            salted_sup,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (li["salt"] == salted_sup["salt"]),
        )
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("price").cast("double").alias("revenue"),
        )
        .orderBy("s_nationkey")
    )


# ------------------------------------------------------------- PIVOT


@query(
    "sql_pivot_quarterly_revenue",
    oracle=f"""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
               {sql_dsum("CASE WHEN quarter(o_orderdate) = 1 THEN o_totalprice END")} AS q1_revenue,
               {sql_dsum("CASE WHEN quarter(o_orderdate) = 2 THEN o_totalprice END")} AS q2_revenue,
               {sql_dsum("CASE WHEN quarter(o_orderdate) = 3 THEN o_totalprice END")} AS q3_revenue,
               {sql_dsum("CASE WHEN quarter(o_orderdate) = 4 THEN o_totalprice END")} AS q4_revenue
        FROM orders
        GROUP BY year(o_orderdate)
        ORDER BY order_year
    """,
    description="The PIVOT relational operator: quarterly revenue "
    "spread to columns per order year via DataFrame.pivot with an "
    "EXPLICIT value list — the explicit list matters at scale "
    "because it removes the extra distinct-values collection job "
    "Spark otherwise runs before planning the pivot, and it keeps "
    "the aggregation a single partial-agg shuffle at the year grain "
    "(wide, not tall). The oracle is the textbook conditional-"
    "aggregation form, proving pivot is pure syntax over CASE "
    "aggregation; revenue sums are exact decimals cast to double "
    "once.",
)
def sql_pivot_quarterly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.select(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.quarter("o_orderdate").alias("q"),
            dec("o_totalprice").alias("v"),
        )
        .groupBy("order_year")
        .pivot("q", [1, 2, 3, 4])
        .agg(F.sum("v"))
    )
    return pivoted.select(
        "order_year",
        *[
            F.col(str(q)).cast("double").alias(f"q{q}_revenue")
            for q in (1, 2, 3, 4)
        ],
    ).orderBy("order_year")


# ------------------------------------- distinct-over-window rewrite


@query(
    "orders_cum_distinct_customers",
    oracle="""
        WITH monthly AS (
            SELECT date_trunc('month', o_orderdate) AS m,
                   CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
                       AS n_active_customers
            FROM orders GROUP BY 1
        )
        SELECT m.m AS month,
               m.n_active_customers,
               (SELECT CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
                FROM orders o
                WHERE date_trunc('month', o.o_orderdate) <= m.m)
                   AS cum_distinct_customers
        FROM monthly m
        ORDER BY month
    """,
    description="COUNT(DISTINCT) OVER a cumulative window — an "
    "operator Spark (and most engines) refuse inside a window frame "
    "— via the first-occurrence decomposition: min(order month) per "
    "customer marks each customer's one 'new' month, the per-month "
    "new-customer counts form a bounded month-grain series, and a "
    "running sum over THAT spine equals the cumulative distinct "
    "count. Two shuffles at customer and month grain replace the "
    "textbook correlated rescan (the oracle's form — which re-reads "
    "the fact table once per month and is the plan that dies at "
    "100 TB); the hash match proves the decomposition. Also emits "
    "per-month active distinct customers from the same pass.",
)
def orders_cum_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").alias("m"), "o_custkey"
    )
    active = orders.groupBy("m").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_active_customers")
    )
    firsts = (
        orders.groupBy("o_custkey")
        .agg(F.min("m").alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new"))
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(firsts, "m", "left")
        .select(
            "m",
            "n_active_customers",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .select(
            F.col("m").alias("month"),
            "n_active_customers",
            F.sum("n_new").over(w).cast("bigint").alias(
                "cum_distinct_customers"
            ),
        )
        .orderBy("month")
    )


# ----------------------------------------------- integer-lattice k-means

KMEANS_K = 8
KMEANS_SCALE = 1_048_576  # 2^20 micro-lattice quantization
_KM_DIM = 64

_KM_SQL_Q = f"""
    q AS (
        SELECT vec_id,
               list_transform(embedding,
                              e -> CAST(FLOOR(CAST(e AS DOUBLE)
                                              * {KMEANS_SCALE}.0) AS BIGINT))
                   AS v
        FROM embeddings
    )
"""


def _km_sql_assign(name: str, cents: str) -> str:
    return f"""
        {name} AS (
            SELECT vec_id, MIN(d2 * {KMEANS_K} + cid) AS key
            FROM (
                SELECT a.vec_id, s.cid,
                       CAST(list_sum(list_transform(range(1, {_KM_DIM + 1}),
                                i -> (a.v[i] - s.v[i]) * (a.v[i] - s.v[i])))
                            AS BIGINT) AS d2
                FROM q a CROSS JOIN {cents} s
            ) GROUP BY vec_id
        )
    """


def _km_sql_centroids(name: str, assign: str) -> str:
    return f"""
        {name}_e AS (
            SELECT CAST({assign}.key % {KMEANS_K} AS BIGINT) AS cid, q.v
            FROM {assign} JOIN q USING (vec_id)
        ), {name}_n AS (
            SELECT cid, CAST(COUNT(*) AS BIGINT) AS n
            FROM {name}_e GROUP BY cid
        ), {name}_d AS (
            SELECT cid, i, CAST(SUM(v[i]) AS BIGINT) AS s
            FROM {name}_e
            CROSS JOIN (SELECT unnest(range(1, {_KM_DIM + 1})) AS i)
            GROUP BY cid, i
        ), {name} AS (
            SELECT cid,
                   list(CAST(FLOOR(CAST(s AS DOUBLE) / n) AS BIGINT)
                        ORDER BY i) AS v
            FROM {name}_d JOIN {name}_n USING (cid)
            GROUP BY cid, n
        )
    """


@query(
    "emb_kmeans_lloyd_rounds",
    oracle=f"""
        WITH {_KM_SQL_Q},
        qm AS (
            SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR)) AS h FROM q
        ), seeds AS (
            SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1
                        AS BIGINT) AS cid, v
            FROM qm ORDER BY h, vec_id LIMIT {KMEANS_K}
        ),
        {_km_sql_assign("a1", "seeds")},
        {_km_sql_centroids("c1", "a1")},
        {_km_sql_assign("a2", "c1")}
        SELECT CAST(key % {KMEANS_K} AS BIGINT) AS cid,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM((key // {KMEANS_K}) >> 20) AS BIGINT)
                   AS inertia_scaled
        FROM a2
        GROUP BY CAST(key % {KMEANS_K} AS BIGINT)
        ORDER BY cid
    """,
    description=f"k-means (k={KMEANS_K}, 2 unrolled Lloyd rounds) on "
    "the embedding table over an INTEGER LATTICE: vectors quantize to "
    "2^20 micro-units, distances and per-dimension centroid sums are "
    "exact int64 (|e| < 0.5 and dim 64 keep every squared distance "
    "under 2^45), and updated centroids round back onto the lattice "
    "via FLOOR of a single double division — so both engines walk "
    "IDENTICAL centroid trajectories and the driver hash can check "
    "an iterative ML algorithm bit-for-bit, which float k-means "
    "fundamentally cannot (cross-row double sums are order-"
    "sensitive). Seeds are the 8 vectors with smallest "
    "md5(vec_id) — deterministic, no RNG. Scale shape: per round, "
    "one broadcast of 8 centroids + one map-side distance argmin "
    "(encoded MIN(d2*k+cid) — no window), one posexplode shuffle at "
    "(cid x dim) grain for the update; rounds are a fixed small "
    "constant, the classic broadcast-iteration pattern (same family "
    "as the IVF trainer). Inertia is reported >>20 per row so the "
    "total stays int64-exact at any corpus size.",
)
def emb_kmeans_lloyd_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda e: F.floor(e.cast("double") * F.lit(float(KMEANS_SCALE))).cast(
                "bigint"
            ),
        ).alias("v"),
    )
    qm = q.select("vec_id", "v", F.md5(F.col("vec_id").cast("string")).alias("h"))
    seeds = (
        qm.orderBy("h", "vec_id")
        .limit(KMEANS_K)
        .select(
            (
                F.row_number().over(Window.orderBy("h", "vec_id")) - 1
            )
            .cast("bigint")
            .alias("cid"),
            "v",
        )
    )

    def assign(cents: DataFrame) -> DataFrame:
        d2 = F.aggregate(
            F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        return (
            q.crossJoin(
                F.broadcast(cents.select("cid", F.col("v").alias("cv")))
            )
            .select("vec_id", "cid", d2.alias("d2"))
            .groupBy("vec_id")
            .agg(F.min(F.col("d2") * KMEANS_K + F.col("cid")).alias("key"))
        )

    def centroids(assigned: DataFrame) -> DataFrame:
        e = assigned.join(q, "vec_id").select(
            (F.col("key") % KMEANS_K).cast("bigint").alias("cid"), "v"
        )
        n = e.groupBy("cid").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        dims = (
            e.select("cid", F.posexplode("v").alias("i", "val"))
            .groupBy("cid", "i")
            .agg(F.sum("val").cast("bigint").alias("s"))
        )
        return (
            dims.join(n, "cid")
            .select(
                "cid",
                "i",
                F.floor(F.col("s").cast("double") / F.col("n"))
                .cast("bigint")
                .alias("c"),
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "c"))),
                    lambda x: x["c"],
                ).alias("v")
            )
        )

    a2 = assign(centroids(assign(seeds)))
    return (
        a2.select(
            (F.col("key") % KMEANS_K).cast("bigint").alias("cid"),
            F.shiftright(
                F.expr(f"key div {KMEANS_K}").cast("bigint"), 20
            ).alias("d2s"),
        )
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.sum("d2s").cast("bigint").alias("inertia_scaled"),
        )
        .orderBy("cid")
    )


# --------------------------------------------------- BPE merge rounds

BPE_ROUNDS = 3

# Symbol sequences are carried as separator-wrapped strings
# ("·a··b··c·"): each symbol sits inside its OWN '·' fences, so the
# merge of pair (a,b) is a plain left-to-right non-overlapping
# replace('·a··b·' -> '·ab·') in BOTH engines — replacing never
# consumes a neighbor's fence, and greedy-left replace() is exactly
# BPE's merge order (e.g. 'aaa' + (a,a) -> 'aa','a').

_BPE_SQL_WORDS = r"""
    words AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c
        FROM (
            SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                       AS w
            FROM documents
        )
        WHERE regexp_matches(w, '^[a-z]{2,}$')
        GROUP BY w
    ), r0 AS (
        SELECT w, c,
               '·' || array_to_string(
                   list_filter(string_split_regex(w, ''), x -> x <> ''),
                   '··') || '·' AS s
        FROM words
    )
"""


def _bpe_sql_pairs(name: str, src: str) -> str:
    return f"""
        {name}_p AS (
            SELECT p[1] AS pa, p[2] AS pb, CAST(SUM(c) AS BIGINT) AS cnt
            FROM (
                SELECT c,
                       unnest(list_transform(
                           range(1, len(syms)),
                           i -> [syms[i], syms[i + 1]])) AS p
                FROM (
                    SELECT c,
                           list_filter(string_split(trim(s, '·'), '··'),
                                       x -> x <> '') AS syms
                    FROM {src}
                )
            )
            GROUP BY 1, 2
        ), {name} AS (
            SELECT pa, pb, cnt FROM {name}_p
            ORDER BY cnt DESC, pa, pb LIMIT 1
        )
    """


def _bpe_sql_merge(name: str, src: str, best: str) -> str:
    return f"""
        {name} AS (
            SELECT w, c,
                   replace(s, '·' || pa || '··' || pb || '·',
                           '·' || pa || pb || '·') AS s
            FROM {src}, {best}
        )
    """


def _bpe_learn(spark: SparkSession, sf_dir: str):
    """Shared BPE trainer: returns ([best-pair DFs per round], r0 word
    table with fenced symbol strings, final merged word table)."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
        )
        .filter(F.col("w").rlike("^[a-z]{2,}$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cur = words.select(
        "w",
        "c",
        F.concat(
            F.lit("·"),
            F.array_join(
                F.filter(F.split("w", ""), lambda x: x != ""), "··"
            ),
            F.lit("·"),
        ).alias("s"),
    )
    r0 = cur
    bests = []
    for _ in range(BPE_ROUNDS):
        syms = F.filter(
            F.split(F.expr("trim(BOTH '·' FROM s)"), "··"),
            lambda x: x != "",
        )
        pairs = F.zip_with(
            F.slice(syms, 1, F.size(syms) - 1),
            F.slice(syms, 2, F.size(syms) - 1),
            lambda a, b: F.struct(a.alias("pa"), b.alias("pb")),
        )
        best = (
            cur.select("c", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
            .agg(F.sum("c").cast("bigint").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pa", "pb")
            .limit(1)
        )
        bests.append(best)
        cur = cur.crossJoin(F.broadcast(best.select("pa", "pb"))).select(
            "w",
            "c",
            F.expr(
                "replace(s, concat('·', pa, '··', pb, '·'),"
                " concat('·', pa, pb, '·'))"
            ).alias("s"),
        )
    return bests, r0, cur


@query(
    "text_bpe_merge_rounds",
    oracle=f"""
        WITH {_BPE_SQL_WORDS},
        {_bpe_sql_pairs("b1", "r0")},
        {_bpe_sql_merge("r1", "r0", "b1")},
        {_bpe_sql_pairs("b2", "r1")},
        {_bpe_sql_merge("r2", "r1", "b2")},
        {_bpe_sql_pairs("b3", "r2")}
        SELECT * FROM (
            SELECT CAST(1 AS BIGINT) AS merge_round, pa AS left_sym,
                   pb AS right_sym, cnt AS pair_count FROM b1
            UNION ALL
            SELECT CAST(2 AS BIGINT), pa, pb, cnt FROM b2
            UNION ALL
            SELECT CAST(3 AS BIGINT), pa, pb, cnt FROM b3
        )
        ORDER BY merge_round
    """,
    description=f"Byte-pair-encoding trainer, first {BPE_ROUNDS} merge "
    "rounds — the tokenizer-construction primitive of every LLM data "
    "pipeline. The trainer's classic scale property is exploited "
    "directly: pair statistics are computed on the DISTINCT-WORD "
    "table weighted by word frequency, never on the corpus — and the "
    "distinct-word table saturates (Heaps' law), so each round is a "
    "pass over a vocabulary-bounded relation regardless of corpus "
    "size; the corpus itself is read once for the word counts. Each "
    "round: adjacent-symbol pairs via two array slices zipped "
    "(weighted by word count), global argmax with deterministic "
    "(count DESC, pair ASC) tie-break via TakeOrdered(1), broadcast "
    "of the 1-row winner, and the merge applied as a fence-wrapped "
    "string replace (see module comment) — greedy-left replace IS "
    "BPE merge order, identically in both engines. Output: the "
    "merged pair and its frequency per round.",
)
def text_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    bests, _, _ = _bpe_learn(spark, sf_dir)
    out = None
    for i, b in enumerate(bests, start=1):
        row = b.select(
            F.lit(i).cast("bigint").alias("merge_round"),
            F.col("pa").alias("left_sym"),
            F.col("pb").alias("right_sym"),
            F.col("cnt").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("merge_round")


# ------------------------------------------------- perceptual hash

_PHASH_SQL_HEXB = (
    "(strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16 "
    "+ (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1)"
)


@query(
    "multimodal_phash_dedup",
    oracle=f"""
        WITH ph AS (
            SELECT doc_id, source, md5(text) AS hx FROM documents
        ), pix AS (
            SELECT doc_id, source,
                   list_transform(range(0, 16),
                                  i -> CAST({_PHASH_SQL_HEXB} AS BIGINT))
                       AS b
            FROM ph
        ), hashes AS (
            SELECT doc_id, source,
                   CAST(list_sum(list_transform(range(0, 60), j ->
                       CASE WHEN b[(j % 16) + 1] * 64
                                 > 4 * list_sum(b)
                            THEN CAST(1 AS BIGINT) << j
                            ELSE CAST(0 AS BIGINT) END)) AS BIGINT)
                       AS phash
            FROM pix
        ), clusters AS (
            SELECT source, phash, CAST(COUNT(*) AS BIGINT) AS n
            FROM hashes GROUP BY source, phash
        )
        SELECT source,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_phash,
               CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dup_docs,
               CAST(MAX(n) AS BIGINT) AS max_cluster
        FROM clusters
        GROUP BY source
        ORDER BY source
    """,
    description="Perceptual-hash (aHash) image dedup over the binary "
    "payload lane: payloads flow through the Arrow-batched "
    "mapInPandas perceptual_hash operator (decode -> 8x8 grid -> "
    "60-bit mean-threshold fingerprint packed in int64), then one "
    "16-byte-key shuffle groups identical fingerprints per source — "
    "the visually-identical-image collapse every multimodal training "
    "pipeline runs before embedding, at 1/1000th the cost (the hash "
    "is 8 bytes vs a full CLIP call). Runs the deterministic fake "
    "decode so the DuckDB oracle can recompute every fingerprint "
    "from md5 nibbles with EXACT integer thresholds (pixel*64 > "
    "sum(pixels) — no float mean), proving the distributed Python "
    "lane bit-identical to SQL; the real PNM/BMP decode path of the "
    "same operator is pinned by pytest. Near-dup (hamming-banded) "
    "extension rides the existing simhash banding machinery.",
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(docs, "text")
    ph = perceptual_hash(with_payload, fake=True)
    clusters = (
        ph.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source", "phash")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return (
        clusters.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_phash"),
            (F.sum("n") - F.count(F.lit(1))).cast("bigint").alias("n_dup_docs"),
            F.max("n").cast("bigint").alias("max_cluster"),
        )
        .orderBy("source")
    )
