"""Wave-14: remaining TPC-H query shapes adapted to the fixture
schema, plus map-type and positional-explode coverage.

  q9_shaped_profit_by_nation_year  5-table profit rollup (Q9 shape;
                                   partsupp cost replaced by a
                                   retail-price cost proxy)
  q22_shaped_dormant_high_balance  above-average balance + anti-join
                                   dormancy (Q22 shape; phone prefix
                                   replaced by a nation band)
  map_function_battery             map_from_entries / transform_values
                                   / map_filter / map_zip_with /
                                   element_at, scalar-portable output
  posexplode_reconstruction        position-aware explode, ordered
                                   reassembly must equal the source

Oracle conventions per plans/registry.py. Map-typed values never
cross the oracle boundary — the DuckDB side recomputes the same
scalars relationally, so the hash compares values, not engine map
renderings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import charge, dec, query, SQL_CHARGE

PART_FILTER = "widget"
COST_FACTOR_SQL = "CAST(0.4 AS DECIMAL(2,1))"


@query(
    "q9_shaped_profit_by_nation_year",
    oracle=f"""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(SUM({SQL_CHARGE}
                        - CAST(p_retailprice AS DECIMAL(15,2))
                          * CAST(l_quantity AS DECIMAL(15,2))
                          * {COST_FACTOR_SQL}) AS DOUBLE) AS profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%{PART_FILTER}%'
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
    """,
    description="TPC-H Q9 shape (profit by supplier nation and order "
    "year) adapted to the fixture schema: the partsupp supply cost "
    "(absent here) becomes a retail-price cost proxy, keeping Q9's "
    "plan shape — a part-name filter that prunes the fact scan "
    "through a broadcast semi-side, three broadcast dims, one "
    "orderkey-equi join to orders, and a (nation, year) rollup of an "
    "exact-DECIMAL profit expression. Cites reference coverage: the "
    "reference's published query set has no Q9 analogue; this "
    "extends the [EXT] relational tier.",
)
def q9_shaped_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(PART_FILTER)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    cost = (
        dec("p_retailprice") * dec("l_quantity") * F.expr(COST_FACTOR_SQL)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(charge() - cost).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


DORMANT_CUTOFF = "1996-01-01"
BIG_ORDER = 300_000.0  # "large order" floor: keeps the dormant set non-empty at fixture density


@query(
    "q22_shaped_dormant_high_balance",
    oracle=f"""
        WITH avg_bal AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS ab
            FROM customer WHERE c_acctbal > 0.0
        ), dormant AS (
            SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
            FROM customer c CROSS JOIN avg_bal
            WHERE c.c_acctbal > ab
              AND NOT EXISTS (
                  SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{DORMANT_CUTOFF}'
                    AND o.o_totalprice > {BIG_ORDER}
              )
        )
        SELECT CAST(c_nationkey % 5 AS INT) AS nation_band,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE)
                   AS total_balance
        FROM dormant GROUP BY 1 ORDER BY 1
    """,
    description="TPC-H Q22 shape (high-balance customers gone "
    "dormant): balance above the positive-balance average (scalar "
    "subquery, exact-decimal mean), no large orders since the cutoff "
    "(anti-join / NOT EXISTS), rolled up by a nation band standing "
    "in for Q22's phone prefix. Spark decorrelates the EXISTS to a "
    "left-anti hash join and the scalar average broadcasts — the "
    "plan Q22 wants at scale: one fact anti-probe, no per-row "
    "subquery execution.",
)
def q22_shaped_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("ab")
    )
    recent = orders.filter(
        (F.col("o_orderdate") >= F.lit(DORMANT_CUTOFF).cast("timestamp"))
        & (F.col("o_totalprice") > BIG_ORDER)
    ).select("o_custkey")
    dormant = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
    )
    return (
        dormant.groupBy((F.col("c_nationkey") % 5).cast("int").alias("nation_band"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_balance"),
        )
        .orderBy("nation_band")
    )


@query(
    "map_function_battery",
    oracle="""
        WITH per_flag AS (
            SELECT l_orderkey, l_returnflag AS flag, COUNT(*) AS cnt
            FROM lineitem GROUP BY 1, 2
        ), per_order AS (
            SELECT l_orderkey,
                   COUNT(*) AS n_flags,
                   COALESCE(SUM(CASE WHEN flag = 'R' THEN cnt END), 0)
                       AS r_lines,
                   2 * COALESCE(SUM(CASE WHEN flag = 'R' THEN cnt END), 0)
                       AS doubled_r,
                   COUNT(CASE WHEN cnt >= 2 THEN 1 END) AS heavy_flags,
                   SUM(cnt) AS total_lines
            FROM per_flag GROUP BY 1
        )
        SELECT o_orderstatus AS status,
               COUNT(*) AS n_orders,
               CAST(SUM(n_flags) AS BIGINT) AS sum_flags,
               CAST(SUM(r_lines) AS BIGINT) AS sum_r_lines,
               CAST(SUM(doubled_r) AS BIGINT) AS sum_doubled_r,
               CAST(SUM(heavy_flags) AS BIGINT) AS sum_heavy_flags,
               CAST(SUM(total_lines) AS BIGINT) AS sum_zipped
        FROM per_order p JOIN orders ON p.l_orderkey = o_orderkey
        GROUP BY status ORDER BY status
    """,
    description="Map-type function battery, scalar-portable: per "
    "order a flag->count map is built with map_from_entries, then "
    "exercised through transform_values (doubling), map_filter "
    "(counts >= 2), map_zip_with (doubled minus original == "
    "original), element_at lookups, and cardinality; per-status "
    "sums of those scalars are the result. The oracle recomputes "
    "the identical scalars relationally — map values never cross "
    "the engine boundary, only the arithmetic they imply. Verifies "
    "Spark's map surface end-to-end without betting the hash on "
    "engine-specific map rendering.",
)
def map_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_flag = li.groupBy("l_orderkey", F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mapped = per_flag.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("flag", "cnt")))
        ).alias("m")
    )
    m = F.col("m")
    m2 = F.transform_values(m, lambda k, v: v * 2)
    mf = F.map_filter(m, lambda k, v: v >= 2)
    zipped = F.map_zip_with(
        m,
        m2,
        lambda k, v1, v2: F.coalesce(v2, F.lit(0)) - F.coalesce(v1, F.lit(0)),
    )
    per_order = mapped.select(
        "l_orderkey",
        F.map_entries(m).alias("_ignore"),  # exercise map_entries too
        F.size(F.map_keys(m)).alias("n_flags"),
        F.coalesce(F.element_at(m, "R"), F.lit(0)).alias("r_lines"),
        F.coalesce(F.element_at(m2, "R"), F.lit(0)).alias("doubled_r"),
        F.size(F.map_keys(mf)).alias("heavy_flags"),
        F.aggregate(
            F.map_values(zipped), F.lit(0).cast("bigint"), lambda acc, v: acc + v
        ).alias("sum_zipped"),
    ).drop("_ignore")
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_flags").cast("bigint").alias("sum_flags"),
            F.sum("r_lines").cast("bigint").alias("sum_r_lines"),
            F.sum("doubled_r").cast("bigint").alias("sum_doubled_r"),
            F.sum("heavy_flags").cast("bigint").alias("sum_heavy_flags"),
            F.sum("sum_zipped").cast("bigint").alias("sum_zipped"),
        )
        .orderBy("status")
    )


@query(
    "posexplode_reconstruction",
    oracle=r"""
        WITH t AS (
            SELECT doc_id, lang, trim(text) AS tt FROM documents
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               COUNT(CASE WHEN array_to_string(
                              regexp_split_to_array(tt, '\s+'), ' ')
                          = regexp_replace(tt, '\s+', ' ', 'g')
                     THEN 1 END) AS n_reconstructed
        FROM t GROUP BY lang ORDER BY lang
    """,
    description="Positional explode round-trip: posexplode the "
    "token array, reassemble each document by collecting (pos, "
    "token) structs and sorting on position — never trusting "
    "collect_list order — and check the reassembly equals the "
    "whitespace-normalized source. n_reconstructed == n_docs is the "
    "self-verifying invariant; the oracle states the same equality "
    "directly on the split/rejoin. Pins that position indexes "
    "survive the shuffle between explode and re-aggregation — the "
    "correctness property every chunk-and-reassemble pipeline "
    "(sequence packing, passage dedup) silently depends on.",
)
def posexplode_reconstruction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.trim(F.col("text")).alias("tt"),
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "tok"),
    )
    recon = tok.groupBy("doc_id", "lang", "tt").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("recon")
    )
    return (
        recon.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(
                F.when(
                    F.col("recon")
                    == F.regexp_replace(F.col("tt"), r"\s+", " "),
                    1,
                )
            ).alias("n_reconstructed"),
        )
        .orderBy("lang")
    )
