"""Wave-48 (round 5): SQL-surface corners — NULL-ordering semantics,
deterministic MODE aggregation, and CSV malformed-record modes (the
reference's own format, completing the corrupt-record story the JSONL
lane started).

Portability notes follow the registry grammar (plans/registry.py).
NULL ordering is the classic cross-engine divergence (Spark defaults
NULLS FIRST for ASC, DuckDB NULLS LAST) — every ordering here is
EXPLICIT on both sides, which is exactly the lesson the battery pins.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ NULL ordering

_NULL_VARIANTS = (
    ("asc_nulls_first", "ASC NULLS FIRST"),
    ("asc_nulls_last", "ASC NULLS LAST"),
    ("desc_nulls_first", "DESC NULLS FIRST"),
    ("desc_nulls_last", "DESC NULLS LAST"),
)


@query(
    "sql_nulls_ordering_battery",
    oracle="""
        WITH src AS (
            SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
            FROM customer
        )
        {unions}
        ORDER BY variant, rnk
    """.format(
        unions="\n        UNION ALL\n".join(
            f"""        SELECT '{name}' AS variant, CAST(rnk AS BIGINT) AS rnk,
               c_custkey, seg
        FROM (
            SELECT c_custkey, seg,
                   row_number() OVER (
                       ORDER BY seg {sql}, c_custkey
                   ) AS rnk
            FROM src
        ) WHERE rnk <= 3"""
            for name, sql in _NULL_VARIANTS
        )
    ),
    description="NULL-ordering battery: top-3 customers under every "
    "explicit (ASC|DESC) x (NULLS FIRST|LAST) combination of a "
    "nullable sort key — pinning the classic cross-engine divergence "
    "(Spark defaults NULLS FIRST on ASC, most warehouses NULLS LAST), "
    "which silently reorders any top-k or window over a nullable "
    "column when ported. Every ordering is explicit on both sides; "
    "each variant is a TakeOrdered(3) scan (no global sort "
    "materialization), and the rank is assigned on the 3-row result. "
    "The lesson this battery encodes is applied repo-wide: orderings "
    "over nullable keys always state their null position.",
)
def sql_nulls_ordering_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
    )
    seg = F.col("seg")
    variants = {
        "asc_nulls_first": seg.asc_nulls_first(),
        "asc_nulls_last": seg.asc_nulls_last(),
        "desc_nulls_first": seg.desc_nulls_first(),
        "desc_nulls_last": seg.desc_nulls_last(),
    }
    out = None
    for name, order in variants.items():
        top = cust.orderBy(order, "c_custkey").limit(3)
        w = Window.orderBy(order, "c_custkey")
        part = top.select(
            F.lit(name).alias("variant"),
            F.row_number().over(w).cast("bigint").alias("rnk"),
            "c_custkey",
            "seg",
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy("variant", "rnk")


# ------------------------------------------------- exact MODE


@query(
    "agg_mode_deterministic",
    oracle="""
        WITH counts AS (
            SELECT year(o_orderdate) AS yr, o_orderpriority AS pri,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY 1, 2
        )
        SELECT CAST(yr AS BIGINT) AS yr, pri AS mode_priority, n
        FROM (
            SELECT yr, pri, n,
                   row_number() OVER (
                       PARTITION BY yr ORDER BY n DESC, pri
                   ) AS rk
            FROM counts
        ) WHERE rk = 1
        ORDER BY yr
    """,
    description="Exact MODE (most frequent value) per group with a "
    "DETERMINISTIC tie-break (count desc, value asc) — engines' "
    "built-in mode()/any_value tie behavior is unspecified, so a "
    "portable pipeline must spell the tie-break out; this is the "
    "canonical two-step: reduce to (group, value) counts in one "
    "partial-agg shuffle (the only pass over the fact table), then "
    "rank within each group's bounded value domain (5 priorities "
    "here; any low-cardinality categorical at 100 TB) — the window "
    "partitions by group, never globally.",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.col("o_orderpriority").alias("pri"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("yr").orderBy(F.col("n").desc(), "pri")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("yr").cast("bigint").alias("yr"),
            F.col("pri").alias("mode_priority"),
            "n",
        )
        .orderBy("yr")
    )


# --------------------------------------------- CSV malformed modes

CSV_MODE_KEY_CAP = 500
CSV_MODE_BAD_MOD = 50  # ids % 50 == 0 serialize malformed


@query(
    "format_csv_malformed_modes",
    oracle=f"""
        WITH src AS (
            SELECT o_orderkey AS id FROM orders
            WHERE o_orderkey < {CSV_MODE_KEY_CAP}
        ), marked AS (
            SELECT id, (id % {CSV_MODE_BAD_MOD} = 0) AS bad FROM src
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_corrupt_permissive,
               CAST(SUM(CASE WHEN bad THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_rows_dropmalformed,
               CAST(SUM(CASE WHEN bad THEN 0 ELSE id END) AS BIGINT)
                   AS sum_good_vs,
               TRUE AS failfast_raised
        FROM marked
    """,
    description="CSV malformed-record modes on the reference's own "
    "format (completing the corrupt-record story of the JSONL lane): "
    "every 50th row serializes with a non-numeric field, and the "
    "battery checks all three reader contracts — PERMISSIVE parks "
    "exactly the bad lines in columnNameOfCorruptRecord (nothing "
    "silently dropped), DROPMALFORMED keeps exactly the good rows "
    "(and their id checksum), and FAILFAST raises on first touch "
    "(asserted by executing the read and recording the boolean). "
    "This is the ingest-robustness decision every production CSV "
    "pipeline documents; the reference's inferSchema path is "
    "implicitly PERMISSIVE, so the battery states what that means. "
    "TRAP pinned here: with CSV column pruning (the default), a "
    "query that never reads the unparseable column sees NO "
    "malformation at all — DROPMALFORMED drops nothing and FAILFAST "
    "does not raise — so the drop/fail aggregates below explicitly "
    "reference the bad column to force full-row parsing; robustness "
    "contracts must be validated against the columns a query "
    "actually reads.",
)
def format_csv_malformed_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < CSV_MODE_KEY_CAP
    )
    lines = orders.select(
        F.when(
            F.col("o_orderkey") % CSV_MODE_BAD_MOD == 0,
            F.concat(F.col("o_orderkey").cast("string"), F.lit(",oops")),
        )
        .otherwise(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit(","),
                F.col("o_orderkey").cast("string"),
            )
        )
        .alias("value")
    )
    base = tempfile.mkdtemp(prefix="csv_modes_")
    lines.write.mode("overwrite").text(base)

    permissive = (
        spark.read.schema("id long, v long, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(base)
    )
    # cache: a _corrupt_record column cannot be queried alone (Spark
    # requires a materialized frame when referencing it with filters)
    permissive = permissive.cache()
    stats_p = permissive.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.count("_corrupt_record").cast("bigint").alias(
            "n_corrupt_permissive"
        ),
    )
    dropm = (
        spark.read.schema("id long, v long")
        .option("mode", "DROPMALFORMED")
        .csv(base)
    )
    # referencing v forces the parse (see TRAP note in description)
    stats_d = dropm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows_dropmalformed"),
        F.sum("v").cast("bigint").alias("sum_good_vs"),
    )
    try:
        (
            spark.read.schema("id long, v long")
            .option("mode", "FAILFAST")
            .csv(base)
            .agg(F.sum("v"))
            .collect()
        )
        raised = False
    except Exception:
        raised = True
    return (
        stats_p.crossJoin(F.broadcast(stats_d))
        .withColumn("failfast_raised", F.lit(raised))
        .select(
            "n_lines",
            "n_corrupt_permissive",
            "n_rows_dropmalformed",
            "sum_good_vs",
            "failfast_raised",
        )
    )
