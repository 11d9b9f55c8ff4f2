"""Wave-138 (round 5): primary-key violation audit + integer
division semantics battery.

* ``dq_primary_key_violation_audit`` — found the hard way in this
  very fixture (lineitem's (l_orderkey, l_linenumber) is NOT a
  key, which silently breaks any 'total order' built on it): for
  each declared candidate key, the duplicate-group count, the
  worst multiplicity, and the violating-row share in exact
  permille — the first data-contract check any warehouse should
  run, now a first-class query.
* ``sql_integer_division_semantics_battery`` — the repo's entire
  exact-arithmetic portability story rests on `div` (Spark) and
  `//` (DuckDB) agreeing, including signs: this battery evaluates
  division and modulo over a literal +/- grid in BOTH engines and
  hash-compares — the regression pin for truncation-toward-zero
  and dividend-sign modulo that every other oracle assumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------- PK violation audit


@query(
    "dq_primary_key_violation_audit",
    oracle="""
        SELECT tbl, n_rows, violating_rows, dup_groups,
               max_multiplicity,
               CAST(violating_rows * 1000000 // n_rows AS BIGINT)
                   AS violating_ppm
        FROM (
        SELECT 'lineitem(l_orderkey,l_linenumber)' AS tbl,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                   AS violating_rows,
               CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_groups,
               CAST(MAX(c) AS BIGINT) AS max_multiplicity
        FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber) UNION ALL 
        SELECT 'orders(o_orderkey)' AS tbl,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                   AS violating_rows,
               CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_groups,
               CAST(MAX(c) AS BIGINT) AS max_multiplicity
        FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey) UNION ALL 
        SELECT 'customer(c_custkey)' AS tbl,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                   AS violating_rows,
               CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_groups,
               CAST(MAX(c) AS BIGINT) AS max_multiplicity
        FROM (SELECT COUNT(*) AS c FROM customer GROUP BY c_custkey)
        ) ORDER BY tbl
    """,
    description="Primary-key violation audit for the three declared "
    "candidate keys — born from a REAL finding in this fixture: "
    "lineitem's (l_orderkey, l_linenumber) is not unique, which "
    "silently breaks any 'total order' or merge built on it (the "
    "wave-137 bucketed-lag bug). Per key: duplicate-group count, "
    "worst multiplicity, and violating-row share in exact ppm. "
    "This is the FIRST data-contract check a warehouse should run "
    "on ingest; at 100 TB each key audit is one partial-agg "
    "shuffle on the key (map-side combine does the heavy lifting) "
    "and one bounded rollup. Downstream queries that assume "
    "uniqueness — merges, as-of joins, window orders — are only "
    "safe when this table reads all-zero.",
)
def dq_primary_key_violation_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def audit(df: DataFrame, keys: list, label: str) -> DataFrame:
        g = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("c"))
        return g.agg(
            F.lit(label).alias("tbl"),
            F.sum("c").cast("long").alias("n_rows"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
            .cast("long")
            .alias("violating_rows"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
            .cast("long")
            .alias("dup_groups"),
            F.max("c").cast("long").alias("max_multiplicity"),
        )

    out = (
        audit(
            line,
            ["l_orderkey", "l_linenumber"],
            "lineitem(l_orderkey,l_linenumber)",
        )
        .unionAll(audit(orders, ["o_orderkey"], "orders(o_orderkey)"))
        .unionAll(audit(customer, ["c_custkey"], "customer(c_custkey)"))
    )
    return out.select(
        "tbl",
        "n_rows",
        "violating_rows",
        "dup_groups",
        "max_multiplicity",
        F.expr(
            "CAST(violating_rows * 1000000 div n_rows AS LONG)"
        ).alias("violating_ppm"),
    ).orderBy("tbl")


# -------------------------------- division semantics battery

_GRID = [(a, b) for a in (-7, -5, -1, 0, 1, 5, 7) for b in (-3, -2, 2, 3)]


@query(
    "sql_integer_division_semantics_battery",
    oracle=f"""
        WITH grid(a, b) AS (VALUES {", ".join(
            f"({a}, {b})" for a, b in _GRID)})
        SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
               CAST(a // b AS BIGINT) AS int_div,
               CAST(a % b AS BIGINT) AS int_mod,
               CAST((a // b) * b + (a % b) AS BIGINT) AS reconstructed
        FROM grid ORDER BY a, b
    """,
    description="The regression pin under the repo's entire exact-"
    "arithmetic story: integer division and modulo over a literal "
    "+/- grid, evaluated natively by BOTH engines and hash-"
    "compared. Proves (and keeps proving) that Spark `div` and "
    "DuckDB `//` truncate toward zero identically, that `%` takes "
    "the dividend's sign in both, and that the Euclidean identity "
    "(a div b)*b + a%b = a holds — the assumptions behind every "
    "micro/permille quantization, two-level carry, and HUGEINT/"
    "DECIMAL(38) oracle in the registry. If an engine upgrade ever "
    "shifts these semantics, this query fails loudly before any "
    "subtle hash mismatch appears elsewhere.",
)
def sql_integer_division_semantics_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    grid = spark.createDataFrame(_GRID, "a long, b long")
    return grid.select(
        "a",
        "b",
        F.expr("a div b").cast("long").alias("int_div"),
        F.expr("a % b").cast("long").alias("int_mod"),
        F.expr("(a div b) * b + (a % b)").cast("long").alias(
            "reconstructed"
        ),
    ).orderBy("a", "b")
