"""Wave-209 (round 5): inventory hygiene.

* ``inventory_dead_stock_audit`` — dead stock by brand: parts whose
  last shipment is older than 180 days before the corpus horizon
  (max ship date — the fixture-relative cutoff, so the query is
  scale- and vintage-agnostic), with counts and the retail capital
  tied up in them — the working-capital number inventory reviews
  open with.

* ``assortment_coverage_gaps`` — the anti-division: which (brand,
  market segment) cells have NO sales at all? The full brand x
  segment lattice (both sides bounded dims) anti-joined with the
  observed combinations; per brand, the uncovered segments and the
  gap rate — the assortment white-space map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_DS_DAYS = 180


@query(
    "inventory_dead_stock_audit",
    oracle=f"""
        WITH horizon AS (
            SELECT MAX(CAST(l_shipdate AS DATE)) AS h FROM lineitem
        ), last_ship AS (
            SELECT l_partkey AS pk,
                   MAX(CAST(l_shipdate AS DATE)) AS last_d
            FROM lineitem GROUP BY 1
        ), flagged AS (
            SELECT p.p_brand AS brand,
                   CAST(CAST(p.p_retailprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS price_cents,
                   CASE WHEN ls.pk IS NULL THEN 'never_sold'
                        WHEN date_diff('day', ls.last_d,
                             (SELECT h FROM horizon)) > {_DS_DAYS}
                        THEN 'dead'
                        ELSE 'active' END AS stock_class
            FROM part p LEFT JOIN last_ship ls ON ls.pk = p.p_partkey
        )
        SELECT brand, stock_class,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(price_cents) AS BIGINT) AS capital_cents
        FROM flagged
        GROUP BY brand, stock_class
        ORDER BY brand, stock_class
    """,
    description="Dead-stock audit by brand: parts are classed as "
    "never_sold (no shipment at all), dead (last shipment more than "
    "180 days before the corpus horizon — the cutoff is relative to "
    "MAX ship date, so the query is vintage-agnostic), or active, "
    "with part counts and the retail capital tied up per class — "
    "the working-capital slide every inventory review opens with. "
    "100 TB shape: one part-grain MAX aggregation (partial-agg "
    "friendly), a left join against the bounded part dim, one "
    "bounded rollup; the horizon is a 1-row broadcast.",
)
def inventory_dead_stock_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    horizon = li.agg(
        F.max(F.col("l_shipdate").cast("date")).alias("h")
    )
    last_ship = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.max(F.col("l_shipdate").cast("date")).alias("last_d")
    )
    flagged = (
        part.join(last_ship, last_ship.pk == part.p_partkey, "left")
        .crossJoin(F.broadcast(horizon))
        .selectExpr(
            "p_brand AS brand",
            "CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100"
            " AS BIGINT) AS price_cents",
            f"CASE WHEN pk IS NULL THEN 'never_sold'"
            f" WHEN datediff(h, last_d) > {_DS_DAYS} THEN 'dead'"
            f" ELSE 'active' END AS stock_class",
        )
    )
    return (
        flagged.groupBy("brand", "stock_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("price_cents").cast("long").alias("capital_cents"),
        )
        .orderBy("brand", "stock_class")
    )


@query(
    "assortment_coverage_gaps",
    oracle="""
        WITH brands AS (
            SELECT DISTINCT p_brand AS brand FROM part
        ), segs AS (
            SELECT DISTINCT c_mktsegment AS seg FROM customer
        ), observed AS (
            SELECT DISTINCT p.p_brand AS brand,
                   c.c_mktsegment AS seg
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN part p ON p.p_partkey = l.l_partkey
        ), lattice AS (
            SELECT b.brand, s.seg FROM brands b CROSS JOIN segs s
        ), gaps AS (
            SELECT l.brand, l.seg
            FROM lattice l ANTI JOIN observed o
              ON o.brand = l.brand AND o.seg = l.seg
        )
        SELECT b.brand,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM segs)
                   AS n_segments,
               CAST(COUNT(g.seg) AS BIGINT) AS uncovered_segments,
               COALESCE(CAST(MIN(g.seg) AS VARCHAR), '')
                   AS first_gap_segment
        FROM brands b LEFT JOIN gaps g ON g.brand = b.brand
        GROUP BY b.brand
        ORDER BY b.brand
    """,
    description="Assortment white space as an anti-division: the "
    "full brand x segment lattice (a cross of two BOUNDED dims — "
    "the one place a cross join is the right plan) anti-joined with "
    "the observed sales combinations, rolled up per brand with the "
    "uncovered-segment count and the first gap named. Zero rows of "
    "fact data are ever crossed — the fact table only contributes "
    "the distinct observed pairs. 100 TB shape: one distinct-pair "
    "reduction over the star join (partial-agg friendly), a 125-row "
    "lattice, an anti join on the lattice side — the merchandising "
    "gap map at dim cost.",
)
def assortment_coverage_gaps(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    brands = part.select(F.col("p_brand").alias("brand")).distinct()
    segs = customer.select(
        F.col("c_mktsegment").alias("seg")
    ).distinct()
    observed = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .select(
            F.col("p_brand").alias("obrand"),
            F.col("c_mktsegment").alias("oseg"),
        )
        .distinct()
    )
    lattice = brands.crossJoin(F.broadcast(segs))
    gaps = lattice.join(
        observed,
        (observed.obrand == lattice.brand)
        & (observed.oseg == lattice.seg),
        "left_anti",
    )
    n_segs = segs.agg(
        F.count(F.lit(1)).cast("long").alias("n_segments")
    )
    return (
        brands.join(
            gaps.withColumnRenamed("brand", "gbrand"),
            F.col("gbrand") == F.col("brand"),
            "left",
        )
        .groupBy("brand")
        .agg(
            F.count("seg").cast("long").alias("uncovered_segments"),
            F.coalesce(F.min("seg").cast("string"), F.lit("")).alias(
                "first_gap_segment"
            ),
        )
        .crossJoin(F.broadcast(n_segs))
        .select(
            "brand",
            "n_segments",
            "uncovered_segments",
            "first_gap_segment",
        )
        .orderBy("brand")
    )
