"""Wave-9 analytics: inverted-index construction and hierarchical
percent-of-parent shares.

  inverted_index_top_terms  token -> (document frequency, posting list)
                            — the retrieval-index build pass
  share_of_parent_revenue   nation share within region, region share
                            of total, from ONE aggregation + windows

Oracle conventions follow plans/registry.py. Posting lists are emitted
as comma-joined strings (the driver's hash compare stringifies cells,
and engine list types stringify differently — a joined string is
portable; the array form is one `split` away).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import dec, query

TOP_TERMS = 25
POSTINGS_CAP = 10


@query(
    "inverted_index_top_terms",
    oracle=f"""
        WITH tok AS (
            SELECT DISTINCT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                       AS term
            FROM documents
        ), idx AS (
            SELECT term,
                   COUNT(*) AS df,
                   array_to_string(
                       (list(doc_id ORDER BY doc_id))[1:{POSTINGS_CAP}],
                       ',') AS postings
            FROM tok GROUP BY term
        )
        SELECT term, df, postings FROM idx
        ORDER BY df DESC, term
        LIMIT {TOP_TERMS}
    """,
    description="Inverted-index build over the corpus: per term the "
    "document frequency and the first 10 postings (sorted doc ids, "
    "comma-joined). One tokenize+explode -> distinct (doc, term) -> "
    "term-keyed aggregation; posting arrays are built per term with "
    "sort_array over the collected group — the shuffle carries "
    "(term, doc_id) pairs only, and the cap bounds per-term output "
    "(a full index would write the whole list; top-terms view caps "
    "for the result set). The core retrieval/RAG indexing pass.",
)
def inverted_index_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    ).distinct()
    idx = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, POSTINGS_CAP), ","
        ).alias("postings"),
    )
    return idx.orderBy(F.col("df").desc(), "term").limit(TOP_TERMS)


@query(
    "share_of_parent_revenue",
    oracle="""
        WITH base AS (
            SELECT r_name, n_name,
                   SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS rev
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        )
        SELECT r_name, n_name,
               CAST(rev AS DOUBLE) AS nation_revenue,
               round(CAST(rev AS DOUBLE)
                     / CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE),
                     6) AS share_of_region,
               round(CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE)
                     / CAST(SUM(rev) OVER () AS DOUBLE), 6)
                   AS region_share_of_total
        FROM base
        ORDER BY r_name, n_name
    """,
    description="Percent-of-parent OLAP shares: nation revenue share "
    "within its region and the region's share of the grand total, "
    "computed from ONE exact-decimal aggregation plus two window "
    "sums over the tiny (region, nation) frame — no second scan, no "
    "self-join. Window partial sums stay DECIMAL (exact, order-"
    "insensitive); each share is one double division.",
)
def share_of_parent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(dec("o_totalprice")).alias("rev"))
    )
    region_w = Window.partitionBy("r_name")
    total_w = Window.partitionBy()
    return base.select(
        "r_name",
        "n_name",
        F.col("rev").cast("double").alias("nation_revenue"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(region_w).cast("double"), 6
        ).alias("share_of_region"),
        F.round(
            F.sum("rev").over(region_w).cast("double")
            / F.sum("rev").over(total_w).cast("double"),
            6,
        ).alias("region_share_of_total"),
    ).orderBy("r_name", "n_name")
