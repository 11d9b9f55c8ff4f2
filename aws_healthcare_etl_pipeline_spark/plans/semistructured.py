"""Semi-structured & collection-function coverage: typed from_json,
JSON key exploration, array-function battery, regexp extraction, and
approximate aggregates (SURVEY.md §2.6 tail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load_table
from .registry import query


@query(
    "json_typed_struct",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="from_json with an explicit schema (typed struct access, "
    "single parse) — vs the string-path get_json_object variant.",
)
def json_typed_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    return (
        events.withColumn("p", F.from_json("props", schema))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("p.k")).alias("sum_k"))
        .orderBy("event_type")
    )


@query(
    "json_keys_map",
    oracle="""
        SELECT key, COUNT(*) AS n
        FROM (
            SELECT unnest(json_keys(props)) AS key FROM events
        ) t
        GROUP BY key
        ORDER BY key
    """,
    description="JSON parsed as map<string,long>: map_keys + explode to "
    "inventory the key space.",
)
def json_keys_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return (
        events.select(F.explode(F.map_keys(m)).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("key")
    )


@query(
    "array_ops_battery",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
            FROM documents
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               list_contains(toks, 'data') AS has_data,
               array_to_string(list_sort(toks)[1:3], '|') AS first3_joined
        FROM t
        WHERE doc_id < 50
        ORDER BY doc_id
    """,
    description="Array-function battery: size, contains, sort, slice, join.",
)
def array_ops_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    base = docs.select("doc_id", toks.alias("toks"))
    # array-typed OUTPUT columns are avoided in oracle-checked queries —
    # value-hash comparators don't agree on array representation; the
    # sorted slice is surfaced as a joined string instead.
    return base.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.array_contains("toks", "data").alias("has_data"),
        F.concat_ws("|", F.slice(F.sort_array("toks"), 1, 3)).alias("first3_joined"),
    ).orderBy("doc_id")


@query(
    "regexp_extraction",
    oracle="""
        SELECT o_orderpriority,
               CAST(regexp_extract(o_orderpriority, '^(\\d+)', 1) AS INT)
                   AS priority_num,
               regexp_extract(o_orderpriority, '^\\d+-(\\w+)', 1) AS priority_name,
               COUNT(*) AS n
        FROM orders
        GROUP BY 1, 2, 3
        ORDER BY o_orderpriority
    """,
    description="regexp_extract with capture groups (same RE semantics both "
    "engines).",
)
def regexp_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            "o_orderpriority",
            F.regexp_extract("o_orderpriority", r"^(\d+)", 1)
            .cast("int")
            .alias("priority_num"),
            F.regexp_extract("o_orderpriority", r"^\d+-(\w+)", 1).alias(
                "priority_name"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


@query(
    "approx_aggregates",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS exact_parts,
               COUNT(DISTINCT l_suppkey) AS exact_supps,
               COUNT(*) AS n,
               TRUE AS approx_parts_ok,
               TRUE AS approx_supps_ok,
               TRUE AS approx_median_ok
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    description="approx_count_distinct + approx percentile. HLL/KLL "
    "sketch values differ across engines by design, so the sketches "
    "can't be hash-compared directly; instead the query emits the "
    "EXACT aggregates (oracle-verified) alongside self-graded booleans "
    "asserting each Spark sketch lands within its documented error "
    "bound of the exact value (HLL rsd 5% default -> 15% gate; "
    "median within the p25..p75 band). A sketch regression flips a "
    "boolean and fails the hash gate.",
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct("l_partkey").alias("ap"),
        F.approx_count_distinct("l_suppkey").alias("asu"),
        F.percentile_approx("l_extendedprice", 0.5).alias("amed"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("p75"),
    )

    def within(approx, exact, tol):
        return (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= tol * exact.cast("double")
        )

    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_supps",
        "n",
        within(F.col("ap"), F.col("exact_parts"), 0.15).alias("approx_parts_ok"),
        within(F.col("asu"), F.col("exact_supps"), 0.15).alias("approx_supps_ok"),
        F.col("amed").between(F.col("p25"), F.col("p75")).alias("approx_median_ok"),
    ).orderBy("l_returnflag")


@query(
    "json_variant_extract",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS max_k,
               COUNT(CASE WHEN json_extract_string(props, '$.k') IS NULL
                          THEN 1 END) AS n_missing
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Spark 4 VariantType path: parse_json once into an "
    "open-schema VARIANT column, variant_get typed extraction — the "
    "schema-on-read lane for semi-structured data that avoids both "
    "per-access string re-parsing (get_json_object) and a frozen "
    "from_json schema. Same aggregate as the typed-struct variant so "
    "the three JSON lanes are cross-checked against one oracle shape.",
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = events.withColumn("v", F.parse_json("props"))
    k = F.variant_get("v", "$.k", "long")
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.count(F.when(k.isNull(), 1)).alias("n_missing"),
        )
        .orderBy("event_type")
    )
