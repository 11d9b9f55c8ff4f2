"""Wave-171 (round 5): FP&A revenue bridge + positional phrase search.

* ``finance_price_volume_bridge`` — the price-volume bridge every
  FP&A review opens with: per market segment, the 1996 -> 1997
  revenue delta decomposes into a volume effect at old unit price
  ((q2-q1) * p1, with p1 the permille-cents truncated unit price)
  and a price/mix effect defined as the exact REMAINDER — so the
  identity volume + price = delta holds to the cent by construction
  rather than by floating-point luck.

* ``search_phrase_positional_index`` — a 3-token phrase query run
  BOTH ways: through a positional inverted index (postings filtered
  to the phrase tokens, self-joined on pos+1/pos+2 — the IR
  engine's path) and through a whitespace-normalized LIKE scan (the
  brute-force truth). The output carries both counts and their
  equality flag — the index correctness proof is a query result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_PVB_Y1 = 1996
_PVB_Y2 = 1997


@query(
    "finance_price_volume_bridge",
    oracle=f"""
        WITH lines AS (
            SELECT c.c_mktsegment AS seg,
                   EXTRACT(year FROM o.o_orderdate) AS yr,
                   CAST(l.l_quantity AS BIGINT) AS qty,
                   CAST(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS cents
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE EXTRACT(year FROM o.o_orderdate)
                  IN ({_PVB_Y1}, {_PVB_Y2})
        ), seg_years AS (
            SELECT seg,
                   CAST(SUM(CASE WHEN yr = {_PVB_Y1} THEN qty
                        ELSE 0 END) AS BIGINT) AS q1,
                   CAST(SUM(CASE WHEN yr = {_PVB_Y2} THEN qty
                        ELSE 0 END) AS BIGINT) AS q2,
                   CAST(SUM(CASE WHEN yr = {_PVB_Y1} THEN cents
                        ELSE 0 END) AS BIGINT) AS r1,
                   CAST(SUM(CASE WHEN yr = {_PVB_Y2} THEN cents
                        ELSE 0 END) AS BIGINT) AS r2
            FROM lines GROUP BY seg
        )
        SELECT seg, q1, q2, r1, r2,
               CAST((q2 - q1) * (r1 * 1000 // q1) // 1000 AS BIGINT)
                   AS volume_effect_cents,
               CAST((r2 - r1)
                    - (q2 - q1) * (r1 * 1000 // q1) // 1000 AS BIGINT)
                   AS price_mix_effect_cents
        FROM seg_years
        ORDER BY seg
    """,
    description="The FP&A price-volume bridge, cent-exact: per "
    "market segment the 1996->1997 revenue delta splits into a "
    "volume effect at old unit price ((q2-q1) * trunc-permille unit "
    "price p1) and a price/mix effect defined as the exact REMAINDER "
    "— so volume + price = delta holds to the cent by construction, "
    "not by float luck (r1*1000 products <= ~1e17 stay in int64 at "
    "sf1; the unit-price quantization is the documented truncating "
    "div, identical in both engines). 100 TB shape: one star join "
    "(dims broadcastable) filtered to two years — the filter reaches "
    "the scan — then one partial-agg shuffle to 5 segment rows; the "
    "revenue-review query that runs on every finance lakehouse.",
)
def finance_price_volume_bridge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lines = (
        li.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .where(F.year("o_orderdate").isin(_PVB_Y1, _PVB_Y2))
        .selectExpr(
            "c_mktsegment AS seg",
            "year(o_orderdate) AS yr",
            "CAST(l_quantity AS BIGINT) AS qty",
            "CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100"
            " AS BIGINT) AS cents",
        )
    )
    seg_years = lines.groupBy("seg").agg(
        F.sum(F.when(F.col("yr") == _PVB_Y1, F.col("qty")).otherwise(0))
        .cast("long")
        .alias("q1"),
        F.sum(F.when(F.col("yr") == _PVB_Y2, F.col("qty")).otherwise(0))
        .cast("long")
        .alias("q2"),
        F.sum(
            F.when(F.col("yr") == _PVB_Y1, F.col("cents")).otherwise(0)
        )
        .cast("long")
        .alias("r1"),
        F.sum(
            F.when(F.col("yr") == _PVB_Y2, F.col("cents")).otherwise(0)
        )
        .cast("long")
        .alias("r2"),
    )
    return seg_years.selectExpr(
        "seg",
        "q1",
        "q2",
        "r1",
        "r2",
        "CAST((q2 - q1) * (r1 * 1000 div q1) div 1000 AS BIGINT)"
        " AS volume_effect_cents",
        "CAST((r2 - r1) - (q2 - q1) * (r1 * 1000 div q1) div 1000"
        " AS BIGINT) AS price_mix_effect_cents",
    ).orderBy("seg")


_PHRASE = ("table", "value", "part")


@query(
    "search_phrase_positional_index",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, len(arr) + 1),
                          i -> {{'pos': i, 'tok': arr[i]}}),
                          recursive := true)
            FROM (SELECT doc_id,
                         regexp_split_to_array(trim(text), '\s+') AS arr
                  FROM documents)
        ), postings AS MATERIALIZED (
            SELECT doc_id, pos, tok FROM toks
            WHERE tok IN ('{_PHRASE[0]}', '{_PHRASE[1]}',
                          '{_PHRASE[2]}')
        ), hits AS (
            SELECT p1.doc_id
            FROM postings p1
            JOIN postings p2 ON p2.doc_id = p1.doc_id
                 AND p2.pos = p1.pos + 1
            JOIN postings p3 ON p3.doc_id = p1.doc_id
                 AND p3.pos = p1.pos + 2
            WHERE p1.tok = '{_PHRASE[0]}'
              AND p2.tok = '{_PHRASE[1]}'
              AND p3.tok = '{_PHRASE[2]}'
        ), via_index AS (
            SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_idx,
                   CAST(COUNT(*) AS BIGINT) AS n_occurrences
            FROM hits
        ), via_like AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_like
            FROM documents
            WHERE concat(' ',
                  regexp_replace(trim(text), '\s+', ' ', 'g'), ' ')
                  LIKE '% {" ".join(_PHRASE)} %'
        )
        SELECT i.n_docs_idx, i.n_occurrences, l.n_docs_like,
               i.n_docs_idx = l.n_docs_like AS index_matches_scan
        FROM via_index i CROSS JOIN via_like l
    """,
    description="A 3-token phrase query ('"
    + " ".join(_PHRASE)
    + "') answered BOTH ways: through a positional inverted index "
    "(postings filtered to the phrase tokens only — a tiny fraction "
    "of the corpus — self-joined on pos+1/pos+2 within doc, the IR "
    "engine's path) and through a whitespace-normalized padded LIKE "
    "scan (the brute-force truth). The result carries both doc "
    "counts, the occurrence count, and their equality flag — the "
    "index-correctness proof IS the query output. 100 TB shape: the "
    "postings filter prunes before any join (predicate reaches the "
    "scan), the positional joins are equi-joins on (doc, pos) keys, "
    "and the LIKE lane exists only as the audit; at scale you run "
    "the index lane alone.",
)
def search_phrase_positional_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").localCheckpoint(
        eager=False
    )  # feeds the index lane + the LIKE audit lane
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    postings = toks.where(
        F.col("tok").isin(*_PHRASE)
    ).localCheckpoint(eager=False)  # 3-way self-join source
    p1 = postings.where(F.col("tok") == _PHRASE[0]).select(
        "doc_id", F.col("pos").alias("pos1")
    )
    p2 = postings.where(F.col("tok") == _PHRASE[1]).select(
        F.col("doc_id").alias("d2"), F.col("pos").alias("pos2")
    )
    p3 = postings.where(F.col("tok") == _PHRASE[2]).select(
        F.col("doc_id").alias("d3"), F.col("pos").alias("pos3")
    )
    hits = p1.join(
        p2,
        (F.col("d2") == F.col("doc_id"))
        & (F.col("pos2") == F.col("pos1") + 1),
    ).join(
        p3,
        (F.col("d3") == F.col("doc_id"))
        & (F.col("pos3") == F.col("pos1") + 2),
    )
    via_index = hits.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs_idx"),
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
    )
    needle = " " + " ".join(_PHRASE) + " "
    via_like = docs.where(
        F.concat(
            F.lit(" "),
            F.regexp_replace(F.trim(F.col("text")), r"\s+", " "),
            F.lit(" "),
        ).contains(needle)
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs_like"))
    return via_index.crossJoin(F.broadcast(via_like)).select(
        "n_docs_idx",
        "n_occurrences",
        "n_docs_like",
        (F.col("n_docs_idx") == F.col("n_docs_like")).alias(
            "index_matches_scan"
        ),
    )
