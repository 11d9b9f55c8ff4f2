"""Wave-153 (round 5): PRF query expansion + recommendation coverage.

* ``search_prf_query_expansion`` — pseudo-relevance feedback
  (Rocchio-lite) on top of the BM25 machinery: a 2-term seed query
  retrieves 5 feedback documents, expansion terms are selected by
  the exact integer ratio fb_df * 1e6 div corpus_df (common in the
  feedback set, rare in the corpus — the selection-value shape
  without logs), and the expanded 5-term query re-ranks.  The
  output is the final top-10 with each document's pre-expansion
  rank (-1 = newly surfaced), so the query MEASURES what expansion
  changed instead of asserting it.  BM25 scores reuse the floored
  micro-unit idiom (order-insensitive sums, rational-odds idf).
* ``cf_recommendation_coverage`` — recommender evaluation over the
  wave-146 item-item top-3 lists (composed by CALLING that
  registered query): catalog coverage permille, distinct items
  recommended, and popularity bias — the mean popularity rank of
  recommended items in millis against the catalog midpoint, plus
  the share of recommendations drawn from the top-5 most popular
  items.  The standard audit that catches "the recommender only
  recommends bestsellers" before anyone ships it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.tables import load_table
from .analytics120 import cf_item_item_topk
from .registry import query

_PRF_SEEDS = ["spark", "vector"]
_PRF_FB_DOCS = 5
_PRF_EXPANSION = 3
_PRF_K1 = 1.2
_SEEDS_SQL = ", ".join(f"'{t}'" for t in _PRF_SEEDS)


def _bm25_scored_sql(terms_pred: str, alias: str) -> str:
    """BM25 per-doc micro scores for terms matching ``terms_pred``."""
    return f"""{alias}_tf AS (
            SELECT doc_id, dl, term, COUNT(*) AS tf
            FROM hits WHERE {terms_pred}
            GROUP BY doc_id, dl, term
        ), {alias}_df AS (
            SELECT term, COUNT(*) AS df FROM {alias}_tf GROUP BY term
        ), {alias}_scored AS (
            SELECT t.doc_id,
                   CAST(SUM(CAST(FLOOR(
                       ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
                         + 0.5) / (CAST(df AS DOUBLE) + 0.5))
                       * (CAST(tf AS DOUBLE) * ({_PRF_K1} + 1.0)
                          / (CAST(tf AS DOUBLE)
                             + {_PRF_K1} * (0.25 + 0.75
                               * (CAST(dl AS DOUBLE)
                                  / (CAST(total_dl AS DOUBLE)
                                     / CAST(n_docs AS DOUBLE))))))
                       * 1000000.0) AS BIGINT)) AS BIGINT)
                       AS bm25_micro
            FROM {alias}_tf t JOIN {alias}_df USING (term), stats
            GROUP BY t.doc_id
        )"""


@query(
    "search_prf_query_expansion",
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents
        ), dl AS (
            SELECT doc_id, t, len(t) AS dl FROM d
        ), stats AS (
            SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl
        ), hits AS (
            SELECT doc_id, dl, unnest(t) AS term FROM dl
        ), {_bm25_scored_sql(f"term IN ({_SEEDS_SQL})", "r1")},
        r1_rank AS (
            SELECT doc_id, bm25_micro,
                   ROW_NUMBER() OVER (ORDER BY bm25_micro DESC,
                                      doc_id) AS rnk
            FROM r1_scored
        ), fb AS (
            SELECT doc_id FROM r1_rank WHERE rnk <= {_PRF_FB_DOCS}
        ), cand AS (
            SELECT h.term,
                   COUNT(DISTINCT h.doc_id) AS fb_df
            FROM hits h JOIN fb ON fb.doc_id = h.doc_id
            WHERE h.term NOT IN ({_SEEDS_SQL})
            GROUP BY h.term
        ), cdf AS (
            SELECT h.term, COUNT(DISTINCT h.doc_id) AS corpus_df
            FROM hits h
            WHERE h.term IN (SELECT term FROM cand)
            GROUP BY h.term
        ), exp_terms AS (
            SELECT c.term,
                   ROW_NUMBER() OVER (
                       ORDER BY c.fb_df * 1000000 // x.corpus_df
                                DESC, c.term) AS rnk
            FROM cand c JOIN cdf x ON x.term = c.term
        ), q2 AS (
            SELECT term FROM exp_terms WHERE rnk <= {_PRF_EXPANSION}
            UNION ALL
            SELECT UNNEST([{_SEEDS_SQL}])
        ), {_bm25_scored_sql("term IN (SELECT term FROM q2)", "r2")},
        r2_rank AS (
            SELECT doc_id, bm25_micro,
                   ROW_NUMBER() OVER (ORDER BY bm25_micro DESC,
                                      doc_id) AS rnk
            FROM r2_scored
        ), expansion AS (
            SELECT string_agg(term, ',' ORDER BY term)
                       AS expansion_terms
            FROM exp_terms WHERE rnk <= {_PRF_EXPANSION}
        )
        SELECT r2.doc_id,
               CAST(r2.bm25_micro AS BIGINT) AS bm25_micro,
               CAST(r2.rnk AS BIGINT) AS rank_after,
               CAST(COALESCE(r1.rnk, -1) AS BIGINT) AS rank_before,
               e.expansion_terms
        FROM r2_rank r2
        LEFT JOIN r1_rank r1 ON r1.doc_id = r2.doc_id
        CROSS JOIN expansion e
        WHERE r2.rnk <= 10
        ORDER BY rank_after
    """,
    description="Pseudo-relevance-feedback query expansion "
    "(Rocchio-lite): a 2-term seed query retrieves 5 feedback docs, "
    "expansion terms are chosen by the exact integer selection "
    "value fb_df * 1e6 div corpus_df (common in feedback, rare in "
    "the corpus — no logs), and the expanded 5-term query re-ranks; "
    "the final top-10 carries each doc's pre-expansion rank (-1 = "
    "newly surfaced) plus the chosen expansion terms, so the query "
    "MEASURES what expansion changed. BM25 reuses the floored-"
    "micro-unit portability idiom. 100 TB shape: tokenize once "
    "(both passes share hits), term filters are semi-joins against "
    "bounded term sets (candidates limited to 5 docs' vocabulary), "
    "df tables broadcast, and each ranking is a TakeOrdered — the "
    "two-pass structure costs two scans of the postings, which is "
    "what PRF costs everywhere.",
)
def search_prf_query_expansion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens(F.col("text")).alias("t")
    ).select("doc_id", "t", F.size("t").alias("dl"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    hits = toks.select(
        "doc_id", "dl", F.explode("t").alias("term")
    ).localCheckpoint(eager=False)  # shared by both passes

    def bm25(term_filter_df):
        tf = (
            hits.join(F.broadcast(term_filter_df), "term")
            .groupBy("doc_id", "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        dfr = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        avgdl = F.col("total_dl").cast("double") / F.col(
            "n_docs"
        ).cast("double")
        idf = (
            F.col("n_docs").cast("double")
            - F.col("df").cast("double")
            + F.lit(0.5)
        ) / (F.col("df").cast("double") + F.lit(0.5))
        tf_norm = (
            F.col("tf").cast("double") * F.lit(_PRF_K1 + 1.0)
        ) / (
            F.col("tf").cast("double")
            + F.lit(_PRF_K1)
            * (
                F.lit(0.25)
                + F.lit(0.75)
                * (F.col("dl").cast("double") / avgdl)
            )
        )
        return (
            tf.join(F.broadcast(dfr), "term")
            .crossJoin(F.broadcast(stats))
            .select(
                "doc_id",
                F.floor(idf * tf_norm * F.lit(1_000_000.0)).alias(
                    "term_micro"
                ),
            )
            .groupBy("doc_id")
            .agg(F.sum("term_micro").cast("long").alias("bm25_micro"))
        )

    seeds = spark.createDataFrame(
        [(t,) for t in _PRF_SEEDS], "term: string"
    )
    w_rank = Window.orderBy(F.desc("bm25_micro"), F.asc("doc_id"))
    r1 = (
        bm25(seeds)
        .withColumn("rnk", F.row_number().over(w_rank))
        .localCheckpoint(eager=False)  # reused: feedback + rank join
    )
    fb = r1.where(F.col("rnk") <= _PRF_FB_DOCS).select("doc_id")
    cand = (
        hits.join(F.broadcast(fb), "doc_id")
        .where(~F.col("term").isin(_PRF_SEEDS))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("fb_df"))
    )
    cdf = (
        hits.join(F.broadcast(cand.select("term")), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("corpus_df"))
    )
    w_exp = Window.orderBy(
        F.desc(F.expr("fb_df * 1000000 div corpus_df")), F.asc("term")
    )
    exp_ranked = (
        cand.join(cdf, "term")
        .withColumn("rnk", F.row_number().over(w_exp))
        .where(F.col("rnk") <= _PRF_EXPANSION)
        .localCheckpoint(eager=False)
    )
    q2 = exp_ranked.select("term").unionByName(seeds)
    expansion = exp_ranked.agg(
        F.concat_ws(
            ",", F.sort_array(F.collect_list("term"))
        ).alias("expansion_terms")
    )
    r2 = bm25(q2).withColumn("rnk", F.row_number().over(w_rank))
    return (
        r2.where(F.col("rnk") <= 10)
        .join(
            r1.select(
                "doc_id", F.col("rnk").alias("rank_before0")
            ),
            "doc_id",
            "left",
        )
        .crossJoin(F.broadcast(expansion))
        .select(
            "doc_id",
            "bm25_micro",
            F.col("rnk").cast("long").alias("rank_after"),
            F.coalesce("rank_before0", F.lit(-1))
            .cast("long")
            .alias("rank_before"),
            "expansion_terms",
        )
        .orderBy("rank_after")
    )


# ------------------------------------- recommendation coverage

_RC_TOP_POP = 5


@query(
    "cf_recommendation_coverage",
    oracle=f"""
        WITH ob AS (
            SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        ), singles AS (
            SELECT b, CAST(COUNT(*) AS BIGINT) AS c
            FROM ob GROUP BY b
        ), pop AS (
            SELECT b, c,
                   ROW_NUMBER() OVER (ORDER BY c DESC, b) AS pop_rank
            FROM singles
        ), pairs AS (
            SELECT a.b AS ba, b.b AS bb,
                   CAST(COUNT(*) AS BIGINT) AS c_ab
            FROM ob a JOIN ob b ON b.ok = a.ok AND b.b > a.b
            GROUP BY 1, 2
        ), sym AS (
            SELECT ba AS item, bb AS neighbor, c_ab FROM pairs
            UNION ALL
            SELECT bb, ba, c_ab FROM pairs
        ), scored AS (
            SELECT s.item, s.neighbor, s.c_ab,
                   CAST(s.c_ab * s.c_ab * 1000 // (si.c * sn.c)
                        AS BIGINT) AS cos2
            FROM sym s
            JOIN singles si ON si.b = s.item
            JOIN singles sn ON sn.b = s.neighbor
        ), recs AS (
            SELECT item, neighbor FROM (
                SELECT item, neighbor, c_ab, cos2,
                       ROW_NUMBER() OVER (PARTITION BY item
                           ORDER BY cos2 DESC, c_ab DESC, neighbor)
                           AS rnk
                FROM scored
            ) WHERE rnk <= 3
        ), agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_recs,
                   CAST(COUNT(DISTINCT neighbor) AS BIGINT)
                       AS n_recommended_distinct,
                   CAST(SUM(p.pop_rank) AS BIGINT) AS sum_pop_rank,
                   CAST(SUM(CASE WHEN p.pop_rank <= {_RC_TOP_POP}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_top_pop
            FROM recs r JOIN pop p ON p.b = r.neighbor
        ), cat AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS catalog_size
            FROM singles
        )
        SELECT c.catalog_size, a.n_recs, a.n_recommended_distinct,
               CAST(a.n_recommended_distinct * 1000 // c.catalog_size
                    AS BIGINT) AS coverage_permille,
               CAST(a.sum_pop_rank * 1000 // a.n_recs AS BIGINT)
                   AS mean_rec_pop_rank_millis,
               CAST((c.catalog_size + 1) * 500 AS BIGINT)
                   AS catalog_mid_rank_millis,
               CAST(a.n_top_pop * 1000 // a.n_recs AS BIGINT)
                   AS top{_RC_TOP_POP}_pop_share_permille
        FROM agg a CROSS JOIN cat c
    """,
    description="Recommender-evaluation audit over the wave-146 "
    "item-item top-3 lists (composed by calling that registered "
    "query): catalog coverage permille, distinct items surfaced, "
    "mean popularity rank of recommendations in millis vs the "
    "catalog midpoint, and the share of recommendations drawn from "
    "the 5 most popular items — the standard check that catches "
    "'the recommender only recommends bestsellers' (popularity "
    "bias) before it ships. 100 TB shape: inherits the CF query's "
    "one fact shuffle; every metric is an aggregation over the "
    "bounded 25x3 recommendation table joined to the bounded "
    "popularity rank table.",
)
def cf_recommendation_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    recs = cf_item_item_topk(spark, sf_dir).select("item", "neighbor")
    ob = (
        lineitem.join(
            F.broadcast(part), part.p_partkey == lineitem.l_partkey
        )
        .select(
            F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b")
        )
        .distinct()
    )
    singles = ob.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_pop = Window.orderBy(F.desc("c"), F.asc("b"))
    pop = singles.withColumn(
        "pop_rank", F.row_number().over(w_pop)
    ).select(F.col("b").alias("neighbor"), "pop_rank")
    agg = recs.join(F.broadcast(pop), "neighbor").agg(
        F.count(F.lit(1)).cast("long").alias("n_recs"),
        F.countDistinct("neighbor")
        .cast("long")
        .alias("n_recommended_distinct"),
        F.sum("pop_rank").cast("long").alias("sum_pop_rank"),
        F.sum(
            F.when(F.col("pop_rank") <= _RC_TOP_POP, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_top_pop"),
    )
    cat = singles.agg(
        F.count(F.lit(1)).cast("long").alias("catalog_size")
    )
    return agg.crossJoin(F.broadcast(cat)).select(
        "catalog_size",
        "n_recs",
        "n_recommended_distinct",
        F.expr("n_recommended_distinct * 1000 div catalog_size")
        .cast("long")
        .alias("coverage_permille"),
        F.expr("sum_pop_rank * 1000 div n_recs")
        .cast("long")
        .alias("mean_rec_pop_rank_millis"),
        F.expr("(catalog_size + 1) * 500")
        .cast("long")
        .alias("catalog_mid_rank_millis"),
        F.expr("n_top_pop * 1000 div n_recs")
        .cast("long")
        .alias(f"top{_RC_TOP_POP}_pop_share_permille"),
    )
