"""Wave-34: corpus datasheet + diversity index — the two summary
artifacts a dataset release ships (the "data card" numbers and a
concentration measure), both in pure rational arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint_md5, token_count, tokens
from ..sources.tables import load_table
from .registry import query


@query(
    "pipeline_corpus_card",
    oracle="""
        WITH base AS (
            SELECT doc_id, lang, source,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS nt,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                       AS fp
            FROM documents
        ), r AS (
            SELECT *,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY nt, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM base
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(SUM(nt) AS BIGINT) AS total_tokens,
               CAST(CAST(SUM(nt) AS BIGINT) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS mean_tokens,
               COUNT(*) - COUNT(DISTINCT fp) AS n_dup_docs,
               CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS dup_frac,
               MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                        THEN nt END) AS p50_tokens,
               MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                        THEN nt END) AS p90_tokens
        FROM r
        GROUP BY lang
        ORDER BY lang
    """,
    description="Per-language corpus datasheet (the 'data card' table "
    "a dataset release publishes): doc/source counts, token totals "
    "and mean, exact-duplicate count and fraction (via md5 "
    "fingerprints), and p50/p90 token lengths by the explicit-rank "
    "convention (row_number against ceil(q*n) — discrete values, no "
    "interpolation, engine-identical). One pass computes "
    "fingerprints and lengths; the rank windows partition by lang "
    "and spill externally per partition (the sanctioned entity-grain "
    "rank pattern — same as gini/weighted-median), and everything "
    "else is partial-aggregated. All ratios divide exact integers "
    "once.",
)
def pipeline_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        token_count(F.col("text")).alias("nt"),
        fingerprint_md5(F.col("text")).alias("fp"),
    )
    w_rank = Window.partitionBy("lang").orderBy("nt", "doc_id")
    w_all = Window.partitionBy("lang")
    r = base.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "n", F.count(F.lit(1)).over(w_all)
    )
    n_docs = F.count(F.lit(1))
    n_dup = n_docs - F.countDistinct("fp")
    return (
        r.groupBy("lang")
        .agg(
            n_docs.alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.sum("nt").cast("bigint").alias("total_tokens"),
            (
                F.sum("nt").cast("bigint").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_tokens"),
            n_dup.alias("n_dup_docs"),
            (n_dup.cast("double") / n_docs.cast("double")).alias("dup_frac"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.lit(0.5) * F.col("n")), F.col("nt")
                )
            ).alias("p50_tokens"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.lit(0.9) * F.col("n")), F.col("nt")
                )
            ).alias("p90_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "token_simpson_diversity_by_lang",
    oracle="""
        WITH tok AS (
            SELECT lang,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents
        ), freq AS (
            SELECT lang, token, COUNT(*) AS c
            FROM tok GROUP BY lang, token
        )
        SELECT lang,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               COUNT(*) AS distinct_tokens,
               1.0 - CAST(SUM(c * (c - 1)) AS DOUBLE)
                     / CAST(SUM(c) * (SUM(c) - 1) AS DOUBLE)
                   AS gini_simpson,
               CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                   AS top_token_share
        FROM freq
        GROUP BY lang
        ORDER BY lang
    """,
    description="Gini-Simpson token diversity per language: 1 - "
    "sum(c*(c-1)) / (N*(N-1)) — the probability two tokens drawn "
    "without replacement differ. The log-free concentration measure "
    "(Shannon entropy needs ln, which is not engine-portable — "
    "SCALE.md's no-libm rule); complements type-token ratio "
    "(token_diversity_by_lang) with a frequency-weighted index that "
    "heavy-hitter skew actually moves, plus the top-token share. "
    "Two partial-agg shuffles ((lang, token) then lang); all "
    "arithmetic is exact integers below 2^53 with two final "
    "divisions.",
)
def token_simpson_diversity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(tokens(F.col("text"))).alias("token")
    )
    freq = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    return (
        freq.groupBy("lang")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).alias("distinct_tokens"),
            (
                F.lit(1.0)
                - F.sum(F.col("c") * (F.col("c") - 1)).cast("double")
                / (F.sum("c") * (F.sum("c") - F.lit(1))).cast("double")
            ).alias("gini_simpson"),
            (F.max("c").cast("double") / F.sum("c").cast("double")).alias(
                "top_token_share"
            ),
        )
        .orderBy("lang")
    )


KNN_QUERIES = 100
KNN_K = 5


@query(
    "emb_knn_label_accuracy",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
                   label AS true_label
            FROM embeddings WHERE vec_id < {KNN_QUERIES}
        ), c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv, label
            FROM embeddings
        ), scored AS (
            SELECT query_id, vec_id, c.label,
                   list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(cv, cv))) AS cosine
            FROM q, c WHERE vec_id <> query_id
        ), nn AS (
            SELECT query_id, vec_id, label
            FROM (
                SELECT query_id, vec_id, label,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY cosine DESC, vec_id
                       ) AS rank
                FROM scored
            ) WHERE rank <= {KNN_K}
        ), votes AS (
            SELECT query_id, label, COUNT(*) AS c
            FROM nn GROUP BY query_id, label
        ), pred AS (
            SELECT query_id, label AS pred_label
            FROM (
                SELECT query_id, label,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id ORDER BY c DESC, label
                       ) AS rn
                FROM votes
            ) WHERE rn = 1
        )
        SELECT true_label,
               COUNT(*) AS n_queries,
               CAST(SUM(CASE WHEN pred_label = true_label
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               CAST(SUM(CASE WHEN pred_label = true_label
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS accuracy
        FROM q JOIN pred USING (query_id)
        GROUP BY true_label
        ORDER BY true_label
    """,
    description=f"Embedding-quality evaluation: leave-one-out {KNN_K}-NN "
    f"label prediction for the first {KNN_QUERIES} vectors (majority "
    "vote, ties to the smallest label), reported as per-class "
    "accuracy — the standard sanity harness run before trusting an "
    "embedding space for dedup/search. Composes the portable "
    "brute-force cosine top-k (operators/similarity.py — broadcast "
    "queries, WindowGroupLimit) with two small ranked aggregations; "
    "the oracle replicates every cosine bit-for-bit (left-to-right "
    "fold parity), so accuracy hash-matches exactly. At 100 TB the "
    "same harness rides any ANN tier (LSH/IVF/PQ/SQ) in place of "
    "brute force; the eval set is small by construction.",
)
def emb_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import brute_force_top_k

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("true_label"),
    )
    nn = brute_force_top_k(emb, queries_df, k=KNN_K)
    labels = emb.select("vec_id", "label")
    votes = (
        nn.join(labels, "vec_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("label"))
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("pred_label"))
    )
    correct = F.sum(
        F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    )
    return (
        queries_df.select("query_id", "true_label")
        .join(pred, "query_id")
        .groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            correct.cast("bigint").alias("n_correct"),
            (correct.cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "accuracy"
            ),
        )
        .orderBy("true_label")
    )


HEAPS_CHECKPOINTS = [100, 500, 1000, 2500, 5000]
_HEAPS_VALUES = ", ".join(f"({n})" for n in HEAPS_CHECKPOINTS)


@query(
    "text_vocab_growth_curve",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
            FROM documents
        ), first_seen AS (
            SELECT token, MIN(doc_id) AS fd FROM tok GROUP BY token
        ), doclen AS (
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS nt
            FROM documents
        ), ns(n) AS (VALUES {_HEAPS_VALUES})
        SELECT n AS n_docs,
               (SELECT CAST(SUM(CASE WHEN fd < n THEN 1 ELSE 0 END) AS BIGINT)
                FROM first_seen) AS distinct_tokens,
               (SELECT CAST(SUM(CASE WHEN doc_id < n THEN nt ELSE 0 END)
                            AS BIGINT)
                FROM doclen) AS total_tokens
        FROM ns
        ORDER BY n_docs
    """,
    description="Heaps-law vocabulary-growth curve: distinct-token and "
    "total-token counts at corpus prefixes of 100/500/1k/2.5k/5k "
    "docs — the scaling diagnostic behind tokenizer vocab sizing "
    "(does the vocabulary saturate or keep growing with data?). "
    "Computed in ONE pass, not five rescans: each token reduces to "
    "its first-occurrence doc id, and every checkpoint is a "
    "conditional sum over that (token-grain) frame — the same "
    "trick turns any prefix-cumulative 'growth curve' into a single "
    "aggregation at 100 TB. Exact integer counts only.",
)
def text_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    first_seen = tok.groupBy("token").agg(F.min("doc_id").alias("fd"))
    doclen = docs.select("doc_id", token_count(F.col("text")).alias("nt"))
    ns = F.explode(
        F.array(*[F.lit(n) for n in HEAPS_CHECKPOINTS])
    ).alias("n_docs")
    vocab = (
        first_seen.select(ns, "fd")
        .groupBy("n_docs")
        .agg(
            F.sum(F.when(F.col("fd") < F.col("n_docs"), 1).otherwise(0))
            .cast("bigint")
            .alias("distinct_tokens")
        )
    )
    totals = (
        doclen.select(ns, "doc_id", "nt")
        .groupBy("n_docs")
        .agg(
            F.sum(F.when(F.col("doc_id") < F.col("n_docs"), F.col("nt")).otherwise(0))
            .cast("bigint")
            .alias("total_tokens")
        )
    )
    return vocab.join(totals, "n_docs").orderBy("n_docs")


@query(
    "events_burstiness_index",
    oracle="""
        WITH per_min AS (
            SELECT event_type, date_trunc('minute', ts) AS m,
                   COUNT(*) AS c
            FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_minutes,
               CAST(SUM(c) AS BIGINT) AS n_events,
               CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS mean_per_min,
               (CAST(SUM(c * c) AS DOUBLE)
                - CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE))
               / CAST(COUNT(*) AS DOUBLE)
               / (CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                   AS fano_factor
        FROM per_min
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Traffic burstiness per event type: the Fano factor "
    "(variance-to-mean ratio of per-minute counts) — 1 for a Poisson "
    "arrival process, >1 for bursty traffic; the number capacity "
    "planning and anomaly-baseline work starts from. Variance comes "
    "from exact integer sums (sum c, sum c^2, n — all < 2^53) with "
    "deterministic double divisions at the end, so it hash-matches "
    "without any DECIMAL machinery. One partial-agg shuffle to the "
    "(type x minute) grain, then a type-grain reduce.",
)
def events_burstiness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per_min = events.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("m")
    ).agg(F.count(F.lit(1)).alias("c"))
    n = F.count(F.lit(1)).cast("double")
    sc = F.sum("c").cast("double")
    sc2 = F.sum(F.col("c") * F.col("c")).cast("double")
    mean = sc / n
    return (
        per_min.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_minutes"),
            F.sum("c").cast("bigint").alias("n_events"),
            mean.alias("mean_per_min"),
            ((sc2 - sc * sc / n) / n / (sc / n)).alias("fano_factor"),
        )
        .orderBy("event_type")
    )
