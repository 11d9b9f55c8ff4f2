"""Wave-23b: the canonical Gopher quality-filter battery (Rae et al.
2021, "Scaling Language Models" appendix A1.1) — the rule set most
production pretraining pipelines start from, complementing the
generic ratio scores in llm_text.text_quality_scores.

Every rule is evaluated with INTEGER cross-multiplication (3n <= sum
<= 10n instead of 3 <= sum/n <= 10), so pass/fail booleans are exact
in both engines — no ratio ever hits a float comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

_SQL_STOP_HITS = " + ".join(
    f"CASE WHEN regexp_matches(lower(text), '\\b{w}\\b') THEN 1 ELSE 0 END"
    for w in STOPWORDS
)


@query(
    "text_gopher_filters",
    oracle=f"""
        WITH m AS (
            SELECT lang,
                   len(regexp_extract_all(text, '[A-Za-z]+')) AS words,
                   len(regexp_extract_all(text, '[A-Za-z]')) AS word_chars,
                   length(text) - length(replace(text, '#', '')) AS hashes,
                   len(regexp_extract_all(text, '\\.\\.\\.')) AS ellipses,
                   len(string_split(text, chr(10))) AS lines,
                   len(list_distinct(string_split(text, chr(10)))) AS uniq_lines,
                   len(list_filter(string_split(text, chr(10)),
                                   x -> regexp_matches(x, '^[-*]')))
                       AS bullet_lines,
                   {_SQL_STOP_HITS} AS stop_hits
            FROM documents
        ), graded AS (
            SELECT lang,
                   (words BETWEEN 50 AND 100000) AS ok_word_count,
                   (3 * words <= word_chars AND word_chars <= 10 * words)
                       AS ok_mean_word_len,
                   (10 * (hashes + ellipses) <= words) AS ok_symbol_ratio,
                   (10 * bullet_lines <= 9 * lines) AS ok_bullet_lines,
                   (10 * (lines - uniq_lines) <= 3 * lines) AS ok_dup_lines,
                   (stop_hits >= 2) AS ok_stopwords
            FROM m
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN ok_word_count THEN 1 ELSE 0 END) AS BIGINT)
                   AS pass_word_count,
               CAST(SUM(CASE WHEN ok_mean_word_len THEN 1 ELSE 0 END) AS BIGINT)
                   AS pass_mean_word_len,
               CAST(SUM(CASE WHEN ok_symbol_ratio THEN 1 ELSE 0 END) AS BIGINT)
                   AS pass_symbol_ratio,
               CAST(SUM(CASE WHEN ok_bullet_lines THEN 1 ELSE 0 END) AS BIGINT)
                   AS pass_bullet_lines,
               CAST(SUM(CASE WHEN ok_dup_lines THEN 1 ELSE 0 END) AS BIGINT)
                   AS pass_dup_lines,
               CAST(SUM(CASE WHEN ok_stopwords THEN 1 ELSE 0 END) AS BIGINT)
                   AS pass_stopwords,
               CAST(SUM(CASE WHEN ok_word_count AND ok_mean_word_len
                              AND ok_symbol_ratio AND ok_bullet_lines
                              AND ok_dup_lines AND ok_stopwords
                             THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
        FROM graded
        GROUP BY lang
        ORDER BY lang
    """,
    description="Gopher quality filters (word-count bounds, mean word "
    "length 3-10, symbol-to-word ratio, bullet-line fraction, "
    "duplicate-line fraction, >=2 distinct English stopwords): the "
    "canonical pretraining-curation rule battery, all thresholds as "
    "integer cross-multiplications so every pass/fail bit is exact "
    "across engines. One projection per doc + a 5-key rollup; at "
    "100 TB this is a map-only pass (the rollup is tiny).",
)
def text_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lines = F.split(F.col("text"), "\n")
    stop_hits = sum(
        F.lower(F.col("text")).rlike(rf"\b{w}\b").cast("int") for w in STOPWORDS
    )
    m = docs.select(
        "lang",
        F.size(F.expr("regexp_extract_all(text, '[A-Za-z]+', 0)")).alias("words"),
        F.size(F.expr("regexp_extract_all(text, '[A-Za-z]', 0)")).alias("word_chars"),
        (
            F.length("text") - F.length(F.regexp_replace("text", "#", ""))
        ).alias("hashes"),
        F.size(F.expr(r"regexp_extract_all(text, '\\.\\.\\.', 0)")).alias("ellipses"),
        F.size(lines).alias("lines"),
        F.size(F.array_distinct(lines)).alias("uniq_lines"),
        F.size(F.filter(lines, lambda x: x.rlike("^[-*]"))).alias("bullet_lines"),
        stop_hits.alias("stop_hits"),
    )
    graded = m.select(
        "lang",
        F.col("words").between(50, 100000).alias("ok_word_count"),
        (
            (F.lit(3) * F.col("words") <= F.col("word_chars"))
            & (F.col("word_chars") <= F.lit(10) * F.col("words"))
        ).alias("ok_mean_word_len"),
        (F.lit(10) * (F.col("hashes") + F.col("ellipses")) <= F.col("words")).alias(
            "ok_symbol_ratio"
        ),
        (F.lit(10) * F.col("bullet_lines") <= F.lit(9) * F.col("lines")).alias(
            "ok_bullet_lines"
        ),
        (
            F.lit(10) * (F.col("lines") - F.col("uniq_lines"))
            <= F.lit(3) * F.col("lines")
        ).alias("ok_dup_lines"),
        (F.col("stop_hits") >= 2).alias("ok_stopwords"),
    )
    flags = [
        "ok_word_count",
        "ok_mean_word_len",
        "ok_symbol_ratio",
        "ok_bullet_lines",
        "ok_dup_lines",
        "ok_stopwords",
    ]
    cond = F.col(flags[0])
    for fl in flags[1:]:
        cond = cond & F.col(fl)
    return (
        graded.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[
                F.sum(F.col(fl).cast("long")).alias("pass_" + fl[3:])
                for fl in flags
            ],
            F.sum(cond.cast("long")).alias("pass_all"),
        )
        .orderBy("lang")
    )


@query(
    "approx_frequent_tokens",
    oracle="""
        WITH toks AS (
            SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
            FROM documents
        )
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM toks
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 10
    """,
    description="Heavy hitters via Spark 4's approx_top_k sketch "
    "(datasketches frequent-items): mergeable fixed-size partials "
    "instead of a full-width distinct shuffle — the streaming/rollup "
    "form of top-k. With maxItemsTracked far above the vocabulary "
    "(100k vs 31 fixture tokens) the sketch is EXACT by the "
    "frequent-items guarantee, so the re-ranked output hash-matches "
    "the exact GROUP BY oracle; on an open vocabulary the counts "
    "become (count, error-bound) estimates and the oracle would move "
    "to the self-graded containment pattern.",
)
def approx_frequent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
    )
    # request far more than k so a count-tie at the k boundary is
    # resolved by OUR deterministic (n desc, token) re-rank, not by
    # whichever item the sketch happened to surface
    sketch = toks.agg(
        F.expr("approx_top_k(token, 1000, 100000)").alias("top")
    )
    return (
        sketch.select(F.explode("top").alias("e"))
        .select(
            F.col("e.item").alias("token"),
            F.col("e.count").cast("long").alias("n"),
        )
        .orderBy(F.desc("n"), "token")
        .limit(10)
    )


@query(
    "text_bigram_continuation_counts",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\\s+') AS t
            FROM documents
        ), bigrams AS (
            SELECT t[s.i] AS w1, t[s.i + 1] AS w2
            FROM toks, LATERAL (
                SELECT UNNEST(generate_series(1, len(t) - 1)) AS i) s
        ), bg AS (
            SELECT w1, w2, COUNT(*) AS n FROM bigrams GROUP BY 1, 2
        )
        SELECT w2 AS word,
               CAST(SUM(n) AS BIGINT) AS n_occurrences,
               CAST(COUNT(*) AS BIGINT) AS n_left_contexts,
               CAST(MAX(n) AS BIGINT) AS max_bigram_count
        FROM bg
        GROUP BY w2
        ORDER BY n_occurrences DESC, word
        LIMIT 20
    """,
    description="Kneser-Ney ingredient counts: per word its bigram "
    "occurrence total AND its continuation count (distinct left "
    "contexts) — the quantity KN smoothing substitutes for raw "
    "frequency, and the first statistical-LM data-prep pass. Bigrams "
    "come from adjacent token pairs via one generator per doc "
    "(positions 1..len-1, linear); two grouped aggregations reuse the "
    "(w1, w2) shuffle for the per-word rollup. All counts exact "
    "integers; (n_occurrences, word) totally orders the top-20.",
)
def text_bigram_continuation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"))
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    bg = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    return (
        bg.groupBy(F.col("w2").alias("word"))
        .agg(
            F.sum("n").alias("n_occurrences"),
            F.count(F.lit(1)).alias("n_left_contexts"),
            F.max("n").alias("max_bigram_count"),
        )
        .orderBy(F.desc("n_occurrences"), "word")
        .limit(20)
    )


@query(
    "pipeline_training_export_e2e",
    oracle="""
        WITH filtered AS (
            SELECT doc_id, text,
                   string_split_regex(trim(text), '[ ]+') AS t
            FROM documents
            WHERE len(regexp_extract_all(text, '[A-Za-z]+')) >= 50
        ), deduped AS (
            SELECT doc_id, t FROM (
                SELECT doc_id, t,
                       row_number() OVER (PARTITION BY md5(text)
                                          ORDER BY doc_id) AS rn
                FROM filtered) x
            WHERE rn = 1
        ), meta AS (
            SELECT doc_id, t, len(t) AS n,
                   CASE WHEN len(t) <= 10 THEN 1
                        ELSE CAST(floor((len(t) - 11) / 40) AS BIGINT) + 1
                   END AS n_chunks
            FROM deduped
        ), chunks AS (
            SELECT doc_id, n, s.i AS ci,
                   least(50, n - s.i * 40) AS chunk_len,
                   md5(array_to_string(
                       t[s.i * 40 + 1 : s.i * 40 + least(50, n - s.i * 40)],
                       ' ')) AS chunk_md5
            FROM meta, LATERAL (
                SELECT UNNEST(generate_series(0, n_chunks - 1)) AS i) s
        ), assigned AS (
            SELECT CASE WHEN substr(chunk_md5, 1, 1) <= 'b' THEN 'train'
                        WHEN substr(chunk_md5, 1, 1) <= 'd' THEN 'val'
                        ELSE 'test' END AS split,
                   doc_id, chunk_len, chunk_md5
            FROM chunks
        )
        SELECT split,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(chunk_len) AS BIGINT) AS total_tokens,
               CAST(COUNT(DISTINCT chunk_md5) AS BIGINT) AS n_distinct_chunks
        FROM assigned
        GROUP BY split
        ORDER BY split
    """,
    description="End-to-end training-data export: quality gate "
    "(>=50 words) -> exact dedup (md5 keeper, lowest doc_id) -> "
    "50-token/stride-40 sliding chunks -> leakage-safe content-hash "
    "split at CHUNK granularity (75/12.5/12.5 by md5 first hex "
    "digit). One pipeline composing four curation operators, every "
    "stage exact and engine-portable; per-split doc/chunk/token "
    "accounting is the export manifest. At 100 TB each stage is the "
    "documented scale shape of its standalone operator (map-only "
    "gate, one dedup shuffle, linear chunk generators, hash split "
    "with no shuffle at all).",
)
def pipeline_training_export_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    filtered = docs.filter(
        F.size(F.expr("regexp_extract_all(text, '[A-Za-z]+', 0)")) >= 50
    ).select("doc_id", "text", F.split(F.trim(F.col("text")), " +").alias("t"))
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "t")
    )
    meta = deduped.select(
        "doc_id",
        "t",
        F.size("t").alias("n"),
        F.when(F.size("t") <= 10, F.lit(1).cast("long"))
        .otherwise(F.floor((F.size("t") - 11) / 40).cast("long") + 1)
        .alias("n_chunks"),
    )
    chunks = meta.select(
        "doc_id",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("ci"),
        "t",
    ).select(
        "doc_id",
        F.least(F.lit(50), F.col("n") - F.col("ci") * 40).alias("chunk_len"),
        F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    F.col("t"),
                    F.col("ci") * 40 + 1,
                    F.least(F.lit(50), F.col("n") - F.col("ci") * 40),
                ),
            )
        ).alias("chunk_md5"),
    )
    first_hex = F.substring("chunk_md5", 1, 1)
    assigned = chunks.withColumn(
        "split",
        F.when(first_hex <= "b", "train").when(first_hex <= "d", "val").otherwise(
            "test"
        ),
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_len").alias("total_tokens"),
            F.count_distinct("chunk_md5").alias("n_distinct_chunks"),
        )
        .orderBy("split")
    )
