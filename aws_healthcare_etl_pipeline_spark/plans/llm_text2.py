"""Second text-pipeline wave (SURVEY.md §2.8 extensions): repetition
ratio (the Gopher duplicate-n-gram quality signal), passage-level
exact dedup (C4-style sub-document dedup), and benchmark
decontamination (n-gram overlap against a held-out eval set) — the
three corpus-hygiene operators a production LLM data pipeline runs
besides whole-document dedup.

All expressions are built-in Catalyst functions with exact DuckDB
equivalents; float averages go through the round-then-DECIMAL sum
convention (plans/registry.py) so hashes are order-insensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import normalize_text, shingles_from_tokens, tokens
from ..sources.tables import load_table
from .registry import query

# DuckDB token/shingle fragments (match functions/text.py semantics;
# validated byte-for-byte by the dedup-family oracles)
_SQL_TOKS = "regexp_split_to_array(trim(lower(text)), '\\s+')"

PASSAGE_TOKENS = 20
EVAL_SET_MAX_ID = 10  # doc_id < 10 plays the held-out benchmark
CONTAM_NGRAM = 8


@query(
    "text_repetition_ratio",
    oracle=f"""
        WITH sh AS (
            SELECT lang,
                   list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                                  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                       AS shingles
            FROM (SELECT lang, {_SQL_TOKS} AS toks FROM documents)
        ), per_doc AS (
            SELECT lang,
                   1.0 - len(list_distinct(shingles))::DOUBLE / len(shingles)
                       AS rep
            FROM sh
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(CAST(round(rep, 6) AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS avg_repetition,
               MAX(round(rep, 6)) AS max_repetition
        FROM per_doc
        GROUP BY lang
        ORDER BY lang
    """,
    description="Gopher-style repetition signal: per-doc duplicate "
    "3-gram fraction (1 - distinct/total shingles), aggregated per "
    "language with the order-insensitive decimal-average convention.",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "lang", tokens(normalize_text(F.col("text"))).alias("toks")
    ).select("lang", shingles_from_tokens(F.col("toks"), 3).alias("shingles"))
    rep = (
        F.lit(1.0)
        - F.size(F.array_distinct("shingles")).cast("double") / F.size("shingles")
    )
    return (
        sh.select("lang", F.round(rep, 6).alias("rep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.col("rep").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_repetition"),
            F.max("rep").alias("max_repetition"),
        )
        .orderBy("lang")
    )


@query(
    "dedup_passage_level",
    oracle=f"""
        WITH p AS (
            SELECT lang,
                   unnest(list_transform(
                       range(0, CAST(ceil(len(toks) / {PASSAGE_TOKENS}.0) AS INT)),
                       i -> md5(array_to_string(
                               list_slice(toks, i * {PASSAGE_TOKENS} + 1,
                                          (i + 1) * {PASSAGE_TOKENS}), ' '))
                   )) AS fp
            FROM (SELECT lang, {_SQL_TOKS} AS toks FROM documents)
        )
        SELECT lang,
               COUNT(*) AS n_passages,
               COUNT(DISTINCT fp) AS n_distinct,
               COUNT(*) - COUNT(DISTINCT fp) AS n_duplicate
        FROM p
        GROUP BY lang
        ORDER BY lang
    """,
    description="C4-style passage-level exact dedup: documents chunked "
    "into fixed 20-token passages, md5 passage fingerprints, per-lang "
    "duplicate-passage counts — sub-document dedup that whole-doc "
    "fingerprints miss.",
)
def dedup_passage_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("lang", tokens(normalize_text(F.col("text"))).alias("toks"))
    n_pass = F.ceil(F.size("toks") / float(PASSAGE_TOKENS)).cast("int")
    passages = toked.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_pass - 1),
                lambda i: F.md5(
                    F.encode(
                        F.concat_ws(
                            " ", F.slice(F.col("toks"), i * PASSAGE_TOKENS + 1, PASSAGE_TOKENS)
                        ),
                        "UTF-8",
                    )
                ),
            )
        ).alias("fp"),
    )
    return (
        passages.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.countDistinct("fp").alias("n_distinct"),
            (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_duplicate"),
        )
        .orderBy("lang")
    )


@query(
    "text_contamination_check",
    oracle=f"""
        WITH g AS (
            SELECT doc_id, lang,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(toks) - {CONTAM_NGRAM - 1}, 1) + 1),
                       i -> array_to_string(
                              list_slice(toks, i, i + {CONTAM_NGRAM - 1}), ' '))
                   )) AS gram
            FROM (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents)
        ), eval_grams AS (
            SELECT DISTINCT gram FROM g WHERE doc_id < {EVAL_SET_MAX_ID}
        ), contaminated AS (
            SELECT DISTINCT g.doc_id, g.lang
            FROM g JOIN eval_grams USING (gram)
            WHERE g.doc_id >= {EVAL_SET_MAX_ID}
        )
        SELECT d.lang,
               COUNT(*) AS n_docs_checked,
               COALESCE(c.n_contaminated, 0) AS n_contaminated
        FROM documents d
        LEFT JOIN (
            SELECT lang, COUNT(*) AS n_contaminated
            FROM contaminated GROUP BY lang
        ) c ON d.lang = c.lang
        WHERE d.doc_id >= {EVAL_SET_MAX_ID}
        GROUP BY d.lang, c.n_contaminated
        ORDER BY d.lang
    """,
    description="Benchmark decontamination: flag training docs sharing "
    "any 8-token n-gram with a held-out eval set (doc_id < 10). Eval "
    "grams are tiny -> broadcast semi-join against exploded corpus "
    "grams; per-lang contaminated-doc counts.",
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", "lang", tokens(normalize_text(F.col("text"))).alias("toks")
    )
    grams = toked.select(
        "doc_id",
        "lang",
        F.explode(
            F.array_distinct(shingles_from_tokens(F.col("toks"), CONTAM_NGRAM))
        ).alias("gram"),
    )
    eval_grams = F.broadcast(
        grams.filter(F.col("doc_id") < EVAL_SET_MAX_ID).select("gram").distinct()
    )
    contaminated = (
        grams.filter(F.col("doc_id") >= EVAL_SET_MAX_ID)
        .join(eval_grams, "gram", "left_semi")
        .select("doc_id", "lang")
        .distinct()
    )
    checked = docs.filter(F.col("doc_id") >= EVAL_SET_MAX_ID)
    per_lang_contam = contaminated.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    return (
        checked.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs_checked"))
        .join(per_lang_contam, "lang", "left")
        .select(
            "lang",
            "n_docs_checked",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        )
        .orderBy("lang")
    )


CONTEXT_TOKENS = 512  # packing window size (fixture docs are ~30-60 tokens)
STRATUM_N = 50  # per-language sample size


@query(
    "pipeline_sequence_packing",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, lang, len({_SQL_TOKS}) AS n_tokens
            FROM documents
        ), pos AS (
            SELECT lang, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n_tokens AS start_tok
            FROM d
        )
        SELECT lang,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(ceil(SUM(n_tokens) / {CONTEXT_TOKENS}.0) AS BIGINT)
                   AS n_windows,
               CAST(SUM(CASE WHEN start_tok // {CONTEXT_TOKENS}
                             <> (start_tok + n_tokens - 1) // {CONTEXT_TOKENS}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
               CAST(SUM(n_tokens) AS DOUBLE)
                   / (ceil(SUM(n_tokens) / {CONTEXT_TOKENS}.0) * {CONTEXT_TOKENS})
                   AS fill_ratio
        FROM pos
        GROUP BY lang
        ORDER BY lang
    """,
    description="Sequence packing (concat-and-chunk): documents are "
    "concatenated per language in doc_id order and cut into fixed "
    f"{CONTEXT_TOKENS}-token context windows — the GPT-style packing "
    "step. Emits per-lang window counts, boundary-straddling docs, and "
    "fill ratio; the running offset is a window cumsum, so packing "
    "assignment is fully parallel (no sequential bin state).",
)
def pipeline_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.size(tokens(normalize_text(F.col("text")))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = d.withColumn("start_tok", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    crosses = (
        F.floor(F.col("start_tok") / CONTEXT_TOKENS)
        != F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / CONTEXT_TOKENS)
    )
    return (
        pos.groupBy("lang")
        .agg(
            F.sum("n_tokens").alias("total_tokens"),
            F.ceil(F.sum("n_tokens") / float(CONTEXT_TOKENS))
            .cast("long")
            .alias("n_windows"),
            F.sum(crosses.cast("long")).alias("n_boundary_docs"),
            (
                F.sum("n_tokens").cast("double")
                / (
                    F.ceil(F.sum("n_tokens") / float(CONTEXT_TOKENS))
                    * CONTEXT_TOKENS
                )
            ).alias("fill_ratio"),
        )
        .orderBy("lang")
    )


FFD_SHARD_TARGET = 4096  # max items per sequential packing unit


@query(
    "pipeline_ffd_packing",
    oracle=f"""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(ceil(SUM(n_tokens) / {CONTEXT_TOKENS}.0) AS BIGINT)
                   AS min_bins_lb,
               TRUE AS bins_within_capacity,
               TRUE AS half_empty_within_shard_bound,
               TRUE AS n_bins_within_bounds
        FROM (SELECT lang, len({_SQL_TOKS}) AS n_tokens FROM documents)
        GROUP BY lang
        ORDER BY lang
    """,
    description="First-fit-decreasing packing (operators/packing.py::"
    "ffd_pack, the applyInPandas grouped-map operator): unlike "
    "concat-and-chunk it never splits a document across context "
    "windows. FFD is sequential per packing unit with an O(items x "
    "bins) inner loop, so groups are hash-SHARDED to <= "
    f"{FFD_SHARD_TARGET} items (ffd_shard_count: shards = "
    "ceil(max_group/target), one tiny pre-aggregate) — the r4 fix "
    "for the measured sf1->sf3 exponent 1.73 on unbounded per-lang "
    "groups; with bounded units total work is linear and every unit "
    "parallelizes. Bin counts are algorithm-dependent, so the oracle "
    "pins the EXACT doc/token totals and lower bound plus self-graded "
    "booleans for FFD's provable invariants: every shared (2+ item) "
    "bin fill <= capacity (a dedicated single-oversize-item bin may "
    "exceed it), at most one bin under half fill PER (group, shard) "
    "unit (any first-fit violating this would never have opened the "
    "second bin) so <= n_shards per lang, and lb <= n_bins <= 2*lb + "
    "n_shards (which that half-fill property implies).",
)
def pipeline_ffd_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import ffd_pack, ffd_shard_count

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "lang",
        "doc_id",
        F.size(tokens(normalize_text(F.col("text")))).cast("long").alias("n_tokens"),
    )
    n_shards = ffd_shard_count(sized, "lang", FFD_SHARD_TARGET)
    packed = ffd_pack(
        sized, group_col="lang", id_col="doc_id", size_col="n_tokens",
        capacity=CONTEXT_TOKENS, n_shards=n_shards,
    )
    bins = packed.groupBy("lang", "bin_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.count(F.lit(1)).alias("n_items"),
    )
    per_lang = bins.groupBy("lang").agg(
        F.sum("n_items").alias("n_docs"),
        F.sum("fill").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_bins"),
        # a single-oversize-item bin may legitimately exceed capacity
        F.max(
            F.when(F.col("n_items") >= 2, F.col("fill")).otherwise(0)
        ).alias("max_shared_fill"),
        F.sum((F.col("fill") < CONTEXT_TOKENS / 2).cast("long")).alias(
            "n_half_empty"
        ),
    )
    lb = F.ceil(F.col("total_tokens") / float(CONTEXT_TOKENS)).cast("long")
    return per_lang.select(
        "lang",
        "n_docs",
        "total_tokens",
        lb.alias("min_bins_lb"),
        (F.col("max_shared_fill") <= CONTEXT_TOKENS).alias("bins_within_capacity"),
        (F.col("n_half_empty") <= n_shards).alias("half_empty_within_shard_bound"),
        ((F.col("n_bins") >= lb) & (F.col("n_bins") <= 2 * lb + n_shards)).alias(
            "n_bins_within_bounds"
        ),
    ).orderBy("lang")


@query(
    "sampling_stratified_fixed_n",
    oracle=f"""
        WITH ranked AS (
            SELECT lang, len({_SQL_TOKS}) AS n_tokens,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5(text), doc_id
                   ) AS rn
            FROM documents
        )
        SELECT lang,
               COUNT(*) AS n_sampled,
               CAST(SUM(n_tokens) AS BIGINT) AS sample_tokens,
               MIN(n_tokens) AS min_tokens,
               MAX(n_tokens) AS max_tokens
        FROM ranked
        WHERE rn <= {STRATUM_N}
        GROUP BY lang
        ORDER BY lang
    """,
    description="Stratified fixed-n sampling: exactly min(n, stratum "
    "size) docs per language, chosen by md5(text) order — a "
    "deterministic, partitioning-independent 'random' draw (the "
    "distributed stand-in for per-stratum reservoir sampling).",
)
def sampling_stratified_fixed_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("h"),
        F.size(tokens(normalize_text(F.col("text")))).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    sampled = d.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= STRATUM_N
    )
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_tokens").alias("sample_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("lang")
    )
