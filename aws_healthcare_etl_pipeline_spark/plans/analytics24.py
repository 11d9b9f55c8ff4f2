"""Wave-44 (round 5): tokenizer train→apply loop closure, and the
watermark-lateness profile via a running-MAX decomposition (the
associative-aggregate family proven for sum/count now demonstrated
for max — oracle keeps the textbook global window).

Portability notes follow the registry grammar (plans/registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .analytics21 import (
    _BPE_SQL_WORDS,
    _bpe_learn,
    _bpe_sql_merge,
    _bpe_sql_pairs,
)
from .llm_dedup import SQL_CORPUS_SHINGLES
from .registry import query

# -------------------------------------------- BPE tokenize (apply)


@query(
    "pipeline_bpe_tokenize_apply",
    oracle=f"""
        WITH {_BPE_SQL_WORDS},
        {_bpe_sql_pairs("b1", "r0")},
        {_bpe_sql_merge("r1", "r0", "b1")},
        {_bpe_sql_pairs("b2", "r1")},
        {_bpe_sql_merge("r2", "r1", "b2")},
        {_bpe_sql_pairs("b3", "r2")},
        {_bpe_sql_merge("r3", "r2", "b3")},
        counted AS (
            SELECT r0.w, r0.c,
                   len(list_filter(string_split(trim(r0.s, '·'), '··'),
                                   x -> x <> '')) AS n0,
                   len(list_filter(string_split(trim(r3.s, '·'), '··'),
                                   x -> x <> '')) AS n3
            FROM r0 JOIN r3 USING (w)
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
               CAST(SUM(c * n0) AS BIGINT) AS symbols_before,
               CAST(SUM(c * n3) AS BIGINT) AS symbols_after,
               CAST(SUM(c * n3) AS DOUBLE) / CAST(SUM(c * n0) AS DOUBLE)
                   AS compression_ratio
        FROM counted
    """,
    description="Tokenizer train→APPLY loop closure: the 3 merges "
    "learned by text_bpe_merge_rounds are applied back to the whole "
    "frequency-weighted vocabulary and the corpus-level symbol counts "
    "before/after report the realized compression — the number a "
    "tokenizer owner actually ships on (every merge trades one "
    "vocab slot for measured corpus-wide savings). Same scale shape "
    "as the trainer: all passes run over the Heaps-saturating "
    "distinct-word table with the corpus read once for counts; "
    "per-word symbol counts are array lengths (exact ints), and the "
    "single double is the final ratio.",
)
def pipeline_bpe_tokenize_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, r0, merged = _bpe_learn(spark, sf_dir)

    def n_syms(col):
        return F.size(
            F.filter(
                F.split(F.expr(f"trim(BOTH '·' FROM {col})"), "··"),
                lambda x: x != "",
            )
        )

    counted = (
        r0.select("w", "c", n_syms("s").alias("n0"))
        .join(merged.select("w", n_syms("s").alias("n3")), "w")
    )
    before = F.sum(F.col("c") * F.col("n0"))
    after = F.sum(F.col("c") * F.col("n3"))
    return counted.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_words"),
        before.cast("bigint").alias("symbols_before"),
        after.cast("bigint").alias("symbols_after"),
        (after.cast("double") / before.cast("double")).alias(
            "compression_ratio"
        ),
    )


# ------------------------------------- watermark lateness profile



@query(
    "events_watermark_lateness_profile",
    oracle="""
        WITH ordered AS (
            SELECT event_id, epoch_us(ts) AS ts_us,
                   md5(CAST(event_id AS VARCHAR)) AS ak
            FROM events
        ), marked AS (
            SELECT event_id, ts_us,
                   MAX(ts_us) OVER (
                       ORDER BY ak, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS wm_us
            FROM ordered
        ), lat AS (
            SELECT CASE
                     WHEN wm_us IS NULL OR ts_us >= wm_us THEN 0
                     WHEN wm_us - ts_us <= 60000000 THEN 1
                     WHEN wm_us - ts_us <= 3600000000 THEN 2
                     WHEN wm_us - ts_us <= 86400000000 THEN 3
                     ELSE 4
                   END AS bucket_id
            FROM marked
        )
        SELECT bucket_id,
               CASE bucket_id WHEN 0 THEN 'on_time'
                              WHEN 1 THEN 'le_1m'
                              WHEN 2 THEN 'le_1h'
                              WHEN 3 THEN 'le_1d'
                              ELSE 'gt_1d' END AS lateness_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM lat
        GROUP BY bucket_id
        ORDER BY bucket_id
    """,
    description="Watermark-lateness profile: under a deterministic "
    "md5(event_id) arrival permutation (a synthetic out-of-order "
    "network-arrival model — the fixture's ids are time-ordered, so "
    "identity order would show nothing), each event's lateness is "
    "how far its event time "
    "sits behind the running maximum event time seen strictly before "
    "it — exactly the quantity a Structured Streaming watermark "
    "delay must cover, measured BEFORE committing a delay (too short "
    "drops data, too long bloats state). The running max is an "
    "entity-grain ordered aggregate, so the Spark side extends the "
    "cumsum two-level decomposition to MAX (any associative "
    "aggregate decomposes: md5-prefix bucket maxes + bounded-spine "
    "exclusive carry + bucket-partitioned exclusive windows) while "
    "the oracle keeps the textbook global exclusive window — the "
    "hash match proves the max decomposition just as it proved the "
    "sum. Lateness buckets (on-time / 1m / 1h / 1d / more) in exact "
    "microseconds.",
)
def events_watermark_lateness_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ordered = events.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.md5(F.col("event_id").cast("string")).alias("ak"),
        # 256 order-aligned buckets: the 2-hex-char prefix is a
        # monotone function of the (ak, event_id) arrival order
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 2).alias("b"),
    )
    # bucket maxes -> exclusive carry over the bounded bucket spine
    bmax = ordered.groupBy("b").agg(F.max("ts_us").alias("bm"))
    spine = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = bmax.select("b", F.max("bm").over(spine).alias("carry_us"))
    # exclusive running max within each bucket
    win = (
        Window.partitionBy("b")
        .orderBy("ak", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = (
        ordered.withColumn("in_us", F.max("ts_us").over(win))
        .join(carry, "b")
        .withColumn(
            # greatest() skips nulls (first row of a bucket has no
            # in-bucket max; buckets before the first have no carry)
            "wm_us",
            F.greatest("in_us", "carry_us"),
        )
    )
    late = F.col("wm_us") - F.col("ts_us")
    bucket_id = (
        F.when(F.col("wm_us").isNull() | (late <= 0), 0)
        .when(late <= 60_000_000, 1)
        .when(late <= 3_600_000_000, 2)
        .when(late <= 86_400_000_000, 3)
        .otherwise(4)
    )
    return (
        marked.select(bucket_id.alias("bucket_id"))
        .groupBy("bucket_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "bucket_id",
            F.when(F.col("bucket_id") == 0, "on_time")
            .when(F.col("bucket_id") == 1, "le_1m")
            .when(F.col("bucket_id") == 2, "le_1h")
            .when(F.col("bucket_id") == 3, "le_1d")
            .otherwise("gt_1d")
            .alias("lateness_bucket"),
            "n_events",
        )
        .orderBy("bucket_id")
    )


# --------------------------------- minhash estimator-error audit

MH_EVAL_HASHES = 32
MH_EVAL_PANEL = 300

_MH_SQL_NUM = (
    "list_reduce(list_transform("
    "string_split_regex(substr(md5(CAST(k AS VARCHAR) || ':' || s), 1, 15),"
    " ''), c -> strpos('0123456789abcdef', c) - 1)::BIGINT[],"
    " (a, b) -> a * 16 + b)"
)


@query(
    "dedup_minhash_estimator_error",
    oracle=f"""
        WITH {{corpus_shingles}},
        pm AS (
            SELECT GREATEST(CAST(FLOOR(COUNT(*) / {MH_EVAL_PANEL}.0)
                                 AS BIGINT), 1) AS panel_mod
            FROM sh
        ), panel AS (
            SELECT doc_id, shingles,
                   list_transform(range(0, {MH_EVAL_HASHES}), k ->
                       list_min(list_transform(shingles,
                                               s -> {_MH_SQL_NUM})))
                       AS sig
            FROM sh, pm
            WHERE doc_id % pm.panel_mod = 0
        ), pairs AS (
            SELECT len(list_intersect(a.shingles, b.shingles)) AS inter,
                   len(a.shingles) + len(b.shingles)
                       - len(list_intersect(a.shingles, b.shingles))
                       AS uni,
                   CAST(list_sum(list_transform(
                       range(1, {MH_EVAL_HASHES + 1}),
                       i -> CASE WHEN a.sig[i] = b.sig[i]
                                 THEN 1 ELSE 0 END)) AS BIGINT) AS matches
            FROM panel a JOIN panel b ON a.doc_id < b.doc_id
        ), errs AS (
            SELECT CAST(abs(matches * uni - {MH_EVAL_HASHES} * inter)
                        * 1000000 // ({MH_EVAL_HASHES} * uni) AS BIGINT)
                       AS err_ppm
            FROM pairs
        )
        SELECT CAST(err_ppm // 50000 AS BIGINT) AS err_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM errs
        GROUP BY 1
        ORDER BY err_bucket
    """.format(corpus_shingles=SQL_CORPUS_SHINGLES),
    description="MinHash estimator-quality audit: on a bounded "
    f"~{MH_EVAL_PANEL}-doc panel of the perturbed corpus, every "
    "pair's exact 3-gram Jaccard is compared against the "
    f"{MH_EVAL_HASHES}-hash PORTABLE minhash estimate (per-seed "
    "md5-derived hash family, recomputable in any engine — unlike "
    "the production xxhash64 family, which is why the production "
    "LSH oracle uses exact Jaccard instead), and the absolute-error "
    "distribution lands in 5-percentage-point buckets — the "
    "calibration measurement that justifies a signature width "
    "BEFORE a 100 TB dedup run bets recall on it (expected error "
    "~1/sqrt(k)). Errors are exact integer ppm (|matches*union - "
    "k*inter| scaled and floor-divided) so the histogram is "
    "bit-portable; the panel keeps the pair set fixed-size at any "
    "corpus scale.",
)
def dedup_minhash_estimator_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.text import normalize_text, shingles_from_tokens, tokens
    from ..operators.parallelism import widen
    from .llm_dedup import perturbed_corpus

    # The panel is the only thing that needs SHINGLES; the corpus is
    # only needed for its COUNT (to derive panel_mod). Counting first
    # lets column pruning reduce the corpus pass to a doc_id scan,
    # and shingling/tokenizing then touches ~PANEL docs instead of
    # the whole corpus — the linear term that dominated the sf3 sweep
    # (e(1->3) was 0.90 because every doc was tokenized to sample
    # 300). panel_mod reaching the driver is a 1-number bounded
    # collect, same contract as the dangling-mass transfer.
    corpus_n = perturbed_corpus(spark, sf_dir).count()
    panel_mod = max(1, corpus_n // MH_EVAL_PANEL)
    # widen AND checkpoint the panel slice so the shingle projection
    # cannot collapse back below the exchange (plain projections push
    # through a round-robin repartition — the r2 lesson)
    panel_docs = widen(
        perturbed_corpus(spark, sf_dir).filter(
            F.col("doc_id") % panel_mod == 0
        ),
        "doc_id",
    ).localCheckpoint(eager=False)
    # no emptiness filter: shingles_from_tokens emits >= 1 (possibly
    # truncated) shingle for every document by contract
    sh = panel_docs.select(
        "doc_id",
        F.array_distinct(
            shingles_from_tokens(tokens(normalize_text(F.col("text"))), 3)
        ).alias("shingles"),
    )
    mh_num = lambda k, s: F.conv(  # noqa: E731
        F.substring(
            F.md5(F.concat(k.cast("string"), F.lit(":"), s)), 1, 15
        ),
        16,
        10,
    ).cast("long")
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(MH_EVAL_HASHES - 1)),
        lambda k: F.array_min(
            F.transform(F.col("shingles"), lambda s: mh_num(k, s))
        ),
    )
    panel = (
        sh.select("doc_id", "shingles", sig.alias("sig"))
        # materialization barrier: without it CollapseProject inlines
        # the 32-hash signature expression into BOTH sides of the pair
        # join and recomputes it PER PAIR (measured 123s at sf0.1 — the
        # per-element lambda re-evaluation trap, SCALE.md "Planner-
        # level traps"); checkpointed, signatures compute once per doc
        .localCheckpoint(eager=False)
    )
    a = panel.select(
        F.col("doc_id").alias("id_a"),
        F.col("shingles").alias("ha"),
        F.col("sig").alias("sa"),
    )
    b = panel.select(
        F.col("doc_id").alias("id_b"),
        F.col("shingles").alias("hb"),
        F.col("sig").alias("sb"),
    )
    inter = F.size(F.array_intersect("ha", "hb"))
    uni = F.size("ha") + F.size("hb") - inter
    matches = F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: (x == y).cast("int")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b")).select(
        inter.alias("inter"), uni.alias("uni"), matches.alias("matches")
    )
    err_ppm = F.expr(
        f"abs(matches * uni - {MH_EVAL_HASHES} * inter) * 1000000"
        f" div ({MH_EVAL_HASHES} * uni)"
    )
    return (
        pairs.select(err_ppm.cast("bigint").alias("_e"))
        .select(F.expr("_e div 50000").cast("bigint").alias("err_bucket"))
        .groupBy("err_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("err_bucket")
    )


def _corpus5_sql() -> str:
    from .llm_dedup import _sql_corpus_shingles

    return _sql_corpus_shingles(5)


# ---------------------------------- dedup threshold yield curve


@query(
    "dedup_threshold_yield_curve",
    oracle=f"""
        WITH {{corpus5}},
        pairs AS (
            SELECT inter, la + lb - inter AS uni
            FROM (
                SELECT len(list_intersect(a.shingles, b.shingles)) AS inter,
                       len(a.shingles) AS la, len(b.shingles) AS lb
                FROM sh a JOIN sh b
                  ON a.lang = b.lang AND a.doc_id < b.doc_id
            )
            WHERE inter * 2 >= la + lb - inter
        ), banded AS (
            SELECT CAST((10 * inter) // uni AS BIGINT) AS band
            FROM pairs
        ), counts AS (
            SELECT band, CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM banded GROUP BY band
        )
        SELECT band, n_pairs,
               CAST(SUM(n_pairs) OVER (
                   ORDER BY band DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_pairs_at_or_above
        FROM counts
        ORDER BY band
    """.format(
        corpus5=_corpus5_sql()
    ),
    description="Dedup-threshold yield curve: one exact 5-gram PPJoin "
    "run at the loosest operating threshold (J >= 0.5) banded by "
    "EXACT integer deciles ((10*inter) div union — no double "
    "boundary ambiguity) with the reverse-cumulative pair count per "
    "band — the knob-setting measurement a dedup owner reads to pick "
    "a threshold (how many pairs does tightening 0.5 -> 0.7 give "
    "up?) from ONE run instead of re-running the join per candidate "
    "threshold. Candidate generation is the same provably-complete "
    "prefix-filtered join as dedup_ngram_jaccard_pairs; the "
    "cumulative runs on a <= 6-row band spine. The all-pairs SQL "
    "lives only in the oracle.",
)
def dedup_threshold_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import ngram_jaccard_pairs
    from .llm_dedup import perturbed_corpus

    corpus = perturbed_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        corpus, "text", "doc_id", block_cols=["lang"], shingle_size=5,
        threshold=0.5, with_counts=True,
    )
    counts = (
        pairs.select(
            F.expr("(10 * n_inter) div n_union").cast("bigint").alias("band")
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    w = Window.orderBy(F.col("band").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return counts.select(
        "band",
        "n_pairs",
        F.sum("n_pairs").over(w).cast("bigint").alias("n_pairs_at_or_above"),
    ).orderBy("band")

