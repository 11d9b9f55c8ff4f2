"""Wave-210 (round 6, part 3): training-data pipeline operators —
curriculum budgeting, temperature-scaled source mixing, web-corpus URL
canonicalization, boilerplate stripping, sliding-window rate limiting,
and the approx-percentile guarantee audit.

All integer-exact (largest-remainder allocations, permille ratios,
count-based dedup) so the oracles pin values bit-for-bit; sqrt is the
one float op used (IEEE-mandated correct rounding makes it portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import dec, query

# ------------------------------------- curriculum stage budgets

CUR_BUDGET = 999_983  # prime: forces largest-remainder tie-breaking
CUR_WEIGHTS = (1, 2, 3, 4)  # later (harder) stages get more tokens


@query(
    "pipeline_curriculum_stage_budgets",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT)
                       AS n_tokens,
                   (ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1)
                       * 4 // COUNT(*) OVER () AS stage
            FROM documents
        ), stages AS (
            SELECT stage,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS tokens_available,
                   CASE stage WHEN 0 THEN {CUR_WEIGHTS[0]}
                              WHEN 1 THEN {CUR_WEIGHTS[1]}
                              WHEN 2 THEN {CUR_WEIGHTS[2]}
                              ELSE {CUR_WEIGHTS[3]} END AS w
            FROM scored GROUP BY stage
        ), alloc AS (
            SELECT stage, n_docs, tokens_available, w,
                   ({CUR_BUDGET} * w) // {sum(CUR_WEIGHTS)} AS base,
                   ({CUR_BUDGET} * w) % {sum(CUR_WEIGHTS)} AS rem,
                   {CUR_BUDGET} - SUM(({CUR_BUDGET} * w)
                                      // {sum(CUR_WEIGHTS)}) OVER ()
                       AS leftover,
                   ROW_NUMBER() OVER (
                       ORDER BY ({CUR_BUDGET} * w)
                                % {sum(CUR_WEIGHTS)} DESC, stage) AS rr
            FROM stages
        )
        SELECT CAST(stage AS BIGINT) AS stage, n_docs, tokens_available,
               CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS budget_alloc,
               CAST(LEAST(1000,
                    (base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END)
                    * 1000 // GREATEST(tokens_available, 1))
                    AS BIGINT) AS fill_permille
        FROM alloc
        ORDER BY stage
    """,
    description="Curriculum-learning stage budgets: documents ranked "
    "by length into 4 equal-count difficulty stages (integer "
    "rank*4 div n bucketing — deterministic, no NTILE tie "
    "ambiguity), then a prime token budget split 1:2:3:4 across "
    "stages by exact largest-remainder apportionment (base trunc "
    "shares, remainder units to the largest fractional parts, stage "
    "index tiebreak) with each stage's fill ratio against its actual "
    "token supply in exact permille. This is the sampling plan a "
    "staged pretraining run is driven by; ranks and sums are one "
    "shuffle each, the apportionment is 4-row arithmetic.",
)
def pipeline_curriculum_stage_budgets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_w = Window.orderBy(F.lit(1))
    rk = Window.orderBy("n_chars", "doc_id")
    scored = docs.select(
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias(
            "n_tokens"
        ),
        F.expr(
            "CAST((ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1)"
            " * 4 div (COUNT(*) OVER ()) AS BIGINT)"
        ).alias("stage"),
    )
    wsum = sum(CUR_WEIGHTS)
    stages = scored.groupBy("stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens_available"),
    ).withColumn(
        "w",
        F.when(F.col("stage") == 0, CUR_WEIGHTS[0])
        .when(F.col("stage") == 1, CUR_WEIGHTS[1])
        .when(F.col("stage") == 2, CUR_WEIGHTS[2])
        .otherwise(CUR_WEIGHTS[3]),
    )
    alloc = stages.select(
        "stage",
        "n_docs",
        "tokens_available",
        F.expr(f"({CUR_BUDGET} * w) div {wsum}").alias("base"),
        (F.lit(CUR_BUDGET) * F.col("w") % wsum).alias("rem"),
    ).withColumn(
        "leftover",
        F.lit(CUR_BUDGET)
        - F.sum("base").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    ).withColumn(
        "rr",
        F.row_number().over(Window.orderBy(F.col("rem").desc(), "stage")),
    )
    out = alloc.select(
        F.col("stage").cast("bigint").alias("stage"),
        "n_docs",
        "tokens_available",
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("budget_alloc"),
    ).withColumn(
        "fill_permille",
        F.expr(
            "CAST(LEAST(1000, budget_alloc * 1000"
            " div GREATEST(tokens_available, 1)) AS BIGINT)"
        ),
    )
    return out.orderBy("stage")


# --------------------------------- temperature sampling weights

TS_BUDGET = 10_000_000
TS_SCALE = 1_000_000  # weight = floor(sqrt(n_docs * SCALE))


@query(
    "pipeline_temperature_sampling_weights",
    oracle=f"""
        WITH shares AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(FLOOR(SQRT(CAST(COUNT(*) * {TS_SCALE}
                                        AS DOUBLE))) AS BIGINT) AS w
            FROM documents GROUP BY source
        ), alloc AS (
            SELECT source, n_docs, w,
                   SUM(w) OVER () AS sumw,
                   ({TS_BUDGET} * w) // SUM(w) OVER () AS base,
                   ({TS_BUDGET} * w) % SUM(w) OVER () AS rem
            FROM shares
        ), ranked AS (
            SELECT source, n_docs, w, base,
                   {TS_BUDGET} - SUM(base) OVER () AS leftover,
                   ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr
            FROM alloc
        )
        SELECT source, n_docs, w AS weight,
               CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS tokens_alloc
        FROM ranked
        ORDER BY source
    """,
    description="Temperature-scaled source mixing (T=2): per-source "
    "sampling weights proportional to sqrt(share) — the standard "
    "upweighting of small sources in multilingual/multi-domain "
    "pretraining — computed as floor(sqrt(n*1e6)) so the only float "
    "op is IEEE-correctly-rounded sqrt (bit-portable), then the "
    "token budget apportioned over the integer weights by exact "
    "largest remainder. The alternative (pow(share, 1/T) for "
    "arbitrary T) needs libm and is NOT cross-engine stable; T=2 is "
    "the sqrt special case that is. One groupBy over the corpus, "
    "then 20-row arithmetic — the mixing plan costs nothing next to "
    "the data it schedules.",
)
def pipeline_temperature_sampling_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shares = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    ).withColumn(
        "w",
        F.floor(
            F.sqrt((F.col("n_docs") * TS_SCALE).cast("double"))
        ).cast("bigint"),
    )
    whole = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    alloc = shares.select(
        "source",
        "n_docs",
        "w",
        F.expr(f"({TS_BUDGET} * w) div (SUM(w) OVER ())").alias("base"),
        (F.lit(TS_BUDGET) * F.col("w") % F.sum("w").over(whole)).alias(
            "rem"
        ),
    ).withColumn(
        "leftover", F.lit(TS_BUDGET) - F.sum("base").over(whole)
    ).withColumn(
        "rr",
        F.row_number().over(
            Window.orderBy(F.col("rem").desc(), "source")
        ),
    )
    return (
        alloc.select(
            "source",
            "n_docs",
            F.col("w").alias("weight"),
            (
                F.col("base")
                + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("tokens_alloc"),
        )
        .orderBy("source")
    )


# ----------------------------------------- URL canonical dedup


@query(
    "web_url_canonical_dedup",
    oracle="""
        WITH raw AS (
            SELECT source, u.u AS url
            FROM documents,
                 LATERAL (SELECT unnest([
                     'https://' || source || '.example.com/' || lang
                         || '/doc-' || CAST(doc_id % 500 AS VARCHAR)
                         || '?utm_source=feed&id='
                         || CAST(doc_id AS VARCHAR),
                     'HTTPS://' || upper(source) || '.Example.COM/'
                         || lang || '/doc-'
                         || CAST(doc_id % 500 AS VARCHAR) || '/',
                     'https://' || source || '.example.com/' || lang
                         || '/doc-' || CAST(doc_id % 500 AS VARCHAR)
                 ]) AS u) u
        ), canon AS (
            SELECT source,
                   regexp_replace(split_part(lower(url), '?', 1),
                                  '/+$', '') AS curl
            FROM raw
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_raw,
               CAST(COUNT(DISTINCT curl) AS BIGINT) AS n_canonical,
               CAST(COUNT(DISTINCT curl) * 1000 // COUNT(*) AS BIGINT)
                   AS keep_permille
        FROM canon
        GROUP BY source
        ORDER BY source
    """,
    description="Web-corpus URL canonicalization + dedup: three "
    "deterministic variants per document (tracking-query suffix, "
    "host-case + trailing-slash variant, clean form) collapse to one "
    "canonical URL via lowercase -> strip query string -> strip "
    "trailing slashes — the first dedup any CommonCrawl-style "
    "pipeline runs, BEFORE content hashing, because URL-level "
    "duplicates are free to drop. Emits raw vs canonical counts and "
    "the exact keep rate per source. String-function-only (lower / "
    "split on '?' / regexp trailing-slash trim), scan-side, one "
    "groupBy — at 100 TB this is a projection plus one count-distinct "
    "aggregation, no joins.",
)
def web_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("/doc-"), (F.col("doc_id") % 500).cast("string")
    )
    v1 = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), path, F.lit("?utm_source=feed&id="),
        F.col("doc_id").cast("string"),
    )
    v2 = F.concat(
        F.lit("HTTPS://"), F.upper("source"), F.lit(".Example.COM/"),
        F.col("lang"), path, F.lit("/"),
    )
    v3 = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), path,
    )
    raw = docs.select(
        "source", F.explode(F.array(v1, v2, v3)).alias("url")
    )
    canon = raw.select(
        "source",
        F.regexp_replace(
            F.substring_index(F.lower("url"), "?", 1), "/+$", ""
        ).alias("curl"),
    )
    return (
        canon.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_raw"),
            F.countDistinct("curl").cast("bigint").alias("n_canonical"),
        )
        .withColumn(
            "keep_permille",
            F.expr("CAST(n_canonical * 1000 div n_raw AS BIGINT)"),
        )
        .orderBy("source")
    )


# ------------------------------------- boilerplate line removal

BOILER_PCT = 1  # lines in > 1% of docs are boilerplate


@query(
    "text_boilerplate_line_removal",
    oracle=f"""
        WITH docs_n AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents
        ), lines AS (
            SELECT doc_id, lang, trim(l.l) AS line
            FROM documents,
                 LATERAL (SELECT unnest(string_split(text, '. '))
                              AS l) l
            WHERE trim(l.l) <> ''
        ), freq AS (
            SELECT line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM lines GROUP BY line
        ), flagged AS (
            SELECT li.lang, li.line,
                   CASE WHEN f.df * 100 > d.nd * {BOILER_PCT}
                        THEN 1 ELSE 0 END AS boiler
            FROM lines li
            JOIN freq f ON f.line = li.line
            CROSS JOIN docs_n d
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(boiler) AS BIGINT) AS n_removed,
               CAST(COUNT(DISTINCT CASE WHEN boiler = 1 THEN line END)
                    AS BIGINT) AS n_distinct_boiler,
               CAST(COUNT(*) - SUM(boiler) AS BIGINT) AS n_retained
        FROM flagged
        GROUP BY lang
        ORDER BY lang
    """,
    description="Boilerplate line stripping — the cleaning step "
    "between URL dedup and content dedup in every web-text pipeline: "
    "documents split into sentence-lines, each line's document "
    "frequency counted corpus-wide, and lines appearing in more than "
    "1% of documents (exact integer cross-multiplication, no float "
    "threshold) flagged as boilerplate (nav bars, cookie banners, "
    "license footers in the real world). Emits per-language removed/"
    "retained line counts and the distinct boilerplate inventory. "
    "100 TB shape: explode -> one groupBy on the line text (heavy "
    "hitters combine map-side) -> join back on the same key; the "
    "frequency table is the only shuffled state.",
)
def text_boilerplate_line_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    lines = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.col("text"), "\\. ")).alias("l"),
        )
        .select("doc_id", "lang", F.trim("l").alias("line"))
        .filter(F.col("line") != "")
    )
    freq = lines.groupBy("line").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    flagged = (
        lines.join(freq, "line")
        .crossJoin(F.broadcast(nd))
        .select(
            "lang",
            "line",
            F.when(
                F.col("df") * 100 > F.col("nd") * BOILER_PCT, 1
            )
            .otherwise(0)
            .alias("boiler"),
        )
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("boiler").cast("bigint").alias("n_removed"),
            F.countDistinct(
                F.when(F.col("boiler") == 1, F.col("line"))
            )
            .cast("bigint")
            .alias("n_distinct_boiler"),
            (F.count(F.lit(1)) - F.sum("boiler"))
            .cast("bigint")
            .alias("n_retained"),
        )
        .orderBy("lang")
    )


# --------------------------------- sliding-window rate limiting

RL_WINDOW_SEC = 3600
RL_LIMIT = 10


@query(
    "events_sliding_window_rate_limit",
    oracle=f"""
        WITH ev AS (
            SELECT user_id, event_type,
                   epoch_us(ts) // 1000000 AS sec
            FROM events
        ), counted AS (
            SELECT event_type,
                   COUNT(*) OVER (
                       PARTITION BY user_id ORDER BY sec
                       RANGE BETWEEN {RL_WINDOW_SEC - 1} PRECEDING
                             AND CURRENT ROW) AS in_window
            FROM ev
        )
        SELECT event_type,
               CAST(SUM(CASE WHEN in_window <= {RL_LIMIT}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
               CAST(SUM(CASE WHEN in_window > {RL_LIMIT}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_denied
        FROM counted
        GROUP BY event_type
        ORDER BY event_type
    """,
    description="Sliding-window rate limiting (the OTHER classic "
    "discipline next to the token bucket already in the registry): "
    "per user, an event is allowed iff at most 10 events fall in the "
    "trailing 3600-second window INCLUDING itself — expressed as a "
    "RANGE frame over epoch seconds, which both engines define "
    "identically on ties (all same-second events share one frame, so "
    "no tiebreak ambiguity — the RANGE-vs-ROWS lesson applied). "
    "Emits allow/deny counts per event type. 100 TB shape: one "
    "shuffle on user_id, a RANGE window per partition — exactly how "
    "a batch backfill of a limiter's decisions runs next to its "
    "streaming twin.",
)
def events_sliding_window_rate_limit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts) div 1000000").alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-(RL_WINDOW_SEC - 1), 0)
    )
    counted = ev.select(
        "event_type", F.count(F.lit(1)).over(w).alias("in_window")
    )
    return (
        counted.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("in_window") <= RL_LIMIT, 1).otherwise(0))
            .cast("bigint")
            .alias("n_allowed"),
            F.sum(F.when(F.col("in_window") > RL_LIMIT, 1).otherwise(0))
            .cast("bigint")
            .alias("n_denied"),
        )
        .orderBy("event_type")
    )


# --------------------------- approx-percentile guarantee audit

AP_ORDERS = 20000
AP_ACCURACY = 1000
AP_QS = (25, 50, 75)


@query(
    "agg_approx_percentile_rank_guarantee",
    oracle=f"""
        WITH data AS (
            SELECT CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS cents,
                   ROW_NUMBER() OVER (ORDER BY
                       CAST(l_extendedprice AS DECIMAL(15,2))) AS rn,
                   COUNT(*) OVER () AS n
            FROM lineitem WHERE l_orderkey < {AP_ORDERS}
        )
        SELECT q,
               (SELECT MAX(cents) FROM data
                WHERE rn = (q * (SELECT MAX(n) FROM data) + 99) // 100)
                   AS exact_value,
               CAST(1 AS BIGINT) AS within_bound
        FROM (SELECT unnest([{", ".join(str(q) for q in AP_QS)}]) AS q)
        ORDER BY q
    """,
    description="Approximate-percentile guarantee audit: Spark's "
    f"approx_percentile (accuracy {AP_ACCURACY}) promises a rank "
    "error of at most n/accuracy; this query computes the approx "
    "values, looks up their EXACT ranks in the data, and emits an "
    "integer within_bound flag per quantile via cross-multiplied "
    "integer comparison (|100*rank - q*n| * accuracy <= 100*n) "
    "alongside the exact order-statistic value (ceil-rank row over a "
    "deterministic order). The oracle recomputes the exact values "
    "and asserts the bound holds (flag = 1) — a sketch-class "
    "estimator audited against ground truth, the pattern every "
    "approximate operator in this repo follows. If Spark's t-digest "
    "ever broke its contract, this row mismatches loudly.",
)
def agg_approx_percentile_rank_guarantee(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < AP_ORDERS
    )
    data = li.select(
        (dec("l_extendedprice") * 100).cast("bigint").alias("cents")
    ).localCheckpoint(eager=False)
    qs = list(AP_QS)
    approx = data.agg(
        F.percentile_approx(
            "cents", [q / 100.0 for q in qs], AP_ACCURACY
        ).alias("av"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    # exact rank of each approx value + exact order statistics
    rows = None
    for i, q in enumerate(qs):
        one = (
            data.crossJoin(F.broadcast(approx))
            .agg(
                F.lit(q).cast("bigint").alias("q"),
                F.max("n").alias("n"),
                F.element_at(F.max("av"), i + 1).alias("a_v"),
                F.sum(
                    F.when(
                        F.col("cents")
                        <= F.element_at(F.col("av"), i + 1),
                        1,
                    ).otherwise(0)
                ).alias("rank_a"),
            )
        )
        rows = one if rows is None else rows.unionByName(one)
    # exact value: the ceil(q*n/100)-th smallest
    w = Window.orderBy("cents")
    ranked = data.select(
        "cents", F.row_number().over(w).alias("rn")
    )
    exact = (
        rows.join(
            ranked,
            F.col("rn") == F.expr("(q * n + 99) div 100"),
        )
        .select(
            "q",
            F.col("cents").alias("exact_value"),
            F.when(
                F.abs(F.lit(100) * F.col("rank_a") - F.col("q") * F.col("n"))
                * AP_ACCURACY
                <= F.lit(100) * F.col("n"),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("within_bound"),
        )
    )
    return exact.orderBy("q")
