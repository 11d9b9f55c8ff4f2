"""Wave-12 analytics: training-data curation stages — budgeted
selection, robust stats, behavioral paths, leakage-safe splits, and
dedup survivor policy.

  pipeline_token_budget_selection  quality-ranked selection under a
                                   per-language token budget
  winsorized_price_stats           p05/p95-clamped means without
                                   summing interpolated doubles
  top_event_paths                  sessionized event-type paths, top-15
  sampling_group_disjoint_split    user-level split (no cross-split
                                   leakage) with self-graded check
  dedup_canonical_selection        keep-best survivor per exact-dup
                                   cluster, survivor stats per lang

Oracle conventions per plans/registry.py; integer division via
div/// keeps budgets exact, winsorized means are recomposed from an
exact-DECIMAL interior sum plus count*bound terms so no interpolated
double is ever summed row-wise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import dec, query

# keep ~30% of each language's tokens (exact integer arithmetic)
BUDGET_NUM, BUDGET_DEN = 3, 10


@query(
    "pipeline_token_budget_selection",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                   CAST(n_chars AS DOUBLE)
                   / CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                          AS DOUBLE) AS score
            FROM documents
        ), ranked AS (
            SELECT lang, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY score DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_tokens,
                   ({BUDGET_NUM} * SUM(n_tokens) OVER (PARTITION BY lang))
                       // {BUDGET_DEN} AS budget
            FROM scored
        )
        SELECT lang,
               CAST(MAX(budget) AS BIGINT) AS budget_tokens,
               COUNT(CASE WHEN cum_tokens <= budget THEN 1 END)
                   AS n_docs_kept,
               CAST(COALESCE(SUM(CASE WHEN cum_tokens <= budget
                                      THEN n_tokens END), 0) AS BIGINT)
                   AS tokens_kept,
               round(CAST(COALESCE(SUM(CASE WHEN cum_tokens <= budget
                                             THEN n_tokens END), 0)
                          AS DOUBLE)
                     / CAST(MAX(budget) AS DOUBLE), 6) AS utilization
        FROM ranked GROUP BY lang ORDER BY lang
    """,
    description="Budget-constrained curation: per language, rank "
    "documents by a quality proxy (mean word length), admit greedily "
    "until the token budget (30% of the language's tokens, exact "
    "integer div) is exhausted. The cumulative-token window makes the "
    "greedy knapsack one sort per language instead of a driver loop; "
    "budgets and cumsums stay in integer arithmetic so the keep/drop "
    "frontier is engine-exact. The mixture-target selection stage of "
    "a training-data pipeline.",
)
def pipeline_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        (
            F.col("n_chars").cast("double")
            / F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double")
        ).alias("score"),
    )
    cum_w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = scored.select(
        "lang",
        "n_tokens",
        F.sum("n_tokens").over(cum_w).alias("cum_tokens"),
        F.expr(
            f"({BUDGET_NUM} * sum(n_tokens) over "
            f"(partition by lang)) div {BUDGET_DEN}"
        ).alias("budget"),
    )
    kept = F.when(F.col("cum_tokens") <= F.col("budget"), F.col("n_tokens"))
    return (
        ranked.groupBy("lang")
        .agg(
            F.max("budget").cast("bigint").alias("budget_tokens"),
            F.count(kept).alias("n_docs_kept"),
            F.coalesce(F.sum(kept), F.lit(0)).cast("bigint").alias("tokens_kept"),
            F.round(
                F.coalesce(F.sum(kept), F.lit(0)).cast("double")
                / F.max("budget").cast("double"),
                6,
            ).alias("utilization"),
        )
        .orderBy("lang")
    )


@query(
    "winsorized_price_stats",
    oracle="""
        WITH bounds AS (
            SELECT o_orderpriority AS pri,
                   quantile_cont(o_totalprice, 0.05) AS p05,
                   quantile_cont(o_totalprice, 0.95) AS p95
            FROM orders GROUP BY 1
        ), classified AS (
            SELECT b.pri, b.p05, b.p95, o_totalprice AS x
            FROM orders o JOIN bounds b ON o.o_orderpriority = b.pri
        )
        SELECT pri,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN x < p05 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_low,
               CAST(SUM(CASE WHEN x > p95 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_high,
               round((CAST(SUM(CASE WHEN x >= p05 AND x <= p95
                                    THEN CAST(x AS DECIMAL(15,2)) END)
                           AS DOUBLE)
                      + CAST(SUM(CASE WHEN x < p05 THEN 1 ELSE 0 END)
                             AS DOUBLE) * MAX(p05)
                      + CAST(SUM(CASE WHEN x > p95 THEN 1 ELSE 0 END)
                             AS DOUBLE) * MAX(p95))
                     / CAST(COUNT(*) AS DOUBLE), 6) AS winsorized_mean
        FROM classified GROUP BY pri ORDER BY pri
    """,
    description="Winsorized (p05/p95-clamped) mean order value per "
    "priority. The clamped mean is recomposed as exact-DECIMAL "
    "interior sum + count_low*p05 + count_high*p95 — clamped rows all "
    "collapse to the same bound, so no interpolated double is summed "
    "row-by-row and partial-aggregation order can't move the hash. "
    "Two passes over the group (bounds, then classify) with the "
    "tiny bounds frame broadcast back — the robust-statistics "
    "alternative to MAD when tails must be kept, not dropped.",
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("p05"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )
    joined = orders.join(
        F.broadcast(bounds), orders.o_orderpriority == bounds.pri
    ).select("pri", "p05", "p95", F.col("o_totalprice").alias("x"))
    interior = F.when(
        (F.col("x") >= F.col("p05")) & (F.col("x") <= F.col("p95")), dec("x")
    )
    n_low = F.sum(F.when(F.col("x") < F.col("p05"), 1).otherwise(0))
    n_high = F.sum(F.when(F.col("x") > F.col("p95"), 1).otherwise(0))
    return (
        joined.groupBy("pri")
        .agg(
            F.count(F.lit(1)).alias("n"),
            n_low.cast("bigint").alias("n_low"),
            n_high.cast("bigint").alias("n_high"),
            F.round(
                (
                    F.sum(interior).cast("double")
                    + n_low.cast("double") * F.max("p05")
                    + n_high.cast("double") * F.max("p95")
                )
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("winsorized_mean"),
        )
        .orderBy("pri")
    )


PATH_LEN = 5
PATH_TOP = 15


@query(
    "top_event_paths",
    oracle=f"""
        WITH marked AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN LAG(ts) OVER w IS NULL
                          OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT user_id, ts, event_id, event_type,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM marked
        ), paths AS (
            SELECT array_to_string(
                       (list(event_type ORDER BY ts, event_id))
                           [1:{PATH_LEN}], '>') AS path
            FROM numbered GROUP BY user_id, session_id
        )
        SELECT path, COUNT(*) AS n_sessions
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path
        LIMIT {PATH_TOP}
    """,
    description="Top behavioral paths: sessionize (30-min gap, gaps-"
    "and-islands), render each session's first 5 event types as an "
    "ordered '>'-joined path, count path frequencies, top-15. Path "
    "assembly sorts (ts, event_id) structs inside the group — "
    "collect_list order is never trusted — and the per-session slice "
    "bounds output regardless of session length. The funnel-discovery "
    "companion to the fixed-funnel query: it finds the paths instead "
    "of checking a hypothesized one.",
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("ts").over(w).alias("prev_ts"),
    )
    marked = lagged.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts") - F.col("prev_ts") > F.expr("INTERVAL '30' MINUTE")),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = marked.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    paths = (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("ts", "event_id", "event_type")
                            )
                        ),
                        lambda s: s["event_type"],
                    ),
                    1,
                    PATH_LEN,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(PATH_TOP)
    )


@query(
    "sampling_group_disjoint_split",
    oracle="""
        WITH assigned AS (
            SELECT user_id,
                   CASE
                     WHEN CAST(concat('0x',
                              substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                              AS BIGINT) % 10 < 8 THEN 'train'
                     WHEN CAST(concat('0x',
                              substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                              AS BIGINT) % 10 = 8 THEN 'val'
                     ELSE 'test'
                   END AS split
            FROM (SELECT DISTINCT user_id FROM events)
        ), tagged AS (
            SELECT e.user_id, a.split
            FROM events e JOIN assigned a ON e.user_id = a.user_id
        ), leak AS (
            SELECT MAX(n_splits) AS max_splits FROM (
                SELECT user_id, COUNT(DISTINCT split) AS n_splits
                FROM tagged GROUP BY user_id
            )
        )
        SELECT split,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events,
               (SELECT max_splits FROM leak) = 1 AS no_leakage
        FROM tagged GROUP BY split ORDER BY split
    """,
    description="Group-disjoint (user-level) train/val/test split: "
    "the split is a pure function of md5(user_id) — the engine-"
    "portable uniform hash convention — so every event of a user "
    "lands in one split and eval never sees a training user's "
    "behavior. The no_leakage column re-derives the guarantee from "
    "the data (max distinct splits per user == 1) rather than "
    "asserting it. Row-level hash splits (sampling_hash_split) leak "
    "entities across splits; this is the leakage-safe variant.",
)
def sampling_group_disjoint_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 10
    )
    assigned = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.when(bucket < 8, "train")
            .when(bucket == 8, "val")
            .otherwise("test")
            .alias("split"),
        )
    )
    tagged = ev.join(assigned, "user_id").select("user_id", "split")
    leak = (
        tagged.groupBy("user_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .agg(F.max("n_splits").alias("max_splits"))
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .crossJoin(F.broadcast(leak))
        .select(
            "split",
            "n_users",
            "n_events",
            (F.col("max_splits") == 1).alias("no_leakage"),
        )
        .orderBy("split")
    )


@query(
    "dedup_canonical_selection",
    oracle="""
        WITH clustered AS (
            SELECT lang, doc_id, n_chars, md5(text) AS h FROM documents
        ), survivors AS (
            SELECT lang, h,
                   COUNT(*) AS cluster_size,
                   MIN(doc_id) AS keep_doc,
                   MAX(n_chars) AS kept_chars
            FROM clustered GROUP BY lang, h
        )
        SELECT lang,
               CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
               COUNT(*) AS n_kept,
               CAST(SUM(cluster_size) - COUNT(*) AS BIGINT) AS n_removed,
               CAST(SUM(kept_chars) AS BIGINT) AS kept_chars_total
        FROM survivors GROUP BY lang ORDER BY lang
    """,
    description="Dedup survivor policy: exact-duplicate clusters "
    "(md5 of text) keep one canonical document each — the smallest "
    "doc_id, a deterministic tiebreak over byte-identical members — "
    "and the per-language survivor census (docs in, kept, removed, "
    "retained characters) quantifies what dedup cost the corpus. One "
    "16-byte-key shuffle for clustering plus a language rollup; the "
    "policy hook is where quality-ranked keep-best slots in when "
    "members differ (near-dup clusters).",
)
def dedup_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    survivors = (
        docs.select("lang", "doc_id", "n_chars", F.md5("text").alias("h"))
        .groupBy("lang", "h")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("doc_id").alias("keep_doc"),
            F.max("n_chars").alias("kept_chars"),
        )
    )
    return (
        survivors.groupBy("lang")
        .agg(
            F.sum("cluster_size").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).alias("n_kept"),
            (F.sum("cluster_size") - F.count(F.lit(1)))
            .cast("bigint")
            .alias("n_removed"),
            F.sum("kept_chars").cast("bigint").alias("kept_chars_total"),
        )
        .orderBy("lang")
    )
