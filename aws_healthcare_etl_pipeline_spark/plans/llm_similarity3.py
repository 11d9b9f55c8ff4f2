"""Wave-38: the ANN recall/cost bake-off — all five similarity tiers
(brute / sign-LSH / IVF / PQ-ADC / SQ-int8) run on the IDENTICAL query
set (first 10 vectors, k=5) and are graded against the in-plan
brute-force truth: per-tier recall@k plus candidate-scan counts, in
one oracle-backed result.

Verification follows the established split (VERDICT r3 #7): tiers
whose math is rational/deterministic (brute, LSH, SQ) have their
recall recomputed EXACTLY by the DuckDB oracle from the shared CTE
builders (``_lsh_ctes`` / ``_sq_ctes``); tiers with float k-means
training (IVF, PQ) cannot be SQL-replicated, so their rows carry
NULL exact-recall and a SELF-GRADED floor boolean (same floors as
their standalone queries, whose detailed recall is pytest-covered in
tests/test_ivf.py / tests/test_pq.py).

At 100 TB this is the query that picks the production tier: recall
buys cost — brute scans every vector (Q x (N-1) scores), PQ/SQ scan
every COMPRESSED vector (4 / 64 bytes instead of 256), LSH scores
only colliding candidates (the n_candidates column measures exactly
how many), IVF only the probed clusters. All tiers reuse the exact
pipelines of their standalone queries (shared helpers, not copies),
so the bake-off numbers ARE the numbers of the operators users run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.parallelism import widen
from ..operators.similarity import brute_force_top_k, lsh_candidates, lsh_top_k
from ..sources.tables import load_table
from .llm_similarity import N_QUERIES, TOP_K, _lsh_ctes, ivf_topk_df, pq_topk_df
from .llm_similarity2 import _sq_ctes, sim_sq_int8_topk
from .registry import query

# per-tier recall floors: brute is exact by definition; LSH/SQ floors
# are redundant safety (their recall_pct is hash-checked exactly);
# IVF/PQ floors match their standalone structure-pinned oracles
_FLOORS = {"brute": 1.0, "lsh": 0.30, "ivf": 0.30, "pq": 0.50, "sq": 0.50}
# tiers whose recall_pct is exactly SQL-replicable (others emit NULL)
_EXACT = {"brute", "lsh", "sq"}


def _bakeoff_oracle() -> str:
    q, k = N_QUERIES, TOP_K
    return f"""
        WITH {_lsh_ctes(q)}, {_sq_ctes(q, k)},
        nn AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
        ), truth AS (
            SELECT query_id, vec_id FROM (
                SELECT q.query_id, c.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_dot_product(q.v, c.v)
                               / (sqrt(list_dot_product(q.v, q.v))
                                  * sqrt(list_dot_product(c.v, c.v))) DESC,
                               c.vec_id
                       ) AS rank
                FROM q, c WHERE c.vec_id <> q.query_id
            ) t WHERE rank <= {k}
        ), tt AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS t_total FROM truth
        ), lsh_topk AS (
            SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY cosine DESC, vec_id
                       ) AS rank
                FROM scored
            ) t WHERE rank <= {k}
        ), lsh_stats AS (
            SELECT CAST(COUNT(DISTINCT l.query_id) AS BIGINT) AS nq,
                   CAST(COUNT(*) AS BIGINT) AS nr,
                   CAST(SUM(CASE WHEN t.query_id IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS nh
            FROM lsh_topk l
            LEFT JOIN truth t
              ON l.query_id = t.query_id AND l.vec_id = t.vec_id
        ), sq_stats AS (
            SELECT CAST(COUNT(DISTINCT s.query_id) AS BIGINT) AS nq,
                   CAST(COUNT(*) AS BIGINT) AS nr,
                   CAST(SUM(CASE WHEN t.query_id IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS nh
            FROM sq_topk s
            LEFT JOIN truth t
              ON s.query_id = t.query_id AND s.vec_id = t.vec_id
        )
        SELECT * FROM (
            SELECT 'brute' AS tier,
                   (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT)
                    FROM truth) AS n_queries,
                   (SELECT t_total FROM tt) AS n_returned,
                   (SELECT CAST({q} * (n - 1) AS BIGINT) FROM nn)
                       AS n_candidates,
                   CAST(1.0 AS DOUBLE) AS recall_pct,
                   TRUE AS recall_ge_floor
            UNION ALL
            SELECT 'ivf',
                   CAST({q} AS BIGINT), CAST({q * k} AS BIGINT),
                   CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), TRUE
            UNION ALL
            SELECT 'lsh', nq, nr,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM cand),
                   CAST(nh AS DOUBLE)
                       / (SELECT CAST(t_total AS DOUBLE) FROM tt),
                   CAST(nh AS DOUBLE)
                       / (SELECT CAST(t_total AS DOUBLE) FROM tt)
                       >= {_FLOORS["lsh"]!r}
            FROM lsh_stats
            UNION ALL
            SELECT 'pq',
                   CAST({q} AS BIGINT), CAST({q * k} AS BIGINT),
                   (SELECT CAST({q} * n AS BIGINT) FROM nn),
                   CAST(NULL AS DOUBLE), TRUE
            UNION ALL
            SELECT 'sq', nq, nr,
                   (SELECT CAST({q} * (n - 1) AS BIGINT) FROM nn),
                   CAST(nh AS DOUBLE)
                       / (SELECT CAST(t_total AS DOUBLE) FROM tt),
                   CAST(nh AS DOUBLE)
                       / (SELECT CAST(t_total AS DOUBLE) FROM tt)
                       >= {_FLOORS["sq"]!r}
            FROM sq_stats
        ) rows
        ORDER BY tier
    """


@query(
    "sim_ann_recall_bakeoff",
    oracle=_bakeoff_oracle(),
    description="ANN tier bake-off: brute/LSH/IVF/PQ/SQ top-5 for the "
    "same 10 queries, each graded against the in-plan brute-force "
    "truth — one row per tier with recall@5 and the candidate-scan "
    "count (the recall-vs-cost trade that picks the production tier). "
    "brute/LSH/SQ rows are EXACTLY replicated by the oracle (shared "
    "fixed-seed hyperplane / quantizer CTEs, left-to-right double "
    "folds); IVF/PQ rows (float k-means training, not bit-stable "
    "cross-engine) carry NULL exact-recall plus self-graded floor "
    "booleans — same floors as their standalone structure-pinned "
    "oracles, detailed recall pytest-covered. Scale shape: every "
    "per-tier stat is a one-row aggregate; the unions/crossJoins "
    "combine single rows, so the output stage is O(1) regardless of "
    "corpus size; each tier keeps its own documented 100 TB plan "
    "(broadcast queries, codes-only scans, bucket equi-joins).",
)
def sim_ann_recall_bakeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    emb_wide = widen(emb, "vec_id")
    queries_df = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # lazily checkpointed: truth is N_QUERIES x TOP_K rows (bounded)
    # but its lineage is the full all-pairs brute-force scan and it
    # feeds SEVEN consumers below (its own tier, t_total, five hit
    # joins) — the pinned bounded-reduction checkpoint rule. NOTE the
    # bakeoff's wall time is dominated by the five methods' TRAINING
    # jobs (kmeans/codebooks, measured ~90% at sf0.01), so this trims
    # only the scan-side duplication; the bakeoff is the sum of its
    # five pipelines by construction.
    truth = (
        brute_force_top_k(emb_wide, queries_df, k=TOP_K)
        .select("query_id", "vec_id")
        .localCheckpoint(eager=False)
    )
    t_total = truth.agg(F.count(F.lit(1)).alias("t_total"))
    n_corpus = emb.agg(F.count(F.lit(1)).alias("n"))

    pairs_by_tier: dict[str, DataFrame] = {
        "brute": truth,
        "lsh": lsh_top_k(emb_wide, queries_df, k=TOP_K, dim=64).select(
            "query_id", "vec_id"
        ),
        "ivf": ivf_topk_df(emb).select("query_id", "vec_id"),
        "pq": pq_topk_df(emb).select("query_id", "vec_id"),
        "sq": sim_sq_int8_topk(spark, sf_dir).select("query_id", "vec_id"),
    }
    # candidate-scan counts: vectors each tier actually scores.
    # brute/sq score all non-self vectors; pq ADC-scans every code
    # (self included; the rerank drops it); lsh scores only colliding
    # candidates (measured genuinely); ivf's probed-cluster size
    # depends on float centroid assignment — not cross-engine
    # checkable, so NULL here (pytest covers it).
    cand_by_tier: dict[str, DataFrame | None] = {
        "brute": n_corpus.select(
            (F.lit(N_QUERIES) * (F.col("n") - 1)).cast("bigint").alias("n_candidates")
        ),
        "lsh": lsh_candidates(emb_wide, queries_df, dim=64).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates")
        ),
        "ivf": None,
        "pq": n_corpus.select(
            (F.lit(N_QUERIES) * F.col("n")).cast("bigint").alias("n_candidates")
        ),
        "sq": n_corpus.select(
            (F.lit(N_QUERIES) * (F.col("n") - 1)).cast("bigint").alias("n_candidates")
        ),
    }

    rows = []
    for tier, pairs in pairs_by_tier.items():
        if tier != "brute":
            # each tier's pair set is bounded (queries x k) but its
            # lineage is a full ANN pipeline consumed twice (agg +
            # hits join) — checkpoint so each pipeline runs ONCE
            pairs = pairs.localCheckpoint(eager=False)
        agg = pairs.agg(
            F.count_distinct(F.col("query_id")).cast("bigint").alias("n_queries"),
            F.count(F.lit(1)).cast("bigint").alias("n_returned"),
        )
        hits = pairs.join(truth, ["query_id", "vec_id"]).agg(
            F.count(F.lit(1)).alias("n_hits")
        )
        row = agg.crossJoin(hits).crossJoin(t_total)
        cand = cand_by_tier[tier]
        if cand is not None:
            row = row.crossJoin(cand)
            ncand = F.col("n_candidates")
        else:
            ncand = F.lit(None).cast("bigint")
        pct = F.col("n_hits").cast("double") / F.col("t_total").cast("double")
        rows.append(
            row.select(
                F.lit(tier).alias("tier"),
                F.col("n_queries"),
                F.col("n_returned"),
                ncand.alias("n_candidates"),
                (
                    pct if tier in _EXACT else F.lit(None).cast("double")
                ).alias("recall_pct"),
                (pct >= F.lit(_FLOORS[tier])).alias("recall_ge_floor"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("tier")
