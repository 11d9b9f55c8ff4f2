"""Wave-56 (round 5): diversified retrieval + distributional privacy.

* ``emb_mmr_diversified_topk`` — Maximal Marginal Relevance: the
  classic greedy re-ranker (Carbonell & Goldstein 1998) that picks the
  next result maximizing ``lambda*relevance - (1-lambda)*max-sim-to-
  already-selected``. The greedy recurrence is order-sensitive (every
  pick changes every later score), so like FFD packing / token-bucket
  it cannot be a window function; with k fixed the DuckDB oracle
  unrolls the selection into k chained CTEs and replays it exactly.
  All scoring is INTEGER arithmetic on lattice-quantized embeddings
  (floor(x*1024)), the repo's established trick for bit-identical
  iterative ML across engines (cf. emb_kmeans_lloyd_rounds).
* ``privacy_t_closeness_emd`` — t-closeness audit (Li et al. 2007),
  the distributional upgrade of k-anonymity: per quasi-identifier
  group, the Earth Mover's Distance between the group's sensitive-
  attribute distribution and the global one, over ORDERED categories
  where EMD = sum of |cumulative-share differences|. Shares are
  rationals, so the audit cross-multiplies: ``EMD * n_g * N`` is the
  integer ``sum_k |cum_g(k)*N - cum_G(k)*n_g|`` and the t-threshold
  compare is integer too — no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Row, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ MMR diversified top-k

_MMR_DIM = 64
_MMR_SCALE = 1024
_MMR_QUERY_ID = 0  # the query vector; excluded from candidates
_MMR_POOL = 20  # relevance-ranked candidate pool fed to the greedy
_MMR_K = 5  # results returned
# lambda = 2/3 cleared of denominators: mmr = 2*rel - 1*maxsim


def _int_dot(a: Column, b: Column) -> Column:
    """Left-to-right bigint dot product (exact, overflow-free: lattice
    coords are <= ~1k so a 64-dim dot is < 2^30)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _mmr_sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {_MMR_DIM}), "
        f"d -> {a}[d] * {b}[d]))"
    )


def _mmr_oracle() -> str:
    """Unroll the greedy selection into k chained CTE steps."""
    quant = (
        "list_transform(embedding, x -> "
        f"CAST(FLOOR(CAST(x AS DOUBLE) * {_MMR_SCALE}) AS BIGINT))"
    )
    steps = []
    for i in range(1, _MMR_K + 1):
        prev_pool = "pool" if i == 1 else f"rest{i - 1}"
        if i == 1:
            scored = (
                f"scored1 AS (SELECT vec_id, cv, rel, "
                f"CAST(0 AS BIGINT) AS maxsim FROM {prev_pool})"
            )
        else:
            sel_union = " UNION ALL ".join(
                f"SELECT cv AS scv FROM sel{j}" for j in range(1, i)
            )
            # lambda capture works across a plain FROM-list cross join
            # (correlated-subquery capture does not, in DuckDB)
            scored = (
                f"scored{i} AS (SELECT p.vec_id, ANY_VALUE(p.cv) AS cv, "
                f"ANY_VALUE(p.rel) AS rel, "
                f"MAX({_mmr_sql_dot('p.cv', 's.scv')}) AS maxsim "
                f"FROM {prev_pool} p CROSS JOIN ({sel_union}) s "
                f"GROUP BY p.vec_id)"
            )
        steps.append(scored)
        steps.append(
            f"sel{i} AS (SELECT vec_id, cv, rel, maxsim, "
            f"CAST({i} AS BIGINT) AS rank FROM scored{i} "
            f"ORDER BY 2 * rel - maxsim DESC, vec_id LIMIT 1)"
        )
        if i < _MMR_K:
            steps.append(
                f"rest{i} AS (SELECT vec_id, cv, rel FROM {prev_pool} "
                f"WHERE vec_id NOT IN (SELECT vec_id FROM sel{i}))"
            )
    final_union = " UNION ALL ".join(
        f"SELECT rank, vec_id, rel, maxsim FROM sel{j}"
        for j in range(1, _MMR_K + 1)
    )
    return f"""
        WITH q AS (
            SELECT {quant} AS qv FROM embeddings
            WHERE vec_id = {_MMR_QUERY_ID}
        ), cand AS (
            SELECT vec_id, {quant} AS cv FROM embeddings
            WHERE vec_id <> {_MMR_QUERY_ID}
        ), scored AS (
            SELECT vec_id, cv, {_mmr_sql_dot("cv", "qv")} AS rel
            FROM cand, q
        ), pool AS (
            SELECT vec_id, cv, rel FROM scored
            ORDER BY rel DESC, vec_id LIMIT {_MMR_POOL}
        ), {", ".join(steps)}
        SELECT rank,
               CAST(vec_id AS BIGINT) AS vec_id,
               CAST(rel AS BIGINT) AS relevance,
               CAST(maxsim AS BIGINT) AS max_sim_selected,
               CAST(2 * rel - maxsim AS BIGINT) AS mmr_score
        FROM ({final_union}) ORDER BY rank
    """


@query(
    "emb_mmr_diversified_topk",
    oracle=_mmr_oracle(),
    description="Maximal-Marginal-Relevance diversified top-5: greedy "
    "re-ranking of a 20-candidate relevance pool where each pick "
    "maximizes 2*relevance - max-dot-to-already-selected (lambda=2/3 "
    "cleared of denominators). All scores are bigint dot products on "
    "floor(x*1024) lattice embeddings, so the DuckDB oracle — the "
    "greedy unrolled into k chained CTEs — hash-matches bit-for-bit; "
    "the greedy recurrence is order-sensitive (provably not a window "
    "function), making this the retrieval-side sibling of the FFD/"
    "token-bucket stateful family. At 100 TB the heavy distributed "
    "work is the relevance scan + global top-POOL (TakeOrdered, no "
    "full sort); the greedy then touches only the POOL-row pool with "
    "k 1-row argmax transfers (k*POOL bounded by contract), and each "
    "argmax is computed distributed with the selected set broadcast "
    "as literals — the exact shape sample-bounded codebook training "
    "already uses.",
)
def emb_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    quant = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * _MMR_SCALE).cast("long"),
    )
    qv = emb.filter(F.col("vec_id") == _MMR_QUERY_ID).select(
        quant.alias("qv")
    )
    pool = (
        emb.filter(F.col("vec_id") != _MMR_QUERY_ID)
        .select("vec_id", quant.alias("cv"))
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", "cv", _int_dot(F.col("cv"), F.col("qv")).alias("rel")
        )
        .orderBy(F.desc("rel"), "vec_id")
        .limit(_MMR_POOL)
        .cache()
    )
    selected: list[Row] = []
    sel_vecs: list[list[int]] = []
    for rank in range(1, _MMR_K + 1):
        remaining = pool.filter(
            ~F.col("vec_id").isin([r.vec_id for r in selected])
            if selected
            else F.lit(True)
        )
        if sel_vecs:
            sims = [
                _int_dot(
                    F.col("cv"), F.array(*[F.lit(int(v)) for v in vec])
                )
                for vec in sel_vecs
            ]
            maxsim = sims[0] if len(sims) == 1 else F.greatest(*sims)
        else:
            maxsim = F.lit(0).cast("long")
        pick = (
            remaining.withColumn("maxsim", maxsim)
            .withColumn("mmr", 2 * F.col("rel") - F.col("maxsim"))
            .orderBy(F.desc("mmr"), "vec_id")
            .limit(1)
            .collect()[0]
        )  # 1-row transfer per greedy step (k-bounded by contract)
        selected.append(pick)
        sel_vecs.append(list(pick.cv))
    pool.unpersist()
    rows = [
        Row(
            rank=i + 1,
            vec_id=int(r.vec_id),
            relevance=int(r.rel),
            max_sim_selected=int(r.maxsim),
            mmr_score=int(r.mmr),
        )
        for i, r in enumerate(selected)
    ]
    return spark.createDataFrame(
        rows,
        schema=(
            "rank long, vec_id long, relevance long, "
            "max_sim_selected long, mmr_score long"
        ),
    ).orderBy("rank")


# ------------------------------------------------ t-closeness EMD audit

_TC_BAND_CENTS = 200_000  # equal-width acctbal bands (2000.00 each)
_TC_OFFSET_CENTS = 100_000  # shift so the minimum balance lands in band 0
# t = 1/5: violation iff EMD > t, i.e. 5 * emd_scaled > (m-1) * n_g * N


@query(
    "privacy_t_closeness_emd",
    oracle=f"""
        WITH c AS (
            SELECT c_nationkey, c_mktsegment,
                   (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                    + {_TC_OFFSET_CENTS}) // {_TC_BAND_CENTS} AS band
            FROM customer
        ), gband AS (
            SELECT band, CAST(COUNT(*) AS BIGINT) AS g_cnt FROM c GROUP BY band
        ), globc AS (
            SELECT band,
                   SUM(g_cnt) OVER (ORDER BY band) AS cum_g,
                   (SELECT SUM(g_cnt) FROM gband) AS n_total,
                   (SELECT COUNT(*) FROM gband) AS m_bands
            FROM gband
        ), grp AS (
            SELECT c_nationkey, c_mktsegment, band,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM c GROUP BY 1, 2, 3
        ), grps AS (
            SELECT c_nationkey, c_mktsegment, SUM(cnt) AS n_g FROM grp
            GROUP BY 1, 2
        ), grid AS (
            SELECT g.c_nationkey, g.c_mktsegment, g.n_g,
                   b.band, b.cum_g, b.n_total, b.m_bands,
                   COALESCE(x.cnt, 0) AS cnt
            FROM grps g CROSS JOIN globc b
            LEFT JOIN grp x ON x.c_nationkey = g.c_nationkey
                AND x.c_mktsegment = g.c_mktsegment AND x.band = b.band
        ), cums AS (
            SELECT c_nationkey, c_mktsegment, n_g, n_total, m_bands,
                   ABS(SUM(cnt) OVER (PARTITION BY c_nationkey, c_mktsegment
                                      ORDER BY band) * n_total
                       - cum_g * n_g) AS term
            FROM grid
        )
        SELECT c_nationkey, c_mktsegment,
               CAST(MAX(n_g) AS BIGINT) AS n_g,
               CAST(SUM(term) AS BIGINT) AS emd_scaled,
               (5 * SUM(term)) > ((MAX(m_bands) - 1) * MAX(n_g) * MAX(n_total))
                   AS t_violation
        FROM cums
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    description="t-closeness privacy audit over ordered sensitive "
    "bands: per quasi-identifier group (nation, segment), the Earth "
    "Mover's Distance between the group's account-balance-band "
    "distribution and the global one — for ordered categories EMD is "
    "the sum of |cumulative-share gaps|, and shares are cleared of "
    "denominators so emd_scaled = sum|cum_g*N - cum_G*n_g| and the "
    "t=1/5 compare 5*emd > (m-1)*n_g*N are pure bigint (the integer "
    "domain holds while n_g*N < 2^63; beyond that the terms switch to "
    "per-group DECIMAL(38,0) with the same recurrence). At 100 TB: "
    "one shuffle to count (group, band), the m-row global histogram "
    "broadcast onto the group list, and the cumulative window is "
    "partitioned per group over <= m rows — no global window, no "
    "skew-prone key, grid size |groups| x m which is metadata-scale.",
)
def privacy_t_closeness_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            f"(cast(cast(c_acctbal as decimal(12,2)) * 100 as bigint) "
            f"+ {_TC_OFFSET_CENTS}) div {_TC_BAND_CENTS}"
        ).alias("band"),
    )
    grp = cust.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    glob = cust.groupBy("band").agg(F.count(F.lit(1)).alias("g_cnt"))
    globc = glob.select(
        "band",
        F.sum("g_cnt")
        .over(Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_g"),
        F.sum("g_cnt").over(Window.partitionBy()).alias("n_total"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m_bands"),
    )  # <= m rows: the "no partition" windows scan a band-count spine only
    grps = grp.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").alias("n_g")
    )
    grid = (
        grps.crossJoin(F.broadcast(globc))
        .join(grp, ["c_nationkey", "c_mktsegment", "band"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = grid.withColumn(
        "term",
        F.abs(F.sum("cnt").over(w) * F.col("n_total") - F.col("cum_g") * F.col("n_g")),
    )
    return (
        cums.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.max("n_g").cast("long").alias("n_g"),
            F.sum("term").cast("long").alias("emd_scaled"),
            (
                5 * F.sum("term")
                > (F.max("m_bands") - 1) * F.max("n_g") * F.max("n_total")
            ).alias("t_violation"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )
