"""Wave-81 (round 5): Matryoshka retrieval economics + community
quality.

* ``sim_matryoshka_prefix_recall`` — the Matryoshka-embedding
  question: how much recall does each PREFIX dimensionality buy?
  Exact cosine top-k is run at prefix dims 8/16/32/64 over the same
  query panel, each graded against the full-dimension truth —
  the storage/recall sweep behind truncation-tiered vector serving
  (store 64 dims cold, serve 16 hot).
* ``graph_modularity_nations`` — Newman modularity of the nation
  partition over the supplier co-supply graph, in EXACT integer
  arithmetic: per community, contribution_x_4m2 = 4*m*L_c - D_c^2
  (L_c = internal edges, D_c = degree sum, m = total edges), so
  sum(contribution)/(4*m^2) is the usual Q without any float ever
  entering the plan — the partition-quality audit you run on ANY
  community output (label propagation, connected components) before
  trusting it downstream.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import brute_force_top_k
from ..sources.tables import load_table
from .llm_similarity import N_QUERIES, TOP_K
from .registry import query

# --------------------------------------- Matryoshka prefix-dim recall

_MATRYOSHKA_DIMS = (8, 16, 32, 64)


def _matryoshka_oracle() -> str:
    per_dim = []
    for d in _MATRYOSHKA_DIMS:
        per_dim.append(f"""
        topk_{d} AS (
            SELECT query_id, vec_id FROM (
                SELECT q.query_id, c.vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_dot_product(q.qv[1:{d}], c.cv[1:{d}])
                               / (sqrt(list_dot_product(q.qv[1:{d}],
                                                        q.qv[1:{d}]))
                                  * sqrt(list_dot_product(c.cv[1:{d}],
                                                          c.cv[1:{d}])))
                               DESC, c.vec_id
                       ) AS rank
                FROM q, c WHERE c.vec_id <> q.query_id
            ) t WHERE rank <= {TOP_K}
        )""")
        per_dim.append(f"""
        stats_{d} AS (
            SELECT CAST({d} AS BIGINT) AS prefix_dim,
                   CAST(COUNT(DISTINCT p.query_id) AS BIGINT) AS n_queries,
                   CAST(SUM(CASE WHEN t.query_id IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_hits,
                   CAST(COUNT(*) AS BIGINT) AS n_retrieved
            FROM topk_{d} p
            LEFT JOIN topk_64 t
              ON t.query_id = p.query_id AND t.vec_id = p.vec_id
        )""")
    unions = "\nUNION ALL\n".join(
        f"SELECT * FROM stats_{d}" for d in _MATRYOSHKA_DIMS
    )
    return f"""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ), c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
        ), {",".join(per_dim)}
        SELECT prefix_dim, n_queries, n_hits, n_retrieved,
               CAST((n_hits * 1000) // n_retrieved AS BIGINT)
                   AS recall_permille,
               CAST(prefix_dim * 4 AS BIGINT) AS bytes_per_vec
        FROM ({unions}) u
        ORDER BY prefix_dim
    """


@query(
    "sim_matryoshka_prefix_recall",
    oracle=_matryoshka_oracle(),
    description="Matryoshka truncation sweep: exact cosine top-5 is "
    "retrieved with only the first 8/16/32/64 embedding dimensions "
    "and graded against the full-dimension truth (recall@5 in "
    "integer permille, deterministic (cosine, vec_id) tiebreaks in "
    "both engines) — the storage-vs-recall curve that decides how "
    "many dimensions the HOT serving tier keeps when the cold tier "
    "stores all of them. Scale shape: the query panel is broadcast, "
    "the corpus is scanned ONCE PER PREFIX with a narrow slice "
    "projection (prefix slicing is free at read time — the prefix "
    "is a contiguous subarray, no re-encode), per-query top-k is "
    "WindowGroupLimit so nothing but k rows per (dim, query) "
    "survives the shuffle; recall grading joins k*Q-sized sets.",
)
def sim_matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    per_dim = []
    for d in _MATRYOSHKA_DIMS:
        corpus = emb.select(
            "vec_id", F.slice("embedding", 1, d).alias("embedding")
        )
        queries_df = (
            emb.filter(F.col("vec_id") < N_QUERIES)
            .select(
                F.col("vec_id").alias("query_id"),
                F.slice("embedding", 1, d).alias("query_vec"),
            )
        )
        per_dim.append(
            brute_force_top_k(corpus, queries_df, k=TOP_K).select(
                F.lit(d).cast("long").alias("prefix_dim"),
                "query_id",
                "vec_id",
            )
        )
    allk = reduce(DataFrame.unionByName, per_dim).localCheckpoint(eager=False)
    truth = allk.filter(F.col("prefix_dim") == 64).select(
        F.col("query_id").alias("t_query_id"), F.col("vec_id").alias("t_vec_id")
    )
    graded = allk.join(
        truth,
        (F.col("query_id") == F.col("t_query_id"))
        & (F.col("vec_id") == F.col("t_vec_id")),
        "left",
    )
    return (
        graded.groupBy("prefix_dim")
        .agg(
            F.countDistinct("query_id").cast("long").alias("n_queries"),
            F.sum(F.col("t_query_id").isNotNull().cast("long"))
            .cast("long")
            .alias("n_hits"),
            F.count(F.lit(1)).cast("long").alias("n_retrieved"),
        )
        .select(
            "prefix_dim",
            "n_queries",
            "n_hits",
            "n_retrieved",
            F.expr("(n_hits * 1000) div n_retrieved")
            .cast("long")
            .alias("recall_permille"),
            (F.col("prefix_dim") * 4).cast("long").alias("bytes_per_vec"),
        )
        .orderBy("prefix_dim")
    )


# ------------------------------------------- modularity of a partition

_MOD_PART_CAP = 400  # same bounded co-supply graph as the triangle query


@query(
    "graph_modularity_nations",
    oracle=f"""
        WITH co AS (
            SELECT DISTINCT least(a.l_suppkey, b.l_suppkey) AS u,
                   greatest(a.l_suppkey, b.l_suppkey) AS v
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
                  WHERE l_partkey < {_MOD_PART_CAP}) a
            JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
                  WHERE l_partkey < {_MOD_PART_CAP}) b
              ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
        ), m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS m FROM co
        ), deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT u AS node FROM co
                UNION ALL SELECT v AS node FROM co
            ) GROUP BY node
        ), comm AS (
            SELECT s.s_suppkey AS node, n.n_name AS community
            FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        ), internal AS (
            SELECT cu.community,
                   CAST(COUNT(*) AS BIGINT) AS l_c
            FROM co
            JOIN comm cu ON cu.node = co.u
            JOIN comm cv ON cv.node = co.v
            WHERE cu.community = cv.community
            GROUP BY cu.community
        ), degsum AS (
            SELECT c.community,
                   CAST(COUNT(*) AS BIGINT) AS n_nodes,
                   CAST(SUM(deg.d) AS BIGINT) AS d_c
            FROM deg JOIN comm c ON c.node = deg.node
            GROUP BY c.community
        )
        SELECT ds.community,
               ds.n_nodes,
               CAST(COALESCE(i.l_c, 0) AS BIGINT) AS internal_edges,
               ds.d_c AS degree_sum,
               CAST(4 * m.m * COALESCE(i.l_c, 0) - ds.d_c * ds.d_c
                    AS BIGINT) AS contribution_x_4m2
        FROM degsum ds
        LEFT JOIN internal i ON i.community = ds.community
        CROSS JOIN m
        ORDER BY ds.community
    """,
    description="Newman modularity of the nation partition over the "
    "bounded co-supply graph, exactly: per community the integer "
    "numerator contribution_x_4m2 = 4*m*L_c - D_c^2, whose sum over "
    "communities divided by 4*m^2 is the usual Q in [-1/2, 1] — no "
    "float arithmetic anywhere, so the audit is engine-portable and "
    "can gate ANY partition (label-prop output, connected "
    "components, a business dimension as here). Scale shape: the "
    "edge list is built once from a bounded co-occurrence join, "
    "degrees are a node-grain aggregate, community labels join in "
    "from a broadcast dimension, and every aggregate is map-side "
    "combined — the heaviest object that ever shuffles is the edge "
    "list itself, once.",
)
def graph_modularity_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") < _MOD_PART_CAP)
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)  # feeds m, degrees, and internal-edge
        # counting — pin once instead of re-deriving from the lineitem scan
    )
    m = co.agg(F.count(F.lit(1)).cast("long").alias("m"))
    deg = (
        co.select(F.col("u").alias("node"))
        .unionAll(co.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    comm = F.broadcast(
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("s_suppkey").alias("node"), F.col("n_name").alias("community")
        )
    )
    cu = comm.select(
        F.col("node").alias("cu_node"), F.col("community").alias("cu_comm")
    )
    cv = comm.select(
        F.col("node").alias("cv_node"), F.col("community").alias("cv_comm")
    )
    internal = (
        co.join(F.broadcast(cu), F.col("u") == F.col("cu_node"))
        .join(F.broadcast(cv), F.col("v") == F.col("cv_node"))
        .filter(F.col("cu_comm") == F.col("cv_comm"))
        .groupBy(F.col("cu_comm").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("l_c"))
    )
    degsum = (
        deg.join(F.broadcast(comm), "node")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("d").cast("long").alias("d_c"),
        )
    )
    return (
        degsum.join(internal, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "n_nodes",
            F.coalesce(F.col("l_c"), F.lit(0))
            .cast("long")
            .alias("internal_edges"),
            F.col("d_c").cast("long").alias("degree_sum"),
            (
                4 * F.col("m") * F.coalesce(F.col("l_c"), F.lit(0))
                - F.col("d_c") * F.col("d_c")
            )
            .cast("long")
            .alias("contribution_x_4m2"),
        )
        .orderBy("community")
    )
