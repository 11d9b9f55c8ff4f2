"""Wave-66 (round 5): attenuated centrality + audio voicing features.

* ``graph_katz_centrality_integer`` — Katz centrality with beta = 1/2
  truncated at K = 3, kept EXACT: walk counts w_k(i) (number of
  length-k walks from i) are integers computed by k sparse matvec
  rounds (join + groupBy, the PageRank shape), and sum beta^k w_k is
  cleared of denominators as 4*w1 + 2*w2 + w3. The Spark side iterates
  the matvec; the oracle unrolls A^3 as three textbook joins — the
  hash match proves the iteration equals the closed form.
* ``multimodal_audio_zero_crossings`` — zero-crossing-rate framing
  over the synthetic sample lane (the VAD/voicing feature next to
  frame energy): per-frame sign-change counts of DC-centered samples,
  all inside-row array algebra, with a low-ZCR "voiced" flag via
  integer cross-multiplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ integer Katz centrality

_KATZ_PART_MOD = 8  # sample parts to bound the co-supply graph
_KATZ_TOP = 20


@query(
    "graph_katz_centrality_integer",
    oracle=f"""
        WITH ps AS (
            SELECT DISTINCT l_partkey AS p, l_suppkey AS s
            FROM lineitem WHERE l_partkey % {_KATZ_PART_MOD} = 0
        ), ab AS (
            SELECT p, MIN(s) AS a FROM ps GROUP BY p
        ), b2 AS (
            SELECT ps.p, MIN(ps.s) AS b
            FROM ps JOIN ab ON ab.p = ps.p AND ps.s > ab.a
            GROUP BY ps.p
        ), ed AS (
            SELECT DISTINCT a, b FROM ab JOIN b2 USING (p)
        ), edges AS (
            SELECT a AS src, b AS dst FROM ed
            UNION ALL SELECT b, a FROM ed
        ), w1 AS (
            SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS w FROM edges
            GROUP BY src
        ), w2 AS (
            SELECT e.src AS node, CAST(SUM(w1.w) AS BIGINT) AS w
            FROM edges e JOIN w1 ON w1.node = e.dst GROUP BY e.src
        ), w3 AS (
            SELECT e.src AS node, CAST(SUM(w2.w) AS BIGINT) AS w
            FROM edges e JOIN w2 ON w2.node = e.dst GROUP BY e.src
        )
        SELECT w1.node AS s_suppkey,
               w1.w AS walks1,
               COALESCE(w2.w, 0) AS walks2,
               COALESCE(w3.w, 0) AS walks3,
               CAST(4 * w1.w + 2 * COALESCE(w2.w, 0)
                    + COALESCE(w3.w, 0) AS BIGINT) AS katz_x8
        FROM w1 LEFT JOIN w2 ON w2.node = w1.node
                LEFT JOIN w3 ON w3.node = w1.node
        ORDER BY katz_x8 DESC, s_suppkey LIMIT {_KATZ_TOP}
    """,
    description="Katz centrality (beta=1/2, truncated at K=3) on the "
    "supplier co-supply graph, kept integer-exact: w_k(i) = length-k "
    "walk counts from i, computed by k sparse matvec rounds (edge "
    "join + node aggregate — the PageRank iteration shape with exact "
    "bigints instead of float mass), and sum beta^k w_k cleared of "
    "denominators as katz_x8 = 4*w1 + 2*w2 + w3. The oracle unrolls "
    "A^3 as textbook joins, so the hash match proves the iterative "
    "matvec equals the closed form. At 100 TB: each round is one "
    "shuffle on node id over an edge list whose degree is bounded by "
    "the two-smallest-suppliers-per-part construction; walk counts "
    "grow like degree^k, bounded in int64 for truncated K.",
)
def graph_katz_centrality_integer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    ps = (
        line.filter(F.col("l_partkey") % _KATZ_PART_MOD == 0)
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    ab = ps.groupBy("p").agg(F.min("s").alias("a"))
    b2 = (
        ps.join(ab, "p")
        .filter(F.col("s") > F.col("a"))
        .groupBy("p")
        .agg(F.min("s").alias("b"))
    )
    ed = ab.join(b2, "p").select("a", "b").distinct()
    edges = ed.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(
        ed.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    # k matvec rounds: w_k(src) = sum over edges of w_{k-1}(dst)
    w1 = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )
    def matvec(prev: DataFrame) -> DataFrame:
        return (
            edges.join(
                prev.withColumnRenamed("node", "dst_node"),
                F.col("dst_node") == F.col("dst"),
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("w").cast("long").alias("w"))
        )

    w2 = matvec(w1)
    w3 = matvec(w2)
    out = (
        w1.withColumnRenamed("w", "walks1")
        .join(w2.withColumnRenamed("w", "walks2"), "node", "left")
        .join(w3.withColumnRenamed("w", "walks3"), "node", "left")
        .select(
            F.col("node").alias("s_suppkey"),
            "walks1",
            F.coalesce(F.col("walks2"), F.lit(0)).cast("long").alias("walks2"),
            F.coalesce(F.col("walks3"), F.lit(0)).cast("long").alias("walks3"),
        )
        .withColumn(
            "katz_x8",
            (4 * F.col("walks1") + 2 * F.col("walks2") + F.col("walks3"))
            .cast("long"),
        )
    )
    return out.orderBy(F.desc("katz_x8"), "s_suppkey").limit(_KATZ_TOP)


# ------------------------------------------------ audio zero crossings

_ZCR_FRAME = 64
_ZCR_HOP = 32
_ZCR_DC = 96
# voiced: crossings * 4 < transitions-per-frame (ZCR < 25%)


@query(
    "multimodal_audio_zero_crossings",
    oracle=f"""
        WITH smp AS (
            SELECT doc_id, source,
                   list_filter(
                       list_transform(
                           list_filter(string_split_regex(text, ''),
                                       c -> c <> ''),
                           c -> ascii(c)),
                       s -> s BETWEEN 32 AND 126) AS s
            FROM documents
        ), framed AS (
            SELECT doc_id, source,
                   list_transform(
                       range(0, len(s) - {_ZCR_FRAME} + 1, {_ZCR_HOP}),
                       st -> CAST(list_sum(list_transform(
                                 range(1, {_ZCR_FRAME}),
                                 i -> CASE WHEN (s[st + i] - {_ZCR_DC})
                                               * (s[st + i + 1] - {_ZCR_DC})
                                               < 0
                                      THEN 1 ELSE 0 END))
                             AS BIGINT)) AS zc
            FROM smp
        )
        SELECT source,
               CAST(SUM(len(zc)) AS BIGINT) AS n_frames,
               CAST(COALESCE(SUM(list_sum(zc)), 0) AS BIGINT)
                   AS total_crossings,
               CAST(MAX(list_max(zc)) AS BIGINT) AS max_crossings,
               CAST(COALESCE(SUM(list_sum(list_transform(zc,
                        z -> CASE WHEN z * 4 < {_ZCR_FRAME - 1}
                             THEN 1 ELSE 0 END))), 0) AS BIGINT)
                   AS voiced_frames
        FROM framed GROUP BY source ORDER BY source
    """,
    description="Zero-crossing-rate framing over the synthetic sample "
    f"lane: {_ZCR_FRAME}-sample frames at hop {_ZCR_HOP}, per-frame "
    "count of DC-centered sign changes (product < 0 — the textbook "
    "ZCR), plus a low-ZCR voiced flag via the integer cross-"
    "multiplication 4*zc < transitions — the voicing/VAD feature that "
    "pairs with frame energy in every speech pipeline. Consecutive-"
    "sample products come from a zip of two shifted slices of the "
    "MATERIALIZED sample array (never element_at over re-evaluated "
    "expressions — the planner trap SCALE.md documents), so all "
    "per-frame math is inside-row array algebra: no explode, no "
    "shuffle until the per-source rollup. Exact int64 end-to-end.",
)
def multimodal_audio_zero_crossings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    samples = F.filter(
        F.transform(
            F.filter(F.split(F.col("text"), ""), lambda c: c != ""),
            F.ascii,
        ),
        lambda s: (s >= 32) & (s <= 126),
    )
    smp = docs.select("doc_id", "source", samples.alias("s"))
    n = F.size("s")
    starts = F.when(
        n >= _ZCR_FRAME,
        F.sequence(F.lit(0), n - _ZCR_FRAME, F.lit(_ZCR_HOP)),
    ).otherwise(F.array().cast("array<int>"))
    zc = F.transform(
        starts,
        lambda st: F.aggregate(
            F.zip_with(
                F.slice("s", st + 1, F.lit(_ZCR_FRAME - 1)),
                F.slice("s", st + 2, F.lit(_ZCR_FRAME - 1)),
                lambda a, b: F.when(
                    (a - _ZCR_DC).cast("long") * (b - _ZCR_DC).cast("long")
                    < 0,
                    1,
                ).otherwise(0),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ),
    )
    framed = smp.select("source", zc.alias("zc"))
    tot = F.aggregate("zc", F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    voiced = F.aggregate(
        F.transform(
            "zc",
            lambda z: F.when(z * 4 < _ZCR_FRAME - 1, 1).otherwise(0),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x.cast("bigint"),
    )
    per_doc = framed.select(
        "source",
        F.size("zc").cast("bigint").alias("nf"),
        tot.alias("tc"),
        F.array_max("zc").alias("mc"),
        voiced.alias("vf"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.sum("nf").cast("long").alias("n_frames"),
            F.coalesce(F.sum("tc"), F.lit(0))
            .cast("long")
            .alias("total_crossings"),
            F.max("mc").cast("long").alias("max_crossings"),
            F.coalesce(F.sum("vf"), F.lit(0))
            .cast("long")
            .alias("voiced_frames"),
        )
        .orderBy("source")
    )
