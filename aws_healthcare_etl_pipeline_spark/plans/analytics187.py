"""Wave-210 (round 6, part 4): spectral embedding structure, graph
degree mixing, the manual skew-escape join rewrite, and audio gain
normalization.

* ``emb_power_iteration_top_eigen`` — the top eigenvector of the
  16-dim prefix-subspace Gram matrix by POWER ITERATION: the Gram
  matrix is ONE exact integer pass over the corpus (embeddings
  quantized to a 2^10 lattice — multiplying by a power of two is
  float-exact), and the iteration itself is 16x16 model math run
  driver-side under the bounded-collect contract. The oracle unrolls
  the same six iterations as MATERIALIZED single-row CTE levels with
  identical expression order, so every double matches bit-for-bit
  (only +,*,/ and IEEE-correctly-rounded sqrt are used).

* ``graph_avg_neighbor_degree`` — degree-mixing curve (average
  neighbor degree per degree class) on the bounded-degree supplier
  adjacency: the assortativity companion that shows WHERE the mixing
  happens, all exact integer sums.

* ``join_hot_cold_split_equivalence`` — the manual skew escape: a
  fact-dim join split into a broadcast path for data-derived HOT keys
  (>1% of rows) and a shuffle path for the cold tail, unioned before
  the final aggregate. The oracle is the PLAIN join, so the hash
  match proves the rewrite exact — this is the rewrite you deploy at
  100 TB when one key floods a reducer and AQE's skew split cannot
  see it (e.g. the key is hot only after a filter).

* ``multimodal_audio_gain_normalize`` — loudness normalization: per
  clip, the integer sample-energy stats give an exact RMS, the gain
  to a target RMS in permille (floor of an all-IEEE expression), and
  a would-clip flag from the exact peak — the per-asset preprocessing
  decision an audio corpus runs before training.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------- power-iteration eigenvector

PI_DIMS = 16  # prefix subspace of the 64-dim embeddings
PI_ROUNDS = 6
PI_LATTICE = 1024  # 2^10: scaling by it is float-exact


def _pi_oracle() -> str:
    sums = ", ".join(
        f"CAST(SUM(e{i} * e{j}) AS DOUBLE) AS g{i}_{j}"
        for i in range(1, PI_DIMS + 1)
        for j in range(i, PI_DIMS + 1)
    )
    quant = ", ".join(
        f"CAST(FLOOR(CAST(embedding[{i}] AS DOUBLE) * {PI_LATTICE})"
        f" AS BIGINT) AS e{i}"
        for i in range(1, PI_DIMS + 1)
    )

    def g(i: int, j: int) -> str:
        return f"g{min(i, j)}_{max(i, j)}"

    levels = [
        "v0 AS MATERIALIZED (SELECT "
        + ", ".join(f"CAST(1.0 AS DOUBLE) AS v{i}" for i in range(1, PI_DIMS + 1))
        + ")"
    ]
    for r in range(1, PI_ROUNDS + 1):
        w_cols = ", ".join(
            "("
            + " + ".join(f"{g(i, j)} * v{j}" for j in range(1, PI_DIMS + 1))
            + f") AS w{i}"
            for i in range(1, PI_DIMS + 1)
        )
        levels.append(
            f"w{r} AS MATERIALIZED (SELECT {w_cols} "
            f"FROM gram, v{r - 1})"
        )
        nrm = " + ".join(f"w{i} * w{i}" for i in range(1, PI_DIMS + 1))
        levels.append(
            f"n{r} AS MATERIALIZED (SELECT SQRT({nrm}) AS nrm FROM w{r})"
        )
        v_cols = ", ".join(
            f"w{i} / nrm AS v{i}" for i in range(1, PI_DIMS + 1)
        )
        levels.append(
            f"v{r} AS MATERIALIZED (SELECT {v_cols} FROM w{r}, n{r})"
        )
    lam = " + ".join(
        "v"
        + str(i)
        + " * ("
        + " + ".join(f"{g(i, j)} * v{j}" for j in range(1, PI_DIMS + 1))
        + ")"
        for i in range(1, PI_DIMS + 1)
    )
    chain = ", ".join(levels)
    return f"""
        WITH q AS MATERIALIZED (
            SELECT {quant} FROM embeddings
        ), gram AS MATERIALIZED (
            SELECT {sums} FROM q
        ), {chain}
        SELECT ({lam}) AS lam, v1, v2, v3
        FROM gram, v{PI_ROUNDS}
    """


@query(
    "emb_power_iteration_top_eigen",
    oracle=_pi_oracle(),
    description="Top eigenvector of the embedding Gram matrix "
    f"(16-dim prefix subspace) by {PI_ROUNDS} power-iteration rounds: "
    "embeddings quantize onto a 2^10 integer lattice (multiplying a "
    "float by a power of two is exact, so both engines see identical "
    "integers), the 136 Gram sums are ONE exact integer pass over "
    "the corpus, and the iteration runs on the collected 16x16 "
    "matrix driver-side — the bounded-collect contract, identical to "
    "the k-means centroid transfers. Every post-Gram operation is "
    "+ * / or IEEE sqrt in a FIXED evaluation order, mirrored "
    "exactly by the oracle's six MATERIALIZED single-row CTE levels "
    "(un-materialized, each level's 16-fold reuse would re-inline "
    "2^k-style). Emits the Rayleigh quotient and the leading "
    "components — the spectral summary (dominant direction + "
    "variance share) an embedding-quality monitor tracks per corpus "
    "snapshot; at 100 TB the data-touching cost is exactly one "
    "narrow aggregation.",
)
def emb_power_iteration_top_eigen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    quant = [
        F.floor(
            F.element_at("embedding", i).cast("double") * PI_LATTICE
        )
        .cast("bigint")
        .alias(f"e{i}")
        for i in range(1, PI_DIMS + 1)
    ]
    q = emb.select(*quant)
    gram_aggs = [
        F.sum(F.col(f"e{i}") * F.col(f"e{j}"))
        .cast("double")
        .alias(f"g{i}_{j}")
        for i in range(1, PI_DIMS + 1)
        for j in range(i, PI_DIMS + 1)
    ]
    row = q.agg(*gram_aggs).collect()[0]
    if all(row[f"g{i}_{j}"] is None for i in range(1, PI_DIMS + 1)
           for j in range(i, PI_DIMS + 1)):
        # Empty embeddings table: every SUM is NULL. The oracle's
        # single-row aggregate propagates those NULLs through every CTE
        # level and still emits ONE all-NULL row, so mirror that exactly
        # instead of returning an empty frame (row-count parity on the
        # empty-input edge case).
        return spark.createDataFrame(
            [(None, None, None, None)],
            "lam double, v1 double, v2 double, v3 double",
        )

    def g(i: int, j: int) -> float:
        return float(row[f"g{min(i, j)}_{max(i, j)}"])

    v = [1.0] * PI_DIMS
    for _ in range(PI_ROUNDS):
        w = []
        for i in range(1, PI_DIMS + 1):
            acc = 0.0
            for j in range(1, PI_DIMS + 1):  # fixed j order = SQL order
                acc = acc + g(i, j) * v[j - 1]
            w.append(acc)
        nrm_acc = 0.0
        for i in range(PI_DIMS):
            nrm_acc = nrm_acc + w[i] * w[i]
        nrm = math.sqrt(nrm_acc)  # IEEE-correct sqrt, matches SQL SQRT on every libm
        v = [wi / nrm for wi in w]
    lam = 0.0
    for i in range(1, PI_DIMS + 1):
        acc = 0.0
        for j in range(1, PI_DIMS + 1):
            acc = acc + g(i, j) * v[j - 1]
        lam = lam + v[i - 1] * acc
    return spark.createDataFrame(
        [(lam, v[0], v[1], v[2])],
        "lam double, v1 double, v2 double, v3 double",
    )


# --------------------------------------- average neighbor degree


@query(
    "graph_avg_neighbor_degree",
    oracle="""
        WITH ranked AS (
            SELECT s_nationkey AS na, s_suppkey AS sk,
                   ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                      ORDER BY s_suppkey) AS rk
            FROM supplier
        ), edges AS (
            SELECT a.sk AS u, b.sk AS v
            FROM ranked a JOIN ranked b
              ON b.na = a.na AND b.rk - a.rk IN (1, 2)
        ), und AS (
            SELECT u, v FROM edges
            UNION ALL
            SELECT v AS u, u AS v FROM edges
        ), deg AS (
            SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM und GROUP BY u
        ), nbr AS (
            SELECT e.u AS node, dv.d AS nbr_d
            FROM und e JOIN deg dv ON dv.node = e.v
        ), per_node AS (
            SELECT n.node, dn.d,
                   CAST(SUM(n.nbr_d) AS BIGINT) AS sum_nbr_d
            FROM nbr n JOIN deg dn ON dn.node = n.node
            GROUP BY n.node, dn.d
        )
        SELECT d AS degree,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(sum_nbr_d) AS BIGINT) AS sum_neighbor_degree,
               CAST(SUM(sum_nbr_d) * 1000 // (SUM(d)) AS BIGINT)
                   AS annd_permille
        FROM per_node
        GROUP BY d
        ORDER BY degree
    """,
    description="Average-neighbor-degree curve (the degree-mixing "
    "function k_nn(d)) on the bounded-degree supplier adjacency: for "
    "each degree class, how connected are its neighbors — the "
    "pointwise companion to the scalar assortativity coefficient "
    "already in the registry, exposing WHERE hubs attach. ANND is "
    "emitted as an exact permille (sum of neighbor degrees scaled "
    "against the class's total incident edges) so no float division "
    "exists. 100 TB shape: degrees are one groupBy; neighbor sums "
    "are one self-join on a bounded-degree edge list (each node "
    "contributes <= 4 rows) — linear in edges, no materialized "
    "two-hop blowup.",
)
def graph_avg_neighbor_degree(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("na"), F.col("s_suppkey").alias("sk")
    )
    rk = Window.partitionBy("na").orderBy("sk")
    ranked = sup.withColumn("rk", F.row_number().over(rk))
    a, b = ranked.alias("a"), ranked.alias("b")
    edges = a.join(
        b,
        (F.col("b.na") == F.col("a.na"))
        & (F.col("b.rk") - F.col("a.rk")).isin(1, 2),
    ).select(F.col("a.sk").alias("u"), F.col("b.sk").alias("v"))
    und = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    nbr = und.join(
        deg.select(F.col("node").alias("v"), F.col("d").alias("nbr_d")),
        "v",
    ).select(F.col("u").alias("node"), "nbr_d")
    per_node = (
        nbr.groupBy("node")
        .agg(F.sum("nbr_d").cast("bigint").alias("sum_nbr_d"))
        .join(deg, "node")
    )
    return (
        per_node.groupBy(F.col("d").alias("degree"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("sum_nbr_d").cast("bigint").alias(
                "sum_neighbor_degree"
            ),
            F.expr(
                "CAST(SUM(sum_nbr_d) * 1000 div SUM(d) AS BIGINT)"
            ).alias("annd_permille"),
        )
        .orderBy("degree")
    )


# -------------------------------------- hot/cold split join


@query(
    "join_hot_cold_split_equivalence",
    oracle="""
        SELECT s.s_nationkey AS nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                   AS sum_qty
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY s.s_nationkey
        ORDER BY nationkey
    """,
    description="The manual skew-escape join rewrite, proven exact: "
    "suppliers owning more than 1% of lineitem rows (a data-derived "
    "hot set) take a broadcast-join path while the cold tail takes "
    "the normal shuffle join, the two unioned BEFORE the final "
    "aggregate; the oracle is the PLAIN join, so the hash match "
    "proves the split changes nothing. At 100 TB this is the rewrite "
    "for the flooded-reducer case AQE cannot fix (skew visible only "
    "after a filter, or a build side too large to split): hot keys "
    "never shuffle at all — each hot key's rows stay where they are "
    "and meet a broadcast dimension row — and the cold shuffle is "
    "balanced by construction. The hot-key census itself is one "
    "map-side-combine count.",
)
def join_hot_cold_split_equivalence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("sk"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"),
        F.col("s_nationkey").alias("nationkey"),
    )
    counts = li.groupBy("sk").agg(F.count(F.lit(1)).alias("cnt"))
    total = li.agg(F.count(F.lit(1)).alias("tot"))
    hot_keys = (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * 100 > F.col("tot"))
        .select("sk")
    )
    li_flag = li.join(
        F.broadcast(hot_keys.withColumn("hot", F.lit(1))), "sk", "left"
    )
    hot_path = (
        li_flag.filter(F.col("hot") == 1)
        .join(F.broadcast(sup.join(F.broadcast(hot_keys), "sk")), "sk")
        .select("nationkey", "qty")
    )
    cold_path = (
        li_flag.filter(F.col("hot").isNull())
        .join(sup, "sk")
        .select("nationkey", "qty")
    )
    return (
        hot_path.unionByName(cold_path)
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("qty").cast("bigint").alias("sum_qty"),
        )
        .orderBy("nationkey")
    )


# ----------------------------------------- audio gain normalize

AG_TARGET_RMS = 20
AG_PEAK = 63  # synthetic samples are DC-centered into [-64, 30]


@query(
    "multimodal_audio_gain_normalize",
    oracle=f"""
        WITH smp AS (
            SELECT doc_id, lang,
                   list_transform(
                       list_filter(
                           list_transform(
                               list_filter(string_split_regex(text, ''),
                                           c -> c <> ''),
                               c -> ascii(c)),
                           s -> s BETWEEN 32 AND 126),
                       s -> s - 96) AS s
            FROM documents
        ), stats AS (
            SELECT doc_id, lang,
                   CAST(len(s) AS BIGINT) AS n,
                   CAST(list_sum(list_transform(s, x -> x * x))
                        AS BIGINT) AS ss,
                   CAST(list_max(list_transform(s, x -> abs(x)))
                        AS BIGINT) AS peak
            FROM smp WHERE len(s) > 0
        ), gains AS (
            SELECT lang, n, ss, peak,
                   CAST(FLOOR((1000.0 * {AG_TARGET_RMS})
                        / SQRT(CAST(GREATEST(ss, 1) AS DOUBLE)
                               / CAST(n AS DOUBLE))) AS BIGINT)
                       AS gain_permille
            FROM stats
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_clips,
               CAST(SUM(gain_permille) AS BIGINT) AS sum_gain_permille,
               CAST(MIN(gain_permille) AS BIGINT) AS min_gain,
               CAST(MAX(gain_permille) AS BIGINT) AS max_gain,
               CAST(SUM(CASE WHEN peak * gain_permille
                             > {AG_PEAK} * 1000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_would_clip
        FROM gains
        GROUP BY lang
        ORDER BY lang
    """,
    description="Audio loudness normalization over the synthetic "
    "sample stream (character codes, DC-centered — the registry's "
    "established audio stand-in): per clip the exact integer energy "
    "and peak give the RMS and the permille gain to a target RMS of "
    f"{AG_TARGET_RMS} (one FLOOR over an all-IEEE +,*,/,sqrt "
    "expression in fixed order — bit-portable), plus a would-clip "
    "flag from exact integer cross-multiplication of the peak "
    "against the dynamic-range ceiling. This is the normalize-or-"
    "reject decision an audio corpus preprocessor makes per asset "
    "before feature extraction; all per-sample math runs inside the "
    "row via higher-order array functions (no explode), so 100 TB "
    "of audio is a narrow single pass into a per-language rollup.",
)
def multimodal_audio_gain_normalize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    samples = F.transform(
        F.filter(
            F.transform(
                F.filter(F.split(F.col("text"), ""), lambda c: c != ""),
                F.ascii,
            ),
            lambda s: (s >= 32) & (s <= 126),
        ),
        lambda s: s - 96,
    )
    smp = docs.select("doc_id", "lang", samples.alias("s")).filter(
        F.size("s") > 0
    )
    stats = smp.select(
        "lang",
        F.size("s").cast("bigint").alias("n"),
        F.aggregate(
            "s",
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x.cast("bigint") * x.cast("bigint"),
        ).alias("ss"),
        F.array_max(
            F.transform(F.col("s"), lambda x: F.abs(x))
        )
        .cast("bigint")
        .alias("peak"),
    )
    gains = stats.withColumn(
        "gain_permille",
        F.floor(
            (F.lit(1000.0) * AG_TARGET_RMS)
            / F.sqrt(
                F.greatest(F.col("ss"), F.lit(1)).cast("double")
                / F.col("n").cast("double")
            )
        ).cast("bigint"),
    )
    return (
        gains.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clips"),
            F.sum("gain_permille")
            .cast("bigint")
            .alias("sum_gain_permille"),
            F.min("gain_permille").cast("bigint").alias("min_gain"),
            F.max("gain_permille").cast("bigint").alias("max_gain"),
            F.sum(
                F.when(
                    F.col("peak") * F.col("gain_permille")
                    > AG_PEAK * 1000,
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_would_clip"),
        )
        .orderBy("lang")
    )
