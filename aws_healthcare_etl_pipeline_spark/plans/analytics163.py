"""Wave-189 (round 5): dedup design knobs + vector-metric law.

* ``dedup_shingle_size_sensitivity`` — the first knob every near-dup
  pipeline sets, measured: exact Jaccard similarity of adjacent
  document pairs under shingle sizes k = 2, 3, 4 (same pairs, same
  corpus), histogrammed per k. Bigger k sharpens the similarity
  distribution toward 0 for non-duplicates — this query shows by
  how much, exactly, via distinct-shingle joins (never array
  intersections over carried documents).

* ``emb_triangle_inequality_audit`` — cosine "distance" is NOT a
  metric: on a fixed panel of embedding triples, count triangle-
  inequality violations for quantized cosine distance (1 - cos, in
  ppm via the bit-portable floor-sqrt norms) vs the angular-style
  sqrt(2 - 2cos) transform that IS a metric. The violation counts
  are the reason VP-trees and metric pruning break on raw cosine —
  measured, not asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_SHINGLE_KS = (2, 3, 4)


@query(
    "dedup_shingle_size_sensitivity",
    oracle=rf"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, len(arr) + 1),
                          i -> {{'pos': i, 'tok': arr[i]}}),
                          recursive := true)
            FROM (SELECT doc_id,
                         regexp_split_to_array(trim(text), '\s+') AS arr
                  FROM documents)
        ), shingles AS MATERIALIZED (
            {" UNION ALL ".join(
                f"SELECT {k} AS k, doc_id, "
                + " || ' ' || ".join(
                    f"LEAD(tok, {j}) OVER (PARTITION BY doc_id"
                    f" ORDER BY pos)" if j else "tok"
                    for j in range(k))
                + " AS sh FROM toks"
                for k in _SHINGLE_KS)}
        ), sets AS MATERIALIZED (
            SELECT DISTINCT k, doc_id, sh FROM shingles
            WHERE sh IS NOT NULL
        ), sizes AS (
            SELECT k, doc_id, CAST(COUNT(*) AS BIGINT) AS sz
            FROM sets GROUP BY k, doc_id
        ), inter AS (
            SELECT a.k, a.doc_id AS d1,
                   CAST(COUNT(*) AS BIGINT) AS i
            FROM sets a JOIN sets b
              ON b.k = a.k AND b.doc_id = a.doc_id + 1
                 AND b.sh = a.sh
            GROUP BY a.k, a.doc_id
        ), pairs AS (
            SELECT s1.k, s1.doc_id AS d1,
                   COALESCE(i.i, 0) AS i,
                   s1.sz + s2.sz - COALESCE(i.i, 0) AS u
            FROM sizes s1
            JOIN sizes s2 ON s2.k = s1.k
                 AND s2.doc_id = s1.doc_id + 1
            LEFT JOIN inter i ON i.k = s1.k AND i.d1 = s1.doc_id
        )
        SELECT k,
               CAST(i * 1000 // u // 100 AS BIGINT) AS jaccard_decile,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(i) AS BIGINT) AS inter_mass,
               CAST(SUM(u) AS BIGINT) AS union_mass
        FROM pairs
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    description="Shingle-size sensitivity for Jaccard near-dup "
    "detection: the SAME adjacent-document pairs scored under k = "
    "2, 3, 4 token shingles, with exact intersection/union counts "
    "from distinct-shingle equi-joins (documents are never carried "
    "past the explode) and the similarity histogrammed per k in "
    "deciles. Larger shingles collapse chance overlaps toward zero "
    "— the histogram shift IS the design decision between recall "
    "and precision for the MinHash pipeline upstream. 100 TB "
    "shape: one explode per k (generated lanes over one token "
    "pass), distinct + join keyed on (k, shingle) — partial-agg "
    "and shuffle-friendly; the adjacent-pair panel keeps the pair "
    "count linear in corpus size.",
)
def dedup_shingle_size_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias(
            "pos", "tok"
        ),
    ).localCheckpoint(eager=False)  # feeds one lane per k
    # ONE window pass builds every k's shingle in parallel columns
    # (lead(tok, j) reuses the same per-doc sort; the previous
    # one-window-per-k version sorted the token stream len(KS) times
    # — 3 redundant window sorts over the whole corpus), then a
    # struct-array explode stacks the lanes. concat null-propagates,
    # so positions within k-1 of the doc end drop via isNotNull as
    # before — semantics identical, oracle unchanged.
    w = Window.partitionBy("doc_id").orderBy("pos")
    max_k = max(_SHINGLE_KS)
    # window expressions cannot live inside Generate — project the
    # lead columns first (one window pass), explode plain columns
    base = toks.select(
        "doc_id",
        F.col("tok").alias("l0"),
        *[
            F.lead("tok", j).over(w).alias(f"l{j}")
            for j in range(1, max_k)
        ],
    )
    sh_cols = {}
    for k in _SHINGLE_KS:
        sh = F.col("l0")
        for j in range(1, k):
            sh = F.concat(sh, F.lit(" "), F.col(f"l{j}"))
        sh_cols[k] = sh
    stacked = base.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"), sh_cols[k].alias("sh")
                    )
                    for k in _SHINGLE_KS
                ]
            )
        ).alias("lane"),
    )
    shingles = stacked.select(
        "lane.k", "doc_id", "lane.sh"
    ).where(F.col("sh").isNotNull())
    sets = shingles.distinct().localCheckpoint(
        eager=False
    )  # sizes + both join sides
    sizes = sets.groupBy("k", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    ).localCheckpoint(eager=False)
    b = sets.selectExpr("k AS kb", "doc_id AS db", "sh AS shb")
    inter = (
        sets.join(
            b,
            (F.col("kb") == F.col("k"))
            & (F.col("db") == F.col("doc_id") + 1)
            & (F.col("shb") == F.col("sh")),
        )
        .groupBy("k", F.col("doc_id").alias("d1"))
        .agg(F.count(F.lit(1)).cast("long").alias("i"))
    )
    s2 = sizes.selectExpr("k AS k2", "doc_id AS dd2", "sz AS sz2")
    pairs = (
        sizes.join(
            s2,
            (F.col("k2") == F.col("k"))
            & (F.col("dd2") == F.col("doc_id") + 1),
        )
        .join(
            inter,
            (inter.k == sizes.k) & (inter.d1 == sizes.doc_id),
            "left",
        )
        .select(
            sizes.k.alias("kk"),
            F.coalesce(F.col("i"), F.lit(0)).alias("ii"),
            (
                F.col("sz") + F.col("sz2")
                - F.coalesce(F.col("i"), F.lit(0))
            ).alias("u"),
        )
    )
    return (
        pairs.groupBy(
            F.col("kk").alias("k"),
            F.expr("CAST(ii * 1000 div u div 100 AS BIGINT)").alias(
                "jaccard_decile"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("ii").cast("long").alias("inter_mass"),
            F.sum("u").cast("long").alias("union_mass"),
        )
        .orderBy("k", "jaccard_decile")
    )


_TRI_LATTICE = 1 << 10
_TRI_PANEL = 300


@query(
    "emb_triangle_inequality_audit",
    oracle=f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                       e -> CAST(FLOOR(CAST(e AS DOUBLE)
                                       * {_TRI_LATTICE}.0) AS BIGINT))
                       AS v
            FROM embeddings
        ), pm AS (
            SELECT GREATEST(1, (COUNT(*) - 2) // {_TRI_PANEL}) AS m
            FROM q
        ), trip AS (
            SELECT a.vec_id AS t,
                   a.v AS va, b.v AS vb, c.v AS vc
            FROM q a
            JOIN q b ON b.vec_id = a.vec_id + 1
            JOIN q c ON c.vec_id = a.vec_id + 2
            CROSS JOIN pm
            WHERE a.vec_id % pm.m = 0
        ), dots AS (
            SELECT t,
                   list_sum(list_transform(range(1, 65),
                       i -> va[i] * vb[i])) AS dab,
                   list_sum(list_transform(range(1, 65),
                       i -> vb[i] * vc[i])) AS dbc,
                   list_sum(list_transform(range(1, 65),
                       i -> va[i] * vc[i])) AS dac,
                   list_sum(list_transform(range(1, 65),
                       i -> va[i] * va[i])) AS na,
                   list_sum(list_transform(range(1, 65),
                       i -> vb[i] * vb[i])) AS nb,
                   list_sum(list_transform(range(1, 65),
                       i -> vc[i] * vc[i])) AS nc
            FROM trip
        ), coss AS (
            SELECT t,
                   GREATEST(0, 1000000 - dab * 1000000
                       // (CAST(FLOOR(SQRT(CAST(na AS DOUBLE)))
                           AS BIGINT)
                         * CAST(FLOOR(SQRT(CAST(nb AS DOUBLE)))
                           AS BIGINT))) AS d_ab,
                   GREATEST(0, 1000000 - dbc * 1000000
                       // (CAST(FLOOR(SQRT(CAST(nb AS DOUBLE)))
                           AS BIGINT)
                         * CAST(FLOOR(SQRT(CAST(nc AS DOUBLE)))
                           AS BIGINT))) AS d_bc,
                   GREATEST(0, 1000000 - dac * 1000000
                       // (CAST(FLOOR(SQRT(CAST(na AS DOUBLE)))
                           AS BIGINT)
                         * CAST(FLOOR(SQRT(CAST(nc AS DOUBLE)))
                           AS BIGINT))) AS d_ac
            FROM dots
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triples,
               CAST(SUM(CASE WHEN d_ab + d_bc < d_ac
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS cosine_violations,
               CAST(SUM(CASE WHEN
                        CAST(FLOOR(SQRT(CAST(2 * d_ab AS DOUBLE)))
                            AS BIGINT)
                        + CAST(FLOOR(SQRT(CAST(2 * d_bc AS DOUBLE)))
                            AS BIGINT)
                        < CAST(FLOOR(SQRT(CAST(2 * d_ac AS DOUBLE)))
                            AS BIGINT)
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS angular_violations
        FROM coss
    """,
    description="Cosine 'distance' is not a metric — measured: on a "
    "fixed panel of consecutive embedding triples (mod-panel, "
    "constant size at any corpus scale), triangle-inequality "
    "violations are counted for quantized cosine distance (1 - cos "
    "in ppm, norms via the bit-portable floor-IEEE-sqrt on lattice "
    "integers) and for the sqrt(2 - 2cos) chord transform that IS a "
    "metric (violations ~0 up to quantization). This is WHY metric-"
    "tree pruning and some IVF bounds silently break on raw cosine; "
    "the counts make the argument. 100 TB shape: panel join on "
    "consecutive ids (equi-join), per-triple JVM-side array "
    "arithmetic, one rollup — constant cost by construction.",
)
def emb_triangle_inequality_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.selectExpr(
        "vec_id",
        f"transform(embedding, e -> CAST(FLOOR(CAST(e AS DOUBLE)"
        f" * {_TRI_LATTICE}.0) AS BIGINT)) AS v",
    ).localCheckpoint(eager=False)  # three join sides + panel count
    pm = q.agg(
        F.expr(
            f"GREATEST(1, (COUNT(*) - 2) div {_TRI_PANEL})"
        ).alias("m")
    )
    a = q.selectExpr("vec_id AS t", "v AS va")
    b = q.selectExpr("vec_id AS ib", "v AS vb")
    c = q.selectExpr("vec_id AS ic", "v AS vc")
    trip = (
        a.crossJoin(F.broadcast(pm))
        .where(F.expr("t % m = 0"))
        .join(b, F.col("ib") == F.col("t") + 1)
        .join(c, F.col("ic") == F.col("t") + 2)
    )
    dot = (
        "aggregate(zip_with({x}, {y}, (p, q) -> p * q),"
        " CAST(0 AS BIGINT), (acc, z) -> acc + z)"
    )
    dots = trip.selectExpr(
        "t",
        f"{dot.format(x='va', y='vb')} AS dab",
        f"{dot.format(x='vb', y='vc')} AS dbc",
        f"{dot.format(x='va', y='vc')} AS dac",
        f"{dot.format(x='va', y='va')} AS na",
        f"{dot.format(x='vb', y='vb')} AS nb",
        f"{dot.format(x='vc', y='vc')} AS nc",
    )
    isq = "CAST(FLOOR(SQRT(CAST({x} AS DOUBLE))) AS BIGINT)"
    coss = dots.selectExpr(
        "t",
        f"GREATEST(0, 1000000 - dab * 1000000 div ({isq.format(x='na')}"
        f" * {isq.format(x='nb')})) AS d_ab",
        f"GREATEST(0, 1000000 - dbc * 1000000 div ({isq.format(x='nb')}"
        f" * {isq.format(x='nc')})) AS d_bc",
        f"GREATEST(0, 1000000 - dac * 1000000 div ({isq.format(x='na')}"
        f" * {isq.format(x='nc')})) AS d_ac",
    )
    chord = "CAST(FLOOR(SQRT(CAST(2 * {d} AS DOUBLE))) AS BIGINT)"
    return coss.agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.expr(
            "SUM(CASE WHEN d_ab + d_bc < d_ac THEN 1 ELSE 0 END)"
        )
        .cast("long")
        .alias("cosine_violations"),
        F.expr(
            f"SUM(CASE WHEN {chord.format(d='d_ab')}"
            f" + {chord.format(d='d_bc')}"
            f" < {chord.format(d='d_ac')} THEN 1 ELSE 0 END)"
        )
        .cast("long")
        .alias("angular_violations"),
    )
