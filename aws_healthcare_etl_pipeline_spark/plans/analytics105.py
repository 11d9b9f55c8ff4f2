"""Wave-131 (round 5): Johnson-Lindenstrauss distortion audit +
incident MTTR statistics.

* ``emb_jl_projection_distortion`` — the JL lemma, measured: a
  FIXED 16x64 random-sign matrix (md5-derived in Python at import
  time, embedded as literal expression text both engines compile)
  projects lattice-quantized embeddings to 16 dims; for a fixed-
  size pair panel, the ratio ||y_a - y_b||^2 / (K * ||x_a -
  x_b||^2) must concentrate near 1 — reported as an exact-integer
  permille histogram. This is the audit run before trusting any
  sketched-distance ANN tier: how much distance distortion does
  the projection actually introduce on THIS corpus.
* ``ops_incident_mttr_stats`` — SRE bread and butter: error events
  cluster into incidents per user (30-minute gap rule, the
  repo's islands machinery), and MTTR statistics (mean, p50, p90,
  max of incident durations) come out exactly — quantiles by
  cumulative-count rank selection over the duration histogram, no
  global sort.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------- JL audit

_DIM = 64
_K = 16
_Q = 1 << 20  # float -> integer lattice quantizer


def _jl_sign(k: int, j: int) -> int:
    h = hashlib.md5(f"jl:{k}:{j}".encode()).hexdigest()
    return 1 if int(h[:8], 16) % 2 == 0 else -1


def _proj_exprs(one_based: bool) -> list[str]:
    """y_k as literal signed sums; v is the quantized int array."""
    outs = []
    for k in range(_K):
        terms = []
        for j in range(1, _DIM + 1):
            s = "+" if _jl_sign(k, j) > 0 else "-"
            idx = j if one_based else j - 1
            terms.append(f"{s} v[{idx}]")
        outs.append("(" + " ".join(terms) + f") AS y{k}")
    return outs


@query(
    "emb_jl_projection_distortion",
    oracle=f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                                  e -> CAST(FLOOR(CAST(e AS DOUBLE)
                                                  * {_Q}.0)
                                            AS BIGINT)) AS v
            FROM embeddings
        ), pm AS (
            SELECT GREATEST(CAST(FLOOR(COUNT(*) / 200.0)
                                 AS BIGINT), 1) AS panel_mod
            FROM q
        ), panel AS (
            SELECT vec_id, v, {", ".join(_proj_exprs(True))}
            FROM q, pm WHERE vec_id % pm.panel_mod = 0
        ), pairs AS (
            SELECT CAST(list_sum(list_transform(range(1, {_DIM} + 1),
                       i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])))
                       AS BIGINT) AS d2x,
                   ({" + ".join(
                       f"(a.y{k} - b.y{k}) * (a.y{k} - b.y{k})"
                       for k in range(_K))}) AS d2y
            FROM panel a JOIN panel b ON a.vec_id < b.vec_id
        )
        SELECT CAST(CAST(d2y AS HUGEINT) * 10
                    // ({_K} * CAST(d2x AS HUGEINT)) AS BIGINT)
                   AS distortion_decile,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs WHERE d2x > 0
        GROUP BY 1 ORDER BY distortion_decile
    """,
    description="Johnson-Lindenstrauss distortion, measured on this "
    "corpus: embeddings quantize to the 2^20 integer lattice (the "
    "repo's exact-embedding idiom), a FIXED 16x64 md5-derived "
    "random-sign matrix — generated once in Python and embedded as "
    "the SAME literal signed-sum text in both engines — projects "
    "them to 16 dims, and for every fixed-size-panel pair the "
    "ratio ||dy||^2 / (K*||dx||^2) lands in an exact integer "
    "decile histogram that must concentrate at 1.0 (decile 10, "
    "E[||y||^2] = K||x||^2 for sign projections). This is the "
    "pre-flight audit for every sketched-distance ANN tier: it "
    "prices the recall you will lose to projection BEFORE you "
    "build the index. 100 TB shape: the projection is a narrow "
    "per-row signed sum (codegen-friendly, no lambda per element "
    "for the 16 outputs); pair volume is panel-bounded.",
)
def emb_jl_projection_distortion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda e: F.floor(e.cast("double") * _Q).cast("long"),
        ).alias("v"),
    )
    pm = q.agg(
        F.greatest(
            F.floor(F.count(F.lit(1)) / 200.0).cast("long"), F.lit(1)
        ).alias("panel_mod")
    )
    panel = (
        q.crossJoin(F.broadcast(pm))
        .where(F.col("vec_id") % F.col("panel_mod") == 0)
        .selectExpr("vec_id", "v", *_proj_exprs(False))
        .localCheckpoint(eager=False)  # bounded panel; self-joined
    )
    b = panel.select(
        F.col("vec_id").alias("vb"),
        F.col("v").alias("wv"),
        *[F.col(f"y{k}").alias(f"z{k}") for k in range(_K)],
    )
    d2y = " + ".join(
        f"(y{k} - z{k}) * (y{k} - z{k})" for k in range(_K)
    )
    pairs = (
        panel.join(b, panel.vec_id < b.vb)
        .select(
            F.aggregate(
                F.zip_with(
                    "v", "wv", lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0).cast("long"),
                lambda acc, t: acc + t,
            ).alias("d2x"),
            F.expr(d2y).cast("long").alias("d2y"),
        )
        .where(F.col("d2x") > 0)
    )
    d38 = "decimal(38,0)"
    return (
        pairs.select(
            F.expr(
                f"CAST(CAST(d2y AS {d38}) * 10"
                f" div ({_K} * CAST(d2x AS {d38})) AS LONG)"
            ).alias("distortion_decile")
        )
        .groupBy("distortion_decile")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("distortion_decile")
    )


# ---------------------------------------------- incident MTTR

_GAP_S = 1800  # 30-minute incident gap rule


@query(
    "ops_incident_mttr_stats",
    oracle=f"""
        WITH err AS (
            SELECT user_id, epoch_us(ts) // 1000000 AS t
            FROM events WHERE event_type = 'error'
        ), marked AS (
            SELECT user_id, t,
                   CASE WHEN t - lag(t) OVER (PARTITION BY user_id
                                              ORDER BY t) > {_GAP_S}
                             OR lag(t) OVER (PARTITION BY user_id
                                             ORDER BY t) IS NULL
                        THEN 1 ELSE 0 END AS new_inc
            FROM err
        ), islands AS (
            SELECT user_id, t,
                   SUM(new_inc) OVER (PARTITION BY user_id ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS inc_id
            FROM marked
        ), incidents AS (
            SELECT user_id, inc_id,
                   CAST(MAX(t) - MIN(t) AS BIGINT) AS dur_s
            FROM islands GROUP BY 1, 2
        ), hist AS (
            SELECT dur_s, CAST(COUNT(*) AS BIGINT) AS h
            FROM incidents GROUP BY dur_s
        ), cum AS (
            SELECT dur_s, h,
                   CAST(SUM(h) OVER (ORDER BY dur_s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS ci
            FROM hist
        ), tot AS (
            SELECT CAST(SUM(h) AS BIGINT) AS n,
                   CAST(SUM(dur_s * h) AS BIGINT) AS s,
                   CAST(MAX(dur_s) AS BIGINT) AS mx
            FROM hist
        )
        SELECT t.n AS n_incidents,
               CAST(t.s // t.n AS BIGINT) AS mean_s,
               (SELECT MIN(dur_s) FROM cum, tot
                WHERE 2 * ci >= tot.n) AS p50_s,
               (SELECT MIN(dur_s) FROM cum, tot
                WHERE 10 * ci >= 9 * tot.n) AS p90_s,
               t.mx AS max_s
        FROM tot t
    """,
    description="Incident MTTR statistics — the SRE scorecard: "
    "error events cluster into per-user incidents under the "
    "30-minute gap rule (the islands pattern: a new incident "
    "starts when the gap to the previous error exceeds the rule), "
    "incident duration is last-minus-first error seconds, and "
    "mean/p50/p90/max repair times come out EXACTLY — quantiles by "
    "cumulative-count rank selection (min duration with 2*ci >= n, "
    "10*ci >= 9n) over the duration histogram, no global sort. "
    "100 TB shape: one filter-pruned scan (event_type = 'error' "
    "pushes to the parquet scan), per-user partitioned windows (a "
    "parallel shuffle), a duration histogram, and spine algebra — "
    "the percentile never touches row order.",
)
def ops_incident_mttr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    err = events.where(F.col("event_type") == "error").select(
        "user_id", (F.unix_micros("ts") / 1000000).cast("long").alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t")
    marked = err.withColumn(
        "new_inc",
        F.when(
            (F.col("t") - F.lag("t").over(w) > _GAP_S)
            | F.lag("t").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    wi = Window.partitionBy("user_id").orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = marked.withColumn("inc_id", F.sum("new_inc").over(wi))
    incidents = islands.groupBy("user_id", "inc_id").agg(
        (F.max("t") - F.min("t")).cast("long").alias("dur_s")
    )
    hist = incidents.groupBy("dur_s").agg(
        F.count(F.lit(1)).cast("long").alias("h")
    ).localCheckpoint(eager=False)  # bounded duration domain
    # duration domain bounded by the gap rule x burst length: window OK
    wc = Window.orderBy("dur_s").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "dur_s", F.sum("h").over(wc).cast("long").alias("ci")
    )
    tot = hist.agg(
        F.sum("h").cast("long").alias("n"),
        F.sum(F.col("dur_s") * F.col("h")).cast("long").alias("s"),
        F.max("dur_s").cast("long").alias("mx"),
    )
    p50 = (
        cum.crossJoin(F.broadcast(tot))
        .where(2 * F.col("ci") >= F.col("n"))
        .agg(F.min("dur_s").alias("p50_s"))
    )
    p90 = (
        cum.crossJoin(F.broadcast(tot))
        .where(10 * F.col("ci") >= 9 * F.col("n"))
        .agg(F.min("dur_s").alias("p90_s"))
    )
    return (
        tot.crossJoin(F.broadcast(p50))
        .crossJoin(F.broadcast(p90))
        .select(
            F.col("n").alias("n_incidents"),
            F.expr("CAST(s div n AS LONG)").alias("mean_s"),
            "p50_s",
            "p90_s",
            F.col("mx").alias("max_s"),
        )
    )
