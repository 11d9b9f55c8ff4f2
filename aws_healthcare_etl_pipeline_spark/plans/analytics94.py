"""Wave-120 (round 5): Fellegi-Sunter record linkage + Markov
stationary distribution.

* ``linkage_fellegi_sunter_scores`` — probabilistic record linkage,
  the 1969 framework still under every MDM/entity-resolution
  system: candidate pairs from capped blocks, per-field agreement
  odds m/u (frozen permille parameters, as trained FS weights are
  in production), and the match score as an exact rational product
  of field odds — no logs anywhere: the classic sum-of-log-weights
  becomes a product of integer numerators over denominators,
  thresholded by cross-multiplication and reported in exact ppm.
* ``events_markov_stationary_power`` — the long-run state
  occupancy of the event-type Markov chain: transition
  probabilities are exact milli-counts from consecutive-event
  pairs, then 16 power-iteration steps run in ppm integers with a
  materialization barrier per step (the 2^k alias-chain lesson)
  and per-term truncating division identical in both engines; the
  empirical state distribution rides along — the two must agree
  closely, which the result makes visible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------- Fellegi-Sunter

_BLOCK_CAP = 64  # max records per block: bounds pair fan-out
# frozen (m, u) permille per SCORING field — FS practice: blocking
# fields (length octet, first token) are excluded from scoring
_FS = {
    "lang": (950, 400),
    "tokl": (900, 150),
    "nt4": (850, 200),
}
_THRESHOLD_ODDS = 2  # review band: pairs with odds product >= 2:1


@query(
    "linkage_fellegi_sunter_scores",
    oracle=f"""
        WITH recs AS (
            SELECT doc_id, source, lang,
                   regexp_split_to_array(trim(lower(text)), '\\s+')
                       AS toks,
                   CAST(n_chars // 8 AS VARCHAR) || ':' ||
                       list_extract(
                           regexp_split_to_array(trim(lower(text)),
                                                 '\\s+'), 1) AS blk
            FROM documents
        ), fields AS (
            SELECT doc_id, source, lang, blk,
                   toks[-1] AS tokl,
                   CAST(len(toks) // 4 AS BIGINT) AS nt4
            FROM recs
        ), blocks AS (
            SELECT blk FROM fields GROUP BY blk
            HAVING COUNT(*) <= {_BLOCK_CAP}
        ), kept AS (
            SELECT f.* FROM fields f JOIN blocks b ON b.blk = f.blk
        ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   (CASE WHEN a.lang = b.lang THEN {_FS["lang"][0]}
                         ELSE {1000 - _FS["lang"][0]} END)
                   * (CASE WHEN a.tokl = b.tokl THEN {_FS["tokl"][0]}
                           ELSE {1000 - _FS["tokl"][0]} END)
                   * (CASE WHEN a.nt4 = b.nt4 THEN {_FS["nt4"][0]}
                           ELSE {1000 - _FS["nt4"][0]} END) AS num,
                   (CASE WHEN a.lang = b.lang THEN {_FS["lang"][1]}
                         ELSE {1000 - _FS["lang"][1]} END)
                   * (CASE WHEN a.tokl = b.tokl THEN {_FS["tokl"][1]}
                           ELSE {1000 - _FS["tokl"][1]} END)
                   * (CASE WHEN a.nt4 = b.nt4 THEN {_FS["nt4"][1]}
                           ELSE {1000 - _FS["nt4"][1]} END) AS den,
                   CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END
                       AS lang_agree,
                   CASE WHEN a.tokl = b.tokl THEN 1 ELSE 0 END
                       AS tokl_agree,
                   CASE WHEN a.nt4 = b.nt4 THEN 1 ELSE 0 END
                       AS nt4_agree
            FROM kept a JOIN kept b
              ON a.blk = b.blk AND a.source < b.source
        )
        SELECT id_a, id_b, lang_agree, tokl_agree, nt4_agree,
               CAST(CAST(num AS BIGINT) * 1000000 // den AS BIGINT)
                   AS odds_ppm
        FROM pairs
        WHERE CAST(num AS BIGINT) >= {_THRESHOLD_ODDS} * CAST(den AS BIGINT)
        ORDER BY id_a, id_b
    """,
    description="Fellegi-Sunter probabilistic record linkage across "
    "document sources: candidate pairs from (length-octet, first-"
    "token) blocks CAPPED at 64 records (oversized blocks excluded "
    "by contract in both engines — bounded fan-out, linear "
    "candidate volume), scored on the NON-blocking fields with "
    "frozen m/u permille parameters (lang 950/400, last-token "
    "900/150, token-count-bucket 850/200 — production FS weights "
    "are trained offline and frozen exactly like this). The "
    "textbook sum of log-odds becomes an exact rational PRODUCT — "
    "no libm — with the 2:1 review-band threshold (FS emits both a "
    "match and a clerical-review band; partial agreements land here) "
    "a single integer "
    "cross-multiplication and odds reported in exact ppm. "
    "100 TB shape: one narrow field projection, one block-size "
    "aggregate, one capped equi-join — the same blocking "
    "discipline as the containment and symmetric-delete lanes.",
)
def linkage_fellegi_sunter_scores(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    fields = docs.select(
        "doc_id",
        "source",
        "lang",
        F.concat(
            F.expr("n_chars div 8").cast("string"),
            F.lit(":"),
            F.element_at(toks, 1),
        ).alias("blk"),
        F.element_at(toks, -1).alias("tokl"),
        F.expr("CAST(size(split(trim(lower(text)), '\\\\s+')) div 4"
               " AS LONG)").alias("nt4"),
    ).localCheckpoint(eager=False)  # feeds sizing + sides
    blocks = (
        fields.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("bn"))
        .where(F.col("bn") <= _BLOCK_CAP)
        .select("blk")
    )
    kept = fields.join(F.broadcast(blocks), "blk")
    a = kept.select(
        "blk",
        F.col("doc_id").alias("id_a"),
        F.col("source").alias("src_a"),
        F.col("lang").alias("lang_a"),
        F.col("tokl").alias("tokl_a"),
        F.col("nt4").alias("nt4_a"),
    )
    b = kept.select(
        "blk",
        F.col("doc_id").alias("id_b"),
        F.col("source").alias("src_b"),
        F.col("lang").alias("lang_b"),
        F.col("tokl").alias("tokl_b"),
        F.col("nt4").alias("nt4_b"),
    )
    joined = a.join(b, "blk").where(F.col("src_a") < F.col("src_b"))
    num_terms, den_terms, flags = [], [], []
    for field, (m, u) in _FS.items():
        agree = F.col(f"{field}_a") == F.col(f"{field}_b")
        num_terms.append(F.when(agree, m).otherwise(1000 - m))
        den_terms.append(F.when(agree, u).otherwise(1000 - u))
        flags.append(F.when(agree, 1).otherwise(0).alias(f"{field}_agree"))
    num = (num_terms[0] * num_terms[1] * num_terms[2]).cast("long")
    den = (den_terms[0] * den_terms[1] * den_terms[2]).cast("long")
    return (
        joined.select("id_a", "id_b", *flags, num.alias("num"),
                      den.alias("den"))
        .where(F.col("num") >= _THRESHOLD_ODDS * F.col("den"))
        .select(
            "id_a",
            "id_b",
            F.col("lang_agree"),
            F.col("tokl_agree"),
            F.col("nt4_agree"),
            F.expr("CAST(num * 1000000 div den AS LONG)").alias(
                "odds_ppm"
            ),
        )
        .orderBy("id_a", "id_b")
    )


# ----------------------------------- Markov stationary (power)

_POWER_STEPS = 16


def _markov_oracle() -> str:
    steps = []
    prev = "v0"
    for s in range(1, _POWER_STEPS + 1):
        steps.append(
            f"v{s} AS MATERIALIZED ("
            f"SELECT p.j AS state,"
            f" CAST(SUM((v.v_ppm * p.p_milli) // 1000) AS BIGINT) AS v_ppm"
            f" FROM {prev} v JOIN p ON p.i = v.state GROUP BY p.j)"
        )
        prev = f"v{s}"
    return f"""
        WITH ev AS MATERIALIZED (
            SELECT user_id, event_type AS et,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        ), trans AS (
            SELECT a.et AS i, b.et AS j, CAST(COUNT(*) AS BIGINT) AS c
            FROM ev a JOIN ev b
              ON b.user_id = a.user_id AND b.rn = a.rn + 1
            GROUP BY 1, 2
        ), p AS MATERIALIZED (
            SELECT i, j,
                   CAST(c * 1000 // SUM(c) OVER (PARTITION BY i)
                        AS BIGINT) AS p_milli
            FROM trans
        ), states AS MATERIALIZED (
            SELECT i AS state FROM p GROUP BY i
        ), k AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states
        ), v0 AS MATERIALIZED (
            SELECT state, CAST(1000000 // k.k AS BIGINT) AS v_ppm
            FROM states CROSS JOIN k
        ), {", ".join(steps)}, emp AS (
            SELECT et AS state,
                   CAST(COUNT(*) * 1000000
                        // (SELECT COUNT(*) FROM ev) AS BIGINT)
                       AS empirical_ppm
            FROM ev GROUP BY et
        )
        SELECT v.state, v.v_ppm AS stationary_ppm, e.empirical_ppm
        FROM v{_POWER_STEPS} v JOIN emp e ON e.state = v.state
        ORDER BY v.state
    """


@query(
    "events_markov_stationary_power",
    oracle=_markov_oracle(),
    description="Long-run state occupancy of the event-type Markov "
    "chain by 16 power-iteration steps in exact ppm integers: the "
    "transition matrix is milli-quantized from consecutive-event "
    "counts (per-user (ts, event_id) order), each step is "
    "v'_j = sum_i (v_i * P_ij) div 1000 with TERM-level truncating "
    "division identical in both engines, and every step sits behind "
    "a materialization barrier (the measured 2^k alias-chain "
    "lesson — each state feeds every next state, fan-out k). The "
    "empirical state distribution rides along: power iteration on "
    "the MLE chain must land near it, and the result shows exactly "
    "how near, plus the deterministic truncation-mass decay. 100 TB "
    "shape: the fact-scale work is one user-partitioned lag join "
    "and two aggregates; the iteration runs on a k<=5-state matrix, "
    "16 tiny barrier-separated jobs regardless of volume.",
)
def events_markov_stationary_power(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = events.select(
        "user_id",
        F.col("event_type").alias("et"),
        "ts",
        "event_id",
    ).withColumn("nxt", F.lead("et").over(w))
    trans = (
        ev.where(F.col("nxt").isNotNull())
        .groupBy(F.col("et").alias("i"), F.col("nxt").alias("j"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wi = Window.partitionBy("i")
    p = trans.select(
        "i",
        "j",
        F.expr("c * 1000").cast("long").alias("c1000"),
        F.sum("c").over(wi).cast("long").alias("ci"),
    ).select(
        "i",
        "j",
        F.expr("CAST(c1000 div ci AS LONG)").alias("p_milli"),
    )
    # r12: the 16 power steps as ONE in-row integer fold over the
    # bounded k-state matrix (the DTW-fold lesson). The r11 form ran
    # an eager localCheckpoint per step — 16 barrier jobs (~63 Spark
    # jobs with AQE stage materializations) for a k<=5-state vector,
    # pure driver round-trip cost. Here the k^2 matrix collapses to a
    # single row (map keyed by src_idx*k+dst_idx; a key is PRESENT
    # iff the transition exists — p_milli may legitimately be 0) and
    # the identical recurrence v'_j = sum_i (v_i * P_ij) div 1000
    # runs as a constant-size JVM fold: zero checkpoints, one action.
    # A parallel boolean array replays the join's row-EXISTENCE
    # semantics (a state drops out of v when no present predecessor
    # has a transition into it, even though its folded value is 0 —
    # values alone cannot distinguish the two because p_milli=0 edges
    # exist). Truncating division is reproduced exactly in integers:
    # (prod - prod % 1000) / 1000 divides an exact multiple, so the
    # double division is exact for all magnitudes here (< 2^53).
    cells = p.groupBy().agg(
        F.collect_list(F.struct("i", "j", "p_milli")).alias("cells")
    )
    row = cells.select(
        "cells",
        F.array_sort(
            F.array_distinct(
                F.concat(
                    F.transform("cells", lambda c: c["i"]),
                    F.transform("cells", lambda c: c["j"]),
                )
            )
        ).alias("states"),
        F.array_sort(
            F.array_distinct(F.transform("cells", lambda c: c["i"]))
        ).alias("srcs"),
    ).where(
        # degenerate chain (no transition at all): the pre-fold form
        # produced zero output rows; drop the single all-empty row
        # BEFORE the fold — sequence(0, k-1) at k=0 yields [0, -1]
        # and the fold would index an empty array
        F.size("states") > 0
    )
    k = F.size("states")
    row = row.select(
        "states",
        "srcs",
        F.map_from_entries(
            F.transform(
                "cells",
                lambda c: F.struct(
                    (
                        (F.array_position(F.col("states"), c["i"]) - 1) * k
                        + (F.array_position(F.col("states"), c["j"]) - 1)
                    )
                    .cast("long")
                    .alias("key"),
                    c["p_milli"].alias("value"),
                ),
            )
        ).alias("pmap"),
    )
    k = F.size("states")
    k0 = F.size("srcs")
    idxs = F.sequence(F.lit(0), k - F.lit(1))

    def _div(prod, d: int):
        # exact integer `prod div d` for nonnegative longs: subtract
        # the remainder, then the double division is exact
        return ((prod - prod % d) / d).cast("long")

    # v0: uniform 1000000 div k0 over source states, 0 elsewhere
    v0 = F.transform(
        F.col("states"),
        lambda s: F.when(
            F.array_contains(F.col("srcs"), s),
            (
                (
                    F.lit(1000000).cast("long")
                    - F.lit(1000000).cast("long") % k0.cast("long")
                )
                / k0.cast("long")
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long")),
    )
    pr0 = F.transform(
        F.col("states"), lambda s: F.array_contains(F.col("srcs"), s)
    )

    def _pcell(ix, jx):
        return F.element_at(F.col("pmap"), (ix * k + jx).cast("long"))

    fold = F.aggregate(
        F.sequence(F.lit(1), F.lit(_POWER_STEPS)),
        F.struct(v0.alias("v"), pr0.alias("pr")),
        lambda acc, _: F.struct(
            F.transform(
                idxs,
                lambda jx: F.aggregate(
                    idxs,
                    F.lit(0).cast("long"),
                    lambda s, ix: s
                    + _div(
                        F.element_at(acc["v"], ix + F.lit(1))
                        * F.coalesce(
                            _pcell(ix, jx), F.lit(0).cast("long")
                        ),
                        1000,
                    ),
                ),
            ).alias("v"),
            F.transform(
                idxs,
                lambda jx: F.aggregate(
                    idxs,
                    F.lit(False),
                    lambda b, ix: b
                    | (
                        F.element_at(acc["pr"], ix + F.lit(1))
                        & _pcell(ix, jx).isNotNull()
                    ),
                ),
            ).alias("pr"),
        ),
    )
    stationary = (
        row.select(
            F.explode(
                F.arrays_zip(
                    F.col("states"), fold["v"].alias("v"), fold["pr"].alias("pr")
                )
            ).alias("z")
        )
        .where(F.col("z.pr"))
        .select(
            F.col("z.states").alias("state"),
            F.col("z.v").alias("v_ppm"),
        )
    )
    # empirical distribution in the same scan family: the unpartitioned
    # window runs over the k-row grouped frame, replacing the previous
    # second events scan for the total count
    emp = (
        ev.groupBy(F.col("et").alias("state"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "state",
            "cnt",
            F.sum("cnt").over(Window.partitionBy()).cast("long").alias("n"),
        )
        .select(
            "state",
            F.expr("CAST(cnt * 1000000 div n AS LONG)").alias(
                "empirical_ppm"
            ),
        )
    )
    return (
        stationary.join(emp, "state")
        .select("state", F.col("v_ppm").alias("stationary_ppm"), "empirical_ppm")
        .orderBy("state")
    )
