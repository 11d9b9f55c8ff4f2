"""Wave-145 (round 5): Markov removal-effect attribution + learned index.

* ``attribution_markov_removal`` — the fourth and hardest member of
  the attribution lane (linear / position-based / exact-Shapley
  already exist): first-order Markov attribution by REMOVAL EFFECT.
  Sessions (30-minute gap rule) become journeys over the four
  non-purchase event types; a transition-count matrix over states
  {START, channels..., CONV, NULL} is reduced in one data-scale
  pass; the absorption probability P(reach CONV from START) is then
  iterated for 12 steps with every per-step ratio quantized to
  integer MICROS by truncating division (the cross-engine idiom) —
  and all five chain variants (base + each channel forced to 0,
  i.e. removed) ride ONE vector table of 35 rows, so the unrolled
  iteration costs 12 bounded joins, not 60.  Removal monotonicity
  (P_removed <= P_base) survives quantization because truncating
  division is monotone, so effects are provably non-negative.
  Oracle: the same 12 steps as generated chained CTEs over
  MATERIALIZED base tables (the Huffman/MMR unrolled precedent).
* ``layout_learned_index_epsilon`` — the error bound a learned index
  (RMI / PGM style) would need on o_orderkey: 64 fixed-width key
  segments, linear interpolation between each segment's endpoint
  (key, position) pairs, and the per-segment max |pos - pos_hat| —
  exactly the epsilon that bounds a learned index's binary-search
  window.  The oracle computes positions with a textbook global
  ROW_NUMBER; the Spark side never sorts globally — per-segment
  ranks plus an exclusive prefix sum of segment counts over the
  bounded 64-row spine reconstruct the same positions (the
  running-total decomposition), and the hash match proves it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------- Markov removal attribution

_MR_GAP_S = 1800
_MR_STEPS = 12
_MR_CONV = "purchase"


def _mr_oracle() -> str:
    steps = []
    for k in range(1, _MR_STEPS + 1):
        steps.append(
            f"""v{k} AS (
            SELECT st.var, st.state, st.kind, st.n_s,
                   CASE st.kind
                     WHEN 'conv' THEN 1000000
                     WHEN 'trans' THEN
                          COALESCE(SUM(tr.n * pv.v), 0) // st.n_s
                     ELSE 0 END AS v
            FROM st
            LEFT JOIN tr ON tr.s = st.state AND st.kind = 'trans'
            LEFT JOIN v{k - 1} pv
              ON pv.var = st.var AND pv.state = tr.t
            GROUP BY st.var, st.state, st.kind, st.n_s
        )"""
        )
    chain = ", ".join(steps)
    return f"""
        WITH ev AS MATERIALIZED (
            SELECT user_id, event_type, event_id,
                   epoch_us(ts) // 1000000 AS t
            FROM events
        ), marked AS (
            SELECT user_id, event_type, event_id, t,
                   CASE WHEN t - lag(t) OVER (PARTITION BY user_id
                                              ORDER BY t, event_id)
                             > {_MR_GAP_S}
                             OR lag(t) OVER (PARTITION BY user_id
                                             ORDER BY t, event_id)
                                IS NULL
                        THEN 1 ELSE 0 END AS new_s
            FROM ev
        ), sess AS MATERIALIZED (
            SELECT user_id, event_type, event_id, t,
                   SUM(new_s) OVER (PARTITION BY user_id
                       ORDER BY t, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS sid
            FROM marked
        ), sinfo AS MATERIALIZED (
            SELECT user_id, sid,
                   SUM(CASE WHEN event_type != '{_MR_CONV}'
                       THEN 1 ELSE 0 END) AS n_np,
                   MAX(CASE WHEN event_type = '{_MR_CONV}'
                       THEN 1 ELSE 0 END) AS conv
            FROM sess GROUP BY user_id, sid
        ), np AS MATERIALIZED (
            SELECT user_id, sid, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id, sid
                       ORDER BY t, event_id) AS rn,
                   LEAD(event_type) OVER (PARTITION BY user_id, sid
                       ORDER BY t, event_id) AS nxt
            FROM sess WHERE event_type != '{_MR_CONV}'
        ), trans_raw AS (
            SELECT event_type AS s, nxt AS t
            FROM np WHERE nxt IS NOT NULL
            UNION ALL
            SELECT n.event_type AS s,
                   CASE WHEN si.conv = 1 THEN 'CONV' ELSE 'NULL' END
            FROM np n JOIN sinfo si
              ON si.user_id = n.user_id AND si.sid = n.sid
            WHERE n.nxt IS NULL
            UNION ALL
            SELECT 'START' AS s, n.event_type AS t
            FROM np n WHERE n.rn = 1
            UNION ALL
            SELECT 'START' AS s,
                   CASE WHEN conv = 1 THEN 'CONV' ELSE 'NULL' END
            FROM sinfo WHERE n_np = 0
        ), tr AS MATERIALIZED (
            SELECT s, t, CAST(COUNT(*) AS BIGINT) AS n
            FROM trans_raw GROUP BY s, t
        ), ns AS MATERIALIZED (
            SELECT s, CAST(SUM(n) AS BIGINT) AS n_s FROM tr GROUP BY s
        ), channels AS MATERIALIZED (
            SELECT DISTINCT s AS ch FROM tr WHERE s != 'START'
        ), states AS (
            SELECT DISTINCT x AS state FROM (
                SELECT s AS x FROM tr
                UNION ALL SELECT t FROM tr
            )
        ), variants AS (
            SELECT '__base__' AS var
            UNION ALL SELECT ch FROM channels
        ), st AS MATERIALIZED (
            SELECT va.var, s.state,
                   CASE WHEN s.state = 'CONV' THEN 'conv'
                        WHEN s.state = 'NULL' THEN 'null'
                        WHEN s.state = va.var THEN 'removed'
                        ELSE 'trans' END AS kind,
                   ns.n_s
            FROM variants va
            CROSS JOIN states s
            LEFT JOIN ns ON ns.s = s.state
        ), v0 AS (
            SELECT var, state, kind, n_s,
                   CASE WHEN kind = 'conv' THEN 1000000
                        ELSE 0 END AS v
            FROM st
        ), {chain}, base AS (
            SELECT v AS pb FROM v{_MR_STEPS}
            WHERE var = '__base__' AND state = 'START'
        ), eff AS (
            SELECT r.var AS channel, b.pb, r.v AS pr,
                   b.pb - r.v AS re
            FROM v{_MR_STEPS} r, base b
            WHERE r.var != '__base__' AND r.state = 'START'
        ), tot AS (
            SELECT SUM(re) AS te FROM eff
        )
        SELECT channel,
               CAST(pb AS BIGINT) AS p_base_micro,
               CAST(pr AS BIGINT) AS p_removed_micro,
               CAST(re AS BIGINT) AS removal_effect_micro,
               CAST(CASE WHEN te > 0 THEN re * 1000 // te
                    ELSE 0 END AS BIGINT) AS share_permille
        FROM eff, tot
        ORDER BY channel
    """


@query(
    "attribution_markov_removal",
    oracle=_mr_oracle(),
    description="First-order Markov attribution by removal effect — "
    "the fourth attribution lane member after linear, position-based "
    "and exact-Shapley: sessions (30-minute gap rule) become "
    "journeys over the four non-purchase channels, the transition-"
    "count matrix over {START, channels, CONV, NULL} is reduced in "
    "ONE data-scale pass, and the absorption probability P(CONV "
    "from START) is iterated 12 steps with each ratio quantized to "
    "integer micros by truncating division; all five chain variants "
    "(base + each channel forced to zero = removed) ride one 35-row "
    "vector table so the whole unrolled iteration is 12 bounded "
    "broadcast joins. Truncating division is monotone, so removal "
    "effects are provably non-negative even after quantization. "
    "100 TB shape: sessionization and transition counting are the "
    "only data-scale shuffles (per-user windows + one groupBy); the "
    "iteration runs on a fixed 35-row table regardless of data "
    "volume.",
)
def attribution_markov_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        "event_type",
        "event_id",
        (F.unix_micros("ts") / 1000000).cast("long").alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    marked = ev.withColumn(
        "new_s",
        F.when(
            (F.col("t") - F.lag("t").over(w) > _MR_GAP_S)
            | F.lag("t").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    wi = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = marked.withColumn("sid", F.sum("new_s").over(wi))
    sinfo = sess.groupBy("user_id", "sid").agg(
        F.sum(
            F.when(F.col("event_type") != _MR_CONV, 1).otherwise(0)
        ).alias("n_np"),
        F.max(
            F.when(F.col("event_type") == _MR_CONV, 1).otherwise(0)
        ).alias("conv"),
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("t", "event_id")
    np_df = sess.where(F.col("event_type") != _MR_CONV).select(
        "user_id",
        "sid",
        "event_type",
        F.row_number().over(ws).alias("rn"),
        F.lead("event_type").over(ws).alias("nxt"),
    )
    mid = np_df.where(F.col("nxt").isNotNull()).select(
        F.col("event_type").alias("s"), F.col("nxt").alias("t")
    )
    last = (
        np_df.where(F.col("nxt").isNull())
        .join(sinfo, ["user_id", "sid"])
        .select(
            F.col("event_type").alias("s"),
            F.when(F.col("conv") == 1, "CONV")
            .otherwise("NULL")
            .alias("t"),
        )
    )
    first = np_df.where(F.col("rn") == 1).select(
        F.lit("START").alias("s"), F.col("event_type").alias("t")
    )
    empty = sinfo.where(F.col("n_np") == 0).select(
        F.lit("START").alias("s"),
        F.when(F.col("conv") == 1, "CONV").otherwise("NULL").alias("t"),
    )
    tr = (
        mid.unionByName(last)
        .unionByName(first)
        .unionByName(empty)
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )  # <= ~25-row transition matrix, collected exactly once below
    # Dimension-bounded model: the transition matrix is <= ~25 rows
    # (event types x {START, CONV, NULL}), so the 12-step x (channels+1)
    # value iteration runs DRIVER-SIDE under the bounded-collect
    # contract (the Elo / TextRank precedent) instead of as ~24 tiny
    # shuffle stages — the fact-scale sessionization above stays fully
    # distributed, and the integer arithmetic (truncation division per
    # step) is bit-identical to the oracle's recursive replay.
    tr_rows = [(r["s"], r["t"], int(r["n"])) for r in tr.collect()]
    n_s: dict[str, int] = {}
    adj: dict[str, list[tuple[str, int]]] = {}
    for s, t, n in tr_rows:
        n_s[s] = n_s.get(s, 0) + n
        adj.setdefault(s, []).append((t, n))
    states = sorted({s for s, _, _ in tr_rows} | {t for _, t, _ in tr_rows})
    channels = sorted({s for s, _, _ in tr_rows if s != "START"})

    def p_start(removed: str | None) -> int:
        v = {st: (1_000_000 if st == "CONV" else 0) for st in states}
        for _ in range(_MR_STEPS):
            nv = {}
            for st in states:
                if st == "CONV":
                    nv[st] = 1_000_000
                elif st == "NULL" or st == removed:
                    nv[st] = 0
                else:
                    acc = sum(n * v[t] for t, n in adj.get(st, []))
                    nv[st] = acc // n_s[st] if st in n_s else 0
            v = nv
        return v.get("START", 0)

    def trunc_div(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    pb = p_start(None)
    effs = [(ch, pb, p_start(ch)) for ch in channels]
    te = sum(pb_ - pr for _, pb_, pr in effs)
    rows = [
        (
            ch,
            pb_,
            pr,
            pb_ - pr,
            trunc_div((pb_ - pr) * 1000, te) if te > 0 else 0,
        )
        for ch, pb_, pr in effs
    ]
    return spark.createDataFrame(
        rows,
        "channel string, p_base_micro bigint, p_removed_micro bigint,"
        " removal_effect_micro bigint, share_permille bigint",
    ).orderBy("channel")


# ------------------------------------- learned-index epsilon audit

_LI_SEGMENTS = 64


@query(
    "layout_learned_index_epsilon",
    oracle=f"""
        WITH k AS (
            SELECT o_orderkey AS key,
                   ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS pos
            FROM orders
        ), ext AS (
            SELECT MIN(key) AS kmin,
                   (MAX(key) - MIN(key)) // {_LI_SEGMENTS} + 1 AS w
            FROM k
        ), segd AS (
            SELECT (key - kmin) // w AS seg, key, pos FROM k, ext
        ), stats AS (
            SELECT seg,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   MIN(key) AS key_lo, MAX(key) AS key_hi,
                   MIN(pos) AS pos_lo, MAX(pos) AS pos_hi
            FROM segd GROUP BY seg
        ), err AS (
            SELECT d.seg, s.n_keys,
                   ABS(d.pos - (s.pos_lo
                       + (d.key - s.key_lo) * (s.pos_hi - s.pos_lo)
                         // GREATEST(1, s.key_hi - s.key_lo)))
                       AS ae
            FROM segd d JOIN stats s ON s.seg = d.seg
        )
        SELECT CAST(e.seg AS BIGINT) AS seg,
               e.n_keys,
               CAST(s.key_lo AS BIGINT) AS key_lo,
               CAST(s.key_hi AS BIGINT) AS key_hi,
               CAST(MAX(e.ae) AS BIGINT) AS max_abs_err,
               CAST(SUM(e.ae) * 1000 // e.n_keys AS BIGINT)
                   AS mean_abs_err_millis
        FROM err e JOIN stats s ON s.seg = e.seg
        GROUP BY e.seg, e.n_keys, s.key_lo, s.key_hi
        ORDER BY seg
    """,
    description="Learned-index (RMI/PGM style) error-bound audit on "
    "o_orderkey: 64 fixed-width key segments, linear interpolation "
    "between each segment's endpoint (key, position) pairs, and the "
    "per-segment max |pos - pos_hat| — exactly the epsilon that "
    "sizes a learned index's binary-search window, measured on the "
    "fixture's gappy key distribution. The oracle uses a textbook "
    "global ROW_NUMBER; the Spark side never sorts globally — "
    "per-segment ranks plus an exclusive prefix sum of segment "
    "counts over the bounded 64-row spine reconstruct identical "
    "positions (the running-total decomposition), and the hash "
    "match proves the rewrite. 100 TB shape: one shuffle on the "
    "segment key, per-segment window sorts that spill and "
    "parallelize, a 64-row spine window, broadcast joins back.",
)
def layout_learned_index_epsilon(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.select(F.col("o_orderkey").alias("key"))
    ext = keys.agg(
        F.min("key").alias("kmin"),
        F.expr(
            f"(MAX(key) - MIN(key)) div {_LI_SEGMENTS} + 1"
        ).alias("w"),
    )
    segd = keys.crossJoin(F.broadcast(ext)).select(
        F.expr("(key - kmin) div w").alias("seg"), "key"
    )
    stats0 = segd.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.min("key").alias("key_lo"),
        F.max("key").alias("key_hi"),
    )
    # exclusive prefix sum over the bounded 64-row segment spine
    spine = Window.orderBy("seg").rowsBetween(
        Window.unboundedPreceding, -1
    )
    stats = stats0.select(
        "seg",
        "n_keys",
        "key_lo",
        "key_hi",
        F.coalesce(F.sum("n_keys").over(spine), F.lit(0))
        .cast("long")
        .alias("pos_lo"),
    ).withColumn("pos_hi", F.col("pos_lo") + F.col("n_keys") - 1)
    wseg = Window.partitionBy("seg").orderBy("key")
    ranked = segd.withColumn("r", F.row_number().over(wseg) - 1)
    err = ranked.join(F.broadcast(stats), "seg").select(
        "seg",
        "n_keys",
        "key_lo",
        "key_hi",
        F.abs(
            (F.col("pos_lo") + F.col("r"))
            - (
                F.col("pos_lo")
                + F.expr(
                    "(key - key_lo) * (pos_hi - pos_lo)"
                    " div GREATEST(1, key_hi - key_lo)"
                )
            )
        ).alias("ae"),
    )
    return (
        err.groupBy("seg", "n_keys", "key_lo", "key_hi")
        .agg(
            F.max("ae").cast("long").alias("max_abs_err"),
            F.expr("SUM(ae) * 1000 div n_keys")
            .cast("long")
            .alias("mean_abs_err_millis"),
        )
        .select(
            F.col("seg").cast("long").alias("seg"),
            "n_keys",
            F.col("key_lo").cast("long"),
            F.col("key_hi").cast("long"),
            "max_abs_err",
            "mean_abs_err_millis",
        )
        .orderBy("seg")
    )
