"""Wave-211 (round 7, part 2): sequential / dynamic-programming
operators — integer Viterbi decoding, Elo rating replay with an
integer LUT, (s,S) inventory policy replay, LCS of monthly top-product
baskets via exact mask enumeration, and TextRank keyword ranking on a
bounded word graph.

Each query's Spark side uses the established scale patterns for
order-sensitive recurrences: the partition-wise keyed pandas scan for
per-key folds (Viterbi, (s,S)), the bounded-collect contract for
dimension-bounded models (Elo on <=25 nations, TextRank on a 30-word
panel), and pure declarative enumeration where the state space is tiny
(LCS over 8-element distinct sequences = 2^8 mask brute force, the
exact-permutation-test trick). All arithmetic is integer with
truncation-toward-zero division mirrored in both engines
(HUGEINT// / DECIMAL(38) div / a trunc helper in driver Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.keyscan import keyed_pandas_scan
from ..sources.tables import load_table
from .registry import dec, query

# ------------------------------------------ integer Viterbi decode

# 3 hidden states, 5 observations (event types in lexical order:
# click, error, purchase, signup, view). Additive integer log-scores.
_VIT_INIT = (0, -2, -4)
_VIT_TRANS = ((-1, -3, -5), (-4, -1, -2), (-6, -3, -1))
_VIT_EMIT = (
    (0, -5, -4, -3, -1),
    (-3, 0, -1, -6, -2),
    (-2, -4, 0, -1, -3),
)
_VIT_OBS = ("click", "error", "purchase", "signup", "view")


def _vit_obs_case(col: str) -> str:
    cases = " ".join(
        f"WHEN '{t}' THEN {i}" for i, t in enumerate(_VIT_OBS)
    )
    return f"CASE {col} {cases} ELSE 0 END"


def _vit_emit_case(state: int, obs: str) -> str:
    cases = " ".join(
        f"WHEN {i} THEN {_VIT_EMIT[state][i]}" for i in range(len(_VIT_OBS))
    )
    return f"CASE {obs} {cases} END"


def _vit_new_v(state: int, prev: tuple[str, str, str], obs: str) -> str:
    moves = ", ".join(
        f"{prev[sp]} + {_VIT_TRANS[sp][state]}" for sp in range(3)
    )
    return f"{_vit_emit_case(state, obs)} + GREATEST({moves})"


@query(
    "seq_viterbi_integer_decode",
    oracle=f"""
        WITH RECURSIVE base AS MATERIALIZED (
            SELECT user_id AS u,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                   {_vit_obs_case("event_type")} AS obs
            FROM events
        ), mx AS (SELECT MAX(rn) AS m FROM base),
        step AS (
            SELECT u, CAST({_VIT_INIT[0]} AS BIGINT) AS v0,
                   CAST({_VIT_INIT[1]} AS BIGINT) AS v1,
                   CAST({_VIT_INIT[2]} AS BIGINT) AS v2, 0 AS rn
            FROM (SELECT DISTINCT u FROM base)
            UNION ALL
            SELECT s.u,
                   CASE WHEN b.u IS NULL THEN s.v0
                        ELSE {_vit_new_v(0, ("s.v0", "s.v1", "s.v2"), "b.obs")}
                   END,
                   CASE WHEN b.u IS NULL THEN s.v1
                        ELSE {_vit_new_v(1, ("s.v0", "s.v1", "s.v2"), "b.obs")}
                   END,
                   CASE WHEN b.u IS NULL THEN s.v2
                        ELSE {_vit_new_v(2, ("s.v0", "s.v1", "s.v2"), "b.obs")}
                   END,
                   s.rn + 1
            FROM step s LEFT JOIN base b ON b.u = s.u AND b.rn = s.rn + 1
            WHERE s.rn < (SELECT m FROM mx)
        ), final AS (
            SELECT u,
                   CASE WHEN v0 >= v1 AND v0 >= v2 THEN 0
                        WHEN v1 >= v2 THEN 1 ELSE 2 END AS best_state,
                   GREATEST(v0, v1, v2) AS best_score
            FROM step WHERE rn = (SELECT m FROM mx)
        )
        SELECT CAST(best_state AS BIGINT) AS best_state,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(best_score) AS BIGINT) AS sum_score,
               CAST(MIN(best_score) AS BIGINT) AS min_score,
               CAST(MAX(best_score) AS BIGINT) AS max_score
        FROM final GROUP BY 1 ORDER BY best_state
    """,
    description="Viterbi decoding of a 3-state HMM over each user's "
    "event sequence with integer log-score matrices (additive, so the "
    "max-plus recurrence is exact in both engines; smallest-state "
    "tiebreak on the final argmax). The DP v_t(s) = emit[s][obs_t] + "
    "max_s'(v_(t-1)(s') + trans[s'][s]) is the canonical per-key "
    "sequential fold: Spark runs it through the partition-wise keyed "
    "pandas scan (one shuffle on user_id, one vectorized Python pass "
    "per partition, 3 integers of carry per user), the oracle replays "
    "every user in lockstep as a recursive CTE — the hash match proves "
    "the distributed fold equals the sequential definition. At 100 TB "
    "the scan parallelizes across the user dimension; per-user state is "
    "O(#states), never O(sequence).",
)
def seq_viterbi_integer_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    obs = events.select(
        F.col("user_id").alias("u"),
        F.col("ts"),
        F.col("event_id"),
        F.expr(_vit_obs_case("event_type")).cast("int").alias("obs"),
    )
    init, trans, emit = _VIT_INIT, _VIT_TRANS, _VIT_EMIT

    def per_group(g):
        import pandas as pd

        v = list(init)
        for o in g["obs"]:
            o = int(o)
            v = [
                emit[s][o] + max(v[sp] + trans[sp][s] for sp in range(3))
                for s in range(3)
            ]
        return pd.DataFrame(
            {
                "u": [g["u"].iloc[0]],
                "v0": [v[0]],
                "v1": [v[1]],
                "v2": [v[2]],
            }
        )

    final = keyed_pandas_scan(
        obs,
        key="u",
        order=["ts", "event_id"],
        per_group=per_group,
        out_schema="u long, v0 long, v1 long, v2 long",
    )
    scored = final.select(
        F.when(
            (F.col("v0") >= F.col("v1")) & (F.col("v0") >= F.col("v2")), 0
        )
        .when(F.col("v1") >= F.col("v2"), 1)
        .otherwise(2)
        .cast("long")
        .alias("best_state"),
        F.greatest("v0", "v1", "v2").alias("best_score"),
    )
    return (
        scored.groupBy("best_state")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("best_score").cast("long").alias("sum_score"),
            F.min("best_score").cast("long").alias("min_score"),
            F.max("best_score").cast("long").alias("max_score"),
        )
        .orderBy("best_state")
    )


# ---------------------------------------------- (s,S) policy replay

_SS_PARTS = 1500
_SS_SMALL = 50
_SS_BIG = 200


@query(
    "inventory_ss_policy_replay",
    oracle=f"""
        WITH RECURSIVE base AS MATERIALIZED (
            SELECT pk, ROW_NUMBER() OVER (
                       PARTITION BY pk ORDER BY day) AS rn, d
            FROM (
                SELECT l_partkey AS pk, l_shipdate AS day,
                       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
                FROM lineitem WHERE l_partkey < {_SS_PARTS}
                GROUP BY 1, 2
            )
        ), mx AS (SELECT MAX(rn) AS m FROM base),
        step AS (
            SELECT pk, CAST({_SS_BIG} AS BIGINT) AS inv,
                   CAST(0 AS BIGINT) AS n_orders,
                   CAST(0 AS BIGINT) AS lost, 0 AS rn
            FROM (SELECT DISTINCT pk FROM base)
            UNION ALL
            SELECT s.pk,
                   CASE WHEN b.pk IS NULL THEN s.inv
                        WHEN GREATEST(s.inv - b.d, 0) < {_SS_SMALL}
                             THEN {_SS_BIG}
                        ELSE s.inv - b.d END,
                   s.n_orders + CASE WHEN b.pk IS NOT NULL
                                     AND GREATEST(s.inv - b.d, 0)
                                         < {_SS_SMALL}
                                THEN 1 ELSE 0 END,
                   s.lost + CASE WHEN b.pk IS NULL THEN 0
                                 ELSE GREATEST(b.d - s.inv, 0) END,
                   s.rn + 1
            FROM step s LEFT JOIN base b ON b.pk = s.pk AND b.rn = s.rn + 1
            WHERE s.rn < (SELECT m FROM mx)
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(n_orders) AS BIGINT) AS total_orders,
               CAST(SUM(lost) AS BIGINT) AS total_lost_qty,
               CAST(SUM(inv) AS BIGINT) AS sum_final_inv
        FROM step WHERE rn = (SELECT m FROM mx)
    """,
    description="(s,S) reorder-policy replay per SKU: daily demand "
    "(aggregated lineitem quantities) draws down inventory, unmet "
    "demand is lost (counted), and whenever the post-demand level "
    "falls below s=50 the position resets to S=200 with an order "
    "counted — the order-UP-TO recurrence that distinguishes (s,S) "
    "from the repo's capped-balance lane (whose cap clamps rather than "
    "reorders). Order-sensitive per SKU, so Spark folds it with the "
    "keyed pandas scan (one shuffle on partkey, 3 integers of carry); "
    "the oracle replays all SKUs in lockstep via a recursive CTE and "
    "the hash match proves equivalence. Per-SKU histories are bounded "
    "by the date domain, so at 100 TB the replay parallelizes across "
    "the SKU dimension with constant per-group memory.",
)
def inventory_ss_policy_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    daily = (
        line.filter(F.col("l_partkey") < _SS_PARTS)
        .groupBy(
            F.col("l_partkey").alias("pk"), F.col("l_shipdate").alias("day")
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("d"))
    )
    small, big = _SS_SMALL, _SS_BIG

    def per_group(g):
        import pandas as pd

        inv, orders, lost = big, 0, 0
        for d in g["d"]:
            d = int(d)
            lost += max(d - inv, 0)
            inv = max(inv - d, 0)
            if inv < small:
                orders += 1
                inv = big
        return pd.DataFrame(
            {
                "pk": [g["pk"].iloc[0]],
                "inv": [inv],
                "n_orders": [orders],
                "lost": [lost],
            }
        )

    final = keyed_pandas_scan(
        daily,
        key="pk",
        order=["day"],
        per_group=per_group,
        out_schema="pk long, inv long, n_orders long, lost long",
    )
    return final.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("n_orders").cast("long").alias("total_orders"),
        F.sum("lost").cast("long").alias("total_lost_qty"),
        F.sum("inv").cast("long").alias("sum_final_inv"),
    )


# --------------------------- LCS of monthly top-product baskets

_LCS_K = 8  # basket size; 2^8 masks enumerate every subsequence


@query(
    "seq_lcs_monthly_baskets",
    oracle=f"""
        WITH ranked AS (
            SELECT nation, ym, pk,
                   ROW_NUMBER() OVER (PARTITION BY nation, ym
                                      ORDER BY rev DESC, pk) AS rk,
                   COUNT(*) OVER (PARTITION BY nation, ym) AS n_parts
            FROM (
                SELECT c.c_nationkey AS nation,
                       year(CAST(o.o_orderdate AS DATE)) * 100
                           + month(CAST(o.o_orderdate AS DATE)) AS ym,
                       l.l_partkey AS pk,
                       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2))
                                * 100) AS BIGINT) AS rev
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                GROUP BY 1, 2, 3
            )
        ), baskets AS (
            SELECT nation, ym, list(pk ORDER BY rk) AS basket
            FROM ranked WHERE rk <= {_LCS_K}
            GROUP BY nation, ym HAVING COUNT(*) = {_LCS_K}
        ), pairs AS (
            SELECT nation, ym,
                   LAG(basket) OVER (PARTITION BY nation ORDER BY ym)
                       AS a,
                   basket AS b
            FROM baskets
        ), pos AS (
            SELECT nation, ym,
                   list_transform(a, x -> nullif(list_position(b, x), 0) - 1) AS p
            FROM pairs WHERE a IS NOT NULL
        ), withnm AS (
            -- bitmask of NON-NULL positions: only submasks of nm can be
            -- valid, which kills nearly all of the 256 masks before any
            -- per-mask list work (typically 0-2 matches -> 1-4 masks)
            SELECT nation, ym, p,
                   CAST(list_sum(list_transform(range(0, {_LCS_K}),
                       i -> CASE WHEN p[i + 1] IS NULL THEN 0
                            ELSE 1 << i END)) AS BIGINT) AS nm
            FROM pos
        ), masks AS (
            SELECT m, list_filter(range(0, {_LCS_K}),
                                  i -> ((m >> i) & 1) = 1) AS bits
            FROM (SELECT UNNEST(range(256)) AS m)
        ), cand AS (
            SELECT nation, ym, m,
                   list_transform(bits, i -> p[i + 1]) AS sel
            FROM withnm CROSS JOIN masks
            WHERE (m & (255 - nm)) = 0
        ), scored0 AS (
            SELECT nation, ym,
                   MAX(CASE WHEN sel = list_sort(sel)
                                 AND len(list_distinct(sel)) = len(sel)
                            THEN bit_count(CAST(m AS BIGINT))
                            ELSE 0 END) AS lcs
            FROM cand GROUP BY nation, ym
        ), scored AS (
            -- the m=0 mask always survives the prefilter, so every pair
            -- still has a row; COALESCE guards the impossible empty case
            SELECT nation, ym, COALESCE(lcs, 0) AS lcs FROM scored0
        )
        SELECT CAST(nation AS BIGINT) AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(lcs) AS BIGINT) AS sum_lcs,
               CAST(MAX(lcs) AS BIGINT) AS max_lcs
        FROM scored GROUP BY nation ORDER BY nation
    """,
    description="Longest-common-subsequence between consecutive months' "
    "top-8 product baskets per nation — the assortment-stability metric "
    "behind 'how much did the ranking actually reshuffle' (order "
    "matters: LCS of (a,b,c) vs (c,b,a) is 1, set overlap is 3). "
    "Because basket elements are DISTINCT, LCS reduces to the longest "
    "increasing run of A's positions inside B, and with k=8 the whole "
    "DP collapses to EXACT enumeration of all 2^8 subsequence masks "
    "(filter bits, check sorted+distinct, max popcount) — the exact-"
    "permutation-test trick, fully declarative in both engines: no "
    "recursion, no Python, just a 256-way explode per month pair. "
    "Fact-scale work is one revenue aggregation; the mask enumeration "
    "runs on nation x month rows only, so it is constant per pair at "
    "any data scale.",
)
def seq_lcs_monthly_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rev = (
        line.join(orders, orders.o_orderkey == line.l_orderkey)
        .join(F.broadcast(customer), customer.c_custkey == orders.o_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            (
                F.year(F.col("o_orderdate").cast("date")) * 100
                + F.month(F.col("o_orderdate").cast("date"))
            ).alias("ym"),
            F.col("l_partkey").alias("pk"),
        )
        .agg(F.sum(dec("l_extendedprice") * 100).cast("long").alias("rev"))
    )
    wr = Window.partitionBy("nation", "ym").orderBy(F.desc("rev"), "pk")
    ranked = rev.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= _LCS_K
    )
    baskets = (
        ranked.groupBy("nation", "ym")
        .agg(
            F.expr("sort_array(collect_list(struct(rk, pk)))").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") == _LCS_K)
        .select(
            "nation",
            "ym",
            F.expr("transform(s, x -> x.pk)").alias("basket"),
        )
    )
    wl = Window.partitionBy("nation").orderBy("ym")
    pairs = baskets.select(
        "nation",
        "ym",
        F.lag("basket").over(wl).alias("a"),
        F.col("basket").alias("b"),
    ).filter(F.col("a").isNotNull())
    pos = pairs.select(
        "nation",
        "ym",
        F.expr(
            "transform(a, x -> CAST(nullif(array_position(b, x), 0) - 1 "
            "AS BIGINT))"
        ).alias("p"),
    )
    withnm = pos.select(
        "nation",
        "ym",
        "p",
        # bitmask of NON-NULL positions — only submasks of nm can be
        # valid, so the integer prefilter below drops nearly all of the
        # 256 masks before any per-mask array transform/sort runs
        F.expr(
            f"CAST(aggregate(sequence(0, {_LCS_K - 1}), 0L, (acc, i) -> "
            "acc + CASE WHEN element_at(p, CAST(i + 1 AS INT)) IS NULL "
            "THEN 0L ELSE shiftleft(1L, CAST(i AS INT)) END) AS BIGINT)"
        ).alias("nm"),
    )
    masked = (
        withnm.select(
            "nation",
            "ym",
            "p",
            "nm",
            F.explode(F.expr("sequence(0, 255)")).alias("m"),
        )
        .filter(F.expr("(m & (255 - nm)) = 0"))
        .select(
            "nation",
            "ym",
            "m",
            F.expr(
                f"transform(filter(sequence(0, {_LCS_K - 1}), "
                "i -> (shiftright(CAST(m AS BIGINT), CAST(i AS INT)) & 1) = 1), "
                "i -> element_at(p, CAST(i + 1 AS INT)))"
            ).alias("sel"),
        )
    )
    valid = masked.select(
        "nation",
        "ym",
        F.when(
            F.expr(
                "sel = array_sort(sel) "
                "AND size(array_distinct(sel)) = size(sel)"
            ),
            F.expr("bit_count(CAST(m AS BIGINT))"),
        )
        .otherwise(F.lit(0))
        .alias("popc"),
    )
    scored = valid.groupBy("nation", "ym").agg(F.max("popc").alias("lcs"))
    return (
        scored.groupBy(F.col("nation").cast("long").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("lcs").cast("long").alias("sum_lcs"),
            F.max("lcs").cast("long").alias("max_lcs"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------- Elo LUT replay

_ELO_START = 1000
_ELO_K = 16
# expected score (millis) for the higher-context player, by clamped
# rating-diff bucket: (diff + 400) // 100 in 0..8 for diff -400..400
_ELO_LUT = (91, 151, 240, 360, 500, 640, 760, 849, 909)


def _elo_exp_sql(diff: str) -> str:
    """Expected-millis CASE over the clamped diff bucket."""
    bucket = f"(LEAST(GREATEST({diff}, -400), 400) + 400) // 100"
    cases = " ".join(
        f"WHEN {i} THEN {v}" for i, v in enumerate(_ELO_LUT)
    )
    return f"CASE {bucket} {cases} END"


@query(
    "rank_elo_lut_replay",
    oracle=f"""
        WITH RECURSIVE flows AS MATERIALIZED (
            SELECT s.s_nationkey AS exp_n, c.c_nationkey AS imp_n,
                   year(CAST(o.o_orderdate AS DATE)) * 100
                       + month(CAST(o.o_orderdate AS DATE)) AS ym,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS f
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            WHERE c.c_nationkey <> s.s_nationkey
            GROUP BY 1, 2, 3
        ), und AS (
            -- undirected trade weights re-aggregated from the monthly
            -- flows: ONE fact-scale join feeds both the edge rule and
            -- the game outcomes
            SELECT least(exp_n, imp_n) AS u, greatest(exp_n, imp_n) AS v,
                   CAST(SUM(f) AS BIGINT) AS w
            FROM flows GROUP BY 1, 2
        ), st AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(w) AS BIGINT) AS tot FROM und
        ), heavy AS (
            SELECT u, v FROM und CROSS JOIN st
            WHERE w * cnt * 2 >= 3 * tot
        ), gkeys AS (
            -- every (heavy pair, month) where EITHER direction traded:
            -- a month with only the reverse (v -> u) flow is still a
            -- decided game, so games are keyed on the canonical pair,
            -- not on the u -> v flow's existence
            SELECT DISTINCT h.u, h.v, f.ym
            FROM heavy h JOIN flows f
              ON least(f.exp_n, f.imp_n) = h.u
             AND greatest(f.exp_n, f.imp_n) = h.v
        ), games AS MATERIALIZED (
            SELECT ROW_NUMBER() OVER (ORDER BY ym, u, v) AS rn,
                   u, v, u_wins
            FROM (
                SELECT k.u, k.v, k.ym,
                       COALESCE(fu.f, 0) > COALESCE(fv.f, 0) AS u_wins,
                       COALESCE(fu.f, 0) <> COALESCE(fv.f, 0) AS decided
                FROM gkeys k
                LEFT JOIN flows fu ON fu.exp_n = k.u AND fu.imp_n = k.v
                                   AND fu.ym = k.ym
                LEFT JOIN flows fv ON fv.exp_n = k.v AND fv.imp_n = k.u
                                   AND fv.ym = k.ym
            ) WHERE decided
        ), mx AS (SELECT MAX(rn) AS m FROM games),
        replay AS (
            SELECT 0 AS rn,
                   list_transform(range(25),
                                  i -> CAST({_ELO_START} AS BIGINT)) AS r
            UNION ALL
            SELECT s.rn + 1,
                   list_transform(s.r, (x, i) ->
                       CASE WHEN i - 1 = g.u THEN x + g2.delta
                            WHEN i - 1 = g.v THEN x - g2.delta
                            ELSE x END)
            FROM replay s
            JOIN games g ON g.rn = s.rn + 1
            CROSS JOIN LATERAL (
                SELECT CAST(CAST({_ELO_K} * ((CASE WHEN g.u_wins
                                              THEN 1000 ELSE 0 END)
                            - ({_elo_exp_sql("s.r[g.u + 1] - s.r[g.v + 1]")}))
                            AS HUGEINT) // 1000 AS BIGINT) AS delta
            ) g2
            WHERE s.rn < (SELECT m FROM mx)
        ), finals AS (
            SELECT r FROM replay WHERE rn = (SELECT m FROM mx)
        ), nations AS (
            -- NOTE: inside a WITH RECURSIVE block DuckDB does NOT apply
            -- set-UNION dedup between two plain branches; dedup explicitly
            SELECT DISTINCT n FROM (
                SELECT u AS n FROM heavy UNION ALL SELECT v AS n FROM heavy
            )
        ), played AS (
            SELECT n, CAST(COUNT(*) AS BIGINT) AS n_games,
                   CAST(SUM(CASE WHEN (n = u AND u_wins)
                                   OR (n = v AND NOT u_wins)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_wins
            FROM nations JOIN games ON n = u OR n = v
            GROUP BY n
        )
        SELECT CAST(p.n AS BIGINT) AS nation,
               CAST(f.r[p.n + 1] AS BIGINT) AS final_rating,
               p.n_games, p.n_wins
        FROM played p CROSS JOIN finals f
        ORDER BY nation
    """,
    description="Elo rating replay over the heavy-trade nation rivalry "
    "graph: each month where EITHER direction of a heavy pair traded "
    "produces a 'game' decided by which side exported more (monthly "
    "directed flow cents; ties skipped — games are keyed on the union "
    "of both directed flows so a reverse-only month still counts), "
    "and ratings update sequentially with K=16 and an INTEGER expected-"
    "score LUT over clamped rating-diff buckets — the float-free "
    "logistic stand-in that makes the replay bit-exact (truncation-"
    "toward-zero division mirrored via HUGEINT// and a driver trunc "
    "helper). The game log is dimension-bounded (months x <=300 pairs, "
    "constant in SF), so Spark builds it distributed and replays the "
    "bounded list driver-side (the bounded-collect contract); the "
    "oracle replays the same log as a recursive CTE carrying the "
    "25-rating list. Fact-scale work is two trade aggregations; the "
    "sequential part never grows with data volume.",
)
def rank_elo_lut_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    cn, sn = F.col("c_nationkey"), F.col("s_nationkey")
    joined = (
        line.join(orders, orders.o_orderkey == line.l_orderkey)
        .join(F.broadcast(customer), customer.c_custkey == orders.o_custkey)
        .join(F.broadcast(supplier), supplier.s_suppkey == line.l_suppkey)
        .where(cn != sn)
    )
    # ONE fact-scale join+aggregation; the bounded flows relation
    # (pairs x months) is barriered and feeds BOTH the undirected edge
    # rule and the per-month game outcomes
    flows = (
        joined.groupBy(
            sn.alias("exp_n"),
            cn.alias("imp_n"),
            (
                F.year(F.col("o_orderdate").cast("date")) * 100
                + F.month(F.col("o_orderdate").cast("date"))
            ).alias("ym"),
        )
        .agg(F.sum(dec("l_extendedprice") * 100).cast("long").alias("f"))
        .localCheckpoint(eager=False)
    )
    und = flows.groupBy(
        F.least("exp_n", "imp_n").alias("u"),
        F.greatest("exp_n", "imp_n").alias("v"),
    ).agg(F.sum("f").cast("long").alias("w"))
    st = und.agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("w").cast("long").alias("tot"),
    )
    heavy = (
        und.crossJoin(F.broadcast(st))
        .where(F.col("w") * F.col("cnt") * 2 >= 3 * F.col("tot"))
        .select("u", "v")
    )
    fu = flows.select(
        F.col("exp_n").alias("u1"),
        F.col("imp_n").alias("v1"),
        F.col("ym").alias("ym1"),
        F.col("f").alias("f_uv"),
    )
    fv = flows.select(
        F.col("exp_n").alias("v2"),
        F.col("imp_n").alias("u2"),
        F.col("ym").alias("ym2"),
        F.col("f").alias("f_vu"),
    )
    # game keys = union of BOTH directed flows mapped to the canonical
    # pair, so a month where only the reverse (v -> u) flow exists is
    # still a decided game (bounded relation: pairs x months)
    gkeys = (
        flows.select(
            F.least("exp_n", "imp_n").alias("u"),
            F.greatest("exp_n", "imp_n").alias("v"),
            "ym",
        )
        .distinct()
        .join(F.broadcast(heavy), ["u", "v"])
    )
    games_df = (
        gkeys.join(
            fu,
            (fu.u1 == gkeys.u) & (fu.v1 == gkeys.v)
            & (fu.ym1 == gkeys.ym),
            "left",
        )
        .join(
            fv,
            (F.col("u2") == F.col("u")) & (F.col("v2") == F.col("v"))
            & (F.col("ym2") == F.col("ym")),
            "left",
        )
        .select(
            "ym",
            "u",
            "v",
            (F.coalesce("f_uv", F.lit(0)) > F.coalesce("f_vu", F.lit(0)))
            .alias("u_wins"),
            (F.coalesce("f_uv", F.lit(0)) != F.coalesce("f_vu", F.lit(0)))
            .alias("decided"),
        )
        .filter("decided")
        .orderBy("ym", "u", "v")
    )
    # dimension-bounded game log (months x <=300 pairs, constant in SF)
    games = [
        (int(r["u"]), int(r["v"]), bool(r["u_wins"]))
        for r in games_df.collect()
    ]

    def trunc_div(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    ratings = [_ELO_START] * 25
    stats: dict[int, list[int]] = {}
    for u, v, u_wins in games:
        diff = ratings[u] - ratings[v]
        bucket = (min(max(diff, -400), 400) + 400) // 100
        exp_u = _ELO_LUT[bucket]
        delta = trunc_div(_ELO_K * ((1000 if u_wins else 0) - exp_u), 1000)
        ratings[u] += delta
        ratings[v] -= delta
        for n, won in ((u, u_wins), (v, not u_wins)):
            s = stats.setdefault(n, [0, 0])
            s[0] += 1
            if won:
                s[1] += 1
    rows = [
        (n, ratings[n], s[0], s[1]) for n, s in sorted(stats.items())
    ]
    return spark.createDataFrame(
        rows, "nation bigint, final_rating bigint, n_games bigint, "
        "n_wins bigint"
    ).orderBy("nation")


# ------------------------------------------- TextRank keywords

_TR_PANEL = 30
_TR_ROUNDS = 10
_TR_DAMP_NUM = 850
_TR_BASE = 150000
_TR_START = 1_000_000
_TR_MINLEN = 4


@query(
    "text_textrank_keywords",
    oracle=(
        lambda: f"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id, t.pos, t.word
            FROM (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ), UNNEST(list_transform(range(len(ws)),
                      i -> {{'pos': i, 'word': ws[i + 1]}})) AS u(t)
        ), panel AS MATERIALIZED (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM toks WHERE len(word) >= {_TR_MINLEN}
            GROUP BY word ORDER BY cnt DESC, word LIMIT {_TR_PANEL}
        ), adj AS (
            SELECT a.word AS w1, b.word AS w2
            FROM toks a JOIN toks b
              ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
            WHERE a.word IN (SELECT word FROM panel)
              AND b.word IN (SELECT word FROM panel)
              AND a.word <> b.word
        ), edges AS MATERIALIZED (
            SELECT u, v, CAST(COUNT(*) AS BIGINT) AS w
            FROM (
                SELECT w1 AS u, w2 AS v FROM adj
                UNION ALL SELECT w2 AS u, w1 AS v FROM adj
            ) GROUP BY u, v
        ), outw AS MATERIALIZED (
            SELECT u AS node, CAST(SUM(w) AS BIGINT) AS ow
            FROM edges GROUP BY u
        ), r0 AS MATERIALIZED (
            SELECT word, CAST({_TR_START} AS BIGINT) AS r FROM panel
        )
        {"".join(
            f''', r{k} AS MATERIALIZED (
            SELECT p.word,
                   CAST({_TR_BASE} + ({_TR_DAMP_NUM} * COALESCE((
                       SELECT SUM(CAST(e.w * pr.r AS HUGEINT) // o.ow)
                       FROM edges e
                       JOIN r{k - 1} pr ON pr.word = e.u
                       JOIN outw o ON o.node = e.u
                       WHERE e.v = p.word), 0)) // 1000 AS BIGINT) AS r
            FROM panel p
        )''' for k in range(1, _TR_ROUNDS + 1)
        )}
        SELECT p.word, CAST(p.cnt AS BIGINT) AS cnt,
               CAST(fr.r AS BIGINT) AS rank_micro
        FROM panel p JOIN r{_TR_ROUNDS} fr ON fr.word = p.word
        ORDER BY rank_micro DESC, p.word
    """
    )(),
    description="TextRank keyword ranking (Mihalcea-Tarau): damped "
    "PageRank over the adjacency co-occurrence graph of the corpus's "
    "top-30 frequent words (len >= 4), with edge weights = adjacency "
    "counts. All arithmetic is integer micro-units with truncation "
    "division — r'(v) = 150000 + 850 * sum_u(w_uv * r(u) // outw(u)) "
    "// 1000 — so ten iterations are bit-identical in driver Python "
    "and in the oracle's ten unrolled MATERIALIZED CTE rounds. Scale "
    "shape: tokenization + adjacency-pair counting are the only fact-"
    "scale passes (one lead() window per doc, one groupBy); the graph "
    "itself is panel-bounded (<=30 nodes / <=870 edges), so the "
    "iteration runs driver-side under the bounded-collect contract, "
    "exactly like the nation PageRank lane.",
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"),
    )
    panel = (
        toks.filter(F.length("word") >= _TR_MINLEN)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(_TR_PANEL)
    ).localCheckpoint(eager=False)
    wnext = Window.partitionBy("doc_id").orderBy("pos")
    adj = (
        toks.withColumn("w2", F.lead("word").over(wnext))
        .filter(F.col("w2").isNotNull() & (F.col("word") != F.col("w2")))
        .join(
            F.broadcast(panel.select(F.col("word").alias("pw1"))),
            F.col("word") == F.col("pw1"),
            "left_semi",
        )
        .join(
            F.broadcast(panel.select(F.col("word").alias("pw2"))),
            F.col("w2") == F.col("pw2"),
            "left_semi",
        )
        .select(F.col("word").alias("w1"), F.col("w2"))
    )
    edges_df = (
        adj.select(F.col("w1").alias("u"), F.col("w2").alias("v"))
        .unionAll(adj.select(F.col("w2").alias("u"), F.col("w1").alias("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    # panel-bounded model: <=30 nodes, <=870 weighted edges
    panel_rows = [(r["word"], int(r["cnt"])) for r in panel.collect()]
    edge_rows = [
        (r["u"], r["v"], int(r["w"])) for r in edges_df.collect()
    ]
    outw: dict[str, int] = {}
    for u, _v, w in edge_rows:
        outw[u] = outw.get(u, 0) + w
    rank = {word: _TR_START for word, _ in panel_rows}
    for _ in range(_TR_ROUNDS):
        incoming = {word: 0 for word, _ in panel_rows}
        for u, v, w in edge_rows:
            incoming[v] += (w * rank[u]) // outw[u]
        rank = {
            word: _TR_BASE + (_TR_DAMP_NUM * incoming[word]) // 1000
            for word, _ in panel_rows
        }
    rows = [
        (word, cnt, rank[word]) for word, cnt in panel_rows
    ]
    return spark.createDataFrame(
        rows, "word string, cnt bigint, rank_micro bigint"
    ).orderBy(F.desc("rank_micro"), "word")
