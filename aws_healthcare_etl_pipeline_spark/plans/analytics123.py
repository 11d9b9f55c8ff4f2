"""Wave-149 (round 5): stable matching + Luhn check-digit audit.

* ``match_stable_assignment`` — Gale-Shapley deferred acceptance
  between 25 consumer groups and 25 shards (both keyed by nation):
  preference matrices from the md5 nibble-ladder hash, proposals by
  rank tables (ROW_NUMBER over hash order), and 16 simultaneous-
  proposal rounds (convergence measured at 14 on the fixed 25-key
  universe, which is scale-factor-independent).  Per round: free consumers propose to their
  idx-th choice, each shard keeps the best of {current partner,
  proposers} by its own hash preference, displaced/rejected
  consumers advance.  The Spark side iterates over the bounded
  state table with per-step barriers; the oracle unrolls the same
  16 rounds as generated chained CTEs with every level
  MATERIALIZED (each level is referenced 3x — the 2^k re-inlining
  trap).  A ``converged`` flag is emitted rather than assumed.
* ``dq_luhn_check_digit_audit`` — the Luhn mod-10 check digit over
  8-digit account numbers derived from custkey, fully unrolled as
  fixed-position arithmetic (no explode, no UDF): (1) every
  generated check digit validates, (2) a deterministic single-digit
  corruption is detected on EVERY row (Luhn's guarantee), and
  (3) a deterministic adjacent transposition is undetected EXACTLY
  when the swapped pair is {0,9} or equal — the classic blind spot,
  emitted as an integer identity between the observed misses and
  the pair census, so the audit proves the textbook property on
  real keys rather than asserting it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ stable matching

_GS_ROUNDS = 16


def _hex4(expr: str) -> str:
    h = f"md5({expr})"
    nibs = [
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        for i in range(4)
    ]
    return (
        f"((({nibs[0]} * 16 + {nibs[1]}) * 16 + {nibs[2]}) * 16"
        f" + {nibs[3]})"
    )


def _gs_oracle() -> str:
    levels = []
    for k in range(1, _GS_ROUNDS + 1):
        p = f"st{k - 1}"
        levels.append(
            f"""st{k} AS MATERIALIZED (
            SELECT s.m,
                   CASE WHEN w2.m IS NOT NULL THEN s.idx
                        WHEN s.w IS NULL AND pr.tw IS NOT NULL
                             THEN s.idx + 1
                        ELSE s.idx END AS idx,
                   w2.tw AS w
            FROM {p} s
            LEFT JOIN (
                SELECT f.m, rt.w AS tw
                FROM {p} f JOIN rt ON rt.m = f.m AND rt.rnk = f.idx
                WHERE f.w IS NULL
            ) pr ON pr.m = s.m
            LEFT JOIN (
                SELECT m, tw FROM (
                    SELECT c.m, c.tw,
                           ROW_NUMBER() OVER (PARTITION BY c.tw
                               ORDER BY pw.r, c.m) AS rn
                    FROM (
                        SELECT e.m, e.w AS tw FROM {p} e
                        WHERE e.w IS NOT NULL
                        UNION ALL
                        SELECT f.m, rt.w
                        FROM {p} f
                        JOIN rt ON rt.m = f.m AND rt.rnk = f.idx
                        WHERE f.w IS NULL
                    ) c JOIN pw ON pw.w = c.tw AND pw.m = c.m
                ) rk WHERE rn = 1
            ) w2 ON w2.m = s.m
        )"""
        )
    chain = ", ".join(levels)
    return f"""
        WITH ids AS MATERIALIZED (
            SELECT n_nationkey AS k FROM nation
        ), pm AS MATERIALIZED (
            SELECT a.k AS m, b.k AS w,
                   ({_hex4(
                       "'gs-m:' || CAST(a.k AS VARCHAR) || ':'"
                       " || CAST(b.k AS VARCHAR)"
                   )}) AS r
            FROM ids a, ids b
        ), pw AS MATERIALIZED (
            SELECT a.k AS w, b.k AS m,
                   ({_hex4(
                       "'gs-w:' || CAST(a.k AS VARCHAR) || ':'"
                       " || CAST(b.k AS VARCHAR)"
                   )}) AS r
            FROM ids a, ids b
        ), rt AS MATERIALIZED (
            SELECT m, w,
                   ROW_NUMBER() OVER (PARTITION BY m ORDER BY r, w)
                       - 1 AS rnk
            FROM pm
        ), wrk AS MATERIALIZED (
            SELECT w, m,
                   ROW_NUMBER() OVER (PARTITION BY w ORDER BY r, m)
                       - 1 AS wrnk
            FROM pw
        ), st0 AS MATERIALIZED (
            SELECT k AS m, 0 AS idx, CAST(NULL AS BIGINT) AS w
            FROM ids
        ), {chain}, fin AS (
            SELECT * FROM st{_GS_ROUNDS}
        ), conv AS (
            SELECT CAST(CASE WHEN COUNT(*) FILTER (WHERE w IS NULL) = 0
                        THEN 1 ELSE 0 END AS BIGINT) AS converged
            FROM fin
        )
        SELECT f.m AS consumer, CAST(f.w AS BIGINT) AS shard,
               CAST(f.idx AS BIGINT) AS consumer_rank,
               CAST(wr.wrnk AS BIGINT) AS shard_rank,
               c.converged
        FROM fin f
        JOIN wrk wr ON wr.w = f.w AND wr.m = f.m
        CROSS JOIN conv c
        ORDER BY consumer
    """


@query(
    "match_stable_assignment",
    oracle=_gs_oracle(),
    description="Gale-Shapley stable assignment of 25 consumer "
    "groups to 25 shards (the two-sided matching that minimizes "
    "reassignment churn when both sides have preferences — here "
    "md5-hash preference matrices standing in for data-locality "
    "scores): rank tables from ROW_NUMBER over hash order, 16 "
    "simultaneous-proposal deferred-acceptance rounds, displaced "
    "and rejected consumers advancing their proposal index; "
    "convergence is EMITTED as a flag, not assumed. The oracle "
    "unrolls the same rounds as generated chained CTEs with every "
    "level MATERIALIZED (each is referenced 3x — the re-inlining "
    "trap); the Spark side iterates the bounded 25-row state table "
    "with per-step barriers. 100 TB shape: pure model-table "
    "computation — the preference matrices would come from one "
    "data-scale locality aggregation, and the matching itself "
    "never touches fact-grain data.",
)
def match_stable_assignment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    ids = nation.select(F.col("n_nationkey").alias("k"))
    a = ids.select(F.col("k").alias("m"))
    b = ids.select(F.col("k").alias("w"))
    hx = (
        lambda prefix: (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(prefix),
                            F.col("m").cast("string"),
                            F.lit(":"),
                            F.col("w").cast("string"),
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
        )
    )
    pm = a.crossJoin(b).select("m", "w", hx("gs-m:").alias("r"))
    pw_df = (
        a.crossJoin(b)
        .select(
            "w",
            "m",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("gs-w:"),
                            F.col("w").cast("string"),
                            F.lit(":"),
                            F.col("m").cast("string"),
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("r"),
        )
        .localCheckpoint(eager=False)  # 625-row preference matrix
    )
    wm = Window.partitionBy("m").orderBy("r", "w")
    rt = pm.select(
        "m", "w", (F.row_number().over(wm) - 1).alias("rnk")
    ).localCheckpoint(eager=False)
    ww = Window.partitionBy("w").orderBy("r", "m")
    wrk = pw_df.select(
        "w", "m", (F.row_number().over(ww) - 1).alias("wrnk")
    )
    state = ids.select(
        F.col("k").alias("m"),
        F.lit(0).alias("idx"),
        F.lit(None).cast("long").alias("w"),
    )
    wwin = Window.partitionBy("tw").orderBy("r", "m")
    for rnd in range(_GS_ROUNDS):
        free = state.where(F.col("w").isNull()).select("m", "idx")
        props = free.join(rt, ["m"]).where(
            F.col("rnk") == F.col("idx")
        ).select("m", F.col("w").alias("tw"))
        standing = state.where(F.col("w").isNotNull()).select(
            "m", F.col("w").alias("tw")
        )
        cands = standing.unionByName(props)
        winners = (
            cands.join(
                pw_df.select(
                    F.col("w").alias("tw"), F.col("m").alias("m"), "r"
                ),
                ["tw", "m"],
            )
            .withColumn("rn", F.row_number().over(wwin))
            .where(F.col("rn") == 1)
            .select("m", "tw")
        )
        state = (
            state.join(
                props.select("m", F.col("tw").alias("ptw")), "m", "left"
            )
            .join(
                winners.select("m", F.col("tw").alias("wtw")),
                "m",
                "left",
            )
            .select(
                "m",
                F.when(F.col("wtw").isNotNull(), F.col("idx"))
                .when(
                    F.col("w").isNull() & F.col("ptw").isNotNull(),
                    F.col("idx") + 1,
                )
                .otherwise(F.col("idx"))
                .alias("idx"),
                F.col("wtw").alias("w"),
            )
        )
        # HARD barrier, every round: state is referenced 4x per
        # round, so an unbarriered chain duplicates subtrees
        # 4^k-fold; measured, even eager localCheckpoint left the
        # per-round job cost growing ~4x once the matching converged
        # (AQE re-optimization over the nested window subqueries).
        # The state is 25 rows BY CONSTRUCTION (one per consumer), so
        # a driver round-trip is a bounded-collect barrier, the same
        # contract as the k x dim centroid transfers.
        state = spark.createDataFrame(state.collect(), state.schema)
    conv = state.agg(
        F.when(
            F.sum(F.when(F.col("w").isNull(), 1).otherwise(0)) == 0, 1
        )
        .otherwise(0)
        .cast("long")
        .alias("converged")
    )
    return (
        state.join(wrk, ["w", "m"])
        .crossJoin(F.broadcast(conv))
        .select(
            F.col("m").alias("consumer"),
            F.col("w").cast("long").alias("shard"),
            F.col("idx").cast("long").alias("consumer_rank"),
            F.col("wrnk").cast("long").alias("shard_rank"),
            "converged",
        )
        .orderBy("consumer")
    )


# ------------------------------------------------ Luhn audit

_LUHN_W = 9  # digits of acct*10+chk (8-digit account + check)


def _luhn_sum(numexpr: str) -> str:
    """Unrolled Luhn digit sum of a 9-digit number expression."""
    terms = []
    for i in range(_LUHN_W):
        d = f"(({numexpr}) // {10 ** i} % 10)"
        if i % 2 == 1:
            terms.append(
                f"(CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9"
                f" ELSE {d} * 2 END)"
            )
        else:
            terms.append(d)
    return "(" + " + ".join(terms) + ")"


def _luhn_sum_spark(numexpr: str) -> str:
    return _luhn_sum(numexpr).replace("//", "div")


@query(
    "dq_luhn_check_digit_audit",
    oracle=f"""
        WITH base AS (
            SELECT c_custkey % 100000000 AS acct,
                   c_custkey % 7 AS p,
                   c_custkey % 9 + 1 AS delta
            FROM customer
        ), checked AS (
            SELECT acct, p, delta,
                   (10 - {_luhn_sum("acct * 10")} % 10) % 10 AS chk
            FROM base
        ), full_n AS (
            SELECT acct, p, delta, chk,
                   acct * 10 + chk AS num,
                   (acct * 10 + chk) // POWER(10, p)::BIGINT % 10
                       AS fd_lo,
                   (acct * 10 + chk) // POWER(10, p + 1)::BIGINT % 10
                       AS fd_hi
            FROM checked
        ), variants AS (
            SELECT num, fd_lo, fd_hi,
                   num + ((fd_lo + delta) % 10 - fd_lo)
                       * POWER(10, p)::BIGINT AS corrupted,
                   num + (fd_hi - fd_lo) * POWER(10, p)::BIGINT
                       + (fd_lo - fd_hi) * POWER(10, p + 1)::BIGINT
                       AS transposed
            FROM full_n
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN {_luhn_sum("num")} % 10 = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
               CAST(SUM(CASE WHEN {_luhn_sum("corrupted")} % 10 != 0
                    THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_corruption_detected,
               CAST(SUM(CASE WHEN {_luhn_sum("transposed")} % 10 = 0
                    THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_transposition_missed,
               CAST(SUM(CASE WHEN fd_lo = fd_hi
                             OR (fd_lo + fd_hi = 9
                                 AND fd_lo * fd_hi = 0)
                    THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_blind_spot_pairs
        FROM variants
    """,
    description="Luhn mod-10 check-digit audit over 8-digit account "
    "numbers derived from custkey, fully unrolled as fixed-position "
    "integer arithmetic (no explode, no UDF): every generated check "
    "digit validates, a deterministic single-digit corruption "
    "(delta 1..9 at position custkey%7) is detected on EVERY row — "
    "Luhn's guarantee — and a deterministic adjacent transposition "
    "goes undetected EXACTLY when the swapped pair is equal or "
    "{{0,9}}: the audit emits both the observed misses and the "
    "blind-spot pair census, whose equality proves the textbook "
    "property on real keys. 100 TB shape: a single scan-side "
    "expression battery over the customer dimension; one "
    "aggregation, five counters.",
)
def dq_luhn_check_digit_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    base = customer.select(
        (F.col("c_custkey") % 100000000).alias("acct"),
        (F.col("c_custkey") % 7).alias("p"),
        (F.col("c_custkey") % 9 + 1).alias("delta"),
    )
    checked = base.withColumn(
        "chk",
        F.expr(f"(10 - {_luhn_sum_spark('acct * 10')} % 10) % 10"),
    )
    full_n = checked.select(
        "p",
        "delta",
        F.expr("acct * 10 + chk").alias("num"),
        F.expr(
            "(acct * 10 + chk) div CAST(POWER(10, p) AS BIGINT) % 10"
        ).alias("fd_lo"),
        F.expr(
            "(acct * 10 + chk) div CAST(POWER(10, p + 1) AS BIGINT)"
            " % 10"
        ).alias("fd_hi"),
    )
    variants = full_n.select(
        "num",
        "fd_lo",
        "fd_hi",
        F.expr(
            "num + ((fd_lo + delta) % 10 - fd_lo)"
            " * CAST(POWER(10, p) AS BIGINT)"
        ).alias("corrupted"),
        F.expr(
            "num + (fd_hi - fd_lo) * CAST(POWER(10, p) AS BIGINT)"
            " + (fd_lo - fd_hi) * CAST(POWER(10, p + 1) AS BIGINT)"
        ).alias("transposed"),
    )
    return variants.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.expr(
                f"CASE WHEN {_luhn_sum_spark('num')} % 10 = 0"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_valid"),
        F.sum(
            F.expr(
                f"CASE WHEN {_luhn_sum_spark('corrupted')} % 10 != 0"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_corruption_detected"),
        F.sum(
            F.expr(
                f"CASE WHEN {_luhn_sum_spark('transposed')} % 10 = 0"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_transposition_missed"),
        F.sum(
            F.expr(
                "CASE WHEN fd_lo = fd_hi"
                " OR (fd_lo + fd_hi = 9 AND fd_lo * fd_hi = 0)"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_blind_spot_pairs"),
    )
