"""Wave-148 (round 5): difference-in-differences + phonetic blocking.

* ``causal_diff_in_differences`` — the canonical 2x2 DiD estimator
  with a PLANTED treatment effect (the planted-truth family):
  treatment = even custkey, post = orders from 1997 on, and the
  planted outcome adds a constant uplift to treated-post rows only.
  The DiD contrast (T,post - T,pre) - (C,post - C,pre) is formed
  over the four cell (sum, count) pairs with ONE truncating division
  at the very end (common denominator n1*n2*n3*n4, ~2.6e22 at sf1 —
  DECIMAL(38)/HUGEINT); because the planted and base estimators
  share that exact denominator, their numerator difference divides
  evenly and the query RECOVERS THE PLANTED UPLIFT EXACTLY — emitted
  as an integer equality column, not an approximation.
* ``linkage_phonetic_blocking`` — classic record-linkage phonetic
  blocking over the warehouse's combined categorical vocabulary
  (part name/type words, market segments, event types —
  the fixture's only real-English token universe): a fully portable
  simplified
  phonetic code (Soundex consonant classes via translate(), vowels/
  H/W deleted, truncated to a COARSE 2-char code — first letter + first
  consonant class — since the fixture vocabulary is small; no
  run-collapse, RE2 has no backreferences), block-size census, and
  within-block candidate verification by levenshtein <= 2.  The
  third blocking tier next to symmetric-delete and trigram: code
  computation is scan-side, blocks are one shuffle, and the verify
  join runs on the bounded distinct-token table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ DiD with plant

_DID_UPLIFT_CENTS = 12345
_DID_POST = "1997-01-01"


@query(
    "causal_diff_in_differences",
    oracle=f"""
        WITH obs AS (
            SELECT CASE WHEN c.c_custkey % 2 = 0 THEN 1 ELSE 0 END
                       AS treat,
                   CASE WHEN o.o_orderdate >= DATE '{_DID_POST}'
                        THEN 1 ELSE 0 END AS post,
                   CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS y
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ), cells AS (
            SELECT treat, post,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS s,
                   CAST(SUM(y + treat * post * {_DID_UPLIFT_CENTS})
                        AS BIGINT) AS sp
            FROM obs GROUP BY treat, post
        ), wide AS (
            SELECT
              MAX(CASE WHEN treat=1 AND post=1 THEN n END) AS n_tp,
              MAX(CASE WHEN treat=1 AND post=0 THEN n END) AS n_tr,
              MAX(CASE WHEN treat=0 AND post=1 THEN n END) AS n_cp,
              MAX(CASE WHEN treat=0 AND post=0 THEN n END) AS n_cr,
              MAX(CASE WHEN treat=1 AND post=1 THEN s END) AS s_tp,
              MAX(CASE WHEN treat=1 AND post=0 THEN s END) AS s_tr,
              MAX(CASE WHEN treat=0 AND post=1 THEN s END) AS s_cp,
              MAX(CASE WHEN treat=0 AND post=0 THEN s END) AS s_cr,
              MAX(CASE WHEN treat=1 AND post=1 THEN sp END) AS sp_tp
            FROM cells
        ), alg AS (
            SELECT n_tp, n_tr, n_cp, n_cr,
                   CAST(s_tp AS HUGEINT) * n_tr * n_cp * n_cr
                   - CAST(s_tr AS HUGEINT) * n_tp * n_cp * n_cr
                   - CAST(s_cp AS HUGEINT) * n_tp * n_tr * n_cr
                   + CAST(s_cr AS HUGEINT) * n_tp * n_tr * n_cp
                       AS num_base,
                   CAST(sp_tp AS HUGEINT) * n_tr * n_cp * n_cr
                   - CAST(s_tr AS HUGEINT) * n_tp * n_cp * n_cr
                   - CAST(s_cp AS HUGEINT) * n_tp * n_tr * n_cr
                   + CAST(s_cr AS HUGEINT) * n_tp * n_tr * n_cp
                       AS num_plant,
                   CAST(n_tp AS HUGEINT) * n_tr * n_cp * n_cr AS den,
                   s_tp, s_tr, s_cp, s_cr
            FROM wide
        )
        SELECT n_tp, n_tr, n_cp, n_cr,
               CAST(CAST(s_tp AS HUGEINT) * 1000 // n_tp AS BIGINT)
                   AS mean_tp_millicents,
               CAST(CAST(s_cr AS HUGEINT) * 1000 // n_cr AS BIGINT)
                   AS mean_cr_millicents,
               CAST(num_base * 1000 // den AS BIGINT)
                   AS did_base_millicents,
               CAST(num_plant * 1000 // den AS BIGINT)
                   AS did_planted_millicents,
               CAST((num_plant - num_base) // den AS BIGINT)
                   AS uplift_recovered_cents,
               CAST(CASE WHEN (num_plant - num_base) // den
                         = {_DID_UPLIFT_CENTS}
                         AND (num_plant - num_base) % den = 0
                    THEN 1 ELSE 0 END AS BIGINT) AS exact_recovery
        FROM alg
    """,
    description="Canonical 2x2 difference-in-differences with a "
    "PLANTED uplift (treatment = even custkey, post = 1997+, "
    "constant cents added to treated-post outcomes inside the "
    "derivation): the DiD contrast is formed over four cell "
    "(sum, count) pairs with ONE truncating division at the end, "
    "over the common denominator n1*n2*n3*n4 (~2.6e22 at sf1 — "
    "DECIMAL(38)/HUGEINT territory). Because base and planted "
    "estimators share that exact denominator, their numerator "
    "difference divides EVENLY and the query recovers the planted "
    "uplift exactly — emitted as an integer equality, the planted-"
    "truth pattern that turns a causal estimator into a self-"
    "checking identity. 100 TB shape: one orders x customer join, "
    "one 4-cell aggregation, scalar algebra.",
)
def causal_diff_in_differences(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    obs = orders.join(
        customer, customer.c_custkey == orders.o_custkey
    ).select(
        F.when(F.col("c_custkey") % 2 == 0, 1).otherwise(0).alias(
            "treat"
        ),
        F.when(
            F.col("o_orderdate") >= F.lit(_DID_POST).cast("date"), 1
        )
        .otherwise(0)
        .alias("post"),
        (F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("y"),
    )
    cells = obs.groupBy("treat", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(
            F.col("y")
            + F.col("treat") * F.col("post") * _DID_UPLIFT_CENTS
        )
        .cast("long")
        .alias("sp"),
    )
    wide = cells.agg(
        *[
            F.max(
                F.when(
                    (F.col("treat") == t) & (F.col("post") == p),
                    F.col(c),
                )
            ).alias(f"{c}_{name}")
            for c in ("n", "s")
            for (t, p, name) in [
                (1, 1, "tp"),
                (1, 0, "tr"),
                (0, 1, "cp"),
                (0, 0, "cr"),
            ]
        ],
        F.max(
            F.when(
                (F.col("treat") == 1) & (F.col("post") == 1),
                F.col("sp"),
            )
        ).alias("sp_tp"),
    )
    alg = wide.select(
        "n_tp",
        "n_tr",
        "n_cp",
        "n_cr",
        "s_tp",
        "s_cr",
        F.expr(
            "CAST(s_tp AS DECIMAL(38,0)) * n_tr * n_cp * n_cr"
            " - CAST(s_tr AS DECIMAL(38,0)) * n_tp * n_cp * n_cr"
            " - CAST(s_cp AS DECIMAL(38,0)) * n_tp * n_tr * n_cr"
            " + CAST(s_cr AS DECIMAL(38,0)) * n_tp * n_tr * n_cp"
        ).alias("num_base"),
        F.expr(
            "CAST(sp_tp AS DECIMAL(38,0)) * n_tr * n_cp * n_cr"
            " - CAST(s_tr AS DECIMAL(38,0)) * n_tp * n_cp * n_cr"
            " - CAST(s_cp AS DECIMAL(38,0)) * n_tp * n_tr * n_cr"
            " + CAST(s_cr AS DECIMAL(38,0)) * n_tp * n_tr * n_cp"
        ).alias("num_plant"),
        F.expr(
            "CAST(n_tp AS DECIMAL(38,0)) * n_tr * n_cp * n_cr"
        ).alias("den"),
    )
    return alg.select(
        "n_tp",
        "n_tr",
        "n_cp",
        "n_cr",
        F.expr(
            "CAST(CAST(s_tp AS DECIMAL(38,0)) * 1000 div n_tp"
            " AS BIGINT)"
        ).alias("mean_tp_millicents"),
        F.expr(
            "CAST(CAST(s_cr AS DECIMAL(38,0)) * 1000 div n_cr"
            " AS BIGINT)"
        ).alias("mean_cr_millicents"),
        F.expr("CAST(num_base * 1000 div den AS BIGINT)").alias(
            "did_base_millicents"
        ),
        F.expr("CAST(num_plant * 1000 div den AS BIGINT)").alias(
            "did_planted_millicents"
        ),
        F.expr(
            "CAST((num_plant - num_base) div den AS BIGINT)"
        ).alias("uplift_recovered_cents"),
        F.expr(
            f"CAST(CASE WHEN (num_plant - num_base) div den"
            f" = {_DID_UPLIFT_CENTS}"
            f" AND (num_plant - num_base) % den = 0"
            f" THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("exact_recovery"),
    )


# ------------------------------------------------ phonetic blocking

# Soundex consonant classes; vowels + H/W/Y are deleted (positions
# past the end of the to-string in translate()). No run-collapse:
# RE2 (DuckDB) has no backreferences, so the code spec is documented
# as collapse-free and applied identically in both engines.
_PH_FROM = "BFPVCGJKQSXZDTLMNRAEIOUYHW"
_PH_TO = "111122222222334556"


@query(
    "linkage_phonetic_blocking",
    oracle=f"""
        WITH raw AS (
            SELECT unnest(regexp_split_to_array(p_name, ' ')) AS t
            FROM part
            UNION ALL
            SELECT unnest(regexp_split_to_array(p_type, ' ')) FROM part
            UNION ALL
            SELECT c_mktsegment FROM customer
            UNION ALL
            SELECT event_type FROM events
        ), tok AS (
            SELECT DISTINCT upper(t) AS t FROM raw
            WHERE regexp_matches(upper(t), '^[A-Z]+$')
        ), coded AS (
            SELECT t,
                   substr(substr(t, 1, 1) ||
                          translate(substr(t, 2),
                                    '{_PH_FROM}', '{_PH_TO}'),
                          1, 2) AS code
            FROM tok
        ), blocks AS (
            SELECT code,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens
            FROM coded GROUP BY code
        ), pairs AS (
            SELECT a.code,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(CASE WHEN levenshtein(a.t, b.t) <= 2
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_close_pairs,
                   MIN(CASE WHEN levenshtein(a.t, b.t) <= 2
                       THEN a.t || '>' || b.t END) AS example_close
            FROM coded a JOIN coded b
              ON b.code = a.code AND b.t > a.t
            GROUP BY a.code
        )
        SELECT b.code, b.n_tokens,
               COALESCE(p.n_pairs, 0) AS n_pairs,
               COALESCE(p.n_close_pairs, 0) AS n_close_pairs,
               p.example_close
        FROM blocks b LEFT JOIN pairs p ON p.code = b.code
        WHERE b.n_tokens > 1
        ORDER BY b.code
    """,
    description="Phonetic-blocking record linkage over the "
    "warehouse's combined categorical vocabulary (part name/type "
    "words, market segments, event types) — the third "
    "blocking tier next to symmetric-delete and trigram: a fully "
    "portable simplified phonetic code "
    "(Soundex consonant classes via translate(), vowels/H/W/Y "
    "deleted, collapse-free spec since RE2 lacks backreferences), "
    "block census, and within-block candidate pairs verified by "
    "levenshtein <= 2. 100 TB shape: the code is a scan-side "
    "expression (no UDF), block stats are one shuffle, and the "
    "verify join runs on the bounded DISTINCT-token table so the "
    "quadratic stays inside blocks of a ~100-word vocabulary.",
)
def linkage_phonetic_blocking(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    raw = (
        part.select(
            F.explode(F.split("p_name", " ")).alias("t")
        )
        .unionByName(
            part.select(F.explode(F.split("p_type", " ")).alias("t"))
        )
        .unionByName(
            customer.select(F.col("c_mktsegment").alias("t"))
        )
        .unionByName(events.select(F.col("event_type").alias("t")))
    )
    tok = (
        raw.select(F.upper("t").alias("t"))
        .where(F.col("t").rlike("^[A-Z]+$"))
        .distinct()
    )
    coded = tok.select(
        "t",
        F.substring(
            F.concat(
                F.substring("t", 1, 1),
                F.translate(
                    F.expr("substr(t, 2)"), _PH_FROM, _PH_TO
                ),
            ),
            1,
            2,
        ).alias("code"),
    ).localCheckpoint(eager=False)  # bounded vocab, reused 3x
    blocks = coded.groupBy("code").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    a = coded.select("code", F.col("t").alias("ta"))
    b = coded.select("code", F.col("t").alias("tb"))
    close = F.levenshtein("ta", "tb") <= 2
    pairs = (
        a.join(b, "code")
        .where(F.col("tb") > F.col("ta"))
        .groupBy("code")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.when(close, 1).otherwise(0))
            .cast("long")
            .alias("n_close_pairs"),
            F.min(
                F.when(
                    close,
                    F.concat(F.col("ta"), F.lit(">"), F.col("tb")),
                )
            ).alias("example_close"),
        )
    )
    return (
        blocks.join(F.broadcast(pairs), "code", "left")
        .where(F.col("n_tokens") > 1)
        .select(
            "code",
            "n_tokens",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_close_pairs", F.lit(0)).alias(
                "n_close_pairs"
            ),
            "example_close",
        )
        .orderBy("code")
    )
