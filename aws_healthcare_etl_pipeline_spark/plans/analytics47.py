"""Wave-73 (round 5): streaming-sketch theory + join-safety profiling.

* ``approx_f2_moment_sketch`` — the AMS (Alon-Matias-Szegedy) second-
  frequency-moment sketch, self-graded: eight +/-1 sign hashes (the
  nibble parities of ONE shared md5 digest per row — the portable
  hash family, one evaluation per row), each giving the
  one-pass mergeable estimator Z_j = sum_i sign_j(i) * f_i with
  E[Z^2] = F2; the query reports the EXACT F2 (per-key counting),
  every estimator, their median, and the signed error in ppm — the
  established estimator-error-audit pattern applied to the classic
  sketch every F2/self-join-size estimator descends from.
* ``audit_join_fanout_estimates`` — pre-flight join-safety audit: for
  a fixed battery of join candidates, per-side key multiplicities
  (max/rows-per-distinct-key) and the EXACT output cardinality via
  the count-product identity sum_k n_a(k) * n_b(k) — no join is
  executed; the explosion risk is read off the key histograms, which
  is how a planner (or an on-call engineer) vets a join before
  running it on 100 TB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ AMS F2 sketch

_AMS_HASHES = 8  # independent sign hashes


def _ams_sign_sql(j: int) -> str:
    # +1 / -1 from the parity of the (j+1)-th hex nibble of ONE shared
    # md5 digest per row (r8: was eight separate seeded digests — the
    # count-sketch digest-sharing trick cuts per-row hashing 8x; the
    # eight nibble-parity bits of a single md5 are the independent
    # sign family)
    return (
        f"(CASE WHEN (strpos('0123456789abcdef', substr(md5('s:' || "
        f"CAST(l_partkey AS VARCHAR)), {j + 1}, 1)) - 1) % 2 = 0 "
        f"THEN 1 ELSE -1 END)"
    )


def _ams_oracle() -> str:
    zs = ", ".join(
        f"CAST(SUM({_ams_sign_sql(j)}) AS BIGINT) AS z{j}"
        for j in range(_AMS_HASHES)
    )
    ests = ", ".join(f"z{j} * z{j} AS e{j}" for j in range(_AMS_HASHES))
    elist = ", ".join(f"e{j}" for j in range(_AMS_HASHES))
    return f"""
        WITH exact AS (
            SELECT CAST(SUM(f * f) AS BIGINT) AS f2
            FROM (SELECT COUNT(*) AS f FROM lineitem GROUP BY l_partkey)
        ), sk AS (
            SELECT {zs} FROM lineitem
        ), es AS (
            SELECT {ests} FROM sk
        ), med AS (
            SELECT CAST(lst[{_AMS_HASHES // 2}] AS BIGINT) AS med_est
            FROM (SELECT list_sort([{elist}]) AS lst FROM es)
        )
        SELECT x.f2 AS exact_f2,
               m.med_est AS median_estimate,
               CAST(((m.med_est - x.f2) * 1000000) // x.f2 AS BIGINT)
                   AS signed_error_ppm
        FROM exact x, med m
    """


@query(
    "approx_f2_moment_sketch",
    oracle=_ams_oracle(),
    description="AMS second-frequency-moment sketch, self-graded: "
    "eight +/-1 sign hashes — the parities of eight nibbles of ONE "
    "shared md5 digest per row (the portable hash family; one hash "
    "evaluation per row, not eight) — give one-pass estimators Z_j = "
    "sum sign_j(key) per lineitem part-access, E[Z^2] = F2 = sum "
    "f_k^2 (the "
    "self-join size); the query reports the exact F2, the median of "
    "the eight Z^2 estimators (the textbook variance-reduction "
    "step), and the signed error in ppm. All eight Z's accumulate in "
    "ONE scan as plain conditional sums — the mergeable-sketch shape "
    "that estimates self-join sizes on 100 TB without ever grouping "
    "by key — while the exact companion costs the full groupBy the "
    "sketch avoids; at sf0.01 the driver hash-checks both paths.",
)
def approx_f2_moment_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    exact = (
        line.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("f"))
        .agg(F.sum(F.col("f") * F.col("f")).cast("long").alias("exact_f2"))
    )

    # ONE md5 digest per row, projected once and shared by all eight
    # sign extractions (nibble j+1 parity) — the same digest-sharing
    # rewrite that took approx_count_sketch_signed 4.0 -> 3.0s in r7
    digest = line.select(
        F.md5(
            F.concat(F.lit("s:"), F.col("l_partkey").cast("string"))
        ).alias("h")
    )

    def sign(j: int):
        nib = F.conv(F.substring(F.col("h"), j + 1, 1), 16, 10).cast("long")
        return F.when(nib % 2 == 0, 1).otherwise(-1)

    sk = digest.agg(
        *[
            F.sum(sign(j)).cast("long").alias(f"z{j}")
            for j in range(_AMS_HASHES)
        ]
    )
    ests = sk.select(
        F.array_sort(
            F.array(
                *[
                    (F.col(f"z{j}") * F.col(f"z{j}")).cast("long")
                    for j in range(_AMS_HASHES)
                ]
            )
        ).alias("lst")
    ).select(
        F.element_at("lst", _AMS_HASHES // 2).alias("median_estimate")
    )
    return (
        exact.crossJoin(F.broadcast(ests))
        .select(
            "exact_f2",
            "median_estimate",
            F.expr(
                "((median_estimate - exact_f2) * 1000000) div exact_f2"
            )
            .cast("long")
            .alias("signed_error_ppm"),
        )
    )


# ------------------------------------------------ join fanout audit

# (label, left table, left key, right table, right key)
_FANOUT_JOINS = [
    ("lineitem*orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem*part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders*customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem*supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
]


def _fanout_oracle() -> str:
    parts = []
    for label, lt, lk, rt, rk in _FANOUT_JOINS:
        parts.append(f"""
        SELECT '{label}' AS join_label,
               CAST((SELECT COUNT(*) FROM {lt}) AS BIGINT) AS left_rows,
               CAST((SELECT COUNT(*) FROM {rt}) AS BIGINT) AS right_rows,
               CAST(MAX(a.n) AS BIGINT) AS left_max_per_key,
               CAST(MAX(COALESCE(b.n, 0)) AS BIGINT) AS right_max_per_key,
               CAST(SUM(a.n * COALESCE(b.n, 0)) AS BIGINT) AS output_rows
        FROM (SELECT {lk} AS k, COUNT(*) AS n FROM {lt} GROUP BY 1) a
        LEFT JOIN (SELECT {rk} AS k, COUNT(*) AS n FROM {rt} GROUP BY 1) b
          ON b.k = a.k""")
    return " UNION ALL ".join(parts) + " ORDER BY join_label"


@query(
    "audit_join_fanout_estimates",
    oracle=_fanout_oracle(),
    description="Pre-flight join-safety audit: for each candidate "
    "equi-join, per-side key multiplicities (max rows per key) and "
    "the EXACT output cardinality via the count-product identity "
    "|A join B| = sum_k n_a(k)*n_b(k) — computed from the two key "
    "HISTOGRAMS without executing the join, which is how you vet a "
    "join for fanout explosion before burning a 100 TB shuffle on "
    "it. Each side is one partial-agg shuffle on its key; the "
    "histogram join is key-cardinality-sized, and a skewed "
    "multiplicity shows up as left/right_max_per_key before it "
    "becomes a straggler task.",
)
def audit_join_fanout_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for label, lt, lk, rt, rk in _FANOUT_JOINS:
        lt_df = load_table(spark, sf_dir, lt)
        rt_df = load_table(spark, sf_dir, rt)
        a = lt_df.groupBy(F.col(lk).alias("k")).agg(
            F.count(F.lit(1)).alias("na")
        )
        b = rt_df.groupBy(F.col(rk).alias("k")).agg(
            F.count(F.lit(1)).alias("nb")
        )
        lrows = lt_df.agg(F.count(F.lit(1)).cast("long").alias("left_rows"))
        rrows = rt_df.agg(F.count(F.lit(1)).cast("long").alias("right_rows"))
        hist = (
            a.join(b, "k", "left")
            .agg(
                F.max("na").cast("long").alias("left_max_per_key"),
                F.max(F.coalesce(F.col("nb"), F.lit(0)))
                .cast("long")
                .alias("right_max_per_key"),
                F.sum(F.col("na") * F.coalesce(F.col("nb"), F.lit(0)))
                .cast("long")
                .alias("output_rows"),
            )
        )
        outs.append(
            hist.crossJoin(F.broadcast(lrows))
            .crossJoin(F.broadcast(rrows))
            .select(
                F.lit(label).alias("join_label"),
                "left_rows",
                "right_rows",
                "left_max_per_key",
                "right_max_per_key",
                "output_rows",
            )
        )
    return reduce(DataFrame.unionByName, outs).orderBy("join_label")
