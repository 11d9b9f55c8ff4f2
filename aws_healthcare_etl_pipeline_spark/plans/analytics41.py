"""Wave-67 (round 5): multiresolution analysis + submodular selection.

* ``timeseries_haar_wavelet_energy`` — unnormalized Haar wavelet
  decomposition of the first 64 observed daily-revenue values: six
  levels of pairwise sums (approximation) and differences (detail),
  all INTEGER cents so every coefficient is exact; the output is the
  per-level detail-energy profile (the multiresolution fingerprint
  behind wavelet compression and scale-localized anomaly detection).
  Spark computes every level directly from the materialized base
  array as block-sum slices (no nested chained transforms); the
  pyramid-form oracle proves the block-sum identity.
* ``selection_greedy_max_coverage`` — greedy maximum-coverage data
  selection: pick k sources maximizing distinct-token coverage, the
  submodular-selection primitive behind corpus subset selection (and
  the 1-1/e guarantee). Greedy is order-sensitive (every pick changes
  every later gain), so the oracle unrolls the k steps into chained
  CTEs with anti-joins on the covered set; Spark iterates with a
  distributed anti-join + 1-row argmax per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ Haar wavelet energy

_HAAR_N = 64  # 2^6 observed days
_HAAR_LEVELS = 6


def _haar_oracle() -> str:
    # chained CTEs: lv0 holds the 64-sample array; lvK holds approx aK
    # and detail dK lists
    steps = []
    for k in range(1, _HAAR_LEVELS + 1):
        prev = "lv0" if k == 1 else f"lv{k - 1}"
        src = "arr" if k == 1 else "a"
        half = _HAAR_N >> k
        steps.append(
            f"lv{k} AS (SELECT "
            f"list_transform(range(0, {half}), i -> "
            f"{src}[2 * i + 1] + {src}[2 * i + 2]) AS a, "
            f"list_transform(range(0, {half}), i -> "
            f"{src}[2 * i + 1] - {src}[2 * i + 2]) AS d "
            f"FROM {prev})"
        )
    detail_rows = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS level, "
        f"CAST({_HAAR_N >> k} AS BIGINT) AS n_coeffs, "
        f"CAST(list_sum(list_transform(d, x -> ABS(x))) AS BIGINT) "
        f"AS sum_abs, "
        f"CAST(list_max(list_transform(d, x -> ABS(x))) AS BIGINT) "
        f"AS max_abs FROM lv{k}"
        for k in range(1, _HAAR_LEVELS + 1)
    )
    return f"""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ), firstn AS (
            SELECT day, cents,
                   ROW_NUMBER() OVER (ORDER BY day) AS rn
            FROM daily QUALIFY rn <= {_HAAR_N}
        ), lv0 AS (
            SELECT list(cents ORDER BY day) AS arr FROM firstn
        ), {", ".join(steps)}
        SELECT * FROM (
            SELECT CAST(0 AS BIGINT) AS level, CAST(1 AS BIGINT) AS n_coeffs,
                   CAST(ABS(a[1]) AS BIGINT) AS sum_abs,
                   CAST(ABS(a[1]) AS BIGINT) AS max_abs
            FROM lv{_HAAR_LEVELS}
            UNION ALL {detail_rows}
        ) ORDER BY level
    """


@query(
    "timeseries_haar_wavelet_energy",
    oracle=_haar_oracle(),
    description="Unnormalized Haar wavelet decomposition of the first "
    "64 observed daily-revenue values (exact cents): six levels of "
    "pairwise sums/differences, reporting per-level detail count, "
    "absolute energy, and max coefficient, plus the level-0 final "
    "approximation — the multiresolution fingerprint behind wavelet "
    "compression and scale-localized anomaly detection, integer-exact "
    "because unnormalized Haar needs only +/- (no sqrt(2) "
    "normalization). At 100 TB the only data-scale pass is the day "
    "rollup; every level reads the ONE materialized 64-element base "
    "array directly via block-sum slices (no chained nested "
    "transforms — collapsed-projection lambda aliasing is the planner "
    "trap this structure avoids), and the pyramid-form oracle proves "
    "the block-sum identity.",
)
def timeseries_haar_wavelet_energy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    firstn = (
        daily.withColumn(
            "rn", F.row_number().over(Window.orderBy("day"))
        ).filter(F.col("rn") <= _HAAR_N)
    )
    base = firstn.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "cents"))),
            lambda s: s["cents"],
        ).alias("a")
    )
    # Every Haar level is computed DIRECTLY from the base array as
    # block sums — d_k[i] = sum(block first half) - sum(block second
    # half) — so no chained nested transforms exist (nested
    # higher-order lambdas across collapsed projections alias their
    # lambda variables: the planner trap this structure avoids). The
    # pyramid-form oracle then PROVES the block-sum identity.
    out_rows = []
    for k in range(1, _HAAR_LEVELS + 1):
        half = _HAAR_N >> k
        block = 1 << k
        hb = 1 << (k - 1)

        def blocksum(i, off, width=hb, blk=block):
            return F.aggregate(
                F.slice("a", (i * blk + off).cast("int"), F.lit(width)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )

        d = F.transform(
            F.sequence(F.lit(0), F.lit(half - 1)),
            lambda i: blocksum(i, F.lit(1)) - blocksum(i, F.lit(hb + 1)),
        )
        out_rows.append(
            base.select(
                F.lit(k).cast("long").alias("level"),
                F.lit(half).cast("long").alias("n_coeffs"),
                F.aggregate(
                    F.transform(d, F.abs),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("sum_abs"),
                F.array_max(F.transform(d, F.abs))
                .cast("long")
                .alias("max_abs"),
            )
        )
    total = F.aggregate(
        "a", F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    approx = base.select(
        F.lit(0).cast("long").alias("level"),
        F.lit(1).cast("long").alias("n_coeffs"),
        F.abs(total).cast("long").alias("sum_abs"),
        F.abs(total).cast("long").alias("max_abs"),
    )
    out = approx
    for r in out_rows:
        out = out.unionByName(r)
    return out.orderBy("level")


# -------------------------------------------- greedy max coverage

_COV_K = 3


def _cov_oracle() -> str:
    steps = []
    for i in range(1, _COV_K + 1):
        if i == 1:
            gains = (
                "g1 AS (SELECT source, COUNT(DISTINCT token) AS gain "
                "FROM sets GROUP BY source)"
            )
        else:
            prev_sel = " UNION ALL ".join(
                f"SELECT source FROM sel{j}" for j in range(1, i)
            )
            prev_cov = " UNION ALL ".join(
                f"SELECT token FROM cov{j}" for j in range(1, i)
            )
            # left join keeps zero-gain sources pickable (a saturated
            # universe must not empty the candidate set)
            gains = (
                f"g{i} AS (SELECT src.source, COALESCE(n.gain, 0) AS gain "
                f"FROM (SELECT DISTINCT source FROM sets "
                f"      WHERE source NOT IN ({prev_sel})) src "
                f"LEFT JOIN (SELECT s.source, COUNT(DISTINCT s.token) AS gain "
                f"           FROM sets s ANTI JOIN ({prev_cov}) c USING (token) "
                f"           GROUP BY s.source) n USING (source))"
            )
        steps.append(gains)
        steps.append(
            f"sel{i} AS (SELECT source, CAST(gain AS BIGINT) AS gain, "
            f"CAST({i} AS BIGINT) AS rank FROM g{i} "
            f"ORDER BY gain DESC, source LIMIT 1)"
        )
        steps.append(
            f"cov{i} AS (SELECT DISTINCT s.token FROM sets s "
            f"JOIN sel{i} ON sel{i}.source = s.source)"
        )
    final = " UNION ALL ".join(
        f"SELECT rank, source, gain FROM sel{j}"
        for j in range(1, _COV_K + 1)
    )
    cum = " UNION ALL ".join(
        f"SELECT token FROM cov{j}" for j in range(1, _COV_K + 1)
    )
    return f"""
        WITH sets AS (
            SELECT DISTINCT source, unnest(string_split(text, ' ')) AS token
            FROM documents WHERE text <> ''
        ), {", ".join(steps)}
        SELECT f.rank, f.source, f.gain,
               (SELECT CAST(COUNT(DISTINCT token) AS BIGINT)
                FROM ({cum})) AS total_coverage
        FROM ({final}) f ORDER BY f.rank
    """


@query(
    "selection_greedy_max_coverage",
    oracle=_cov_oracle(),
    description="Greedy maximum-coverage source selection: pick 3 "
    "sources maximizing distinct-token coverage, each step scoring "
    "every remaining source by NEW tokens only (anti-join against the "
    "covered set) and taking the argmax (gain DESC, source ASC) — the "
    "submodular data-subset-selection primitive (1-1/e guarantee) a "
    "training pipeline uses to pick corpus slices under a budget. "
    "Greedy is order-sensitive, so the oracle unrolls the k steps "
    "into chained CTEs; the hash match proves every pick. At 100 TB: "
    "each step is one anti-join on the covered-token set (a shuffle "
    "bounded by vocabulary, not corpus) plus a per-source partial "
    "agg; k 1-row argmax transfers (k bounded by contract); the "
    "(source, token) set table is built once and reused across all "
    "steps.",
)
def selection_greedy_max_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sets = (
        docs.filter(F.col("text") != "")
        .select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .distinct()
        .cache()
    )
    srcs = sets.select("source").distinct().cache()
    picked: list = []
    covered = None
    for rank in range(1, _COV_K + 1):
        remaining = sets
        cand = srcs
        if picked:
            done = [r.source for r in picked]
            remaining = remaining.filter(~F.col("source").isin(done))
            cand = cand.filter(~F.col("source").isin(done))
        if covered is not None:
            remaining = remaining.join(covered, "token", "left_anti")
        # left join keeps zero-gain sources pickable (saturated universe)
        pick = (
            cand.join(
                remaining.groupBy("source").agg(
                    F.countDistinct("token").cast("long").alias("gain")
                ),
                "source",
                "left",
            )
            .select(
                "source", F.coalesce(F.col("gain"), F.lit(0)).alias("gain")
            )
            .orderBy(F.desc("gain"), "source")
            .limit(1)
            .collect()[0]
        )  # 1-row transfer per greedy step (k-bounded)
        picked.append(Row(rank=rank, source=pick.source, gain=int(pick.gain)))
        newcov = sets.filter(F.col("source") == pick.source).select("token")
        covered = (
            newcov
            if covered is None
            else covered.unionByName(newcov).distinct()
        )
    total = covered.distinct().count()
    sets.unpersist()
    srcs.unpersist()
    return spark.createDataFrame(
        [
            Row(
                rank=r.rank,
                source=r.source,
                gain=r.gain,
                total_coverage=total,
            )
            for r in picked
        ],
        schema="rank long, source string, gain long, total_coverage long",
    ).orderBy("rank")
