"""Wave-116 (round 5): exact DTW + delta/varint encoding economics.

* ``timeseries_dtw_monthly`` — dynamic time warping between
  consecutive years' 12-month revenue curves, the alignment-aware
  distance that tolerates seasonal shift where L1 does not. The
  12x12 DP lattice is UNROLLED into 12 generated column-set steps
  (d_i_j = |x_j - y_i| + min(up, left, diag)) whose expression TEXT
  is generated once and compiled by BOTH engines — no recursion,
  no lists, every cell an exact cent integer. L1 distance rides
  along for contrast.
* ``layout_delta_varint_economics`` — the storage-engine estimator
  behind every integer codec choice: delta-encode the sorted
  distinct order keys and price the deltas as LEB128 varints
  (7-bit groups). The Spark side computes lags WITHOUT a global
  window via the bucketed-lag decomposition: lag inside
  key-div-2^20 bucket partitions plus a boundary stitch joining
  each bucket's min to the previous bucket's max over the bounded
  bucket spine. The oracle is the textbook single-window form —
  the hash match PROVES the distributed decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------------ DTW

_MONTHS = 12
_PAIR_YEARS = (1996, 1997, 1998, 1999)  # (y, y+1) pairs, all full years


def _dtw_step_exprs(i: int) -> list[str]:
    """Column definitions for DP row i (1-based), shared SQL text.

    Expects columns x1..x12 (year a), y1..y12 (year b) and, for
    i > 1, the previous row p1..p12; emits c1..c12.
    """
    outs = []
    for j in range(1, _MONTHS + 1):
        cost = f"abs(x{j} - y{i})"
        if i == 1 and j == 1:
            e = cost
        elif i == 1:
            e = f"{cost} + c{j - 1}"
        elif j == 1:
            e = f"{cost} + p1"
        else:
            e = f"{cost} + least(p{j}, c{j - 1}, p{j - 1})"
        outs.append(f"({e}) AS c{j}")
    return outs


def _dtw_oracle() -> str:
    months = ", ".join(
        f"CAST(SUM(CASE WHEN m = {m} THEN v ELSE 0 END) AS BIGINT)"
        f" AS m{m}"
        for m in range(1, _MONTHS + 1)
    )
    xy = ", ".join(
        f"a.m{m} AS x{m}, b.m{m} AS y{m}" for m in range(1, _MONTHS + 1)
    )
    l1 = " + ".join(f"abs(x{m} - y{m})" for m in range(1, _MONTHS + 1))
    steps = []
    prev = "base"
    carry = "year_a, year_b, " + ", ".join(
        f"x{j}, y{j}" for j in range(1, _MONTHS + 1)
    )
    for i in range(1, _MONTHS + 1):
        rename = (
            ""
            if i == 1
            else ", " + ", ".join(
                f"c{j} AS p{j}" for j in range(1, _MONTHS + 1)
            )
        )
        cols = ",\n                   ".join(_dtw_step_exprs(i))
        steps.append(
            f"s{i} AS (SELECT {carry},\n"
            f"                   {cols}\n"
            f"            FROM (SELECT {carry}{rename} FROM {prev}))"
        )
        prev = f"s{i}"
    return f"""
        WITH yearly AS (
            SELECT EXTRACT(year FROM o_orderdate) AS yr,
                   EXTRACT(month FROM o_orderdate) AS m,
                   CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS v
            FROM orders
        ), pivoted AS (
            SELECT yr, {months} FROM yearly GROUP BY yr
        ), base AS (
            SELECT a.yr AS year_a, b.yr AS year_b, {xy}
            FROM pivoted a JOIN pivoted b ON b.yr = a.yr + 1
            WHERE a.yr IN {_PAIR_YEARS}
        ), {", ".join(steps)}
        SELECT CAST(year_a AS BIGINT) AS year_a,
               CAST(year_b AS BIGINT) AS year_b,
               CAST(c{_MONTHS} AS BIGINT) AS dtw_cents,
               CAST({l1} AS BIGINT) AS l1_cents
        FROM s{_MONTHS}
        ORDER BY year_a
    """


@query(
    "timeseries_dtw_monthly",
    oracle=_dtw_oracle(),
    description="Exact dynamic time warping between consecutive "
    "years' monthly revenue curves: the 12x12 DP lattice "
    "d(i,j) = |x_j - y_i| + min(up, left, diag) runs as a nested "
    "integer F.aggregate fold over the month arrays (the oracle "
    "replays it as 12 unrolled projection CTEs — identical exact "
    "cent lattice, no recursion, no UDF) — with plain L1 distance "
    "alongside to show what alignment tolerance buys. The r10 form "
    "unrolled the 12 steps as chained generated projections, which "
    "CollapseProject merged into exponentially nested expression "
    "text (144 KB plan, re-optimized per run, 4-5s warm for 4 "
    "rows); the fold is one constant-size expression. 100 TB "
    "shape: one partial-agg shuffle to the bounded (year x month) "
    "grain; the DP folds on a 4-row table, free at any fact "
    "volume.",
)
def timeseries_dtw_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = orders.groupBy(
        F.year("o_orderdate").alias("yr")
    ).agg(
        *[
            F.sum(
                F.when(
                    F.month("o_orderdate") == m,
                    F.col("o_totalprice").cast("decimal(15,2)") * 100,
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias(f"m{m}")
            for m in range(1, _MONTHS + 1)
        ]
    ).localCheckpoint(eager=False)  # bounded year grain; self-joined
    a = pivoted.select(
        F.col("yr").alias("year_a"),
        *[F.col(f"m{m}").alias(f"x{m}") for m in range(1, _MONTHS + 1)],
    ).where(F.col("year_a").isin(*_PAIR_YEARS))
    b = pivoted.select(
        (F.col("yr") - 1).alias("year_a"),
        F.col("yr").alias("year_b"),
        *[F.col(f"m{m}").alias(f"y{m}") for m in range(1, _MONTHS + 1)],
    )
    # r11: the DP as a nested F.aggregate fold over month ARRAYS
    # instead of 12 chained generated projections. CollapseProject
    # merged those 12 steps into exponentially nested expressions
    # (144 KB of plan text) that catalyst re-optimized on every run —
    # 4-5s warm for a 4-row relation. The fold is one constant-size
    # expression walking the identical integer lattice
    # c[i][j] = |x_j - y_i| + min(up, left, diag), so dtw_cents is
    # bit-identical to the oracle's unrolled CTE replay. xs/ys are
    # materialized attributes per the HOF-lambda capture contract.
    row = a.join(b, "year_a").select(
        "year_a",
        "year_b",
        F.array(*[F.col(f"x{m}") for m in range(1, _MONTHS + 1)]).alias("xs"),
        F.array(*[F.col(f"y{m}") for m in range(1, _MONTHS + 1)]).alias("ys"),
    )
    xs, ys = F.col("xs"), F.col("ys")
    months_tail = F.sequence(F.lit(2), F.lit(_MONTHS))

    def cost(j, i):
        return F.abs(F.element_at(xs, j) - F.element_at(ys, i))

    init = F.aggregate(
        months_tail,
        F.array(cost(F.lit(1), F.lit(1))),
        lambda acc, j: F.concat(
            acc, F.array(cost(j, F.lit(1)) + F.element_at(acc, -1))
        ),
    )
    dp = F.aggregate(
        months_tail,
        init,
        lambda p, i: F.aggregate(
            months_tail,
            F.array(F.element_at(p, 1) + cost(F.lit(1), i)),
            lambda c, j: F.concat(
                c,
                F.array(
                    cost(j, i)
                    + F.least(
                        F.element_at(p, j),
                        F.element_at(c, -1),
                        F.element_at(p, j - 1),
                    )
                ),
            ),
        ),
    )
    l1 = F.aggregate(
        F.zip_with(xs, ys, lambda x, y: F.abs(x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )
    return row.select(
        F.col("year_a").cast("long").alias("year_a"),
        F.col("year_b").cast("long").alias("year_b"),
        F.element_at(dp, _MONTHS).cast("long").alias("dtw_cents"),
        l1.cast("long").alias("l1_cents"),
    ).orderBy("year_a")


# ------------------------------------- delta/varint economics

_BUCKET = 1 << 20  # order-preserving key buckets for distributed lag


def _varint_bytes(delta: str) -> str:
    """LEB128 byte count for a positive integer, shared SQL text."""
    return (
        f"CASE WHEN {delta} < 128 THEN 1 "
        f"WHEN {delta} < 16384 THEN 2 "
        f"WHEN {delta} < 2097152 THEN 3 "
        f"WHEN {delta} < 268435456 THEN 4 "
        f"WHEN {delta} < 34359738368 THEN 5 "
        f"WHEN {delta} < 4398046511104 THEN 6 "
        f"WHEN {delta} < 562949953421312 THEN 7 "
        f"WHEN {delta} < 72057594037927936 THEN 8 ELSE 9 END"
    )


@query(
    "layout_delta_varint_economics",
    oracle=f"""
        WITH keys AS (
            SELECT DISTINCT o_orderkey AS k FROM orders
        ), deltas AS (
            SELECT k,
                   k - COALESCE(lag(k) OVER (ORDER BY k), 0) AS d
            FROM keys
        ), sized AS (
            SELECT d, {_varint_bytes("d")} AS nbytes FROM deltas
        )
        SELECT nbytes,
               CAST(COUNT(*) AS BIGINT) AS n_deltas,
               CAST(SUM(nbytes) AS BIGINT) AS encoded_bytes,
               CAST(COUNT(*) * 8 AS BIGINT) AS raw_bytes,
               CAST((COUNT(*) * 8 - SUM(nbytes)) * 1000
                    // (COUNT(*) * 8) AS BIGINT) AS savings_permille
        FROM sized GROUP BY nbytes ORDER BY nbytes
    """,
    description="Delta + LEB128-varint encoding economics for the "
    "sorted order-key column — the estimator behind every integer "
    "codec decision (Parquet DELTA_BINARY_PACKED, Lucene postings): "
    "per varint byte-class, how many deltas land there and what the "
    "encoded vs raw-int64 byte cost is. The Spark side computes the "
    "lag WITHOUT a global window: lag() runs inside key-div-2^20 "
    "bucket partitions (a parallel shuffle), and each bucket's "
    "FIRST delta is stitched by joining the bucket's min key to the "
    "previous bucket's max over the BOUNDED bucket spine — the "
    "repo's two-level carry idea applied to lag. The oracle is the "
    "textbook single-window form, so the hash match PROVES the "
    "distributed decomposition row-for-row. At 100 TB the global-"
    "window version dies on one task; this one is one hash shuffle "
    "plus spine algebra.",
)
def layout_delta_varint_economics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.select(F.col("o_orderkey").alias("k")).distinct()
    kb = keys.withColumn("vb", F.expr(f"k div {_BUCKET}"))
    # in-bucket lag: partitioned window (parallel, sorts per bucket)
    wb = Window.partitionBy("vb").orderBy("k")
    inbucket = kb.withColumn("prev_k", F.lag("k").over(wb))
    # boundary stitch: previous bucket's max over the bounded spine
    bstats = kb.groupBy("vb").agg(F.max("k").alias("bmax"))
    wspine = Window.orderBy("vb")  # bounded bucket spine
    prevmax = bstats.select(
        "vb", F.lag("bmax").over(wspine).alias("prev_bmax")
    )
    deltas = (
        inbucket.join(F.broadcast(prevmax), "vb")
        .select(
            (
                F.col("k")
                - F.coalesce(
                    F.col("prev_k"),
                    F.col("prev_bmax"),
                    F.lit(0),
                )
            ).alias("d")
        )
    )
    sized = deltas.select(
        "d", F.expr(_varint_bytes("d")).cast("int").alias("nbytes")
    )
    return (
        sized.groupBy("nbytes")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_deltas"),
            F.sum("nbytes").cast("long").alias("encoded_bytes"),
        )
        .select(
            "nbytes",
            "n_deltas",
            "encoded_bytes",
            (F.col("n_deltas") * 8).cast("long").alias("raw_bytes"),
            F.expr(
                "CAST((n_deltas * 8 - encoded_bytes) * 1000"
                " div (n_deltas * 8) AS LONG)"
            ).alias("savings_permille"),
        )
        .orderBy("nbytes")
    )
