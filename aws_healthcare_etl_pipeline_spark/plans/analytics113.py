"""Wave-139 (round 5): HDR-histogram quantile audit + rank-biased
overlap.

* ``approx_hdr_histogram_quantile_audit`` — the observability
  workhorse (HdrHistogram / Prometheus-style log buckets), audited
  against exact truth: order values bucket into (msb, 4-bit
  mantissa) bins via a generated power-of-two CASE ladder (zero
  floating point, shared text in both engines), p50/p90/p99 are
  estimated from bucket upper bounds by cumulative-count rank
  selection and compared to the exact rank-selected quantiles —
  the HDR relative-error guarantee (<= 1/16 here), measured.
* ``search_rbo_rank_overlap`` — rank-biased overlap (p = 1/2)
  between the revenue and quantity top-16 rankings: geometric
  weights are exact powers of two, per-depth agreement A_d =
  overlap/d is micro-quantized by exact division, and the sum is
  the standard 'how similar are two rankers' score that pairs
  with the RRF fusion lane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.cumsum import distributed_running_total
from ..sources.tables import load_table
from .registry import query

# ---------------------------------------- HDR histogram audit

_MANT_BITS = 4  # 16 sub-buckets per power of two: rel. err <= 1/16


def _msb_ladder(x: str, max_bit: int = 40) -> str:
    """floor(log2(x)) for x >= 1 as a CASE ladder, shared SQL text."""
    cases = [
        f"WHEN {x} >= {1 << b} THEN {b}"
        for b in range(max_bit, 0, -1)
    ]
    return "CASE " + " ".join(cases) + " ELSE 0 END"


def _hdr_bucket(x: str, idiv: str = "//") -> str:
    """(msb, mantissa) -> ordered bucket id; x >= 1.

    ``idiv`` is the integer-division token: ``//`` for DuckDB,
    ``div`` for Spark (the one dialect split in the shared text).
    """
    msb = _msb_ladder(x)
    return (
        f"(({msb}) * {1 << _MANT_BITS}"
        f" + CASE WHEN ({msb}) >= {_MANT_BITS}"
        f" THEN ({x} {idiv} (1 << (({msb}) - {_MANT_BITS})))"
        f" % {1 << _MANT_BITS} ELSE 0 END)"
    )


def _hdr_upper(b: str, idiv: str = "//") -> str:
    """Upper value bound of bucket id b (exclusive-ish estimate)."""
    msb = f"({b} {idiv} {1 << _MANT_BITS})"
    man = f"({b} % {1 << _MANT_BITS})"
    return (
        f"CASE WHEN {msb} >= {_MANT_BITS} THEN"
        f" ((1 << {_MANT_BITS}) + {man} + 1)"
        f" * (1 << ({msb} - {_MANT_BITS})) - 1"
        f" ELSE (1 << ({msb} + 1)) - 1 END"
    )


@query(
    "approx_hdr_histogram_quantile_audit",
    oracle=f"""
        WITH vals AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS v
            FROM orders
        ), hdr AS (
            SELECT {_hdr_bucket("v")} AS b,
                   CAST(COUNT(*) AS BIGINT) AS h
            FROM vals GROUP BY 1
        ), hcum AS (
            SELECT b, h,
                   CAST(SUM(h) OVER (ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS ci
            FROM hdr
        ), vh AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS h FROM vals GROUP BY v
        ), vcum AS (
            SELECT v, CAST(SUM(h) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS ci
            FROM vh
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals
        ), q(tag, num, den) AS (
            VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)
        )
        SELECT q.tag,
               (SELECT MIN(v) FROM vcum, tot
                WHERE ci * q.den >= q.num * tot.n) AS exact_cents,
               (SELECT CAST({_hdr_upper("MIN(b)")} AS BIGINT)
                FROM (SELECT b FROM hcum, tot
                      WHERE ci * q.den >= q.num * tot.n)
                ) AS hdr_estimate_cents,
               CAST(abs((SELECT CAST({_hdr_upper("MIN(b)")} AS BIGINT)
                         FROM (SELECT b FROM hcum, tot
                               WHERE ci * q.den >= q.num * tot.n))
                        - (SELECT MIN(v) FROM vcum, tot
                           WHERE ci * q.den >= q.num * tot.n)) * 1000
                    // (SELECT MIN(v) FROM vcum, tot
                        WHERE ci * q.den >= q.num * tot.n) AS BIGINT)
                   AS rel_err_permille
        FROM q ORDER BY tag
    """,
    description="HDR-histogram quantile accuracy, audited: order "
    "values land in (msb x 16-mantissa) log buckets via a generated "
    "power-of-two CASE ladder — the HdrHistogram/Prometheus scheme, "
    "zero floating point, identical text in both engines — and "
    "p50/p90/p99 estimated from bucket upper bounds by cumulative-"
    "count rank selection sit next to the EXACT rank-selected "
    "quantiles with the relative error in permille, which must "
    "respect the scheme's <= 1/16 guarantee (the invariant the "
    "observability stack silently relies on). 100 TB shape: the "
    "HDR histogram is one partial-agg shuffle into a few hundred "
    "bounded buckets — this is why latency dashboards can afford "
    "quantiles at all — while the exact side reuses the repo's "
    "value-histogram rank machinery for the audit.",
)
def approx_hdr_histogram_quantile_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    vals = orders.select(
        (F.col("o_totalprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("v")
    )
    hdr = vals.groupBy(F.expr(_hdr_bucket("v", "div")).alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("h")
    )
    # bounded bucket spine: ordered window OK
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    hcum = hdr.select(
        "b", F.sum("h").over(wb).cast("long").alias("ci")
    ).localCheckpoint(eager=False)
    vh = vals.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("h"))
    vcum = distributed_running_total(
        vh.withColumn("vb", F.expr("v div 1048576")),
        F.col("h"),
        "vb",
        ["v"],
        out_col="ci",
        zero=F.lit(0).cast("bigint"),
    ).localCheckpoint(eager=False)
    tot = vals.agg(F.count(F.lit(1)).cast("long").alias("n"))
    qs = spark.createDataFrame(
        [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)],
        "tag string, num long, den long",
    )
    exact = (
        qs.crossJoin(F.broadcast(tot))
        .join(vcum, F.col("ci") * F.col("den") >= F.col("num") * F.col("n"))
        .groupBy("tag")
        .agg(F.min("v").alias("exact_cents"))
    )
    est = (
        qs.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(hcum),
            F.col("ci") * F.col("den") >= F.col("num") * F.col("n"),
        )
        .groupBy("tag")
        .agg(F.min("b").alias("bmin"))
        .select(
            "tag",
            F.expr(f"CAST({_hdr_upper('bmin', 'div')} AS LONG)").alias(
                "hdr_estimate_cents"
            ),
        )
    )
    return (
        exact.join(est, "tag")
        .select(
            "tag",
            "exact_cents",
            "hdr_estimate_cents",
            F.expr(
                "CAST(abs(hdr_estimate_cents - exact_cents) * 1000"
                " div exact_cents AS LONG)"
            ).alias("rel_err_permille"),
        )
        .orderBy("tag")
    )


# ------------------------------------------- rank-biased overlap

_RBO_K = 16


@query(
    "search_rbo_rank_overlap",
    oracle=f"""
        WITH stats AS (
            SELECT l_partkey AS pk,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS rev,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem GROUP BY 1
        ), ra AS (
            SELECT pk, ROW_NUMBER() OVER (ORDER BY rev DESC, pk) AS r
            FROM stats QUALIFY r <= {_RBO_K}
        ), rb AS (
            SELECT pk, ROW_NUMBER() OVER (ORDER BY qty DESC, pk) AS r
            FROM stats QUALIFY r <= {_RBO_K}
        ), depths AS (
            SELECT d.d,
                   CAST((SELECT COUNT(*) FROM ra, rb
                         WHERE ra.pk = rb.pk AND ra.r <= d.d
                           AND rb.r <= d.d) AS BIGINT) AS overlap
            FROM (SELECT unnest(range(1, {_RBO_K} + 1)) AS d) d
        )
        SELECT CAST({_RBO_K} AS BIGINT) AS k,
               CAST(SUM(overlap * 1000000 // (d * (1 << d)))
                    AS BIGINT) AS rbo_micro_x2,
               CAST(MAX(CASE WHEN d = {_RBO_K} THEN overlap END)
                    AS BIGINT) AS overlap_at_k
        FROM depths
    """,
    description="Rank-biased overlap (p = 1/2) between the revenue "
    "and quantity top-16 part rankings — the principled 'how "
    "similar are two rankers' measure that weights agreement at "
    "the top geometrically, the companion diagnostic to the RRF "
    "fusion lane (fuse rankers when RBO is low, dedupe them when "
    "high). With p = 1/2 the weights are exact powers of two "
    "(shiftleft — the repo's lambda-1/2 idiom), per-depth "
    "agreement overlap/d quantizes by exact integer division, and "
    "the reported score is 2/p-scaled micro (x2 absorbs the (1-p) "
    "normalizer). Top-k extraction is TakeOrdered, the depth "
    "table is a bounded 16-row spine, overlap counting a bounded "
    "join. 100 TB shape: one part-grain aggregate, then constant "
    "work.",
)
def search_rbo_rank_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    line = load_table(spark, sf_dir, "lineitem")
    stats = line.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("rev"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
    ).localCheckpoint(eager=False)
    ra = (
        stats.orderBy(F.col("rev").desc(), "pk")
        .limit(_RBO_K)
        .select(
            "pk",
            F.row_number()
            .over(Window.orderBy(F.col("rev").desc(), "pk"))
            .alias("ra_r"),
        )
    )
    rb = (
        stats.orderBy(F.col("qty").desc(), "pk")
        .limit(_RBO_K)
        .select(
            "pk",
            F.row_number()
            .over(Window.orderBy(F.col("qty").desc(), "pk"))
            .alias("rb_r"),
        )
    )
    both = ra.join(rb, "pk")  # bounded 16x16
    depths = (
        both.crossJoin(
            F.broadcast(
                ra.select(
                    F.explode(
                        F.sequence(F.lit(1), F.lit(_RBO_K))
                    ).alias("d")
                ).distinct()
            )
        )
        .where((F.col("ra_r") <= F.col("d")) & (F.col("rb_r") <= F.col("d")))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
    )
    full = (
        spark.range(1, _RBO_K + 1)
        .select(F.col("id").alias("d"))
        .join(depths, "d", "left")
        .select(
            "d", F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap")
        )
    )
    return full.agg(
        F.lit(_RBO_K).cast("long").alias("k"),
        F.sum(
            F.expr("overlap * 1000000 div (d * shiftleft(1, d))")
        )
        .cast("long")
        .alias("rbo_micro_x2"),
        F.max(
            F.when(F.col("d") == _RBO_K, F.col("overlap"))
        )
        .cast("long")
        .alias("overlap_at_k"),
    )
