"""Wave-88 (round 5): robust fitting without randomness + encoding
economics.

* ``regression_ransac_deterministic`` — RANSAC made deterministic
  and engine-portable: candidate lines are drawn through md5-chosen
  point pairs of the daily value series (md5 is the one cross-engine
  hash), and the inlier test avoids ALL division — a point (x, y) is
  an inlier of the line through (x1,y1),(x2,y2) iff
  |(y - y1)(x2 - x1) - (y2 - y1)(x - x1)| <= tol * (x2 - x1),
  pure integer cross-multiplication. The candidate with the most
  inliers wins (tie: lowest candidate id) — the outlier-immune trend
  fit that least-squares cannot give when a spike day drags the
  line.
* ``layout_dictionary_encoding_economics`` — per-column dictionary
  encoding economics across four low-cardinality string columns:
  raw bytes vs (dictionary bytes + n * ceil(log2(ndv)) code bits),
  the decision audit behind parquet dictionary-page choices, with
  the bit width computed by an integer CASE ladder (no log2).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ------------------------------------------- deterministic RANSAC

_RANSAC_CANDIDATES = 8
_RANSAC_TOL_MILLIS = 3_000_000  # inlier band: +/- 3000 value units


@query(
    "regression_ransac_deterministic",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_diff('day', DATE '1990-01-01',
                                  CAST(ts AS DATE)) AS BIGINT) AS x,
                   CAST(SUM(CAST(floor(value * 1000) AS BIGINT))
                        AS BIGINT) AS y
            FROM events GROUP BY 1
        ), pts AS (
            SELECT x, y,
                   ROW_NUMBER() OVER (ORDER BY md5(CAST(x AS VARCHAR)), x)
                       AS hrk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM daily
        ), cand AS (
            SELECT a.cid, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
            FROM (SELECT hrk AS cid, x, y FROM pts
                  WHERE hrk <= {_RANSAC_CANDIDATES}) a
            JOIN (SELECT hrk - (SELECT MAX(n) FROM pts)
                         + {_RANSAC_CANDIDATES} AS cid, x, y
                  FROM pts
                  WHERE hrk > (SELECT MAX(n) FROM pts)
                             - {_RANSAC_CANDIDATES}) b
              ON a.cid = b.cid AND a.x <> b.x
        ), scored AS (
            SELECT c.cid, c.x1, c.y1, c.x2, c.y2,
                   CAST(SUM(CASE WHEN
                       abs((d.y - c.y1) * (c.x2 - c.x1)
                           - (c.y2 - c.y1) * (d.x - c.x1))
                       <= {_RANSAC_TOL_MILLIS} * abs(c.x2 - c.x1)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers,
                   CAST(COUNT(*) AS BIGINT) AS n_points
            FROM cand c CROSS JOIN daily d
            GROUP BY c.cid, c.x1, c.y1, c.x2, c.y2
        ), best AS (
            SELECT MIN(cid) AS win_cid FROM scored
            WHERE n_inliers = (SELECT MAX(n_inliers) FROM scored)
        )
        SELECT s.cid, s.x1, s.y1, s.x2, s.y2, s.n_inliers, s.n_points,
               CAST(CASE WHEN s.cid = b.win_cid THEN 1 ELSE 0 END
                    AS BIGINT) AS is_winner
        FROM scored s CROSS JOIN best b
        ORDER BY s.cid
    """,
    description="Deterministic RANSAC over the daily value series: "
    "8 candidate lines are anchored by md5-ranked point pairs (the "
    "hash draw replaces the RNG, so the 'random' sample is portable "
    "and reproducible), and the inlier test is division-free integer "
    "cross-multiplication |(y-y1)(x2-x1) - (y2-y1)(x-x1)| <= "
    "tol*|x2-x1| — the outlier-immune consensus fit least-squares "
    "can't provide when spike days drag the line. Most inliers wins, "
    "lowest candidate id on ties. Scale: the series collapses to "
    "day grain first; candidates are a fixed-size broadcast side, "
    "so scoring is one map-side pass over the spine — candidates x "
    "days, never days x days.",
)
def regression_ransac_deterministic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1990-01-01").cast("date"))
        .cast("long")
        .alias("x")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("y")
    ).localCheckpoint(eager=False)  # feeds ranking and scoring
    from pyspark.sql import Window

    w = Window.orderBy(F.md5(F.col("x").cast("string")), F.col("x"))
    pts = daily.select(
        "x",
        "y",
        F.row_number().over(w).alias("hrk"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n"),
    )
    a = pts.filter(F.col("hrk") <= _RANSAC_CANDIDATES).select(
        F.col("hrk").alias("cid"), F.col("x").alias("x1"), F.col("y").alias("y1")
    )
    b = pts.filter(
        F.col("hrk") > F.col("n") - _RANSAC_CANDIDATES
    ).select(
        (F.col("hrk") - F.col("n") + _RANSAC_CANDIDATES).alias("cid"),
        F.col("x").alias("x2"),
        F.col("y").alias("y2"),
    )
    cand = a.join(F.broadcast(b), "cid").filter(F.col("x1") != F.col("x2"))
    scored = (
        daily.crossJoin(F.broadcast(cand))
        .groupBy("cid", "x1", "y1", "x2", "y2")
        .agg(
            F.sum(
                (
                    F.abs(
                        (F.col("y") - F.col("y1")) * (F.col("x2") - F.col("x1"))
                        - (F.col("y2") - F.col("y1"))
                        * (F.col("x") - F.col("x1"))
                    )
                    <= _RANSAC_TOL_MILLIS
                    * F.abs(F.col("x2") - F.col("x1"))
                ).cast("long")
            )
            .cast("long")
            .alias("n_inliers"),
            F.count(F.lit(1)).cast("long").alias("n_points"),
        )
        .localCheckpoint(eager=False)  # feeds the winner agg + final select
    )
    best = scored.agg(F.max("n_inliers").alias("mx")).join(
        scored.select("cid", "n_inliers"), F.col("mx") == F.col("n_inliers")
    ).agg(F.min("cid").alias("win_cid"))
    return (
        scored.crossJoin(F.broadcast(best))
        .select(
            "cid",
            "x1",
            "y1",
            "x2",
            "y2",
            "n_inliers",
            "n_points",
            (F.col("cid") == F.col("win_cid")).cast("long").alias("is_winner"),
        )
        .orderBy("cid")
    )


# ---------------------------------------- dictionary encoding economics

_DICT_COLS = (
    ("customer", "c_mktsegment"),
    ("orders", "o_orderpriority"),
    ("events", "event_type"),
    ("documents", "source"),
)
_BITS_LADDER_MAX = 24


def _bits_case(ndv_expr: str) -> str:
    """Smallest b with 2^b >= ndv, as an integer CASE ladder."""
    whens = " ".join(
        f"WHEN {ndv_expr} <= {1 << b} THEN {b}"
        for b in range(1, _BITS_LADDER_MAX + 1)
    )
    return f"(CASE {whens} ELSE {_BITS_LADDER_MAX + 1} END)"


def _dict_oracle() -> str:
    parts = []
    for table, col in _DICT_COLS:
        parts.append(f"""
        SELECT '{table}.{col}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
               CAST(SUM(strlen({col})) AS BIGINT) AS raw_bytes
        FROM {table}""")
    unions = "\nUNION ALL\n".join(parts)
    dict_parts = []
    for table, col in _DICT_COLS:
        dict_parts.append(f"""
        SELECT '{table}.{col}' AS column_name,
               CAST(SUM(strlen(v)) AS BIGINT) AS dict_bytes
        FROM (SELECT DISTINCT {col} AS v FROM {table})""")
    dict_unions = "\nUNION ALL\n".join(dict_parts)
    bits = _bits_case("s.n_distinct")
    return f"""
        WITH stats AS ({unions}),
        dicts AS ({dict_unions})
        SELECT s.column_name, s.n_rows, s.n_distinct, s.raw_bytes,
               d.dict_bytes,
               CAST({bits} AS BIGINT) AS code_bits,
               CAST(d.dict_bytes + (s.n_rows * {bits} + 7) // 8
                    AS BIGINT) AS encoded_bytes,
               CAST(((d.dict_bytes + (s.n_rows * {bits} + 7) // 8) * 1000)
                    // s.raw_bytes AS BIGINT) AS encoded_permille
        FROM stats s JOIN dicts d ON d.column_name = s.column_name
        ORDER BY s.column_name
    """


@query(
    "layout_dictionary_encoding_economics",
    oracle=_dict_oracle(),
    description="Dictionary-encoding economics for four low-"
    "cardinality string columns across four tables: raw bytes vs "
    "dictionary bytes plus n * ceil(log2(ndv)) code bits (bit width "
    "via an integer CASE ladder — no log2 enters either engine), "
    "reported as encoded/raw integer permille — the decision audit "
    "behind parquet dictionary pages and the first thing to check "
    "when a 100 TB table's scan cost surprises (a 'low-cardinality' "
    "column that drifted to high NDV silently turns dictionary "
    "pages off). Scale: each column is one map-side-combined "
    "aggregate plus a distinct-grain dictionary sum; columns union "
    "into a four-row report.",
)
def layout_dictionary_encoding_economics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    outs = []
    for table, col in _DICT_COLS:
        df = load_table(spark, sf_dir, table)
        stats = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct(col).cast("long").alias("n_distinct"),
            F.sum(F.octet_length(col)).cast("long").alias("raw_bytes"),
        )
        dicts = (
            df.select(F.col(col).alias("v"))
            .distinct()
            .agg(F.sum(F.octet_length("v")).cast("long").alias("dict_bytes"))
        )
        outs.append(
            stats.crossJoin(F.broadcast(dicts)).select(
                F.lit(f"{table}.{col}").alias("column_name"),
                "n_rows",
                "n_distinct",
                "raw_bytes",
                "dict_bytes",
            )
        )
    merged = reduce(DataFrame.unionByName, outs)
    bits = _bits_case("n_distinct")
    return merged.selectExpr(
        "column_name",
        "n_rows",
        "n_distinct",
        "raw_bytes",
        "dict_bytes",
        f"CAST({bits} AS BIGINT) AS code_bits",
        f"CAST(dict_bytes + (n_rows * {bits} + 7) div 8 AS BIGINT)"
        " AS encoded_bytes",
        f"CAST(((dict_bytes + (n_rows * {bits} + 7) div 8) * 1000)"
        " div raw_bytes AS BIGINT) AS encoded_permille",
    ).orderBy("column_name")
