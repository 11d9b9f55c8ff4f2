"""Wave-166 (round 5): corpus rank-frequency law + market microprice.

* ``text_zipf_bigram_buckets`` — the Zipf rank-frequency audit over
  document BIGRAMS (the unigram vocabulary is bounded, so bigrams
  give the law room to show): global frequency ranks live on the
  bounded bigram-vocabulary table (size <= |V|^2, data-independent),
  bucketed by power-of-two rank bands; each band emits type counts,
  token mass, and frequency extrema — the curve a corpus card plots.

* ``finance_vwap_divergence`` — volume-weighted vs unweighted average
  unit price per brand, the standard market-microstructure sanity
  check (a gap means big lots trade at different unit prices than
  small lots). All permille-quantized integer cents with truncating
  division applied IDENTICALLY in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import query


def _bucket_case(var: str, kmax: int) -> str:
    """Power-of-two band: k such that var in [2^k, 2^(k+1))."""
    branches = " ".join(
        f"WHEN {var} >= {1 << k} THEN {k}" for k in range(kmax, -1, -1)
    )
    return f"(CASE {branches} END)"


@query(
    "text_zipf_bigram_buckets",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, len(arr) + 1),
                          i -> {{'pos': i, 'tok': arr[i]}}),
                          recursive := true)
            FROM (SELECT doc_id,
                         regexp_split_to_array(trim(text), '\s+') AS arr
                  FROM documents)
        ), bigrams AS (
            SELECT concat(tok, ' ',
                   LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos))
                       AS bg
            FROM toks
        ), freqs AS (
            SELECT bg, CAST(COUNT(*) AS BIGINT) AS f
            FROM bigrams WHERE bg IS NOT NULL
              AND NOT bg LIKE '% '
            GROUP BY bg
        ), ranked AS (
            SELECT f,
                   ROW_NUMBER() OVER (ORDER BY f DESC, bg) AS rnk
            FROM freqs
        )
        SELECT {_bucket_case("rnk", 24)} AS rank_band,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(f) AS BIGINT) AS token_mass,
               CAST(MAX(f) AS BIGINT) AS max_freq,
               CAST(MIN(f) AS BIGINT) AS min_freq
        FROM ranked
        GROUP BY 1
        ORDER BY 1
    """,
    description="Zipf rank-frequency audit over document BIGRAMS: "
    "frequency ranks (freq DESC, bigram tie-break) land in power-of-"
    "two rank bands [2^k, 2^(k+1)); each band reports type count, "
    "token mass, and frequency extrema — the rank-frequency curve "
    "every corpus card plots, in exact integers. The global rank "
    "window runs on the bigram VOCABULARY table, whose size is "
    "bounded by |V|^2 independent of corpus size — the bounded-"
    "spine exception, documented — while the corpus-sized work is "
    "one explode + one partitioned lead + one count shuffle. 100 TB "
    "shape: vocabulary grows sublinearly (Heaps), the count shuffle "
    "is partial-agg friendly, and the band output is ~24 rows no "
    "matter the scale — the language-model data diet check.",
)
def text_zipf_bigram_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = toks.select(
        F.concat(
            F.col("tok"), F.lit(" "), F.lead("tok").over(w)
        ).alias("bg")
    )
    freqs = (
        bigrams.where(F.col("bg").isNotNull())
        .groupBy("bg")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    # bounded spine: bigram vocabulary (<= |V|^2), documented safe
    rw = Window.orderBy(F.col("f").desc(), F.col("bg"))
    ranked = freqs.select(
        "f", F.row_number().over(rw).alias("rnk")
    )
    return (
        ranked.groupBy(
            F.expr(_bucket_case("rnk", 24)).alias("rank_band")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("f").cast("long").alias("token_mass"),
            F.max("f").cast("long").alias("max_freq"),
            F.min("f").cast("long").alias("min_freq"),
        )
        .orderBy("rank_band")
    )


@query(
    "finance_vwap_divergence",
    oracle="""
        WITH lines AS (
            SELECT p.p_brand AS brand,
                   CAST(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100
                        AS BIGINT) AS ext_cents,
                   CAST(l.l_quantity AS BIGINT) AS qty
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        ), per_brand AS (
            SELECT brand,
                   CAST(COUNT(*) AS BIGINT) AS n_trades,
                   CAST(SUM(qty) AS BIGINT) AS total_qty,
                   CAST(SUM(ext_cents) AS BIGINT) AS total_cents,
                   CAST(SUM((ext_cents * 1000) // qty) AS BIGINT)
                       AS unit_pm_sum
            FROM lines GROUP BY brand
        )
        SELECT brand, n_trades, total_qty,
               CAST((total_cents * 1000) // total_qty AS BIGINT)
                   AS vwap_permille_cents,
               CAST(unit_pm_sum // n_trades AS BIGINT)
                   AS mean_unit_permille_cents,
               CAST((total_cents * 1000) // total_qty
                    - unit_pm_sum // n_trades AS BIGINT)
                   AS divergence_permille_cents
        FROM per_brand
        ORDER BY brand
    """,
    description="VWAP vs unweighted mean unit price per brand — the "
    "market-microstructure check that flags when large lots trade "
    "at systematically different unit prices than small lots "
    "(negative divergence = volume discount). Unit prices are "
    "permille-cents with per-row truncating division applied "
    "IDENTICALLY in both engines (ext*1000 div qty, then the mean), "
    "VWAP is the exact ratio of integer sums — no float division "
    "anywhere, intermediate products <= 1e10 per row. 100 TB shape: "
    "one broadcast dim join + one partial-agg shuffle to 25 brands; "
    "four SUMs per group, all map-side combinable — the shape of "
    "every trade-tape aggregation.",
)
def finance_vwap_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    lines = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    ).selectExpr(
        "p_brand AS brand",
        "CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        " AS ext_cents",
        "CAST(l_quantity AS BIGINT) AS qty",
    )
    per_brand = lines.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_trades"),
        F.sum("qty").cast("long").alias("total_qty"),
        F.sum("ext_cents").cast("long").alias("total_cents"),
        F.expr("SUM((ext_cents * 1000) div qty)")
        .cast("long")
        .alias("unit_pm_sum"),
    )
    return per_brand.selectExpr(
        "brand",
        "n_trades",
        "total_qty",
        "CAST((total_cents * 1000) div total_qty AS BIGINT)"
        " AS vwap_permille_cents",
        "CAST(unit_pm_sum div n_trades AS BIGINT)"
        " AS mean_unit_permille_cents",
        "CAST((total_cents * 1000) div total_qty"
        " - unit_pm_sum div n_trades AS BIGINT)"
        " AS divergence_permille_cents",
    ).orderBy("brand")
