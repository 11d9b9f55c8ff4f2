"""Wave-95 (round 5): annotator agreement + cross-source duplication.

* ``ml_annotator_agreement_kappa`` — Cohen's kappa between two weak
  labelers (char-length and token-length heuristics) per language,
  in EXACT integer arithmetic: with the 2x2 contingency (a,b,c,d)
  and n = a+b+c+d, kappa = (n*(a+d) - pe) / (n^2 - pe) where
  pe = (a+b)(a+c) + (c+d)(b+d) — numerator and denominator are
  reported raw, and the permille uses symmetric truncation
  (negate-divide-negate) so Spark's truncating div and DuckDB's
  flooring // agree even when kappa is negative. The weak-
  supervision health check: labelers that don't beat chance
  agreement can't be ensembled into labels.
* ``dedup_cross_source_matrix`` — WHICH feeds copy each other: the
  perturbed corpus reassigns every near-copy to a shifted source
  (simulating cross-feed syndication), MinHash-LSH pairs (exact-
  verified, the repo's operator) roll up into a source-pair
  matrix — the contamination report that turns 'we have dupes'
  into 'feed B is 90% recycled feed A'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.dedup import minhash_near_duplicates
from ..sources.tables import load_table
from .registry import query

# ------------------------------------------------ Cohen's kappa

_KAPPA_CHARS = 306  # labeler A: n_chars >= corpus median chars
_KAPPA_TOKS = 56  # labeler B: n_tokens >= corpus median tokens


@query(
    "ml_annotator_agreement_kappa",
    oracle=f"""
        WITH labeled AS (
            SELECT lang,
                   CASE WHEN n_chars >= {_KAPPA_CHARS}
                        THEN 1 ELSE 0 END AS la,
                   CASE WHEN len(list_filter(string_split(trim(text), ' '),
                                             t -> t <> ''))
                            >= {_KAPPA_TOKS}
                        THEN 1 ELSE 0 END AS lb
            FROM documents
        ), cont AS (
            SELECT lang,
                   CAST(SUM(la * lb) AS BIGINT) AS a,
                   CAST(SUM(la * (1 - lb)) AS BIGINT) AS b,
                   CAST(SUM((1 - la) * lb) AS BIGINT) AS c,
                   CAST(SUM((1 - la) * (1 - lb)) AS BIGINT) AS d
            FROM labeled GROUP BY lang
        ), kap AS (
            SELECT lang, a, b, c, d,
                   a + b + c + d AS n,
                   (a + b) * (a + c) + (c + d) * (b + d) AS pe
            FROM cont
        )
        SELECT lang, a, b, c, d,
               CAST(n * (a + d) - pe AS BIGINT) AS kappa_num,
               CAST(n * n - pe AS BIGINT) AS kappa_den,
               CAST(CASE WHEN n * (a + d) - pe >= 0
                         THEN ((n * (a + d) - pe) * 1000) // (n * n - pe)
                         ELSE -((-(n * (a + d) - pe)) * 1000)
                              // (n * n - pe)
                    END AS BIGINT) AS kappa_permille
        FROM kap
        ORDER BY lang
    """,
    description="Cohen's kappa between two weak labelers (char-"
    "length vs token-length heuristics) per language, exactly: "
    "kappa = (n*(a+d) - pe) / (n^2 - pe) with pe = (a+b)(a+c) + "
    "(c+d)(b+d) over the 2x2 contingency — numerator and "
    "denominator reported as raw integers, permille via symmetric "
    "truncation (negate-divide-negate) so truncating and flooring "
    "integer division agree at negative kappa. The weak-supervision "
    "health check before ensembling heuristic labelers. Scale: one "
    "narrow projection, one map-side-combined per-language "
    "aggregate; the kappa algebra runs on language-count rows.",
)
def ml_annotator_agreement_kappa(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.select(
        "lang",
        (F.col("n_chars") >= _KAPPA_CHARS).cast("long").alias("la"),
        (
            F.size(
                F.filter(
                    F.split(F.trim(F.col("text")), " "), lambda t: t != ""
                )
            )
            >= _KAPPA_TOKS
        )
        .cast("long")
        .alias("lb"),
    )
    cont = labeled.groupBy("lang").agg(
        F.sum(F.col("la") * F.col("lb")).cast("long").alias("a"),
        F.sum(F.col("la") * (1 - F.col("lb"))).cast("long").alias("b"),
        F.sum((1 - F.col("la")) * F.col("lb")).cast("long").alias("c"),
        F.sum((1 - F.col("la")) * (1 - F.col("lb")))
        .cast("long")
        .alias("d"),
    )
    kap = cont.withColumn("n", F.expr("a + b + c + d")).withColumn(
        "pe", F.expr("(a + b) * (a + c) + (c + d) * (b + d)")
    )
    return kap.select(
        "lang",
        "a",
        "b",
        "c",
        "d",
        F.expr("n * (a + d) - pe").cast("long").alias("kappa_num"),
        F.expr("n * n - pe").cast("long").alias("kappa_den"),
        F.expr(
            "CASE WHEN n * (a + d) - pe >= 0"
            " THEN ((n * (a + d) - pe) * 1000) div (n * n - pe)"
            " ELSE -((-(n * (a + d) - pe)) * 1000) div (n * n - pe) END"
        )
        .cast("long")
        .alias("kappa_permille"),
    ).orderBy("lang")


# ------------------------------------------- cross-source dup matrix

_XSRC_OFFSET = 1_000_000
_XSRC_SHIFT = 7  # near-copies attribute to source (i + 7) mod 20
_XSRC_THRESHOLD = 0.9


@query(
    "dedup_cross_source_matrix",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, source,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
            FROM documents
        ), corpus AS (
            SELECT doc_id, source, toks FROM base
            UNION ALL
            SELECT doc_id + {_XSRC_OFFSET} AS doc_id,
                   'src' || CAST((CAST(substr(source, 4) AS INT)
                                  + {_XSRC_SHIFT}) % 20 AS VARCHAR)
                       AS source,
                   list_slice(toks, 1, greatest(len(toks) - 2, 1)) AS toks
            FROM base
        ), sh AS (
            SELECT doc_id, source,
                   list_distinct(
                     list_transform(
                         range(1, greatest(len(toks) - 2, 1) + 1),
                         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                   ) AS shingles
            FROM corpus
        ), pairs AS (
            SELECT id_a, id_b FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       len(list_intersect(a.shingles, b.shingles)) AS inter,
                       len(a.shingles) AS la, len(b.shingles) AS lb
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            )
            WHERE inter::DOUBLE / (la + lb - inter) >= {_XSRC_THRESHOLD}
        ), attributed AS (
            SELECT LEAST(sa.source, sb.source) AS source_a,
                   GREATEST(sa.source, sb.source) AS source_b
            FROM pairs p
            JOIN sh sa ON sa.doc_id = p.id_a
            JOIN sh sb ON sb.doc_id = p.id_b
        )
        SELECT source_a, source_b,
               CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
        FROM attributed
        GROUP BY source_a, source_b
        ORDER BY n_dup_pairs DESC, source_a, source_b
        LIMIT 20
    """,
    description="Cross-source duplication matrix: the perturbed "
    "corpus attributes every near-copy to a SHIFTED source "
    "(simulating cross-feed syndication), near-dup pairs come from "
    "the repo's MinHash-LSH operator (64 hashes, 16 bands, exact-"
    "Jaccard verified at >=0.9 — the oracle's all-pairs exact "
    "Jaccard is valid because a >=0.9 pair escapes all bands w.p. "
    "~4e-8), and pairs roll up by unordered source pair — the "
    "contamination report that turns 'we have dupes' into 'feed B "
    "recycles feed A'. Scale: everything rides the LSH pipeline's "
    "banded shuffle (no all-pairs in execution); source attribution "
    "is two joins against the id->source map, and the matrix is "
    "source-pair-sized.",
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    near = docs.select(
        "doc_id", "source", tokens(F.col("text")).alias("toks")
    ).select(
        (F.col("doc_id") + _XSRC_OFFSET).alias("doc_id"),
        F.concat_ws(
            " ",
            F.slice(
                F.col("toks"), 1, F.greatest(F.size("toks") - 2, F.lit(1))
            ),
        ).alias("text"),
        F.concat(
            F.lit("src"),
            (
                (F.expr("CAST(substring(source, 4) AS INT)") + _XSRC_SHIFT)
                % 20
            ).cast("string"),
        ).alias("source"),
    )
    corpus = docs.unionByName(near).localCheckpoint(eager=False)
    # feeds the LSH pipeline AND the id->source attribution joins
    pairs = minhash_near_duplicates(
        corpus,
        "text",
        "doc_id",
        num_hashes=64,
        bands=16,
        threshold=_XSRC_THRESHOLD,
    )
    src = corpus.select("doc_id", "source")
    attributed = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("sa")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("sb")
            ),
            "id_b",
        )
        .select(
            F.least(F.col("sa"), F.col("sb")).alias("source_a"),
            F.greatest(F.col("sa"), F.col("sb")).alias("source_b"),
        )
    )
    return (
        attributed.groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_pairs"))
        .orderBy(F.col("n_dup_pairs").desc(), "source_a", "source_b")
        .limit(20)
    )
