"""Fuzzy-dedup queries (SURVEY.md §2.8): MinHash+LSH, SimHash, n-gram
Jaccard over a corpus with known near-duplicates.

The fixture corpus has no near-duplicate pairs, so each query runs on
``documents`` UNION a deterministic perturbation of itself (drop the
last two words, offset ids by 1_000_000) — guaranteeing every original
doc has exactly one near-dup partner the operators must find. These
are the non-SQL-expressible entries: the driver applies its rows-only
check; pytest asserts recall/precision against the constructed truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.dedup import (
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from ..sources.tables import load_table
from .registry import query

PERTURB_OFFSET = 1_000_000


def perturbed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ near-duplicate copies (last 2 words dropped)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    # materialize the token array before slicing (tokenize once per row)
    near = (
        docs.select("doc_id", "lang", tokens(F.col("text")).alias("toks"))
        .select(
            (F.col("doc_id") + PERTURB_OFFSET).alias("doc_id"),
            F.concat_ws(
                " ", F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - 2, F.lit(1)))
            ).alias("text"),
            "lang",
        )
    )
    return docs.unionByName(near)


@query(
    "dedup_minhash_lsh_pairs",
    description="MinHash(64 hashes) + LSH(16 bands) near-dup pairs, "
    "exact-Jaccard verified at >=0.6.",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = perturbed_corpus(spark, sf_dir)
    return (
        minhash_near_duplicates(
            corpus, "text", "doc_id", num_hashes=64, bands=16, threshold=0.6
        )
        .withColumn("jaccard", F.round("jaccard", 6))
        .orderBy("id_a", "id_b")
    )


@query(
    "dedup_simhash_pairs",
    description="64-bit SimHash near-dup pairs at hamming <= 8 "
    "(4x16-bit band blocking).",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = perturbed_corpus(spark, sf_dir)
    return simhash_near_duplicates(corpus, "text", "doc_id", max_hamming=8).orderBy(
        "id_a", "id_b"
    )


@query(
    "dedup_ngram_jaccard_pairs",
    description="Blocked (by lang) exact 3-gram Jaccard pairs at >=0.5.",
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = perturbed_corpus(spark, sf_dir)
    return (
        ngram_jaccard_pairs(corpus, "text", "doc_id", block_cols=["lang"], threshold=0.5)
        .withColumn("jaccard", F.round("jaccard", 6))
        .orderBy("id_a", "id_b")
    )


@query(
    "dedup_minhash_clusters",
    description="Near-dup pairs -> connected components (min-label + "
    "pointer jumping) -> cluster-size histogram; the pairs-to-clusters "
    "step every real dedup pipeline needs.",
)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clusters import connected_components

    corpus = perturbed_corpus(spark, sf_dir)
    pairs = minhash_near_duplicates(
        corpus, "text", "doc_id", num_hashes=64, bands=16, threshold=0.6
    )
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )
