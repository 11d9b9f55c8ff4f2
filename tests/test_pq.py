"""Product quantization: encode determinism, ADC score sanity, and the
shortlist-rerank recall contract backing sim_pq_adc_topk's self-grade."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_healthcare_etl_pipeline_spark.functions.vectors import l2_norm
from aws_healthcare_etl_pipeline_spark.operators.pq import (
    pq_encode,
    pq_top_k,
    train_pq_codebooks,
)
from aws_healthcare_etl_pipeline_spark.operators.similarity import brute_force_top_k
from aws_healthcare_etl_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def pq_setup(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    norm_emb = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x / l2_norm(F.col("embedding"))).alias(
            "embedding"
        ),
    )
    books = train_pq_codebooks(norm_emb)
    encoded = pq_encode(norm_emb, books)
    return emb, norm_emb, books, encoded


def test_codebook_shape_and_determinism(pq_setup, spark, sf_dir):
    emb, norm_emb, books, _ = pq_setup
    assert books.shape == (8, 16, 8)
    again = train_pq_codebooks(norm_emb)
    np.testing.assert_array_equal(books, again)


def test_encode_codes_in_range_and_deterministic(pq_setup):
    emb, norm_emb, books, encoded = pq_setup
    rows = encoded.collect()
    assert len(rows) == norm_emb.count()
    for r in rows:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)
    again = {r.vec_id: r.codes for r in pq_encode(norm_emb, books).collect()}
    assert {r.vec_id: r.codes for r in rows} == again


def test_adc_matches_numpy_reconstruction(pq_setup):
    """ADC approx cosine == numpy score from the same codes + LUTs."""
    emb, norm_emb, books, encoded = pq_setup
    q = norm_emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = {
        (r.query_id, r.vec_id): r.approx_cosine
        for r in pq_top_k(encoded, q, books, k=4).collect()
    }
    codes = {r.vec_id: r.codes for r in encoded.collect()}
    qvecs = {r.query_id: np.asarray(r.query_vec, float) for r in q.collect()}
    cent_norm2 = (books**2).sum(axis=2)
    for (qid, vid), approx in got.items():
        lut = np.einsum(
            "sd,skd->sk", qvecs[qid].reshape(8, 8), books
        )
        num = sum(lut[s][codes[vid][s]] for s in range(8))
        den = np.linalg.norm(qvecs[qid]) * np.sqrt(
            sum(cent_norm2[s][codes[vid][s]] for s in range(8))
        )
        assert approx == pytest.approx(num / den, rel=1e-9)


def test_shortlist_rerank_recall_floor(pq_setup, spark):
    """The self-grade contract: ADC top-64 shortlist + exact rerank
    must keep recall@5 well above the query's 0.50 floor."""
    emb, norm_emb, books, encoded = pq_setup
    n_q = 8
    queries = norm_emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    shortlist = pq_top_k(encoded, queries, books, k=64)
    raw_q = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    truth = brute_force_top_k(emb, raw_q, k=5)
    # recall of the SHORTLIST (superset of the reranked top-5 hit set)
    hits = shortlist.join(
        truth.select("query_id", "vec_id"), ["query_id", "vec_id"]
    ).count()
    recall = hits / truth.count()
    assert recall >= 0.6, f"shortlist recall {recall} below contract"
