"""IVF ANN: determinism, recall vs brute force, and score exactness."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from aws_healthcare_etl_pipeline_spark.operators.ivf import (
    ivf_top_k,
    train_ivf_centroids,
)
from aws_healthcare_etl_pipeline_spark.operators.similarity import brute_force_top_k
from aws_healthcare_etl_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_centroids_deterministic_and_normalized(spark):
    emb = load_table(spark, SF, "embeddings")
    c1 = train_ivf_centroids(emb, k=4, iterations=2)
    c2 = train_ivf_centroids(emb, k=4, iterations=2)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_ivf_recall_and_score_exactness(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    centroids = train_ivf_centroids(emb, k=8, iterations=2)
    got = ivf_top_k(emb, queries, k=5, centroids=centroids, nprobe=2).collect()
    assert all(1 <= r.rank <= 5 for r in got)

    bf = {
        (r.query_id, r.vec_id): r.cosine
        for r in brute_force_top_k(emb, queries, k=500).collect()
    }
    truth = {
        (r.query_id, r.vec_id)
        for r in brute_force_top_k(emb, queries, k=5).collect()
    }
    hits = sum(1 for r in got if (r.query_id, r.vec_id) in truth)
    assert hits / len(truth) > 0.2  # approximate by contract
    # scores on returned candidates are exact cosines
    for r in got:
        assert abs(bf[(r.query_id, r.vec_id)] - r.cosine) < 1e-12
