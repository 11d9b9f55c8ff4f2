"""Distributed PCA vs numpy ground truth (tolerance compare — float
partial sums are partition-order-dependent by nature)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_healthcare_etl_pipeline_spark.operators.pca import (
    covariance_stats,
    fit_pca,
    pca_project,
)
from aws_healthcare_etl_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.orderBy("vec_id").collect()
    x = np.array([np.asarray(r.embedding, np.float64) for r in rows])
    return emb, x


def test_covariance_matches_numpy(emb_np):
    emb, x = emb_np
    n, mean, cov = covariance_stats(emb)
    assert n == len(x)
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-9, atol=1e-12)
    ref = (x.T @ x) / len(x) - np.outer(x.mean(axis=0), x.mean(axis=0))
    np.testing.assert_allclose(cov, ref, rtol=1e-7, atol=1e-10)


def test_projection_matches_numpy(emb_np):
    emb, x = emb_np
    n, mean, comps, ratio = fit_pca(emb, k=4)
    proj = pca_project(emb, mean, comps)
    got = {
        r.vec_id: np.asarray(r.pc, np.float64)
        for r in proj.select("vec_id", "pc").collect()
    }
    ids = [r.vec_id for r in emb.orderBy("vec_id").select("vec_id").collect()]
    want = (x - x.mean(axis=0)) @ comps.T
    got_mat = np.stack([got[i] for i in ids])
    np.testing.assert_allclose(got_mat, want, rtol=1e-6, atol=1e-8)


def test_explained_ratio_sane(emb_np):
    emb, x = emb_np
    _, _, comps, ratio = fit_pca(emb, k=8)
    assert comps.shape == (8, x.shape[1])
    assert np.all(ratio >= 0) and ratio.sum() <= 1.0 + 1e-9
    # ratios descend
    assert all(ratio[i] >= ratio[i + 1] - 1e-12 for i in range(len(ratio) - 1))
