"""PageRank operator vs a NumPy reference power iteration."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from aws_healthcare_etl_pipeline_spark.operators.pagerank import pagerank

# (src, dst, weight) — includes a dangling node (3 has no out-edges)
# and asymmetric weights
EDGES = [
    (0, 1, 3.0),
    (0, 2, 1.0),
    (1, 2, 2.0),
    (2, 0, 1.0),
    (2, 3, 1.0),
    (1, 3, 1.0),
]
DAMPING = 0.85
ITERS = 15


def _numpy_pagerank() -> np.ndarray:
    n = 4
    w = np.zeros((n, n))
    for s, d, wt in EDGES:
        w[s, d] = wt
    out = w.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(ITERS):
        dangling = r[out == 0].sum()
        new = np.full(n, (1.0 - DAMPING) / n + DAMPING * dangling / n)
        for s in range(n):
            if out[s] > 0:
                new += DAMPING * r[s] * w[s] / out[s]
        r = new
    return r


def test_pagerank_matches_numpy(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long, weight double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, damping=DAMPING, iterations=ITERS).collect()
    }
    ref = _numpy_pagerank()
    assert set(got) == {0, 1, 2, 3}
    for node, rank in got.items():
        assert abs(rank - ref[node]) < 1e-9, (node, rank, ref[node])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_uniform_on_symmetric_cycle(spark):
    # a 3-cycle with equal weights must converge to uniform ranks
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)], "src long, dst long, weight double"
    )
    got = [r["rank"] for r in pagerank(edges, iterations=20).collect()]
    for rank in got:
        assert abs(rank - 1.0 / 3.0) < 1e-12
