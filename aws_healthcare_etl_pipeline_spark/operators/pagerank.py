"""Weighted PageRank as an iterative DataFrame loop.

The iterative-algorithm pattern for Spark (same discipline as
operators/clusters.py): per iteration one edge-keyed join + one
destination-keyed aggregation, ``localCheckpoint`` to keep lineage
flat, and driver traffic limited to a 1-row aggregate (the dangling
mass). Ranks flow as doubles — PageRank is a fixpoint iteration, so
per-engine float-sum ordering perturbs ranks below convergence
tolerance, which is why the harness query self-grades invariants
(mass conservation, convergence) rather than hash-matching raw ranks;
tests/test_pagerank.py checks values against a NumPy power iteration.

At 100 TB scale: edges and ranks shuffle on node keys only; the
rank frame is O(nodes), edge traffic is O(edges) per iteration —
no driver materialization, no cross join, no adjacency collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """(node, rank) after ``iterations`` weighted power-iteration steps.

    Dangling nodes (no out-edges) redistribute their mass uniformly —
    total rank mass stays 1 every iteration (checked by the harness
    query's invariant).
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for _ in range(iterations):
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .join(out_w, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("w") / F.col("out_w")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
            .localCheckpoint(eager=True)
        )
        # dangling mass by CONSERVATION: every non-dangling node
        # distributes its full rank, so sum(in_mass) is exactly the
        # non-dangling mass and 1 - sum(in_mass) the dangling mass —
        # a 1-row aggregate on the already-materialized contribs
        # instead of a second full anti-join pass per iteration.
        distributed = contribs.agg(F.sum("in_mass")).first()[0] or 0.0
        dangling = max(0.0, 1.0 - distributed)
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_bounded(
    edge_rows,
    damping: float = 0.85,
    iterations: int = 10,
) -> dict:
    """Power iteration on a COLLECTED edge list — the bounded-collect
    contract for graphs whose node universe is a fixed dimension
    (nations, regions, shards): the data-heavy work is the Spark-side
    edge aggregation; the model that reaches the driver is O(dim^2)
    rows BY CONSTRUCTION, and iterating it here costs zero Spark jobs
    instead of (join + agg + checkpoint + 1-row collect) x rounds
    (measured: 10 nation-graph rounds = ~2.5 s of pure job latency at
    ANY scale factor). Same recurrence as :func:`pagerank`, same
    dangling-mass conservation; use the distributed loop whenever the
    node set grows with the data.

    ``edge_rows``: iterable of rows/tuples with ``src, dst, w``
    fields. Returns {node: rank}.
    """
    edges = [(r["src"], r["dst"], float(r["w"])) for r in edge_rows]
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    if n == 0:
        return {}
    out_w: dict = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0.0) + w
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        in_mass = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            in_mass[d] += rank[s] * w / out_w[s]
        distributed = sum(in_mass.values())
        dangling = max(0.0, 1.0 - distributed)
        base = (1.0 - damping) / n + damping * dangling / n
        rank = {v: base + damping * in_mass[v] for v in nodes}
    return rank
