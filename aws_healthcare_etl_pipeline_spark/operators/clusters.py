"""Connected components over near-duplicate pairs -> dedup clusters.

The dedup family emits PAIRS (id_a, id_b); a pipeline needs CLUSTERS
("keep one doc per component"). This is iterative min-label
propagation — the standard large-graph connected-components scheme
(HashToMin style): every node repeatedly adopts the smallest label in
its neighborhood until fixpoint. Each iteration is one shuffle of
(node, label) pairs; convergence takes O(log(diameter)) iterations on
real dedup graphs (near-dup components are tiny and dense, so usually
2-3).

Driver involvement per iteration: a single count (the convergence
check). No collect of graph data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    component = smallest node id in the connected component.

    Raises RuntimeError if not converged within ``max_iterations``
    (log2(diameter) bound: 20 handles components with diameters far
    beyond anything a near-dup graph produces).
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .unionByName(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = edges.select("u").distinct()
    labels = nodes.select(F.col("u").alias("node"), F.col("u").alias("label"))

    for _ in range(max_iterations):
        # 1. min-label propagation: each node takes the min over its own
        # and its neighbors' labels
        neighbor_labels = (
            edges.join(labels, edges.v == labels.node)
            .select(F.col("u").alias("node"), F.col("label"))
        )
        propagated = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # 2. pointer jumping: label(node) <- label(label(node)). A label
        # is itself a node id, so one self-join halves every label
        # chain — combined with propagation this converges in
        # O(log diameter) rounds instead of O(diameter). Renamed-column
        # join (not alias()) — self-join attribute resolution on a
        # checkpointed frame is unreliable otherwise.
        lookup = propagated.select(
            F.col("node").alias("jnode"), F.col("label").alias("jlabel")
        )
        old = labels.select(
            F.col("node").alias("onode"), F.col("label").alias("olabel")
        )
        # Convergence folded into the round's single materialization
        # (the Boruvka 3->2-jobs-per-round lesson): the old-label join
        # and the change flag ride INSIDE the checkpointed plan, so
        # the convergence probe is a scan of the materialized RDD
        # instead of a second join job per round.
        jumped = (
            propagated.join(lookup, propagated.label == lookup.jnode, "left")
            .select(
                "node",
                F.coalesce(F.col("jlabel"), F.col("label")).alias("label"),
            )
            .join(old, F.col("node") == old.onode)
            .select(
                "node",
                "label",
                (F.col("label") != F.col("olabel")).alias("chg"),
            )
            .localCheckpoint(eager=True)  # flat lineage per round
        )
        changed = jumped.filter("chg").limit(1).count()
        labels = jumped.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")


def dedup_keep_list(
    pairs: DataFrame, all_ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Documents to KEEP after near-dup clustering: every id not in any
    pair, plus the smallest id of each component."""
    comp = connected_components(pairs)
    keepers = comp.select(F.col("component").alias(id_col)).distinct()
    in_pairs = comp.select(F.col("node").alias(id_col))
    untouched = all_ids.select(id_col).subtract(in_pairs)
    return untouched.unionByName(keepers).distinct()
