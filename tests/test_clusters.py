"""Connected components: chains, stars, disjoint components, keep-lists."""

from __future__ import annotations


from aws_healthcare_etl_pipeline_spark.operators.clusters import (
    connected_components,
    dedup_keep_list,
)


def cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r.node: r.component for r in connected_components(df).collect()
    }


def test_chain_and_star(spark):
    # chain 1-2-3-4 and star 10-(11,12,13), disjoint pair 20-21
    got = cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)])
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_long_chain_converges(spark):
    n = 40  # diameter 40 -> needs several propagation rounds
    got = cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_keep_list(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    all_ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 5, 10, 11, 99]], "doc_id long")
    keep = sorted(r.doc_id for r in dedup_keep_list(pairs, all_ids).collect())
    assert keep == [1, 5, 10, 99]  # component mins + untouched docs
