"""Prefix filtering must be COMPLETE: ngram_jaccard_pairs has to return
exactly the pairs a brute-force Python computation finds — no false
negatives from candidate pruning, no false positives from hashing —
on arbitrary random corpora (hypothesis)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from aws_healthcare_etl_pipeline_spark.operators.dedup import ngram_jaccard_pairs

WORDS = ["data", "spark", "row", "table", "scan", "hash", "join", "agg"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=12),
    min_size=2,
    max_size=10,
)


def brute_force_pairs(docs: list[str], n: int, threshold: float):
    def shingles(text: str) -> set[str]:
        toks = text.split()
        if len(toks) <= n - 1:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    out = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = shingles(docs[i]), shingles(docs[j])
            jac = len(a & b) / len(a | b)
            if jac >= threshold:
                out[(i, j)] = jac
    return out


@settings(max_examples=10, deadline=None)
@given(word_lists=docs_strategy, threshold=st.sampled_from([0.3, 0.5, 0.8]))
def test_prefix_filter_is_exact(spark, word_lists, threshold):
    docs = [" ".join(ws) for ws in word_lists]
    expected = brute_force_pairs(docs, 3, threshold)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", block_cols=[], threshold=threshold
        ).collect()
    }
    assert set(got) == set(expected), (
        f"prefix filter pair set mismatch: missing={set(expected) - set(got)} "
        f"extra={set(got) - set(expected)}"
    )
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, abs=1e-12)
