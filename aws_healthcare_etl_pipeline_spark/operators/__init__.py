from .asof import asof_join
from .topk import top_k_per_group
from .dedup import (
    drop_exact_duplicates,
    exact_duplicate_clusters,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from .similarity import brute_force_top_k, lsh_top_k
from .text import language_id, quality_scores
from .multimodal import (
    attach_binary_payload,
    decode_image_stub,
    extract_features,
)

__all__ = [
    "asof_join",
    "top_k_per_group",
    "drop_exact_duplicates",
    "exact_duplicate_clusters",
    "minhash_near_duplicates",
    "ngram_jaccard_pairs",
    "simhash_near_duplicates",
    "brute_force_top_k",
    "lsh_top_k",
    "language_id",
    "quality_scores",
    "attach_binary_payload",
    "decode_image_stub",
    "extract_features",
]
