from .vectors import cosine_similarity, dot, l2_norm, normalize
from .text import (
    fingerprint_md5,
    normalize_text,
    token_count,
    tokens,
    word_shingles,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "normalize",
    "fingerprint_md5",
    "normalize_text",
    "token_count",
    "tokens",
    "word_shingles",
]
