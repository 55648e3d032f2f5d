from .textfns import normalize_text, tokens, shingles, portable_md5
from .vectors import cosine_similarity, l2_norm, dot

__all__ = [
    "normalize_text",
    "tokens",
    "shingles",
    "portable_md5",
    "cosine_similarity",
    "l2_norm",
    "dot",
]
