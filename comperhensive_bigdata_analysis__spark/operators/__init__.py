"""Reusable distributed operators (dedup, similarity, relational helpers)."""

from .dedup import (  # noqa: F401
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash_signatures,
)
from .similarity import brute_force_knn, cosine_pairs_above  # noqa: F401
