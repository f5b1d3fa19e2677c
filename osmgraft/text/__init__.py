from osmgraft.text.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    shingles,
    shingle_hashes,
    simhash,
)
from osmgraft.text.quality import (
    language_id,
    quality_scores,
    text_fingerprint,
    token_counts,
)

__all__ = [
    "exact_dedup",
    "minhash_lsh_candidates",
    "shingles",
    "shingle_hashes",
    "simhash",
    "language_id",
    "quality_scores",
    "text_fingerprint",
    "token_counts",
]
