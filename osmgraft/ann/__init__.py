from osmgraft.ann.search import (
    brute_force_topk,
    cosine_col,
    ivf_build,
    ivf_codebook,
    ivf_probe,
    ivf_topk,
    lsh_bucket_topk,
)

__all__ = [
    "brute_force_topk",
    "cosine_col",
    "ivf_build",
    "ivf_codebook",
    "ivf_probe",
    "ivf_topk",
    "lsh_bucket_topk",
]
