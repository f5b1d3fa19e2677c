from osmgraft.ann.search import brute_force_topk, cosine_col, lsh_bucket_topk

__all__ = ["brute_force_topk", "cosine_col", "lsh_bucket_topk"]
