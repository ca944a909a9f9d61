"""Large-scale training-data pipeline operators.

Beyond the reference's sketch family: the operations a 100 TB
training-data pipeline needs, built Spark-first over the same
vectorized-UDF substrate — deduplication (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding cosine), approximate similarity search, text
analysis (language ID, quality scoring, token counting,
fingerprinting), deterministic hash-based sampling (uniform samples,
train/val/test splits, weighted sampling), and multimodal
binary-column plumbing.
"""

from .dedup import (
    dedup_keep_representatives,
    duplicate_clusters,
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash_column,
    simhash_near_dups,
    embedding_cosine_pairs,
    unpersist_intermediates,
)
from .packing import pack_documents, pack_stats
from .sampling import (
    bottom_k_sample,
    hash_sample,
    mix_corpora,
    mixture_plan,
    sample_key_expr,
    sample_uniform_expr,
    stratified_sample,
    weighted_sample,
    with_split,
)
from .simsearch import (brute_force_topk, ivf_assign, ivf_topk,
                        ivf_train_centroids, knn_join_bruteforce,
                        knn_join_lsh, lsh_bucketed_topk)
from .text import (
    with_language_id,
    with_quality,
    with_token_counts,
    with_fingerprint,
)

__all__ = [
    "exact_dedup",
    "duplicate_clusters",
    "dedup_keep_representatives",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_column",
    "simhash_near_dups",
    "embedding_cosine_pairs",
    "unpersist_intermediates",
    "brute_force_topk",
    "lsh_bucketed_topk",
    "ivf_train_centroids",
    "ivf_assign",
    "ivf_topk",
    "knn_join_bruteforce",
    "knn_join_lsh",
    "with_language_id",
    "with_quality",
    "with_token_counts",
    "with_fingerprint",
    "hash_sample",
    "with_split",
    "bottom_k_sample",
    "weighted_sample",
    "sample_key_expr",
    "sample_uniform_expr",
    "pack_documents",
    "pack_stats",
    "mix_corpora",
    "mixture_plan",
    "stratified_sample",
]
