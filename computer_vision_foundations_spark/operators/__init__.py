from computer_vision_foundations_spark.operators.split import (
    deterministic_split,
    train_test_split,
)
from computer_vision_foundations_spark.operators.dedup import (
    embedding_near_duplicates,
    exact_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_column,
)
from computer_vision_foundations_spark.operators.similarity import (
    brute_force_knn,
    ivf_flat_knn,
    lsh_bucketed_knn,
)
from computer_vision_foundations_spark.operators.score import score_with

__all__ = [
    "deterministic_split",
    "train_test_split",
    "embedding_near_duplicates",
    "exact_duplicates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_column",
    "brute_force_knn",
    "ivf_flat_knn",
    "lsh_bucketed_knn",
    "score_with",
]
