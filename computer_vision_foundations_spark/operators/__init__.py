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
    winnow_near_duplicates,
)
from computer_vision_foundations_spark.operators.similarity import (
    brute_force_knn,
    ivf_flat_knn,
    lsh_bucketed_knn,
)
from computer_vision_foundations_spark.operators.score import score_with
from computer_vision_foundations_spark.operators.skew import salted_join

__all__ = [
    "deterministic_split",
    "train_test_split",
    "embedding_near_duplicates",
    "exact_duplicates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_column",
    "winnow_near_duplicates",
    "brute_force_knn",
    "ivf_flat_knn",
    "lsh_bucketed_knn",
    "salted_join",
    "score_with",
]
