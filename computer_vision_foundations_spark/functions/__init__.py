from computer_vision_foundations_spark.functions.filename import with_parsed_filename
from computer_vision_foundations_spark.functions.vectors import (
    cosine_from_norms,
    cosine_similarity,
    dot_product,
    l2_norm,
    to_double_array,
)
from computer_vision_foundations_spark.functions.text import (
    fingerprint_md5,
    normalized_text,
    quality_columns,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)
from computer_vision_foundations_spark.functions.hashing import minhash_column

__all__ = [
    "with_parsed_filename",
    "cosine_from_norms",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "to_double_array",
    "fingerprint_md5",
    "normalized_text",
    "quality_columns",
    "stopword_ratio",
    "token_count",
    "tokens",
    "word_shingles",
    "minhash_column",
]
