from computer_vision_foundations_spark.functions.filename import with_parsed_filename
from computer_vision_foundations_spark.functions.vectors import (
    cosine_from_norms,
    cosine_similarity,
    dot_product,
    l2_norm,
    to_double_array,
)
from computer_vision_foundations_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint_md5,
    normalized_text,
    quality_columns,
    repetition_columns,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)
from computer_vision_foundations_spark.functions.hashing import minhash_column
from computer_vision_foundations_spark.functions.text import (
    tfidf_scores,
    winnow_udf,
    with_winnow_fingerprints,
)
from computer_vision_foundations_spark.functions.sketches import (
    count_min_estimate,
    count_min_registers,
    hll_count_distinct,
    hll_registers,
)

__all__ = [
    "with_parsed_filename",
    "cosine_from_norms",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "to_double_array",
    "bpe_ish_token_count",
    "fingerprint_md5",
    "normalized_text",
    "quality_columns",
    "repetition_columns",
    "stopword_ratio",
    "token_count",
    "tokens",
    "word_shingles",
    "tfidf_scores",
    "winnow_udf",
    "with_winnow_fingerprints",
    "minhash_column",
    "count_min_estimate",
    "count_min_registers",
    "hll_count_distinct",
    "hll_registers",
]
