"""Fuzzy string-match join: q-gram prefilter + edit-distance verify.

Joining two tables on "strings that are almost equal" (product
titles, author names, near-identical prompts) is quadratic if done
with ``levenshtein(a, b) <= k`` directly — Spark would plan a
nested-loop join evaluating the O(len²) distance for every pair.

The scale shape is filter-and-verify, the same candidate-generation
pattern as the MinHash/winnowing dedup operators:

1. **q-gram blocking**: explode each string's DISTINCT q-grams and
   equi-join on the gram — a hash join, linear in data plus the
   fan-out of genuinely similar strings.
2. **count bound**: one edit destroys at most q distinct q-grams, so
   strings within distance k share ``>= max(|A|,|B|) - k*q`` of their
   (kept) distinct grams — applied on the pair aggregation before any
   distance is computed. Dropping a gram from BOTH sides (the hot-gram
   cap below) only ever weakens |A|/|B| alongside the intersection, so
   the bound stays valid after capping.
3. **verify**: built-in codegen'd ``levenshtein`` on survivors only.

Common-gram skew ("the ", "tion") is capped exactly like stop
shingles in the Jaccard joiner: grams occurring in more than
``max_gram_freq`` strings are dropped from blocking — pairs sharing
ONLY stop-grams are missed (documented), the price of bounded
fan-out at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_match_pairs"]


def fuzzy_match_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 2,
    q: int = 3,
    max_gram_freq: int | None = 1000,
) -> DataFrame:
    """Self-join pairs ``(id_a, id_b, distance)`` with
    ``levenshtein(text_a, text_b) <= max_distance`` and
    ``id_a < id_b``. Strings shorter than ``q`` are EXCLUDED from
    matching (a q-gram block cannot see them — lower q for
    short-string workloads); within the included strings the
    candidate filter is lossless, so results equal the quadratic
    form."""
    df = df.filter(F.length(text_col) >= q)
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {q - 1}, 1)),"
            f" i -> substring({text_col}, i, {q}))"
        )
    )
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_s"),
        F.explode(grams).alias("gram"),
    )
    if max_gram_freq is not None:
        hot = (
            ex.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_gram_freq)
            .select("gram")
        )
        ex = ex.join(F.broadcast(hot), "gram", "left_anti")
    counts = ex.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_n_grams"), F.first("_s").alias("_s")
    )
    a = ex.select("gram", F.col("_id").alias("id_a"))
    b = ex.select("gram", F.col("_id").alias("id_b"))
    shared = (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ca = counts.select(
        F.col("_id").alias("id_a"),
        F.col("_n_grams").alias("_na"),
        F.col("_s").alias("_sa"),
    )
    cb = counts.select(
        F.col("_id").alias("id_b"),
        F.col("_n_grams").alias("_nb"),
        F.col("_s").alias("_sb"),
    )
    return (
        shared.join(ca, "id_a")
        .join(cb, "id_b")
        .filter(
            F.col("n_shared")
            >= F.greatest(F.col("_na"), F.col("_nb"))
            - F.lit(max_distance * q)
        )
        .withColumn("distance", F.levenshtein("_sa", "_sb"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )
