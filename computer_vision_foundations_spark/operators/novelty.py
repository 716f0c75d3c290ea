"""N-gram novelty of a candidate set against a reference snapshot.

The dual of decontamination: decontamination asks "does training data
leak into eval", novelty asks "does a NEW crawl add anything the
corpus doesn't already have". RefinedWeb/FineWeb-style pipelines score
incoming dumps by the fraction of their n-gram shingles unseen in the
held corpus — near-zero novelty means the dump is re-crawl/
boilerplate and can be dropped before the expensive dedup stages; the
same statistic per document is a memorization/duplication signal
(Lee et al. 2022 measure train-set novelty with exactly this
machinery at substring granularity — `operators/spans.py` is the
span-level sibling).

Spark-first shape:
- both sides project to DISTINCT shingle rows via the shared
  ``shingles_from_tokens`` fold (`functions/text.py` — the zip_with
  form that survives CollapseProject under a Generate);
- the reference side collapses to ONE distinct-shingle table; the
  candidate side keeps (id, shingle) rows plus a per-doc size;
- novelty = LEFT ANTI equi-join on the shingle — a plain shuffled
  hash join Catalyst can AQE-split; shuffles carry (id, shingle-
  string) rows, document bodies never move past the projection;
- one final per-doc hash aggregate.

No broadcast of anything corpus-sized (the reference shingle set
scales with the reference corpus), no driver state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.text import (
    shingles_from_tokens,
    tokens,
)

__all__ = ["ngram_novelty", "novelty_oracle_sql"]


def ngram_novelty(
    candidates: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """``(doc_id, n_shingles, n_novel, novel_frac)`` per candidate
    document: distinct word-``k``-gram shingles absent from the
    reference corpus' shingle set; ``novel_frac`` rounded to 6."""

    def _shingled(df: DataFrame) -> DataFrame:
        t = df.select(
            F.col(id_col).alias("doc_id"),
            tokens(text_col).alias("_toks"),
        )
        return t.select(
            "doc_id",
            F.explode(
                F.array_distinct(shingles_from_tokens("_toks", k))
            ).alias("shingle"),
        )

    cand = _shingled(candidates)
    ref = _shingled(reference).select("shingle").distinct()
    sizes = cand.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    novel = (
        cand.join(ref, "shingle", "left_anti")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        sizes.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0))
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("novel_frac"),
        )
        .orderBy("doc_id")
    )


def novelty_oracle_sql(
    cand_where: str,
    ref_where: str,
    table: str = "documents",
    k: int = 3,
) -> str:
    """DuckDB twin: identical distinct-shingle construction (the
    q90 `_SHINGLES_SQL` convention) and anti-join semantics, with the
    candidate/reference split given as WHERE fragments."""
    shingles = f"""
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(string_split(text,' ')) - {k - 1}, 1) + 1),
                 i -> array_to_string(
                     string_split(text,' ')[i:i+{k - 1}], '|'))) AS shingles
        FROM {table}
    """
    return f"""
    WITH cand_sh AS (
        SELECT doc_id, unnest(shingles) AS shingle
        FROM ({shingles}) WHERE {cand_where}
    ), ref_sh AS (
        SELECT DISTINCT unnest(shingles) AS shingle
        FROM ({shingles}) WHERE {ref_where}
    ), sizes AS (
        SELECT doc_id, count(*) AS n_shingles FROM cand_sh GROUP BY doc_id
    ), novel AS (
        SELECT doc_id, count(*) AS n_novel
        FROM cand_sh ANTI JOIN ref_sh USING (shingle)
        GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_shingles,
           COALESCE(n.n_novel, 0) AS n_novel,
           round(COALESCE(n.n_novel, 0)
                 / CAST(s.n_shingles AS DOUBLE), 6) AS novel_frac
    FROM sizes s LEFT JOIN novel n USING (doc_id)
    ORDER BY s.doc_id
    """
