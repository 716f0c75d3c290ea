"""Paragraph-level exact deduplication (CCNet / RefinedWeb shape).

Web-scale corpora are deduplicated BELOW document granularity before
any fuzzy matching runs: CCNet (Wenzek et al. 2020) hashes normalized
paragraphs and drops every repeated one, RefinedWeb (Penedo et al.
2023) removes exact-duplicate spans/paragraphs while keeping the rest
of the document. The operator here implements the keeper-doc variant:
of all occurrences of a paragraph corpus-wide (across documents AND
within one), only the lexicographically first — smallest ``id``, then
smallest position — survives (deterministic canonical keeper, the
same convention as ``operators/dedup.py`` exact dedup); every other
occurrence is cut, and each document is reassembled from its
surviving paragraphs in original order.

Paragraph segmentation is deliberately simple and declarative — fixed
runs of ``para_words`` whitespace tokens — so the whole chain (split,
hash, keeper vote, reassembly) replays exactly in the DuckDB oracle.
Real corpora would segment on blank lines instead; only the splitter
expression changes, the dedup/reassembly machinery is identical.

Scale shape: paragraph rows are built NARROW with higher-order
functions (sequence → slice → explode, no UDF); the keeper vote
aggregates an (md5, id, idx) projection — narrow keys shuffle,
paragraph bodies do not; bodies then cross exactly two keyed shuffles
(the keeper equi-join on the hash, the per-document reassembly
groupBy), which is the floor for any reassembling sub-document dedup. No
broadcast of anything corpus-sized; no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["doc_paragraphs", "paragraph_dedup"]


def doc_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    para_words: int = 3,
) -> DataFrame:
    """``(id, para_idx, para, para_hash)`` — consecutive runs of
    ``para_words`` whitespace tokens (the last run may be shorter),
    ``para_hash`` = md5 of the run's text, ``para_idx`` 0-based."""
    toks = F.split(F.col(text_col), " ")
    n_para = F.ceil(F.size(toks) / F.lit(para_words)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n_para - 1),
        lambda i: F.array_join(
            F.slice(toks, i * para_words + 1, para_words), " "
        ),
    )
    return df.select(
        id_col, F.posexplode(paras).alias("para_idx", "para")
    ).withColumn("para_hash", F.md5("para"))


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    para_words: int = 3,
) -> DataFrame:
    """Cross-document paragraph dedup with reassembly: per document,
    ``(id, n_paras, n_kept, cleaned_text, cleaned_len)`` where a
    paragraph is kept iff it is the lexicographically FIRST occurrence
    of its hash corpus-wide (smallest doc id, then smallest position
    within that doc) — so exactly one copy of every distinct paragraph
    survives, within-document repeats included, and unique paragraphs
    are always kept."""
    p = doc_paragraphs(df, text_col, id_col, para_words)
    # keeper vote over a NARROW (hash, id, idx) projection: the
    # lexicographically first OCCURRENCE (min doc, then min position
    # within it) wins, so within-keeper repeats are cut too — exactly
    # one copy of every distinct paragraph survives corpus-wide
    keeper = (
        p.select("para_hash", id_col, "para_idx")
        .groupBy("para_hash")
        .agg(
            F.min(F.struct(F.col(id_col), F.col("para_idx"))).alias("_k")
        )
    )
    flagged = p.join(keeper, "para_hash").withColumn(
        "kept",
        (F.col(id_col) == F.col("_k")[id_col])
        & (F.col("para_idx") == F.col("_k")["para_idx"]),
    )
    kept_sorted = F.array_sort(
        F.collect_list(
            F.when(
                F.col("kept"), F.struct("para_idx", F.col("para"))
            )
        )
    )
    cleaned = F.array_join(
        F.transform(kept_sorted, lambda s: s["para"]), " "
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            cleaned.alias("cleaned_text"),
        )
        .withColumn("cleaned_len", F.length("cleaned_text").cast("long"))
    )
