"""TextRank keyword extraction — weighted PageRank over the word
co-occurrence graph (Mihalcea & Tarau 2004).

The unsupervised keyword scorer every corpus-curation stack wants as a
cheap topical signal: build an undirected word graph (edge weight =
corpus-wide count of the two words occurring ADJACENTLY in a
document's token sequence, after a minimum-length token filter), then
run the weighted PageRank recurrence

    r_{i+1}(v) = (1-d) + d * Σ_{u ~ v}  w_uv / S_u * r_i(u),

with ``S_u = Σ_x w_ux`` the node strength. Unlike the web-graph
PageRank (operators/pagerank.py) this is the ORIGINAL TextRank form:
constant ``(1-d)`` teleport (ranks are not a distribution) and no
dangling mass — an undirected node always has out-weight.

Spark-first shape: tokenize → one ``zip_with`` of two shifted slices
(adjacent pairs, no posexplode self-join) → explode → one hash
aggregate to undirected weights. Edges + strengths are
``localCheckpoint``'d once; each of the ``n_iter`` rounds is then one
(node)-keyed equi-join shuffle + one hash aggregate carrying
(word, double) pairs only. Ranks are consumed ONCE per round, so the
recurrence unrolls lazily without the exponential-recompute problem
pagerank has (its dangling term reads ranks twice).

The oracle unrolls the identical recurrence as r0..rN CTEs with the
same double casts and operation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["textrank_keywords", "textrank_oracle_sql"]


def _edges(
    docs: DataFrame, text_col: str, min_len: int
) -> DataFrame:
    """Undirected adjacency weights ``(wa, wb, w)`` with wa < wb."""
    toks = docs.select(F.split(F.col(text_col), " ").alias("t"))
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    kept = pairs.filter(
        (F.length("a") >= min_len)
        & (F.length("b") >= min_len)
        & (F.col("a") != F.col("b"))
    )
    return (
        kept.select(
            F.least("a", "b").alias("wa"), F.greatest("a", "b").alias("wb")
        )
        .groupBy("wa", "wb")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    min_len: int = 4,
    damping: float = 0.85,
    n_iter: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """``(word, rank)`` — top ``top_k`` words by TextRank score,
    rank rounded to 6 digits; ties broken by word ascending."""
    und = _edges(docs, text_col, min_len)
    edges = und.select(
        F.col("wa").alias("src"), F.col("wb").alias("dst"), "w"
    ).unionByName(
        und.select(
            F.col("wb").alias("src"), F.col("wa").alias("dst"), "w"
        )
    )
    edges = edges.localCheckpoint()
    strength = edges.groupBy("src").agg(
        F.sum("w").alias("s")
    ).localCheckpoint()

    ranks = strength.select(
        F.col("src").alias("node"), F.lit(1.0).alias("rank")
    )
    contrib_src = edges.join(
        strength, "src"
    )  # (src, dst, w, s) — static across rounds
    for _ in range(n_iter):
        r = ranks.withColumnRenamed("node", "src")
        ranks = (
            contrib_src.join(r, "src")
            .groupBy("dst")
            .agg(
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * F.sum(
                        F.col("w") / F.col("s") * F.col("rank")
                    )
                ).alias("rank")
            )
            .withColumnRenamed("dst", "node")
        )
    out = ranks.select(
        F.col("node").alias("word"), F.round("rank", 6).alias("rank")
    )
    return out.orderBy(F.desc("rank"), F.asc("word")).limit(top_k)


def textrank_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    min_len: int = 4,
    damping: float = 0.85,
    n_iter: int = 5,
    top_k: int = 20,
) -> str:
    """DuckDB twin: identical graph build + unrolled r0..rN CTEs."""
    d = repr(float(damping))
    ctes = [
        f"""toks AS (SELECT string_split({text_col}, ' ') AS t FROM {table})""",
        """adj AS (
           SELECT unnest(list_transform(range(1, len(t)),
                         i -> {'a': t[i], 'b': t[i+1]})) AS p
           FROM toks)""",
        f"""und AS (
           SELECT least(p.a, p.b) AS wa, greatest(p.a, p.b) AS wb,
                  CAST(count(*) AS DOUBLE) AS w
           FROM adj
           WHERE length(p.a) >= {min_len} AND length(p.b) >= {min_len}
             AND p.a <> p.b
           GROUP BY 1, 2)""",
        """edges AS (
           SELECT wa AS src, wb AS dst, w FROM und
           UNION ALL
           SELECT wb AS src, wa AS dst, w FROM und)""",
        """strength AS (
           SELECT src, CAST(sum(w) AS DOUBLE) AS s
           FROM edges GROUP BY src)""",
        """r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS rank
                  FROM strength)""",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""r{i} AS (
            SELECT e.dst AS node,
                   CAST(1.0 AS DOUBLE) - {d}
                   + {d} * sum(e.w / st.s * r.rank) AS rank
            FROM edges e
            JOIN strength st ON st.src = e.src
            JOIN r{i - 1} r ON r.node = e.src
            GROUP BY e.dst)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT node AS word, round(rank, 6) AS rank
        FROM r{n_iter}
        ORDER BY round(rank, 6) DESC, node ASC
        LIMIT {top_k}"""
    )
