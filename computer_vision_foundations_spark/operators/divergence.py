"""Pairwise Jensen-Shannon divergence between domain token
distributions.

The information-theoretic companion to the mixture family
(`operators/mixture.py` reweights domains, `operators/drift.py`
tracks volume): JSD between per-source unigram distributions
quantifies how much the domains actually DIFFER — the number that
tells you whether "web" and "forums" deserve separate mixture weights
and which eval slice a new source will perturb. Symmetric, bounded
(≤ ln 2), defined even on disjoint supports:

    JSD(P, Q) = ½·KL(P‖M) + ½·KL(Q‖M),  M = ½(P+Q)

Laplace smoothing (α) over the SHARED vocabulary keeps every term
finite and the estimate honest for unseen tokens.

Spark-first shape: one token-stream hash aggregate into (source,
token) counts; the distribution grid is |V|·|sources| rows (the z52
Naive Bayes model budget); pairs come from a self-equi-join of the
grid ON THE TOKEN — |V|·|sources|² rows at worst, still model-sized;
one final (src_a, src_b) aggregate. The corpus never shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["source_jsd", "jsd_oracle_sql"]


def source_jsd(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    alpha: float = 1.0,
) -> DataFrame:
    """``(src_a, src_b, jsd)`` for every unordered source pair,
    natural-log JSD over Laplace-α smoothed unigram distributions,
    rounded to 6."""
    toks = docs.select(
        F.col(group_col).alias("src"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    counts = toks.groupBy("src", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = counts.groupBy("src").agg(F.sum("c").alias("n"))
    vocab = counts.select("tok").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    grid = (
        vocab.crossJoin(F.broadcast(totals))
        .join(counts, ["src", "tok"], "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            "src",
            "tok",
            (
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                / (F.col("n") + F.lit(alpha) * F.col("v"))
            ).alias("p"),
        )
    )
    a = grid.select(
        F.col("src").alias("src_a"), "tok", F.col("p").alias("pa")
    )
    b = grid.select(
        F.col("src").alias("src_b"), "tok", F.col("p").alias("pb")
    )
    m = (F.col("pa") + F.col("pb")) / 2.0
    term = (
        F.col("pa") * F.log(F.col("pa") / m)
        + F.col("pb") * F.log(F.col("pb") / m)
    ) / 2.0
    return (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.round(F.sum(term), 6).alias("jsd"))
        .orderBy("src_a", "src_b")
    )


def jsd_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    group_col: str = "source",
    alpha: float = 1.0,
) -> str:
    """DuckDB twin — identical smoothing and term algebra."""
    return f"""
    WITH toks AS (
        SELECT {group_col} AS src,
               unnest(string_split({text_col}, ' ')) AS tok
        FROM {table}
    ), t AS (
        SELECT * FROM toks WHERE tok <> ''
    ), counts AS (
        SELECT src, tok, count(*) AS c FROM t GROUP BY 1, 2
    ), totals AS (
        SELECT src, sum(c) AS n FROM counts GROUP BY 1
    ), vocab AS (
        SELECT DISTINCT tok FROM counts
    ), vs AS (
        SELECT count(*) AS v FROM vocab
    ), grid AS (
        SELECT tt.src, vocab.tok,
               (COALESCE(c.c, 0) + {alpha})
                   / (tt.n + {alpha} * vs.v) AS p
        FROM vocab
        CROSS JOIN totals tt
        CROSS JOIN vs
        LEFT JOIN counts c ON c.src = tt.src AND c.tok = vocab.tok
    )
    SELECT a.src AS src_a, b.src AS src_b,
           round(sum(
               (a.p * ln(a.p / ((a.p + b.p) / 2.0))
                + b.p * ln(b.p / ((a.p + b.p) / 2.0))) / 2.0
           ), 6) AS jsd
    FROM grid a JOIN grid b ON a.tok = b.tok AND a.src < b.src
    GROUP BY 1, 2 ORDER BY 1, 2
    """
