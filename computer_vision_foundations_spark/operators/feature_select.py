"""Chi-square feature relevance: which tokens discriminate classes.

The feature-selection step in front of any bag-of-words classifier
(the z52 Naive Bayes, the z47 hashing trick): for each token, the
chi-square statistic of its |classes|×2 presence/absence contingency
table against the class column. High-chi2 tokens carry the label
signal; near-zero tokens are stopword ballast a 100 TB training run
should not pay to featurize.

    χ²(token) = Σ_{class, present∈{0,1}} (obs − exp)² / exp,
    exp = row_total · col_total / n_docs

computed at DOCUMENT granularity (a token counts once per document —
the standard feature-selection convention, robust to repetition
spam).

Spark-first shape: distinct (doc, token) from one tokenize pass →
(token, class) presence counts (one shuffle) → the |V|·|classes| grid
joins class totals (|classes| rows, broadcast) and token totals — all
model-sized after the first aggregate; top-k by TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chi2_tokens", "chi2_oracle_sql"]


def chi2_tokens(
    docs: DataFrame,
    text_col: str = "text",
    class_col: str = "lang",
    id_col: str = "doc_id",
    top_k: int = 50,
) -> DataFrame:
    """``(token, chi2, n_docs_with)`` — the ``top_k`` highest-chi2
    tokens (ties broken by token), chi2 rounded 6."""
    dt = (
        docs.select(
            F.col(id_col).alias("d"),
            F.col(class_col).alias("cls"),
            F.explode(
                F.array_distinct(F.split(F.col(text_col), " "))
            ).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    n_docs = docs.count()
    cls_totals = docs.groupBy(F.col(class_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("n_cls")
    )
    present = dt.groupBy("tok", "cls").agg(
        F.count(F.lit(1)).alias("p")
    )
    tok_totals = present.groupBy("tok").agg(
        F.sum("p").alias("n_tok")
    )
    grid = (
        tok_totals.crossJoin(F.broadcast(cls_totals))
        .join(present, ["tok", "cls"], "left")
        .select(
            "tok",
            "n_tok",
            "cls",
            "n_cls",
            F.coalesce(F.col("p"), F.lit(0)).alias("p"),
        )
    )
    n = float(n_docs)
    e_p = F.col("n_cls") * F.col("n_tok") / F.lit(n)
    e_a = F.col("n_cls") * (F.lit(n) - F.col("n_tok")) / F.lit(n)
    a = F.col("n_cls") - F.col("p")  # absent count in this class
    # a token present in EVERY document has e_a = 0 (and a = 0): the
    # absent column is degenerate and contributes 0 by convention —
    # ANSI Spark raises on the 0/0 otherwise, DuckDB yields NaN.
    term = (F.col("p") - e_p) * (F.col("p") - e_p) / e_p + F.when(
        e_a > 0, (a - e_a) * (a - e_a) / e_a
    ).otherwise(F.lit(0.0))
    return (
        grid.groupBy("tok")
        .agg(
            F.round(F.sum(term), 6).alias("chi2"),
            F.max("n_tok").alias("n_docs_with"),
        )
        .select(
            F.col("tok").alias("token"), "chi2", "n_docs_with"
        )
        .orderBy(F.col("chi2").desc(), "token")
        .limit(top_k)
    )


def chi2_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    class_col: str = "lang",
    id_col: str = "doc_id",
    top_k: int = 50,
) -> str:
    """DuckDB twin — identical contingency algebra."""
    return f"""
    WITH dt AS (
        SELECT DISTINCT {id_col} AS d, {class_col} AS cls, tok
        FROM (
            SELECT {id_col}, {class_col},
                   unnest(string_split({text_col}, ' ')) AS tok
            FROM {table})
        WHERE tok <> ''
    ), nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {table}),
    ct AS (
        SELECT {class_col} AS cls, count(*) AS n_cls
        FROM {table} GROUP BY 1
    ), present AS (
        SELECT tok, cls, count(*) AS p FROM dt GROUP BY 1, 2
    ), tt AS (
        SELECT tok, CAST(sum(p) AS BIGINT) AS n_tok
        FROM present GROUP BY tok
    ), grid AS (
        SELECT tt.tok, tt.n_tok, ct.cls, ct.n_cls,
               COALESCE(present.p, 0) AS p
        FROM tt CROSS JOIN ct
        LEFT JOIN present
          ON present.tok = tt.tok AND present.cls = ct.cls
    )
    SELECT tok AS token,
           round(sum(
               (p - n_cls * n_tok / nd.n)
               * (p - n_cls * n_tok / nd.n)
               / (n_cls * n_tok / nd.n)
               + CASE WHEN n_cls * (nd.n - n_tok) / nd.n > 0
                      THEN ((n_cls - p) - n_cls * (nd.n - n_tok) / nd.n)
                           * ((n_cls - p) - n_cls * (nd.n - n_tok) / nd.n)
                           / (n_cls * (nd.n - n_tok) / nd.n)
                      ELSE 0.0 END
           ), 6) AS chi2,
           max(n_tok) AS n_docs_with
    FROM grid CROSS JOIN nd
    GROUP BY tok
    ORDER BY chi2 DESC, token
    LIMIT {top_k}
    """
