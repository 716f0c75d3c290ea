"""Maximal Marginal Relevance (MMR) diverse top-k selection.

Retrieval and data-curation pipelines both need "top-k but not
near-duplicates of each other": MMR (Carbonell & Goldstein 1998)
greedily picks the item maximizing

    score(d) = λ · relevance(d) − (1 − λ) · max_{s ∈ selected} sim(d, s)

Spark-first shape: k small (a page of results), so the loop runs k
rounds on the driver; each round is ONE narrow pass over the
candidate set — the selected set is ≤ k model-sized vectors broadcast
as plan LITERALS (no join, no shuffle), the max-similarity term is a
codegen'd HOF fold, and the argmax is a 1-row ``orderBy().limit(1)``
(TakeOrdered, no full sort). Candidates never shuffle at all; total
cost is k scans — the right trade when k ≪ |candidates| and the
alternative (pairwise similarity) is quadratic.

Ties break on id ascending, making the greedy sequence fully
deterministic — which is what lets the SQL oracle replay all k rounds
as unrolled MATERIALIZED CTEs (the BPE-training pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mmr_select"]


def _cosine(vec_col: str, lit_vec: list[float]):
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    other = F.array(*[F.lit(float(x)) for x in lit_vec])
    dot = F.aggregate(
        F.zip_with(v, other, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_v = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    import math

    norm_o = math.sqrt(sum(float(x) * float(x) for x in lit_vec))
    return dot / (norm_v * F.lit(norm_o))


def mmr_select(
    df: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    relevance_col: str = "relevance",
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """``(rank, id, mmr_score)`` — the k greedily-selected items.

    Round 1 picks the highest relevance (ties on id); each later round
    scores every remaining candidate against the selected set carried
    as literals. ``mmr_score`` is the round's winning score rounded to
    ``round_digits`` (the first round's score is λ·relevance, matching
    the recurrence with an empty selected set)."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    selected: list[tuple] = []  # (id, score, vector)
    chosen_ids: list = []
    for _ in range(k):
        cand = df
        if chosen_ids:
            cand = cand.filter(~F.col(id_col).isin(chosen_ids))
        base = F.lit(float(lam)) * F.col(relevance_col).cast("double")
        if selected:
            penalty = F.greatest(
                *[_cosine(vec_col, vec) for (_, _, vec) in selected]
            ) if len(selected) > 1 else _cosine(vec_col, selected[0][2])
            score = base - F.lit(float(1.0 - lam)) * penalty
        else:
            score = base
        row = (
            cand.select(
                F.col(id_col),
                F.round(score, round_digits).alias("_s"),
                F.col(vec_col),
            )
            .orderBy(F.col("_s").desc(), F.col(id_col).asc())
            .limit(1)
            .collect()
        )
        if not row:
            break
        r = row[0]
        selected.append((r[id_col], float(r["_s"]), list(r[vec_col])))
        chosen_ids.append(r[id_col])
    spark = df.sparkSession
    from pyspark.sql import types as T

    id_field = df.schema[id_col]  # preserve the caller's id type
    schema = T.StructType(
        [
            T.StructField("rank", T.IntegerType(), False),
            T.StructField(id_col, id_field.dataType, id_field.nullable),
            T.StructField("mmr_score", T.DoubleType(), False),
        ]
    )
    return spark.createDataFrame(
        [
            (i + 1, sid, round(sc, round_digits))
            for i, (sid, sc, _) in enumerate(selected)
        ],
        schema,
    )


def mmr_oracle_sql(
    source_sql: str,
    k: int,
    lam: float,
    relevance_expr: str = "relevance",
    vec_expr: str = "embedding",
    id_expr: str = "doc_id",
    out_id: str = "doc_id",
    round_digits: int = 6,
) -> str:
    """Unrolled MATERIALIZED-CTE DuckDB twin: round i's winner is
    computed from the literal recurrence over the previous winners
    (list_cosine_similarity for the penalty term). ``source_sql`` must
    yield (doc_id, relevance, embedding)."""
    parts = [
        f"WITH cand AS MATERIALIZED (SELECT {id_expr} AS id, "
        f"CAST({relevance_expr} AS DOUBLE) AS rel, "
        f"CAST({vec_expr} AS DOUBLE[]) AS v FROM ({source_sql}))",
        f"s0 AS MATERIALIZED (SELECT id, round({lam!r} * rel, {round_digits}) AS s, v "
        f"FROM cand ORDER BY round({lam!r} * rel, {round_digits}) DESC, id LIMIT 1)",
    ]
    prev_sel = "s0"
    for i in range(1, k):
        sel = f"s{i}"
        union_prev = " UNION ALL ".join(f"SELECT * FROM s{j}" for j in range(i))
        parts.append(
            f"""pool{i} AS MATERIALIZED (SELECT * FROM ({union_prev}))"""
        )
        parts.append(
            f"""{sel} AS MATERIALIZED (
    SELECT c.id,
           round({lam!r} * c.rel - {1.0 - lam!r} * (
               SELECT max(list_cosine_similarity(c.v, p.v)) FROM pool{i} p
           ), {round_digits}) AS s,
           c.v
    FROM cand c
    WHERE c.id NOT IN (SELECT id FROM pool{i})
    ORDER BY s DESC, c.id
    LIMIT 1
)"""
        )
        prev_sel = sel
    body = parts[0] + ",\n" + ",\n".join(parts[1:])
    rows = "\nUNION ALL\n".join(
        f"SELECT {i + 1} AS rank, id AS {out_id}, s AS mmr_score FROM s{i}"
        for i in range(k)
    )
    return f"{body}\n{rows}"
