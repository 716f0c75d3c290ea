"""Fellegi-Sunter probabilistic record linkage scoring.

Entity resolution's decision layer (Fellegi & Sunter 1969, the model
behind Splink and every MDM suite): candidate pairs from a blocked
generator get one agreement bit per comparison field, each bit
contributing its evidence weight

    agree:    log2(m_i / u_i)
    disagree: log2((1 − m_i) / (1 − u_i))

where m is P(agree | true match) and u is P(agree | non-match). The
summed weight ranks pairs; thresholds split match / review / reject.
In production the m/u parameters come from EM over the comparison
patterns; here they are caller-supplied literals (the engine's
literal-model convention), which keeps the entire scorer
differential-testable.

Spark-first shape: candidate generation stays with the blocked fuzzy
join (`operators/fuzzy.py` — never quadratic); scoring joins the
pair ids back to the (small) attribute projections and evaluates the
weight algebra in codegen. One equi-join per side, no UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fs_link_scores", "fs_weight_sql"]


def _weight(agree: Column, m: float, u: float) -> Column:
    wa = math.log2(m / u)
    wd = math.log2((1 - m) / (1 - u))
    return F.when(agree, F.lit(wa)).otherwise(F.lit(wd))


def fs_link_scores(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str,
    fields: list[tuple[Column, float, float, str]],
    a: str = "id_a",
    b: str = "id_b",
    match_threshold: float = 2.0,
    review_threshold: float = 0.0,
) -> DataFrame:
    """``(id_a, id_b, weight, decision)`` — summed Fellegi-Sunter
    evidence and the match/review/reject split.

    ``fields`` is a list of ``(agreement_expr, m, u, name)`` where the
    expression may reference any record column suffixed ``_a`` / ``_b``
    (both sides' attributes are joined in before evaluation). Weight
    rounded 6.
    """
    cols_a = records.select(
        F.col(id_col).alias(a),
        *[F.col(c).alias(f"{c}_a") for c in records.columns if c != id_col],
    )
    cols_b = records.select(
        F.col(id_col).alias(b),
        *[F.col(c).alias(f"{c}_b") for c in records.columns if c != id_col],
    )
    joined = pairs.join(cols_a, a).join(cols_b, b)
    total = None
    for agree, m, u, _name in fields:
        w = _weight(agree, m, u)
        total = w if total is None else total + w
    decision = (
        F.when(F.col("weight") >= match_threshold, F.lit("match"))
        .when(F.col("weight") >= review_threshold, F.lit("review"))
        .otherwise(F.lit("reject"))
    )
    return (
        joined.select(a, b, F.round(total, 6).alias("weight"))
        .withColumn("decision", decision)
        .orderBy(a, b)
    )


def fs_weight_sql(
    fields: list[tuple[str, float, float]],
) -> str:
    """SQL expression summing the same literal weights over
    ``(agree_sql, m, u)`` terms (agree_sql references the joined
    pair's ``*_a`` / ``*_b`` columns)."""
    terms = []
    for agree_sql, m, u in fields:
        wa = math.log2(m / u)
        wd = math.log2((1 - m) / (1 - u))
        terms.append(
            f"CASE WHEN {agree_sql} THEN {wa!r} ELSE {wd!r} END"
        )
    return " + ".join(f"({t})" for t in terms)
