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

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fs_link_scores",
    "fs_weight_sql",
    "jaro_winkler_udf",
    "jaro_winkler_blocked_pairs",
]


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


def jaro_winkler_udf():
    """Arrow-batched Jaro–Winkler similarity (Winkler 1990) — the
    record-linkage string comparator, implemented to BIT-PARITY with
    DuckDB's native ``jaro_winkler_similarity`` so the differential
    oracle can replay scores exactly (verified on 9,008 random +
    classic cases, 0 mismatches): scaling p=0.1, max prefix 4, the
    prefix bonus applied only when jaro > 0.7 (the boost threshold),
    and 0.0 for any empty input (DuckDB's convention, including
    empty-vs-empty). The Jaro core is exact rational arithmetic on
    small ints (m, t, lengths), so the doubles agree to the last bit
    across engines.

    Per-pair work is O(|a|·|b|) like levenshtein — a VERIFY-stage
    comparator to run on blocked candidates, never corpus².

    NOTE (r13, measured — do not re-try): a numpy vectorize-across-
    pairs rewrite of this loop was built to full bit-parity (20,010
    cases, 0 mismatches) and measured only ~1.4× on the realistic
    40-char-prefix shape — and SLOWER than this scalar loop below
    ~10k-pair Arrow batches — because the matching loop's
    first-unmatched-j state limits vectorization to the pair axis
    (40×39 masked vector ops per batch). The comparator is ~0.3 s of
    q28's 2.1 s at sf0.1 (already Arrow-batched and parallel), so the
    complexity was rejected; evidence in
    plans/r13/AB_JW_VECTORIZE.json."""
    from pyspark.sql.functions import pandas_udf

    def _jw(a: str, b: str) -> float:
        if a is None or b is None:
            return None
        la, lb = len(a), len(b)
        if la == 0 or lb == 0:
            return 0.0
        window = max(la, lb) // 2 - 1
        if window < 0:
            window = 0
        ma = [False] * la
        mb = [False] * lb
        m = 0
        for i in range(la):
            lo, hi = max(0, i - window), min(lb, i + window + 1)
            ai = a[i]
            for j in range(lo, hi):
                if not mb[j] and ai == b[j]:
                    ma[i] = mb[j] = True
                    m += 1
                    break
        if m == 0:
            return 0.0
        t = 0
        jj = 0
        for i in range(la):
            if ma[i]:
                while not mb[jj]:
                    jj += 1
                if a[i] != b[jj]:
                    t += 1
                jj += 1
        jaro = (m / la + m / lb + (m - t // 2) / m) / 3.0
        if jaro <= 0.7:
            return jaro
        pl = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            pl += 1
        return jaro + pl * 0.1 * (1.0 - jaro)

    @pandas_udf("double")
    def _jw_batch(a: pd.Series, b: pd.Series) -> pd.Series:
        # tolist() first: iterating a pandas Series yields numpy str_
        # boxes whose char indexing is several times slower than plain
        # python str — measured 2.6 ms vs ~0.4 ms per 40-char pair
        return pd.Series(
            [_jw(x, y) for x, y in zip(a.tolist(), b.tolist())],
            dtype="float64",
        )

    return _jw_batch


def jaro_winkler_blocked_pairs(
    df,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    threshold: float = 0.8,
    prefix_chars: int = 40,
):
    """Candidate pairs by equi-join on ``block_cols`` (id_a < id_b),
    verified with Jaro–Winkler over ``prefix_chars``-char prefixes:
    ``(id_a, id_b, jw r6)`` with jw >= threshold. The blocking keeps
    the comparator off corpus² — same discipline as the q-gram
    levenshtein pipeline (`operators/fuzzy`), with JW as the
    typo-tolerant, prefix-weighted comparator record linkage
    actually uses for names/titles."""
    from pyspark.sql import functions as F

    from computer_vision_foundations_spark.operators.parallelism import (
        widen_if_under_parallel,
    )

    jw = jaro_winkler_udf()
    s = F.substring(F.col(text_col), 1, prefix_chars)
    # widen the PROBE side before the broadcast join: the comparator's
    # parallelism is the join output's, which a single-file scan pins
    # to 1 task (measured: 159k pairs scored serially, ~13 s at sf0.1
    # vs ~1.5 s spread across local[32]). A post-join repartition is
    # the WRONG fix — Catalyst pushes the UDF-bearing filter below the
    # exchange (back to serial) and re-evaluates the UDF above it.
    left = widen_if_under_parallel(
        df.select(*block_cols, F.col(id_col).alias("id_a"), s.alias("_sa"))
    )
    right = df.select(
        *block_cols, F.col(id_col).alias("id_b"), s.alias("_sb")
    )
    return (
        left.join(right, block_cols)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("_jw", jw(F.col("_sa"), F.col("_sb")))
        .where(F.col("_jw") >= F.lit(threshold))
        .select("id_a", "id_b", F.round("_jw", 6).alias("jw"))
    )
