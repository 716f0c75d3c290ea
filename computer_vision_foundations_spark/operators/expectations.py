"""Declarative data-quality expectations over tables.

The lakehouse ingestion pattern the reference's platform popularized
(Delta Live Tables "expectations"): a table carries named boolean
constraints — null checks, range checks, set membership, referential
integrity — and every load reports, per constraint, how many rows
violate it, so quality regressions surface as numbers instead of
downstream job failures. Re-expressed Spark-first:

- all row-local constraints on one table are evaluated in ONE
  aggregate pass (a single scan, one partial/final hash agg — the
  constraint count adds columns, never jobs);
- a referential-integrity expectation is a broadcast-friendly
  left-anti join counted the same way (the orphan side is keys-only,
  so the shuffle carries ids, never payloads);
- output is one tidy relation ``(constraint, n_rows, violations,
  pass_rate)`` — UNION of per-table blocks, trivially monitorable.

At 100 TB this is strictly map-side work per table (the agg's partial
aggregation does the counting in the scan stage); the only shuffles
are the 1-row final aggs and the anti-join's key exchange.

Reference anchor: the ingest notebooks validate loads manually
(`02_Data Ingest.py` display/count checks); this operator is the
systematic form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "check_expectations",
    "referential_integrity",
    "expectations_oracle_sql",
]


def check_expectations(
    df: DataFrame, constraints: dict[str, Column], round_digits: int = 6
) -> DataFrame:
    """``(constraint, n_rows, violations, pass_rate)`` — one row per
    named constraint, all evaluated in ONE aggregate pass over ``df``.
    A NULL constraint value counts as a violation (same convention as
    SQL ``CHECK``: only TRUE passes)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in constraints.items():
        aggs.append(
            F.sum(
                F.when(cond.isNull() | ~cond, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"_v_{name}")
        )
    wide = df.agg(*aggs)
    blocks = [
        wide.select(
            F.lit(name).alias("constraint"),
            F.col("_n").alias("n_rows"),
            F.col(f"_v_{name}").alias("violations"),
            F.round(
                F.when(F.col("_n") > 0,
                       1.0 - F.col(f"_v_{name}") / F.col("_n"))
                .otherwise(F.lit(1.0)),
                round_digits,
            ).alias("pass_rate"),
        )
        for name in constraints
    ]
    out = blocks[0]
    for b in blocks[1:]:
        out = out.unionByName(b)
    return out


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str,
    round_digits: int = 6,
) -> DataFrame:
    """Same output shape as :func:`check_expectations` for one
    referential-integrity expectation: ``violations`` = child rows
    whose key has no parent (NULL child keys violate too, matching the
    row-local NULL convention). The orphan probe is a keys-only
    left-anti join — broadcastable when the parent key set is
    dimension-sized."""
    total = child.agg(F.count(F.lit(1)).alias("_n"))
    orphans = (
        child.select(F.col(child_key).alias("_k"))
        .join(
            parent.select(F.col(parent_key).alias("_k")).distinct(),
            "_k",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("_v"))
    )
    return total.crossJoin(orphans).select(
        F.lit(name).alias("constraint"),
        F.col("_n").alias("n_rows"),
        F.col("_v").alias("violations"),
        F.round(
            F.when(F.col("_n") > 0, 1.0 - F.col("_v") / F.col("_n"))
            .otherwise(F.lit(1.0)),
            round_digits,
        ).alias("pass_rate"),
    )


def expectations_oracle_sql(
    table: str, constraints: dict[str, str], round_digits: int = 6
) -> str:
    """DuckDB twin of :func:`check_expectations`: one scan per block
    via a shared aggregate CTE, identical NULL-violates semantics."""
    cols = ", ".join(
        f"sum(CASE WHEN ({sql}) IS NULL OR NOT ({sql}) THEN 1 ELSE 0 END)"
        f" AS v_{i}"
        for i, sql in enumerate(constraints.values())
    )
    blocks = " UNION ALL ".join(
        f"""
        SELECT '{name}' AS constraint, n AS n_rows,
               CAST(v_{i} AS BIGINT) AS violations,
               round(CASE WHEN n > 0 THEN 1.0 - v_{i} / CAST(n AS DOUBLE)
                          ELSE 1.0 END, {round_digits}) AS pass_rate
        FROM agg
        """
        for i, name in enumerate(constraints)
    )
    return f"""
    WITH agg AS (
        SELECT count(*) AS n, {cols} FROM {table}
    )
    {blocks}
    """
