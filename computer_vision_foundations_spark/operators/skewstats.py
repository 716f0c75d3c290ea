"""Join-skew profiling: the diagnostic you run BEFORE a 100 TB join.

`operators/skewjoin.py` (za36) is the cure (salting); this is the
diagnosis: per-key cardinalities on both sides of a prospective join,
the exact output-row count it would produce (Σ n_a·n_b — computable
from the two count tables without performing the join), and the
concentration of that output in the hottest keys. A key whose
n_a·n_b share is large is exactly the key AQE's skew-join splitting
or za36's salting must handle; the `top_share` column quantifies
whether the default hash join is safe.

Spark-first shape: two map-side-combinable count aggregates (one per
side), an inner join of the two COUNT tables (|distinct keys| rows —
never data), and a global roll-up. Nothing data-sized shuffles; this
is strictly cheaper than the join being diagnosed, which is the
point of a preflight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["join_skew_stats", "join_skew_oracle_sql"]


def join_skew_stats(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top_k: int = 5,
) -> DataFrame:
    """One row: ``(n_keys, out_rows, max_key_rows, top_share)``.

    - ``n_keys``: distinct keys present on BOTH sides (keys on one
      side only contribute nothing to an inner join);
    - ``out_rows``: exact inner-join output size Σ n_a·n_b;
    - ``max_key_rows``: the single hottest key's n_a·n_b;
    - ``top_share``: fraction of out_rows produced by the ``top_k``
      hottest keys (rounded 6) — the salting decision number.
    """
    ca = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count(F.lit(1)).alias("na")
    )
    cb = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    # na·nb in DECIMAL(38,0) (the emd.py overflow pattern): a hot key
    # at 100 TB scale (~3e9 rows per side) squares past int64; BIGINT
    # would silently wrap in non-ANSI Spark while DuckDB's sum()
    # promotes to HUGEINT — a cross-engine divergence exactly in the
    # skewed regime this preflight exists to catch.
    dec = "decimal(38,0)"
    per_key = ca.join(cb, "k").select(
        "k", (F.col("na").cast(dec) * F.col("nb").cast(dec)).alias("rows")
    )
    # top-k hottest keys, ties broken by key for determinism
    topk = (
        per_key.orderBy(F.col("rows").desc(), F.col("k").asc())
        .limit(top_k)
        .agg(F.sum("rows").alias("top_rows"))
    )
    tot = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("rows").alias("out_rows"),
        F.max("rows").alias("max_key_rows"),
    )
    return tot.join(F.broadcast(topk)).select(
        "n_keys",
        F.col("out_rows").cast("long").alias("out_rows"),
        F.col("max_key_rows").cast("long").alias("max_key_rows"),
        F.round(
            F.col("top_rows").cast("double") / F.col("out_rows").cast("double"),
            6,
        ).alias("top_share"),
    )


def join_skew_oracle_sql(
    left_sql: str,
    right_sql: str,
    top_k: int = 5,
) -> str:
    """DuckDB twin over sources each yielding one ``k`` column."""
    return f"""
    WITH ca AS (
        SELECT k, count(*) AS na FROM ({left_sql}) GROUP BY k
    ), cb AS (
        SELECT k, count(*) AS nb FROM ({right_sql}) GROUP BY k
    ), per_key AS (
        -- HUGEINT product before summing: mirrors the engine's
        -- DECIMAL(38,0) accumulation so a hot key cannot wrap int64
        SELECT ca.k AS k,
               CAST(na AS HUGEINT) * CAST(nb AS HUGEINT) AS rows
        FROM ca JOIN cb USING (k)
    ), topk AS (
        SELECT CAST(sum(rows) AS BIGINT) AS top_rows FROM (
            SELECT rows FROM per_key
            ORDER BY rows DESC, k ASC LIMIT {top_k})
    ), tot AS (
        SELECT count(*) AS n_keys,
               CAST(sum(rows) AS BIGINT) AS out_rows,
               CAST(max(rows) AS BIGINT) AS max_key_rows
        FROM per_key
    )
    SELECT n_keys, out_rows, max_key_rows,
           round(CAST(top_rows AS DOUBLE) / CAST(out_rows AS DOUBLE), 6)
               AS top_share
    FROM tot CROSS JOIN topk
    """
