"""Per-key 2-D skyline (Pareto frontier) without a quadratic join.

A row is ON the skyline iff no other row of the same key dominates it
— here: no other order is both at-least-as-expensive AND
at-least-as-early with one strict. The naive formulation is a
per-key O(k²) NOT EXISTS self-join (which the oracle deliberately
runs); the distributed formulation is two window passes over one
per-key sort:

    dominated ⟺ max(value) over STRICTLY EARLIER ord ≥ value
              ∨ max(value) over SAME ord > value

The "strictly earlier" frame is a RANGE frame ending at 1 PRECEDING
on an integer order column — rows sharing the current ord are
excluded, which is exactly the tie semantics dominance needs (an
equal-ord row only dominates with strictly greater value, the second
predicate). Both engines implement identical RANGE-frame semantics,
so the window rewrite is hash-verified against the quadratic truth.

Scale shape: one (key)-partitioned sort feeds both windows (Catalyst
collapses them); no self-join, no global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline_2d", "skyline_oracle_sql"]


def skyline_2d(
    df: DataFrame,
    key_col: str,
    ord_col: str | Column,
    value_col: str | Column,
) -> DataFrame:
    """Rows of ``df`` on the per-``key`` skyline: minimal ``ord``,
    maximal ``value``. ``ord_col`` must be integer-typed (RANGE
    frame). Input columns are passed through unchanged."""
    o = F.col(ord_col) if isinstance(ord_col, str) else ord_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    tagged = df.withColumn("_ord", o).withColumn("_val", v)
    earlier = Window.partitionBy(key_col).orderBy("_ord").rangeBetween(
        Window.unboundedPreceding, -1
    )
    same = Window.partitionBy(key_col, "_ord")
    best_earlier = F.max("_val").over(earlier)
    best_same = F.max("_val").over(same)
    return (
        tagged.withColumn(
            "_dominated",
            (
                best_earlier.isNotNull()
                & (best_earlier >= F.col("_val"))
            )
            | (best_same > F.col("_val")),
        )
        .filter(~F.col("_dominated"))
        .drop("_ord", "_val", "_dominated")
    )


def skyline_oracle_sql(
    source_sql: str,
    out_cols: str,
) -> str:
    """Quadratic NOT-EXISTS truth over ``source_sql`` yielding
    ``(key, ord, val, …out_cols)``."""
    return f"""
    WITH src AS ({source_sql})
    SELECT {out_cols}
    FROM src a
    WHERE NOT EXISTS (
      SELECT 1 FROM src b
      WHERE b.key = a.key
        AND b.val >= a.val AND b.ord <= a.ord
        AND (b.val > a.val OR b.ord < a.ord))
    """
