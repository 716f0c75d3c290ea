"""One-pass table profiling: per-column nulls, NDV, extrema.

The data-quality primer every large-scale training pipeline runs
before (and after) ingest: a single aggregation pass over the table
produces one profile row per column — row count, null count, distinct
count, and extrema (numeric extrema rounded; string extrema
lexicographic) — the inputs to schema drift checks, join-key sanity
(NDV vs row count), and null-rate gates.

Scale shape: ONE aggregation job. All per-column measures ride a
single ``agg`` over the table (Catalyst plans the multi-DISTINCT via
one Expand + hash aggregate — a single shuffle of |cols|×rows
expanded KEYS, never payloads), and the wide 1-row result is
re-shaped to one-row-per-column with ``stack`` — a narrow projection
of an already-1-row relation, no second pass. At 100 TB switch
``exact_ndv=False``: ``approx_count_distinct`` (HLL++) drops the
Expand entirely and the whole profile becomes one map-side-combined
scan; the exact mode exists because it is differentially provable
(z25's DuckDB oracle) and small-table cheap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]

_NUMERIC_PREFIXES = (
    "int",
    "bigint",
    "smallint",
    "tinyint",
    "double",
    "float",
    "decimal",
)


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    round_digits: int = 6,
    exact_ndv: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: every numeric/string column) →
    one row per column: ``(column, n_rows, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str)``. Numeric extrema are rounded
    to ``round_digits`` (cross-engine-stable doubles); string extrema
    are lexicographic; the inapplicable pair is NULL."""
    dtypes = dict(df.dtypes)
    if columns is None:
        columns = [
            c
            for c, t in df.dtypes
            if t == "string" or t.startswith(_NUMERIC_PREFIXES)
        ]
    if not columns:
        raise ValueError("no profilable columns")
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(columns):
        t = dtypes[c]
        if not (t == "string" or t.startswith(_NUMERIC_PREFIXES)):
            raise ValueError(f"unsupported column type {c}: {t}")
        # backtick-quote so dotted names stay top-level columns
        col = F.col("`" + c.replace("`", "``") + "`")
        nd = (
            F.count_distinct(col)
            if exact_ndv
            else F.approx_count_distinct(col)
        )
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__n{i}")
        )
        aggs.append(nd.alias(f"__d{i}"))
        if t == "string":
            aggs.append(F.min(col).alias(f"__lo{i}"))
            aggs.append(F.max(col).alias(f"__hi{i}"))
        else:
            aggs.append(
                F.round(F.min(col).cast("double"), round_digits).alias(
                    f"__lo{i}"
                )
            )
            aggs.append(
                F.round(F.max(col).cast("double"), round_digits).alias(
                    f"__hi{i}"
                )
            )
    wide = df.agg(*aggs)
    parts = []
    for i, c in enumerate(columns):
        if dtypes[c] == "string":
            num_lo, num_hi = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            str_lo, str_hi = f"__lo{i}", f"__hi{i}"
        else:
            num_lo, num_hi = f"__lo{i}", f"__hi{i}"
            str_lo, str_hi = "CAST(NULL AS STRING)", "CAST(NULL AS STRING)"
        lit = c.replace("'", "''")  # SQL-literal-safe column label
        parts.append(
            f"'{lit}', __rows, CAST(__n{i} AS BIGINT), "
            f"CAST(__d{i} AS BIGINT), {num_lo}, {num_hi}, "
            f"{str_lo}, {str_hi}"
        )
    stack = (
        f"stack({len(columns)}, {', '.join(parts)}) AS "
        "(column, n_rows, n_nulls, n_distinct, "
        "min_num, max_num, min_str, max_str)"
    )
    return wide.selectExpr(stack)
