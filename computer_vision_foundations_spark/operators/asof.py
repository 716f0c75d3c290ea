"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the single right row with the greatest
``right_ts <= left_ts`` (direction='backward') or smallest
``right_ts >= left_ts`` (direction='forward') sharing the same key —
the quotes-to-trades / feature-snapshot join every event pipeline
needs (pandas ``merge_asof``, DuckDB ``ASOF JOIN``).

Implementation is the scalable union-merge formulation, not a range
self-join and not a cogrouped pandas pass:

1. tag both inputs and ``unionByName(allowMissingColumns=True)`` so
   each side's private columns are null on the other side's rows;
2. one window per key, ordered by ``(ts, side)`` with right rows
   sorting before left rows at equal timestamps (inclusive match);
3. running ``last(right_struct, ignorenulls=True)`` carries the most
   recent right row forward to every left row.

Cost: exactly ONE hash shuffle on the join key and a sort within
each partition — the same price as any co-partitioned join. The
running frame ``rowsBetween(unboundedPreceding, currentRow)`` with
``last()`` is evaluated incrementally (O(1) per row, no frame
buffering), so a key with a billion rows streams through without
materializing the window. All right-side columns travel inside ONE
struct so the matched values always come from the SAME right row
(per-column ``last(ignorenulls)`` could mix rows when right columns
themselves contain nulls).

At 100 TB: skewed keys land on one reducer like any keyed window —
pre-split hot keys by time range (coarse bucket appended to the key,
with per-bucket seed rows) if a single entity dominates; for the
fixture workloads AQE handles it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["as_of_join"]


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's
    columns (null when no match exists yet / anymore).

    on          join key column name(s), present in both inputs.
    left_ts     event-time column on the left.
    right_ts    event-time column on the right (default: ``left_ts``).
    right_cols  right columns to attach (default: everything except
                the keys). Names colliding with a left column get
                ``suffix`` appended (so a shared ``ts`` name yields
                ``ts_right`` — the match time is always inspectable).
    direction   'backward' (right_ts <= left_ts, the default) or
                'forward' (right_ts >= left_ts). Ties at equal
                timestamps match (inclusive), as in pandas/DuckDB.
    tolerance   optional SQL interval string (e.g. ``'1 hour'``):
                matches further than this from the left timestamp are
                nulled out, like pandas ``merge_asof(tolerance=...)``.

    Right rows must be unique per (key, right_ts) for a deterministic
    result — the same requirement DuckDB's ASOF JOIN has.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    if rts not in right_cols:
        right_cols = [rts] + list(right_cols)

    def out_name(c: str) -> str:
        return c + suffix if c in left.columns else c

    payload = F.struct(
        *[F.col(c).alias(out_name(c)) for c in right_cols]
    ).alias("_asof_payload")
    r = right.select(*keys, F.col(rts).alias("_asof_ts"), payload)
    l = left.withColumn("_asof_ts", F.col(left_ts))
    # Right rows sort before left rows at equal _asof_ts (side 0 < 1)
    # so an exactly-simultaneous right row is visible to the left row.
    u = l.withColumn("_asof_side", F.lit(1)).unionByName(
        r.withColumn("_asof_side", F.lit(0)), allowMissingColumns=True
    )
    ts_order: Column = (
        F.col("_asof_ts").asc()
        if direction == "backward"
        else F.col("_asof_ts").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("_asof_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_asof_payload", ignorenulls=True).over(w)
    out = (
        u.withColumn("_asof_match", matched)
        .filter(F.col("_asof_side") == 1)
        .drop("_asof_payload", "_asof_side")
    )
    if tolerance is not None:
        mts = F.col("_asof_match")[out_name(rts)]
        iv = F.expr(f"INTERVAL {tolerance}")
        in_range = (
            (mts >= F.col("_asof_ts") - iv)
            if direction == "backward"
            else (mts <= F.col("_asof_ts") + iv)
        )
        out = out.withColumn(
            "_asof_match",
            F.when(in_range, F.col("_asof_match")),
        )
    for c in right_cols:
        out = out.withColumn(
            out_name(c), F.col("_asof_match")[out_name(c)]
        )
    return out.drop("_asof_ts", "_asof_match")
