"""Hierarchical time rollup — hypertable-style continuous aggregates.

Multi-granularity time-bucketed aggregation (hour + day + month in
one result) the way a time-series store materializes it: the RAW data
is scanned and hash-aggregated exactly ONCE, at the finest
granularity; every coarser level re-aggregates the previous level's
partials (a day from 24 hourly rows, a month from ~30 daily rows).

Versus the naive alternatives:
- three separate group-bys → three full scans + three full shuffles
  of the raw data;
- GROUPING SETS ((hour),(day),(month)) → one scan but the expand
  operator replicates every raw row 3× into the shuffle.
Here the raw shuffle happens once and the follow-up shuffles move
only already-aggregated rows (~1/720th and ~1/30th the size) — at
100 TB that is the difference between one pass and three.

Only mergeable aggregates participate (sum/count/min/max — the
partial-aggregatable ones); ratios like avg are derived afterwards
from sum/count columns, never rolled up directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.ranges import epoch_micros

__all__ = ["time_rollup", "gap_fill_locf"]

# fn applied at the base level; the SAME column merges with `merge` above it
_AGG_FNS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def time_rollup(
    df: DataFrame,
    ts_col: str,
    aggs: dict[str, tuple[str, str]],
    granularities: tuple[str, ...] = ("hour", "day", "month"),
    keys: list[str] | None = None,
) -> DataFrame:
    """Aggregate ``df`` at every granularity in fine-to-coarse order.

    aggs           {out_col: (src_col, fn)} with fn in sum|count|min|max.
    granularities  ``date_trunc`` units, FINEST FIRST (each coarser
                   level is computed from the previous level's rows).
    keys           optional extra grouping columns kept at every level.

    Returns one DataFrame with ``granularity`` (string), ``bucket``
    (timestamp), the key columns, and one column per agg.
    """
    keys = keys or []
    for out, (_, fn) in aggs.items():
        if fn not in _AGG_FNS:
            raise ValueError(f"unsupported agg {fn!r} for {out!r}")

    fine = granularities[0]
    base_exprs = [
        _AGG_FNS[fn][0](src).alias(out) for out, (src, fn) in aggs.items()
    ]
    level = (
        df.withColumn("bucket", F.date_trunc(fine, F.col(ts_col)))
        .groupBy("bucket", *keys)
        .agg(*base_exprs)
        .withColumn("granularity", F.lit(fine))
    )
    out_cols = ["granularity", "bucket", *keys, *aggs.keys()]
    levels = [level.select(*out_cols)]
    for g in granularities[1:]:
        merge_exprs = [
            _AGG_FNS[fn][1](out).alias(out) for out, (_, fn) in aggs.items()
        ]
        level = (
            level.withColumn("bucket", F.date_trunc(g, F.col("bucket")))
            .groupBy("bucket", *keys)
            .agg(*merge_exprs)
            .withColumn("granularity", F.lit(g))
        )
        levels.append(level.select(*out_cols))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def gap_fill_locf(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    step_seconds: int,
    agg: str = "avg",
) -> DataFrame:
    """Regular per-key time grid with last-observation-carried-forward —
    the hypertable ``time_bucket_gapfill + locf`` shape: observations
    bucket to a regular grid (one hash agg), each key's grid spans its
    own [min, max] bucket (``sequence`` + explode — rows materialize
    only for that key's span), and empty buckets inherit the previous
    bucket's value via an IGNORE-NULLS running ``last`` window.

    Returns ``(key, bucket_ts, value, filled)`` where ``filled`` marks
    carried-forward rows. Plan: agg shuffle on (key, bucket) + one
    window shuffle on key — the generated grid is (span/step) rows per
    key, never a global calendar cross-join. Leading gaps (before a
    key's first observation) stay NULL."""
    b = F.floor(epoch_micros(df, ts_col) / F.lit(step_seconds * 1_000_000))
    agg_fn = getattr(F, agg)
    per_bucket = (
        df.select(F.col(key_col).alias("key"), b.alias("_b"),
                  F.col(value_col).alias("_v"))
        .groupBy("key", "_b")
        .agg(agg_fn("_v").alias("_vb"))
    )
    spans = per_bucket.groupBy("key").agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    grid = spans.select(
        "key", F.explode(F.sequence("_lo", "_hi")).alias("_b")
    )
    joined = grid.join(per_bucket, ["key", "_b"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "key",
        F.timestamp_seconds(F.col("_b") * step_seconds).alias("bucket_ts"),
        F.last("_vb", ignorenulls=True).over(w).alias("value"),
        F.col("_vb").isNull().alias("filled"),
    )
