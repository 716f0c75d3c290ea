"""Range joins (point-in-interval, interval-overlap) at scale.

Spark plans a pure range predicate — ``a.ts BETWEEN b.start AND
b.end`` with no equi key — as BroadcastNestedLoopJoin: every left row
against every right row, quadratic, a 100 TB non-starter. The classic
fix (Flink/Trino interval joins, DuckDB's IEJoin addresses the same
problem engine-side) is to manufacture an equi key: quantize time into
fixed-width buckets, replicate each interval into every bucket it
touches, and hash-join on the bucket id with the exact range predicate
as a residual filter. Cost: replication factor = interval_len/width +
1 on the interval side only; the join itself is a plain shuffled hash
join Catalyst already knows how to distribute, salt, and AQE-split.

Pick ``bucket_width`` close to the typical interval length: wider
buckets mean fewer replicas but more residual-filter waste, narrower
the reverse. When the inputs share an equi key (e.g. user_id) pass
``on=`` instead — with a key the join is already hash-partitionable
and bucketizing would only add replication.

Timestamps are quantized on ``unix_micros`` (exact integer math, no
float rounding at bucket edges); plain numeric columns quantize as-is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["range_join", "interval_overlap_join", "epoch_micros"]


def epoch_micros(df: DataFrame, col: str):
    """Zone-safe epoch-microsecond expression for a timestamp column.

    NTZ is a zone-less wall clock: derive epoch micros with pure
    field arithmetic, never via a session-zone cast. Casting NTZ
    to TIMESTAMP maps local time through the session zone, which
    is non-monotonic across DST spring-forward gaps — a point
    whose local time falls in a gap could land in a bucket its
    interval never explodes into, silently dropping a match.
    unix_date/hour/minute/extract(SECOND) read NTZ fields
    directly, so this is deterministic under any session zone.
    Shared by range joins and the funnel operator (any monotonic
    ordering consumer)."""
    dtype = df.schema[col].dataType
    if isinstance(dtype, T.TimestampNTZType):
        c = F.col(col)
        return (
            F.unix_date(c.cast("date")).cast("long") * F.lit(86_400_000_000)
            + F.hour(c).cast("long") * F.lit(3_600_000_000)
            + F.minute(c).cast("long") * F.lit(60_000_000)
            + (F.date_part(F.lit("SECOND"), c) * 1_000_000).cast("long")
        )
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(F.col(col))
    return F.col(col)


def _axis(df: DataFrame, col: str, bucket_width: float):
    """(numeric column for bucketing, bucket width in axis units)."""
    dtype = df.schema[col].dataType
    if isinstance(dtype, (T.TimestampNTZType, T.TimestampType)):
        return epoch_micros(df, col), int(bucket_width * 1_000_000)
    return F.col(col), bucket_width


def _suffixed(df: DataFrame, other_cols: list[str], suffix: str) -> DataFrame:
    for c in df.columns:
        if c in other_cols:
            df = df.withColumnRenamed(c, c + suffix)
    return df


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    start: str,
    end: str,
    on: str | list[str] | None = None,
    bucket_width: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Inner join: left rows whose ``point`` falls in the right row's
    ``[start, end]`` (inclusive both ends). Result = left columns +
    right columns (right names colliding with left get ``suffix``).

    With ``on`` (equi keys present in both inputs): a plain equi join
    with the range predicate — already scalable, no bucketing.
    Without: ``bucket_width`` is required (seconds for timestamp
    axes); each interval is exploded into the buckets it covers and
    the join runs on the bucket id. A (left, right) pair can only
    meet in the point's single bucket, so no dedup is needed.
    """
    overlap = list(set(left.columns) & set(right.columns))
    right = _suffixed(right, overlap, suffix)
    r_start = start + suffix if start in overlap else start
    r_end = end + suffix if end in overlap else end
    cond = (F.col(point) >= F.col(r_start)) & (F.col(point) <= F.col(r_end))
    if on is not None:
        keys = [on] if isinstance(on, str) else list(on)
        renamed = [k + suffix if k in overlap else k for k in keys]
        eq: Column = left[keys[0]] == right[renamed[0]]
        for k, rk in zip(keys[1:], renamed[1:]):
            eq = eq & (left[k] == right[rk])
        return left.join(right, eq, "inner").filter(cond)
    if bucket_width is None:
        raise ValueError("bucket_width is required when no equi key is given")
    p_axis, w = _axis(left, point, bucket_width)
    s_axis, _ = _axis(right, r_start, bucket_width)
    e_axis, _ = _axis(right, r_end, bucket_width)
    l = left.withColumn("_rj_bucket", F.floor(p_axis / w))
    r = right.withColumn(
        "_rj_bucket",
        F.explode(F.sequence(F.floor(s_axis / w), F.floor(e_axis / w))),
    )
    return l.join(r, "_rj_bucket", "inner").filter(cond).drop("_rj_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: str | list[str] | None = None,
    bucket_width: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Inner join on interval overlap: ``l.start <= r.end AND r.start
    <= l.end`` (closed intervals). Same bucketing strategy as
    :func:`range_join`, except BOTH sides explode, so a pair can meet
    in several buckets — it is kept only in the first bucket both
    intervals cover (``max(floor(l.start/w), floor(r.start/w))``),
    which dedups without a shuffle."""
    overlap = list(set(left.columns) & set(right.columns))
    right = _suffixed(right, overlap, suffix)
    r_start = right_start + suffix if right_start in overlap else right_start
    r_end = right_end + suffix if right_end in overlap else right_end
    cond = (F.col(left_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(left_end)
    )
    if on is not None:
        keys = [on] if isinstance(on, str) else list(on)
        renamed = [k + suffix if k in overlap else k for k in keys]
        eq: Column = left[keys[0]] == right[renamed[0]]
        for k, rk in zip(keys[1:], renamed[1:]):
            eq = eq & (left[k] == right[rk])
        return left.join(right, eq, "inner").filter(cond)
    if bucket_width is None:
        raise ValueError("bucket_width is required when no equi key is given")
    ls_axis, w = _axis(left, left_start, bucket_width)
    le_axis, _ = _axis(left, left_end, bucket_width)
    rs_axis, _ = _axis(right, r_start, bucket_width)
    re_axis, _ = _axis(right, r_end, bucket_width)
    l = left.withColumn("_rj_s", F.floor(ls_axis / w)).withColumn(
        "_rj_bucket", F.explode(F.sequence(F.floor(ls_axis / w), F.floor(le_axis / w)))
    )
    r = right.withColumn("_rj_s", F.floor(rs_axis / w).alias("_rj_s")).withColumn(
        "_rj_bucket", F.explode(F.sequence(F.floor(rs_axis / w), F.floor(re_axis / w)))
    )
    r = r.withColumnRenamed("_rj_s", "_rj_s_r")
    return (
        l.join(r, "_rj_bucket", "inner")
        .filter(cond)
        .filter(F.col("_rj_bucket") == F.greatest("_rj_s", "_rj_s_r"))
        .drop("_rj_bucket", "_rj_s", "_rj_s_r")
    )
