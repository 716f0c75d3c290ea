"""Cross-source quantile normalization of score columns.

Mixing corpora means mixing INCOMPARABLE score scales: source A's
quality classifier saturates at 0.9, source B's tops out at 0.4, and
any global threshold silently keeps one and drops the other. Quantile
normalization (the microarray-analysis standard, Bolstad 2003) fixes
it by replacing each value with the GLOBAL distribution's value at
the same within-source rank fraction — after the transform every
source has the same score distribution, and one threshold means one
thing.

Relational form (exact, engine-agnostic):

- within each source: ``p = percent_rank()`` (0..1, the min-max
  anchored fraction);
- globally: the sorted score table with row numbers 1..n;
- the mapped value is the linear interpolation of the global sorted
  values at position ``1 + p·(n−1)`` — two integer equi-joins
  (floor/ceil row) + one lerp, exactly ``quantile_cont`` semantics
  evaluated at a per-row p.

Spark-first shape: one window per source for p; the GLOBAL row
numbering is two-phase (range-partition on the sort key →
per-partition row_number + broadcast cumulative offsets), so no
single task ever sorts the whole corpus — the naive
``Window.orderBy`` global window funnels everything through one
partition, which is exactly the 100 TB bottleneck this avoids; two
broadcast-friendly integer joins finish the lerp. The only collect is
the partition-count list (|partitions| longs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "global_row_number",
    "global_cumulative_sums",
    "quantile_normalize",
    "qnorm_oracle_sql",
]


def global_row_number(
    df: DataFrame, order_cols: list[str], out: str = "rn"
) -> DataFrame:
    """Scale-safe global 1-based row numbering by ``order_cols``
    (must be a TOTAL order — include a unique tiebreaker).

    ``Window.orderBy`` with no partition key moves the entire input
    through ONE task; this instead range-partitions on the key
    (non-overlapping sorted ranges), numbers within each partition,
    and adds broadcast cumulative offsets — identical output, and
    every task sorts only its slice. The offsets collect is
    |partitions| rows.

    The range-partitioned frame is materialized ONCE
    (localCheckpoint) before anything reads it: RangePartitioner
    derives its sampling seed from the RDD id, so the offsets job and
    the ranking job would otherwise re-sample DIFFERENT boundaries —
    offsets against one partitioning applied to another silently
    corrupts global ranks (caught by the 5× sweep at sf0.1; sf0.01
    was too small to diverge).
    """
    part = (
        df.repartitionByRange(
            df.sparkSession.sparkContext.defaultParallelism, *order_cols
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["_pid"]: r["c"]
        for r in part.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for pid in sorted(offsets)
                for x in (pid, offsets[pid])
            ]
        ),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return part.withColumn(
        out, (F.row_number().over(w) + off_expr).cast("long")
    ).drop("_pid")


def global_cumulative_sums(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: list[str],
    suffix: str = "_cum",
    lead_col: str | None = None,
    lead_out: str = "_lead",
) -> DataFrame:
    """Scale-safe GLOBAL running sums of ``sum_cols`` in ``order_cols``
    order (must be a total order) — the cumulative-sum twin of
    `global_row_number`, for ECDF-style constructions (e.g. the KS
    statistic's pooled cumulative counts).

    Same two-phase shape: range-partition on the sort key
    (non-overlapping sorted ranges, materialized once so the offsets
    job and the window job see the SAME boundaries), per-partition
    window sums, plus broadcast per-partition prefix offsets. The only
    collect is |partitions| rows of per-partition totals. Integer
    inputs stay exact (order-free); float inputs inherit the usual
    reduction-order caveat — callers feeding the driver hash should
    sum integers.

    ``lead_col`` additionally emits ``lead_out`` = the NEXT row's
    value of that column in global ``order_cols`` order (NULL on the
    global last row) without a single-task window: within-partition
    ``lead`` plus a broadcast {pid → next non-empty partition's first
    value} map for each partition's last row — the scale-safe twin of
    ``F.lead().over(Window.orderBy(...))`` for support-gap
    constructions (EMD/W1).
    """
    part = (
        df.repartitionByRange(
            df.sparkSession.sparkContext.defaultParallelism, *order_cols
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    firsts = (
        [F.min_by(F.col(lead_col), F.struct(*order_cols)).alias("_first")]
        if lead_col
        else []
    )
    totals = (
        part.groupBy("_pid")
        .agg(*[F.sum(c).alias(c) for c in sum_cols], *firsts)
        .collect()
    )
    offsets: dict[int, dict[str, float]] = {}
    acc = {c: 0 for c in sum_cols}
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = dict(acc)
        for c in sum_cols:
            acc[c] += row[c] or 0
    w = Window.partitionBy("_pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = part
    for c in sum_cols:
        off = F.element_at(
            F.create_map(
                *[
                    F.lit(x)
                    for pid in sorted(offsets)
                    for x in (pid, offsets[pid][c])
                ]
            ),
            F.col("_pid"),
        )
        out = out.withColumn(c + suffix, F.sum(c).over(w) + off)
    if lead_col:
        # pid -> first lead_col value of the NEXT non-empty partition;
        # lead_col must be non-null (a mid-partition NULL would be
        # indistinguishable from the partition-boundary fill case)
        by_pid = {r["_pid"]: r["_first"] for r in totals}
        ne = sorted(by_pid)
        nxt = {p: by_pid[q] for p, q in zip(ne, ne[1:])}
        wl = Window.partitionBy("_pid").orderBy(*order_cols)
        fill = (
            F.element_at(
                F.create_map(
                    *[F.lit(x) for p in sorted(nxt) for x in (p, nxt[p])]
                ),
                F.col("_pid"),
            )
            if nxt
            else F.lit(None)
        )
        out = out.withColumn(
            lead_out, F.coalesce(F.lead(lead_col).over(wl), fill)
        )
    return out.drop("_pid")


def quantile_normalize(
    df: DataFrame,
    score_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, grp, score, qnorm)`` — the score mapped onto the global
    distribution at its within-group rank fraction, rounded 6."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(score_col).cast("double").alias("score"),
    ).where(F.col(score_col).isNotNull())
    p = F.percent_rank().over(
        Window.partitionBy("grp").orderBy("score", "id")
    )
    ranked = base.select("id", "grp", "score", p.alias("p"))
    glob = global_row_number(base, ["score", "id"]).select(
        "rn", F.col("score").alias("gv")
    )
    n = base.agg(F.count(F.lit(1)).alias("n"))
    pos = F.lit(1.0) + F.col("p") * (F.col("n") - F.lit(1))
    with_pos = ranked.crossJoin(F.broadcast(n)).select(
        "id",
        "grp",
        "score",
        F.floor(pos).cast("long").alias("lo_rn"),
        F.ceil(pos).cast("long").alias("hi_rn"),
        (pos - F.floor(pos)).alias("frac"),
    )
    lo = glob.select(F.col("rn").alias("lo_rn"), F.col("gv").alias("lo_v"))
    hi = glob.select(F.col("rn").alias("hi_rn"), F.col("gv").alias("hi_v"))
    return (
        with_pos.join(lo, "lo_rn")
        .join(hi, "hi_rn")
        .select(
            "id",
            "grp",
            "score",
            F.round(
                F.col("lo_v")
                + F.col("frac") * (F.col("hi_v") - F.col("lo_v")),
                6,
            ).alias("qnorm"),
        )
        .orderBy("id")
    )


def qnorm_oracle_sql(
    table: str = "documents",
    score_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin — identical rank fractions, row-number grid, and
    lerp."""
    return f"""
    WITH base AS (
        SELECT {id_col} AS id, {group_col} AS grp,
               CAST({score_col} AS DOUBLE) AS score
        FROM {table} WHERE {score_col} IS NOT NULL
    ), ranked AS (
        SELECT id, grp, score,
               percent_rank() OVER (
                   PARTITION BY grp ORDER BY score, id) AS p
        FROM base
    ), gq AS (
        SELECT row_number() OVER (ORDER BY score, id) AS rn,
               score AS gv
        FROM base
    ), n AS (SELECT count(*) AS n FROM base),
    with_pos AS (
        SELECT id, grp, score,
               CAST(floor(1.0 + p * (n - 1)) AS BIGINT) AS lo_rn,
               CAST(ceil(1.0 + p * (n - 1)) AS BIGINT) AS hi_rn,
               (1.0 + p * (n - 1)) - floor(1.0 + p * (n - 1)) AS frac
        FROM ranked CROSS JOIN n
    )
    SELECT id, grp, score,
           round(lo.gv + frac * (hi.gv - lo.gv), 6) AS qnorm
    FROM with_pos
    JOIN gq lo ON lo.rn = with_pos.lo_rn
    JOIN gq hi ON hi.rn = with_pos.hi_rn
    ORDER BY id
    """
