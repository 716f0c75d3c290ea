"""Isotonic (monotone) calibration over score bins — the
pool-adjacent-violators fit via its minimax closed form.

Calibrating a classifier's score means fitting a MONOTONE map from
score to empirical positive rate. The isotonic (PAV) solution has a
sequential pooling formulation that distributes badly — but also an
order-free closed form over bins:

    iso(k) = max_{i ≤ k} min_{j ≥ k} mean(y over bins i..j)

(the minimax representation of isotonic regression), where every
segment mean comes from two cumulative INTEGER counts. That turns the
fit into: one data pass to |bins| histogram rows, cumulative windows,
and an O(B³) join over bins — B is ~tens, so the post-aggregation
cost is constant at any corpus scale.

Determinism: segment means are single divisions of exact integers
(identical doubles in both engines); max/min SELECT among identical
values — no float accumulation anywhere.

Complements z63 (fixed-bin calibration table — diagnostic) with the
actual monotone recalibration fit a serving stack applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["isotonic_calibration", "isotonic_oracle_sql"]


def isotonic_calibration(
    df: DataFrame,
    bin_col: Column,
    label: Column,
    round_digits: int = 6,
) -> DataFrame:
    """Per-bin monotone calibration: ``(bin, n, pos, rate, iso_rate)``
    where ``rate`` is the raw positive rate and ``iso_rate`` the
    isotonic fit (non-decreasing in ``bin``)."""
    hist = (
        df.select(
            bin_col.cast("int").alias("bin"), label.cast("int").alias("y")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"))
    )
    w_cum = Window.partitionBy().orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "bin",
        "n",
        "pos",
        F.sum("n").over(w_cum).alias("cn"),
        F.sum("pos").over(w_cum).alias("cp"),
    )
    lo = cum.select(
        F.col("bin").alias("i"),
        (F.col("cn") - F.col("n")).alias("cn_lo"),
        (F.col("cp") - F.col("pos")).alias("cp_lo"),
    )
    hi = cum.select(
        F.col("bin").alias("j"),
        F.col("cn").alias("cn_hi"),
        F.col("cp").alias("cp_hi"),
    )
    seg = lo.crossJoin(hi).filter(F.col("i") <= F.col("j")).select(
        "i",
        "j",
        (
            (F.col("cp_hi") - F.col("cp_lo")).cast("double")
            / (F.col("cn_hi") - F.col("cn_lo")).cast("double")
        ).alias("m"),
    )
    ks = cum.select(F.col("bin").alias("k"))
    inner = (
        seg.crossJoin(ks)
        .filter((F.col("i") <= F.col("k")) & (F.col("j") >= F.col("k")))
        .groupBy("k", "i")
        .agg(F.min("m").alias("mn"))
    )
    iso = inner.groupBy("k").agg(F.max("mn").alias("iso"))
    return (
        cum.join(iso, cum.bin == iso.k)
        .select(
            "bin",
            "n",
            "pos",
            F.round(
                F.col("pos").cast("double") / F.col("n").cast("double"),
                round_digits,
            ).alias("rate"),
            F.round(F.col("iso"), round_digits).alias("iso_rate"),
        )
    )


def isotonic_oracle_sql(
    source_sql: str, round_digits: int = 6
) -> str:
    """DuckDB twin over ``source_sql`` yielding ``(bin, y)`` — same
    cumulative integers, same segment-mean expression, same minimax."""
    return f"""
    WITH src AS ({source_sql}),
    hist AS (
        SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
        FROM src GROUP BY 1
    ),
    cum AS (
        SELECT bin, n, pos,
               CAST(sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cn,
               CAST(sum(pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cp
        FROM hist
    ),
    seg AS (
        SELECT lo.bin AS i, hi.bin AS j,
               CAST(hi.cp - (lo.cp - lo.pos) AS DOUBLE)
               / CAST(hi.cn - (lo.cn - lo.n) AS DOUBLE) AS m
        FROM cum lo JOIN cum hi ON lo.bin <= hi.bin
    ),
    inner_min AS (
        SELECT k.bin AS k, seg.i, min(seg.m) AS mn
        FROM seg JOIN cum k ON seg.i <= k.bin AND seg.j >= k.bin
        GROUP BY 1, 2
    ),
    iso AS (
        SELECT k, max(mn) AS iso FROM inner_min GROUP BY 1
    )
    SELECT cum.bin, cum.n, cum.pos,
           round(CAST(cum.pos AS DOUBLE) / CAST(cum.n AS DOUBLE),
                 {round_digits}) AS rate,
           round(iso.iso, {round_digits}) AS iso_rate
    FROM cum JOIN iso ON cum.bin = iso.k
    """
