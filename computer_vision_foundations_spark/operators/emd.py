"""Exact 1-D Wasserstein-1 (earth mover's) distance between two
empirical distributions (exact rational accumulation — see design
note below; the float divide happens once, after the integer sum).

For 1-D distributions W1 has a closed form: the integral of the
absolute difference of the two CDFs,

    W1 = ∫ |F_A(x) − F_B(x)| dx
       = Σ_support |F_A(x_i) − F_B(x_i)| · (x_{i+1} − x_i),

so it needs no optimal-transport solver — one histogram per side, a
merge of the supports, and a cumulative window. W1 complements the
repo's KS statistic (za07: max CDF gap — shape-sensitive, scale-free)
by measuring HOW FAR mass moved in value units, the quantity a
mixture-rebalancing decision actually needs.

Spark-first + determinism design: each side reduces to |support| rows
via a map-side-combinable count groupBy (integers); the reduction is
EXACT RATIONAL arithmetic — Σ |cuma·nb − cumb·na| · gap accumulated as
DECIMAL(38,0) (all integers, no float anywhere in the sum), divided by
na·nb once at the end, so the only float ops are one divide and one
round on exact-integer inputs: bit-identical under any partitioning
and on any IEEE-754 engine, and truly exact (the earlier per-row 1e-6
quantization accumulated up to 0.5e-6 error per support value). One
full-outer join on the support value, one ordered window over the
(tiny) merged support.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.qnorm import (
    global_cumulative_sums,
)

__all__ = ["wasserstein_1d", "wasserstein_oracle_sql"]

_SCALE = 1_000_000


def wasserstein_1d(
    a: DataFrame,
    b: DataFrame,
    value_col: Column,
    round_digits: int = 6,
) -> DataFrame:
    """One row ``(n_a, n_b, w1)``: exact earth mover's distance
    between the two frames' integer-valued ``value_col``
    distributions."""
    ha = (
        a.select(value_col.cast("long").alias("x"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    hb = (
        b.select(value_col.cast("long").alias("x"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    merged = ha.join(hb, "x", "full_outer").select(
        "x",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    # The merged support is |distinct values|-sized — data-sized for
    # a continuous source — so the CDFs, the totals, and the next-
    # support lead all avoid single-task global windows: two-phase
    # range-partitioned cumulative sums + boundary-filled lead
    # (qnorm.global_cumulative_sums), totals as a 1-row broadcast
    # (the scalar crossJoin idiom).
    tot = merged.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    cum = (
        global_cumulative_sums(
            merged, ["x"], ["ca", "cb"], lead_col="x", lead_out="next_x"
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            F.col("ca_cum").alias("cuma"),
            F.col("cb_cum").alias("cumb"),
            "na",
            "nb",
            "next_x",
        )
        .filter(F.col("next_x").isNotNull())
    )
    dec = "decimal(38,0)"
    # |F_A − F_B|·gap over a common denominator na·nb: the numerator
    # |cuma·nb − cumb·na|·gap is an exact integer (DECIMAL(38,0) —
    # headroom: ≤ na·nb·(x_max − x_min), ~1e18 at sf0.1), so the sum is
    # reduction-order free; ONE divide by na·nb at the end.
    num = F.abs(
        F.col("cuma").cast(dec) * F.col("nb").cast(dec)
        - F.col("cumb").cast(dec) * F.col("na").cast(dec)
    ) * (F.col("next_x") - F.col("x")).cast(dec)
    return cum.select("na", "nb", num.alias("_num")).agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.round(
            F.sum("_num").cast("double")
            / (F.max("na").cast("double") * F.max("nb").cast("double")),
            round_digits,
        ).alias("w1"),
    )


def wasserstein_oracle_sql(
    a_sql: str,
    b_sql: str,
    round_digits: int = 6,
) -> str:
    """DuckDB twin over two sources each yielding a single integer
    ``x`` column — same merge, same scalar CDF expression tree, same
    quantized reduction."""
    return f"""
    WITH ha AS (
        SELECT x, count(*) AS ca FROM ({a_sql}) GROUP BY 1
    ), hb AS (
        SELECT x, count(*) AS cb FROM ({b_sql}) GROUP BY 1
    ), merged AS (
        SELECT coalesce(ha.x, hb.x) AS x,
               coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        FROM ha FULL OUTER JOIN hb ON ha.x = hb.x
    ), cum AS (
        SELECT x,
               CAST(sum(ca) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cuma,
               CAST(sum(cb) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cumb,
               CAST(sum(ca) OVER () AS BIGINT) AS na,
               CAST(sum(cb) OVER () AS BIGINT) AS nb,
               lead(x) OVER (ORDER BY x) AS next_x
        FROM merged
    )
    SELECT max(na) AS n_a, max(nb) AS n_b,
           -- exact rational: HUGEINT numerator sum, one divide at the end
           round(CAST(sum(abs(CAST(cuma AS HUGEINT) * CAST(nb AS HUGEINT)
                              - CAST(cumb AS HUGEINT) * CAST(na AS HUGEINT))
                          * CAST(next_x - x AS HUGEINT))
                      AS DOUBLE)
                 / (CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE)),
                 {round_digits}) AS w1
    FROM cum WHERE next_x IS NOT NULL
    """
