"""Seeded resampling statistics: Poisson bootstrap CIs and
deterministic Laplace noise.

Two statistics primitives that only work at scale when they are
HASH-DETERMINISTIC (replayable, coordination-free, and here:
differential-testable):

- **Poisson bootstrap** (Chamandy et al., Google 2012 — "Estimating
  Uncertainty for Massive Data Streams"): the classic bootstrap
  resamples n rows WITH replacement, which is a distributed
  non-starter; drawing each row's replica multiplicity from
  Poisson(1) instead is i.i.d. per row, needs no global coordinate,
  and is what production systems run. Here the Poisson draw is the
  inverse CDF evaluated at a seeded md5-uniform of (row, replica), so
  every engine reproduces the exact same resample.
- **Laplace mechanism** (Dwork 2006): count queries get
  ``b·sign(u−½)·ln(1−2|u−½|)`` noise at scale b = sensitivity/ε. The
  seeded-hash uniform makes the mechanism auditable bit-for-bit —
  NOTE: a real deployment derives u from a secret source; a public
  seed gives the privacy ACCOUNTING shape, not actual privacy (the
  module exists for the pipeline plumbing + the math, documented).

Spark-first shape: bootstrap = explode a replica index sequence (B
copies of the value projection — B·n narrow rows, map-side only) into
one (replica) aggregate, then an exact percentile over the B replica
means; noise = one hash expression per group row. No UDF, no RNG
state.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "poisson_bootstrap_ci",
    "bootstrap_oracle_sql",
    "laplace_noisy_counts",
    "laplace_oracle_sql",
]

# inverse-CDF breakpoints for Poisson(1): cumulative e^{-1}·Σ 1/k!
_POIS_CDF = []
_acc = 0.0
for _k in range(8):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POIS_CDF.append(_acc)


def _hash_unit(*cols: Column) -> Column:
    """md5-derived uniform in [0, 1) over the 28-bit slice — the
    engine's portable hash-unit convention."""
    h = F.md5(F.concat_ws("|", *cols))
    return F.conv(F.substring(h, 1, 7), 16, 10).cast("long") / F.lit(
        float(1 << 28)
    )


def _pois_weight(u: Column) -> Column:
    expr = F.lit(len(_POIS_CDF))
    for k in reversed(range(len(_POIS_CDF))):
        expr = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(expr)
    return expr


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_col: str | None = None,
    n_replicas: int = 100,
    seed: int = 7,
    lo_q: float = 0.025,
    hi_q: float = 0.975,
) -> DataFrame:
    """``(key, mean, ci_lo, ci_hi, n)`` — the plain mean and the
    percentile-bootstrap CI over ``n_replicas`` Poisson(1) resamples
    (key = group or '_all'). Floats rounded 6."""
    key = (
        F.col(group_col) if group_col else F.lit("_all")
    ).alias("key")
    base = df.select(
        key,
        F.col(id_col).cast("string").alias("_id"),
        F.col(value_col).cast("double").alias("x"),
    ).where(F.col(value_col).isNotNull())
    # The replica-weight projection is CPU-bound (ceil(B/4) md5s per
    # row) — widen an under-parallel scan (no-op at scale; see
    # operators/parallelism.py).
    from computer_vision_foundations_spark.operators.parallelism import (
        widen_if_under_parallel,
    )

    base = widen_if_under_parallel(base)
    # All B replica weights as ONE per-row array (no B× row explode —
    # measured 7.3 s → ~2 s at sf0.1 for B=50): the per-replica sums
    # are 2B unrolled aggregate expressions with map-side combine,
    # the kmeans per-dimension-sum pattern.
    #
    # Hash packing: one md5 yields 32 hex chars = four independent
    # 28-bit lanes, so replica b reads lane (b % 4) of hash chunk
    # (b // 4) — ceil(B/4) md5 evaluations per row instead of B (the
    # md5s WERE the cost: 4× fewer dropped z98 14.0 s → ~4 s at
    # sf0.1). The oracle replays the identical chunk/lane addressing.
    n_chunks = (n_replicas + 3) // 4
    hashes = F.transform(
        F.sequence(F.lit(0), F.lit(n_chunks - 1)),
        lambda c: F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("_id"), c)),
    )
    with_h = base.select("key", "x", hashes.alias("_h"))
    warr = F.transform(
        F.sequence(F.lit(0), F.lit(n_replicas - 1)),
        lambda b: _pois_weight(
            F.conv(
                F.substr(
                    F.element_at(
                        F.col("_h"), F.floor(b / F.lit(4)).cast("int") + F.lit(1)
                    ),
                    F.lit(1) + (b % F.lit(4)) * F.lit(7),
                    F.lit(7),
                ),
                16,
                10,
            ).cast("long")
            / F.lit(float(1 << 28))
        ).cast("double"),
    )
    with_w = with_h.select("key", "x", warr.alias("_w"))
    sums = with_w.groupBy("key").agg(
        *[
            F.sum(
                F.element_at("_w", b + 1) * F.col("x")
            ).alias(f"_swx{b}")
            for b in range(n_replicas)
        ],
        *[
            F.sum(F.element_at("_w", b + 1)).alias(f"_sw{b}")
            for b in range(n_replicas)
        ],
    )
    means_arr = F.array(
        *[
            F.col(f"_swx{b}") / F.col(f"_sw{b}")
            for b in range(n_replicas)
        ]
    )
    rep_means = sums.select(
        "key", F.posexplode(means_arr).alias("b", "m")
    )
    cis = rep_means.groupBy("key").agg(
        F.round(F.expr(f"percentile(m, {lo_q!r})"), 6).alias("ci_lo"),
        F.round(F.expr(f"percentile(m, {hi_q!r})"), 6).alias("ci_hi"),
    )
    plain = base.groupBy("key").agg(
        F.round(F.avg("x"), 6).alias("mean"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        plain.join(cis, "key")
        .select("key", "mean", "ci_lo", "ci_hi", "n")
        .orderBy("key")
    )


def _pois_weight_sql(u: str) -> str:
    expr = str(len(_POIS_CDF))
    for k in reversed(range(len(_POIS_CDF))):
        expr = f"CASE WHEN {u} < {_POIS_CDF[k]!r} THEN {k} ELSE {expr} END"
    return expr


def bootstrap_oracle_sql(
    table: str = "events",
    value_col: str = "value",
    id_col: str = "event_id",
    group_col: str | None = "event_type",
    n_replicas: int = 100,
    seed: int = 7,
    lo_q: float = 0.025,
    hi_q: float = 0.975,
) -> str:
    """DuckDB twin — identical hash uniforms, Poisson CDF chain, and
    percentile convention."""
    key = group_col if group_col else "'_all'"
    # chunk/lane packed uniforms — replica b = lane (b % 4) of
    # md5 chunk (b // 4), mirroring poisson_bootstrap_ci exactly
    u = (
        f"CAST(('0x' || substr(md5('{seed}' || '|' || "
        f"CAST({id_col} AS VARCHAR) || '|' || CAST(b // 4 AS VARCHAR)), "
        f"1 + 7 * (b % 4), 7)) AS BIGINT) / {float(1 << 28)!r}"
    )
    return f"""
    WITH base AS (
        SELECT {key} AS key, CAST({id_col} AS VARCHAR) AS _id,
               {id_col} AS rid,
               CAST({value_col} AS DOUBLE) AS x
        FROM {table} WHERE {value_col} IS NOT NULL
    ), reps AS (
        SELECT key, x, rid AS {id_col}, b
        FROM base CROSS JOIN (
            SELECT unnest(range(0, {n_replicas})) AS b)
    ), weighted AS (
        SELECT key, b, x, {_pois_weight_sql(u)} AS w
        FROM reps
    ), rep_means AS (
        SELECT key, b, sum(w * x) / CAST(sum(w) AS DOUBLE) AS m
        FROM weighted GROUP BY 1, 2
    ), cis AS (
        SELECT key, round(quantile_cont(m, {lo_q!r}), 6) AS ci_lo,
               round(quantile_cont(m, {hi_q!r}), 6) AS ci_hi
        FROM rep_means GROUP BY key
    ), plain AS (
        SELECT key, round(avg(x), 6) AS mean, count(*) AS n
        FROM base GROUP BY key
    )
    SELECT plain.key, mean, ci_lo, ci_hi, n
    FROM plain JOIN cis USING (key) ORDER BY key
    """


def laplace_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    seed: int = 11,
) -> DataFrame:
    """``(key, n, noisy_n)`` — grouped counts plus the Laplace
    mechanism at sensitivity 1 (each entity contributes ≤1 per group
    — enforce upstream), noise u from the seeded hash of the group
    key. Rounded 6."""
    counts = df.groupBy(F.col(group_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # clamp u into (0, 1): the 28-bit hash slice CAN be exactly 0
    # (p ≈ 2^-28 per key), where ln(1-2|u-½|) = ln(0) — NULL on Spark,
    # -inf on DuckDB. Clamp identically on both sides (oracle below).
    u = F.greatest(
        F.least(
            _hash_unit(F.lit(str(seed)), F.col("key")),
            F.lit(1.0 - 2.0**-28),
        ),
        F.lit(2.0**-28),
    )
    centered = u - F.lit(0.5)
    b = 1.0 / epsilon
    noise = (
        -F.lit(b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - 2.0 * F.abs(centered))
    )
    return counts.select(
        "key",
        "n",
        F.round(F.col("n") + noise, 6).alias("noisy_n"),
    ).orderBy("key")


def laplace_oracle_sql(
    table: str = "events",
    group_col: str = "event_type",
    epsilon: float = 1.0,
    seed: int = 11,
) -> str:
    """DuckDB twin — identical inverse-CDF algebra."""
    b = 1.0 / epsilon
    u_raw = (
        f"CAST(('0x' || substr(md5('{seed}' || '|' || key), 1, 7)) "
        f"AS BIGINT) / {float(1 << 28)!r}"
    )
    # same (0, 1) clamp as laplace_noisy_counts — ln(0) guard
    u = (
        f"greatest(least({u_raw}, {1.0 - 2.0**-28!r}), {2.0**-28!r})"
    )
    return f"""
    WITH counts AS (
        SELECT {group_col} AS key, count(*) AS n
        FROM {table} GROUP BY 1
    )
    SELECT key, n,
           round(n + (-{b!r} * sign(({u}) - 0.5)
                      * ln(1.0 - 2.0 * abs(({u}) - 0.5))), 6)
               AS noisy_n
    FROM counts ORDER BY key
    """
