"""Classical statistics over keyed slices: Wilson intervals, per-key
OLS, and the two-sample Kolmogorov-Smirnov statistic.

The inference kit the A/B test (operators/abtest.py) and bootstrap
(operators/resample.py) belong to, completed with three closed-form
standards — all pure aggregate/window algebra, all oracle-replayable:

- **Wilson score interval** (1927): the binomial proportion CI that
  behaves at small n and extreme rates where the naive ±z√(pq/n)
  Wald interval collapses — the right bar to draw on every
  conversion-rate dashboard.
- **per-key OLS** — slope/intercept/R² by the closed form over
  (Σx, Σy, Σxy, Σx², Σy²): the classical trend companion to the
  robust Theil-Sen (z91); one aggregate per key.
- **two-sample Kolmogorov-Smirnov D** — ``max |F₁ − F₂|`` over the
  pooled sample: the distribution-free "did the distribution
  change?" test behind data-drift monitors, computed with two
  cumulative-count windows over the sorted union (right-continuous
  ECDFs evaluated AT sample points, ties pooled per value — the
  textbook convention both engines replay identically).

Spark-first shape: Wilson/OLS are single keyed aggregates; KS
shuffles the two-column value stream once and runs two same-ordered
windows. No UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "wilson_intervals",
    "ols_by_key",
    "ks_two_sample",
    "wilson_oracle_sql",
    "ols_oracle_sql",
    "ks_oracle_sql",
    "keyed_ks_drift",
    "keyed_ks_oracle_sql",
    "keyed_ks_pvalues",
    "keyed_ks_pvalues_oracle_sql",
    "bh_fdr",
    "bh_oracle_sql",
]


def wilson_intervals(
    events: DataFrame,
    key_col: str = "event_type",
    user_col: str = "user_id",
    event_col: str = "event_type",
    convert_value: str = "purchase",
    z: float = 1.959964,
) -> DataFrame:
    """``(key, n, conv, rate, wilson_lo, wilson_hi)`` — per FIRST-SEEN
    key of each user (their entry channel), the fraction of users who
    ever convert, with the Wilson score interval. Rounded 6."""
    w = Window.partitionBy(user_col).orderBy("ts", "event_id")
    first = (
        events.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_conv",
            F.max(
                F.when(F.col(event_col) == convert_value, 1).otherwise(0)
            ).over(Window.partitionBy(user_col)),
        )
        .where(F.col("_rn") == 1)
        .select(F.col(key_col).alias("key"), F.col("_conv").alias("c"))
    )
    agg = first.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("conv")
    )
    p = F.col("conv") / F.col("n").cast("double")
    nn = F.col("n").cast("double")
    z2 = z * z
    center = (p + F.lit(z2) / (2.0 * nn)) / (1.0 + F.lit(z2) / nn)
    half = (
        F.lit(z)
        * F.sqrt(
            p * (F.lit(1.0) - p) / nn
            + F.lit(z2) / (4.0 * nn * nn)
        )
        / (1.0 + F.lit(z2) / nn)
    )
    return agg.select(
        "key",
        "n",
        "conv",
        F.round(p, 6).alias("rate"),
        F.round(center - half, 6).alias("wilson_lo"),
        F.round(center + half, 6).alias("wilson_hi"),
    ).orderBy("key")


def wilson_oracle_sql(
    table: str = "events",
    key_col: str = "event_type",
    user_col: str = "user_id",
    event_col: str = "event_type",
    convert_value: str = "purchase",
    z: float = 1.959964,
) -> str:
    """DuckDB twin — identical entry-channel derivation + algebra."""
    z2 = z * z
    return f"""
    WITH marked AS (
        SELECT {user_col} AS u, {key_col} AS key,
               row_number() OVER (PARTITION BY {user_col}
                                  ORDER BY ts, event_id) AS rn,
               max(CASE WHEN {event_col} = '{convert_value}'
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY {user_col}) AS c
        FROM {table}
    ), agg AS (
        SELECT key, count(*) AS n, CAST(sum(c) AS BIGINT) AS conv
        FROM marked WHERE rn = 1 GROUP BY key
    )
    SELECT key, n, conv,
           round(conv / CAST(n AS DOUBLE), 6) AS rate,
           round(((conv / CAST(n AS DOUBLE)) + {z2!r} / (2.0 * n))
                 / (1.0 + {z2!r} / n)
                 - {z!r} * sqrt((conv / CAST(n AS DOUBLE))
                                * (1.0 - conv / CAST(n AS DOUBLE)) / n
                                + {z2!r} / (4.0 * n * n))
                   / (1.0 + {z2!r} / n), 6) AS wilson_lo,
           round(((conv / CAST(n AS DOUBLE)) + {z2!r} / (2.0 * n))
                 / (1.0 + {z2!r} / n)
                 + {z!r} * sqrt((conv / CAST(n AS DOUBLE))
                                * (1.0 - conv / CAST(n AS DOUBLE)) / n
                                + {z2!r} / (4.0 * n * n))
                   / (1.0 + {z2!r} / n), 6) AS wilson_hi
    FROM agg ORDER BY key
    """


def ols_by_key(
    events: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    key_col: str = "event_type",
) -> DataFrame:
    """``(key, n, slope, intercept, r2)`` — closed-form least squares
    of y on x. x is hours SINCE THE KEY'S FIRST observation: raw
    epoch-hours (~5·10⁵) wreck the population moments with
    catastrophic cancellation (engines' covar/var algorithms then
    disagree beyond the rounding convention — measured), and an
    intercept at epoch 0 is meaningless anyway; centered, the
    intercept is the fitted value at the series start and the slope
    is per-hour, matching z91. NULL slope/r2 on zero x-variance.
    Rounded 6."""
    raw = events.select(
        F.col(key_col).alias("key"),
        (F.unix_timestamp(F.col(x_col)) / F.lit(3600.0)).alias("_xr"),
        F.col(y_col).cast("double").alias("y"),
    ).where(F.col(y_col).isNotNull())
    base = raw.withColumn(
        "x",
        F.col("_xr") - F.min("_xr").over(Window.partitionBy("key")),
    )
    agg = base.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.covar_pop("x", "y").alias("sxy"),
        F.var_pop("x").alias("sxx"),
        F.var_pop("y").alias("syy"),
    )
    slope = F.when(F.col("sxx") > 0, F.col("sxy") / F.col("sxx"))
    r2 = F.when(
        (F.col("sxx") > 0) & (F.col("syy") > 0),
        (F.col("sxy") * F.col("sxy"))
        / (F.col("sxx") * F.col("syy")),
    )
    return agg.select(
        "key",
        "n",
        F.round(slope, 6).alias("slope"),
        # intercept = my − slope·mx amplifies the engines' covar/var
        # last-ulp differences by the mean-x magnitude — rounded 4
        # (the averages convention), slope/r2 stay at 6
        F.round(F.col("my") - slope * F.col("mx"), 4).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    ).orderBy("key")


def ols_oracle_sql(
    table: str = "events",
    x_col: str = "ts",
    y_col: str = "value",
    key_col: str = "event_type",
) -> str:
    """DuckDB twin — same moment algebra (epoch hours)."""
    return f"""
    WITH raw AS (
        SELECT {key_col} AS key,
               epoch({x_col}) / 3600.0 AS xr,
               CAST({y_col} AS DOUBLE) AS y
        FROM {table} WHERE {y_col} IS NOT NULL
    ), base AS (
        SELECT key,
               xr - min(xr) OVER (PARTITION BY key) AS x,
               y
        FROM raw
    ), agg AS (
        SELECT key, count(*) AS n, avg(x) AS mx, avg(y) AS my,
               covar_pop(x, y) AS sxy, var_pop(x) AS sxx,
               var_pop(y) AS syy
        FROM base GROUP BY key
    )
    SELECT key, n,
           round(CASE WHEN sxx > 0 THEN sxy / sxx END, 6) AS slope,
           round(my - (CASE WHEN sxx > 0 THEN sxy / sxx END) * mx, 4)
               AS intercept,
           round(CASE WHEN sxx > 0 AND syy > 0
                      THEN sxy * sxy / (sxx * syy) END, 6) AS r2
    FROM agg ORDER BY key
    """


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """One row ``(n_a, n_b, ks_d)`` — the two-sample KS statistic
    between the two groups' value distributions, rounded 6.

    Scale shape: the pooled ECDF needs a GLOBAL cumulative count in
    value order; a bare ``Window.orderBy`` would funnel every distinct
    value through one task (for continuous columns, distinct ≈ rows),
    so the running counts use the two-phase range-partition +
    broadcast-offset pattern (`qnorm.global_cumulative_sums`) — exact
    integer sums, no single-task sort."""
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("x"),
    ).where(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin(group_a, group_b)
    )
    counts = base.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    na = F.max(F.when(F.col("g") == group_a, F.col("n")))
    nb = F.max(F.when(F.col("g") == group_b, F.col("n")))
    tot = counts.agg(na.alias("n_a"), nb.alias("n_b"))
    # pool per distinct value (ties collapse), cumulative counts
    per_val = base.groupBy("x").agg(
        F.sum(F.when(F.col("g") == group_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("g") == group_b, 1).otherwise(0)).alias("cb"),
    )
    from computer_vision_foundations_spark.operators.qnorm import (
        global_cumulative_sums,
    )

    cum = global_cumulative_sums(per_val, ["x"], ["ca", "cb"]).select(
        F.col("ca_cum").alias("fa"),
        F.col("cb_cum").alias("fb"),
    )
    d = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.abs(
                F.col("fa") / F.col("n_a").cast("double")
                - F.col("fb") / F.col("n_b").cast("double")
            )
        ).alias("d")
    )
    return tot.crossJoin(F.broadcast(d)).select(
        "n_a", "n_b", F.round("d", 6).alias("ks_d")
    )


def ks_oracle_sql(
    table: str,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> str:
    """DuckDB twin — identical pooled-ECDF construction."""
    return f"""
    WITH base AS (
        SELECT {group_col} AS g, CAST({value_col} AS DOUBLE) AS x
        FROM {table}
        WHERE {value_col} IS NOT NULL
          AND {group_col} IN ('{group_a}', '{group_b}')
    ), tot AS (
        SELECT max(CASE WHEN g = '{group_a}' THEN n END) AS n_a,
               max(CASE WHEN g = '{group_b}' THEN n END) AS n_b
        FROM (SELECT g, count(*) AS n FROM base GROUP BY g)
    ), per_val AS (
        SELECT x,
               sum(CASE WHEN g = '{group_a}' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN g = '{group_b}' THEN 1 ELSE 0 END) AS cb
        FROM base GROUP BY x
    ), cum AS (
        SELECT sum(ca) OVER (ORDER BY x
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS fa,
               sum(cb) OVER (ORDER BY x
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS fb
        FROM per_val
    )
    SELECT tot.n_a, tot.n_b,
           round(max(abs(fa / CAST(tot.n_a AS DOUBLE)
                         - fb / CAST(tot.n_b AS DOUBLE))), 6) AS ks_d
    FROM cum CROSS JOIN tot
    GROUP BY tot.n_a, tot.n_b
    """


def _keyed_ks_d(
    df: DataFrame,
    key_col: str,
    value_col: str,
    side_expr,
) -> DataFrame:
    """Per-key two-sample KS machinery shared by the threshold test
    (:func:`keyed_ks_drift`) and the p-value battery
    (:func:`keyed_ks_pvalues`): ``(k, n_a, n_b, _d)`` with ``_d`` the
    UNROUNDED statistic. Counts are exact integers and every float op
    (two divides, subtract, abs, max) is exactly rounded IEEE, so
    ``_d`` is bit-identical across engines."""
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(value_col).cast("double").alias("x"),
        F.when(side_expr, F.lit(1)).otherwise(F.lit(0)).alias("_a"),
    ).where(F.col(value_col).isNotNull())
    per_val = base.groupBy("k", "x").agg(
        F.sum("_a").alias("ca"),
        F.sum(1 - F.col("_a")).alias("cb"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wk = Window.partitionBy("k")
    cum = per_val.select(
        "k",
        F.sum("ca").over(w).alias("fa"),
        F.sum("cb").over(w).alias("fb"),
        F.sum("ca").over(wk).alias("n_a"),
        F.sum("cb").over(wk).alias("n_b"),
    )
    return cum.groupBy("k", "n_a", "n_b").agg(
        F.max(
            F.abs(
                F.col("fa") / F.col("n_a").cast("double")
                - F.col("fb") / F.col("n_b").cast("double")
            )
        ).alias("_d")
    )


def keyed_ks_drift(
    df: DataFrame,
    key_col: str,
    value_col: str,
    side_expr,
    alpha: float = 0.05,
) -> DataFrame:
    """Per-key two-sample KS drift battery: one row per key with the
    KS statistic between the key's "a" and "b" value distributions
    (``side_expr`` boolean column: True → sample a, False → b — e.g.
    before/after a release cut), plus the α-level decision via the
    asymptotic two-sample threshold ``c(α)·√((n_a+n_b)/(n_a·n_b))``,
    ``c(α) = √(−ln(α/2)/2)`` (Smirnov). The per-feature drift monitor
    a 100 TB ingest runs nightly — the keyed generalization of
    :func:`ks_two_sample`.

    Scale shape: one (key, value) hash aggregate with map-side
    partials pools ties, then per-key cumulative windows PARTITIONED
    BY KEY (each key's ECDF stays inside its partition — the z38/z72
    keyed-window shape; a pathological single key with data-sized
    distinct values would need ks_two_sample's two-phase range
    partitioning, documented trade) and a |keys|-row reduction.
    Counts are exact integers; the two divides + round happen per
    key at the end."""
    import math

    d = _keyed_ks_d(df, key_col, value_col, side_expr)
    c_alpha = math.sqrt(-math.log(alpha / 2.0) / 2.0)
    thresh = F.lit(c_alpha) * F.sqrt(
        (F.col("n_a") + F.col("n_b")).cast("double")
        / (F.col("n_a") * F.col("n_b")).cast("double")
    )
    return (
        d.where((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            F.col("k").alias(key_col),
            "n_a",
            "n_b",
            F.round("_d", 6).alias("ks_d"),
            (F.col("_d") > thresh).alias("drifted"),
        )
        .orderBy(key_col)
    )


def keyed_ks_oracle_sql(
    table: str,
    key_col: str,
    value_col: str,
    side_sql: str,
    alpha: float = 0.05,
) -> str:
    """DuckDB twin — identical pooling, per-key windows, threshold."""
    import math

    c_alpha = math.sqrt(-math.log(alpha / 2.0) / 2.0)
    return f"""
    WITH base AS (
        SELECT {key_col} AS k, CAST({value_col} AS DOUBLE) AS x,
               CASE WHEN {side_sql} THEN 1 ELSE 0 END AS a
        FROM {table} WHERE {value_col} IS NOT NULL
    ), per_val AS (
        SELECT k, x, sum(a) AS ca, sum(1 - a) AS cb
        FROM base GROUP BY k, x
    ), cum AS (
        SELECT k,
               sum(ca) OVER (PARTITION BY k ORDER BY x
                             ROWS UNBOUNDED PRECEDING) AS fa,
               sum(cb) OVER (PARTITION BY k ORDER BY x
                             ROWS UNBOUNDED PRECEDING) AS fb,
               sum(ca) OVER (PARTITION BY k) AS n_a,
               sum(cb) OVER (PARTITION BY k) AS n_b
        FROM per_val
    ), d AS (
        SELECT k, n_a, n_b,
               max(abs(fa / CAST(n_a AS DOUBLE)
                       - fb / CAST(n_b AS DOUBLE))) AS d
        FROM cum GROUP BY k, n_a, n_b
    )
    SELECT k AS {key_col}, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           round(d, 6) AS ks_d,
           d > {c_alpha!r} * sqrt(CAST(n_a + n_b AS DOUBLE)
                                  / CAST(n_a * n_b AS DOUBLE)) AS drifted
    FROM d WHERE n_a > 0 AND n_b > 0 ORDER BY k
    """


def keyed_ks_pvalues(
    df: DataFrame,
    key_col: str,
    value_col: str,
    side_expr,
) -> DataFrame:
    """Per-key two-sample KS p-values ``(k, p)`` under the one-term
    Smirnov asymptotic ``p = min(1, 2·exp(−2·D²·n_eff))`` with
    ``n_eff = n_a·n_b/(n_a+n_b)`` — the leading term of the
    Kolmogorov series (the same truncation scipy's ``ks_2samp`` uses
    for its upper-bound mode), which is what a drift battery feeds a
    multiple-testing correction (:func:`bh_fdr`). Keys with an empty
    side carry no evidence and are dropped, mirroring
    :func:`keyed_ks_drift`.

    Scale shape: identical to `keyed_ks_drift` — one (key, value)
    hash aggregate pools ties, per-key cumulative windows PARTITIONED
    BY KEY, then a |keys|-row projection; the exp/divides run per
    key-row at the end."""
    d = _keyed_ks_d(df, key_col, value_col, side_expr)
    n_eff = (
        F.col("n_a").cast("double")
        * F.col("n_b")
        / (F.col("n_a") + F.col("n_b"))
    )
    p = F.least(
        F.lit(1.0),
        F.lit(2.0) * F.exp(F.lit(-2.0) * F.col("_d") * F.col("_d") * n_eff),
    )
    return (
        d.where((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(F.col("k").alias(key_col), p.alias("p"))
    )


def keyed_ks_pvalues_oracle_sql(
    table: str,
    key_sql: str,
    value_col: str,
    side_sql: str,
) -> str:
    """DuckDB twin of :func:`keyed_ks_pvalues` — identical pooling,
    per-key windows, and p-value expression (same left-associated
    float ops, so every value short of libm's last exp ulp matches).
    ``key_sql`` is any scalar SQL expression for the key (compound
    keys concat here)."""
    return f"""
    WITH base AS (
        SELECT {key_sql} AS k, CAST({value_col} AS DOUBLE) AS x,
               CASE WHEN {side_sql} THEN 1 ELSE 0 END AS a
        FROM {table} WHERE {value_col} IS NOT NULL
    ), per_val AS (
        SELECT k, x, sum(a) AS ca, sum(1 - a) AS cb
        FROM base GROUP BY k, x
    ), cum AS (
        SELECT k,
               sum(ca) OVER (PARTITION BY k ORDER BY x
                             ROWS UNBOUNDED PRECEDING) AS fa,
               sum(cb) OVER (PARTITION BY k ORDER BY x
                             ROWS UNBOUNDED PRECEDING) AS fb,
               sum(ca) OVER (PARTITION BY k) AS n_a,
               sum(cb) OVER (PARTITION BY k) AS n_b
        FROM per_val
    ), d AS (
        SELECT k, n_a, n_b,
               max(abs(fa / CAST(n_a AS DOUBLE)
                       - fb / CAST(n_b AS DOUBLE))) AS d
        FROM cum GROUP BY k, n_a, n_b
    )
    SELECT k,
           least(1.0, 2.0 * exp(-2.0 * d * d
                 * (CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)))) AS p
    FROM d WHERE n_a > 0 AND n_b > 0
    """


def bh_fdr(
    df: DataFrame,
    p_col: str,
    id_cols: list[str],
    q: float = 0.10,
) -> DataFrame:
    """Benjamini–Hochberg step-up FDR control (Benjamini & Hochberg
    1995) over a table of hypotheses: one row per input with
    ``(ids…, p_value r6, p_rank, m, bh_crit r6, reject)`` where
    ``p_rank`` is the 1-based ascending rank of the p-value (ties
    broken by the id columns), ``bh_crit = p_rank·q/m``, and
    ``reject`` is true iff ``p_rank ≤ i* = max{i : p_(i) ≤ i·q/m}``
    — the step-up rule, NOT the per-row comparison (a hypothesis
    with p above its own criterion is still rejected when a later
    rank qualifies). The multiple-testing lid for the drift
    batteries (q11's keyed KS, PSI) once "per-key test" becomes
    "thousands of feature×segment tests nightly".

    Exactness contract (engine-portable decisions): p is snapped to
    the 1e-6 grid and q to basis points UP FRONT, and the step-up
    compare runs in pure int64 — ``p_µ·m ≤ p_rank·q_bp·100`` (both
    sides ≤ m·10⁶, overflow-safe to m ≈ 9·10¹²). A float chain
    ``p_rank·q/m`` evaluates differently under Spark's double
    arithmetic vs an engine that parses ``0.05`` as DECIMAL (e.g.
    3·0.05/3 = 0.050000000000000001 vs 0.049999999999999996), so a
    grid p sitting exactly on the boundary would flip ``reject``
    and i* between engines. ``bh_crit`` is likewise the exact
    half-up rounding of p_rank·q/m to 6 digits computed with
    integer division, not a float round. NULL p rows are dropped
    (Spark sorts NULLS FIRST ascending, SQL engines default NULLS
    LAST — a NULL would shift every rank engine-dependently).

    Scale shape: ranking uses `qnorm.global_row_number`
    (range-partition + broadcast offsets — never a single-task
    sort); ``m`` and ``i*`` are 1-row scalar aggregates broadcast
    back via the sanctioned crossJoin idiom. No data-sized window,
    no collect."""
    from computer_vision_foundations_spark.operators.qnorm import (
        global_row_number,
    )

    q_bp = int(round(q * 10000))
    ranked = global_row_number(
        df.where(F.col(p_col).isNotNull()).select(
            *id_cols, F.round(F.col(p_col), 6).alias("_p")
        ),
        ["_p", *id_cols],
        out="p_rank",
    )
    m_row = ranked.agg(F.count(F.lit(1)).alias("m"))
    ranked = ranked.crossJoin(F.broadcast(m_row))
    # p on the 1e-6 grid is within ~1e-10·1e6 of its integer — the
    # round() recovers it exactly on both engines
    p_scaled = F.round(F.col("_p") * F.lit(1000000), 0).cast("long")
    num = F.col("p_rank") * F.lit(q_bp * 100)  # = p_rank·q·10⁶
    cut = ranked.where(p_scaled * F.col("m") <= num).agg(
        F.max("p_rank").alias("_istar")
    )
    # exact half-up round of (p_rank·q/m) to 6 digits:
    # round_half_up(num/m) = (2·num + m) div (2·m), then /10⁶
    crit6 = F.expr(f"(2 * p_rank * {q_bp * 100} + m) div (2 * m)")
    return ranked.crossJoin(F.broadcast(cut)).select(
        *id_cols,
        F.col("_p").alias("p_value"),
        "p_rank",
        "m",
        (crit6.cast("double") / F.lit(1000000.0)).alias("bh_crit"),
        (
            F.col("p_rank") <= F.coalesce(F.col("_istar"), F.lit(0))
        ).alias("reject"),
    )


def bh_oracle_sql(pv_sql: str, id_col: str, q: float) -> str:
    """DuckDB twin of :func:`bh_fdr` for a single id column:
    ``pv_sql`` is any SELECT producing ``(id_col, p)``. Identical
    1e-6 p grid, rank order (p, id), and pure-int64 step-up
    criterion ``p_µ·m ≤ p_rank·q_bp·100`` (see :func:`bh_fdr`)."""
    q_bp = int(round(q * 10000))
    return f"""
    WITH pv0 AS ({pv_sql}),
    pv AS (
        SELECT {id_col}, round(p, 6) AS p FROM pv0 WHERE p IS NOT NULL
    ),
    ranked AS (
        SELECT {id_col}, p,
               CAST(round(p * 1000000, 0) AS BIGINT) AS p_scaled,
               row_number() OVER (ORDER BY p, {id_col}) AS p_rank,
               count(*) OVER () AS m
        FROM pv
    ),
    cut AS (
        SELECT max(CASE WHEN p_scaled * m <= p_rank * {q_bp * 100}
                   THEN p_rank END) AS istar
        FROM ranked
    )
    SELECT {id_col}, p AS p_value, p_rank,
           CAST(m AS BIGINT) AS m,
           CAST((2 * p_rank * {q_bp * 100} + m) // (2 * m) AS DOUBLE)
               / 1000000.0 AS bh_crit,
           p_rank <= coalesce((SELECT istar FROM cut), 0) AS reject
    FROM ranked ORDER BY p_rank
    """
