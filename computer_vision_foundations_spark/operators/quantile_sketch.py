"""Mergeable fixed-bin histogram quantiles — the scale path for
percentiles.

Exact percentiles need a global sort (or Spark's exact ``percentile``,
which collects per-group value multisets); at 100 TB the production
answer is a MERGEABLE sketch: reduce the column to a fixed number of
equi-width bins (map-side combinable counts, constant-size state per
partition — the same contract as the HLL/count-min entries q87/q88),
then answer any quantile from the bin CDF with a guaranteed
``±bin_width`` error. Two narrow passes: (min, max) then the
histogram aggregate; nothing data-sized moves.

Determinism contract: the bin of a value is
``min(floor((x - lo) / w), B-1)`` with ``w = (hi - lo) / B`` — a
fixed IEEE-754 expression tree over the exact (lo, hi) aggregates, so
both engines bin every row identically (no midpoint/interpolation
convention to disagree on — that is exactly why the sketch is
differentially testable while engine-native ``percentile`` /
``quantile_cont`` implementations are not guaranteed bit-equal).

The rank convention is explicit: quantile q reads the first bin whose
cumulative count reaches ``ceil(q * n)``; the answer is the bin's
[lo_edge, hi_edge] bracket plus its midpoint as the point estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "histogram_quantiles",
    "histogram_quantile_oracle_sql",
    "grouped_histogram_quantiles",
    "grouped_histogram_quantile_oracle_sql",
    "weighted_quantiles",
    "weighted_quantile_oracle_sql",
]


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    n_bins: int = 4096,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    round_digits: int = 6,
) -> DataFrame:
    """``(q, bin, est, lo_edge, hi_edge, n)`` per requested quantile.

    ``est`` is the bin midpoint; the true quantile lies in
    ``[lo_edge, hi_edge]`` (width = (max-min)/n_bins). Degenerate
    constant column (max == min) puts all mass in bin 0 with a
    zero-width bracket.
    """
    x = F.col(value_col).cast("double")
    ext = df.where(x.isNotNull()).agg(
        F.min(x).alias("lo"),
        F.max(x).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = (
        df.where(x.isNotNull())
        .join(F.broadcast(ext))
        .select(
            F.when(
                F.col("hi") == F.col("lo"), F.lit(0)
            )
            .otherwise(
                F.least(
                    F.floor(
                        (x - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / F.lit(float(n_bins)))
                    ),
                    F.lit(n_bins - 1),
                )
            )
            .cast("int")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf = binned.select("bin", F.sum("c").over(wcum).alias("cum")).join(
        F.broadcast(ext)
    )
    # ONE pass for all quantiles: explode the (tiny) q list against the
    # <= n_bins CDF rows, keep rows at/past the ceil-rank, min(bin) per q
    qrows = (
        cdf.select(
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
            "bin",
            "cum",
            "lo",
            "hi",
            "n",
        )
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q", "lo", "hi", "n")
        .agg(F.min("bin").alias("bin"))
    )
    w = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    zero_w = F.col("hi") == F.col("lo")
    lo_edge = F.when(zero_w, F.col("lo")).otherwise(
        F.col("lo") + F.col("bin") * w
    )
    hi_edge = F.when(zero_w, F.col("lo")).otherwise(
        F.col("lo") + (F.col("bin") + 1) * w
    )
    return qrows.select(
        "q",
        "bin",
        F.round((lo_edge + hi_edge) / 2.0, round_digits).alias("est"),
        F.round(lo_edge, round_digits).alias("lo_edge"),
        F.round(hi_edge, round_digits).alias("hi_edge"),
        "n",
    ).orderBy("q")


def histogram_quantile_oracle_sql(
    src_sql: str,
    n_bins: int = 4096,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    round_digits: int = 6,
) -> str:
    """DuckDB twin over a source yielding one ``x`` column —
    identical binning expression, identical ceil-rank convention."""
    q_values = ", ".join(f"({q!r})" for q in qs)
    return f"""
    WITH src AS (
        SELECT CAST(x AS DOUBLE) AS x FROM ({src_sql}) WHERE x IS NOT NULL
    ), ext AS (
        SELECT min(x) AS lo, max(x) AS hi, count(*) AS n FROM src
    ), binned AS (
        SELECT CAST(CASE WHEN ext.hi = ext.lo THEN 0
                    ELSE least(floor((x - ext.lo)
                               / ((ext.hi - ext.lo) / {float(n_bins)!r})),
                               {n_bins - 1})
               END AS INT) AS bin,
               count(*) AS c
        FROM src CROSS JOIN ext GROUP BY 1
    ), cdf AS (
        SELECT bin, sum(c) OVER (ORDER BY bin
                                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM binned
    ), hits AS (
        SELECT qq.q AS q,
               (SELECT min(bin) FROM cdf, ext
                WHERE cum >= ceil(qq.q * ext.n)) AS bin
        FROM (VALUES {q_values}) qq(q)
    )
    SELECT q, bin,
           round(CASE WHEN hi = lo THEN lo
                 ELSE ((lo + bin * ((hi - lo) / {float(n_bins)!r}))
                       + (lo + (bin + 1) * ((hi - lo) / {float(n_bins)!r})))
                      / 2.0 END, {round_digits}) AS est,
           round(CASE WHEN hi = lo THEN lo
                 ELSE lo + bin * ((hi - lo) / {float(n_bins)!r})
                 END, {round_digits}) AS lo_edge,
           round(CASE WHEN hi = lo THEN lo
                 ELSE lo + (bin + 1) * ((hi - lo) / {float(n_bins)!r})
                 END, {round_digits}) AS hi_edge,
           n
    FROM hits CROSS JOIN ext ORDER BY q
    """


def grouped_histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int = 1024,
    qs: tuple[float, ...] = (0.5, 0.99),
    round_digits: int = 6,
) -> DataFrame:
    """Per-group sketch quantiles: ``(grp, q, bin, est, lo_edge,
    hi_edge, n)`` — the monitoring shape (p50/p99 of a metric per
    segment) with per-group bin edges from per-group extrema.

    Same contract as :func:`histogram_quantiles`, per group: the only
    data-sized stages are the two group-keyed aggregates (extrema,
    bin counts), both map-side combinable; the CDF window and the
    quantile lookup run on ``|groups| x n_bins`` rows. Groups are the
    aggregate key, so skew follows group cardinalities, not value
    distributions."""
    x = F.col(value_col).cast("double")
    g = F.col(group_col).alias("grp")
    src = df.where(x.isNotNull()).select(g, x.alias("x"))
    ext = src.groupBy("grp").agg(
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = (
        src.join(F.broadcast(ext), "grp")
        .select(
            "grp",
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor(
                        (F.col("x") - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / F.lit(float(n_bins)))
                    ),
                    F.lit(n_bins - 1),
                )
            )
            .cast("int")
            .alias("bin"),
        )
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cdf = binned.select(
        "grp", "bin", F.sum("c").over(wcum).alias("cum")
    ).join(F.broadcast(ext), "grp")
    qrows = (
        cdf.select(
            "grp",
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
            "bin",
            "cum",
            "lo",
            "hi",
            "n",
        )
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("grp", "q", "lo", "hi", "n")
        .agg(F.min("bin").alias("bin"))
    )
    w = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    zero_w = F.col("hi") == F.col("lo")
    lo_edge = F.when(zero_w, F.col("lo")).otherwise(
        F.col("lo") + F.col("bin") * w
    )
    hi_edge = F.when(zero_w, F.col("lo")).otherwise(
        F.col("lo") + (F.col("bin") + 1) * w
    )
    return qrows.select(
        "grp",
        "q",
        "bin",
        F.round((lo_edge + hi_edge) / 2.0, round_digits).alias("est"),
        F.round(lo_edge, round_digits).alias("lo_edge"),
        F.round(hi_edge, round_digits).alias("hi_edge"),
        "n",
    ).orderBy("grp", "q")


def grouped_histogram_quantile_oracle_sql(
    src_sql: str,
    n_bins: int = 1024,
    qs: tuple[float, ...] = (0.5, 0.99),
    round_digits: int = 6,
) -> str:
    """DuckDB twin over a source yielding ``(grp, x)``."""
    q_values = ", ".join(f"({q!r})" for q in qs)
    wexpr = f"((hi - lo) / {float(n_bins)!r})"
    return f"""
    WITH src AS (
        SELECT grp, CAST(x AS DOUBLE) AS x FROM ({src_sql})
        WHERE x IS NOT NULL
    ), ext AS (
        SELECT grp, min(x) AS lo, max(x) AS hi, count(*) AS n
        FROM src GROUP BY grp
    ), binned AS (
        SELECT src.grp AS grp,
               CAST(CASE WHEN ext.hi = ext.lo THEN 0
                    ELSE least(floor((x - ext.lo)
                               / ((ext.hi - ext.lo) / {float(n_bins)!r})),
                               {n_bins - 1})
               END AS INT) AS bin,
               count(*) AS c
        FROM src JOIN ext USING (grp) GROUP BY 1, 2
    ), cdf AS (
        SELECT grp, bin,
               sum(c) OVER (PARTITION BY grp ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM binned
    ), hits AS (
        SELECT cdf.grp AS grp, qq.q AS q, min(bin) AS bin
        FROM cdf
        JOIN ext ON ext.grp = cdf.grp
        CROSS JOIN (VALUES {q_values}) qq(q)
        WHERE cum >= ceil(qq.q * ext.n)
        GROUP BY 1, 2
    )
    SELECT grp, q, bin,
           round(CASE WHEN hi = lo THEN lo
                 ELSE ((lo + bin * {wexpr}) + (lo + (bin + 1) * {wexpr}))
                      / 2.0 END, {round_digits}) AS est,
           round(CASE WHEN hi = lo THEN lo
                 ELSE lo + bin * {wexpr} END, {round_digits}) AS lo_edge,
           round(CASE WHEN hi = lo THEN lo
                 ELSE lo + (bin + 1) * {wexpr} END, {round_digits}) AS hi_edge,
           n
    FROM hits JOIN ext USING (grp) ORDER BY grp, q
    """


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    ps_bp: tuple[int, ...] = (2500, 5000, 7500, 9000, 9900),
) -> DataFrame:
    """EXACT weighted quantiles: for each probability p (given in
    basis points so the threshold rule stays in INTEGER algebra), the
    smallest value v whose cumulative weight reaches ``p·W`` —
    ``min{v : cumw(v)·10⁴ ≥ p_bp·W}``, the weighted generalization of
    the ceil-rank convention q46's histogram selection uses. The
    token-budget / mixture-reweighting primitive ("the 75th
    percentile document by TOKEN mass, not by document count") the
    selection kit (z38 token budget, za20 temperature mixture) works
    in terms of.

    Output: ``(p, value, total_weight)``, one row per requested
    probability.

    Exactness contract: weights integerize as floor() — the one
    rule Spark and SQL spell identically (cast-to-long truncates in
    Spark but ROUNDS in DuckDB; floor never disagrees) — and
    aggregate as BIGINT; the threshold
    compare is ``cumw·10⁴ ≥ p_bp·W`` — pure int64 (overflow headroom:
    cumw·10⁴ caps at W·10⁴, so W may reach ~9·10¹⁴ — about 6·10¹²
    lineitems at TPC-H weights — before the compare would need
    DECIMAL; document-scale corpora stay far under it).

    Scale shape: one (value)-keyed hash aggregate with map-side
    partials pools duplicate values; the cumulative weight runs
    through `qnorm.global_cumulative_sums` (range-partition +
    broadcast offsets — never a single-task window); the total is a
    1-row broadcast (the sanctioned crossJoin idiom); the per-p
    selection is a |distinct|×|ps| filter feeding a |ps|-row
    map-side-combinable min aggregate."""
    from computer_vision_foundations_spark.operators.qnorm import (
        global_cumulative_sums,
    )

    per_val = (
        df.where(F.col(value_col).isNotNull() & F.col(weight_col).isNotNull())
        .groupBy(F.col(value_col).cast("double").alias("v"))
        # floor(), not cast: Spark's cast(long) truncates toward zero
        # while SQL CAST(DOUBLE AS BIGINT) rounds — floor is the one
        # integerization both engines spell identically, so fractional
        # weights cannot silently diverge the twin
        .agg(F.sum(F.floor(F.col(weight_col)).cast("long")).alias("w"))
    )
    cum = global_cumulative_sums(per_val, ["v"], ["w"])
    # W = sum of the pooled per-value weights, read from the
    # localCheckpointed |distinct|-row cumulative frame (not a second
    # corpus-sized aggregate). sum(w), NOT max(w_cum): the oracle
    # twin computes sum(w) OVER (), and the two only coincide when
    # every pooled weight is non-negative — a negative weight makes
    # the cumulative non-monotone and max() would silently diverge
    # the engines on W and every threshold
    tot = cum.agg(F.sum("w").alias("w_tot"))
    marks = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "w_cum",
        "w_tot",
        F.explode(F.array(*[F.lit(int(p)) for p in ps_bp])).alias("p_bp"),
    )
    hit = marks.where(
        F.col("w_cum") * F.lit(10000) >= F.col("p_bp") * F.col("w_tot")
    )
    return (
        hit.groupBy("p_bp", "w_tot")
        .agg(F.min("v").alias("value"))
        .select(
            (F.col("p_bp") / F.lit(10000.0)).alias("p"),
            "value",
            F.col("w_tot").alias("total_weight"),
        )
        .orderBy("p")
    )


def weighted_quantile_oracle_sql(
    table: str,
    value_col: str,
    weight_col: str,
    ps_bp: tuple[int, ...] = (2500, 5000, 7500, 9000, 9900),
) -> str:
    """DuckDB twin — identical value pooling, integer threshold rule."""
    plist = ", ".join(str(int(p)) for p in ps_bp)
    return f"""
    WITH per_val AS (
        SELECT CAST({value_col} AS DOUBLE) AS v,
               CAST(sum(CAST(floor({weight_col}) AS BIGINT)) AS BIGINT) AS w
        FROM {table}
        WHERE {value_col} IS NOT NULL AND {weight_col} IS NOT NULL
        GROUP BY CAST({value_col} AS DOUBLE)
    ), cum AS (
        SELECT v,
               sum(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS w_cum,
               sum(w) OVER () AS W
        FROM per_val
    ), marks AS (
        SELECT v, w_cum, W, p_bp
        FROM cum CROSS JOIN (SELECT unnest([{plist}]) AS p_bp) ps
    )
    SELECT p_bp / 10000.0 AS p, min(v) AS value,
           CAST(W AS BIGINT) AS total_weight
    FROM marks WHERE w_cum * 10000 >= p_bp * W
    GROUP BY p_bp, W ORDER BY p
    """
