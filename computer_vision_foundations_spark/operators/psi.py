"""Population Stability Index — the model-monitoring drift measure.

PSI compares a binned value distribution between a reference window
and a current window:

    PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)

with Laplace smoothing so empty bins stay finite (rule of thumb:
< 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted). It is THE standard
scorecard/feature drift gauge, complementing the repo's KS two-sample
test (za07: max CDF gap) and JS divergence (z65: symmetric entropy):
PSI is the one whose per-bin contributions are reported and
thresholded operationally.

Spark-first + determinism design: one map-side-combinable groupBy per
window down to |bins| rows, a full outer join on the bin id (bins
present in either window appear; absent-in-one smoothed), and the
cross-bin reduction summed on the 1e-6 grid as BIGINT — no float
reduction order anywhere (za50 lesson). The smoothed ratios and the
log are per-row scalars with an identical operation tree in the
DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["psi_bins", "psi_oracle_sql"]

_SCALE = 1_000_000


def psi_bins(
    ref: DataFrame,
    cur: DataFrame,
    bin_col: Column,
    round_digits: int = 6,
) -> DataFrame:
    """Per-bin PSI decomposition between two frames:
    ``(bin, n_ref, n_cur, contrib, psi)`` where ``contrib`` is the
    bin's smoothed (p−q)·ln(p/q) term and ``psi`` (repeated on every
    row) is the grid-exact total."""
    h_ref = (
        ref.select(bin_col.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_ref"))
    )
    h_cur = (
        cur.select(bin_col.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_cur"))
    )
    joined = (
        h_ref.join(h_cur, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    w_all = Window.partitionBy()
    tot = joined.select(
        "bin",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(w_all).alias("rt"),
        F.sum("n_cur").over(w_all).alias("ct"),
        F.count(F.lit(1)).over(w_all).alias("nb"),
    )
    p = (F.col("n_ref").cast("double") + F.lit(0.5)) / (
        F.col("rt").cast("double") + F.lit(0.5) * F.col("nb").cast("double")
    )
    q = (F.col("n_cur").cast("double") + F.lit(0.5)) / (
        F.col("ct").cast("double") + F.lit(0.5) * F.col("nb").cast("double")
    )
    contrib = (p - q) * F.log(p / q)
    contrib_q = F.floor(contrib * _SCALE + F.lit(0.5)).cast("long")
    scored = tot.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(contrib, round_digits).alias("contrib"),
        contrib_q.alias("_cq"),
    )
    return scored.select(
        "bin",
        "n_ref",
        "n_cur",
        "contrib",
        F.round(
            F.sum("_cq").over(w_all).cast("double") / F.lit(float(_SCALE)),
            round_digits,
        ).alias("psi"),
    )


def psi_oracle_sql(
    ref_sql: str,
    cur_sql: str,
    round_digits: int = 6,
) -> str:
    """DuckDB twin over two sources each yielding a single ``bin``
    column — same smoothing, same expression tree, same quantized
    reduction."""
    return f"""
    WITH href AS (
        SELECT bin, count(*) AS n_ref FROM ({ref_sql}) GROUP BY 1
    ), hcur AS (
        SELECT bin, count(*) AS n_cur FROM ({cur_sql}) GROUP BY 1
    ), joined AS (
        SELECT coalesce(href.bin, hcur.bin) AS bin,
               coalesce(n_ref, 0) AS n_ref,
               coalesce(n_cur, 0) AS n_cur
        FROM href FULL OUTER JOIN hcur ON href.bin = hcur.bin
    ), tot AS (
        SELECT bin, n_ref, n_cur,
               CAST(sum(n_ref) OVER () AS BIGINT) AS rt,
               CAST(sum(n_cur) OVER () AS BIGINT) AS ct,
               CAST(count(*) OVER () AS BIGINT) AS nb
        FROM joined
    ), scored AS (
        SELECT bin, CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cur AS BIGINT) AS n_cur,
               round(((CAST(n_ref AS DOUBLE) + 0.5)
                      / (CAST(rt AS DOUBLE) + 0.5 * CAST(nb AS DOUBLE))
                      - (CAST(n_cur AS DOUBLE) + 0.5)
                        / (CAST(ct AS DOUBLE) + 0.5 * CAST(nb AS DOUBLE)))
                     * ln(((CAST(n_ref AS DOUBLE) + 0.5)
                           / (CAST(rt AS DOUBLE) + 0.5 * CAST(nb AS DOUBLE)))
                          / ((CAST(n_cur AS DOUBLE) + 0.5)
                             / (CAST(ct AS DOUBLE) + 0.5 * CAST(nb AS DOUBLE)))),
                     {round_digits}) AS contrib,
               CAST(floor(((CAST(n_ref AS DOUBLE) + 0.5)
                           / (CAST(rt AS DOUBLE) + 0.5 * CAST(nb AS DOUBLE))
                           - (CAST(n_cur AS DOUBLE) + 0.5)
                             / (CAST(ct AS DOUBLE) + 0.5 * CAST(nb AS DOUBLE)))
                          * ln(((CAST(n_ref AS DOUBLE) + 0.5)
                                / (CAST(rt AS DOUBLE) + 0.5 * CAST(nb AS DOUBLE)))
                               / ((CAST(n_cur AS DOUBLE) + 0.5)
                                  / (CAST(ct AS DOUBLE) + 0.5 * CAST(nb AS DOUBLE))))
                          * {_SCALE} + 0.5) AS BIGINT) AS cq
        FROM tot
    )
    SELECT bin, n_ref, n_cur, contrib,
           round(CAST(sum(cq) OVER () AS DOUBLE) / {_SCALE}.0,
                 {round_digits}) AS psi
    FROM scored
    """
