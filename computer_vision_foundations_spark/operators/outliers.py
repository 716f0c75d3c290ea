"""Robust (median/MAD) outlier detection over keyed numeric streams.

Pipeline hygiene for metric columns: mean/stddev z-scores are
themselves corrupted by the outliers they hunt, so production data
monitors score deviation against the MEDIAN and the MAD (median
absolute deviation), whose breakdown point is 50 % (Iglewicz & Hoaglin
1993, "modified z-score" |0.6745·(x − med)/MAD| > 3.5). This operator
reports, per key, the robust location/scale and how many points the
modified z-score flags — the summary a quality dashboard charts per
event type or per source.

Spark-first shape: two exact-percentile hash aggregates over a narrow
``(key, value)`` projection (Spark's ``percentile`` is a single-pass
typed aggregate, not a sort), each followed by a BROADCAST join of the
key-sized stats back onto the stream — the full table shuffles its
narrow projection twice and nothing else; no window sort, no driver
state. Exact medians at 100 TB: the percentile aggregate buffers
per-key values on the reducer, so the per-key cardinality must fit an
executor — for unbounded keys switch the two calls to
``percentile_approx``, which is sketch-sized (documented trade; the
oracle models the exact form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mad_outlier_summary", "mad_outlier_oracle_sql"]

# 0.6745 ≈ Φ⁻¹(0.75): scales MAD to the stddev of a normal, making the
# 3.5 default threshold comparable to a classic z-score cutoff.
_MAD_SCALE = 0.6745


def mad_outlier_summary(
    df: DataFrame,
    value_col: str = "value",
    key_col: str = "event_type",
    threshold: float = 3.5,
) -> DataFrame:
    """``(key, n, med, mad, n_outliers, max_mod_z)`` per key.

    ``mad`` is the raw median absolute deviation (unscaled);
    ``mod_z = 0.6745·|x − med| / mad`` (0 when MAD is 0 — a
    majority-constant key cannot flag anything, by construction of the
    robust scale); ``n_outliers`` counts ``mod_z > threshold``.
    Floats rounded to 6.
    """
    vals = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("double").alias("x"),
    ).where(F.col(value_col).isNotNull())
    med = vals.groupBy("key").agg(
        F.expr("percentile(x, 0.5)").alias("med")
    )
    dev = vals.join(F.broadcast(med), "key").withColumn(
        "adev", F.abs(F.col("x") - F.col("med"))
    )
    mad = dev.groupBy("key").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    scored = dev.join(F.broadcast(mad), "key").withColumn(
        "mod_z",
        F.when(
            F.col("mad") > 0,
            F.lit(_MAD_SCALE) * F.col("adev") / F.col("mad"),
        ).otherwise(F.lit(0.0)),
    )
    return (
        scored.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("mod_z") > threshold, 1).otherwise(0)
            ).alias("n_outliers"),
            F.round(F.max("mod_z"), 6).alias("max_mod_z"),
        )
        .orderBy("key")
    )


def mad_outlier_oracle_sql(
    table: str = "events",
    value_col: str = "value",
    key_col: str = "event_type",
    threshold: float = 3.5,
) -> str:
    """DuckDB twin — ``quantile_cont`` is the same interpolated exact
    percentile as Spark's ``percentile``."""
    return f"""
    WITH vals AS (
        SELECT {key_col} AS key, CAST({value_col} AS DOUBLE) AS x
        FROM {table} WHERE {value_col} IS NOT NULL
    ), med AS (
        SELECT key, quantile_cont(x, 0.5) AS med FROM vals GROUP BY 1
    ), dev AS (
        SELECT vals.key, x, med, abs(x - med) AS adev
        FROM vals JOIN med USING (key)
    ), mad AS (
        SELECT key, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1
    ), scored AS (
        SELECT dev.key, med, dev.adev, mad.mad,
               CASE WHEN mad.mad > 0
                    THEN {_MAD_SCALE} * dev.adev / mad.mad
                    ELSE 0.0 END AS mod_z
        FROM dev JOIN mad USING (key)
    )
    SELECT key, count(*) AS n,
           round(any_value(med), 6) AS med,
           round(any_value(mad), 6) AS mad,
           CAST(sum(CASE WHEN mod_z > {threshold} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           round(max(mod_z), 6) AS max_mod_z
    FROM scored GROUP BY key ORDER BY key
    """
