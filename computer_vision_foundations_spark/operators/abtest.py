"""Two-proportion z-test for hash-bucketed A/B experiments.

The experimentation primitive on top of the engine's deterministic
hash assignment (`operators/split.py` family): users are bucketed by
a salted hash (no coordination, replayable), per-bucket conversion is
a keyed aggregate, and the pooled two-proportion z-statistic

    z = (p_a − p_b) / sqrt(p·(1−p)·(1/n_a + 1/n_b)),  p = pooled rate

is the standard large-sample test dashboards report (|z| > 1.96 ⇒
95 % significance). Everything is a pure function of the data and the
salt, so the whole analysis — assignment included — replays in the
SQL oracle.

Spark-first shape: one keyed aggregate over (user → converted) — the
event stream shuffles once on the user key — then a 2-row aggregate;
the final row is scalar algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ab_conversion_ztest", "abtest_oracle_sql"]


def ab_conversion_ztest(
    events: DataFrame,
    user_col: str = "user_id",
    event_col: str = "event_type",
    convert_value: str = "purchase",
    salt: str = "exp1",
) -> DataFrame:
    """One row ``(n_a, n_b, conv_a, conv_b, p_a, p_b, z)`` — group A
    = even md5 bucket of the salted user id; conversion = the user
    has ≥1 ``convert_value`` event. Floats rounded 6; z is NULL when
    a pooled-variance term is 0."""
    users = events.groupBy(F.col(user_col).alias("uid")).agg(
        F.max(
            F.when(F.col(event_col) == convert_value, 1).otherwise(0)
        ).alias("converted")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(salt), F.col("uid"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    grouped = users.select(
        bucket.alias("grp"), F.col("converted")
    ).groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").alias("conv"),
    )
    a = grouped.where(F.col("grp") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = grouped.where(F.col("grp") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    j = a.crossJoin(F.broadcast(b))
    p_a = F.col("conv_a") / F.col("n_a").cast("double")
    p_b = F.col("conv_b") / F.col("n_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    var = (
        pool
        * (F.lit(1.0) - pool)
        * (
            F.lit(1.0) / F.col("n_a")
            + F.lit(1.0) / F.col("n_b")
        )
    )
    return j.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(
            F.when(var > 0, (p_a - p_b) / F.sqrt(var)), 6
        ).alias("z"),
    )


def abtest_oracle_sql(
    table: str = "events",
    user_col: str = "user_id",
    event_col: str = "event_type",
    convert_value: str = "purchase",
    salt: str = "exp1",
) -> str:
    """DuckDB twin — identical salted-hash assignment and algebra."""
    return f"""
    WITH users AS (
        SELECT {user_col} AS uid,
               max(CASE WHEN {event_col} = '{convert_value}'
                        THEN 1 ELSE 0 END) AS converted
        FROM {table} GROUP BY 1
    ), bucketed AS (
        SELECT CAST(('0x' || substring(
                   md5('{salt}' || '|' || CAST(uid AS VARCHAR)),
                   1, 7)) AS BIGINT) % 2 AS grp,
               converted
        FROM users
    ), grouped AS (
        SELECT grp, count(*) AS n,
               CAST(sum(converted) AS BIGINT) AS conv
        FROM bucketed GROUP BY grp
    ), a AS (SELECT n AS n_a, conv AS conv_a FROM grouped WHERE grp = 0),
    b AS (SELECT n AS n_b, conv AS conv_b FROM grouped WHERE grp = 1)
    SELECT n_a, n_b, conv_a, conv_b,
           round(conv_a / CAST(n_a AS DOUBLE), 6) AS p_a,
           round(conv_b / CAST(n_b AS DOUBLE), 6) AS p_b,
           round(CASE WHEN (conv_a + conv_b) > 0
                       AND (conv_a + conv_b) < (n_a + n_b)
                      THEN (conv_a / CAST(n_a AS DOUBLE)
                            - conv_b / CAST(n_b AS DOUBLE))
                           / sqrt(((conv_a + conv_b)
                                   / CAST(n_a + n_b AS DOUBLE))
                                  * (1.0 - (conv_a + conv_b)
                                     / CAST(n_a + n_b AS DOUBLE))
                                  * (1.0 / n_a + 1.0 / n_b))
                 END, 6) AS z
    FROM a CROSS JOIN b
    """
