"""Distributed logistic regression by full-batch gradient descent.

The minimal honest distributed-training loop, as a QUERYABLE operator:
the executors compute the exact batch gradient as ONE hash-aggregate
per iteration (map-side partial sums — the classic allreduce shape,
same as ml/distributed.py's metric allreduce), the driver holds the
(tiny) weight vector and folds it back into the next round's literals.
Nothing but the d+1 weights ever crosses to the driver — the data
never moves, the model does.

    w_{i+1} = w_i − lr · avg_rows( (σ(w_i·x) − y) · x )

Fixed iteration count keeps the whole computation a closed algebraic
form, which the oracle replays as unrolled w0..wN CTEs computed
ENTIRELY in SQL (each wi is a 1-row aggregate over data × w{i-1}) —
a cross-engine match therefore certifies the distributed gradient,
the driver fold, and the loss evaluation end to end. Double noise
from summation order and libm ``exp`` is ~1e-15 per round; results
are rounded to 6 digits against ~1e-9 worst-case drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["logistic_gd", "logistic_gd_oracle_sql"]


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logistic_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 0.5,
    n_iter: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """1-row ``(w_bias, w_<f1>, …, logloss)`` after ``n_iter`` exact
    full-batch GD steps from w=0. Features must be numeric and
    reasonably scaled (the caller owns feature engineering)."""
    feats = [F.lit(1.0)] + [
        F.col(c).cast("double") for c in feature_cols
    ]
    y = F.col(label_col).cast("double")
    w = [0.0] * len(feats)
    for _ in range(n_iter):
        z = sum(
            (F.lit(wj) * xj for wj, xj in zip(w[1:], feats[1:])),
            F.lit(w[0]) * feats[0],
        )
        resid = _sigmoid(z) - y
        grads = df.agg(
            *[
                F.avg(resid * xj).alias(f"g{j}")
                for j, xj in enumerate(feats)
            ]
        ).collect()[0]
        w = [wj - lr * grads[f"g{j}"] for j, wj in enumerate(w)]

    z = sum(
        (F.lit(wj) * xj for wj, xj in zip(w[1:], feats[1:])),
        F.lit(w[0]) * feats[0],
    )
    sig = _sigmoid(z)
    loss = F.avg(-(y * F.log(sig) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - sig)))
    names = ["w_bias"] + [f"w_{c}" for c in feature_cols]
    return df.agg(
        *[
            F.round(F.lit(wj), round_digits).alias(nm)
            for nm, wj in zip(names, w)
        ],
        F.round(loss, round_digits).alias("logloss"),
    )


def logistic_gd_oracle_sql(
    source_sql: str,
    feature_exprs: list[str],
    label_expr: str,
    lr: float = 0.5,
    n_iter: int = 5,
    feature_names: list[str] | None = None,
) -> str:
    """DuckDB twin: w0..wN unrolled CTEs, each a 1-row aggregate over
    ``data × w{i-1}`` — the whole training run in one SQL statement.
    ``source_sql`` yields the feature/label columns referenced by
    ``feature_exprs`` / ``label_expr``."""
    d = len(feature_exprs)
    cols = ["CAST(1.0 AS DOUBLE)"] + [
        f"CAST({e} AS DOUBLE)" for e in feature_exprs
    ]
    lrs = repr(float(lr))

    def z(alias: str) -> str:
        return " + ".join(
            f"{alias}.w{j} * {cols[j]}" for j in range(d + 1)
        )

    ctes = [
        f"data AS ({source_sql})",
        "w0 AS (SELECT "
        + ", ".join(f"CAST(0.0 AS DOUBLE) AS w{j}" for j in range(d + 1))
        + ")",
    ]
    for i in range(1, n_iter + 1):
        p = f"w{i - 1}"
        sig = f"(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-({z(p)}))))"
        upd = ", ".join(
            f"any_value({p}.w{j}) - {lrs} * "
            f"avg(({sig} - CAST({label_expr} AS DOUBLE)) * {cols[j]})"
            f" AS w{j}"
            for j in range(d + 1)
        )
        ctes.append(f"w{i} AS (SELECT {upd} FROM data, {p})")
    wf = f"w{n_iter}"
    sig = f"(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-({z(wf)}))))"
    yd = f"CAST({label_expr} AS DOUBLE)"
    if feature_names is None:
        feature_names = [f"f{j}" for j in range(1, d + 1)]
    names = ["w_bias"] + [f"w_{n}" for n in feature_names]
    sel = ", ".join(
        f"round(any_value({wf}.w{j}), 6) AS {names[j]}"
        for j in range(d + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT {sel},
               round(avg(-({yd} * ln({sig})
                     + (CAST(1.0 AS DOUBLE) - {yd}) * ln(CAST(1.0 AS DOUBLE) - {sig}))), 6)
                 AS logloss
        FROM data, {wf}"""
    )
