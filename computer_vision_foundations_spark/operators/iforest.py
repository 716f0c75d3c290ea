"""Isolation-forest anomaly scoring over embedding columns.

Liu, Ting & Zhou (ICDM 2008): anomalies are ISOLATED by fewer random
axis-aligned cuts than inliers, so the expected leaf depth over an
ensemble of random trees is an anomaly score that needs no density
model and no distance threshold — the standard complement to the
distance-based detectors here (z67 modified z-score is univariate,
DBSCAN noise needs an ε; the forest is multivariate and parameter-
light).

Two tree constructions:

- :func:`random_cut_trees` — DATA-INDEPENDENT cuts: each node splits
  a uniformly-chosen dimension at a uniform point of the node's
  current bounding interval (seeded, box-refined — the Mondrian-style
  variant). Because the ensemble is a pure function of (seed, dim,
  bounds), the trees are plan LITERALS and the whole scorer replays
  verbatim in the SQL oracle — the differential-testable member.
- :func:`iforest_fit` — the classic sample-trained construction:
  trees are grown on a deterministic hash-bottom-k sample (the
  engine's sanctioned model-sized collect), each split uniform on the
  node SAMPLE's [min, max]. Adaptive like the paper; pytest-verified
  (a planted outlier out-scores inliers), not oracle-replayable (the
  recursive partitioning can't be a static SQL string).

Scoring is identical for both: every tree becomes ONE nested-CASE
expression (depth-bounded, so 2^depth leaves of flat comparisons in
whole-stage codegen — the PQ/LSH literal-model convention);
``score = 2^(−avg_depth / c(ψ))`` with the paper's normalizer
``c(ψ) = 2·H(ψ−1) − 2(ψ−1)/ψ`` at the conventional ψ = 256.

Spark-first shape: one narrow projection per corpus row — no shuffle,
no UDF, no join; the model is expression literals.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.vectors import (
    to_double_array,
)

__all__ = [
    "random_cut_trees",
    "iforest_fit",
    "isolation_scores",
    "isolation_oracle_sql",
]

# c(256): average unsuccessful-search path length of a BST over the
# conventional subsample size — the paper's score normalizer.
_PSI = 256
C_NORM = 2.0 * (math.log(_PSI - 1) + 0.5772156649) - 2.0 * (
    _PSI - 1
) / _PSI


def random_cut_trees(
    dim: int,
    n_trees: int = 8,
    max_depth: int = 6,
    seed: int = 7,
    bounds: tuple[float, float] = (-0.6, 0.6),
) -> list[dict]:
    """Seeded data-independent random-cut trees. Node dict:
    ``{"dim", "thr", "lo", "hi"}`` with leaves ``{"depth"}``."""
    trees = []
    for t in range(n_trees):
        # integer seeds only: Random(tuple) falls back to hash(),
        # which is process-randomized for strings
        rng = random.Random(seed * 1_000_003 + t)

        def grow(depth: int, boxes: list[tuple[float, float]]) -> dict:
            if depth >= max_depth:
                return {"depth": depth}
            d = rng.randrange(dim)
            lo, hi = boxes[d]
            thr = rng.uniform(lo, hi)
            left_boxes = list(boxes)
            left_boxes[d] = (lo, thr)
            right_boxes = list(boxes)
            right_boxes[d] = (thr, hi)
            return {
                "dim": d,
                "thr": thr,
                "lo": grow(depth + 1, left_boxes),
                "hi": grow(depth + 1, right_boxes),
            }

        trees.append(grow(0, [bounds] * dim))
    return trees


def iforest_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_trees: int = 8,
    sample_size: int = 64,
    max_depth: int = 6,
    seed: int = 7,
) -> list[dict]:
    """Classic sample-trained isolation trees: a deterministic
    hash-bottom-k sample (model-sized collect) per forest, splits
    uniform on each node sample's [min, max] of a random dimension;
    a node isolating ≤ 1 point (or a zero-width box) closes early —
    the adaptivity that makes sparse regions shallow."""
    from computer_vision_foundations_spark.operators.mixture import (
        hash_unit,
    )

    rows = (
        df.select(vec_col, hash_unit(id_col, seed).alias("_h"), id_col)
        .orderBy("_h", id_col)
        .limit(sample_size)
        .collect()
    )
    pts = [[float(x) for x in r[0]] for r in rows]
    dim = len(pts[0])
    trees = []
    for t in range(n_trees):
        rng = random.Random(seed * 2_000_003 + t)

        def grow(depth: int, subset: list[list[float]]) -> dict:
            if depth >= max_depth or len(subset) <= 1:
                return {"depth": depth}
            d = rng.randrange(dim)
            lo = min(p[d] for p in subset)
            hi = max(p[d] for p in subset)
            if hi <= lo:
                return {"depth": depth}
            thr = rng.uniform(lo, hi)
            left = [p for p in subset if p[d] < thr]
            right = [p for p in subset if p[d] >= thr]
            if not left or not right:
                return {"depth": depth}
            return {
                "dim": d,
                "thr": thr,
                "lo": grow(depth + 1, left),
                "hi": grow(depth + 1, right),
            }

        trees.append(grow(0, pts))
    return trees


def _path_col(tree: dict, v: Column) -> Column:
    if "depth" in tree:
        return F.lit(tree["depth"]).cast("double")
    return F.when(
        F.element_at(v, tree["dim"] + 1) < F.lit(tree["thr"]),
        _path_col(tree["lo"], v),
    ).otherwise(_path_col(tree["hi"], v))


def _path_sql(tree: dict, v: str = "v") -> str:
    if "depth" in tree:
        return f"CAST({tree['depth']} AS DOUBLE)"
    return (
        f"CASE WHEN {v}[{tree['dim'] + 1}] < {tree['thr']!r} "
        f"THEN {_path_sql(tree['lo'], v)} "
        f"ELSE {_path_sql(tree['hi'], v)} END"
    )


def isolation_scores(
    df: DataFrame,
    trees: list[dict],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(id, avg_path, score)`` per row — ensemble-mean leaf depth
    and ``2^(−avg_path/c(256))``, rounded 6. One narrow projection,
    model = literals."""
    v = to_double_array(vec_col)
    base = df.select(F.col(id_col).alias("id"), v.alias("_v"))
    paths = [_path_col(t, F.col("_v")) for t in trees]
    total = paths[0]
    for p in paths[1:]:
        total = total + p
    avg = total / F.lit(float(len(trees)))
    return base.select(
        "id",
        F.round(avg, 6).alias("avg_path"),
        F.round(
            F.pow(F.lit(2.0), -avg / F.lit(C_NORM)), 6
        ).alias("score"),
    ).orderBy("id")


def isolation_oracle_sql(
    trees: list[dict],
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin — the same literal trees as nested CASEs."""
    n = len(trees)
    path_sum = " + ".join(f"({_path_sql(t)})" for t in trees)
    return f"""
    WITH vecs AS (
        SELECT {id_col} AS id,
               list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
        FROM {table}
    ), scored AS (
        SELECT id, ({path_sum}) / {float(n)!r} AS avg_path
        FROM vecs
    )
    SELECT id, round(avg_path, 6) AS avg_path,
           round(pow(2.0, -avg_path / {C_NORM!r}), 6) AS score
    FROM scored ORDER BY id
    """
