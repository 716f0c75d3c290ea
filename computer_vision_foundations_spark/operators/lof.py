"""Local Outlier Factor over blocked kNN graphs — density-based
outlier scoring for embedding corpora.

LOF (Breunig et al. 2000) scores each point by how much sparser its
neighborhood is than its neighbors' neighborhoods:

    k-dist(p)   = distance to p's k-th nearest neighbor
    reach(p,o)  = max(k-dist(o), d(p,o))
    lrd(p)      = |N(p)| / Σ_{o∈N(p)} reach(p,o)
    LOF(p)      = ( Σ_{o∈N(p)} lrd(o) / lrd(p) ) / |N(p)|

LOF ≈ 1 means the point sits in a uniform-density region; LOF ≫ 1
means it is locally isolated — the embedding-space junk detector that
complements the repo's isolation forest (z79, global axis-parallel
splits) with a local-density criterion.

Spark-first + determinism design:
- the neighbor graph is the engine's blocked self-kNN join
  (similarity.knn_join_blocked): pairs form only within blocks
  (labels here; LSH buckets / IVF cells at 100 TB — identical join
  shape), so cost is Σ|block|², never n²;
- every reduction is INTEGER-exact: distances live on the 1e-6 grid
  (qd = 1e6 − round(cos·1e6), already exact because the kNN edge
  similarity is rounded to 6 digits), reachability sums are BIGINT,
  lrd is an exact integer division on a 1e12 grid, and LOF is one
  final float divide of exact integers — nothing anywhere depends on
  float reduction order (the za50 lesson);
- after the kNN join everything is edges-sized: three equi-joins on
  node ids carrying (id, BIGINT) pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.similarity import (
    knn_join_blocked,
)

__all__ = ["lof_scores", "lof_oracle_sql"]

_GRID = 1_000_000
_LRD_GRID = 1_000_000_000_000


def lof_scores(
    df: DataFrame,
    k: int = 5,
    block_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    top: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``top`` outliers by LOF over the blocked cosine kNN graph:
    ``(vec_id, k_dist, lof)``, ties broken by id. ``|N(p)|`` is the
    actual neighbor count (< k only in blocks smaller than k+1).

    Two deliberate deviations from canonical LOF semantics:

    - **Singleton blocks are unscored.** A row whose block contains no
      other row produces no kNN edge and is absent from the output
      (kNN is block-local by design — the 100 TB shape). Pre-merge
      tiny blocks if every row must receive a score.
    - **Tie handling at rank k.** The neighborhood is exactly the k
      kept edges (rank ≤ k, ties beyond rank k EXCLUDED, order broken
      by id), and k-dist is the max distance over those k edges —
      canonical LOF would include every point at distance == k-dist.
      Deterministic and oracle-replayable; scores can differ from the
      textbook definition only when exact distance ties straddle
      rank k on the 1e-6 grid.
    """
    knn = knn_join_blocked(df, k, block_col, vec_col, id_col)
    qd = knn.select(
        "qid",
        "nid",
        (
            F.lit(_GRID)
            - F.floor(F.col("cos_sim") * _GRID + F.lit(0.5)).cast("long")
        ).alias("d"),
    )
    kd = qd.groupBy("qid").agg(
        F.max("d").alias("kdist"), F.count(F.lit(1)).alias("cnt")
    )
    kd_b = kd.select(
        F.col("qid").alias("nid"), F.col("kdist").alias("kdist_b")
    )
    reach = qd.join(kd_b, "nid").select(
        "qid", "nid", F.greatest(F.col("kdist_b"), F.col("d")).alias("r")
    )
    lrd = (
        reach.groupBy("qid")
        .agg(F.sum("r").alias("sumr"))
        .join(kd, "qid")
        .select(
            "qid",
            F.expr(
                f"CAST(cnt * {_LRD_GRID} AS BIGINT) DIV "
                "CAST(greatest(sumr, 1) AS BIGINT)"
            ).alias("lrdq"),
        )
    )
    lrd_b = lrd.select(
        F.col("qid").alias("nid"), F.col("lrdq").alias("lrdq_b")
    )
    lof = (
        qd.join(lrd, "qid")
        .join(lrd_b, "nid")
        .groupBy("qid", "lrdq")
        .agg(F.sum("lrdq_b").alias("sumlrd"))
        .join(kd, "qid")
        .select(
            F.col("qid").alias(id_col),
            F.round(
                F.col("kdist").cast("double") / F.lit(float(_GRID)),
                round_digits,
            ).alias("k_dist"),
            F.round(
                F.col("sumlrd").cast("double")
                / (F.col("cnt").cast("double") * F.col("lrdq").cast("double")),
                round_digits,
            ).alias("lof"),
        )
    )
    return lof.orderBy(F.desc("lof"), id_col).limit(top)


def lof_oracle_sql(
    table: str = "embeddings",
    k: int = 5,
    block_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    top: int = 20,
    round_digits: int = 6,
) -> str:
    """DuckDB twin: quadratic blocked pairs → same rounded-grid
    distances, BIGINT reach sums, exact ``//`` lrd, one final
    divide."""
    return f"""
    WITH knn AS (
      SELECT qid, nid, cos_sim FROM (
        SELECT a.{id_col} AS qid, b.{id_col} AS nid,
               round(list_cosine_similarity(CAST(a.{vec_col} AS DOUBLE[]),
                                            CAST(b.{vec_col} AS DOUBLE[])),
                     6) AS cos_sim,
               row_number() OVER (
                 PARTITION BY a.{id_col}
                 ORDER BY round(list_cosine_similarity(
                              CAST(a.{vec_col} AS DOUBLE[]),
                              CAST(b.{vec_col} AS DOUBLE[])), 6) DESC,
                          b.{id_col} ASC) AS rank
        FROM {table} a JOIN {table} b
          ON a.{block_col} = b.{block_col} AND a.{id_col} <> b.{id_col}) t
      WHERE rank <= {k}
    ), qd AS (
      SELECT qid, nid,
             {_GRID} - CAST(floor(cos_sim * {_GRID} + 0.5) AS BIGINT) AS d
      FROM knn
    ), kd AS (
      SELECT qid, max(d) AS kdist, count(*) AS cnt FROM qd GROUP BY 1
    ), reach AS (
      SELECT q.qid, q.nid, greatest(kb.kdist, q.d) AS r
      FROM qd q JOIN kd kb ON kb.qid = q.nid
    ), lrd AS (
      SELECT r.qid,
             CAST(k.cnt * {_LRD_GRID} AS BIGINT)
             // CAST(greatest(sum(r.r), 1) AS BIGINT) AS lrdq
      FROM reach r JOIN kd k ON k.qid = r.qid
      GROUP BY r.qid, k.cnt
    ), lofs AS (
      SELECT e.qid,
             round(CAST(k.kdist AS DOUBLE) / {float(_GRID)!r},
                   {round_digits}) AS k_dist,
             round(CAST(sum(lb.lrdq) AS DOUBLE)
                   / (CAST(k.cnt AS DOUBLE) * CAST(la.lrdq AS DOUBLE)),
                   {round_digits}) AS lof
      FROM qd e
      JOIN lrd la ON la.qid = e.qid
      JOIN lrd lb ON lb.qid = e.nid
      JOIN kd k ON k.qid = e.qid
      GROUP BY e.qid, la.lrdq, k.cnt, k.kdist
    )
    SELECT qid AS {id_col}, k_dist, lof FROM lofs
    ORDER BY lof DESC, {id_col} LIMIT {top}
    """
