"""Seeded deterministic random walks over an observed transition graph.

Random walks are the sampling primitive behind DeepWalk/node2vec
embeddings, PageRank estimation, and Markov-chain smoke tests of
event models. A distributed walk must be REPLAYABLE — the judge of a
100 TB job cannot re-roll dice — so the "random" choice here is a
hash: at step ``s`` from node ``u`` the walk moves to the out-neighbor
minimizing ``md5(seed|s|u|v)``. Uniform over neighbors, different at
every (step, node), bit-identical in any engine that has md5 —
which makes the whole operator differential-testable against SQL.

Spark-first shape: the edge list is built with one window pass over
the event stream (lead() per user); each step is ONE aggregate over
the edge list (``min_by`` per source node — the per-step choice table
is node-sized) joined to the walk frontier. With a model-sized node
set the choice table broadcasts and a k-step walk is k broadcast
joins — zero shuffle of the frontier; for corpus-sized graphs the same
plan runs as k keyed equi-joins, still never materializing more than
|frontier| rows per step. No driver state, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["transition_edges", "seeded_walks", "seeded_walks_oracle_sql"]


def transition_edges(
    events: DataFrame,
    key_col: str = "user_id",
    order_col: str = "ts",
    node_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """``(src, dst)`` — distinct consecutive transitions observed in
    any key's ordered stream (self-loops kept; they are real)."""
    w = Window.partitionBy(key_col).orderBy(order_col, tiebreak_col)
    return (
        events.select(
            F.col(node_col).alias("src"),
            F.lead(node_col).over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .distinct()
    )


def _choice(edges: DataFrame, step: int, seed: int) -> DataFrame:
    h = F.md5(
        F.concat_ws(
            "|",
            F.lit(str(seed)),
            F.lit(str(step)),
            F.col("src"),
            F.col("dst"),
        )
    )
    return edges.groupBy("src").agg(
        F.min_by("dst", h).alias("dst")
    )


def seeded_walks(
    edges: DataFrame, steps: int = 4, seed: int = 7
) -> DataFrame:
    """``(start, step, node)`` — one walk per distinct source node,
    ``steps`` hash-chosen hops; a walk ends early at a sink node
    (no out-edges), so steps 0..k may shrink."""
    frontier = edges.select(F.col("src").alias("start")).distinct()
    frontier = frontier.select(
        "start", F.lit(0).alias("step"), F.col("start").alias("node")
    )
    out = [frontier]
    for s in range(1, steps + 1):
        choice = F.broadcast(_choice(edges, s, seed))
        frontier = (
            frontier.join(
                choice, frontier["node"] == choice["src"], "inner"
            )
            .select(
                "start",
                F.lit(s).alias("step"),
                F.col("dst").alias("node"),
            )
        )
        out.append(frontier)
    res = out[0]
    for f in out[1:]:
        res = res.unionByName(f)
    return res.orderBy("start", "step")


def seeded_walks_oracle_sql(
    table: str = "events",
    key_col: str = "user_id",
    order_col: str = "ts",
    node_col: str = "event_type",
    tiebreak_col: str = "event_id",
    steps: int = 4,
    seed: int = 7,
) -> str:
    """DuckDB twin — the k steps unrolled as CTEs with the same md5
    choice function."""
    parts = [
        f"""
    WITH edges AS (
        SELECT DISTINCT src, dst FROM (
            SELECT {node_col} AS src,
                   lead({node_col}) OVER (
                       PARTITION BY {key_col}
                       ORDER BY {order_col}, {tiebreak_col}) AS dst
            FROM {table})
        WHERE dst IS NOT NULL
    ), w0 AS (
        SELECT DISTINCT src AS start, 0 AS step, src AS node FROM edges
    )"""
    ]
    for s in range(1, steps + 1):
        parts.append(
            f""", c{s} AS (
        SELECT src, min_by(dst, md5('{seed}|{s}|' || src || '|' || dst)) AS dst
        FROM edges GROUP BY src
    ), w{s} AS (
        SELECT w.start, {s} AS step, c.dst AS node
        FROM w{s - 1} w JOIN c{s} c ON c.src = w.node
    )"""
        )
    union = "\n    UNION ALL\n    ".join(
        f"SELECT * FROM w{s}" for s in range(steps + 1)
    )
    parts.append(f"\n    {union}\n    ORDER BY start, step")
    return "".join(parts)
