"""k-core extraction over pair graphs — iterative degree peeling.

The third member of the graph-cohesion toolkit (triangles measure
local density, LPA finds majority communities, k-core finds the
maximal subgraph where EVERY node keeps ≥ k neighbors). On
near-duplicate pair graphs the k-core is the "hard kernel" of a
duplicate family — members that survive even after every weakly-
attached straggler is peeled; on web/link graphs core number is the
classic spam-farm / crawl-frontier prioritization signal (Batagelj &
Zaveršnik 2003's peeling algorithm is what this distributes).

Peeling is inherently iterative but each round is pure relational
algebra: drop nodes with current degree < k, induce the subgraph,
recompute degrees. Spark-first shape, per round:
- one hash aggregate over the symmetric edge list for degrees;
- one broadcast-threshold filter → survivor node table ((node) rows);
- two left-semi joins inducing the subgraph (edge list vs survivors);
- the edge list is ``localCheckpoint``'d with explicit release (the
  components.py discipline — each round has two consumers of the
  previous edge table: the degree aggregate and the induction join).

Convergence: monotone — the edge set only shrinks, and equals the
true k-core at fixpoint. ``n_rounds`` is fixed (oracle-unroll
convention, like PageRank/HITS/LPA); the returned frame also carries
the round's degree so an unconverged run is visible (some node
< k means one more round was needed). Candidate-pair graphs peel in
a handful of rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.components import (
    _ckpt_rdd,
    _release,
)

__all__ = ["k_core", "kcore_oracle_sql"]


def _sym(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .distinct()
    )


def k_core(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    k: int = 3,
    n_rounds: int = 8,
) -> DataFrame:
    """``(node, degree)`` of the subgraph left after ``n_rounds`` of
    degree-< k peeling — the k-core once the peel has converged
    (monotone, so extra rounds are no-ops)."""
    sym = _sym(edges, src, dst).localCheckpoint()
    sym_rdd = _ckpt_rdd(sym)
    try:
        for _ in range(n_rounds):
            keep = (
                sym.groupBy("u")
                .agg(F.count(F.lit(1)).alias("_d"))
                .where(F.col("_d") >= k)
                .select("u")
            )
            nxt = sym.join(keep, "u", "left_semi").join(
                keep.select(F.col("u").alias("v")), "v", "left_semi"
            )
            nxt = nxt.localCheckpoint()
            _release(sym_rdd)
            sym, sym_rdd = nxt, _ckpt_rdd(nxt)
    except Exception:
        _release(sym_rdd)
        raise
    return (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy("node")
    )


def kcore_oracle_sql(
    pairs_sql: str,
    a: str = "id_a",
    b: str = "id_b",
    k: int = 3,
    n_rounds: int = 8,
) -> str:
    """DuckDB twin: the identical peel unrolled one CTE per round.

    Every round CTE is MATERIALIZED — DuckDB inlines plain CTEs, and
    each round references its predecessor three times (degree
    subquery ×2 + induction), so a lazy unroll re-expands the pair
    generator 3^n times: the exact 2^n blowup SCALE.md decision 10
    measured on the Spark side, reproduced in the oracle engine."""
    rounds = []
    for r in range(1, n_rounds + 1):
        rounds.append(
            f"""k{r} AS MATERIALIZED (
        SELECT u FROM e{r - 1} GROUP BY u HAVING count(*) >= {k}
    ),
    e{r} AS MATERIALIZED (
        SELECT e.u, e.v FROM e{r - 1} e
        WHERE e.u IN (SELECT u FROM k{r})
          AND e.v IN (SELECT u FROM k{r})
    )"""
        )
    return f"""
    WITH pairs AS MATERIALIZED ({pairs_sql}),
    e0 AS MATERIALIZED (
        SELECT DISTINCT u, v FROM (
            SELECT {a} AS u, {b} AS v FROM pairs WHERE {a} <> {b}
            UNION ALL
            SELECT {b} AS u, {a} AS v FROM pairs WHERE {a} <> {b}
        )
    ),
    {", ".join(rounds)}
    SELECT u AS node, count(*) AS degree
    FROM e{n_rounds} GROUP BY u ORDER BY node
    """
