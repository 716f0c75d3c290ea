"""Fixed-iteration PageRank as a declarative DataFrame pipeline.

A web-scale training corpus wants link-graph quality signals (page
authority is a standard pretraining quality feature), and PageRank is
the canonical one. This is power iteration with damping and dangling-
mass redistribution:

    r_{i+1}(v) = (1-d)/N + d * ( Σ_{(u,v)∈E} r_i(u)/outdeg(u) + D_i/N )

where ``D_i`` is the total rank held by dangling nodes (no out-edges).

Spark-first shape (per iteration):
- contributions: edges ⋈ ranks on ``src`` (shuffle on src), out-degree
  joined broadcast (degree table is |V|-sized but only (src, deg) —
  small relative to edges; caller can disable), then one hash
  aggregate on ``dst`` — shuffles carry (node, double) pairs only.
- dangling mass: a LEFT ANTI join + global agg → a 1-row DataFrame
  crossJoin'd back (broadcast) — never a driver collect.
- each round's rank table is ``localCheckpoint``'d, exactly like
  ``components.py``: the recurrence consumes ranks TWICE (contrib +
  dangling), so a lazy unroll doubles the plan per round — 2^n
  recompute by round n. Checkpointing makes every round read the
  previous round's materialized (node, double) blocks once, and the
  previous round's blocks are explicitly released as soon as the new
  round is materialized (no storage accumulation across many graphs).
- edges and nodes are checkpointed once up front; the node count
  ``N`` is the only driver scalar.

Arithmetic is structured IDENTICALLY to the unrolled-SQL oracle
(``queries.py`` generates r0..r{n} CTEs): same literals cast to
double, same operation order, so double results agree bit-for-bit
modulo summation order — the registry query rounds a mean-1-scaled
rank to 6 digits for the cross-engine hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.components import (
    _ckpt_partitioned,
    _ckpt_rdd,
    _release,
)

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 5,
    broadcast_degrees: bool = True,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """``(node, rank)`` after ``n_iter`` damped power iterations.

    ``edges`` is a directed edge list; duplicates are collapsed.
    Ranks sum to 1 across all nodes appearing in ``edges``. With
    ``broadcast_degrees`` the (src, out_deg) table is broadcast —
    right for graphs whose node table fits executor memory (degree
    rows are 16 bytes; 10^8 nodes ≈ 1.6 GB: flip it off beyond that
    and the join falls back to a shuffle on src, which AQE plans).
    ``broadcast_ranks`` extends the same contract to the per-round
    (node, double) rank table and the aggregated contribution table —
    the SAME size class as the degree table, so the two flags share
    one executor-memory bound. With both on, the checkpointed edge
    list is never re-shuffled: each round is one edge scan + broadcast
    hash joins + a map-side-combined aggregate of (node, double) rows
    (round-12, guide §3.1/§2.4 — the per-round sort-merge joins
    re-sorted the edge list every iteration).

    With either flag OFF (the >1e8-node regime), the edge list is
    checkpointed HASH-PARTITIONED on ``src`` (r13, guide §2.4/§3.3):
    the degree aggregate and the per-round deg/rank joins consume that
    layout exchange-free — only the node-sized rank table shuffles
    into it each round, with a ``shuffle_hash`` hint so the edge
    stream is never re-sorted. Per-round edge-list exchanges: 1 → 0.

    Eager: each round materializes via ``localCheckpoint`` (see
    module docstring); the returned DataFrame is the checkpointed
    final round.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    co_partition = not (broadcast_degrees and broadcast_ranks)
    e = _ckpt_partitioned(e, "src") if co_partition else e.localCheckpoint()
    e_rdd = _ckpt_rdd(e)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    if broadcast_degrees:
        deg = F.broadcast(deg)
    else:
        # src-partitioned edge layout + derived deg (same layout):
        # hash-build deg per partition instead of sorting the edges
        deg = deg.hint("shuffle_hash")
    n_total = nodes.count()  # scalar; node table already materialized
    n_lit = F.lit(float(n_total))
    base = (F.lit(1.0) - F.lit(damping)) / n_lit
    ranks = nodes.select("node", (F.lit(1.0) / n_lit).alias("r"))
    ranks_rdd = None
    _b = (
        F.broadcast if broadcast_ranks else (lambda d: d.hint("shuffle_hash"))
    )
    for _ in range(n_iter):
        contrib = (
            e.join(deg, "src")
            .join(_b(ranks.withColumnRenamed("node", "src")), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("r") / F.col("out_deg")).alias("contrib"))
        )
        dangling = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm"))
        )
        new = (
            nodes.join(_b(contrib), "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    base
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dm") / n_lit
                    )
                ).alias("r"),
            )
            .localCheckpoint()  # materializes; prev round now dead
        )
        _release(ranks_rdd)
        ranks_rdd = _ckpt_rdd(new)
        ranks = new
    _release(e_rdd)  # edges no longer needed once the loop is done
    return ranks.select("node", F.col("r").alias("rank"))


def pagerank_oracle_sql(
    edges_sql: str,
    damping: float = 0.85,
    n_iter: int = 5,
    round_digits: int | None = None,
) -> str:
    """Unrolled-CTE DuckDB oracle with the SAME arithmetic structure
    as :func:`pagerank` (damping cast to double; dangling mass
    redistributed each round). ``edges_sql`` must yield (src, dst)."""
    d = f"CAST({damping} AS DOUBLE)"
    # every CTE is MATERIALIZED: each round references the previous
    # round TWICE (contributions + dangling mass), so a plain CTE
    # would re-INLINE the whole chain exponentially — 2^n_iter
    # re-expansions of the edge pipeline (the oracle-engine analogue
    # of the Spark lazy-unroll blowup; the LPA oracle has the same
    # guard). Found by the round-9 graph density sweep: the inlined
    # form blew DuckDB's 100 GiB budget on the 25x hub-skew graph.
    parts = [
        # DISTINCT mirrors the operator's edge collapse — without it a
        # caller-supplied edge query that yields the same (src, dst)
        # twice (e.g. node-id collisions across keyspaces) would
        # double-count degrees/contributions only on the oracle side.
        f"WITH edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "deg AS MATERIALIZED (SELECT src, count(*) AS out_deg FROM edges GROUP BY src)",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "r0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS r FROM nodes, nn)",
    ]
    for i in range(n_iter):
        prev, cur = f"r{i}", f"r{i + 1}"
        parts.append(
            f"""{cur} AS MATERIALIZED (
    SELECT nds.node,
           (1.0 - {d}) / nn.n
           + {d} * (coalesce(c.contrib, 0.0) + dg.dm / nn.n) AS r
    FROM nodes nds
    LEFT JOIN (
        SELECT e.dst AS node, sum(p.r / deg.out_deg) AS contrib
        FROM edges e
        JOIN deg ON deg.src = e.src
        JOIN {prev} p ON p.node = e.src
        GROUP BY e.dst
    ) c ON c.node = nds.node
    CROSS JOIN (
        SELECT coalesce(sum(p.r), 0.0) AS dm
        FROM {prev} p LEFT JOIN deg ON deg.src = p.node
        WHERE deg.src IS NULL
    ) dg
    CROSS JOIN nn
)"""
        )
    body = parts[0] + ",\n" + ",\n".join(parts[1:])
    rank = "r" if round_digits is None else f"round(r, {round_digits})"
    return f"{body}\nSELECT node, {rank} AS rank FROM r{n_iter}"
