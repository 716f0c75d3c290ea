"""HITS (hubs & authorities) — the second link-graph quality signal.

Kleinberg's HITS complements PageRank (`operators/pagerank.py`) for
corpus curation: authority scores surface canonical pages, hub scores
surface link farms / navigation boilerplate worth down-weighting. The
power iteration is

    a_{i+1}(v) = Σ_{(u,v)∈E} h_i(u)        then L2-normalize
    h_{i+1}(u) = Σ_{(u,v)∈E} a_{i+1}(v)    then L2-normalize

Spark-first shape per round — same discipline as PageRank:
- two edge⋈score joins + hash aggregates; shuffles carry
  (node, double) rows only;
- the L2 norm is a broadcast 1-row aggregate crossJoin'd back, never
  a driver collect;
- each half-step's RAW sums are ``localCheckpoint``'d with explicit
  block release (a lazy unroll doubles the logical plan per consumer
  per round — the measured 2^n blowup of SCALE.md "Measured
  decisions" 10), while the normalization stays lazy on top of the
  checkpoint: normalizing BEFORE the checkpoint evaluated each edge
  join twice per round (norm agg + value side — measured, round 5).

The oracle twin (:func:`hits_oracle_sql`) unrolls the same recurrence
as a0/h0..a{n}/h{n} CTEs with identical double arithmetic, so the
fixed-iteration result differential-checks bit-for-bit modulo
summation order (ranks rounded by the registry query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.components import (
    _ckpt_partitioned,
    _ckpt_rdd,
    _release,
)

__all__ = ["hits", "hits_oracle_sql"]


def _l2_normalize(scores: DataFrame, col: str) -> DataFrame:
    """Divide by the global L2 norm via a broadcast 1-row aggregate."""
    norm = scores.agg(
        F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_norm")
    )
    return scores.crossJoin(F.broadcast(norm)).select(
        "node", (F.col(col) / F.col("_norm")).alias(col)
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    broadcast_scores: bool = True,
) -> DataFrame:
    """``(node, hub, authority)`` after ``n_iter`` HITS iterations.

    Scores start at 1 for every node and are L2-normalized after each
    half-step; nodes missing from a side (no in- or out-edges) carry 0
    for that score, matching the unrolled-SQL oracle.

    ``broadcast_scores`` broadcasts the per-half-step (node, double)
    score table into the edge join and the aggregated sums into the
    node left-join — the pagerank ``broadcast_degrees`` size contract
    (16-byte rows; flip off beyond ~10^8 nodes). With it on, the
    checkpointed edge list is scanned, never re-shuffled, each
    half-step (round-12, guide §3.1/§2.4).

    With it OFF (the >1e8-node regime), the edge list is checkpointed
    TWICE, hash-partitioned on ``src`` and on ``dst`` (r13, guide
    §2.4/§3.3) — HITS alternates join keys between half-steps, so one
    layout cannot serve both. Each half-step then shuffles only the
    node-sized score table into the matching edge layout, with a
    ``shuffle_hash`` hint so the edge stream is never re-sorted.
    Per-half-step edge-list exchanges: 1 → 0, for a one-time 2× edge
    storage cost (16-byte rows).
    """
    _b = (
        F.broadcast if broadcast_scores else (lambda d: d.hint("shuffle_hash"))
    )
    e0 = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    if broadcast_scores:
        e_src = e_dst = e0.localCheckpoint()
        e_rdd, e_dst_rdd = _ckpt_rdd(e_src), None
    else:
        e_src = _ckpt_partitioned(e0, "src")
        e_rdd = _ckpt_rdd(e_src)
        # second layout derives from the first checkpoint's blocks —
        # the upstream edge pipeline is not replayed
        e_dst = _ckpt_partitioned(e_src, "dst")
        e_dst_rdd = _ckpt_rdd(e_dst)
    nodes = (
        e_src.select(F.col("src").alias("node"))
        .unionByName(e_src.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    nodes_rdd = _ckpt_rdd(nodes)

    hubs = nodes.select("node", F.lit(1.0).alias("h"))
    hubs_rdd = None
    auths = None
    auths_rdd = None
    # Checkpoint the RAW half-step sums and leave normalization lazy:
    # `_l2_normalize` reads its input twice (norm agg + value side), so
    # checkpointing AFTER it evaluated each edge join twice per
    # materialization. With the checkpoint on the raw sums, every edge
    # join runs exactly once per half-step and the norm is a cheap
    # node-sized agg over the checkpoint (measured on za51: 16.8 s → see
    # SCALE.md — the edge join dominated, the norm agg is noise).
    for _ in range(n_iter):
        a_raw = (
            nodes.join(
                _b(
                    e_src.join(
                        _b(hubs.withColumnRenamed("node", "src")), "src"
                    )
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum("h").alias("a"))
                ),
                "node",
                "left",
            )
            .select("node", F.coalesce("a", F.lit(0.0)).alias("a"))
            .localCheckpoint()
        )
        _release(auths_rdd)
        auths_rdd = _ckpt_rdd(a_raw)
        auths = _l2_normalize(a_raw, "a")

        h_raw = (
            nodes.join(
                _b(
                    e_dst.join(
                        _b(auths.withColumnRenamed("node", "dst")), "dst"
                    )
                    .groupBy(F.col("src").alias("node"))
                    .agg(F.sum("a").alias("h"))
                ),
                "node",
                "left",
            )
            .select("node", F.coalesce("h", F.lit(0.0)).alias("h"))
            .localCheckpoint()
        )
        _release(hubs_rdd)
        hubs_rdd = _ckpt_rdd(h_raw)
        hubs = _l2_normalize(h_raw, "h")

    out = (
        nodes.join(_b(hubs), "node", "left")
        .join(_b(auths), "node", "left")
        .select(
            "node",
            F.coalesce("h", F.lit(0.0)).alias("hub"),
            F.coalesce("a", F.lit(0.0)).alias("authority"),
        )
        .localCheckpoint()  # materialize BEFORE releasing inputs
    )
    for handle in (e_rdd, e_dst_rdd, nodes_rdd, hubs_rdd, auths_rdd):
        _release(handle)
    return out


def hits_oracle_sql(edges_sql: str, n_iter: int = 5, round_digits: int | None = None) -> str:
    """Unrolled-CTE DuckDB oracle with the same arithmetic structure
    (L2 normalization after every half-step; absent sides are 0).
    ``edges_sql`` must yield (src, dst); duplicates are collapsed like
    the operator does."""
    parts = [
        f"WITH edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "h0 AS MATERIALIZED (SELECT node, 1.0 AS h FROM nodes)",
    ]
    prev_h = "h0"
    for i in range(n_iter):
        a_raw, a_cte = f"a{i + 1}_raw", f"a{i + 1}"
        h_raw, h_cte = f"h{i + 1}_raw", f"h{i + 1}"
        parts.append(
            f"""{a_raw} AS MATERIALIZED (
    SELECT nds.node, coalesce(c.a, 0.0) AS a
    FROM nodes nds LEFT JOIN (
        SELECT e.dst AS node, sum(p.h) AS a
        FROM edges e JOIN {prev_h} p ON p.node = e.src
        GROUP BY e.dst
    ) c ON c.node = nds.node
)"""
        )
        parts.append(
            f"{a_cte} AS MATERIALIZED (SELECT node, a / (SELECT sqrt(sum(a * a)) "
            f"FROM {a_raw}) AS a FROM {a_raw})"
        )
        parts.append(
            f"""{h_raw} AS MATERIALIZED (
    SELECT nds.node, coalesce(c.h, 0.0) AS h
    FROM nodes nds LEFT JOIN (
        SELECT e.src AS node, sum(p.a) AS h
        FROM edges e JOIN {a_cte} p ON p.node = e.dst
        GROUP BY e.src
    ) c ON c.node = nds.node
)"""
        )
        parts.append(
            f"{h_cte} AS MATERIALIZED (SELECT node, h / (SELECT sqrt(sum(h * h)) "
            f"FROM {h_raw}) AS h FROM {h_raw})"
        )
        prev_h = h_cte
    body = parts[0] + ",\n" + ",\n".join(parts[1:])
    fmt = (
        ("round(h.h, %d)" % round_digits, "round(a.a, %d)" % round_digits)
        if round_digits is not None
        else ("h.h", "a.a")
    )
    return (
        f"{body}\n"
        f"SELECT n.node, {fmt[0]} AS hub, {fmt[1]} AS authority\n"
        f"FROM nodes n JOIN h{n_iter} h ON h.node = n.node "
        f"JOIN a{n_iter} a ON a.node = n.node"
    )
