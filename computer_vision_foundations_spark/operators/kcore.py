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
    _ckpt_partitioned,
    _ckpt_rdd,
    _release,
)

__all__ = ["k_core", "k_core_collapsed", "kcore_oracle_sql"]


def _sym(edges: DataFrame, src: str, dst: str) -> DataFrame:
    # filter self-loops BEFORE mirroring: the reversed half must not
    # reintroduce them (quotient edge lists genuinely contain
    # same-class rows)
    # explode-mirror (round 8): unionByName(base, base.select) embeds
    # the upstream pipeline twice in the plan — it ran twice wherever
    # the caller had not checkpointed it first
    return (
        edges.where(F.col(src) != F.col(dst))
        .select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v")
        .distinct()
    )


def k_core(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    k: int = 3,
    n_rounds: int = 8,
    broadcast_survivors: bool = True,
) -> DataFrame:
    """``(node, degree)`` of the subgraph left after ``n_rounds`` of
    degree-< k peeling — the k-core once the peel has converged
    (monotone, so extra rounds are no-ops).

    ``broadcast_survivors`` broadcasts the per-round survivor node
    table into the two induction semi-joins — the pagerank
    ``broadcast_degrees`` size contract (8-byte rows; flip off beyond
    ~10^8 nodes). With it on, the checkpointed edge list is scanned,
    never re-shuffled, each round (round-12, guide §3.1/§2.4 — a
    ``localCheckpoint``'d frame is a stats-less LogicalRDD, so the
    planner can never pick the broadcast on its own). Semi-join
    output is pure set membership: join-strategy independent.

    With it OFF (the >1e8-node regime), each round's edge table is
    checkpointed HASH-PARTITIONED on ``u`` (r13, guide §2.4/§3.3):
    the degree aggregate and the u-side induction semi-join consume
    the layout exchange-free (the survivor table derives from the
    same layout), and the node-sized survivor sides carry a
    ``shuffle_hash`` hint so the edge stream is hash-probed, never
    re-sorted. Per-round edge-sized exchanges: 2-over-the-full-list →
    2-over-the-peeled-stream (the v-side induction, plus the layout
    restore that replaces the next round's exchange)."""
    _b = (
        F.broadcast
        if broadcast_survivors
        else (lambda d: d.hint("shuffle_hash"))
    )
    sym = _sym(edges, src, dst)
    sym = (
        sym.localCheckpoint()
        if broadcast_survivors
        else _ckpt_partitioned(sym, "u")
    )
    sym_rdd = _ckpt_rdd(sym)
    # the checkpoint is eager, so counting the checkpointed block is
    # free — and the peel is MONOTONE (edges only leave), so an
    # unchanged edge count IS the fixpoint: stop early with an output
    # identical to the fixed-round unroll (the oracle's 8 rounds are
    # no-ops past convergence). Same discipline as k_core_collapsed.
    prev_cnt = sym.count()
    try:
        for _ in range(n_rounds):
            keep = (
                sym.groupBy("u")
                .agg(F.count(F.lit(1)).alias("_d"))
                .where(F.col("_d") >= k)
                .select("u")
            )
            nxt = sym.join(_b(keep), "u", "left_semi").join(
                _b(keep.select(F.col("u").alias("v"))), "v", "left_semi"
            )
            nxt = (
                nxt.localCheckpoint()
                if broadcast_survivors
                else _ckpt_partitioned(nxt, "u")
            )
            _release(sym_rdd)
            sym, sym_rdd = nxt, _ckpt_rdd(nxt)
            cnt = sym.count()
            if cnt == prev_cnt:
                break
            prev_cnt = cnt
    except Exception:
        _release(sym_rdd)
        raise
    return (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy("node")
    )


def k_core_collapsed(
    pairs: DataFrame,
    classes: DataFrame,
    node_col: str = "node",
    cls_col: str = "cls",
    src: str = "id_a",
    dst: str = "id_b",
    k: int = 3,
    n_rounds: int = 8,
    broadcast_survivors: bool = True,
) -> DataFrame:
    """``k_core`` for graphs whose adjacency is a pure function of a
    class key — same output, quotient-sized rounds.
    ``broadcast_survivors``: the ``k_core`` contract, applied to the
    per-round alive-class/weight tables (quotient-sized, strictly
    smaller than the node table). With it off, the static quotient
    edge table is checkpointed hash-partitioned on ``u`` (r13): the
    u-side alive semi-join and the final degree aggregates consume
    the layout exchange-free, leaving the v-side weight join as the
    one quotient-edge-sized exchange per round.

    Same structural-equivalence contract as
    ``triangles.triangle_stats_collapsed`` (identical neighborhoods;
    mutual adjacency when the class has ≥ 2 members). Because
    same-class nodes always have IDENTICAL degrees, peeling kills or
    keeps whole classes per round, so the peel runs on the weighted
    quotient: ``deg_i = (w_i − 1) + Σ_{j~i, j alive} w_j``. Rounds
    stop early at the fixpoint (the peel is monotone, so the
    fixed-round naive result is identical). Each round touches
    quotient-sized tables only — on dedup graphs that's the distinct-
    fingerprint count, not the clique-expanded edge count.
    """
    _b = (
        F.broadcast
        if broadcast_survivors
        else (lambda d: d.hint("shuffle_hash"))
    )
    cmap = classes.select(
        F.col(node_col).alias("node"), F.col(cls_col).alias("cls")
    ).localCheckpoint()
    w = cmap.groupBy("cls").agg(F.count(F.lit(1)).alias("w"))
    ca = cmap.select(F.col("node").alias(src), F.col("cls").alias("_ca"))
    cb = cmap.select(F.col("node").alias(dst), F.col("cls").alias("_cb"))
    qsym = _sym(pairs.join(ca, src).join(cb, dst), "_ca", "_cb")
    qsym = (
        qsym.localCheckpoint()
        if broadcast_survivors
        else _ckpt_partitioned(qsym, "u")
    )
    # alive classes: participate in the graph at all
    in_graph = qsym.select(F.col("u").alias("cls")).distinct()
    alive = (
        w.join(in_graph, "cls", "left_semi")
        .unionByName(w.where(F.col("w") >= 2))
        .distinct()
        .localCheckpoint()
    )
    alive_rdd = _ckpt_rdd(alive)
    n_alive = alive.count()
    try:
        for _ in range(n_rounds):
            wj = alive.select(
                F.col("cls").alias("v"), F.col("w").alias("wj")
            )
            nbr_sum = (
                qsym.join(
                    _b(alive.select(F.col("cls").alias("u"))),
                    "u",
                    "left_semi",
                )
                .join(_b(wj), "v")
                .groupBy("u")
                .agg(F.sum("wj").alias("s"))
            )
            deg = (
                alive.join(
                    _b(nbr_sum.select(F.col("u").alias("cls"), "s")),
                    "cls",
                    "left",
                )
                .select(
                    "cls",
                    "w",
                    (
                        F.col("w")
                        - 1
                        + F.coalesce(F.col("s"), F.lit(0))
                    ).alias("deg"),
                )
            )
            nxt = deg.where(F.col("deg") >= k).select("cls", "w")
            nxt = nxt.localCheckpoint()
            n_next = nxt.count()
            _release(alive_rdd)
            alive, alive_rdd = nxt, _ckpt_rdd(nxt)
            if n_next == n_alive:
                break  # fixpoint: further rounds are no-ops
            n_alive = n_next
        # final degrees over the surviving quotient
        wj = alive.select(F.col("cls").alias("v"), F.col("w").alias("wj"))
        nbr_sum = (
            qsym.join(
                _b(alive.select(F.col("cls").alias("u"))), "u", "left_semi"
            )
            .join(_b(wj), "v")
            .groupBy("u")
            .agg(F.sum("wj").alias("s"))
        )
        final = alive.join(
            _b(nbr_sum.select(F.col("u").alias("cls"), "s")), "cls", "left"
        ).select(
            "cls",
            (
                F.col("w") - 1 + F.coalesce(F.col("s"), F.lit(0))
            ).alias("degree"),
        )
        # the last alive/cmap blocks stay checkpointed: the returned
        # lazy frame still reads them (k_core's convention — priors
        # are released each round, the final table is not)
        return (
            cmap.join(_b(final), "cls")
            .select("node", "degree")
            .orderBy("node")
        )
    except Exception:
        _release(alive_rdd)
        raise


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
