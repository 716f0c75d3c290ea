"""Deterministic negative sampling for contrastive training pairs.

Contrastive objectives (SimCLR/InfoNCE-style retrieval or embedding
training) need k random negatives per (anchor, positive) pair. At
100 TB the sampler must be COORDINATION-FREE and REPLAYABLE: a
per-pair RNG stream is partition-dependent (the q68 lesson), and a
shuffle-based global sample is a full extra pass. The production
answer is hash indexing into a dense id space: negative j of pair
(a, p) is ``md5(a|p|j|seed) mod N`` — a pure function of the pair,
so every epoch, engine, and partitioning regenerates the identical
negatives, and rejection (a collision with the anchor or positive)
is decided locally with no retry loop (expected loss 2k/N — at
corpus scale, negligible; the caller sees it in the output count).

Spark-first shape: one narrow projection per pair (k-element explode
of hash arithmetic) + a 1-row corpus-size broadcast; no shuffle, no
RNG state, no second corpus pass. Joining negative ids back to
document bodies is the caller's (batched, cache-friendly) step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["negative_samples", "negative_samples_oracle_sql"]


def negative_samples(
    pairs: DataFrame,
    corpus: DataFrame,
    anchor_col: str,
    pos_col: str,
    corpus_id_col: str,
    k: int = 4,
    seed: int = 13,
) -> DataFrame:
    """``(anchor, pos, j, neg)`` — up to ``k`` hash-drawn negatives
    per input pair over the DENSE id space ``[0, |corpus|)``.

    Requires dense contiguous corpus ids (0..N−1 — standard for
    training manifests; build a dense rank first otherwise). Slots
    whose draw collides with the pair's own anchor/positive are
    DROPPED, not redrawn (keeps the draw a pure function of
    (a, p, j, seed); expected loss 2k/N)."""
    n_row = corpus.agg(
        F.count(F.col(corpus_id_col)).alias("_n")
    )
    a = F.col(anchor_col).cast("long")
    p = F.col(pos_col).cast("long")
    base = pairs.select(
        a.alias("anchor"), p.alias("pos")
    ).join(F.broadcast(n_row))
    j = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    withj = base.select("anchor", "pos", "_n", j)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("anchor"),
                    F.col("pos"),
                    F.col("j"),
                    F.lit(str(seed)),
                ).cast("binary")
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    neg = (h % F.col("_n")).alias("neg")
    return (
        withj.select("anchor", "pos", "j", neg)
        .where((F.col("neg") != F.col("anchor")) & (F.col("neg") != F.col("pos")))
    )


def negative_samples_oracle_sql(
    pairs_sql: str,
    corpus_sql: str,
    k: int = 4,
    seed: int = 13,
) -> str:
    """DuckDB twin over sources yielding ``(anchor, pos)`` and a
    corpus with one id column named ``id``."""
    return f"""
    WITH n AS (
        SELECT count(id) AS _n FROM ({corpus_sql})
    ), withj AS (
        SELECT anchor, pos, _n, u.j AS j
        FROM ({pairs_sql}) CROSS JOIN n,
             unnest(range({k})) u(j)
    )
    SELECT anchor, pos, CAST(j AS INT) AS j,
           CAST(('0x' || substr(md5(CAST(anchor AS VARCHAR) || '|'
                                   || CAST(pos AS VARCHAR) || '|'
                                   || CAST(j AS VARCHAR) || '|{seed}'),
                                1, 13)) AS BIGINT) % _n AS neg
    FROM withj
    WHERE CAST(('0x' || substr(md5(CAST(anchor AS VARCHAR) || '|'
                                || CAST(pos AS VARCHAR) || '|'
                                || CAST(j AS VARCHAR) || '|{seed}'),
                             1, 13)) AS BIGINT) % _n NOT IN (anchor, pos)
    """
