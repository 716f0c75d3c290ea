"""Retrieval-quality evaluation over DataFrame result sets.

ANN indexes (LSH buckets, IVF cells, PQ codes) trade recall for scan
cost; the trade is only tunable if recall is MEASURED, continuously,
on the corpus being indexed — not assumed from the paper. These
helpers treat evaluation itself as a relational operator: approximate
and exact top-k result sets in, per-probe and aggregate recall out.
Everything is joins and hash aggregates on (probe, neighbor) id pairs —
at 100 TB you evaluate on a probe SAMPLE and the cost is the two
retrieval runs, not the comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ann_recall", "mean_recall"]


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    probe_col: str = "probe_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Per-probe recall@k: ``(probe_id, n_hits, recall)``.

    ``recall = |approx ∩ exact| / min(k, |exact per probe|)`` against
    the exact top-k ground truth. The denominator is capped by the
    probe's actual ground-truth count: on a small or filtered corpus
    the exact set can hold fewer than k rows, and dividing by the
    constant k would make recall 1.0 unreachable even for an index
    returning every true neighbor (ADVICE r2). Probes are taken from
    ``exact`` (the ground truth defines the probe set), so an index
    that returns nothing for a probe scores 0.0 rather than
    disappearing. One semi-join on the id pair + two hash-aggs;
    nothing touches vectors.
    """
    hits = approx.select(probe_col, neighbor_col).join(
        exact.select(probe_col, neighbor_col),
        [probe_col, neighbor_col],
        "left_semi",
    )
    per_probe = hits.groupBy(probe_col).agg(F.count(F.lit(1)).alias("n_hits"))
    probes = exact.groupBy(probe_col).agg(F.count(F.lit(1)).alias("_n_exact"))
    n = F.coalesce(F.col("n_hits"), F.lit(0).cast("long"))
    denom = F.least(F.lit(k).cast("long"), F.col("_n_exact"))
    return probes.join(per_probe, probe_col, "left").select(
        probe_col,
        n.alias("n_hits"),
        F.round(n.cast("double") / denom.cast("double"), 6).alias("recall"),
    )


def mean_recall(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    probe_col: str = "probe_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Single-row ``(mean_recall, n_probes)`` summary of
    :func:`ann_recall` — the number you put on the index-tuning dial."""
    per = ann_recall(approx, exact, k, probe_col, neighbor_col)
    return per.agg(
        F.round(F.avg("recall"), 6).alias("mean_recall"),
        F.count(F.lit(1)).alias("n_probes"),
    )
