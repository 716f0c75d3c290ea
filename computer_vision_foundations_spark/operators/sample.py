"""Deterministic fixed-size samplers keyed on a portable hash.

``sample()``/``sampleBy()`` answer "keep a RATE"; corpus work also
needs "keep exactly N" (a pilot corpus, an eval slice) and "cap every
group at N" (domain caps against Common-Crawl-style head domains).
Doing that with ``orderBy(rand()).limit(n)`` is non-reproducible and
plans a full sort; these operators key on the seeded 28-bit md5 unit
from ``operators/mixture.hash_unit`` instead, so

- the sample is a pure function of (id, seed): stable across cluster
  layout, partitioning, and engine — a SQL engine replays it exactly
  (same construction the driver oracle uses);
- ``bottom_k_sample`` plans TakeOrderedAndProject (per-partition
  top-k + k-row merge on the driver side of the exchange), NOT a full
  sort: shuffle carries k rows per partition, fine for k up to ~10^6;
- ``group_cap_sample`` is one shuffle on the group key + a rank
  window; parallelism is bounded by group count (like
  ``chunking.shard_assignment`` — use on columns with many groups).

Hash-unit sampling is also the standard "consistent sampling" story:
the k kept ids at seed s are a subset of the k' kept at the same seed
for k' > k, so growing a pilot corpus never discards earlier picks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.mixture import hash_unit

__all__ = ["bottom_k_sample", "group_cap_sample", "weighted_sample_k"]


def bottom_k_sample(
    df: DataFrame,
    id_col: str,
    k: int,
    seed: int = 42,
    key_col: str = "sample_key",
) -> DataFrame:
    """Exactly ``min(k, n)`` rows: the k smallest seeded hash units —
    a uniform fixed-size sample, deterministic in the ids. Ties (28-bit
    collisions) break by id. Input columns pass through; the hash unit
    is appended as ``key_col``."""
    keyed = df.withColumn(key_col, hash_unit(id_col, seed))
    return keyed.orderBy(F.col(key_col), F.col(id_col)).limit(k)


def weighted_sample_k(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
    key_col: str = "sample_key",
) -> DataFrame:
    """Weighted sample of ``k`` rows without replacement, deterministic
    in the ids: Efraimidis–Spirakis A-ES with the seeded hash unit as
    the uniform — key = u^(1/weight), keep the k LARGEST keys (ties by
    id). Inclusion probability is proportional to weight at each draw,
    so token-weighted corpus pilots keep long documents at the right
    rate. Same TakeOrderedAndProject shape as ``bottom_k_sample``; the
    key is one ``pow`` per row. Weights must be > 0."""
    key = F.pow(hash_unit(id_col, seed), F.lit(1.0) / F.col(weight_col))
    return (
        df.withColumn(key_col, key)
        .orderBy(F.desc(key_col), F.col(id_col))
        .limit(k)
    )


def group_cap_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    seed: int = 42,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """At most ``cap`` rows per group: rank by seeded hash unit within
    the group (ties by id), keep rank ≤ cap. The uniform-per-group
    version of ``mixture.top_fraction_per_group`` (which ranks by a
    quality score): use THIS one to bound head domains without quality
    bias, that one to keep the best slice."""
    w = Window.partitionBy(group_col).orderBy(
        hash_unit(id_col, seed), F.col(id_col)
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= cap)
    )
