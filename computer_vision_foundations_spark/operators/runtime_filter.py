"""Bloom-filter runtime join pruning — the manual twin of the
engine-injected runtime filters Spark plans on some joins
(`spark.sql.optimizer.runtime.bloomFilter.*`; the SQL surface
`bloom_filter_agg`/`might_contain` is optimizer-internal and not
registered, so this composes the repo's relational Bloom kit
instead).

The shuffle-reduction story at 100 TB: a selective dimension filter
means most FACT rows cannot find a join partner, yet a plain
shuffle join moves every fact row to its hash partition before
discovering that. Pre-filtering the fact scan with a Bloom filter of
the build side's keys drops the non-matching rows AT THE SCAN — the
~(1-e^{-kn/m})^k false-positive sliver still shuffles and is removed
by the real join, so the result is IDENTICAL to the plain join (no
false negatives by construction; verified by za69's oracle).

Driver state is the bit-position set (≤ m bits, 64 KiB at the
default m=2¹⁶ — the model-sized broadcast class, same as k-means
centroids); the membership check is one Arrow-batched numpy gather
per fact batch over the JVM-computed Kirsch–Mitzenmacher positions
(`functions/sketches._bloom_positions` — identical double-hash on
both the build and probe side by sharing the expression).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from computer_vision_foundations_spark.functions.sketches import (
    _bloom_positions,
    bloom_bits,
)

__all__ = [
    "bloom_runtime_filter",
    "bloom_prefiltered_join",
    "build_bloom_mask",
]


def build_bloom_mask(
    small_keys: DataFrame,
    key: str,
    m: int = 65536,
    k: int = 5,
) -> np.ndarray:
    """The 64 KiB driver bitmask of ``small_keys[key]`` — the eager
    (one Spark job) half of ``bloom_runtime_filter``, split out so a
    caller can run it on a driver thread CONCURRENTLY with unrelated
    pipeline stages (guide §2.6 overlap; the build side is independent
    of the probe side by construction). Same hashing as the probe:
    the STRING form through the Kirsch–Mitzenmacher double-hash."""
    # hash the STRING form on both sides (md5 double-hash is defined
    # over text/binary); NULL keys can never match an inner/semi join,
    # so they are dropped before hashing on both sides
    build = small_keys.where(F.col(key).isNotNull()).select(
        F.col(key).cast("string").alias("_k")
    )
    rows = bloom_bits(build, "_k", m, k).collect()
    mask = np.zeros(m, dtype=bool)
    mask[[r["bit"] for r in rows]] = True
    return mask


def bloom_runtime_filter(
    big: DataFrame,
    small_keys: DataFrame,
    key: str,
    m: int = 65536,
    k: int = 5,
    mask: np.ndarray | None = None,
) -> DataFrame:
    """``big`` restricted to rows whose ``key`` is POSSIBLY in
    ``small_keys[key]`` (no false negatives; FP rate
    ~(1-e^{-kn/m})^k). The build side aggregates to ≤ m distinct bit
    positions (one hash-agg with map-side partials), collected as the
    model-sized driver bitmask; the probe side is a scan-local
    Arrow-batched gather — nothing shuffles to evaluate the filter.

    ``mask``: a bitmask prebuilt by ``build_bloom_mask`` (the caller
    attests it came from the same key domain with the same ``m``/``k``);
    when supplied, ``small_keys`` is not evaluated here — the overlap
    lever for compositions that can build the mask concurrently."""
    if mask is None:
        mask = build_bloom_mask(small_keys, key, m, k)
    elif len(mask) != m:
        raise ValueError(
            f"bloom_runtime_filter: prebuilt mask has {len(mask)} bits, "
            f"expected m={m}"
        )

    @pandas_udf("boolean")
    def _maybe(pos: pd.Series) -> pd.Series:
        lens = pos.str.len().to_numpy(dtype=np.int64)
        if len(lens) == 0:
            return pd.Series([], dtype=bool)
        flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in pos])
        hits = mask[flat]
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        member = np.logical_and.reduceat(hits, starts)
        member[lens == 0] = False
        return pd.Series(member)

    return big.where(F.col(key).isNotNull()).where(
        _maybe(_bloom_positions(F.col(key).cast("string"), m, k))
    )


def bloom_prefiltered_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    m: int = 65536,
    k: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Plain ``big ⋈ small`` on ``key`` with the fact side Bloom-pruned
    at the scan first — result identical to the unfiltered join (the
    FP sliver is removed by the real join; Bloom admits no false
    negatives), but only matching-or-FP fact rows ever shuffle.
    ``how`` must be a join type that cannot RESURRECT pruned rows
    (inner/left_semi); an outer flavor would need the pruned rows
    back and is rejected."""
    if how not in ("inner", "left_semi", "semi", "leftsemi"):
        raise ValueError(
            f"bloom_prefiltered_join: how={how!r} would need the pruned "
            "fact rows back (outer semantics); use inner or left_semi"
        )
    pruned = bloom_runtime_filter(big, small.select(key), key, m, k)
    return pruned.join(small, key, how)
